"""JSONL / CSV corpus ingestion with corrupt-record quarantine — the
formats web-scale training corpora actually arrive in before they
become parquet/Iceberg.  No reference precedent (the reference reads
schema files driver-side, SURVEY.md §2.B scans row); this is the
engine's ingest edge.

Scale rules encoded here:

- **explicit schema, never inference**: schema inference is a full
  extra pass over the input (at 100 TB, a second 100 TB scan before
  the first real one);
- **PERMISSIVE + corrupt-record capture**, not fail-fast: one
  malformed line among 10^12 must quarantine, not kill the job, and
  silently dropping it (DROPMALFORMED) loses the audit trail the
  north rule's violation accounting expects;
- the quarantine split **persists the annotated frame first** —
  Spark refuses a filter that references only the internal corrupt
  column on a freshly-read frame (the row would have to be re-parsed
  just to re-derive its corruptness), so the split is one read + two
  cheap filters instead of two full parses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType | str, spark: SparkSession) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.names:
        return schema
    return schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """One JSON document per line → rows of ``schema`` plus a
    ``_corrupt_record`` column holding the raw line when it failed to
    parse (NULL otherwise)."""
    return (
        spark.read.schema(_with_corrupt(schema, spark))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with the same quarantine contract as :func:`read_jsonl`."""
    return (
        spark.read.schema(_with_corrupt(schema, spark))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the corrupt column, and
    the raw text of every unparseable record.  Persists ``df`` (MEMORY
    AND DISK) — required by Spark for corrupt-column-only filters, and
    what makes this one parse instead of two."""
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return clean, bad
