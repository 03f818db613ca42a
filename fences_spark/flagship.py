"""The flagship validation: north-rule column bindings (FIXTURES.md
§B "Column-rule bindings") compiled over the files table, plus an
equivalent binding for the driver testdata tables used by the smoke
entry point.

Rules (all compile to the "typed" builtin tier — pure codegen):
  repo    → pattern ^[-\\w.]+/[-\\w.]+$
  path    → minLength 1 + pattern
  commit  → pattern ^[0-9a-f]{40}$
  lang    → enum [python java c go rust js other]
  content → type string + minLength 1
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fences_spark.compiler.ruleset import RuleSet, ValidationResult
from fences_spark.synth import LANGS


def files_ruleset() -> RuleSet:
    rs = RuleSet()
    rs.add("repo_format", "repo", {"type": "string", "pattern": "^[-\\w.]+/[-\\w.]+$"})
    rs.add("path_nonempty", "path", {"type": "string", "minLength": 1, "pattern": "^[-\\w./]+$"})
    rs.add("commit_sha", "commit", {"type": "string", "pattern": "^[0-9a-f]{40}$"})
    rs.add("lang_enum", "lang", {"type": "string", "enum": LANGS})
    rs.add("content_present", "content", {"type": "string", "minLength": 1})
    return rs


def validate_files(files: DataFrame) -> ValidationResult:
    """Annotate the files table with verdicts + the sha256 row
    invariant (BASELINE.json:15: per-row content sha256 equality vs
    the reference — computed JVM-side with the built-in sha2)."""
    res = files_ruleset().apply(files)
    res.df = res.df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    return res


# ---------------------------------------------------------------------------
# smoke flagship over driver testdata (documents + events), used by
# __spark_entry__.entry — validates real tables shipped with the
# sandbox and returns a per-rule verdict summary.
# ---------------------------------------------------------------------------

def testdata_ruleset() -> RuleSet:
    rs = RuleSet()
    rs.add("doc_text_present", "text", {"type": "string", "minLength": 1})
    rs.add("doc_lang_format", "lang", {"type": "string", "pattern": "^[a-z]{2}$"})
    rs.add("doc_nchars_nonneg", "n_chars", {"type": "integer", "minimum": 0})
    return rs


def flagship_entry(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = testdata_ruleset().apply(docs)
    return (
        res.df.groupBy("row_valid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum((~F.col(rid)).cast("long")).alias(f"fail_{rid}")
                for rid in res.rule_ids
            ],
        )
        .orderBy("row_valid")
    )
