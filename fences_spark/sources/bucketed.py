"""Bucketed sinks for co-located joins.

At 10^12 rows the dominant cost of repeated key-joins (files ⋈
commits, verdicts ⋈ lineage, signatures ⋈ pairs) is the shuffle.
Writing both sides bucketed on the join key pins a hash
partitioning into the table layout, so later joins read both sides
already co-partitioned — SortMergeJoin with ZERO Exchange (verified
by tests/test_bucketed.py against the physical plan).

This is the sandbox stand-in for Iceberg's ``bucket(N, col)``
partition transform (the north-rule storage layer); the Spark API is
identical either way: ``df.write.bucketBy(N, *keys).sortBy(*keys)
.saveAsTable(...)`` and plain ``spark.table`` reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on ``keys``.
    ``n_buckets`` must match on both sides of a co-located join and
    should be sized so one bucket of the larger table fits an
    executor core's working set at target scale."""
    w = df.write.mode(mode).bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.  With both
    sides bucketed+sorted on ``keys`` and bucketing enabled (default),
    Catalyst plans a SortMergeJoin whose children read bucket files
    directly — no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, keys, how)
