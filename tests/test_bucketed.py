"""Bucketed co-located joins: the physical plan must show NO Exchange
on either join side when both tables are bucketed+sorted on the join
key (the layout-level shuffle elimination the engine relies on for
repeated 10^12-row key joins — SURVEY.md §2.B joins/bucketing)."""

import pytest
from pyspark.sql import functions as F

from fences_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    files = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("repo_bucket"),
        F.sha1(F.col("id").cast("string").cast("binary")).alias("payload"),
    )
    dim = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.col("id") * 3 % 11).alias("attr"),
    )
    write_bucketed(files, "bt_files", ["k"], n_buckets=8)
    write_bucketed(dim, "bt_dim", ["k"], n_buckets=8)
    yield "bt_files", "bt_dim"
    spark.sql("DROP TABLE IF EXISTS bt_files")
    spark.sql("DROP TABLE IF EXISTS bt_dim")


def _final_plan(df):
    jq = df._jdf.queryExecution()
    return jq.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


@pytest.fixture()
def no_broadcast(spark):
    """Disable broadcast so the planner must use SortMergeJoin —
    small test tables would otherwise broadcast (also shuffle-free,
    but that would not demonstrate the bucket layout)."""
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_colocated_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, ["k"])
    n = joined.count()
    assert n == 5000
    plan = _final_plan(joined)
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final
    assert "Exchange" not in final.replace("ReusedExchange", ""), final


def test_unbucketed_join_shuffles_for_contrast(spark, bucketed_tables):
    left, _ = bucketed_tables
    plain = spark.range(5000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    joined = spark.table(left).join(plain, ["k"])
    joined.count()
    plan = _final_plan(joined)
    assert "Exchange" in plan or "Broadcast" in plan


def test_join_values_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    got = colocated_join(spark, left, right, ["k"]) \
        .agg(F.sum(F.col("attr")).alias("s")).collect()[0].s
    want = spark.table(right).agg(F.sum("attr")).collect()[0][0]
    assert got == want
