"""Skew-stress harness: structure, correctness of the synthetic
inputs, and the AQE skew-join split firing (plan evidence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fences_spark.skewbench import (
    run_skew_stress,
    skewed_files,
    uniform_files,
)


def test_skew_profile(spark):
    n = 100_000
    df = skewed_files(spark, n)
    top_repo = df.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top_repo["repo"] == "repo-hot"
    assert top_repo["count"] >= int(0.55 * n)  # 50% hot repo + 10% hot key
    hot_key = (
        df.filter((F.col("repo") == "repo-hot") & (F.col("path") == "README.md"))
        .count()
    )
    assert hot_key == n // 10
    boiler = df.groupBy("content").count().orderBy(F.desc("count")).first()
    assert boiler["count"] >= int(0.28 * n)
    # uniform input: same size, no dominant key
    u = uniform_files(spark, n)
    assert u.count() == n
    u_top = u.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert u_top["count"] < int(0.01 * n)


def test_stress_passes_and_split_fires(spark):
    # thresholds scaled to the tiny input so the AQE split fires at
    # test size exactly as at production 256MB scale
    res = run_skew_stress(
        spark,
        n=400_000,
        repeats=1,
        skew_threshold="64KB",
        advisory_size="32KB",
        skew_factor="1.5",
    )
    d = res.as_dict()
    assert set(d["ops"]) == {
        "salted_dedup",
        "dup_key_count",
        "skew_merge_join",
        "hot_groupby",
        "content_dedup_groups",
        "quota_topk",
        "stratum_percentile",
        "token_surprisal",
    }
    assert d["skew_split_fired"] is True
    for name, v in d["ops"].items():
        assert v["uniform"] > 0 and v["skewed"] > 0, name
    # wall ratios at unit-test scale are noisy — the <=2x criterion is
    # enforced by bench.py / scripts/bench_skew.py at 2M-8M rows; here
    # only a blow-up (one reducer carrying the hot key) would show
    assert d["max_ratio"] < 10


def test_salted_dedup_correct_under_skew(spark):
    from fences_spark.operators.integrity import dedup_exact

    df = skewed_files(spark, 50_000)
    got = dedup_exact(df, ["repo", "path", "commit"]).count()
    want = df.select("repo", "path", "commit").distinct().count()
    assert got == want


def test_conf_restored(spark):
    key = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    before = spark.conf.get(key)
    run_skew_stress(spark, n=50_000, repeats=1)
    assert spark.conf.get(key) == before
