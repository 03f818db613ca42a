"""Synthetic north-rule table: planted-defect exactness + flagship
validation + sha256 row invariant + determinism across parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from fences_spark.flagship import flagship_entry, validate_files
from fences_spark.synth import (
    LANGS,
    baseline_hist,
    commits_table,
    expected_defect_counts,
    files_table,
)

N = 20_000


def test_planted_defects_exact(spark):
    files = files_table(spark, N)
    exp = expected_defect_counts(N)
    dup_keys = files.groupBy("repo", "path", "commit").count().filter("count > 1").count()
    assert dup_keys == exp["dup_keys"]
    assert files.filter(F.col("content").isNull()).count() == exp["null_content"]
    assert files.filter(F.col("content") == "").count() == exp["empty_content"]
    assert files.filter(~F.col("lang").isin(LANGS)).count() == exp["bad_lang"]

    commits = commits_table(spark, N)
    orphan_commits = (
        files.select("repo", "commit").distinct()
        .join(commits.select("repo", "commit"), ["repo", "commit"], "left_anti")
        .select("commit").distinct().count()
    )
    assert orphan_commits == exp["orphan_commit_groups"]


def test_flagship_verdicts(spark):
    files = files_table(spark, N)
    exp = expected_defect_counts(N)
    res = validate_files(files)
    fails = {
        r["rule_id"]: r["fails"]
        for r in res.verdicts().groupBy("rule_id").agg(F.sum("n_fail").alias("fails")).collect()
    }
    assert fails["content_present"] == exp["null_content"] + exp["empty_content"]
    assert fails["lang_enum"] == exp["bad_lang"]
    assert fails["repo_format"] == 0
    assert fails["commit_sha"] == 0
    # violation rows are exact: one row per (row, failed rule)
    v = res.violations("repo", "path", "commit").groupBy("rule_id").count().collect()
    vmap = {r["rule_id"]: r["count"] for r in v}
    assert vmap.get("content_present") == exp["null_content"] + exp["empty_content"]
    assert vmap.get("lang_enum") == exp["bad_lang"]


def test_sha256_row_invariant(spark):
    """BASELINE.json:15 — per-row content sha256; cross-check the JVM
    sha2 against Python hashlib on a sample."""
    import hashlib

    files = files_table(spark, 500, with_defects=False)
    rows = (
        validate_files(files).df.select("content", "content_sha256").limit(20).collect()
    )
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_determinism_across_parallelism(spark):
    """Same n_rows → identical multiset of rows regardless of
    partitioning (the scaling-bench precondition)."""
    a = files_table(spark, 5_000).repartition(3)
    b = files_table(spark, 5_000).repartition(17)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_baseline_hist_totals(spark):
    h = baseline_hist(spark, N)
    totals = {r["dim"]: r["s"] for r in h.groupBy("dim").agg(F.sum("cnt").alias("s")).collect()}
    assert totals == {"lang": N, "path_depth": N}


def test_flagship_entry_smoke(spark):
    out = flagship_entry(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) >= 1
    assert {"row_valid", "n_rows"} <= set(out.columns)
