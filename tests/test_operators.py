"""Operator suite: stats profile, integrity (dedup/referential),
drift (χ²/KS)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fences_spark.operators.drift import (
    chi2_sf,
    files_histograms,
    ks_sf,
    score_drift,
)
from fences_spark.operators.integrity import (
    dedup_exact,
    duplicate_exemplars,
    duplicate_keys,
    referential_orphans,
)
from fences_spark.operators.stats import profile
from fences_spark.synth import baseline_hist, commits_table, expected_defect_counts, files_table

N = 20_000


class TestProfile:
    def test_exact_profile_matches_direct_queries(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        prof = {r["column"]: r for r in profile(df, ["l_quantity", "l_returnflag"], exact=True).collect()}
        q = prof["l_quantity"]
        direct = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_quantity").alias("nd"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
            F.expr("percentile(l_quantity, 0.5)").alias("med"),
        ).collect()[0]
        assert q["n_rows"] == direct["n"]
        assert q["n_distinct"] == direct["nd"]
        assert q["min_value"] == direct["mn"]
        assert q["max_value"] == direct["mx"]
        assert q["q50"] == pytest.approx(direct["med"])
        assert q["null_rate"] == 0.0

    def test_hll_within_rsd(self, spark):
        df = spark.range(50_000).select((F.col("id") % 1000).alias("k"))
        prof = profile(df, ["k"], hll_rsd=0.02).collect()[0]
        assert abs(prof["n_distinct"] - 1000) / 1000 < 0.1

    def test_null_rate(self, spark):
        df = spark.range(100).select(
            F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id")).alias("x")
        )
        prof = profile(df, ["x"], exact=True).collect()[0]
        assert prof["n_null"] == 25
        assert prof["null_rate"] == pytest.approx(0.25)


class TestIntegrity:
    def test_duplicate_keys_exact(self, spark):
        files = files_table(spark, N)
        exp = expected_defect_counts(N)
        dups = duplicate_keys(files, ["repo", "path", "commit"])
        assert dups.count() == exp["dup_keys"]
        assert dups.agg(F.sum("n_copies")).collect()[0][0] == 2 * exp["dup_keys"]

    def test_duplicate_exemplars(self, spark):
        files = files_table(spark, N)
        exp = expected_defect_counts(N)
        extras = duplicate_exemplars(files, ["repo", "path", "commit"], "content")
        assert extras.count() == exp["dup_keys"]

    def test_dedup_exact_keeps_one_per_key(self, spark):
        files = files_table(spark, N)
        exp = expected_defect_counts(N)
        total = N + exp["dup_keys"]
        deduped = dedup_exact(files, ["repo", "path", "commit"])
        assert files.count() == total
        assert deduped.count() == N
        assert duplicate_keys(deduped, ["repo", "path", "commit"]).count() == 0
        assert deduped.columns == files.columns

    def test_dedup_deterministic_across_partitioning(self, spark):
        files = files_table(spark, 5_000)
        a = dedup_exact(files.repartition(3), ["repo", "path", "commit"])
        b = dedup_exact(files.repartition(23), ["repo", "path", "commit"])
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_referential_orphans(self, spark):
        files = files_table(spark, N)
        commits = commits_table(spark, N)
        exp = expected_defect_counts(N)
        orphans = referential_orphans(files, commits, ["repo", "commit"])
        distinct_orphan_commits = orphans.select("commit").distinct().count()
        assert distinct_orphan_commits == exp["orphan_commit_groups"]
        # plan must be a broadcast join (no shuffle of the fact side)
        plan = orphans._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


class TestDrift:
    def test_special_functions(self):
        # χ²(1) critical value 3.841 ↔ p 0.05; χ²(10) 18.31 ↔ p 0.05
        assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=2e-3)
        assert chi2_sf(18.31, 10) == pytest.approx(0.05, abs=2e-3)
        assert chi2_sf(0.0, 5) == pytest.approx(1.0)
        assert ks_sf(0.0, 100) == 1.0
        assert ks_sf(0.5, 1000) < 1e-6

    def test_no_drift_on_clean_split(self, spark):
        clean = files_table(spark, N, with_defects=False)
        base = baseline_hist(spark, N)
        results = score_drift(files_histograms(clean), base)
        for r in results:
            assert not r.drifted(), (r.dim, r.chi2_pvalue, r.ks_pvalue)

    def test_drift_detected_on_shifted_lang(self, spark):
        files = files_table(spark, 40_000)  # includes the shifted partition
        base = baseline_hist(spark, 40_000)
        results = {r.dim: r for r in score_drift(files_histograms(files), base)}
        assert results["lang"].drifted()
        # path_depth distribution was not perturbed (dup rows shift it
        # by ~0.1%, below the alpha=1e-3 radar at this n)
        assert not results["path_depth"].drifted(alpha=1e-6)

    def test_distributed_stats_agree_with_driver_side(self, spark):
        """drift_stats_distributed (pure Spark, no collect) must agree
        with score_drift (driver-side) on χ², dof, KS, and totals —
        modulo score_drift folding impossible buckets into inf."""
        from fences_spark.operators.drift import drift_stats_distributed

        files = files_table(spark, N)  # contains 'klingon' (impossible)
        base = baseline_hist(spark, N)
        cur = files_histograms(files)
        dist = {r["dim"]: r for r in drift_stats_distributed(cur, base).collect()}
        drv = {r.dim: r for r in score_drift(cur, base)}
        for dim in drv:
            d, s = dist[dim], drv[dim]
            assert d["n_current"] == s.n_current and d["n_baseline"] == s.n_baseline
            assert d["ks_stat"] == pytest.approx(s.ks_stat, abs=1e-6)
            if math.isinf(s.chi2_stat):
                assert d["n_impossible"] > 0  # split out, not folded to inf
            else:
                assert d["n_impossible"] == 0
                assert d["chi2_stat"] == pytest.approx(s.chi2_stat, abs=1e-4)
                assert d["dof"] == s.chi2_dof

    def test_impossible_bucket_is_infinite_chi2(self, spark):
        files = files_table(spark, N)  # contains 'klingon'
        base = baseline_hist(spark, N)
        results = {r.dim: r for r in score_drift(files_histograms(files), base)}
        assert math.isinf(results["lang"].chi2_stat)
        assert results["lang"].chi2_pvalue == 0.0


class TestFunnel:
    def test_ordered_chain_semantics(self, spark):
        from datetime import datetime

        from fences_spark.operators.joins import funnel

        t = lambda m: datetime(2026, 1, 1, 12, m)  # noqa: E731
        rows = [
            # u1 completes in order within the hour
            (1, t(0), "view"), (1, t(5), "click"), (1, t(10), "purchase"),
            # u2: purchase BEFORE click -> chain stops at click
            (2, t(0), "view"), (2, t(20), "click"), (2, t(10), "purchase"),
            # u3: click before ANY view -> depth 1 (click doesn't count)
            (3, t(5), "view"), (3, t(1), "click"),
            # u4 never views -> absent entirely
            (4, t(0), "click"), (4, t(1), "purchase"),
            # u5 completes but outside the 30-minute span
            (5, t(0), "view"), (5, t(10), "click"), (5, t(50), "purchase"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        out = {r["user_id"]: r for r in funnel(
            df, ["view", "click", "purchase"], max_span="30 minutes").collect()}
        assert set(out) == {1, 2, 3, 5}
        assert out[1]["depth"] == 3 and out[1]["within_span"] is True
        assert out[2]["depth"] == 2 and out[2]["t_purchase"] is None
        assert out[3]["depth"] == 1 and out[3]["t_click"] is None
        assert out[5]["depth"] == 3 and out[5]["within_span"] is False

    def test_tie_at_same_timestamp_counts(self, spark):
        from datetime import datetime

        from fences_spark.operators.joins import funnel

        df = spark.createDataFrame(
            [(1, datetime(2026, 1, 1), "view"), (1, datetime(2026, 1, 1), "click")],
            "user_id long, ts timestamp, event_type string",
        )
        out = funnel(df, ["view", "click"]).first()
        assert out["depth"] == 2  # >= semantics: simultaneous steps chain

    def test_malformed_max_span_is_value_error(self, spark):
        """max_span is spliced into an INTERVAL literal — anything but
        '<amount> <unit>' must be a clear ValueError up front, never a
        SQL parse error or a smuggled expression."""
        from datetime import datetime

        import pytest as _pt

        from fences_spark.operators.joins import funnel

        df = spark.createDataFrame(
            [(1, datetime(2026, 1, 1), "view")],
            "user_id long, ts timestamp, event_type string",
        )
        for bad in ("1 fortnight", "1; DROP TABLE x", "'1' hour", "hour"):
            with _pt.raises(ValueError, match="max_span"):
                funnel(df, ["view"], max_span=bad)
        # the documented shapes still pass validation
        funnel(df, ["view"], max_span="30 minutes")
        funnel(df, ["view"], max_span="1 HOUR")


class TestCohortRetention:
    def test_retention_triangle(self, spark):
        from datetime import datetime

        from fences_spark.operators.joins import cohort_retention

        # weeks start Monday; 2026-01-05 is a Monday
        w = lambda k, d=0: datetime(2026, 1, 5 + 7 * k + d, 9)  # noqa: E731
        rows = (
            # cohort W0: users 1,2,3; user 1 active W0+W1+W2, user 2 W0+W2, user 3 W0 only
            [(1, w(0)), (1, w(1)), (1, w(2)), (2, w(0, 2)), (2, w(2)), (3, w(0))]
            # cohort W1: user 4 active W1 only
            + [(4, w(1, 3))]
        )
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {(str(r["cohort"]), r["offset"]): (r["n_active"], r["cohort_size"], r["retention"])
               for r in cohort_retention(df, period="week").collect()}
        c0, c1 = "2026-01-05", "2026-01-12"
        assert out[(c0, 0)] == (3, 3, 1.0)
        assert out[(c0, 1)] == (1, 3, 0.333333)
        assert out[(c0, 2)] == (2, 3, 0.666667)
        assert out[(c1, 0)] == (1, 1, 1.0)
        assert (c1, 1) not in out


def test_event_analytics_plan_properties(spark):
    """The funnel / retention / curate_full plans must stay free of
    cartesian products and row-at-a-time Python — the properties that
    keep them viable at 10^12 events."""
    from fences_spark.operators.curate import curate_documents_full
    from fences_spark.operators.joins import cohort_retention, funnel

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plans = {
        "funnel": funnel(ev, ["view", "click", "purchase"], max_span="1 hour"),
        "retention": cohort_retention(ev, period="week"),
        "curate_full": curate_documents_full(
            docs, "doc_id", "text", blocked_domains=["x.invalid"], persist_base=False
        ),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name


def test_robust_outliers_semantics(spark):
    from fences_spark.operators.stats import robust_outliers

    # 9 values clustered at 100 +/- small, one extreme outlier
    rows = [(i, 100.0 + i) for i in range(9)] + [(9, 10_000.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = robust_outliers(df, "v", k=3.0).first()
    assert out["median"] == 104.5            # even-n interpolated median
    assert out["n_rows"] == 10 and out["n_outliers"] == 1
    assert out["outlier_rate"] == 0.1
    # the bounds exclude only the extreme point
    assert out["lo"] <= 100.0 and out["hi"] < 10_000.0
    # approx mode runs and returns the same shape
    a = robust_outliers(df, "v", k=3.0, exact=False).first()
    assert a["n_rows"] == 10


class TestEnsureParallelismConf:
    """spark.fences_spark.ensureParallelism gates the plan->RDD
    partition probe (the 10^12 setting is 'off': wide scans need no
    probe and no shuffle)."""

    def test_off_is_identity(self, spark):
        from fences_spark.operators.dedup import ensure_parallelism

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string").coalesce(1)
        spark.conf.set("spark.fences_spark.ensureParallelism", "off")
        try:
            assert ensure_parallelism(df, "doc_id") is df
        finally:
            spark.conf.unset("spark.fences_spark.ensureParallelism")

    def test_force_repartitions_without_probe(self, spark):
        from fences_spark.operators.dedup import ensure_parallelism

        df = spark.createDataFrame([(i, "x") for i in range(64)],
                                   "doc_id long, text string").coalesce(1)
        spark.conf.set("spark.fences_spark.ensureParallelism", "force")
        try:
            out = ensure_parallelism(df, "doc_id")
            assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        finally:
            spark.conf.unset("spark.fences_spark.ensureParallelism")

    def test_auto_widens_narrow_input(self, spark):
        from fences_spark.operators.dedup import ensure_parallelism

        df = spark.createDataFrame([(i, "x") for i in range(64)],
                                   "doc_id long, text string").coalesce(1)
        out = ensure_parallelism(df, "doc_id")
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


class TestDivergence:
    def test_divergence_known_histograms(self, spark):
        """Hand-computable two-bucket case: current (3/4, 1/4) vs
        baseline (1/2, 1/2)."""
        import math

        from fences_spark.operators.drift import divergence_stats_distributed

        cur = spark.createDataFrame(
            [("d", "a", 75), ("d", "b", 25)], "dim string, bucket string, cnt long"
        )
        base = spark.createDataFrame(
            [("d", "a", 50), ("d", "b", 50)], "dim string, bucket string, cnt long"
        )
        row = divergence_stats_distributed(cur, base).collect()[0]
        psi = (0.75 - 0.5) * math.log(0.75 / 0.5) + (0.25 - 0.5) * math.log(0.25 / 0.5)
        tvd = 0.5 * (abs(0.75 - 0.5) + abs(0.25 - 0.5))
        hell = math.sqrt(1 - (math.sqrt(0.75 * 0.5) + math.sqrt(0.25 * 0.5)))
        assert row["psi"] == pytest.approx(psi, abs=1e-6)
        assert row["tvd"] == pytest.approx(tvd, abs=1e-6)
        assert row["hellinger"] == pytest.approx(hell, abs=1e-6)
        assert (row["n_current"], row["n_baseline"]) == (100, 100)

    def test_divergence_zero_on_identical(self, spark):
        from fences_spark.operators.drift import divergence_stats_distributed

        h = spark.createDataFrame(
            [("d", "a", 10), ("d", "b", 30), ("d", "c", 60)],
            "dim string, bucket string, cnt long",
        )
        row = divergence_stats_distributed(h, h).collect()[0]
        assert row["psi"] == 0.0 and row["tvd"] == 0.0 and row["hellinger"] == 0.0

    def test_divergence_disjoint_buckets_bounded(self, spark):
        """Fully disjoint supports: TVD = 1, Hellinger = 1, PSI finite
        (eps-clipped) and large."""
        from fences_spark.operators.drift import divergence_stats_distributed

        cur = spark.createDataFrame([("d", "a", 100)], "dim string, bucket string, cnt long")
        base = spark.createDataFrame([("d", "b", 100)], "dim string, bucket string, cnt long")
        row = divergence_stats_distributed(cur, base).collect()[0]
        assert row["tvd"] == 1.0
        assert row["hellinger"] == 1.0
        assert 10 < row["psi"] < 60  # 2 * (1-1e-6) * ln(1e6) ≈ 27.6
