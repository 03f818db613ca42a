"""Runner: verdict/violation sinks, checkpoint, resume-skips-done,
idempotent bucket overwrite, lineage."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fences_spark.flagship import files_ruleset
from fences_spark.run import RunConfig, ValidationRunner
from fences_spark.synth import expected_defect_counts, files_table

N = 10_000


@pytest.fixture()
def cfg(tmp_path):
    return RunConfig(
        output_dir=str(tmp_path / "out"),
        run_id="r1",
        snapshot_id="snapA",
        n_buckets=8,
    )


def test_full_run_writes_everything(spark, cfg):
    files = files_table(spark, N)
    runner = ValidationRunner(spark, files_ruleset(), cfg)
    s = runner.run(files)
    exp = expected_defect_counts(N)
    n_bad_rows_content = exp["null_content"] + exp["empty_content"]

    assert s.buckets_processed == 8 and s.buckets_skipped == 0
    assert s.rows_processed == N + exp["dup_keys"]

    viol = spark.read.parquet(cfg.violations_path)
    by_rule = {r["rule_id"]: r["n"] for r in viol.groupBy("rule_id").agg(F.count("*").alias("n")).collect()}
    assert by_rule["content_present"] == n_bad_rows_content
    assert by_rule["lang_enum"] == exp["bad_lang"]

    verdicts = spark.read.parquet(cfg.verdicts_path)
    assert verdicts.select("bucket").distinct().count() == 8
    failed_buckets = verdicts.filter(~F.col("passed")).select("rule_id").distinct().collect()
    assert {r["rule_id"] for r in failed_buckets} == {"content_present", "lang_enum"}

    metrics = spark.read.parquet(cfg.metrics_path)
    assert metrics.count() == 8
    lin = json.loads(metrics.limit(1).collect()[0]["lineage_json"])
    assert lin["snapshot_id"] == "snapA"
    assert set(lin["tiers"].values()) == {"typed"}  # all builtin tier


def test_violations_written_counts_exploded_rows(spark, cfg):
    """A row breaking k rules contributes k to violations_written —
    the counter mirrors the violations SINK (exploded rows), not the
    invalid-ROW count.  Pinned with two rules that the same defective
    rows (null/empty content) both violate."""
    from fences_spark.compiler.ruleset import RuleSet

    files = files_table(spark, N)
    rs = (
        RuleSet()
        .add("content_present", "content", {"type": "string", "minLength": 1})
        .add("content_long", "content", {"type": "string", "minLength": 2})
    )
    s = ValidationRunner(spark, rs, cfg).run(files)
    viol = spark.read.parquet(cfg.violations_path)
    assert s.violations_written == viol.count()
    exp = expected_defect_counts(N)
    n_bad = exp["null_content"] + exp["empty_content"]
    # every bad-content row violates both rules → exploded count is 2×
    # the invalid-row count
    assert s.violations_written == 2 * n_bad


def test_resume_skips_completed(spark, cfg):
    files = files_table(spark, N)
    runner = ValidationRunner(spark, files_ruleset(), cfg)
    s1 = runner.run(files)
    assert s1.buckets_processed == 8
    s2 = ValidationRunner(spark, files_ruleset(), cfg).run(files)
    assert s2.buckets_processed == 0 and s2.buckets_skipped == 8

    # new snapshot id → full re-run
    cfg2 = RunConfig(output_dir=cfg.output_dir, run_id="r1", snapshot_id="snapB", n_buckets=8)
    s3 = ValidationRunner(spark, files_ruleset(), cfg2).run(files)
    assert s3.buckets_processed == 8


def test_partial_then_resume_is_idempotent(spark, cfg):
    files = files_table(spark, N)
    cfg.max_buckets_per_pass = 3
    runner = ValidationRunner(spark, files_ruleset(), cfg)
    s = runner.run(files)
    assert s.passes == 3  # 3+3+2

    # resume after "crash": simulate by deleting checkpoint rows of
    # the last pass? simpler: a fresh run with same cfg skips all
    s2 = ValidationRunner(spark, files_ruleset(), cfg).run(files)
    assert s2.buckets_processed == 0

    # violations must equal a single-pass run (bucket overwrite is
    # idempotent, no duplicates across passes)
    viol = spark.read.parquet(cfg.violations_path)
    exp = expected_defect_counts(N)
    assert viol.filter(F.col("rule_id") == "lang_enum").count() == exp["bad_lang"]


def test_reprocessed_bucket_clears_stale_violations(spark, cfg):
    """A re-processed bucket whose new result has ZERO violations must
    not keep stale violation files (dynamic partition overwrite alone
    would — it only replaces partitions present in the new data)."""
    files = files_table(spark, N)
    ValidationRunner(spark, files_ruleset(), cfg).run(files)
    viol_before = spark.read.parquet(cfg.violations_path).count()
    assert viol_before > 0

    # same run_id, new snapshot → all buckets pending again; validate
    # a defect-free table: every bucket now has zero violations
    cfg2 = RunConfig(output_dir=cfg.output_dir, run_id="r1", snapshot_id="snapC",
                     n_buckets=cfg.n_buckets)
    clean = files_table(spark, N, with_defects=False)
    ValidationRunner(spark, files_ruleset(), cfg2).run(clean)
    try:
        n = spark.read.parquet(cfg.violations_path).count()
    except Exception:
        n = 0  # all bucket partitions cleared → no parquet files at all
    assert n == 0


def test_bucket_is_content_defined(spark, cfg):
    files = files_table(spark, 2_000)
    r = ValidationRunner(spark, files_ruleset(), cfg)
    a = r._with_bucket(files.repartition(2)).select("repo", "path", "bucket")
    b = r._with_bucket(files.repartition(19)).select("repo", "path", "bucket")
    assert a.exceptAll(b).count() == 0


def test_pointer_diagnostics_violations_sink(spark, cfg):
    """pointer_diagnostics=True: the violations sink gains a
    ``pointers array<struct<pointer,keyword>>`` column locating each
    violation (vocabulary of compiler/pointers.py), at the SAME
    (row, rule) cardinality as the plain sink — a rule contributing
    several pointer entries (empty path fails minLength AND pattern)
    still writes one sink row with a 2-entry array."""
    cfg.pointer_diagnostics = True
    files = files_table(spark, N)
    ValidationRunner(spark, files_ruleset(), cfg).run(files)
    viol = spark.read.parquet(cfg.violations_path)
    assert "pointers" in viol.columns

    exp = expected_defect_counts(N)
    by_rule = {
        r["rule_id"]: r["n"]
        for r in viol.groupBy("rule_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_rule["content_present"] == exp["null_content"] + exp["empty_content"]
    assert by_rule["lang_enum"] == exp["bad_lang"]

    # scalar rules report root-level pointers with the failing keyword
    kws = {
        (r["pointer"], r["keyword"])
        for r in viol.filter(F.col("rule_id") == "lang_enum")
        .select(F.explode("pointers").alias("p"))
        .select("p.pointer", "p.keyword")
        .distinct()
        .collect()
    }
    assert kws == {("#", "enum")}
    # null content → type; empty content → minLength (both root-level)
    kws_c = {
        r["keyword"]
        for r in viol.filter(F.col("rule_id") == "content_present")
        .select(F.explode("pointers").alias("p"))
        .select("p.keyword")
        .distinct()
        .collect()
    }
    assert kws_c == {"type", "minLength"}
    # no (row, rule) sink row carries a NULL pointers array
    assert viol.filter(F.col("pointers").isNull()).count() == 0


def test_run_incremental_pre_first_append_root_noop(spark, tmp_path):
    """Round-5 advice: a table root that exists but has no snapshot log
    yet (first append hasn't happened) is a benign no-op for a scheduled
    poller — returns None; a path full of non-snaplog content still
    raises so a typo can't masquerade as 'caught up'."""
    from fences_spark.run.runner import run_incremental

    empty = tmp_path / "pre_first_append"
    empty.mkdir()
    assert run_incremental(spark, files_ruleset(), str(empty), str(tmp_path / "o1")) is None

    meta_only = tmp_path / "meta_only"
    (meta_only / "metadata").mkdir(parents=True)
    (meta_only / "data").mkdir()
    assert run_incremental(spark, files_ruleset(), str(meta_only), str(tmp_path / "o2")) is None

    bogus = tmp_path / "bogus"
    bogus.mkdir()
    (bogus / "whatever.txt").write_text("not a table")
    with pytest.raises(ValueError, match="not a snapshot-log table"):
        run_incremental(spark, files_ruleset(), str(bogus), str(tmp_path / "o3"))
    with pytest.raises(ValueError, match="not a snapshot-log table"):
        run_incremental(spark, files_ruleset(), str(tmp_path / "missing"), str(tmp_path / "o4"))
