"""Iceberg snapshot semantics (round-4 verdict item 8).

The sandbox has no Iceberg runtime jars, so the snapshot surface is
pinned two ways:

1. Option-passing pin: ``read_table`` on an identifier source must
   route through ``format("iceberg")`` with ``snapshot-id`` /
   ``start-snapshot-id`` passed verbatim (a recording fake reader —
   the exact strings a real Iceberg runtime would consume).
2. Semantics, end-to-end: :mod:`fences_spark.sources.snaplog`
   reproduces Iceberg's read semantics (time travel; incremental
   append scan, start-exclusive / end-inclusive) over plain parquet,
   and ``read_table`` honors both options on such tables — exercised
   through a real ValidationRunner resume: validate snapshot A, append
   snapshot B, resume incrementally from A and end up with exactly a
   full run's violations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fences_spark.sources import read_table, snapshot_fingerprint
from fences_spark.sources import snaplog
from fences_spark.synth import files_table


# ---------------------------------------------------------------- fakes
class _RecReader:
    def __init__(self):
        self.fmt, self.opts, self.loaded = None, {}, None

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self, source):
        self.loaded = source
        return "SENTINEL_DF"


class _FakeSpark:
    def __init__(self):
        self.reader = _RecReader()

    @property
    def read(self):
        return self.reader


def test_identifier_source_passes_iceberg_options_verbatim():
    fake = _FakeSpark()
    out = read_table(fake, "cat.db.files", snapshot_id="9876", start_snapshot_id="1234")
    assert out == "SENTINEL_DF"
    assert fake.reader.fmt == "iceberg"
    assert fake.reader.opts == {"snapshot-id": "9876", "start-snapshot-id": "1234"}
    assert fake.reader.loaded == "cat.db.files"


# ------------------------------------------------------------- snaplog
@pytest.fixture
def table(spark, tmp_path):
    """Two-snapshot table: A = ~2/3 of files_table(3000), B = rest."""
    root = str(tmp_path / "tbl")
    full = files_table(spark, 3000)
    in_b = F.pmod(F.xxhash64("path"), F.lit(3)) == 0
    a = snaplog.append(spark, root, full.filter(~in_b))
    b = snaplog.append(spark, root, full.filter(in_b))
    return root, a, b, full


def test_time_travel_and_current(spark, table):
    root, a, b, full = table
    n_a = snaplog.read(spark, root, snapshot_id=a).count()
    n_all = snaplog.read(spark, root).count()
    assert snaplog.current_snapshot_id(root) == b
    assert n_a < n_all == full.count()
    # as-of ids are first-class through read_table too
    assert read_table(spark, root, snapshot_id=a).count() == n_a
    assert read_table(spark, root).count() == n_all


def test_incremental_start_exclusive_end_inclusive(spark, table):
    root, a, b, full = table
    inc = snaplog.read_incremental(spark, root, start_snapshot_id=a)
    n_a = snaplog.read(spark, root, snapshot_id=a).count()
    assert inc.count() == full.count() - n_a  # only B's rows
    # start == current -> empty slice, schema intact
    empty = snaplog.read_incremental(spark, root, start_snapshot_id=b)
    assert empty.count() == 0 and empty.columns == full.columns
    # end inclusive: (after nothing, up to a] == a's rows
    assert (
        snaplog.read_incremental(spark, root, start_snapshot_id=a, end_snapshot_id=a).count()
        == 0
    )
    with pytest.raises(ValueError, match="precedes"):
        snaplog.read_incremental(spark, root, start_snapshot_id=b, end_snapshot_id=a)
    with pytest.raises(ValueError, match="unknown snapshot"):
        snaplog.read(spark, root, snapshot_id="nope")


def test_read_table_routes_incremental_and_fingerprint(spark, table):
    root, a, b, full = table
    inc = read_table(spark, root, start_snapshot_id=a)
    n_a = read_table(spark, root, snapshot_id=a).count()
    assert inc.count() == full.count() - n_a
    # fingerprint of a snaplog table is its committed snapshot id
    assert snapshot_fingerprint(root) == b


def test_append_schema_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snaplog.append(spark, root, spark.range(5).select(F.col("id").alias("x")))
    with pytest.raises(ValueError, match="schema mismatch"):
        snaplog.append(spark, root, spark.range(5).select(F.col("id").alias("y")))


def test_snapshot_ids_deterministic(spark, tmp_path):
    df = files_table(spark, 200)
    ids = []
    for name in ("t1", "t2"):
        root = str(tmp_path / name)
        ids.append(
            (snaplog.append(spark, root, df), snaplog.append(spark, root, df.limit(50)))
        )
    assert ids[0] == ids[1]  # same content chain -> same ids, no wall clock


# ------------------------------------------- end-to-end incremental resume
def test_runner_incremental_resume_equals_full_run(spark, tmp_path, table):
    from fences_spark.compiler.ruleset import RuleSet
    from fences_spark.run.runner import RunConfig, ValidationRunner
    from fences_spark.synth import LANGS

    root, a, b, full = table
    rules = (
        RuleSet()
        .add("content_nonempty", "content", {"type": "string", "minLength": 1})
        .add("lang_enum", "lang", {"enum": LANGS})
    )

    def run(df, out, snap):
        cfg = RunConfig(output_dir=str(tmp_path / out), run_id=f"r_{out}",
                        snapshot_id=snap, n_buckets=8)
        return ValidationRunner(spark, rules, cfg).run(df), cfg

    # initial run over snapshot A, then incremental resume over (a, b]
    s1, c1 = run(read_table(spark, root, snapshot_id=a), "o1", a)
    s2, c2 = run(read_table(spark, root, start_snapshot_id=a), "o2", b)
    n_a = read_table(spark, root, snapshot_id=a).count()
    assert s1.rows_processed == n_a
    assert s2.rows_processed == full.count() - n_a  # ONLY the appended rows

    # full-table rerun from scratch == union of the two runs' violations
    s3, c3 = run(read_table(spark, root), "o3", b)
    cols = ["repo", "path", "commit", "rule_id"]
    v12 = (
        spark.read.parquet(c1.violations_path)
        .select(*cols)
        .unionByName(spark.read.parquet(c2.violations_path).select(*cols))
    )
    v3 = spark.read.parquet(c3.violations_path).select(*cols)
    assert v12.exceptAll(v3).count() == 0 and v3.exceptAll(v12).count() == 0


def test_run_incremental_one_call_resume(spark, tmp_path):
    """run_incremental: full run on first call, appended-rows-only on
    the second, no-op when already caught up."""
    from fences_spark.compiler.ruleset import RuleSet
    from fences_spark.run.runner import last_validated_snapshot, run_incremental
    from fences_spark.synth import LANGS

    root, out = str(tmp_path / "tbl"), str(tmp_path / "out")
    full = files_table(spark, 2000)
    in_b = F.pmod(F.xxhash64("path"), F.lit(3)) == 0
    a = snaplog.append(spark, root, full.filter(~in_b))
    rules = RuleSet().add("lang_enum", "lang", {"enum": LANGS})

    s1 = run_incremental(spark, rules, root, out, n_buckets=8)
    n_a = snaplog.read(spark, root, snapshot_id=a).count()
    assert s1.rows_processed == n_a and s1.snapshot_id == a
    assert last_validated_snapshot(spark, root, out, 8) == a
    assert run_incremental(spark, rules, root, out, n_buckets=8) is None

    b = snaplog.append(spark, root, full.filter(in_b))
    s2 = run_incremental(spark, rules, root, out, n_buckets=8)
    assert s2.rows_processed == full.count() - n_a and s2.snapshot_id == b
    assert last_validated_snapshot(spark, root, out, 8) == b
    assert run_incremental(spark, rules, root, out, n_buckets=8) is None
    # lineage is one table across the chain
    cp = spark.read.parquet(str(tmp_path / "out" / "checkpoint"))
    assert {r["snapshot_id"] for r in cp.select("snapshot_id").distinct().collect()} == {a, b}


def test_append_type_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snaplog.append(spark, root, spark.range(5).select(F.col("id").alias("x")))
    with pytest.raises(ValueError, match="schema mismatch"):
        snaplog.append(
            spark, root, spark.range(5).select(F.col("id").cast("string").alias("x"))
        )


def test_append_retry_after_crash_between_replace_and_commit(spark, tmp_path, monkeypatch):
    """Crash window 1: data dir moved to its final snap-<id> location
    but the log commit never ran.  The orphan is invisible to readers
    (documented), and — because snap_id is deterministic — the retry
    regenerates the SAME id; it must clear the orphan and commit, not
    wedge forever on os.replace ENOTEMPTY (found by round-4 review)."""
    root = str(tmp_path / "tbl")
    df = spark.range(100).select(F.col("id").alias("x"))

    real_commit = snaplog._commit
    monkeypatch.setattr(snaplog, "_commit", lambda *a: (_ for _ in ()).throw(OSError("crash")))
    with pytest.raises(OSError, match="crash"):
        snaplog.append(spark, root, df)
    monkeypatch.setattr(snaplog, "_commit", real_commit)

    assert not snaplog.is_snaplog_table(root)  # orphan invisible
    sid = snaplog.append(spark, root, df)  # retry must succeed
    log = snaplog.read_log(root)
    assert [s["snapshot_id"] for s in log] == [sid]
    assert snaplog.read(spark, root, snapshot_id=sid).count() == 100


def test_concurrent_append_of_different_snapshot_detected(spark, tmp_path, monkeypatch):
    """TOCTOU window (round-5 advice): a concurrent writer that commits a
    DIFFERENT snapshot while our append is in flight must not be clobbered
    by our stale-log _commit — the optimistic re-read immediately before
    commit raises instead, and the racer's snapshot survives intact."""
    import os as _os

    root = str(tmp_path / "tbl")
    first = snaplog.append(spark, root, spark.range(10).select(F.col("id").alias("x")))

    real_replace = _os.replace
    state = {"raced": False, "racer_id": None}

    def racing_replace(src, dst):
        # fire exactly once, on the victim's data-dir promotion: restore
        # the real replace, let a concurrent append fully commit, then
        # finish the victim's own replace so it proceeds to its commit
        if not state["raced"] and "snap-" in _os.path.basename(str(dst)):
            state["raced"] = True
            monkeypatch.setattr(_os, "replace", real_replace)
            state["racer_id"] = snaplog.append(
                spark, root, spark.range(77).select(F.col("id").alias("x"))
            )
        real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", racing_replace)
    with pytest.raises(RuntimeError, match="concurrent append"):
        snaplog.append(spark, root, spark.range(33).select(F.col("id").alias("x")))

    # the racer's commit is intact: log chain is first -> racer, its data
    # readable, and the victim left no orphan data dir behind
    log = snaplog.read_log(root)
    assert [s["snapshot_id"] for s in log] == [first, state["racer_id"]]
    assert snaplog.read(spark, root).count() == 10 + 77
    data_dirs = sorted(
        n for n in _os.listdir(_os.path.join(root, "data")) if n.startswith("snap-")
    )
    assert data_dirs == sorted(f"snap-{s['snapshot_id']}" for s in log)
