"""Snapshot-log tables: Iceberg snapshot semantics over plain parquet.

The north rule reads an Iceberg table with snapshot pinning and
``start-snapshot-id`` incremental resume; the sandbox has no Iceberg
runtime jars, so this module reproduces the exact READ semantics the
engine depends on — append-only snapshots, time travel, and
incremental (exclusive-start, inclusive-end) reads — with the same
layering Iceberg itself uses: a tiny driver-side metadata log plus
immutable columnar data files that Spark scans natively.

Layout (all under one table root)::

    <root>/metadata/snapshots.json     ordered snapshot log (atomic
                                       replace on commit — the one
                                       mutable file, like Iceberg's
                                       version-hint/metadata.json)
    <root>/data/snap-<id>/*.parquet    immutable per-snapshot data

Scale notes (100 TB): the log is metadata only — O(#snapshots) driver
bytes, never shipped to executors.  Reads resolve the log to a list of
immutable directories and hand them to ``spark.read.parquet(*dirs)``,
so predicate pushdown, column pruning, and partition-size splitting
are exactly what a plain parquet scan gets; an incremental read scans
ONLY the appended snapshots' files (the point of Iceberg incremental
reads — no full-table rescan on resume).

Semantics matched to Iceberg's options (read via
``spark.read.format("iceberg").option(...)``):

- ``snapshot-id`` time travel: table state AS OF that snapshot
  (here: union of all snapshots up to and including it).
- ``start-snapshot-id`` (+ optional ``end-snapshot-id``) incremental
  append scan: rows committed AFTER start, up to and including end —
  start exclusive, end inclusive.

Snapshot ids are opaque deterministic strings (sha256 of parent id +
sorted file listing) — no wall clock, so tests and re-runs are
byte-stable; ordering lives in the log, as in Iceberg's
parent-pointer chain.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_META = "metadata"
_LOG = "snapshots.json"


def _log_path(root: str) -> str:
    return os.path.join(root, _META, _LOG)


def is_snaplog_table(root: str) -> bool:
    return os.path.isfile(_log_path(root))


def read_log(root: str) -> list[dict]:
    """Ordered snapshot log (oldest first). Each entry:
    {snapshot_id, parent_id, dir, n_files}."""
    with open(_log_path(root)) as f:
        return json.load(f)


def current_snapshot_id(root: str) -> str | None:
    log = read_log(root) if is_snaplog_table(root) else []
    return log[-1]["snapshot_id"] if log else None


def _commit(root: str, log: list[dict]) -> None:
    """Atomic log swap: temp file + rename, the parquet-dir analog of
    Iceberg's metadata-file commit (readers see the old or the new
    log, never a partial one)."""
    os.makedirs(os.path.join(root, _META), exist_ok=True)
    tmp = _log_path(root) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(log, f, indent=1)
    os.replace(tmp, _log_path(root))


def append(spark: SparkSession, root: str, df: DataFrame) -> str:
    """Commit ``df`` as a new snapshot; returns its snapshot id.

    The data write happens BEFORE the log commit: a crash between the
    two leaves an orphan directory invisible to every reader (safe),
    never a log entry pointing at missing data.
    """
    log = read_log(root) if is_snaplog_table(root) else []
    parent = log[-1]["snapshot_id"] if log else ""
    cols = [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
    if log:
        prev_cols = log[-1]["columns"]
        if cols != prev_cols:
            raise ValueError(
                f"snapshot schema mismatch: table has {prev_cols}, append has {cols}"
            )
    staging = os.path.join(root, "data", f"staging-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(staging)
    names = sorted(
        n for n in os.listdir(staging) if not n.startswith((".", "_"))
    )
    # id from parent + sorted data-file sizes: part-file NAMES embed
    # write UUIDs, sizes don't — so an identical content chain gets
    # identical ids (byte-stable tests/resumes) while within one table
    # the advancing parent makes collisions impossible.
    sizes = sorted(os.path.getsize(os.path.join(staging, n)) for n in names)
    snap_id = hashlib.sha256(
        "\n".join([parent, *map(str, sizes)]).encode()
    ).hexdigest()[:16]
    final = os.path.join(root, "data", f"snap-{snap_id}")
    if os.path.isdir(final):
        # Either an orphan from OUR attempt that crashed between
        # os.replace and _commit (invisible to readers — not in the
        # log — and the deterministic snap_id means this retry IS that
        # attempt: clear it so the retry isn't permanently wedged on
        # ENOTEMPTY), or a CONCURRENT writer racing us from the same
        # parent.  Re-read the log to tell them apart: a committed
        # snap-<id> must never be silently deleted — the table is
        # single-writer by contract (like a single Iceberg committer),
        # so surface the race loudly instead.
        fresh = read_log(root) if is_snaplog_table(root) else []
        if any(s["snapshot_id"] == snap_id for s in fresh):
            shutil.rmtree(staging, ignore_errors=True)
            raise RuntimeError(
                f"concurrent append detected: snapshot {snap_id} was "
                "committed by another writer while this append was in "
                "flight; snaplog tables are single-writer"
            )
        shutil.rmtree(final)
    os.replace(staging, final)
    # Optimistic-concurrency check: the snap_id probe above re-read the
    # log only when `final` already existed, and `log` itself is the
    # stale read from function entry — a concurrent writer that
    # committed a DIFFERENT snapshot mid-flight would otherwise be
    # silently clobbered by _commit (its log entry lost, its data
    # orphaned).  Re-read immediately before commit and fail loudly if
    # the parent advanced; our data dir is removed so the aborted
    # attempt leaves no orphan.
    fresh = read_log(root) if is_snaplog_table(root) else []
    fresh_parent = fresh[-1]["snapshot_id"] if fresh else ""
    if fresh_parent != parent:
        shutil.rmtree(final, ignore_errors=True)
        raise RuntimeError(
            f"concurrent append detected: table head moved from "
            f"{parent or '<empty>'} to {fresh_parent or '<empty>'} while "
            "this append was in flight; snaplog tables are single-writer"
        )
    log.append(
        {
            "snapshot_id": snap_id,
            "parent_id": parent or None,
            "dir": os.path.relpath(final, root),
            "n_files": len(names),
            "columns": cols,
        }
    )
    _commit(root, log)
    return snap_id


def _index_of(log: list[dict], snapshot_id: str) -> int:
    for i, s in enumerate(log):
        if s["snapshot_id"] == snapshot_id:
            return i
    raise ValueError(f"unknown snapshot id {snapshot_id!r}")


def _read_dirs(spark: SparkSession, root: str, entries: list[dict]) -> DataFrame:
    if not entries:
        # empty slice: schema from the newest snapshot's footer
        log = read_log(root)
        if not log:
            raise ValueError(f"snaplog table {root!r} has no snapshots")
        template = spark.read.parquet(os.path.join(root, log[-1]["dir"]))
        return template.limit(0)
    return spark.read.parquet(*[os.path.join(root, e["dir"]) for e in entries])


def read(
    spark: SparkSession, root: str, *, snapshot_id: str | None = None
) -> DataFrame:
    """Table state as of ``snapshot_id`` (default: current) — the
    ``snapshot-id`` time-travel read."""
    log = read_log(root)
    hi = _index_of(log, snapshot_id) if snapshot_id is not None else len(log) - 1
    return _read_dirs(spark, root, log[: hi + 1])


def read_incremental(
    spark: SparkSession,
    root: str,
    *,
    start_snapshot_id: str,
    end_snapshot_id: str | None = None,
) -> DataFrame:
    """Rows appended AFTER ``start_snapshot_id`` up to and including
    ``end_snapshot_id`` (default: current) — Iceberg's
    ``start-snapshot-id``/``end-snapshot-id`` incremental append scan
    (start exclusive, end inclusive)."""
    log = read_log(root)
    lo = _index_of(log, start_snapshot_id) + 1
    hi = _index_of(log, end_snapshot_id) if end_snapshot_id is not None else len(log) - 1
    if hi < lo - 1:
        raise ValueError("end snapshot precedes start snapshot")
    return _read_dirs(spark, root, log[lo : hi + 1])
