"""Source abstraction: Iceberg table identifier or Parquet path.

The north rule targets an Iceberg table of source-code repositories
(BASELINE.json:14,15); the sandbox has no Iceberg jars, so the reader
takes either — an identifier (``catalog.db.table``) routed through
``spark.read.format("iceberg")`` with optional snapshot/incremental
options, or a filesystem path routed through parquet.  Snapshot
pinning keeps a resumed run reading the exact data version its
checkpoint describes.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def is_path(source: str) -> bool:
    return "/" in source or source.startswith(".") or os.path.exists(source)


def read_table(
    spark: SparkSession,
    source: str,
    *,
    snapshot_id: str | None = None,
    start_snapshot_id: str | None = None,
) -> DataFrame:
    """Read an Iceberg table (by identifier) or Parquet (by path).

    - ``snapshot_id``: time-travel pin (Iceberg ``snapshot-id``).
    - ``start_snapshot_id``: incremental read lower bound (Iceberg
      ``start-snapshot-id``, exclusive) for batch-incremental resume.

    Path sources: a snapshot-log table (``metadata/snapshots.json``
    present — :mod:`fences_spark.sources.snaplog`) honors BOTH options
    with Iceberg's exact semantics; a bare parquet directory ignores
    them (the directory IS the snapshot; see
    :func:`snapshot_fingerprint`).
    """
    if is_path(source):
        from fences_spark.sources import snaplog

        if snaplog.is_snaplog_table(source):
            if start_snapshot_id is not None:
                return snaplog.read_incremental(
                    spark, source,
                    start_snapshot_id=start_snapshot_id,
                    end_snapshot_id=snapshot_id,
                )
            return snaplog.read(spark, source, snapshot_id=snapshot_id)
        return spark.read.parquet(source)
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", snapshot_id)
    if start_snapshot_id is not None:
        reader = reader.option("start-snapshot-id", start_snapshot_id)
    try:
        return reader.load(source)
    except Exception as exc:  # iceberg jars absent in the sandbox
        raise RuntimeError(
            f"Iceberg source {source!r} unavailable (runtime jars not on "
            "classpath?); pass a parquet path in this sandbox"
        ) from exc


def snapshot_fingerprint(source: str) -> str:
    """Stable id of the current data version.  For a parquet dir:
    sha256 of the sorted (name, size, mtime) listing — the sandbox
    stand-in for an Iceberg snapshot id.  Snapshot-log tables return
    their real current snapshot id (log-committed, mtime-independent)."""
    if not is_path(source):
        return "iceberg-current"
    from fences_spark.sources import snaplog

    if snaplog.is_snaplog_table(source):
        return snaplog.current_snapshot_id(source) or "empty"
    entries = []
    for root, _dirs, names in os.walk(source):
        for n in sorted(names):
            p = os.path.join(root, n)
            st = os.stat(p)
            entries.append(f"{os.path.relpath(p, source)}:{st.st_size}:{int(st.st_mtime)}")
    return hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()[:16]


def read_path(spark: SparkSession, path: str, *, fmt: str = "parquet") -> DataFrame:
    """Columnar-path reader with an explicit format: ``parquet`` or
    ``orc`` (both Spark-native columnar sources with predicate
    pushdown and column pruning; the engine is format-agnostic above
    this call)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format {fmt!r}")
    return spark.read.format(fmt).load(path)


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Raw media/corpus ingest via Spark's ``binaryFile`` source:
    (path, modificationTime, length, content binary) — one row per
    file, the entry point that feeds `operators.multimodal` (payload =
    content, metadata from path/length).  Large files note: each file
    must fit in one task's memory (binaryFile does not split), so
    shard oversized media upstream or cap with
    ``spark.sql.files.maxPartitionBytes`` sizing."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
