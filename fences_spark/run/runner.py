"""Partition-grain validation runner (north rule, BASELINE.json:6,14):
per-partition pass/fail verdicts, exact violation rows, metrics +
lineage, checkpoint/resume.

Design for 10^12 files:

- Work is keyed by a **bucket** = ``pmod(xxhash64(repo, path), n_buckets)``
  — content-defined, so the same row lands in the same bucket at any
  cluster size, any input partitioning, and across resumed runs
  (unlike ``spark_partition_id``, which is a physical accident).
- One Spark job processes *all pending buckets at once* (buckets are
  a lineage/retry grain, not a scheduling loop — looping would
  serialize the cluster).  Batching is available (``max_buckets_per_
  pass``) to bound the blast radius of a failure.
- Sinks are parquet tables partitioned by bucket, written with
  ``partitionOverwriteMode=dynamic`` so re-processing a bucket
  *replaces* its output — idempotent at the bucket grain.
- The checkpoint table records (run_id, snapshot_id, bucket, status,
  rows, secs).  Resume = re-run with the same run_id: completed
  buckets are skipped by an anti-join of the bucket list against the
  checkpoint (driver-side — it is ≤ n_buckets rows).
- Lineage per bucket: input snapshot fingerprint, rule-set hash, rows
  in, violations out, wall seconds — enough to answer "which input
  version produced this verdict, with which rules".
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from fences_spark.compiler.ruleset import RuleSet


@dataclass
class RunConfig:
    output_dir: str
    run_id: str
    snapshot_id: str = "unknown"
    n_buckets: int = 64
    bucket_keys: tuple[str, ...] = ("repo", "path")
    max_buckets_per_pass: int | None = None  # None = all pending in one job
    key_columns: tuple[str, ...] = ("repo", "path", "commit")
    # Instance-side violation diagnostics: when True the violations
    # sink gains a ``pointers array<struct<pointer,keyword>>`` column
    # per (row, rule) — the RFC-6901 locations from
    # compiler/pointers.py (JSON dual of the XSD NormalizedXPath
    # diagnostics, reference json_pointer.py:5-57).  Computed only on
    # rows that already failed the boolean tier, so the extra cost
    # scales with the defect rate, not the corpus.
    pointer_diagnostics: bool = False

    @property
    def violations_path(self) -> str:
        return os.path.join(self.output_dir, "violations")

    @property
    def verdicts_path(self) -> str:
        return os.path.join(self.output_dir, "verdicts")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.output_dir, "metrics")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.output_dir, "checkpoint")


def _ruleset_hash(rs: RuleSet) -> str:
    blob = json.dumps(rs.describe(), sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class RunSummary:
    run_id: str
    snapshot_id: str
    buckets_total: int
    buckets_skipped: int
    buckets_processed: int
    rows_processed: int
    violations_written: int
    passes: int = 1
    secs: float = 0.0


class ValidationRunner:
    def __init__(self, spark: SparkSession, ruleset: RuleSet, cfg: RunConfig):
        self.spark = spark
        self.ruleset = ruleset
        self.cfg = cfg
        self.rules_hash = _ruleset_hash(ruleset)

    # ------------------------------------------------------------------
    def _completed_buckets(self) -> set[int]:
        try:
            cp = self.spark.read.parquet(self.cfg.checkpoint_path)
        except Exception:
            return set()
        rows = (
            cp.filter(
                (F.col("run_id") == self.cfg.run_id)
                & (F.col("snapshot_id") == self.cfg.snapshot_id)
                & (F.col("status") == "done")
            )
            .select("bucket")
            .distinct()
            .collect()
        )
        return {r["bucket"] for r in rows}

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(*[F.col(k) for k in self.cfg.bucket_keys]),
                   F.lit(self.cfg.n_buckets)).cast("int"),
        )

    # ------------------------------------------------------------------
    def run(self, files: DataFrame) -> RunSummary:
        cfg = self.cfg
        done = self._completed_buckets()
        all_buckets = list(range(cfg.n_buckets))
        pending = [b for b in all_buckets if b not in done]
        summary = RunSummary(
            run_id=cfg.run_id,
            snapshot_id=cfg.snapshot_id,
            buckets_total=cfg.n_buckets,
            buckets_skipped=len(done),
            buckets_processed=0,
            rows_processed=0,
            violations_written=0,
            passes=0,
        )
        if not pending:
            return summary

        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        t0 = time.time()
        step = cfg.max_buckets_per_pass or len(pending)
        df_b = self._with_bucket(files)
        for i in range(0, len(pending), step):
            batch = pending[i : i + step]
            self._run_batch(df_b, batch, summary)
            summary.passes += 1
        summary.secs = time.time() - t0
        return summary

    # ------------------------------------------------------------------
    def _clear_bucket_partitions(self, path: str, buckets: list[int]) -> None:
        """Dynamic partition overwrite only replaces partitions that
        appear in the NEW data — a re-processed bucket whose new
        result is empty (e.g. zero violations after a crash-resume)
        would otherwise keep its stale files.  Explicitly drop the
        batch's partitions first (Hadoop FS API — works on any
        Hadoop-compatible FS; the Iceberg sink's overwritePartitions
        subsumes this)."""
        jvm = self.spark.sparkContext._jvm  # noqa: SLF001
        jsc = self.spark.sparkContext._jsc  # noqa: SLF001
        conf = jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        if not fs.exists(p):
            return
        for b in buckets:
            bp = jvm.org.apache.hadoop.fs.Path(path, f"bucket={b}")
            if fs.exists(bp):
                fs.delete(bp, True)

    def _run_batch(self, df_b: DataFrame, buckets: list[int], summary: RunSummary) -> None:
        cfg = self.cfg
        t0 = time.time()
        if len(buckets) == cfg.n_buckets:
            part = df_b  # full run: skip the filter, scan everything
        else:
            part = df_b.filter(F.col("bucket").isin(buckets))

        res = self.ruleset.apply(part)
        annotated = res.df.withColumn(
            "content_sha256",
            F.sha2(F.col("content"), 256) if "content" in part.columns else F.lit(None).cast("string"),
        )

        # violations: exact rows, partitioned by bucket (idempotent
        # dynamic overwrite)
        keep = [c for c in cfg.key_columns if c in annotated.columns]
        failing = annotated.filter(~F.col("row_valid"))
        if cfg.pointer_diagnostics:
            # One struct per FAILING rule carrying that rule's pointer
            # entries; cardinality is identical to explode(violations)
            # (a rule whose pointer tier yields no entries still emits
            # its row, with an empty array).  The row_valid filter
            # sits below this projection, so pointer expressions touch
            # only defective rows.
            per_rule = self.ruleset.pointer_entries_per_rule(failing)
            viol = (
                failing.select(
                    "bucket", *keep, F.col("content_sha256"),
                    F.explode(per_rule).alias("_v"),
                )
                .select(
                    "bucket", *keep, "content_sha256",
                    "_v.rule_id", "_v.pointers",
                )
            )
        else:
            viol = failing.select(
                "bucket", *keep, F.col("content_sha256"),
                F.explode("violations").alias("rule_id"),
            )
        self._clear_bucket_partitions(cfg.violations_path, buckets)
        viol.write.mode("overwrite").partitionBy("bucket").parquet(cfg.violations_path)

        # verdicts: (bucket, rule_id, n_pass, n_fail, passed)
        agg_exprs = []
        for rid in res.rule_ids:
            agg_exprs.append(F.sum(F.col(rid).cast("long")).alias(f"{rid}__pass"))
            agg_exprs.append(F.sum((~F.col(rid)).cast("long")).alias(f"{rid}__fail"))
        # persist: the aggregate is ≤ n_buckets rows, but it sits on a
        # full input scan — without it the verdicts write AND the
        # metrics collect below would each re-scan the input (a third
        # full pass at 10^12-row scale)
        # violation_rows counts EXPLODED (row, rule) violation rows —
        # a row breaking k rules contributes k — matching exactly what
        # the violations sink wrote; rows_invalid counts rows.
        per_bucket = annotated.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("row_valid")).cast("long")).alias("rows_invalid"),
            F.sum(F.size("violations")).alias("violation_rows"),
            *agg_exprs,
        ).persist()
        stack = ", ".join(f"'{rid}', {rid}__pass, {rid}__fail" for rid in res.rule_ids)
        verdicts = per_bucket.selectExpr(
            "bucket",
            "rows",
            f"stack({len(res.rule_ids)}, {stack}) as (rule_id, n_pass, n_fail)",
        ).withColumn("passed", F.col("n_fail") == 0)
        self._clear_bucket_partitions(cfg.verdicts_path, buckets)
        verdicts.write.mode("overwrite").partitionBy("bucket").parquet(cfg.verdicts_path)

        # metrics + lineage per bucket (driver-collected: ≤ n_buckets rows)
        stats = per_bucket.select(
            "bucket", "rows", "rows_invalid", "violation_rows"
        ).collect()
        per_bucket.unpersist()
        secs = time.time() - t0
        seen = {r["bucket"] for r in stats}
        lineage = {
            "snapshot_id": cfg.snapshot_id,
            "rules_hash": self.rules_hash,
            "rule_ids": res.rule_ids,
            "tiers": res.tiers,
        }
        metric_rows = []
        cp_rows = []
        for b in buckets:
            row = next((r for r in stats if r["bucket"] == b), None)
            n_rows = row["rows"] if row else 0
            n_inv = row["rows_invalid"] if row else 0
            metric_rows.append(
                (cfg.run_id, cfg.snapshot_id, int(b), int(n_rows), int(n_inv),
                 float(secs), json.dumps(lineage))
            )
            cp_rows.append((cfg.run_id, cfg.snapshot_id, int(b), "done", int(n_rows), float(secs)))
            if b in seen:
                summary.rows_processed += int(n_rows)
        summary.buckets_processed += len(buckets)
        summary.violations_written += sum(r["violation_rows"] for r in stats)

        self.spark.createDataFrame(
            metric_rows,
            "run_id string, snapshot_id string, bucket int, rows long, "
            "rows_invalid long, secs double, lineage_json string",
        ).write.mode("append").parquet(cfg.metrics_path)
        self.spark.createDataFrame(
            cp_rows,
            "run_id string, snapshot_id string, bucket int, status string, "
            "rows long, secs double",
        ).write.mode("append").parquet(cfg.checkpoint_path)


# ---------------------------------------------------------------------------
# snapshot-incremental resume (snaplog/Iceberg tables)
# ---------------------------------------------------------------------------
def last_validated_snapshot(
    spark: SparkSession, table_root: str, output_dir: str, n_buckets: int = 64
) -> str | None:
    """Newest snapshot in the table's log whose validation completed —
    every bucket checkpointed "done" for that snapshot_id.  Walks the
    snapshot log newest-first (log order is commit order; checkpoint
    rows carry no clock), reading only the ≤ runs × n_buckets-row
    checkpoint table driver-side."""
    from fences_spark.sources import snaplog

    if not snaplog.is_snaplog_table(table_root):
        return None
    try:
        cp = spark.read.parquet(os.path.join(output_dir, "checkpoint"))
    except Exception:
        return None
    done = (
        cp.filter(F.col("status") == "done")
        .groupBy("snapshot_id")
        .agg(F.countDistinct("bucket").alias("buckets"))
        .collect()
    )
    complete = {r["snapshot_id"] for r in done if r["buckets"] >= n_buckets}
    for entry in reversed(snaplog.read_log(table_root)):
        if entry["snapshot_id"] in complete:
            return entry["snapshot_id"]
    return None


def run_incremental(
    spark: SparkSession,
    ruleset: RuleSet,
    table_root: str,
    output_dir: str,
    *,
    run_id: str | None = None,
    n_buckets: int = 64,
    **cfg_kwargs,
) -> RunSummary | None:
    """Validate only rows appended since the last fully-validated
    snapshot of a snapshot-log table (the north rule's
    ``start-snapshot-id`` resume, BASELINE.json:14, as one call).

    - no prior completed snapshot → full run at the current snapshot;
    - prior == current → nothing to do, returns ``None``;
    - table root exists but holds no snapshot log yet (its first
      append has not happened) → nothing to validate, returns
      ``None`` — a scheduled poller pointed at a pre-created table
      root keeps no-opping until data arrives;
    - ``table_root`` is not a snaplog table at all (missing path, or
      a directory with non-snaplog content — e.g. a catalog
      identifier or a typo) → raises ``ValueError`` rather than
      silently reporting "caught up" on a path that will never
      validate anything;
    - otherwise → incremental read (prior, current], validated under
      run_id ``incr_<current>`` so the checkpoint table records the
      new snapshot's buckets independently of the old run's.

    Violations/verdicts land in per-snapshot subdirectories of
    ``output_dir`` (append-only history, mirroring the input's
    snapshot chain); metrics/checkpoint stay shared so lineage is one
    table across the chain.
    """
    from fences_spark.sources import read_table, snaplog

    current = snaplog.current_snapshot_id(table_root)
    if current is None:
        # Distinguish two "no snapshot" cases.  A table root that
        # EXISTS but has no log (or an empty log) is simply waiting
        # for its first append — a benign no-op for a scheduled
        # poller.  Anything else (missing path, a directory full of
        # non-snaplog content, a catalog identifier) must NOT
        # silently no-op: None is indistinguishable from the
        # legitimate "already caught up" return below, so the caller
        # would believe validation is current while nothing can ever
        # run.
        if os.path.isdir(table_root):
            entries = [
                n for n in os.listdir(table_root) if not n.startswith((".", "_"))
            ]
            if set(entries) <= {"metadata", "data"}:
                return None  # pre-first-append table root: nothing to validate yet
        raise ValueError(
            f"{table_root!r} is not a snapshot-log table (and not an "
            "empty pre-first-append table root); for catalog (Iceberg) "
            "sources drive the runner directly with "
            "read_table(..., start_snapshot_id=..., snapshot_id=...) "
            "from the catalog's own snapshot ids"
        )
    prior = last_validated_snapshot(spark, table_root, output_dir, n_buckets)
    if prior == current:
        return None
    if prior is None:
        df = read_table(spark, table_root, snapshot_id=current)
    else:
        df = read_table(
            spark, table_root, start_snapshot_id=prior, snapshot_id=current
        )
    cfg = RunConfig(
        output_dir=os.path.join(output_dir, f"snap-{current}"),
        run_id=run_id or f"incr_{current}",
        snapshot_id=current,
        n_buckets=n_buckets,
        **cfg_kwargs,
    )
    # shared lineage: metrics + checkpoint live at the table grain
    runner = ValidationRunner(spark, ruleset, cfg)
    summary = runner.run(df)
    from fences_spark import fsutil

    for name in ("metrics", "checkpoint"):
        src = os.path.join(cfg.output_dir, name)
        dst = os.path.join(output_dir, name)
        # precise guard for "empty run wrote nothing"; a real write
        # failure (permissions, disk) must propagate — swallowing it
        # would leave the snapshot permanently incomplete with no
        # signal, re-walking the same range on every resume.  The
        # existence check goes through the Hadoop FS API so remote
        # (hdfs://, s3a://) output_dirs behave like local ones.
        if fsutil.exists(spark, src):
            spark.read.parquet(src).write.mode("append").parquet(dst)
    return summary
