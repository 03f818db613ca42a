"""Streaming SCHEMA-drift monitor: the streaming dual of JSON schema
discovery (operators.jsonprofile) — watch a stream of JSON documents
and alert when their observed structure departs from a baseline
profile.

Each micro-batch is profiled with the same depth-bounded
variant-explode pass the batch profiler uses, then diffed against the
STATIC baseline (path, jtype) set inside ``foreachBatch``:

- ``new_path``  — a path the baseline never saw (a producer started
  emitting a new field);
- ``new_type`` — a known path observed with a type the baseline never
  saw there (the classic silent producer-side schema break).

One row per anomaly per epoch lands in a WAL-checkpointed parquet
sink partitioned by epoch id with per-epoch overwrite (same
idempotent-retry contract as streaming.drift; lineage resets reuse
``drift.reset_stale_epochs``).  Conforming batches write nothing.

Scale notes: the per-batch profile is one variant-explode pass over
the batch (linear in batch bytes), the diff joins against a
baseline whose size is the SCHEMA size — broadcast by AQE — and the
sink only carries anomalies.  No reference precedent (SURVEY.md
§2.F).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from fences_spark.streaming.drift import reset_stale_epochs


@dataclass
class SchemaDriftConfig:
    output_dir: str

    @property
    def sink_path(self) -> str:
        return os.path.join(self.output_dir, "schema_drift")

    @property
    def checkpoint(self) -> str:
        return os.path.join(self.output_dir, "schema_drift_ckpt")


def start_schema_drift_stream(
    stream_df: DataFrame,
    baseline_profile: DataFrame,
    cfg: SchemaDriftConfig,
    *,
    id_col: str,
    json_col: str,
    max_depth: int = 3,
) -> StreamingQuery:
    """Emit (path, jtype, status, n, n_docs) anomaly rows per epoch
    for structure in the stream that ``baseline_profile`` (a
    ``json_path_profile`` result or any (path, jtype) relation) never
    observed.  availableNow drains a replay in one epoch."""
    from fences_spark.operators.jsonprofile import json_path_profile

    sess = stream_df.sparkSession
    base_pt = baseline_profile.select("path", "jtype").distinct()
    base_paths = baseline_profile.select("path").distinct()

    def score(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        prof = json_path_profile(batch, id_col, json_col, max_depth=max_depth)
        fresh = prof.join(base_pt, ["path", "jtype"], "left_anti")
        out = (
            fresh.join(
                base_paths.withColumn("_known", F.lit(True)), "path", "left"
            )
            .select(
                "path",
                "jtype",
                F.when(F.col("_known"), F.lit("new_type"))
                .otherwise(F.lit("new_path"))
                .alias("status"),
                "n",
                "n_docs",
            )
        )
        # idempotent per-epoch overwrite, same contract as drift
        out.write.mode("overwrite").parquet(
            os.path.join(cfg.sink_path, f"epoch_id={epoch_id}")
        )

    reset_stale_epochs(sess, cfg.sink_path, cfg.checkpoint)
    # pre-create the sink schema under the reserved epoch_id=-1
    # partition: a fully conforming replay writes no anomaly rows, and
    # readers must still find an (empty) sink, not a missing path
    sess.createDataFrame(
        [], "path string, jtype string, status string, n long, n_docs long"
    ).write.mode("append").parquet(os.path.join(cfg.sink_path, "epoch_id=-1"))

    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint)
        .foreachBatch(score)
        .trigger(availableNow=True)
        .start()
    )
