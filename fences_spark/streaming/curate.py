"""Streaming training-data curation: watermarked exact dedup and
windowed corpus statistics over a continuously ingested document
stream (SURVEY.md §2.F operators in their Structured Streaming form).

The reference is fully batch (SURVEY.md §2.B streaming row); these are
the streaming duals of `operators/dedup.exact_dup_groups` and
`operators/text.quality_score` aggregation, built on Spark's own
state store rather than any hand-rolled state:

- **exact dedup** uses ``dropDuplicatesWithinWatermark`` — state is
  keyed by the content fingerprint and evicted once the watermark
  passes ``event_time + delay``, so state size is bounded by the
  ingest rate × delay window (the property that keeps this viable on
  an unbounded 100 TB/day stream, where an unwatermarked
  ``dropDuplicates`` would grow state forever);
- **windowed stats** is a tumbling-window aggregate with a watermark
  in append mode: a window is emitted exactly once, when the
  watermark passes its end; a late row still lands in its window
  while that window is open, and is dropped entirely once the window
  has closed — the exact late-data contract (pinned in
  tests/test_streaming_curate.py) downstream consumers rely on.

Both write through Spark's WAL-checkpointed parquet sink, so a
restarted query resumes exactly-once without reprocessing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from fences_spark.operators import round6
from pyspark.sql.streaming import StreamingQuery

from fences_spark.operators.text import quality_score


@dataclass
class CurateStreamConfig:
    output_dir: str

    @property
    def dedup_path(self) -> str:
        return os.path.join(self.output_dir, "stream_dedup")

    @property
    def dedup_checkpoint(self) -> str:
        return os.path.join(self.output_dir, "stream_dedup_ckpt")

    @property
    def stats_path(self) -> str:
        return os.path.join(self.output_dir, "stream_stats")

    @property
    def stats_checkpoint(self) -> str:
        return os.path.join(self.output_dir, "stream_stats_ckpt")

    @property
    def sessions_path(self) -> str:
        return os.path.join(self.output_dir, "stream_sessions")

    @property
    def sessions_checkpoint(self) -> str:
        return os.path.join(self.output_dir, "stream_sessions_ckpt")


def dedup_stream(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str = "ts",
    delay: str = "1 hour",
    key_expr=None,
) -> DataFrame:
    """First-seen-wins dedup over a document stream: rows whose
    fingerprint was already seen within the watermark delay are
    dropped.  State is evicted by the watermark — a duplicate
    arriving after its original has aged out of state is re-admitted
    (the documented trade-off of bounded-state streaming dedup; run
    the batch `exact_dup_groups` pass for full-history dedup).

    ``key_expr`` selects WHAT counts as a duplicate: by default the
    normalized-content md5 (exact dedup); pass any deterministic
    Column factory ``text_col_name -> Column`` to coarsen it — e.g.
    ``lambda c: simhash(F.col(c))`` (operators/dedup.py) turns this
    into streaming NEAR-dup suppression: rows whose 32-bit SimHash
    collides with a recently seen one are dropped.  Same bounded
    state, same eviction semantics, any fingerprint."""
    if key_expr is None:
        fp = F.md5(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
        )
    else:
        fp = key_expr(text_col)
    return (
        stream_df.withColumn("fp", fp.cast("string"))
        .withWatermark(event_time_col, delay)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def windowed_doc_stats(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    text_col: str = "text",
    window_len: str = "10 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window corpus stats (doc count + mean quality score)
    with a watermark: in append output mode each window is finalized
    exactly once; rows arriving after their window closed are
    dropped."""
    q = quality_score(F.col(text_col))
    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window_len).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round6(F.avg(q)).alias("mean_quality"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_docs",
            "mean_quality",
        )
    )


def session_stream(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming sessionization: the streaming dual of the batch
    `session_window` entry (`sessionize_events`) — per-key sessions
    merge while events keep arriving within ``gap``; a session is
    FINALIZED (emitted, append mode) once the watermark passes its
    dynamic end, and its state is evicted.  State is bounded by
    (#active keys × open sessions), not stream length — the property
    that keeps per-user sessionization viable on an unbounded event
    stream.  Late rows re-open nothing: once a session closed, a row
    inside its span is dropped (same contract as windowed stats)."""
    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round6(F.sum(F.col(value_col))).alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("s.start").alias("s_start"),
            F.col("s.end").alias("s_end"),
            "n_events",
            "total_value",
        )
    )


def _start(out_df: DataFrame, path: str, checkpoint: str) -> StreamingQuery:
    return (
        out_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_dedup_stream(
    stream_df: DataFrame, cfg: CurateStreamConfig, **kwargs
) -> StreamingQuery:
    """Drain the currently available input through the watermarked
    dedup into a checkpointed parquet sink (availableNow)."""
    return _start(dedup_stream(stream_df, **kwargs), cfg.dedup_path, cfg.dedup_checkpoint)


def start_stats_stream(
    stream_df: DataFrame, cfg: CurateStreamConfig, **kwargs
) -> StreamingQuery:
    """Drain the currently available input through the windowed stats
    aggregate into a checkpointed parquet sink (availableNow)."""
    return _start(
        windowed_doc_stats(stream_df, **kwargs), cfg.stats_path, cfg.stats_checkpoint
    )


def start_session_stream(
    stream_df: DataFrame, cfg: CurateStreamConfig, **kwargs
) -> StreamingQuery:
    """Drain the currently available input through streaming
    sessionization into a checkpointed parquet sink (availableNow)."""
    return _start(
        session_stream(stream_df, **kwargs), cfg.sessions_path, cfg.sessions_checkpoint
    )
