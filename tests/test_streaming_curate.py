"""Streaming curation: watermarked exact dedup (state-bounded, with
eviction re-admission semantics) and windowed doc stats (append-mode
finalization + late-row drop)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from fences_spark.streaming.curate import (
    CurateStreamConfig,
    start_dedup_stream,
    start_stats_stream,
)

T0 = datetime(2026, 1, 1, 12, 0, 0)
DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def _write(spark, src, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain_dedup(spark, src, cfg):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = start_dedup_stream(stream, cfg, delay="1 hour")
    q.awaitTermination(120)
    assert not q.isActive


def _drain_stats(spark, src, cfg):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = start_stats_stream(stream, cfg, window_len="10 minutes", delay="10 minutes")
    q.awaitTermination(120)
    assert not q.isActive


class TestStreamingDedup:
    @pytest.fixture(scope="class")
    def dirs(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("sdedup")
        return str(root / "src"), CurateStreamConfig(output_dir=str(root / "out"))

    def test_first_seen_wins_within_and_across_drains(self, spark, dirs):
        src, cfg = dirs
        _write(spark, src, [
            (1, "alpha text", T0),
            (2, "beta text", T0 + timedelta(minutes=1)),
            (3, "alpha text", T0 + timedelta(minutes=2)),   # dup of 1, same batch
            (4, "gamma text", T0 + timedelta(minutes=3)),
            (5, "beta text", T0 + timedelta(minutes=4)),    # dup of 2, same batch
        ])
        _drain_dedup(spark, src, cfg)
        out = spark.read.parquet(cfg.dedup_path)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 4]

        # second drain, same checkpoint: in-state dup dropped, new text kept
        _write(spark, src, [
            (6, "alpha text", T0 + timedelta(minutes=10)),  # dup, state alive
            (7, "delta text", T0 + timedelta(minutes=11)),
        ])
        _drain_dedup(spark, src, cfg)
        out = spark.read.parquet(cfg.dedup_path)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 4, 7]

    def test_eviction_readmits_after_watermark_passes(self, spark, dirs):
        src, cfg = dirs
        # advance the watermark far past alpha's (event_time + delay)
        _write(spark, src, [(8, "epsilon text", T0 + timedelta(hours=10))])
        _drain_dedup(spark, src, cfg)
        # alpha's state (expires T0+1h) is now evicted -> re-admitted
        _write(spark, src, [(9, "alpha text", T0 + timedelta(hours=10, minutes=1))])
        _drain_dedup(spark, src, cfg)
        ids = sorted(
            r["doc_id"] for r in spark.read.parquet(cfg.dedup_path).collect()
        )
        assert ids == [1, 2, 4, 7, 8, 9]


class TestWindowedStats:
    def test_append_finalization_and_late_drop(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("sstats")
        src = str(root / "src")
        cfg = CurateStreamConfig(output_dir=str(root / "out"))

        w1 = [  # window [12:00, 12:10)
            (1, "the quick brown fox jumps over the lazy dog", T0 + timedelta(minutes=1)),
            (2, "a window that is full of reasonable text", T0 + timedelta(minutes=4)),
            (3, "more text for the first window here", T0 + timedelta(minutes=8)),
        ]
        w2 = [  # window [12:10, 12:20)
            (4, "second window document text", T0 + timedelta(minutes=11)),
            (5, "another second window document", T0 + timedelta(minutes=12)),
        ]
        _write(spark, src, w1 + w2)
        _drain_stats(spark, src, cfg)  # watermark after: 12:12 - 10m = 12:02

        # a row older than the watermark but in a STILL-OPEN window is
        # accepted (Spark drops rows only once their window is closed),
        # so first advance the watermark past both windows...
        flush = (7, "far future row advancing the watermark", T0 + timedelta(minutes=40))
        _write(spark, src, [flush])
        _drain_stats(spark, src, cfg)  # watermark -> 12:30; W1+W2 finalized

        # ...then a row for the now-closed first window: dropped entirely
        late = (6, "late row for the first window", T0 + timedelta(minutes=1, seconds=30))
        _write(spark, src, [late])
        _drain_stats(spark, src, cfg)

        out = {
            r["w_start"]: (r["n_docs"], r["mean_quality"])
            for r in spark.read.parquet(cfg.stats_path).collect()
        }
        # both early windows finalized exactly once, late row NOT counted,
        # the 12:40 window still open (not emitted)
        assert set(out) == {T0 + timedelta(minutes=0), T0 + timedelta(minutes=10)}
        assert out[T0][0] == 3
        assert out[T0 + timedelta(minutes=10)][0] == 2

        # mean quality matches the batch formula over the on-time rows
        from fences_spark.operators.text import quality_score

        batch = spark.createDataFrame(w1, DOC_SCHEMA).agg(
            F.round(F.avg(quality_score(F.col("text"))), 6).alias("q")
        ).first()["q"]
        assert out[T0][1] == batch


class TestStatefulRunningStats:
    def test_cumulative_totals_across_drains(self, spark, tmp_path_factory):
        from fences_spark.operators.text import quality_score, whitespace_token_count
        from fences_spark.streaming.stateful import (
            StatefulStreamConfig,
            start_running_stats_stream,
        )

        root = tmp_path_factory.mktemp("sstate")
        src = str(root / "src")
        cfg = StatefulStreamConfig(output_dir=str(root / "out"))

        b1 = [
            (1, "the quick brown fox jumps over the dog", "en", T0),
            (2, "a second english document with plain text", "en", T0),
            (3, "der hund und die katze sind gute tiere", "de", T0),
        ]
        b2 = [
            (4, "one more english document for the running total", "en", T0),
        ]
        schema = "doc_id long, text string, lang string, ts timestamp"

        def drain():
            stream = spark.readStream.schema(schema).parquet(src)
            q = start_running_stats_stream(stream, cfg)
            q.awaitTermination(120)
            assert not q.isActive

        spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
        drain()
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
        drain()

        out = spark.read.parquet(cfg.stats_path)
        latest = {
            r["stratum"]: r
            for r in out.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("stratum").orderBy(F.col("epoch_id").desc())
                ),
            ).filter(F.col("rn") == 1).collect()
        }

        # batch ground truth over ALL rows seen so far
        full = spark.createDataFrame(b1 + b2, schema)
        truth = {
            r["lang"]: r
            for r in full.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(whitespace_token_count(F.col("text"))).alias("n_tokens"),
                F.round(F.avg(quality_score(F.col("text"))), 6).alias("mq"),
            ).collect()
        }
        for lang in ("en", "de"):
            assert latest[lang]["n_docs"] == truth[lang]["n_docs"]
            assert latest[lang]["n_tokens"] == truth[lang]["n_tokens"]
            assert abs(latest[lang]["mean_quality"] - truth[lang]["mq"]) < 1e-9
        # de untouched by drain 2: its only row came from epoch of drain 1
        assert latest["de"]["n_docs"] == 1


EV_SCHEMA = "user_id long, value double, ts timestamp"


def _write_events(spark, src, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain_sessions(spark, src, cfg):
    from fences_spark.streaming.curate import start_session_stream

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    start_session_stream(stream, cfg, gap="30 minutes", delay="30 minutes"
                         ).awaitTermination()


class TestStreamingSessionization:
    def test_sessions_merge_finalize_and_match_batch(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("ssess")
        src = str(root / "src")
        cfg = CurateStreamConfig(output_dir=str(root / "out"))

        rows = [
            # user 1: two events 20 min apart -> ONE session (gap 30m)
            (1, 1.0, T0),
            (1, 2.0, T0 + timedelta(minutes=20)),
            # user 1 again 40 min later -> a SECOND session
            (1, 4.0, T0 + timedelta(minutes=60)),
            # user 2: single-event session
            (2, 8.0, T0 + timedelta(minutes=5)),
        ]
        _write_events(spark, src, rows)
        _drain_sessions(spark, src, cfg)

        # advance the watermark far past every session's dynamic end
        _write_events(spark, src, [(9, 0.0, T0 + timedelta(hours=5))])
        _drain_sessions(spark, src, cfg)

        got = {
            (r["user_id"], r["s_start"]): (r["s_end"], r["n_events"], r["total_value"])
            for r in spark.read.parquet(cfg.sessions_path).collect()
        }
        # session ends are last-event + gap (dynamic), exactly the
        # batch session_window semantics
        assert got[(1, T0)] == (T0 + timedelta(minutes=50), 2, 3.0)
        assert got[(1, T0 + timedelta(minutes=60))] == (T0 + timedelta(minutes=90), 1, 4.0)
        assert got[(2, T0 + timedelta(minutes=5))] == (T0 + timedelta(minutes=35), 1, 8.0)
        # flush row's own session is still open -> not emitted
        assert all(k[0] != 9 for k in got)

        # parity with the BATCH session_window over the same rows
        batch = {
            (r["user_id"], r["s_start"]): (r["s_end"], r["n_events"], r["total_value"])
            for r in (
                spark.createDataFrame(rows, EV_SCHEMA)
                .groupBy(F.session_window(F.col("ts"), "30 minutes").alias("s"), "user_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.round(F.sum("value"), 6).alias("total_value"))
                .select("user_id", F.col("s.start").alias("s_start"),
                        F.col("s.end").alias("s_end"), "n_events", "total_value")
            ).collect()
        }
        assert got == batch

    def test_late_row_after_session_closed_is_dropped(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("ssess2")
        src = str(root / "src")
        cfg = CurateStreamConfig(output_dir=str(root / "out"))

        _write_events(spark, src, [(1, 1.0, T0)])
        _drain_sessions(spark, src, cfg)
        _write_events(spark, src, [(9, 0.0, T0 + timedelta(hours=5))])
        _drain_sessions(spark, src, cfg)  # user 1's session finalized

        # a row INSIDE user 1's closed session span: dropped, session
        # is not re-opened or re-emitted
        _write_events(spark, src, [(1, 99.0, T0 + timedelta(minutes=10))])
        _drain_sessions(spark, src, cfg)

        out = [r for r in spark.read.parquet(cfg.sessions_path).collect()
               if r["user_id"] == 1]
        assert len(out) == 1
        assert (out[0]["n_events"], out[0]["total_value"]) == (1, 1.0)


class TestStreamingNearDup:
    def test_simhash_key_suppresses_near_duplicates(self, spark, tmp_path_factory):
        from fences_spark.operators.dedup import simhash
        from fences_spark.streaming.curate import dedup_stream

        root = tmp_path_factory.mktemp("sneardup")
        src = str(root / "src")
        cfg = CurateStreamConfig(output_dir=str(root / "out"))

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, base, T0),
            # near-duplicate: two tokens SWAPPED — SimHash is a bag of
            # token votes (order-insensitive, signature collides) but
            # the normalized-content md5 differs, so the default exact
            # fingerprint would NOT suppress this row; only the
            # key_expr=simhash path can
            (2, base.replace("quick brown", "brown quick"), T0 + timedelta(minutes=1)),
            # genuinely different document: survives
            (3, "completely unrelated text about spark shuffles and joins", T0 + timedelta(minutes=2)),
        ]
        _write(spark, src, rows)

        from fences_spark.streaming.curate import _start
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        out = dedup_stream(stream, key_expr=lambda c: simhash(F.col(c)))
        _start(out, cfg.dedup_path, cfg.dedup_checkpoint).awaitTermination()

        kept = sorted(r["doc_id"] for r in spark.read.parquet(cfg.dedup_path).collect())
        assert kept == [1, 3]

        # sanity: the near-dups share a SimHash but NOT the exact
        # fingerprint (so this test would catch a regression that
        # ignored key_expr and fell back to exact dedup); doc 3 shares
        # neither
        df3 = spark.createDataFrame(rows, DOC_SCHEMA)
        sims = {r["doc_id"]: r["sh"] for r in df3
                .select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
        assert sims[1] == sims[2] != sims[3]
        fps = {r["doc_id"]: r["fp"] for r in df3.select(
            "doc_id",
            F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))).alias("fp"),
        ).collect()}
        assert fps[1] != fps[2]


class TestStreamSessionizeEntry:
    """The driver-gated streaming replay entry: one availableNow drain
    over the static events table emits exactly the batch sessions
    finalized by the final watermark (max ts - delay), tie-inclusive."""

    def test_entry_matches_batch_finalized(self, spark):
        import datetime

        from fences_spark.entry_queries import q_sessionize_events, q_stream_sessionize_events

        sf = "/root/testdata/sf0.001"
        got = {
            (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n_events"], r["sum_value"])
            for r in q_stream_sessionize_events(spark, sf).collect()
        }
        batch = q_sessionize_events(spark, sf)
        mx = spark.read.parquet(f"{sf}/events.parquet").agg(F.max("ts")).collect()[0][0]
        wm = mx - datetime.timedelta(minutes=30)
        want = {
            (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n_events"], r["sum_value"])
            for r in batch.collect()
            if r["s_end"] <= wm
        }
        assert got == want
        assert len(got) > 0
        # at least one open (non-finalized) trailing session exists,
        # so the finalization filter is actually exercised
        assert batch.count() > len(got)


class TestStreamingDrift:
    def test_windowed_divergence_and_finalization(self, spark, tmp_path_factory):
        """Three 1-hour windows of event types: window 0 matches the
        baseline exactly (psi = 0), window 1 is fully shifted (large
        psi, tvd > 0), window 2 ends after the final watermark and
        must NOT be emitted."""
        import math

        from fences_spark.streaming.drift import DriftStreamConfig, start_drift_stream

        root = tmp_path_factory.mktemp("sdrift")
        src = str(root / "src")
        rows = []
        # window 0 (12:00-13:00): 2 a + 2 b — identical to baseline
        for i, et in enumerate(["a", "b", "a", "b"]):
            rows.append((i, et, T0 + timedelta(minutes=i)))
        # window 1 (13:00-14:00): all a — shifted
        for i in range(4):
            rows.append((10 + i, "a", T0 + timedelta(hours=1, minutes=i)))
        # sentinel in window 2 (14:00-15:00) at 14:40: watermark =
        # 14:40 - 30m = 14:10 ≥ window 1's end (14:00) → windows 0+1
        # finalize; window 2 itself ends 15:00 > 14:10 → not emitted
        rows.append((20, "b", T0 + timedelta(hours=2, minutes=40)))
        df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
        df.coalesce(1).write.parquet(src)
        base = spark.createDataFrame([("a", 50), ("b", 50)], "bucket string, cnt long")
        cfg = DriftStreamConfig(output_dir=str(root / "out"))
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = start_drift_stream(
            stream, base, cfg, col="event_type",
            window_len="1 hour", delay="30 minutes",
        )
        q.awaitTermination(120)
        assert not q.isActive
        out = {r["w_epoch"]: r for r in spark.read.parquet(cfg.drift_path).collect()}
        assert len(out) == 2  # window 2 not finalized
        w0, w1 = sorted(out)
        assert out[w0]["psi"] == 0.0 and out[w0]["tvd"] == 0.0
        # window 1: p_c = (1, 0) vs p_b = (0.5, 0.5) → tvd = 0.5,
        # psi = (1-.5)ln(1/.5) + (1e-6-.5)ln(1e-6/.5) ≈ 6.906
        assert out[w1]["tvd"] == 0.5
        expect_psi = (1 - 0.5) * math.log(1 / 0.5) + (1e-6 - 0.5) * math.log(1e-6 / 0.5)
        assert out[w1]["psi"] == pytest.approx(expect_psi, abs=1e-6)
        assert out[w1]["n_current"] == 4 and out[w1]["n_baseline"] == 100

    def test_retry_idempotent_sink(self, spark, tmp_path_factory):
        """A foreachBatch retry re-runs score() with the SAME epoch id
        (checkpointed batch id); the per-epoch overwrite sink must
        leave zero duplicate rows for a naive reader, and epoch_id
        must surface as a single consistently-typed partition column."""
        from fences_spark.streaming.drift import DriftStreamConfig, start_drift_stream

        root = tmp_path_factory.mktemp("sdrift_retry")
        src = str(root / "src")
        rows = [(i, et, T0 + timedelta(minutes=i)) for i, et in enumerate(["a", "b", "a", "b"])]
        rows.append((20, "b", T0 + timedelta(hours=2, minutes=40)))  # finalizes window 0
        df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
        df.coalesce(1).write.parquet(src)
        base = spark.createDataFrame([("a", 50), ("b", 50)], "bucket string, cnt long")
        cfg = DriftStreamConfig(output_dir=str(root / "out"))

        def run_once(ckpt_suffix: str = "") -> None:
            stream = spark.readStream.schema(df.schema).parquet(src)
            q = start_drift_stream(
                stream, base, cfg, col="event_type",
                window_len="1 hour", delay="30 minutes",
            )
            q.awaitTermination(120)
            assert not q.isActive

        run_once()
        first = sorted(map(tuple, spark.read.parquet(cfg.drift_path)
                           .select("w_epoch", "psi", "tvd").collect()))
        assert len(first) == 1
        # inject a "retry": wipe the checkpoint so the whole epoch
        # re-executes against the already-written sink with epoch_id 0
        import shutil
        shutil.rmtree(cfg.drift_checkpoint)
        run_once()
        again = sorted(map(tuple, spark.read.parquet(cfg.drift_path)
                           .select("w_epoch", "psi", "tvd").collect()))
        assert again == first  # no duplicates, byte-equal rows
        # epoch_id is a discoverable partition column of one type
        sch = dict(spark.read.parquet(cfg.drift_path).dtypes)
        assert "epoch_id" in sch

    def test_checkpoint_reset_clears_stale_epochs(self, spark, tmp_path_factory):
        """Epoch ids are unique only within one checkpoint lineage.
        Run 1 finalizes window 0 in epoch 0, then resumes and
        finalizes window 1 in epoch 1.  A fresh checkpoint re-runs
        everything in ONE epoch 0 — per-epoch overwrite alone would
        leave the old epoch_id=1 rows as stale duplicates of window 1.
        start_drift_stream must clear epoch partitions when the
        checkpoint has no committed batches (round-4 review finding)."""
        from fences_spark.streaming.drift import DriftStreamConfig, start_drift_stream

        root = tmp_path_factory.mktemp("sdrift_reset")
        src = str(root / "src")
        base = spark.createDataFrame([("a", 50), ("b", 50)], "bucket string, cnt long")
        cfg = DriftStreamConfig(output_dir=str(root / "out"))

        def run_once() -> None:
            schema = "event_id long, event_type string, ts timestamp"
            stream = spark.readStream.schema(schema).parquet(src)
            q = start_drift_stream(
                stream, base, cfg, col="event_type",
                window_len="1 hour", delay="30 minutes",
            )
            q.awaitTermination(120)
            assert not q.isActive

        # batch 1: window 0 + a sentinel that finalizes it
        rows1 = [(i, et, T0 + timedelta(minutes=i)) for i, et in enumerate(["a", "b"])]
        rows1.append((20, "b", T0 + timedelta(hours=2, minutes=40)))
        spark.createDataFrame(
            rows1, "event_id long, event_type string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()  # epoch 0: window 0

        # batch 2 (checkpoint RESUMED): rows into window 3 plus a later
        # sentinel that finalizes it → epoch 1 writes window 3
        rows2 = [(30 + i, "a", T0 + timedelta(hours=3, minutes=i)) for i in range(2)]
        rows2.append((40, "b", T0 + timedelta(hours=5, minutes=40)))
        spark.createDataFrame(
            rows2, "event_id long, event_type string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()  # epoch 1: window 3

        lineage1 = sorted(map(tuple, spark.read.parquet(cfg.drift_path)
                              .select("w_epoch", "psi", "tvd", "n_current").collect()))
        # run 1 finalized window 0; run 2's watermark also finalized
        # run 1's sentinel window (14:00) alongside window 3 (15:00)
        assert len(lineage1) == 3

        # checkpoint reset: one epoch 0 re-finalizes BOTH windows
        import shutil
        shutil.rmtree(cfg.drift_checkpoint)
        run_once()
        lineage2 = sorted(map(tuple, spark.read.parquet(cfg.drift_path)
                              .select("w_epoch", "psi", "tvd", "n_current").collect()))
        assert lineage2 == lineage1  # same windows once each, no stale rows
        w = spark.read.parquet(cfg.drift_path).groupBy("w_epoch").count().collect()
        assert all(r["count"] == 1 for r in w)

    def test_checkpoint_reset_quarantines_not_deletes(self, spark, tmp_path_factory):
        """Round-5 advice: a missing 'commits' dir can also mean a
        misconfigured/relocated checkpoint, and if the file source has
        aged out old data a deleted history is gone forever.  The
        lineage reset must QUARANTINE stale epoch partitions under an
        underscore-prefixed trash dir (invisible to partition
        discovery) instead of deleting them."""
        import glob
        import shutil

        from fences_spark.streaming.drift import DriftStreamConfig, start_drift_stream

        root = tmp_path_factory.mktemp("sdrift_trash")
        src = str(root / "src")
        base = spark.createDataFrame([("a", 50), ("b", 50)], "bucket string, cnt long")
        cfg = DriftStreamConfig(output_dir=str(root / "out"))

        def run_once() -> None:
            schema = "event_id long, event_type string, ts timestamp"
            stream = spark.readStream.schema(schema).parquet(src)
            q = start_drift_stream(
                stream, base, cfg, col="event_type",
                window_len="1 hour", delay="30 minutes",
            )
            q.awaitTermination(120)
            assert not q.isActive

        rows1 = [(i, et, T0 + timedelta(minutes=i)) for i, et in enumerate(["a", "b"])]
        rows1.append((20, "b", T0 + timedelta(hours=2, minutes=40)))
        spark.createDataFrame(
            rows1, "event_id long, event_type string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()  # epoch 0: window 0
        pre_reset = sorted(map(tuple, spark.read.parquet(cfg.drift_path)
                               .select("w_epoch", "psi", "tvd").collect()))
        assert len(pre_reset) == 1

        shutil.rmtree(cfg.drift_checkpoint)  # simulate lost/relocated ckpt
        run_once()

        # history preserved: exactly one trash dir holding the old
        # epoch_id=0 partition, its rows still readable and equal to
        # the pre-reset sink contents
        trash = glob.glob(os.path.join(cfg.drift_path, "_trash-reset-*"))
        assert len(trash) == 1
        q_parts = glob.glob(os.path.join(trash[0], "epoch_id=*"))
        assert len(q_parts) == 1
        quarantined = sorted(map(tuple, spark.read.parquet(q_parts[0])
                                 .select("w_epoch", "psi", "tvd").collect()))
        assert quarantined == pre_reset
        # the live sink is unaffected by the trash dir (underscore
        # prefix → ignored by discovery) and has no duplicate windows
        live = sorted(map(tuple, spark.read.parquet(cfg.drift_path)
                          .select("w_epoch", "psi", "tvd").collect()))
        assert live == pre_reset
