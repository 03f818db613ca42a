"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``
operators.

The decode step itself is STUBBED (the sandbox has no image/audio
codecs): ``decode=\"real\"`` raises NotImplementedError at the point
where PIL/librosa/pyav would be called; ``decode=\"fake\"`` produces
deterministic hash-derived features so the full Spark-side plumbing —
schema, Arrow batch shapes, partitioning, output contract — is real
and tested end-to-end.  Swapping in a real codec changes one inner
function, not the operator.

Schema convention for a media table:
    (media_id long, modality string, payload binary,
     meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = f"media_id long, modality string, n_bytes long, feature array<float>"
_FRAMES_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def synth_media_table(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes) for
    testing the plumbing; generated distributed via spark.range."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    payload = F.sha2(F.concat(F.lit("media"), F.col("media_id").cast("string")), 256).cast("binary")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("media_id"), 3) + 1).cast("int"),
    )
    meta = F.struct(
        F.concat(F.lit("x-fake/"), modality).alias("mime"),
        (F.pmod(F.col("media_id"), 640) + 1).cast("int").alias("width"),
        (F.pmod(F.col("media_id"), 480) + 1).cast("int").alias("height"),
        (F.pmod(F.col("media_id"), 90000)).cast("int").alias("duration_ms"),
    )
    return df.select("media_id", modality.alias("modality"), payload.alias("payload"), meta.alias("meta"))


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Project a documents table (doc_id, text, …) into the media
    schema: payload = UTF-8 bytes of the text, modality round-robins
    image/audio/video on doc_id, duration derived from doc_id.  Every
    field is a pure function of the row, so a SQL oracle can re-derive
    the identical table — this is what lets the mapInPandas operators
    downstream be value-hash gated instead of rows-only."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    meta = F.struct(
        F.concat(F.lit("x-fake/"), modality).alias("mime"),
        (F.pmod(F.col("doc_id"), 640) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), 480) + 1).cast("int").alias("height"),
        # spread durations over the full 0..90s range even for small
        # consecutive doc_id domains, so frame counts exercise 1..8
        F.pmod(F.col("doc_id") * 7919, 90000).cast("int").alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(df: DataFrame, *, decode: str = "fake", batch_hint: int = 256) -> DataFrame:
    """Per-media feature vector via mapInPandas (Arrow batches, one
    Python call per batch — the sanctioned slow path for binary
    payloads that builtins cannot decode)."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                # the real implementation would dispatch on meta.mime:
                #   image → PIL.Image.open(io.BytesIO(payload))
                #   audio → soundfile/librosa decode
                #   video → pyav keyframe iterator
                raise NotImplementedError(
                    "real decode needs image/audio codecs absent from this environment"
                )
            feats = pdf["payload"].map(lambda p: _fake_feature(bytes(p) if p is not None else b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, *, every_ms: int = 10_000, max_frames: int = 8,
                  decode: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled frame.  Fake
    decode derives frame hashes from (payload, frame index); a real
    decoder would seek to frame_idx * every_ms.

    Frame-hash convention: sha256(payload || '#' || str(frame_idx)) —
    the index suffix is an ASCII decimal (not raw bytes) so the exact
    same hash is reproducible in engines whose sha256 only accepts
    text (DuckDB oracle), and '#' keeps (payload, idx) unambiguous."""
    videos = df.filter(F.col("modality") == "video")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real video decode unavailable in this environment")
            rows = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = int(meta["duration_ms"]) if meta is not None else 0
                n = min(max_frames, max(dur // every_ms, 1))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_sha256"].append(
                        hashlib.sha256(
                            (bytes(payload) if payload is not None else b"")
                            + b"#" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return videos.mapInPandas(op, schema=_FRAMES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize placeholder: passes metadata through with the new
    target dims recorded; payload untouched (a real implementation
    re-encodes).  Kept builtin-only — no Python needed to adjust
    metadata."""
    new_meta = F.struct(
        F.col("meta.mime").alias("mime"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return df.withColumn("meta", new_meta)


_RESIZE_SCHEMA = "media_id long, in_w int, in_h int, out_w int, out_h int, resized_sha256 string"


def resize_images(df: DataFrame, *, target_w: int = 64, target_h: int = 64,
                  decode: str = "fake") -> DataFrame:
    """Aspect-preserving fit-within-box image resize: one row per
    image with the computed output dims and a digest of the "resized"
    bytes.

    The output geometry is pure INTEGER Column algebra on the JVM
    side (wider-than-box ⇒ out_w = target_w, out_h = h·target_w ÷ w,
    else the transpose; integer division, so bit-identical in any
    engine — no float rounding to disagree about).  Only the pixel
    resample crosses into Python (mapInPandas, Arrow batches); fake
    decode fingerprints the would-be output as
    sha256(payload || '#' || out_w || 'x' || out_h) — same
    ASCII-suffix convention as frame sampling, reproducible by the
    DuckDB oracle."""
    imgs = df.filter(F.col("modality") == "image")
    w = F.col("meta.width").cast("long")
    h = F.col("meta.height").cast("long")
    wide = (w * target_h) >= (h * target_w)
    out_w = F.when(wide, F.lit(target_w)) \
             .otherwise(F.greatest(F.lit(1), (w * target_h / h).cast("long"))).cast("int")
    out_h = F.when(wide, F.greatest(F.lit(1), (h * target_w / w).cast("long"))) \
             .otherwise(F.lit(target_h)).cast("int")
    staged = imgs.select(
        "media_id", "payload",
        w.cast("int").alias("in_w"), h.cast("int").alias("in_h"),
        out_w.alias("out_w"), out_h.alias("out_h"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                # real path: PIL.Image.open(io.BytesIO(payload))
                #   .resize((out_w, out_h)) → re-encode
                raise NotImplementedError(
                    "real image decode unavailable in this environment")
            digests = [
                hashlib.sha256(
                    (bytes(p) if p is not None else b"")
                    + f"#{ow}x{oh}".encode()
                ).hexdigest()
                for p, ow, oh in zip(pdf["payload"], pdf["out_w"], pdf["out_h"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "in_w": pdf["in_w"], "in_h": pdf["in_h"],
                "out_w": pdf["out_w"], "out_h": pdf["out_h"],
                "resized_sha256": digests,
            })

    return staged.mapInPandas(op, schema=_RESIZE_SCHEMA)
