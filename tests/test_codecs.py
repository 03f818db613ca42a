"""Real-decode path: pure-numpy BMP/WAV/RAWV codecs and the
``decode="real"`` mode of the multimodal operators.

Closes the round-1 'multimodal real decode is a stub' partial for
every container a codec-free sandbox can parse; compressed formats
(JPEG/MP3/MP4) remain a clearly-named NotImplementedError boundary
(reference analog: fences gates pydot rendering the same way,
core/render.py:28-40).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from fences_spark.operators import codecs
from fences_spark.operators.multimodal import (
    decode_rawv,
    encode_rawv,
    extract_features,
    resize_images,
    sample_frames,
    synth_real_media_table,
)


# ---------------------------------------------------------------------------
# codec unit tests (no Spark)
# ---------------------------------------------------------------------------


class TestBmp:
    def test_roundtrip(self):
        rng = np.random.Generator(np.random.PCG64(7))
        px = rng.integers(0, 256, size=(13, 21, 3), dtype=np.int64).astype(np.uint8)
        blob = codecs.encode_bmp(px)
        assert blob[:2] == b"BM"
        out = codecs.decode_bmp(blob)
        assert out.shape == (13, 21, 3)
        assert np.array_equal(out, px)

    def test_row_padding_widths(self):
        # widths 1..8 cover every 4-byte stride remainder
        for w in range(1, 9):
            px = np.arange(w * 3 * 2, dtype=np.uint8).reshape(2, w, 3)
            assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)

    def test_header_fields(self):
        import struct

        blob = codecs.encode_bmp(np.zeros((5, 7, 3), dtype=np.uint8))
        # pixel offset = 14 + 40; biBitCount = 24; biCompression = 0
        offset = struct.unpack_from("<I", blob, 10)[0]
        assert offset == 54
        w, h = struct.unpack_from("<ii", blob, 18)
        bpp, comp = struct.unpack_from("<xxH I", blob, 26)[0], struct.unpack_from("<I", blob, 30)[0]
        assert (w, h) == (7, 5)
        assert struct.unpack_from("<H", blob, 28)[0] == 24
        assert comp == 0

    def test_rejects_garbage_and_unsupported(self):
        with pytest.raises(ValueError):
            codecs.decode_bmp(b"not a bmp at all, definitely not")
        blob = bytearray(codecs.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        blob[28] = 8  # biBitCount = 8
        with pytest.raises(NotImplementedError):
            codecs.decode_bmp(bytes(blob))

    def test_truncated_pixels(self):
        blob = codecs.encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            codecs.decode_bmp(blob[:-5])


class TestWav:
    def test_roundtrip_mono_and_stereo(self):
        rng = np.random.Generator(np.random.PCG64(11))
        for ch in (1, 2):
            x = rng.integers(-32768, 32768, size=(777, ch), dtype=np.int64).astype(np.int16)
            samples, rate = codecs.decode_wav(codecs.encode_wav(x, 16000))
            assert rate == 16000
            assert np.array_equal(samples, x)

    def test_1d_input(self):
        x = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
        samples, _ = codecs.decode_wav(codecs.encode_wav(x, 8000))
        assert samples.shape == (5, 1)
        assert np.array_equal(samples[:, 0], x)

    def test_chunk_walk_skips_extra_chunks(self):
        import struct

        blob = codecs.encode_wav(np.ones((10, 1), dtype=np.int16), 8000)
        # splice a LIST chunk between fmt and data
        fmt_end = blob.index(b"data")
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = blob[:fmt_end] + extra + blob[fmt_end:]
        spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        samples, rate = codecs.decode_wav(spliced)
        assert rate == 8000 and samples.shape == (10, 1)

    def test_rejects_non_pcm(self):
        blob = bytearray(codecs.encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))
        blob[20] = 3  # fmt = IEEE float
        with pytest.raises(NotImplementedError):
            codecs.decode_wav(bytes(blob))
        with pytest.raises(ValueError):
            codecs.decode_wav(b"RIFFxxxxNOPE")


class TestResizeNearest:
    def test_identity(self):
        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        assert np.array_equal(codecs.resize_nearest(px, 3, 2), px)

    def test_downscale_picks_floor_index(self):
        # 4→2: output i takes source floor(i*4/2) = rows 0 and 2
        px = np.stack([np.full((4, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40)])[..., None].repeat(3, axis=2)
        out = codecs.resize_nearest(px, 4, 2)
        assert out[0, 0, 0] == 10 and out[1, 0, 0] == 30

    def test_upscale(self):
        px = np.array([[[1, 1, 1], [2, 2, 2]]], dtype=np.uint8)  # 1x2
        out = codecs.resize_nearest(px, 4, 2)
        assert out.shape == (2, 4, 3)
        assert list(out[0, :, 0]) == [1, 1, 2, 2]


class TestRawv:
    def test_roundtrip(self):
        rng = np.random.Generator(np.random.PCG64(3))
        frames = [
            rng.integers(0, 256, size=(5, 4, 3), dtype=np.int64).astype(np.uint8)
            for _ in range(3)
        ]
        blobs = decode_rawv(encode_rawv(frames))
        assert len(blobs) == 3
        for blob, fr in zip(blobs, frames):
            assert np.array_equal(codecs.decode_bmp(blob), fr)

    def test_truncation_detected(self):
        blob = encode_rawv([np.zeros((2, 2, 3), dtype=np.uint8)] * 2)
        with pytest.raises(ValueError):
            decode_rawv(blob[:-3])


def test_sniff_container():
    assert codecs.sniff_container(codecs.encode_bmp(np.zeros((1, 1, 3), dtype=np.uint8))) == "bmp"
    assert codecs.sniff_container(codecs.encode_wav(np.zeros(4, dtype=np.int16), 8000)) == "wav"
    assert codecs.sniff_container(codecs.encode_png(np.zeros((1, 1, 3), dtype=np.uint8))) == "png"
    assert codecs.sniff_container(b"\x89PNG\r\n\x1a") == "unknown"  # short sig
    assert codecs.sniff_container(b"GIF89a") == "unknown"


# ---------------------------------------------------------------------------
# decode="real" through the Spark operators
# ---------------------------------------------------------------------------


class TestRealDecodeOperators:
    N = 60  # covers all three modalities, multiple Arrow batches not needed

    def test_synth_real_media_deterministic_and_distributed(self, spark):
        a = synth_real_media_table(spark, self.N).orderBy("media_id").collect()
        b = (
            synth_real_media_table(spark, self.N)
            .repartition(7)
            .orderBy("media_id")
            .collect()
        )
        assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
        kinds = {r["modality"] for r in a}
        assert kinds == {"image", "audio", "video"}

    def test_meta_matches_decoded_content(self, spark):
        rows = synth_real_media_table(spark, self.N).collect()
        for r in rows:
            payload = bytes(r["payload"])
            if r["modality"] == "image":
                kind = codecs.sniff_container(payload)
                assert kind == ("bmp" if (r["media_id"] // 3) % 2 == 0 else "png")
                px = (codecs.decode_bmp if kind == "bmp" else codecs.decode_png)(payload)
                assert (r["meta"]["height"], r["meta"]["width"]) == px.shape[:2]
            elif r["modality"] == "audio":
                samples, rate = codecs.decode_wav(payload)
                assert r["meta"]["duration_ms"] == samples.shape[0] * 1000 // rate
            else:
                frames = decode_rawv(payload)
                assert r["meta"]["duration_ms"] == len(frames) * 10_000

    def test_extract_features_real(self, spark):
        media = synth_real_media_table(spark, self.N)
        out = extract_features(media, decode="real").orderBy("media_id").collect()
        assert len(out) == self.N
        by_id = {r["media_id"]: r for r in out}
        raw = {r["media_id"]: r for r in media.collect()}
        # spot-verify an image row against a local decode
        img_id = next(i for i in by_id if raw[i]["modality"] == "image")
        blob = bytes(raw[img_id]["payload"])
        dec = codecs.decode_bmp if codecs.sniff_container(blob) == "bmp" else codecs.decode_png
        px = dec(blob).astype(np.float64) / 255.0
        want = px.reshape(-1, 3).mean(axis=0)
        got = by_id[img_id]["feature"][:3]
        assert np.allclose(got, want, atol=1e-6)
        # audio RMS in [0, 1]; all vectors full-width and finite
        for r in out:
            assert len(r["feature"]) == 8
            assert all(np.isfinite(v) for v in r["feature"])

    def test_extract_features_real_rejects_compressed(self, spark):
        import pandas as pd

        fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [1],
                    "modality": ["image"],
                    "payload": [fake_jpeg],
                    "meta": [{"mime": "image/jpeg", "width": 1, "height": 1, "duration_ms": 0}],
                }
            ),
            schema="media_id long, modality string, payload binary, "
            "meta struct<mime:string, width:int, height:int, duration_ms:int>",
        )
        with pytest.raises(Exception, match="PIL|Pillow"):
            extract_features(df, decode="real").collect()

    def test_resize_images_real(self, spark):
        media = synth_real_media_table(spark, self.N)
        out = resize_images(media, target_w=8, target_h=8, decode="real").collect()
        raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
        assert out
        for r in out:
            blob = raw[r["media_id"]]
            if codecs.sniff_container(blob) == "png":
                dec, enc = codecs.decode_png, codecs.encode_png
            else:
                dec, enc = codecs.decode_bmp, codecs.encode_bmp
            px = dec(blob)
            resized = codecs.resize_nearest(px, r["out_w"], r["out_h"])
            want = hashlib.sha256(enc(resized)).hexdigest()
            assert r["resized_sha256"] == want
            # aspect-fit geometry: within box, at least one side exact
            assert r["out_w"] <= 8 and r["out_h"] <= 8
            assert r["out_w"] == 8 or r["out_h"] == 8

    def test_sample_frames_real(self, spark):
        media = synth_real_media_table(spark, self.N)
        out = sample_frames(media, every_ms=10_000, max_frames=8, decode="real").collect()
        raw = {
            r["media_id"]: (bytes(r["payload"]), r["meta"]["duration_ms"])
            for r in media.filter(F.col("modality") == "video").collect()
        }
        assert out
        seen = set()
        for r in out:
            payload, dur = raw[r["media_id"]]
            frames = decode_rawv(payload)
            fi = min(r["frame_idx"] * 10_000 * len(frames) // max(dur, 1), len(frames) - 1)
            px = codecs.decode_bmp(frames[fi])
            assert r["frame_sha256"] == hashlib.sha256(px.tobytes()).hexdigest()
            seen.add(r["media_id"])
        assert seen == set(raw)  # every video sampled

    def test_fake_path_unchanged(self, spark):
        """The oracle-gated fake path must stay bit-identical: pin the
        digest convention sha256(payload || '#' || idx)."""
        media = synth_real_media_table(spark, 9)
        row = sample_frames(media, decode="fake").orderBy("media_id", "frame_idx").first()
        payload = bytes(
            media.filter(F.col("media_id") == row["media_id"]).first()["payload"]
        )
        want = hashlib.sha256(payload + b"#" + str(row["frame_idx"]).encode()).hexdigest()
        assert row["frame_sha256"] == want


def test_wav_zero_channels_is_value_error():
    import struct

    blob = bytearray(codecs.encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))
    # patch nChannels to 0 in the fmt chunk (offset 12+8+2)
    struct.pack_into("<H", blob, 22, 0)
    with pytest.raises(ValueError, match="channels"):
        codecs.decode_wav(bytes(blob))


# ---------------------------------------------------------------------------
# property-based fuzz (hypothesis): roundtrip laws over the full input
# domain, not just the handful of shapes above
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    blob = codecs.encode_bmp(px)
    # stride law: every row padded to 4 bytes
    assert (len(blob) - 54) == ((w * 3 + 3) & ~3) * h
    assert np.array_equal(codecs.decode_bmp(blob), px)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    x = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int64).astype(np.int16)
    samples, got_rate = codecs.decode_wav(codecs.encode_wav(x, rate))
    assert got_rate == rate
    assert np.array_equal(samples, x)


@settings(max_examples=60, deadline=None)
@given(
    in_w=st.integers(1, 30), in_h=st.integers(1, 30),
    out_w=st.integers(1, 30), out_h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_properties(in_w, in_h, out_w, out_h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(in_h, in_w, 3), dtype=np.int64).astype(np.uint8)
    out = codecs.resize_nearest(px, out_w, out_h)
    assert out.shape == (out_h, out_w, 3)
    # every output pixel exists somewhere in the input row/col it samples
    assert set(np.unique(out)) <= set(np.unique(px))
    # identity law
    assert np.array_equal(codecs.resize_nearest(px, in_w, in_h), px)


@settings(max_examples=30, deadline=None)
@given(
    n_frames=st.integers(0, 6),
    w=st.integers(1, 12), h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_rawv_roundtrip_property(n_frames, w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
        for _ in range(n_frames)
    ]
    blobs = decode_rawv(encode_rawv(frames))
    assert len(blobs) == n_frames
    for blob, fr in zip(blobs, frames):
        assert np.array_equal(codecs.decode_bmp(blob), fr)


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + numpy unfiltering)
# ---------------------------------------------------------------------------

import struct
import zlib

from fences_spark.operators.codecs import _PNG_SIG, _png_chunk


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent FORWARD filter implementation (spec direction) —
    decoding must invert it for every filter type."""
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for r in range(h):
        f = ftypes[r % len(ftypes)]
        line = flat[r]
        left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = (line - left) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            enc = (line - ((left + prev) >> 1)) & 0xFF
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = (line - pred) & 0xFF
        out.append(f)
        out += enc.astype(np.uint8).tobytes()
        prev = line
    return bytes(out)


def _png_doc(w, h, ctype, raw, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    doc = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        doc += _png_chunk(b"PLTE", plte.tobytes())
    return doc + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


class TestPng:
    def test_roundtrip(self):
        rng = np.random.Generator(np.random.PCG64(3))
        px = rng.integers(0, 256, size=(23, 31, 3), dtype=np.int64).astype(np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)

    @pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_all_filter_types_invert(self, ftypes):
        rng = np.random.Generator(np.random.PCG64(sum(ftypes) + 11))
        px = rng.integers(0, 256, size=(17, 13, 3), dtype=np.int64).astype(np.uint8)
        doc = _png_doc(13, 17, 2, _forward_filter(px, ftypes))
        assert np.array_equal(codecs.decode_png(doc), px)

    def test_gray_palette_rgba_color_types(self):
        rng = np.random.Generator(np.random.PCG64(5))
        g = rng.integers(0, 256, size=(9, 7, 1), dtype=np.int64).astype(np.uint8)
        got = codecs.decode_png(_png_doc(7, 9, 0, _forward_filter(g, [2])))
        assert np.array_equal(got, np.repeat(g, 3, axis=2))
        rgba = rng.integers(0, 256, size=(5, 6, 4), dtype=np.int64).astype(np.uint8)
        got = codecs.decode_png(_png_doc(6, 5, 6, _forward_filter(rgba, [4])))
        assert np.array_equal(got, rgba[:, :, :3])
        plte = rng.integers(0, 256, size=(4, 3), dtype=np.int64).astype(np.uint8)
        idx = rng.integers(0, 4, size=(6, 5, 1), dtype=np.int64).astype(np.uint8)
        got = codecs.decode_png(_png_doc(5, 6, 3, _forward_filter(idx, [1]), plte=plte))
        assert np.array_equal(got, plte[idx[:, :, 0]])

    def test_rejects_garbage_and_unsupported(self):
        with pytest.raises(ValueError):
            codecs.decode_png(b"not a png")
        with pytest.raises(ValueError):
            codecs.decode_png(_PNG_SIG + b"\x00\x00")  # no chunks
        # interlaced: NotImplementedError naming the deployment library
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
        doc = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 52))
               + _png_chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError, match="PIL|Pillow"):
            codecs.decode_png(doc)
        # 16-bit depth
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        doc = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 104))
               + _png_chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError, match="PIL|Pillow"):
            codecs.decode_png(doc)

    def test_corrupt_streams(self):
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        blob = bytearray(codecs.encode_png(px))
        # truncate the zlib stream body
        with pytest.raises(ValueError):
            codecs.decode_png(bytes(blob[:40]))
        # bad filter type byte
        raw = b"\x07" + b"\x00" * 12
        with pytest.raises(ValueError, match="filter"):
            codecs.decode_png(_png_doc(4, 1, 2, raw))
        # palette index out of range
        plte = np.zeros((2, 3), dtype=np.uint8)
        idx = np.full((1, 1, 1), 9, dtype=np.uint8)
        with pytest.raises(ValueError, match="palette"):
            codecs.decode_png(_png_doc(1, 1, 3, _forward_filter(idx, [0]), plte=plte))

    def test_resize_reencode(self):
        rng = np.random.Generator(np.random.PCG64(9))
        px = rng.integers(0, 256, size=(16, 12, 3), dtype=np.int64).astype(np.uint8)
        out = codecs.resize_nearest(codecs.decode_png(codecs.encode_png(px)), 6, 8)
        again = codecs.decode_png(codecs.encode_png(out))
        assert np.array_equal(again, out)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    ftype=st.integers(0, 4),
)
def test_png_unfilter_inverts_any_filter_property(w, h, seed, ftype):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    doc = _png_doc(w, h, 2, _forward_filter(px, [ftype]))
    assert np.array_equal(codecs.decode_png(doc), px)
