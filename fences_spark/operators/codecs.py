"""Pure-numpy codecs for the uncompressed media formats the sandbox
CAN decode without external libraries: 24-bit BI_RGB BMP images and
16-bit PCM WAV audio.

These make the multimodal ``decode="real"`` path real for every
format that does not require a compression codec: the Arrow-batched
operators in :mod:`fences_spark.operators.multimodal` dispatch on the
payload container and run actual pixel/sample math (numpy, vectorized
per Arrow batch).  Compressed containers (JPEG/PNG/MP3/MP4) still
raise — the sandbox ships no codec libraries — with a message naming
the library a deployment would add (reference analog: fences renders
with pydot only when installed, core/render.py:28-40).

Format notes (both are public, trivially stable specs):

- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER
  (biCompression=0), bottom-up rows, BGR byte order, each row padded
  to a 4-byte boundary.
- WAV: RIFF container; chunks walked generically, ``fmt `` must be
  audio-format 1 (PCM) at 16 bits/sample; ``data`` holds interleaved
  little-endian int16 frames.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "resize_nearest",
    "sniff_container",
]


# ---------------------------------------------------------------------------
# container sniffing
# ---------------------------------------------------------------------------


def sniff_container(data: bytes) -> str:
    """'bmp' | 'wav' | 'unknown' from magic bytes."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------------------
# BMP (24-bit, BI_RGB, bottom-up)
# ---------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → BMP bytes (24-bit BI_RGB, bottom-up,
    4-byte row padding)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB → BGR, bottom-up row order
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pix = rows.tobytes()
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    offset = _BMP_FILE_HDR.size + len(info)
    hdr = _BMP_FILE_HDR.pack(b"BM", offset + len(pix), 0, 0, offset)
    return hdr + info + pix


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB.  Supports the encoder's own
    dialect: 24-bit BI_RGB, positive height (bottom-up)."""
    data = bytes(data)
    if len(data) < _BMP_FILE_HDR.size + 40:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, offset = _BMP_FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (hdr_size, w, h, _planes, bpp, comp, _img_size, _xppm, _yppm, _clr, _imp) = (
        _BMP_INFO_HDR.unpack_from(data, _BMP_FILE_HDR.size)
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP is decodable here (got bpp={bpp}, compression={comp})"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = offset + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP pixel data ({len(data)} < {need} bytes)")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, ch) int16 → WAV bytes (PCM, little-endian)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) samples, got shape {arr.shape}")
    n, ch = arr.shape
    pcm = arr.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) int16, sample_rate).  Generic RIFF chunk
    walk; PCM 16-bit only."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, end = 12, len(data)
    ch = rate = bits = audio_fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if audio_fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is decodable here (got format={audio_fmt}, bits={bits})"
        )
    if ch < 1:
        raise ValueError(f"WAV fmt declares {ch} channels")
    n = len(pcm) // (2 * ch)
    arr = np.frombuffer(pcm, dtype="<i2", count=n * ch).reshape(n, ch)
    return arr.astype(np.int16), int(rate)


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure integer index math — the source
    index for output cell i is floor(i * in / out), so the result is
    bit-deterministic across platforms (no float rounding)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad target size {out_w}x{out_h}")
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[ys][:, xs]
