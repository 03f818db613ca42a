"""Pure-numpy codecs for the media formats the sandbox CAN decode
without external libraries: 24-bit BI_RGB BMP images, 16-bit PCM WAV
audio, and 8-bit PNG images (zlib inflate + scanline unfiltering are
both stdlib/numpy — no codec library needed).

These make the multimodal ``decode="real"`` path real for every
format that does not require an EXTERNAL compression codec: the
Arrow-batched operators in :mod:`fences_spark.operators.multimodal`
dispatch on the payload container and run actual pixel/sample math
(numpy, vectorized per Arrow batch).  Codec-bound containers
(JPEG/MP3/MP4) still raise — the sandbox ships no codec libraries —
with a message naming the library a deployment would add (reference
analog: fences renders with pydot only when installed,
core/render.py:28-40).

Format notes (all public, stable specs):

- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER
  (biCompression=0), bottom-up rows, BGR byte order, each row padded
  to a 4-byte boundary.
- WAV: RIFF container; chunks walked generically, ``fmt `` must be
  audio-format 1 (PCM) at 16 bits/sample; ``data`` holds interleaved
  little-endian int16 frames.
- PNG (RFC 2083): 8-byte signature + CRC'd chunks; IHDR geometry,
  IDAT zlib stream of filter-prefixed scanlines (filters 0-4: None/
  Sub/Up/Average/Paeth), IEND.  Decoded here: bit depth 8, color
  types 0 (gray), 2 (RGB), 3 (palette via PLTE), 6 (RGBA), no
  interlace; the encoder emits color type 2 with filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_png",
    "decode_png",
    "encode_wav",
    "decode_wav",
    "resize_nearest",
    "sniff_container",
]


# ---------------------------------------------------------------------------
# container sniffing
# ---------------------------------------------------------------------------


def sniff_container(data: bytes) -> str:
    """'bmp' | 'png' | 'wav' | 'unknown' from magic bytes."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 8 and data[:8] == _PNG_SIG:
        return "png"
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
# PNG (8-bit; decode: gray/RGB/palette/RGBA, all 5 filters; encode: RGB)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, bit depth 8,
    filter 0 on every scanline, one zlib IDAT)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 prefixed to each scanline
    lines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(lines.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_scanlines(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters → (h, stride) uint8."""
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        off = r * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: per byte-lane prefix sum
            cur = np.cumsum(line.reshape(-1, bpp), axis=0).reshape(-1) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = np.empty(stride, dtype=np.int32)
            px = line.reshape(-1, bpp)
            dst = cur.reshape(-1, bpp)
            up = prev.reshape(-1, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(px.shape[0]):
                left = (px[x] + ((left + up[x]) >> 1)) & 0xFF
                dst[x] = left
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            px = line.reshape(-1, bpp)
            dst = cur.reshape(-1, bpp)
            up = prev.reshape(-1, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(px.shape[0]):
                p = left + up[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul)
                )
                left = (px[x] + pred) & 0xFF
                dst[x] = left
                ul = up[x]
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB.

    Pure stdlib-zlib + numpy: chunk walk, IDAT inflate, scanline
    unfiltering (all five filter types).  Bit depth 8 only; color
    types 0 (gray, replicated to RGB), 2 (RGB), 3 (palette, PLTE
    lookup), 6 (RGBA, alpha dropped).  Interlaced (Adam7) files and
    other depths raise NotImplementedError naming the library a
    deployment adds (PIL/Pillow)."""
    data = bytes(data)
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, end = 8, len(data)
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= end:
        (clen,) = struct.unpack_from(">I", data, pos)
        cid = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated PNG chunk")
        if cid == b"IHDR":
            if clen != 13:
                raise ValueError(f"bad IHDR length {clen}")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if w == 0 or h == 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG is decodable here (got depth={depth}, "
            f"interlace={interlace}); other variants need PIL/Pillow"
        )
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(
            f"PNG color type {ctype} not decodable here (gray/RGB/palette/RGBA only); "
            f"others need PIL/Pillow"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG zlib stream: {exc}") from exc
    stride = w * channels
    lines = _unfilter_scanlines(raw, h, stride, channels)
    px = lines.reshape(h, w, channels)
    if ctype == 2:
        return px.copy()
    if ctype == 6:
        return px[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    # palette
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= plte.shape[0]:
        raise ValueError("PNG palette index out of range")
    return plte[idx]


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
