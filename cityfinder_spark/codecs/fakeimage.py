"""Deterministic fake image/video codec.

Pillow/libjpeg are not available in this container, so real decode is
STUBBED behind a deterministic fake format whose Spark-side plumbing
(binary columns, Arrow batch shapes, UDF signatures, invariants) is
fully real and tested:

  * FPNG: lossless — header + raw uint8 RGB pixels (byte-exact).
  * FJPG: "lossy"  — pixels quantized to 4-level steps (>>2<<2); the
    reconstruction error is <= 3/channel, giving PSNR ~= 42.9 dB,
    deliberately above the mandated 40 dB invariant floor.
  * FVID: n_frames FPNG-style frames concatenated (for frame-sample).

Pixels are generated from a counter-based mix of (image_id, x, y, c)
so any row's reference pixels can be regenerated anywhere without
carrying state — that is what makes the PSNR/caption invariants
checkable per-row at any scale.

Real-codec integration point: REAL PNG is implemented end-to-end with
stdlib zlib (encode_png_real / decode_real) and REAL baseline JFIF
JPEG with stdlib+NumPy (codecs/jpeg.py: standard Annex-K tables,
huffman entropy coding, 8x8 DCT, 4:4:4 or 4:2:0) — `decode()`
dispatches on the PNG / SOI signatures, so operators are
codec-agnostic and real PNG/JPEG payloads flow through
image_decode_stats unchanged (pytest-pinned). The fake formats remain
the default datagen path (they make the PSNR oracle closed-form).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"
MAGIC_VID = b"FVID"
_HDR = struct.Struct("<4sHHB")  # magic, w, h, channels


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based deterministic 'randomness'."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def gen_pixels(image_seed: int, w: int, h: int, channels: int = 3) -> np.ndarray:
    """Reference pixel array (h, w, c) uint8, regenerable anywhere."""
    idx = np.arange(h * w * channels, dtype=np.uint64) + (
        np.uint64(image_seed % (1 << 63)) << np.uint64(1)
    )
    return (_mix64(idx) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, channels)


def quantize_lossy(pix: np.ndarray) -> np.ndarray:
    """FJPG 'compression': drop the 2 low bits (max error 3/channel)."""
    return (pix >> 2) << 2


def encode(pix: np.ndarray, fmt: str) -> bytes:
    h, w, c = pix.shape
    if fmt == "png":
        return _HDR.pack(MAGIC_PNG, w, h, c) + pix.tobytes()
    if fmt == "jpeg":
        return _HDR.pack(MAGIC_JPG, w, h, c) + quantize_lossy(pix).tobytes()
    if fmt == "png_real":
        return encode_png_real(pix)
    if fmt == "jpeg_real":
        from cityfinder_spark.codecs.jpeg import encode_jpeg_real

        # q=98 keeps worst-case noise pixels >= 40 dB (the invariant floor)
        return encode_jpeg_real(pix, quality=98)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes) -> tuple[str, np.ndarray]:
    if buf[:8] == PNG_SIG:
        return "png", decode_real(buf)
    if buf[:2] == b"\xff\xd8":
        from cityfinder_spark.codecs.jpeg import decode_jpeg_real

        return "jpeg", decode_jpeg_real(buf)
    if len(buf) < _HDR.size:
        raise ValueError("byte stream too short for any known container")
    magic, w, h, c = _HDR.unpack_from(buf, 0)
    fmt = {MAGIC_PNG: "png", MAGIC_JPG: "jpeg"}.get(magic)
    if fmt is None:
        raise ValueError(f"bad magic {magic!r}")
    pix = np.frombuffer(buf, dtype=np.uint8, offset=_HDR.size).reshape(h, w, c)
    return fmt, pix


# ---- real PNG (stdlib zlib; no Pillow needed) ----

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_IHDR = struct.Struct(">IIBBBBB")  # w, h, depth, color, comp, filter, interlace
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png_real(pix: np.ndarray) -> bytes:
    """Spec-compliant PNG: 8-bit RGB (or RGBA/gray by channel count),
    filter 0 on every scanline, one zlib IDAT. Round-trips through any
    real PNG decoder; decode_real reads it back byte-exact."""
    h, w, c = pix.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = _IHDR.pack(w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filtering (all 5 filter types). Filter 0
    (what encode_png_real emits) and 2 are vectorized; 1/3/4 fall back
    to the per-byte spec recurrence."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up
            out[y] = line + prev  # uint8 wraparound == mod-256 add
        elif ft in (1, 3, 4):  # Sub / Average / Paeth (left-dependent)
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return out.reshape(h, w, c)


def decode_real(buf: bytes) -> np.ndarray:
    """Real PNG decode with stdlib zlib: parses IHDR/IDAT/IEND chunks
    (CRC-checked), inflates, reverses scanline filtering -> (h, w, c)
    uint8. Supports 8-bit gray/RGB/gray+alpha/RGBA, non-interlaced.
    A JPEG (SOI-signature) stream routes to the stdlib+NumPy baseline
    JFIF decoder in codecs/jpeg.py."""
    if buf[:8] != PNG_SIG:
        if buf[:2] == b"\xff\xd8":
            from cityfinder_spark.codecs.jpeg import decode_jpeg_real

            return decode_jpeg_real(buf)
        raise ValueError("not a PNG byte stream")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = _IHDR.unpack(data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            c = _COLOR_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * c):
        raise ValueError("PNG IDAT length mismatch")
    return _png_unfilter(raw, h, w, c)


def encode_video(frames: list[np.ndarray]) -> bytes:
    h, w, c = frames[0].shape
    head = _HDR.pack(MAGIC_VID, w, h, c) + struct.pack("<H", len(frames))
    return head + b"".join(f.tobytes() for f in frames)


def decode_video(buf: bytes) -> np.ndarray:
    """-> (n_frames, h, w, c). A RIFF/AVI stream routes to the real
    MJPEG-AVI decoder (codecs/mjpeg.py — real container, real
    per-frame JFIF decode); FVID is the deterministic fake."""
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        from cityfinder_spark.codecs.mjpeg import decode_mjpeg_avi

        return decode_mjpeg_avi(buf)
    magic, w, h, c = _HDR.unpack_from(buf, 0)
    if magic != MAGIC_VID:
        raise ValueError(f"bad magic {magic!r}")
    (n,) = struct.unpack_from("<H", buf, _HDR.size)
    off = _HDR.size + 2
    return np.frombuffer(buf, dtype=np.uint8, offset=off).reshape(n, h, w, c)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(pix: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-style hash (aHash family):
    bit (8*bi + bj) is set iff the mean intensity of 8x8 block
    (bi, bj) exceeds the global mean intensity.

    INTEGER-EXACT by construction: the comparison is the
    cross-multiplication  S_block * C_total > S_total * c_block  over
    raw byte sums — no float means anywhere — so the hash is
    bit-identical across numpy, Spark and a DuckDB SQL replay
    regardless of summation order (that is what lets phash live in a
    value-hashed contract projection). Overflow bound: S_total <=
    w*h*3*255 and C_total = w*h*3, so the product stays < 2^63 for
    images up to ~4096x4096.

    Block of pixel row y is bi = (8*y + 7) // h — the exact inverse of
    the boundary table ys[i] = (i*h) // 8 for h >= 8 (clipped for
    tiny images, where trailing blocks may be empty -> bit 0).
    """
    h, w = pix.shape[:2]
    c = pix.reshape(h, w, -1).shape[2]
    vals = pix.reshape(h, w, -1).astype(np.int64).sum(axis=2)  # per-pixel byte sum
    bi = np.minimum(7, (8 * np.arange(h) + 7) // h)
    bj = np.minimum(7, (8 * np.arange(w) + 7) // w)
    blk = (bi[:, None] * 8 + bj[None, :]).ravel()
    s_blk = np.zeros(64, dtype=np.int64)
    np.add.at(s_blk, blk, vals.ravel())
    c_blk = np.bincount(blk, minlength=64).astype(np.int64) * c
    s_tot = int(vals.sum())
    c_tot = h * w * c
    bits = s_blk * c_tot > s_tot * c_blk
    out = int(((1 << np.arange(64, dtype=np.uint64)) * bits.astype(np.uint64)).sum())
    # keep it inside signed int64 for Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out
