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

Real-codec integration point: swap encode/decode for Pillow calls;
everything above the codec (schemas, mapInPandas operators, invariant
checks) is codec-agnostic. A real decode here raises
NotImplementedError via `decode_real` to mark the boundary.
"""

from __future__ import annotations

import struct

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
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes) -> tuple[str, np.ndarray]:
    magic, w, h, c = _HDR.unpack_from(buf, 0)
    fmt = {MAGIC_PNG: "png", MAGIC_JPG: "jpeg"}.get(magic)
    if fmt is None:
        raise ValueError(f"bad magic {magic!r}")
    pix = np.frombuffer(buf, dtype=np.uint8, offset=_HDR.size).reshape(h, w, c)
    return fmt, pix


def decode_real(buf: bytes) -> np.ndarray:
    """Boundary marker for real codecs (Pillow/libjpeg absent here)."""
    raise NotImplementedError(
        "real image decoding requires Pillow/libjpeg — not in this "
        "container; the deterministic fake codec stands in (see module "
        "docstring)"
    )


def encode_video(frames: list[np.ndarray]) -> bytes:
    h, w, c = frames[0].shape
    head = _HDR.pack(MAGIC_VID, w, h, c) + struct.pack("<H", len(frames))
    return head + b"".join(f.tobytes() for f in frames)


def decode_video(buf: bytes) -> np.ndarray:
    """-> (n_frames, h, w, c)."""
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
    """Deterministic 64-bit perceptual-style hash: 8x8 block means
    thresholded at the global mean (gray)."""
    gray = pix.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                                xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).ravel()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # keep it inside signed int64 for Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out
