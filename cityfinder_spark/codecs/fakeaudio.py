"""Deterministic fake audio codec (the audio sibling of fakeimage).

No audio libs (soundfile/librosa/ffmpeg) exist in this container, so
real decode is STUBBED behind a deterministic fake format whose
Spark-side plumbing (binary columns, Arrow batch shapes, UDF
signatures, invariants) is fully real and tested:

  * FWAV: lossless — header + raw int16 PCM samples (byte-exact).
  * FOGG: "lossy"  — samples quantized to 16-step levels (>>4<<4);
    reconstruction error <= 15/32768 full scale, SNR far above the
    40 dB invariant floor mirrored from the image PSNR mandate.

Samples are generated from a counter-based mix of (audio_id, t) so any
row's reference waveform can be regenerated anywhere without carrying
state — the same property that makes the image PSNR invariant
checkable per-row at any scale (see codecs/fakeimage.py).

Real-codec integration point: swap encode_audio/decode_audio for
soundfile/ffmpeg calls; everything above the codec is codec-agnostic.
`decode_audio_real` raises NotImplementedError to mark the boundary.
"""

from __future__ import annotations

import struct

import numpy as np

from cityfinder_spark.codecs.fakeimage import _mix64

MAGIC_WAV = b"FWAV"
MAGIC_OGG = b"FOGG"
_HDR = struct.Struct("<4sIIB")  # magic, sample_rate, n_samples, channels


def gen_samples(audio_seed: int, n: int) -> np.ndarray:
    """Reference int16 PCM waveform (n,), regenerable anywhere."""
    idx = np.arange(n, dtype=np.uint64) + (
        np.uint64(audio_seed % (1 << 62)) << np.uint64(2)
    )
    return (_mix64(idx) & np.uint64(0xFFFF)).astype(np.uint16).view(np.int16)


def quantize_lossy_pcm(pcm: np.ndarray) -> np.ndarray:
    """FOGG 'compression': drop the 4 low bits (max error 15)."""
    return ((pcm.view(np.uint16) >> 4) << 4).view(np.int16)


def encode_audio(pcm: np.ndarray, sample_rate: int, fmt: str) -> bytes:
    if fmt == "wav":
        return _HDR.pack(MAGIC_WAV, sample_rate, pcm.shape[0], 1) + pcm.tobytes()
    if fmt == "ogg":
        return (
            _HDR.pack(MAGIC_OGG, sample_rate, pcm.shape[0], 1)
            + quantize_lossy_pcm(pcm).tobytes()
        )
    raise ValueError(f"unknown audio fmt {fmt!r}")


def decode_audio(buf: bytes) -> tuple[str, int, np.ndarray]:
    """-> (fmt, sample_rate, int16 samples)."""
    magic, sr, n, _c = _HDR.unpack_from(buf, 0)
    fmt = {MAGIC_WAV: "wav", MAGIC_OGG: "ogg"}.get(magic)
    if fmt is None:
        raise ValueError(f"bad audio magic {magic!r}")
    pcm = np.frombuffer(buf, dtype=np.int16, offset=_HDR.size, count=n)
    return fmt, sr, pcm


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    """Signal-to-noise ratio of the reconstruction, in dB."""
    ref_f = ref.astype(np.float64)
    err = ref_f - got.astype(np.float64)
    p_err = float((err * err).mean())
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(float((ref_f * ref_f).mean()) / p_err)


def decode_audio_real(buf: bytes) -> np.ndarray:
    """Boundary marker for real codecs (soundfile/ffmpeg absent)."""
    raise NotImplementedError(
        "real audio decode requires soundfile/ffmpeg; use decode_audio "
        "(deterministic fake) in this sandbox"
    )
