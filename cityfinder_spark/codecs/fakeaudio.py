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

Real-codec integration point: REAL WAV (RIFF/WAVE PCM16) is
implemented end-to-end — `encode_wav_real` builds the RIFF container
by hand per the spec, `decode_audio_real` parses it back with the
stdlib `wave` module (an independent parser, so the roundtrip proves
spec compliance, mirroring codecs/fakeimage.py's real-PNG path), and
`decode_audio` dispatches on the RIFF signature so a real WAV payload
flows through audio_features unchanged (pytest-pinned). REAL
COMPRESSED audio is implemented too (r4): IMA ADPCM in its RIFF/WAVE
container (fmt tag 0x11, 4 bits/sample — codecs/adpcm.py), the
per-block nibble recurrence cross-verified bit-for-bit against the
stdlib audioop C implementation; the RIFF dispatch routes on the fmt
tag, so ADPCM payloads flow through audio_features as well. The fake
formats remain the default datagen path (they make the SNR oracle
closed-form); ogg/mp3 specifically still need soundfile/ffmpeg and
raise NotImplementedError (entropy-coded psychoacoustic codecs are
out of stdlib scope — IMA ADPCM is the in-scope compressed format).
"""

from __future__ import annotations

import io
import struct
import wave

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
    if fmt == "wav_real":
        return encode_wav_real(pcm, sample_rate)
    raise ValueError(f"unknown audio fmt {fmt!r}")


def decode_audio(buf: bytes) -> tuple[str, int, np.ndarray]:
    """-> (fmt, sample_rate, int16 samples)."""
    if buf[:4] == RIFF_SIG and buf[8:12] == b"WAVE":
        if _riff_fmt_tag(buf) == 0x0011:  # IMA ADPCM container
            from cityfinder_spark.codecs.adpcm import decode_adpcm_real

            sr, pcm = decode_adpcm_real(buf)
            return "adpcm", sr, pcm
        sr, pcm = decode_audio_real(buf)
        return "wav", sr, pcm
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


# ---- real WAV (RIFF/WAVE PCM16; stdlib only, no soundfile needed) ----

RIFF_SIG = b"RIFF"
_FMT_PCM16 = struct.Struct("<HHIIHH")  # tag, ch, sr, byterate, align, bits


def _riff_fmt_tag(buf: bytes) -> int | None:
    """The WAVE format tag of the first fmt chunk (chunk-walk, not a
    fixed offset — fmt need not be first)."""
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        if cid == b"fmt " and ln >= 2:
            (tag,) = struct.unpack_from("<H", buf, pos + 8)
            return tag
        pos += 8 + ln + (ln & 1)
    return None


def encode_wav_real(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Spec-compliant RIFF/WAVE: PCM16 mono, canonical 44-byte header,
    built by hand per the spec (the decoder below parses it back with
    the stdlib `wave` module — an INDEPENDENT parser, so the roundtrip
    test proves the container is genuinely well-formed)."""
    data = pcm.astype("<i2").tobytes()
    fmt = _FMT_PCM16.pack(1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_SIG + struct.pack("<I", len(body)) + body


def decode_audio_real(buf: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF/WAVE decode -> (sample_rate, int16 mono samples):
    PCM16 parses via the stdlib `wave` module (independent parser);
    IMA ADPCM (fmt tag 0x11) routes to the codecs/adpcm.py decoder
    (cross-verified against stdlib audioop). ogg/mp3 — entropy-coded
    psychoacoustic codecs — still require soundfile/ffmpeg and raise
    NotImplementedError."""
    if buf[:4] == b"OggS" or buf[:3] == b"ID3" or buf[:2] == b"\xff\xfb":
        raise NotImplementedError(
            "ogg/mp3 require soundfile/ffmpeg — not in this container; "
            "IMA ADPCM (codecs/adpcm.py) is the supported compressed "
            "format, the deterministic fake codec stands in otherwise"
        )
    if _riff_fmt_tag(buf) == 0x0011:
        from cityfinder_spark.codecs.adpcm import decode_adpcm_real

        return decode_adpcm_real(buf)
    with wave.open(io.BytesIO(buf), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {wf.getsampwidth()} (want 16-bit)"
            )
        if wf.getnchannels() != 1:
            raise ValueError(
                f"unsupported WAV channel count {wf.getnchannels()} (want mono)"
            )
        sr = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return sr, pcm
