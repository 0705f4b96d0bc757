"""Fake audio codec + audio operators + payload invariants (the audio
sibling of test_images.py: SNR>=40 dB lossy, byte-exact lossless and
captions)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cityfinder_spark.codecs.fakeaudio import (
    decode_audio,
    decode_audio_real,
    encode_audio,
    gen_samples,
    quantize_lossy_pcm,
    snr_db,
)
from cityfinder_spark.datagen.audio import audio_table
from cityfinder_spark.operators.audio_ops import (
    audio_features,
    audio_resample,
    check_audio_invariants,
)


def test_audio_codec_roundtrip_lossless():
    pcm = gen_samples(7, 500)
    fmt, sr, back = decode_audio(encode_audio(pcm, 16000, "wav"))
    assert fmt == "wav" and sr == 16000 and (back == pcm).all()


def test_audio_codec_lossy_snr_above_floor():
    pcm = gen_samples(8, 4096)
    fmt, sr, back = decode_audio(encode_audio(pcm, 8000, "ogg"))
    assert fmt == "ogg"
    s = snr_db(pcm, back)
    assert 40.0 <= s < 90.0  # quantization designed to clear 40 dB
    assert (back == quantize_lossy_pcm(pcm)).all()


def test_real_wav_roundtrip_byte_exact():
    """Hand-built RIFF/WAVE container parses back byte-exact through
    the stdlib `wave` module (an independent parser), and decode_audio
    dispatches on the RIFF signature."""
    import io
    import wave

    from cityfinder_spark.codecs.fakeaudio import (
        RIFF_SIG,
        encode_wav_real,
        encode_audio,
    )

    pcm = gen_samples(7, 1000)
    buf = encode_wav_real(pcm, 16000)
    assert buf[:4] == RIFF_SIG and buf[8:12] == b"WAVE"
    sr, back = decode_audio_real(buf)
    assert sr == 16000 and (back == pcm).all()
    # dispatch path: a real WAV flows through the generic decode
    fmt, sr2, back2 = decode_audio(encode_audio(pcm, 16000, "wav_real"))
    assert fmt == "wav" and sr2 == 16000 and (back2 == pcm).all()


def test_real_wav_decodes_stdlib_written_file():
    """Decode a WAV written by the stdlib `wave` module itself — not
    our encoder — so the decoder is proven against a third party."""
    import io
    import wave

    pcm = gen_samples(9, 500)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.astype("<i2").tobytes())
    sr, back = decode_audio_real(bio.getvalue())
    assert sr == 8000 and (back == pcm).all()


def test_audio_decode_real_oggmp3_is_stubbed():
    """ogg/mp3 (entropy-coded psychoacoustic codecs) remain the swap
    boundary; IMA ADPCM is the in-scope real compressed format."""
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"OggS compressed stream")


def test_real_adpcm_roundtrip_and_container():
    """IMA ADPCM WAV (fmt tag 0x11): spec container round-trips, the
    4x compression is real, and SNR on a band-limited signal meets
    the format's own quality envelope."""
    import struct as _s

    from cityfinder_spark.codecs.adpcm import (
        decode_adpcm_real,
        encode_adpcm_real,
    )
    from cityfinder_spark.codecs.fakeaudio import snr_db

    sr = 16000
    t = np.arange(sr) / sr
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t)
        + 4000 * np.sin(2 * np.pi * 1200 * t + 1.0)
    ).astype(np.int16)
    buf = encode_adpcm_real(sig, sr)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    # fmt tag is IMA ADPCM; fact chunk carries the true sample count
    (tag,) = _s.unpack_from("<H", buf, 20)
    assert tag == 0x0011
    assert len(buf) < sig.nbytes * 0.30  # ~4x compression
    sr2, back = decode_adpcm_real(buf)
    assert sr2 == sr and len(back) == len(sig)
    assert snr_db(sig, back) >= 25.0
    # dispatches through the generic decoder too
    fmt, sr3, pcm3 = decode_audio(buf)
    assert fmt == "adpcm" and sr3 == sr and (pcm3 == back).all()
    assert (decode_audio_real(buf)[1] == back).all()


def test_real_adpcm_state_machine_matches_audioop():
    """The per-block nibble recurrence agrees BIT-FOR-BIT with the
    stdlib audioop C implementation of IMA/DVI ADPCM — an independent
    implementation, decode AND encode, from random states (audioop
    packs first-sample-high; the WAV container is low-first, so the
    check repacks)."""
    audioop = pytest.importorskip("audioop")

    from cityfinder_spark.codecs.adpcm import _encode_nibbles, decode_nibbles

    rng = np.random.default_rng(5)
    for trial in range(25):
        codes = rng.integers(0, 16, 101).astype(np.uint8)
        pred = int(rng.integers(-30000, 30000))
        idx = int(rng.integers(0, 89))
        mine = decode_nibbles(codes, pred, idx)
        ce = np.append(codes, 0)
        frag = bytes(
            ((int(ce[i]) << 4) | int(ce[i + 1])) for i in range(0, len(ce) - 1, 2)
        )
        dec, _ = audioop.adpcm2lin(frag, 2, (pred, idx))
        assert (mine == np.frombuffer(dec, "<i2")[: len(codes)]).all(), trial
    # encoder side: same codes as audioop from the same state
    sig = (6000 * np.sin(np.arange(500) * 0.05)).astype(np.int16)
    codes, _p, _i = _encode_nibbles(sig, 100, 3)
    enc_my = bytes(
        ((int(codes[j]) << 4) | int(codes[j + 1])) for j in range(0, 500, 2)
    )
    enc_ref, _ = audioop.lin2adpcm(np.asarray(sig, "<i2").tobytes(), 2, (100, 3))
    assert enc_my == enc_ref


def test_real_adpcm_rejections():
    from cityfinder_spark.codecs.adpcm import (
        decode_adpcm_real,
        encode_adpcm_real,
    )

    sig = (1000 * np.sin(np.arange(2000) * 0.01)).astype(np.int16)
    buf = encode_adpcm_real(sig, 8000)
    with pytest.raises(ValueError):
        decode_adpcm_real(b"nonsense")
    with pytest.raises(ValueError):
        decode_adpcm_real(buf[:-7])  # partial trailing block
    with pytest.raises(ValueError, match="IMA ADPCM"):
        # a PCM16 container routed at the ADPCM decoder is rejected
        from cityfinder_spark.codecs.fakeaudio import encode_wav_real

        decode_adpcm_real(encode_wav_real(sig, 8000))


def test_real_adpcm_flows_through_audio_features(spark):
    """ADPCM payloads drive the Spark operator end-to-end: features
    come from the DECODED waveform and track the source clip (RMS
    within the codec error envelope)."""
    import pandas as pd

    from cityfinder_spark.codecs.adpcm import encode_adpcm_real

    sr = 8000
    rows = []
    want_rms = {}
    for k in range(6):
        t = np.arange(sr // 2) / sr
        sig = (
            (4000 + 800 * k) * np.sin(2 * np.pi * (200 + 60 * k) * t)
        ).astype(np.int16)
        rows.append((f"a{k}", encode_adpcm_real(sig, sr)))
        x = sig.astype(np.float64) / 32768.0
        want_rms[f"a{k}"] = float(np.sqrt((x * x).mean()))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["audio_id", "bytes"])
    )
    out = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert len(out) == 6
    for k, r in out.items():
        assert abs(r["rms"] - want_rms[k]) / want_rms[k] < 0.05, k


def test_real_wav_flows_through_audio_features(spark):
    """The driver-mandated plumbing works on REAL WAV payloads: the
    datagen's real_wav mode emits RIFF/WAVE bytes for wav rows; every
    feature from audio_features equals the fake-container run (the
    samples are identical — only the container changed)."""
    fake = {r["audio_id"]: r for r in audio_features(audio_table(spark, 30, partitions=2)).collect()}
    real_aud = audio_table(spark, 30, partitions=2, real_wav=True)
    sigs = {
        r["audio_id"]: bytes(r["bytes"])[:4]
        for r in real_aud.select("audio_id", "bytes", "fmt")
        .where("fmt = 'wav'")
        .collect()
    }
    assert sigs and all(s == b"RIFF" for s in sigs.values())
    real = {r["audio_id"]: r for r in audio_features(real_aud).collect()}
    assert fake.keys() == real.keys()
    for k in fake:
        assert tuple(fake[k]) == tuple(real[k]), k


def test_gen_samples_deterministic():
    a, b = gen_samples(42, 100), gen_samples(42, 100)
    assert (a == b).all()
    assert not (gen_samples(43, 100) == a).all()


def test_audio_features_values(spark):
    feats = audio_features(audio_table(spark, 20)).orderBy("audio_id").toPandas()
    assert len(feats) == 20
    # recompute row 0 locally, compare
    i = 0
    n = 256 + (i * 37) % 1792
    pcm = gen_samples(i, n)
    x = pcm.astype(np.float64) / 32768.0
    r0 = feats.iloc[0]
    assert r0["audio_id"] == "aud000000000000"
    assert r0["n_samples"] == n and r0["sr"] == 8000
    assert math.isclose(r0["rms"], float(np.sqrt((x * x).mean())), rel_tol=1e-12)
    assert math.isclose(
        r0["zcr"],
        float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()),
        rel_tol=1e-12,
    )
    assert 0.0 < r0["spectral_centroid_hz"] < r0["sr"] / 2
    # counter-mix samples are white noise: centroid ~ sr/4 (flat spectrum)
    assert abs(r0["spectral_centroid_hz"] / r0["sr"] - 0.25) < 0.05


def test_audio_resample_halves(spark):
    out = audio_resample(audio_table(spark, 10), factor=2).orderBy("audio_id").toPandas()
    src = audio_table(spark, 10).orderBy("audio_id").toPandas()
    assert (out["n_samples"].to_numpy() == src["n_samples"].to_numpy() // 2).all()
    assert (out["sr"].to_numpy() == src["sr"].to_numpy() // 2).all()
    fmt, sr, pcm = decode_audio(bytes(out.iloc[0]["bytes"]))
    assert pcm.size == out.iloc[0]["n_samples"]


def test_audio_invariants_all_ok(spark):
    verdicts = check_audio_invariants(audio_table(spark, 60)).toPandas()
    assert len(verdicts) == 60
    assert verdicts["snr_ok"].all()
    assert verdicts["caption_ok"].all()
    lossy = verdicts[verdicts["snr_db"] < 999.0]
    assert (lossy["snr_db"] >= 40.0).all()


def test_audio_invariants_detect_corruption(spark):
    from pyspark.sql import functions as F

    tbl = audio_table(spark, 10).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("!"))
    )
    verdicts = check_audio_invariants(tbl).toPandas()
    assert not verdicts["caption_ok"].any()


def test_audio_features_zero_sample_clip(spark):
    """A zero-length clip yields a zeroed feature row, not a crashed
    task (e.g. aggressive resample of a short clip)."""
    out = audio_resample(audio_table(spark, 3), factor=10_000)
    feats = audio_features(out).orderBy("audio_id").toPandas()
    assert len(feats) == 3
    assert (feats["n_samples"] == 0).all()
    assert (feats["rms"] == 0.0).all()
    assert (feats["spectral_centroid_hz"] == 0.0).all()


def test_audio_invariants_detect_length_corruption(spark):
    """Corrupted n_samples metadata -> snr_ok=False verdict, no crash."""
    from pyspark.sql import functions as F

    tbl = audio_table(spark, 6).withColumn(
        "n_samples", F.col("n_samples") + F.lit(1)
    )
    v = check_audio_invariants(tbl).toPandas()
    assert len(v) == 6
    assert not v["snr_ok"].any()


def test_real_adpcm_factless_stream_uses_samples_per_block():
    """An ADPCM WAV missing its (spec-mandatory, often omitted) fact
    chunk must not surface block zero-padding as audio: the decoder
    trims every block to wSamplesPerBlock, so a fact-less stream
    decodes to whole-block granularity and agrees with the
    fact-bearing decode on every real sample."""
    import struct as _s

    from cityfinder_spark.codecs.adpcm import decode_adpcm_real, encode_adpcm_real

    sr = 8000
    sig = (5000 * np.sin(np.arange(2500) * 0.013)).astype(np.int16)
    buf = encode_adpcm_real(sig, sr)
    _sr, with_fact = decode_adpcm_real(buf)
    assert len(with_fact) == len(sig)

    # rebuild the RIFF without the fact chunk
    out = bytearray(buf[:12])
    pos, spb = 12, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (ln,) = _s.unpack_from("<I", buf, pos + 4)
        if cid == b"fmt ":
            (spb,) = _s.unpack_from("<H", buf, pos + 8 + 18)
        if cid != b"fact":
            out += buf[pos : pos + 8 + ln + (ln & 1)]
        pos += 8 + ln + (ln & 1)
    _s.pack_into("<I", out, 4, len(out) - 8)
    _sr2, no_fact = decode_adpcm_real(bytes(out))
    assert spb is not None and spb > 1
    # whole-block granularity: padded up to spb, never a full capacity pad
    assert len(sig) <= len(no_fact) <= -(-len(sig) // spb) * spb
    assert (no_fact[: len(with_fact)] == with_fact).all()
