"""Deterministic distributed generator for the audio+caption table
(the audio sibling of datagen/images.py): audio_id, bytes, sr,
n_samples, fmt, caption. Pure function of the row id via mapInPandas
over spark.range(n) — embarrassingly parallel, any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cityfinder_spark.codecs.fakeaudio import encode_audio, gen_samples

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sr int, n_samples int, fmt string, "
    "caption string"
)

_RATES = (8000, 16000, 22050)


def expected_audio_caption(i: int, n: int, sr: int, fmt: str) -> str:
    return f"caption for audio {i}: {n} samples at {sr} Hz ({fmt})"


def _row(i: int, real_wav: bool = False) -> dict:
    sr = _RATES[i % len(_RATES)]
    n = 256 + (i * 37) % 1792
    fmt = "wav" if i % 2 == 0 else "ogg"
    pcm = gen_samples(i, n)
    # real_wav: wav rows carry SPEC-COMPLIANT RIFF/WAVE bytes (stdlib
    # `wave`-parsable) instead of the fake container — same samples.
    enc_fmt = "wav_real" if (real_wav and fmt == "wav") else fmt
    return {
        "audio_id": f"aud{i:012d}",
        "bytes": encode_audio(pcm, sr, enc_fmt),
        "sr": sr,
        "n_samples": n,
        "fmt": fmt,
        "caption": expected_audio_caption(i, n, sr, fmt),
    }


def audio_table(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    real_wav: bool = False,
) -> DataFrame:
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([_row(int(i), real_wav=real_wav) for i in pdf["id"]])

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA)
