"""Deterministic distributed generator for the image+caption fact
table (the Iceberg-table stand-in mandated by the input hint:
image_id, bytes, w, h, fmt, caption, phash + geotag lat/lon).

Generation is a pure function of the row id, produced with
mapInPandas over spark.range(n) — embarrassingly parallel, no driver
materialization, any scale. ~30% of rows are clustered within ~0.1°
of a few hot cities (FIXTURES.md §2) to exercise skew handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cityfinder_spark.codecs.fakeimage import encode, gen_pixels, phash64

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lat double, lon double"
)

# hot cities for the skew clusters (subset of the 12 benchmark coords)
HOT_SPOTS = [(40.7128, -74.0060), (51.5074, -0.1278), (35.6895, 139.6917)]
SKEW_FRACTION = 0.3


def _row(i: int, real_png: bool = False, real_jpeg: bool = False) -> dict:
    rng = np.random.default_rng(42 + i)  # per-row deterministic stream
    w = int(8 + (i * 13) % 57)
    h = int(8 + (i * 7) % 57)
    fmt = "png" if i % 2 == 0 else "jpeg"
    pix = gen_pixels(i, w, h)
    if (i * 2654435761) % 100 < SKEW_FRACTION * 100:
        base = HOT_SPOTS[i % len(HOT_SPOTS)]
        lat = base[0] + float(rng.uniform(-0.1, 0.1))
        lon = base[1] + float(rng.uniform(-0.1, 0.1))
    else:
        lat = float(rng.uniform(-89.9, 89.9))
        lon = float(rng.uniform(-180.0, 180.0))
    # real_png: PNG rows carry SPEC-COMPLIANT PNG bytes (stdlib-zlib
    # codec, codecs.fakeimage.encode_png_real) instead of the fake
    # container — lossless, so every stat/phash/invariant is unchanged;
    # decode() dispatches on the PNG signature. real_jpeg: jpeg rows
    # carry SPEC-COMPLIANT baseline JFIF bytes (codecs/jpeg.py, q=98 —
    # decoded pixels stay >= 40 dB PSNR vs the splitmix64 reference
    # even on these worst-case noise images); decode() dispatches on
    # the SOI signature.
    enc_fmt = fmt
    if real_png and fmt == "png":
        enc_fmt = "png_real"
    elif real_jpeg and fmt == "jpeg":
        enc_fmt = "jpeg_real"
    return {
        "image_id": f"img{i:012d}",
        "bytes": encode(pix, enc_fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"caption for image {i}: a {w}x{h} {fmt} scene",
        "phash": phash64(pix),
        "lat": lat,
        "lon": lon,
    }


def expected_caption(i: int, w: int, h: int, fmt: str) -> str:
    return f"caption for image {i}: a {w}x{h} {fmt} scene"


def videos_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """n deterministic FVID rows: (video_id string, bytes binary,
    n_frames int, w int, h int) — frame pixels derive from the row id
    like images do."""
    from cityfinder_spark.codecs.fakeimage import encode_video

    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf = 3 + i % 4
                w, h = 8 + i % 9, 6 + i % 7
                frames = [gen_pixels(1000 + i * 10 + k, w, h) for k in range(nf)]
                rows.append(
                    {
                        "video_id": f"vid{i:08d}",
                        "bytes": encode_video(frames),
                        "n_frames": nf,
                        "w": w,
                        "h": h,
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen, schema="video_id string, bytes binary, n_frames int, w int, h int"
    )


def images_table(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    real_png: bool = False,
    real_jpeg: bool = False,
) -> DataFrame:
    """Generate n deterministic image rows, distributed. real_png=True
    emits spec-compliant zlib PNG bytes for the png rows (same pixels,
    stats, phash — only the container changes); real_jpeg=True emits
    spec-compliant baseline JFIF bytes for the jpeg rows (lossy but
    above the 40 dB invariant floor)."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [_row(int(i), real_png=real_png, real_jpeg=real_jpeg) for i in pdf["id"]]
            )

    return base.mapInPandas(gen, schema=IMAGES_SCHEMA)
