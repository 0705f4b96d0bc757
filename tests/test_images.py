"""Fake codec + multimodal operators + end-to-end payload invariants
through the nearest-city join (BASELINE.json: PSNR>=40 lossy,
byte-exact captions, payload preserved through the pipeline)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cityfinder_spark.codecs.fakeimage import (
    decode,
    decode_real,
    decode_video,
    encode,
    encode_video,
    gen_pixels,
    phash64,
    psnr,
    quantize_lossy,
)
from cityfinder_spark.datagen.images import images_table
from cityfinder_spark.operators.images_ops import (
    check_payload_invariants,
    decode_stats,
    frame_sample,
    resize_half,
)
from cityfinder_spark.operators.nearest import nearest_city_join


def test_codec_roundtrip_lossless():
    pix = gen_pixels(7, 20, 10)
    fmt, back = decode(encode(pix, "png"))
    assert fmt == "png" and (back == pix).all()


def test_codec_lossy_psnr_above_floor():
    pix = gen_pixels(8, 64, 64)
    fmt, back = decode(encode(pix, "jpeg"))
    assert fmt == "jpeg"
    p = psnr(pix, back)
    assert 40.0 <= p < 50.0  # quantization designed to sit above 40dB
    assert (back == quantize_lossy(pix)).all()


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG...")


def test_video_roundtrip_and_sampling():
    frames = [gen_pixels(100 + k, 8, 6) for k in range(5)]
    vid = encode_video(frames)
    back = decode_video(vid)
    assert back.shape == (5, 6, 8, 3)
    assert (back[3] == frames[3]).all()


def test_phash_deterministic_and_robust():
    pix = gen_pixels(9, 32, 32)
    assert phash64(pix) == phash64(pix.copy())
    # lossy quantization must not change the perceptual hash
    assert phash64(pix) == phash64(quantize_lossy(pix))


def test_images_table_and_decode_stats(spark):
    imgs = images_table(spark, 60, partitions=4)
    stats = {r["image_id"]: r for r in decode_stats(imgs).collect()}
    raw = {r["image_id"]: r for r in imgs.collect()}
    assert len(stats) == 60
    for k, s in stats.items():
        assert (s["w"], s["h"]) == (raw[k]["w"], raw[k]["h"])
        if s["fmt"] == "png":
            assert s["phash"] == raw[k]["phash"]


def test_resize_half(spark):
    imgs = images_table(spark, 10, partitions=2)
    out = {r["image_id"]: r for r in resize_half(imgs).collect()}
    raw = {r["image_id"]: r for r in imgs.collect()}
    for k, r in out.items():
        assert r["w"] == max(raw[k]["w"] // 2, 1)
        fmt, pix = decode(bytes(r["bytes"]))
        assert pix.shape[1] == r["w"]


def test_frame_sample(spark):
    pdf = pd.DataFrame(
        [
            {"video_id": "v0", "bytes": encode_video([gen_pixels(k, 8, 8) for k in range(6)])}
        ]
    )
    vids = spark.createDataFrame(pdf)
    rows = frame_sample(vids, every=2).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]


def test_payload_invariants_end_to_end(spark):
    """Generate -> nearest-city join (bytes ride along, no shuffle) ->
    invariant check: every row must hold."""
    imgs = images_table(spark, 120, partitions=4).withColumnRenamed("image_id", "pt_id")
    cities = spark.createDataFrame(
        pd.DataFrame(
            [(0, "NYC", 40.7128, -74.0060, "US"), (1, "London", 51.5074, -0.1278, "GB"),
             (2, "Tokyo", 35.6895, 139.6917, "JP")],
            columns=["city_id", "name", "lat", "lon", "country"],
        )
    )
    joined = nearest_city_join(imgs, cities, level=3).withColumnRenamed("pt_id", "image_id")
    assert joined.count() == 120
    verdicts = check_payload_invariants(
        joined.drop("name")  # drop join's city name; keep image cols
        .withColumnRenamed("city_id", "_cid")
    ).collect()
    assert len(verdicts) == 120
    assert all(v["psnr_ok"] and v["caption_ok"] and v["phash_ok"] for v in verdicts)


def test_invariant_check_catches_corruption(spark):
    imgs = images_table(spark, 8, partitions=1).toPandas()
    b = bytearray(imgs.loc[3, "bytes"])
    for off in range(50, 250):  # trash a pixel span in one payload
        b[off] ^= 0xAA
    imgs.loc[3, "bytes"] = bytes(b)
    imgs.loc[5, "caption"] = "tampered"
    df = spark.createDataFrame(imgs)
    v = {r["image_id"]: r for r in check_payload_invariants(df).collect()}
    bad_pix = imgs.loc[3, "image_id"]
    bad_cap = imgs.loc[5, "image_id"]
    assert not v[bad_pix]["psnr_ok"] or not v[bad_pix]["phash_ok"]
    assert not v[bad_cap]["caption_ok"]
    ok_ids = set(v) - {bad_pix, bad_cap}
    assert all(v[k]["psnr_ok"] and v[k]["caption_ok"] for k in ok_ids)
