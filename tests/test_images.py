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


def test_real_jpeg_is_still_stubbed():
    """Real JPEG remains the (only) swap boundary — libjpeg absent."""
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0 fake jfif")


def test_real_png_roundtrip_byte_exact():
    """Spec-compliant PNG via stdlib zlib: encode -> decode_real is
    byte-exact, and decode() dispatches on the PNG signature."""
    from cityfinder_spark.codecs.fakeimage import PNG_SIG, encode_png_real

    for shape in ((10, 20, 3), (7, 5, 1), (6, 6, 4)):
        pix = gen_pixels(11, shape[1], shape[0], channels=shape[2])
        buf = encode_png_real(pix)
        assert buf[:8] == PNG_SIG
        assert (decode_real(buf) == pix).all()
    pix = gen_pixels(12, 16, 9)
    fmt, back = decode(encode(pix, "png_real"))
    assert fmt == "png" and (back == pix).all()


def test_real_png_all_filter_types_unfilter():
    """decode_real must reverse every PNG scanline filter (0-4), not
    just the filter-0 lines our encoder emits — forward-filter each
    row per the spec, then decode."""
    import struct
    import zlib

    from cityfinder_spark.codecs.fakeimage import (
        PNG_SIG,
        _chunk,
        _IHDR,
        decode_real as dreal,
    )

    pix = gen_pixels(13, 11, 7)  # (7, 11, 3)
    h, w, c = pix.shape
    rows = pix.reshape(h, w * c).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        line = rows[y]
        prev = rows[y - 1] if y else np.zeros(w * c, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), line[:-c]])
        upleft = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if ft == 0:
            pred = np.zeros(w * c, dtype=np.int32)
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = prev
        elif ft == 3:
            pred = (left + prev) >> 1
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
        raw.append(ft)
        raw.extend(((line - pred) % 256).astype(np.uint8).tobytes())
    buf = (
        PNG_SIG
        + _chunk(b"IHDR", _IHDR.pack(w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert (dreal(buf) == pix).all()


def test_real_png_flows_through_decode_stats(spark):
    """The driver-mandated plumbing works on REAL PNG payloads: the
    datagen's real_png mode emits spec PNG bytes for png rows; every
    stat/phash from image_decode_stats equals the fake-container run
    (the pixels are identical — only the container changed)."""
    fake = {r["image_id"]: r for r in decode_stats(images_table(spark, 40, partitions=2)).collect()}
    real_imgs = images_table(spark, 40, partitions=2, real_png=True)
    # the png rows really are PNG byte streams
    sigs = {
        r["image_id"]: bytes(r["bytes"])[:8]
        for r in real_imgs.select("image_id", "bytes", "fmt")
        .where("fmt = 'png'")
        .collect()
    }
    assert sigs and all(s == b"\x89PNG\r\n\x1a\n" for s in sigs.values())
    real = {r["image_id"]: r for r in decode_stats(real_imgs).collect()}
    assert fake.keys() == real.keys()
    for k in fake:
        assert tuple(fake[k]) == tuple(real[k]), k


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
