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


def test_real_jpeg_roundtrip_psnr_floor():
    """Baseline JFIF codec (stdlib+NumPy): encode -> decode stays
    above the 40 dB invariant floor even on worst-case noise pixels,
    and decode() dispatches on the SOI signature."""
    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    pix = gen_pixels(8, 64, 64)
    buf = encode_jpeg_real(pix, quality=98)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    back = decode_jpeg_real(buf)
    assert back.shape == pix.shape
    assert psnr(pix, back) >= 40.0
    # decode() and decode_real() both route the SOI stream
    fmt, via_dispatch = decode(buf)
    assert fmt == "jpeg" and (via_dispatch == back).all()
    assert (decode_real(buf) == back).all()
    # encode() fmt plumbing
    fmt, back2 = decode(encode(pix, "jpeg_real"))
    assert fmt == "jpeg" and (back2 == back).all()


def test_real_jpeg_analytic_fixtures():
    """Spec-math fixtures with closed-form expectations: a flat image
    is DC-only and must survive bit-exact (the DC path has no
    quantization error for in-gamut flat values); grayscale and odd
    sizes round-trip at the right shapes."""
    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    flat = np.full((16, 24, 3), 128, np.uint8)
    assert (decode_jpeg_real(encode_jpeg_real(flat, 95)) == flat).all()
    gray = gen_pixels(3, 33, 17, channels=1)
    back = decode_jpeg_real(encode_jpeg_real(gray, 98))
    assert back.shape == (17, 33, 1) and psnr(gray, back) >= 40.0
    for w, h in [(1, 1), (7, 9), (8, 8), (17, 5)]:
        pix = gen_pixels(w * 100 + h, w, h)
        assert decode_jpeg_real(encode_jpeg_real(pix, 98)).shape == pix.shape


def test_real_jpeg_marker_structure_and_table_driven_decode():
    """Container-level spec checks: mandatory marker sequence present,
    segment lengths self-consistent, and the decoder reads quant +
    huffman tables FROM the stream (DQT/DHT), so a stream with
    custom-scaled tables still decodes."""
    import struct as _s

    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    pix = gen_pixels(21, 24, 16)
    buf = encode_jpeg_real(pix, 90)
    # walk every marker segment; collect the set
    seen, pos = [], 2
    while pos < len(buf):
        assert buf[pos] == 0xFF
        m = buf[pos + 1]
        seen.append(m)
        pos += 2
        if m == 0xD9:
            break
        (ln,) = _s.unpack_from(">H", buf, pos)
        if m == 0xDA:  # SOS: entropy data follows until EOI
            pos = len(buf) - 2
            continue
        pos += ln
    assert seen[0] == 0xE0 and seen[-1] == 0xD9  # APP0 first, EOI last
    for must in (0xDB, 0xC0, 0xC4, 0xDA):  # DQT, SOF0, DHT, SOS
        assert must in seen
    assert seen.count(0xC4) == 4 and seen.count(0xDB) == 2
    # different quality -> different DQT bytes -> decoder must follow
    lo = decode_jpeg_real(encode_jpeg_real(pix, 50))
    hi = decode_jpeg_real(encode_jpeg_real(pix, 99))
    assert psnr(pix, hi) > psnr(pix, lo)


def test_real_jpeg_420_subsampling():
    """4:2:0 MCU interleave (2x2 chroma downsample) encodes and
    decodes: luma detail survives, smooth chroma round-trips well."""
    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    yy, xx = np.meshgrid(np.arange(48), np.arange(40), indexing="ij")
    smooth = np.stack(
        [((yy * 3 + xx * 2) // 2) % 200 + 20, (yy * 2) % 180 + 30, (xx * 3) % 150 + 50],
        -1,
    ).astype(np.uint8)
    buf = encode_jpeg_real(smooth, 90, subsample=True)
    back = decode_jpeg_real(buf)
    assert back.shape == smooth.shape
    assert psnr(smooth, back) >= 40.0
    # 4:2:0 stream is smaller than 4:4:4 at the same quality
    assert len(buf) < len(encode_jpeg_real(smooth, 90))


def test_real_jpeg_rejects_unsupported_and_truncated():
    """Out-of-scope streams fail with precise errors, truncation
    raises (so image_quarantine catches it) — never a wrong image."""
    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    buf = encode_jpeg_real(gen_pixels(5, 16, 16), 95)
    with pytest.raises(ValueError):
        decode_jpeg_real(b"\xff\xd8\xff\xe0 fake jfif")
    with pytest.raises(ValueError):
        decode_jpeg_real(buf[: len(buf) // 2])  # truncated entropy data
    bad = bytearray(buf)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC3  # lossless sequential: out of scope
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_real(bytes(bad))
    prog = bytearray(buf)
    prog[sof + 1] = 0xC2  # progressive-tagged but full-band scan
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg_real(bytes(prog))


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


def test_real_jpeg_flows_through_decode_stats_and_invariants(spark):
    """The driver-mandated plumbing works on REAL JPEG payloads: the
    datagen's real_jpeg mode emits baseline JFIF bytes for jpeg rows;
    image_decode_stats returns identical dims/fmt to the fake run, the
    phash of the (lossy) decoded pixels stays within hamming 4 of the
    reference phash, and the end-to-end payload invariant (PSNR>=40,
    caption byte-exact) holds on every row."""
    fake = {
        r["image_id"]: r for r in decode_stats(images_table(spark, 30, partitions=2)).collect()
    }
    real_imgs = images_table(spark, 30, partitions=2, real_jpeg=True)
    sigs = {
        r["image_id"]: bytes(r["bytes"])[:2]
        for r in real_imgs.select("image_id", "bytes", "fmt")
        .where("fmt = 'jpeg'")
        .collect()
    }
    assert sigs and all(s == b"\xff\xd8" for s in sigs.values())
    real = {r["image_id"]: r for r in decode_stats(real_imgs).collect()}
    assert fake.keys() == real.keys()
    for k in fake:
        assert (real[k]["w"], real[k]["h"], real[k]["fmt"]) == (
            fake[k]["w"],
            fake[k]["h"],
            fake[k]["fmt"],
        ), k
        ham = bin((real[k]["phash"] ^ fake[k]["phash"]) & (2**64 - 1)).count("1")
        assert ham <= 4, (k, ham)
    verdicts = check_payload_invariants(real_imgs).collect()
    assert len(verdicts) == 30
    assert all(v["psnr_ok"] and v["caption_ok"] and v["phash_ok"] for v in verdicts)


def test_real_jpeg_quarantine_catches_truncation(spark):
    """Truncated real-JFIF payloads quarantine (ok=false) while intact
    real-JFIF rows decode with their true dims."""
    import pandas as pd

    from cityfinder_spark.codecs.jpeg import encode_jpeg_real
    from cityfinder_spark.operators.images_ops import decode_quarantine

    good = encode_jpeg_real(gen_pixels(5, 12, 10), 95)
    df = spark.createDataFrame(
        pd.DataFrame(
            [("ok", good), ("trunc", good[: len(good) // 2]), ("stub", good[:3])],
            columns=["image_id", "bytes"],
        )
    )
    out = {r["image_id"]: r for r in decode_quarantine(df).collect()}
    assert out["ok"]["ok"] and (out["ok"]["w"], out["ok"]["h"]) == (12, 10)
    assert not out["trunc"]["ok"] and not out["stub"]["ok"]


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


# ---------------- phash near-dup (banded hamming join) ----------------


def _brute_phash_pairs(sigs: dict, max_dist: int):
    ids = sorted(sigs)
    return sorted(
        (a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= max_dist
    )


def test_phash64_integer_exact_cross_multiplication():
    """phash64's bit rule is S_blk * C_tot > S_tot * c_blk over raw
    integer byte sums — verify bit-for-bit against an independent
    per-block brute force, including a tiny image with empty blocks."""
    for i, w, h in [(0, 8, 8), (7, 33, 19), (99, 64, 64), (3, 4, 4)]:
        pix = gen_pixels(i, w, h)
        vals = pix.astype(np.int64).sum(axis=2)
        S, C = int(vals.sum()), h * w * 3
        exp = 0
        for b in range(64):
            bi, bj = b // 8, b % 8
            ys = [y for y in range(h) if min(7, (8 * y + 7) // h) == bi]
            xs = [x for x in range(w) if min(7, (8 * x + 7) // w) == bj]
            sb = sum(int(vals[y, x]) for y in ys for x in xs)
            cb = len(ys) * len(xs) * 3
            if sb * C > S * cb:
                exp |= 1 << b
        exp = exp - (1 << 64) if exp >= (1 << 63) else exp
        assert phash64(pix) == exp


def test_phash_near_dup_exact_vs_brute_force(spark):
    """The banded join finds EXACTLY the hamming<=3 pairs (pigeonhole
    guarantee, not probabilistic): planted near-dup variants with
    hamming 0..3 are all recovered, farther ones all rejected."""
    from cityfinder_spark.operators.images_ops import (
        perturb_variants,
        phash_near_dup,
    )

    imgs = images_table(spark, 80, partitions=4)
    inp = imgs.select("image_id", "bytes").unionByName(perturb_variants(imgs))
    got = sorted(
        (r.img_a, r.img_b, r.hamming)
        for r in phash_near_dup(inp, max_dist=3).collect()
    )
    sigs = {r.image_id: r.phash for r in decode_stats(inp).collect()}
    assert got == _brute_phash_pairs(sigs, 3)
    # planted dups exist and are found (hamming spread starts at 0)
    assert any(a.startswith("dup") or b.startswith("dup") for a, b, _ in got)
    assert len(got) >= 10


def test_hamming_pairs_64bit_sign_bit_safe(spark):
    """Signatures with the sign bit set (negative longs) chunk and
    compare correctly — unsigned shifts, long xor, 64-bit popcount."""
    from cityfinder_spark.operators.dedup import hamming_pairs

    def s64(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    base = 0xF234_5678_9ABC_DEF0
    rows = [
        ("a", s64(base)),
        ("b", s64(base ^ (1 << 63))),          # 1 bit off, in the top chunk
        ("c", s64(base ^ 0b111)),              # 3 bits off, bottom chunk
        ("d", s64(base ^ ((1 << 62) | (1 << 1) | (1 << 33) | (1 << 17)))),  # 4 off
        ("e", 12345),                           # far away
    ]
    sig = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {
        (r.img_a, r.img_b): r.hamming
        for r in hamming_pairs(
            sig, max_dist=3, bits=64, id_col="image_id",
            sig_col="phash", out_cols=("img_a", "img_b"),
        ).collect()
    }
    # exact expectation: brute force over the five signatures
    sigs = dict(rows)
    assert sorted((a, b, h) for (a, b), h in pairs.items()) == _brute_phash_pairs(sigs, 3)


# ------------------------------------------------------------- sharpness


def test_sharpness_constant_image_is_blurry(spark):
    """A flat image has zero Laplacian everywhere -> energy 0, not
    sharp; pure noise has huge energy -> sharp."""
    from cityfinder_spark.codecs.fakeimage import encode, gen_pixels
    from cityfinder_spark.operators.images_ops import sharpness_stats

    flat = np.full((16, 16, 3), 128, np.uint8)
    noise = gen_pixels(7, 16, 16)
    df = spark.createDataFrame(
        [("flat", bytearray(encode(flat, "png"))),
         ("noise", bytearray(encode(noise, "png")))],
        "image_id string, bytes binary",
    )
    out = {r["image_id"]: r for r in sharpness_stats(df).collect()}
    assert out["flat"]["lap_energy"] == 0 and not out["flat"]["is_sharp"]
    assert out["flat"]["n_interior"] == 14 * 14
    assert out["noise"]["lap_energy"] > 0 and out["noise"]["is_sharp"]
    # hand-check one interior pixel's contribution bound
    assert out["noise"]["sharpness"] > 5000


def test_sharpness_matches_numpy_reference(spark):
    """Row-wise equality with a direct NumPy recomputation."""
    from cityfinder_spark.codecs.fakeimage import encode, gen_pixels
    from cityfinder_spark.operators.images_ops import sharpness_stats

    rows, want = [], {}
    for seed, (w, h) in enumerate([(8, 8), (12, 9), (33, 21)]):
        pix = gen_pixels(seed * 31 + 1, w, h)
        rows.append((f"i{seed}", bytearray(encode(pix, "jpeg"))))
        q = ((pix >> 2) << 2)[:, :, 0].astype(np.int64)
        lap = (4 * q[1:-1, 1:-1] - q[:-2, 1:-1] - q[2:, 1:-1]
               - q[1:-1, :-2] - q[1:-1, 2:])
        want[f"i{seed}"] = ((h - 2) * (w - 2), int((lap * lap).sum()))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r["image_id"]: r for r in sharpness_stats(df).collect()}
    for k, (n_int, energy) in want.items():
        assert (out[k]["n_interior"], out[k]["lap_energy"]) == (n_int, energy)


def test_sharpness_degenerate_size_not_sharp(spark):
    from cityfinder_spark.codecs.fakeimage import encode, gen_pixels
    from cityfinder_spark.operators.images_ops import sharpness_stats

    tiny = gen_pixels(3, 2, 2)
    df = spark.createDataFrame(
        [("tiny", bytearray(encode(tiny, "png")))], "image_id string, bytes binary"
    )
    (r,) = sharpness_stats(df).collect()
    assert r["n_interior"] == 0 and r["lap_energy"] == 0
    assert r["sharpness"] == 0.0 and not r["is_sharp"]


def test_diversity_stats_flags_flat_not_uniform(spark):
    """Planted 4-value ('low') variants are flat (collision mass
    > n^2/16); the uniform-ish base payloads are not; coll_mass is
    the exact integer sum of squared histogram counts."""
    import numpy as np

    from cityfinder_spark.codecs.fakeimage import decode
    from cityfinder_spark.operators.images_ops import (
        degrade_variants,
        diversity_stats,
    )

    base = images_table(spark, 56, partitions=2)
    pop = base.select("image_id", "bytes").unionByName(degrade_variants(base))
    rows = {r["image_id"]: r for r in diversity_stats(pop).collect()}
    assert sum(k.startswith("low") for k in rows) == 8
    for k, r in rows.items():
        assert r["is_flat"] == k.startswith("low")
        assert r["is_flat"] == (
            r["coll_mass"] * 16 > r["n_pixels"] * r["n_pixels"]
        )
    # spot-check one histogram against a direct decode
    buf = bytes(base.where("image_id = 'img000000000003'").collect()[0]["bytes"])
    _, pix = decode(buf)
    c = np.bincount(pix.reshape(-1), minlength=256).astype(np.int64)
    r = rows["img000000000003"]
    assert (
        r["coll_mass"],
        r["n_distinct"],
        r["max_count"],
    ) == (int(np.dot(c, c)), int(np.count_nonzero(c)), int(c.max()))


def test_degrade_variants_four_values(spark):
    """A degraded payload decodes to at most 4 distinct byte values
    (top-2-bit mask survives the lossy re-quantization)."""
    import numpy as np

    from cityfinder_spark.codecs.fakeimage import decode
    from cityfinder_spark.operators.images_ops import degrade_variants

    base = images_table(spark, 15, partitions=1)
    for r in degrade_variants(base).collect():
        _, pix = decode(bytes(r["bytes"]))
        vals = np.unique(pix.reshape(-1))
        assert len(vals) <= 4 and all(v & 0x3F == 0 for v in vals)


def test_decode_quarantine_survives_corruption(spark):
    """Truncated, magic-corrupted and empty payloads quarantine
    (ok=false, null dims) without failing the job; intact rows decode
    with their true shapes."""
    import pandas as pd

    from cityfinder_spark.codecs.fakeimage import encode, gen_pixels
    from cityfinder_spark.operators.images_ops import decode_quarantine

    good = encode(gen_pixels(5, 8, 10), "png")
    rows = [
        ("ok1", good),
        ("trunc", good[:10]),
        ("magic", b"XY" + good[2:]),
        ("empty", b""),
        ("ok2", encode(gen_pixels(6, 9, 7), "jpeg")),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes"])
    )
    out = {r["image_id"]: r for r in decode_quarantine(df).collect()}
    assert out["ok1"]["ok"] and (out["ok1"]["w"], out["ok1"]["h"]) == (8, 10)
    assert out["ok2"]["ok"] and out["ok2"]["fmt"] == "jpeg"
    for bad in ("trunc", "magic", "empty"):
        r = out[bad]
        assert not r["ok"] and r["w"] is None and r["fmt"] is None
    assert out["empty"]["n_bytes"] == 0


def test_real_mjpeg_avi_roundtrip_and_structure():
    """Real video: MJPEG frames in a spec AVI RIFF container —
    round-trips through the baseline JFIF codec per frame, container
    markers verified, truncation rejected."""
    import struct as _s

    from cityfinder_spark.codecs.mjpeg import decode_mjpeg_avi, encode_mjpeg_avi

    yy, xx = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    frames = [
        np.stack(
            [(yy * 4 + k * 9) % 200 + 20, (xx * 3) % 150 + 40, ((yy + xx) * 2) % 180 + 30],
            -1,
        ).astype(np.uint8)
        for k in range(5)
    ]
    buf = encode_mjpeg_avi(frames, fps=10, quality=95)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert b"MJPG" in buf[:300] and b"idx1" in buf
    back = decode_mjpeg_avi(buf)
    assert back.shape == (5, 24, 32, 3)
    for k in range(5):
        assert psnr(frames[k], back[k]) >= 40.0
    # dispatch through the generic video decoder
    assert (decode_video(buf) == back).all()
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_mjpeg_avi(buf[: len(buf) // 2])
    with _pt.raises(ValueError):
        decode_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_real_mjpeg_avi_flows_through_frame_sample(spark):
    """frame_sample runs unchanged on real AVI payloads: sampled
    frames decode (as PNG re-encodes) and match the source frames."""
    import pandas as pd

    from cityfinder_spark.codecs.mjpeg import encode_mjpeg_avi

    frames = []
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    for k in range(6):
        frames.append(
            np.stack([(yy * 8 + k * 11) % 256, (xx * 8) % 256, np.full((16, 16), 30 * k)], -1).astype(np.uint8)
        )
    vids = spark.createDataFrame(
        pd.DataFrame([{"video_id": "v0", "bytes": encode_mjpeg_avi(frames, quality=98)}])
    )
    rows = {r["frame_idx"]: r for r in frame_sample(vids, every=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    for k, r in rows.items():
        _fmt, pix = decode(bytes(r["bytes"]))
        assert psnr(frames[k], pix) >= 40.0


def test_real_mjpeg_avi_strict_rejects_foreign_codec():
    """Dispatch honesty (the ADPCM strict-reject stance): an AVI whose
    vids stream handler is not MJPG is refused up front instead of
    feeding foreign bitstreams to the JFIF decoder; the strh header is
    the standard 56 bytes so the handler sits at its fixed offset."""
    import struct as _s

    from cityfinder_spark.codecs.mjpeg import decode_mjpeg_avi, encode_mjpeg_avi

    frames = [np.full((16, 16, 3), 90, np.uint8)]
    buf = encode_mjpeg_avi(frames, fps=5)
    # strh chunk body must be exactly 56 bytes (fixed rcFrame offset)
    sh = buf.find(b"strh")
    (strh_len,) = _s.unpack_from("<I", buf, sh + 4)
    assert strh_len == 56
    assert buf[sh + 8 : sh + 16] == b"vidsMJPG"
    bad = bytearray(buf)
    bad[sh + 12 : sh + 16] = b"cvid"  # pretend cinepak
    with pytest.raises(ValueError, match="MJPG"):
        decode_mjpeg_avi(bytes(bad))
    # physically-short buffer vs declared RIFF size: clean ValueError
    with pytest.raises(ValueError, match="truncated"):
        decode_mjpeg_avi(buf[:-3])


def test_real_jpeg_tolerates_fill_bytes():
    """T.81 B.1.1.2 fill bytes: extra 0xFF padding before a marker id
    is legal; the decoder must skip it, not misparse."""
    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    pix = gen_pixels(11, 24, 24)
    buf = encode_jpeg_real(pix, 95)
    base = decode_jpeg_real(buf)
    filled = bytearray(buf)
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xda"):
        at = bytes(filled).find(marker)
        filled[at:at] = b"\xff\xff"  # two fill bytes before the marker
    assert (decode_jpeg_real(bytes(filled)) == base).all()


def test_real_jpeg_progressive_roundtrip_exact_vs_baseline():
    """Progressive (SOF2) streams: spectral selection + successive
    approximation + EOB runs decode to the BIT-IDENTICAL pixels of
    the baseline stream at the same (quality, subsample) — the two
    encoders share one quantized-coefficient front end, so full
    progressive reconstruction must recover exactly those
    coefficients. Also pins the PSNR invariant floor directly."""
    from cityfinder_spark.codecs.jpeg import (
        decode_jpeg_real,
        encode_jpeg_progressive,
        encode_jpeg_real,
    )

    for seed, (h, w, c), sub in [
        (3, (24, 32, 3), False),
        (4, (40, 56, 3), True),
        (5, (17, 23, 1), False),
    ]:
        pix = gen_pixels(seed, w, h) if c == 3 else gen_pixels(seed, w, h)[:, :, :1]
        pb = encode_jpeg_progressive(pix, 98, subsample=sub)
        bb = encode_jpeg_real(pix, 98, subsample=sub)
        # really progressive: SOF2 marker, multiple SOS scans
        assert b"\xff\xc2" in pb and pb.count(b"\xff\xda") >= 6
        dec_p = decode_jpeg_real(pb)
        assert (dec_p == decode_jpeg_real(bb)).all(), (seed, sub)
        if not sub:
            # the invariant floor, same quality the suite pins baseline at
            assert psnr(pix, dec_p) >= 40.0
    # smooth image maximizes EOB-run batching; flat maximizes empty bands
    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    smooth = np.stack(
        [(yy * 255 // 48), (xx * 255 // 64), ((yy + xx) % 256)], -1
    ).astype(np.uint8)
    for img in (smooth, np.full((64, 64, 3), 77, np.uint8)):
        from cityfinder_spark.codecs.jpeg import (
            decode_jpeg_real as d,
            encode_jpeg_progressive as ep,
            encode_jpeg_real as er,
        )

        assert (d(ep(img, 90)) == d(er(img, 90))).all()


def test_real_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: a restart-bearing baseline stream decodes to exactly
    the no-DRI pixels; all eight RST markers appear (cycle 0..7) and
    a stream with a corrupted restart sequence is rejected."""
    from cityfinder_spark.codecs.jpeg import decode_jpeg_real, encode_jpeg_real

    yy, xx = np.meshgrid(np.arange(96), np.arange(128), indexing="ij")
    pix = np.stack(
        [(yy * 3) % 256, (xx * 5) % 256, (yy + xx) % 256], -1
    ).astype(np.uint8)
    plain = decode_jpeg_real(encode_jpeg_real(pix, 92))
    dri = encode_jpeg_real(pix, 92, restart_interval=5)
    assert b"\xff\xdd" in dri
    for m in range(8):
        assert bytes((0xFF, 0xD0 + m)) in dri, m
    assert (decode_jpeg_real(dri) == plain).all()
    # break the first RST marker's sequence number -> precise error
    bad = bytearray(dri)
    at = bad.find(b"\xff\xd0", 200)
    bad[at + 1] = 0xD3
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_real(bytes(bad))


def test_real_jpeg_quarantine_progressive_now_decodes(spark):
    """The round-4 boundary is closed: progressive payloads were
    reject-rows (ok=false) and now decode through the same
    codec-agnostic pipeline, while genuinely unsupported streams
    (arithmetic-coded SOF9) still quarantine cleanly."""
    import pandas as pd

    from cityfinder_spark.codecs.jpeg import encode_jpeg_progressive, encode_jpeg_real
    from cityfinder_spark.operators.images_ops import decode_quarantine

    pix = gen_pixels(11, 20, 14)
    prog = encode_jpeg_progressive(pix, 95)
    arith = bytearray(encode_jpeg_real(pix, 95))
    arith[arith.find(b"\xff\xc0") + 1] = 0xC9  # arithmetic sequential
    df = spark.createDataFrame(
        pd.DataFrame(
            [("prog", prog), ("arith", bytes(arith))],
            columns=["image_id", "bytes"],
        )
    )
    out = {r["image_id"]: r for r in decode_quarantine(df).collect()}
    assert out["prog"]["ok"] and (out["prog"]["w"], out["prog"]["h"]) == (20, 14)
    assert not out["arith"]["ok"]


def test_real_jpeg_progressive_restart_intervals():
    """Progressive + DRI: restart markers inside SOF2 multi-scan
    streams (camera/web layout) — DC predictors, EOB runs and their
    buffered correction bits reset at every RSTn; the decode must
    equal the no-DRI baseline decode exactly at several intervals."""
    from cityfinder_spark.codecs.jpeg import (
        decode_jpeg_real,
        encode_jpeg_progressive,
        encode_jpeg_real,
    )

    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    pix = np.stack(
        [(yy * 3) % 256, (xx * 5) % 256, (yy + xx) % 256], -1
    ).astype(np.uint8)
    for sub in (False, True):
        base = decode_jpeg_real(encode_jpeg_real(pix, 92, subsample=sub))
        for ri in (1, 3, 7):
            pd = encode_jpeg_progressive(
                pix, 92, subsample=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in pd and b"\xff\xd0" in pd
            assert (decode_jpeg_real(pd) == base).all(), (sub, ri)
    # corrupted RST sequence inside a progressive scan -> precise error
    pd = encode_jpeg_progressive(pix, 92, restart_interval=3)
    bad = bytearray(pd)
    at = bad.find(b"\xff\xd0", bad.find(b"\xff\xda"))
    bad[at + 1] = 0xD6
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_real(bytes(bad))


def test_real_jpeg_decoder_fuzz_never_hangs_or_crashes_python():
    """Poison-row safety (the 10^12-payload reality): random byte
    flips, truncations and insertions over valid baseline AND
    progressive streams must always TERMINATE — either a decoded
    uint8 image or an exception decode_quarantine converts to a
    verdict row. Every internal loop is progress-bounded, so no
    corrupt stream can wedge an executor."""
    import random

    from cityfinder_spark.codecs.jpeg import (
        decode_jpeg_real,
        encode_jpeg_progressive,
        encode_jpeg_real,
    )

    pix = gen_pixels(19, 24, 18)
    streams = [
        encode_jpeg_real(pix, 90),
        encode_jpeg_real(pix, 90, restart_interval=2),
        encode_jpeg_progressive(pix, 90),
    ]
    rng = random.Random(99)
    outcomes = {"ok": 0, "raised": 0}
    for trial in range(240):
        buf = bytearray(rng.choice(streams))
        op = rng.randrange(3)
        if op == 0:  # flip 1-4 bytes
            for _ in range(rng.randint(1, 4)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        elif op == 1:  # truncate
            del buf[rng.randrange(4, len(buf)) :]
        else:  # insert garbage
            at = rng.randrange(len(buf))
            buf[at:at] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 8)))
        try:
            out = decode_jpeg_real(bytes(buf))
            assert out.dtype == np.uint8 and out.ndim == 3
            outcomes["ok"] += 1
        except Exception:
            outcomes["raised"] += 1
    # both outcomes occur across 240 mutations; neither crashes pytest
    assert outcomes["raised"] > 100
