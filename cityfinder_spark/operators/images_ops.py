"""Multimodal (image/video) column operators.

Images travel as opaque `binary` columns with typed metadata; every
per-row kernel is an Arrow-batched mapInPandas/pandas-UDF (never
row-at-a-time Python, per the input hint). The codec is the
deterministic fake from codecs.fakeimage — swap it for Pillow and the
plumbing (schemas, batch shapes, signatures) is unchanged.

Key invariant operator: `check_payload_invariants` verifies, per row,
the BASELINE.json mandate — decoded pixels byte-exact for lossless /
PSNR >= 40 dB for lossy, and byte-exact captions — by regenerating
the reference pixels from the image id (pure function, so the check
is embarrassingly parallel at any scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.codecs.fakeimage import (
    decode,
    decode_video,
    encode,
    gen_pixels,
    phash64,
    psnr,
)
from cityfinder_spark.datagen.images import expected_caption

PSNR_FLOOR_DB = 40.0

DECODE_STATS_SCHEMA = (
    "image_id string, fmt string, w int, h int, mean_pixel double, phash long"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every payload, emit shape/stat/phash per image."""
    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                fmt, pix = decode(bytes(buf))
                out.append(
                    {
                        "image_id": img_id,
                        "fmt": fmt,
                        "w": pix.shape[1],
                        "h": pix.shape[0],
                        "mean_pixel": float(pix.astype(np.float64).mean()),
                        "phash": phash64(pix),
                    }
                )
            yield pd.DataFrame(out)

    return cols.mapInPandas(op, schema=DECODE_STATS_SCHEMA)


def resize_half(images: DataFrame) -> DataFrame:
    """2x box-downsample each image; re-encodes with the same fmt.
    Output: image_id, bytes, w, h (new dims)."""
    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                fmt, pix = decode(bytes(buf))
                h2, w2 = max(pix.shape[0] // 2, 1), max(pix.shape[1] // 2, 1)
                ds = pix[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, -1).mean(
                    axis=(1, 3)
                ).astype(np.uint8)
                out.append(
                    {"image_id": img_id, "bytes": encode(ds, fmt), "w": w2, "h": h2}
                )
            yield pd.DataFrame(out)

    return cols.mapInPandas(op, schema="image_id string, bytes binary, w int, h int")


def frame_sample(videos: DataFrame, every: int = 2) -> DataFrame:
    """Sample every k-th frame of FVID payloads -> one row per kept
    frame (video_id, frame_idx, bytes as lossless image)."""
    cols = videos.select("video_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for vid, buf in zip(pdf["video_id"], pdf["bytes"]):
                frames = decode_video(bytes(buf))
                for idx in range(0, frames.shape[0], every):
                    out.append(
                        {
                            "video_id": vid,
                            "frame_idx": idx,
                            "bytes": encode(frames[idx], "png"),
                        }
                    )
            yield pd.DataFrame(out)

    return cols.mapInPandas(op, schema="video_id string, frame_idx int, bytes binary")


def check_payload_invariants(images: DataFrame) -> DataFrame:
    """Per-row invariant verdicts vs the regenerated reference:
    (image_id, psnr_db, psnr_ok, caption_ok, phash_ok)."""
    cols = images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")

    def op(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                i = int(str(r.image_id).removeprefix("img"))
                fmt, pix = decode(bytes(r.bytes))
                ref = gen_pixels(i, int(r.w), int(r.h))
                p = psnr(ref, pix)
                psnr_ok = (pix == ref).all() if fmt == "png" else p >= PSNR_FLOOR_DB
                out.append(
                    {
                        "image_id": r.image_id,
                        "psnr_db": min(p, 999.0),
                        "psnr_ok": bool(psnr_ok),
                        "caption_ok": r.caption
                        == expected_caption(i, int(r.w), int(r.h), fmt),
                        "phash_ok": int(r.phash) == phash64(ref),
                    }
                )
            yield pd.DataFrame(out)

    return cols.mapInPandas(
        op,
        schema=(
            "image_id string, psnr_db double, psnr_ok boolean, "
            "caption_ok boolean, phash_ok boolean"
        ),
    )


def perturb_variants(
    images: DataFrame, every: int = 5, n_bytes: int = 96, delta: int = 68
) -> DataFrame:
    """Derive near-duplicate variants: for every `every`-th image
    (by numeric id), XOR `delta` into the first `n_bytes` decoded
    pixel bytes and re-encode with the same format, under a new
    'dupNNN' id. delta=68 (bits 2 and 6) survives the lossy
    re-quantization (both bits are above the dropped low-2-bits), so
    the variant's decoded pixels differ from the source by exactly the
    planted perturbation — the standard augmentation/corruption shape
    used to exercise near-dup detection. With the defaults the planted
    pairs span hamming 0..~6 against the source phash, so a downstream
    near-dup join at max_dist=3 sees real hits AND real misses.
    Output: (image_id, bytes)."""
    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                i = int(str(img_id).removeprefix("img"))
                if i % every:
                    continue
                fmt, pix = decode(bytes(buf))
                flat = pix.reshape(-1).copy()
                k = min(n_bytes, flat.size)
                flat[:k] ^= np.uint8(delta)
                out.append(
                    {
                        "image_id": f"dup{i:012d}",
                        "bytes": encode(flat.reshape(pix.shape), fmt),
                    }
                )
            yield pd.DataFrame(out, columns=["image_id", "bytes"])

    return cols.mapInPandas(op, schema="image_id string, bytes binary")


def phash_near_dup(
    images: DataFrame, max_dist: int = 3, cache_key: tuple | None = None
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance:
    decode -> 64-bit integer-exact phash (one Arrow pass, zero
    shuffle) -> banded hamming self-join. The banding is EXACT, not
    probabilistic: the 64 bits split into max_dist+1 chunks, and any
    pair within max_dist hamming agrees on >= 1 chunk (pigeonhole),
    so candidates come from an equi-join on (chunk_idx, chunk_value)
    — never O(n^2). Only (image_id, 3 longs) rows shuffle; the image
    payloads never leave the decode stage. That is the 10^12-image
    dedup shape: linear candidate generation at fixed bucket
    occupancy, constant per-pair refinement (one xor+popcount).
    Output: (img_a, img_b, hamming).

    The banded join references the signature table on BOTH sides, and
    Spark recomputes each reference's lineage — without a cache the
    Arrow decode pass runs twice. cache_key (same stance as
    minhash_lsh_pairs' band memo) persists the slim (image_id, phash)
    table once per session; payload bytes are dropped before the
    persist."""
    from cityfinder_spark.bcast import memo_table
    from cityfinder_spark.operators.dedup import hamming_pairs

    key = None if cache_key is None else ("phash-sig", *cache_key)
    sig = memo_table(
        images.sparkSession,
        key,
        lambda: decode_stats(images).select("image_id", "phash"),
    )
    return hamming_pairs(
        sig,
        max_dist=max_dist,
        bits=64,
        id_col="image_id",
        sig_col="phash",
        out_cols=("img_a", "img_b"),
    )


SHARP_LAP_T = 5000  # integer mean-Laplacian-energy floor for is_sharp

SHARPNESS_SCHEMA = (
    "image_id string, n_interior long, lap_energy long,"
    " sharpness double, is_sharp boolean"
)


def sharpness_stats(images: DataFrame) -> DataFrame:
    """Blur/sharpness gate per image: 4-neighbor Laplacian energy over
    channel-0 interior pixels — the standard variance-of-Laplacian
    quality screen a training pipeline runs before spending GPU time
    on a crawl image, here in its integer-exact form.

      lap(x,y) = 4*p(x,y) - p(x-1,y) - p(x+1,y) - p(x,y-1) - p(x,y+1)
      lap_energy = sum(lap^2)          (int64; <= (4*255)^2 * w*h)
      sharpness  = lap_energy / n_interior   (6-digit floor-rounded)
      is_sharp   = lap_energy >= SHARP_LAP_T * n_interior  (pure
                   integer cross-multiplication — no float threshold)

    Scale shape: zero shuffle — one mapInPandas over the partitioned
    scan (the only plan allowed to read `bytes`), NumPy-vectorized
    Laplacian per image, nothing but the id + 4 numbers out. Exactly
    DuckDB-replayable: decoded pixels are the splitmix64 closed form
    and every aggregate is integer until the final division."""
    from cityfinder_spark.colutils import round_digits_col
    from pyspark.sql import functions as F

    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            ids, n_int, energy = [], [], []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                _fmt, pix = decode(bytes(buf))
                c = pix[:, :, 0].astype(np.int64)
                h, w = c.shape
                if h < 3 or w < 3:
                    ids.append(img_id)
                    n_int.append(0)
                    energy.append(0)
                    continue
                lap = (
                    4 * c[1:-1, 1:-1]
                    - c[:-2, 1:-1]
                    - c[2:, 1:-1]
                    - c[1:-1, :-2]
                    - c[1:-1, 2:]
                )
                ids.append(img_id)
                n_int.append((h - 2) * (w - 2))
                energy.append(int((lap * lap).sum()))
            yield pd.DataFrame(
                {"image_id": ids, "n_interior": n_int, "lap_energy": energy}
            )

    raw = cols.mapInPandas(op, schema="image_id string, n_interior long, lap_energy long")
    return raw.select(
        "image_id",
        "n_interior",
        "lap_energy",
        round_digits_col(
            F.col("lap_energy")
            / F.greatest(F.col("n_interior"), F.lit(1)).cast("double"),
            6,
        ).alias("sharpness"),
        (
            (F.col("n_interior") > 0)
            & (F.col("lap_energy") >= F.lit(SHARP_LAP_T) * F.col("n_interior"))
        ).alias("is_sharp"),
    )


# flat iff collision mass exceeds 1/16: coll * FLAT_DEN > n^2 * FLAT_NUM
FLAT_NUM, FLAT_DEN = 1, 16

DIVERSITY_SCHEMA = (
    "image_id string, fmt string, n_pixels long, n_distinct int,"
    " max_count long, coll_mass long, is_flat boolean"
)


def degrade_variants(
    images: DataFrame, every: int = 7, mask: int = 0xC0
) -> DataFrame:
    """Derive LOW-DIVERSITY variants: for every `every`-th image (by
    numeric id), mask each decoded byte to its top two bits (4
    distinct values) and re-encode under a new 'lowNNN' id — the
    blank/flat-render corruption shape (solid fills, dead sensors,
    failed decodes) a curation gate must catch. mask=0xC0 is a subset
    of the lossy keep-mask 0xFC, so the jpeg re-quantization changes
    nothing and the final decoded byte is exactly raw & mask for both
    formats (what the DuckDB oracle replays). Output: (image_id, bytes)."""
    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                i = int(str(img_id).removeprefix("img"))
                if i % every:
                    continue
                fmt, pix = decode(bytes(buf))
                out.append(
                    {
                        "image_id": f"low{i:012d}",
                        "bytes": encode(pix & np.uint8(mask), fmt),
                    }
                )
            yield pd.DataFrame(out, columns=["image_id", "bytes"])

    return cols.mapInPandas(op, schema="image_id string, bytes binary")


def diversity_stats(images: DataFrame) -> DataFrame:
    """Pixel-diversity gate per image — the blank/flat-image screen
    run before any GPU touches the batch. Emits the byte-histogram
    summary (distinct values, modal count, and the Renyi-2 COLLISION
    MASS sum(c_b^2) — an entropy screen with NO logarithms, so every
    number is an exact int64 at any parallelism) and the verdict
        is_flat := coll_mass * FLAT_DEN > n_pixels^2 * FLAT_NUM
    i.e. collision probability > FLAT_NUM/FLAT_DEN (= Renyi-2 entropy
    under 4 bits). Uniform-ish real payloads sit near 1/256 (png) or
    1/64 (jpeg quantized); solid fills hit 1.0 — the integer
    cross-multiplication separates them with no float anywhere.

    Zero shuffle: one mapInPandas over the payload scan (np.bincount
    per image); only the 7-column summary leaves the executors."""
    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                fmt, pix = decode(bytes(buf))
                c = np.bincount(pix.reshape(-1), minlength=256).astype(np.int64)
                n = int(pix.size)
                coll = int(np.dot(c, c))
                out.append(
                    {
                        "image_id": img_id,
                        "fmt": fmt,
                        "n_pixels": n,
                        "n_distinct": int(np.count_nonzero(c)),
                        "max_count": int(c.max()),
                        "coll_mass": coll,
                        "is_flat": coll * FLAT_DEN > n * n * FLAT_NUM,
                    }
                )
            yield pd.DataFrame(out)

    return cols.mapInPandas(op, schema=DIVERSITY_SCHEMA)


QUARANTINE_SCHEMA = (
    "image_id string, n_bytes long, ok boolean, fmt string, w int, h int"
)


def decode_quarantine(images: DataFrame) -> DataFrame:
    """Corrupt-payload quarantine — the error boundary a 10^12-row
    media pipeline cannot skip: at that scale truncated uploads, bad
    container bytes and codec bombs are CERTAIN, and one poison row
    must neither kill the job nor silently pass. Every payload is
    decoded under a per-row try; failures emit (ok=false, null
    dims) instead of raising, successes carry shape + format — so
    downstream stages filter `ok` and the quarantine set is itself a
    queryable table (count it, sample it, re-fetch it).

    Zero shuffle: one Arrow pass over the payload scan; only the
    7-column verdict leaves the executors. Any decode exception maps
    to the single normalized verdict ok=false (exception taxonomy is
    codec-internal and version-unstable — the contract is
    decodes/doesn't)."""
    cols = images.select("image_id", "bytes")

    def op(batches):
        for pdf in batches:
            out = []
            for img_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                b = bytes(buf)
                row = {
                    "image_id": img_id,
                    "n_bytes": len(b),
                    "ok": True,
                    "fmt": None,
                    "w": None,
                    "h": None,
                }
                try:
                    fmt, pix = decode(b)
                    row["fmt"] = fmt
                    row["w"] = int(pix.shape[1])
                    row["h"] = int(pix.shape[0])
                except Exception:
                    row["ok"] = False
                out.append(row)
            yield pd.DataFrame(out)

    return cols.mapInPandas(op, schema=QUARANTINE_SCHEMA)


GEO_DEDUP_LEVEL = 12  # ~4.9 km cells — re-upload blocking radius


def geo_phash_near_dup(
    sig: DataFrame,
    *,
    level: int = GEO_DEDUP_LEVEL,
    max_dist: int = 3,
    max_km: float = 1.0,
    id_col: str = "image_id",
    sig_col: str = "phash",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Geo-blocked perceptual near-dup: pairs of images that are
    visually near-identical (phash hamming <= max_dist) AND taken at
    the same place (<= max_km apart) — the "same scene re-uploaded
    with a jittered geotag" dedup a geotagged image corpus needs,
    where a global phash join would merge genuinely different sites
    that share a bland visual signature.

    Scale shape: the self-join is blocked on the FINE spatial grid,
    not on the hash — one side explodes its ring-1 cell neighborhood
    (9 cells at `level`), the other keys to its single cell, and the
    candidate join is a hash equi-join on cell id. Candidates are
    linear in local density (ring occupancy), never O(n^2); each pair
    is produced exactly once (b's unique cell appears at most once in
    a's ring) and refined by one xor+popcount and one haversine.
    Only (id, phash, lat, lon) rows shuffle — payload bytes stay in
    the decode stage that produced `sig`.

    sig: (id_col, sig_col, lat_col, lon_col).
    Output: (img_a, img_b, hamming, dist_km) with img_a < img_b.
    """
    from cityfinder_spark.geo.cells import cell_col, ring_cells_col
    from cityfinder_spark.geo.distance import haversine_rounded_col

    a = sig.select(
        F.col(id_col).alias("img_a"),
        F.col(sig_col).alias("ph_a"),
        F.col(lat_col).alias("lat_a"),
        F.col(lon_col).alias("lon_a"),
    ).withColumn("cell_a", cell_col("lat_a", "lon_a", level))
    a = a.withColumn(
        "probe", F.explode(ring_cells_col(F.col("cell_a"), 1, level))
    ).drop("cell_a")
    b = sig.select(
        F.col(id_col).alias("img_b"),
        F.col(sig_col).alias("ph_b"),
        F.col(lat_col).alias("lat_b"),
        F.col(lon_col).alias("lon_b"),
    ).withColumn("cell_b", cell_col("lat_b", "lon_b", level))
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    dist = haversine_rounded_col("lat_a", "lon_a", "lat_b", "lon_b")
    return (
        a.join(
            b,
            (F.col("probe") == F.col("cell_b"))
            & (F.col("img_a") < F.col("img_b")),
        )
        .where(ham <= max_dist)
        .select(
            "img_a",
            "img_b",
            ham.cast("int").alias("hamming"),
            dist.alias("dist_km"),
        )
        .where(F.col("dist_km") <= max_km)
    )
