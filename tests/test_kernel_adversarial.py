"""Adversarial batch-kernel tests: the chord/dot prefilter paths of
_solve_batch and _topk_batch against a brute-force oracle built from
the SAME rounded kernel (_hav_pairs_rounded), so any disagreement is a
candidate-generation / prune / tie-break bug, not a formula ulp.

Stress targets:
  * exact-duplicate city positions (consecutive ids) — the tie-
    collapsed k-th-max iteration sees duplicate dot values;
  * cities spaced within the rounding step of each other — rounded-
    distance ties must resolve city_id-ascending through the prune;
  * poles / antimeridian — escalation + blind-scan paths;
  * points equidistant between duplicate clusters.
"""

from __future__ import annotations

import numpy as np
import pytest

from cityfinder_spark.operators import nearest_arrow as na


def _mk_cities(spark):
    rng = np.random.default_rng(7)
    rows = []
    cid = 0
    # 5-way exact duplicates at 40 random sites
    for _ in range(40):
        la = float(rng.uniform(-80, 80))
        lo = float(rng.uniform(-179, 179))
        for _ in range(5):
            rows.append((cid, f"c{cid}", la, lo, "XX"))
            cid += 1
    # micro-spaced chains (~1e-7 km apart -> same rounded distance)
    for _ in range(40):
        la = float(rng.uniform(-80, 80))
        lo = float(rng.uniform(-179, 179))
        for j in range(4):
            rows.append((cid, f"c{cid}", la + j * 1e-9, lo, "XX"))
            cid += 1
    # polar + antimeridian singletons
    for la, lo in [(89.99, 0.0), (-89.99, 100.0), (0.0, 179.999), (0.0, -179.999), (75.0, 179.99)]:
        rows.append((cid, f"c{cid}", la, lo, "XX"))
        cid += 1
    # background scatter
    for _ in range(200):
        rows.append(
            (cid, f"c{cid}", float(rng.uniform(-89, 89)), float(rng.uniform(-180, 180)), "XX")
        )
        cid += 1
    return spark.createDataFrame(
        rows, "city_id long, name string, lat double, lon double, country string"
    )


def _mk_points():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.99, 89.99, 400)
    lon = rng.uniform(-180.0, 180.0, 400)
    # pin some points onto/near the duplicate sites and the poles
    lat[:5] = [89.995, -89.995, 0.0, 40.0, -40.0]
    lon[:5] = [10.0, -170.0, 179.9999, 0.0, 0.0]
    return lat, lon


def _oracle_topk(index, lat, lon, k, digits):
    """Brute force: all (point, city) pairs through the identical
    rounded kernel, ranked (rounded d, city position)."""
    npts, nc = len(lat), len(index.city_id)
    pt = np.repeat(np.arange(npts, dtype=np.int64), nc)
    ct = np.tile(np.arange(nc, dtype=np.int64), npts)
    d = na._hav_pairs_rounded(
        index, np.radians(lat), np.radians(lon), np.cos(np.radians(lat)), pt, ct, digits
    )
    d2 = d.reshape(npts, nc)
    out_pos = np.empty((npts, min(k, nc)), np.int64)
    out_d = np.empty((npts, min(k, nc)))
    for i in range(npts):
        ordi = np.lexsort((np.arange(nc), d2[i]))[: min(k, nc)]
        out_pos[i] = ordi
        out_d[i] = d2[i][ordi]
    return out_pos, out_d


@pytest.fixture(scope="module")
def idx(spark):
    return na.build_city_index(_mk_cities(spark), 5, 1)


def test_solve_batch_matches_bruteforce(idx):
    lat, lon = _mk_points()
    pos, d = na._solve_batch(idx, lat, lon, na.ROUND_DIGITS)
    o_pos, o_d = _oracle_topk(idx, lat, lon, 1, na.ROUND_DIGITS)
    np.testing.assert_array_equal(pos, o_pos[:, 0])
    np.testing.assert_array_equal(d, o_d[:, 0])


@pytest.mark.parametrize("k", [1, 3, 5, 17])
def test_topk_batch_matches_bruteforce(idx, k):
    """k=17 exercises the unpruned fallback (k > 16)."""
    lat, lon = _mk_points()
    rows, pos, d, rank = na._topk_batch(idx, lat, lon, k, na.ROUND_DIGITS)
    o_pos, o_d = _oracle_topk(idx, lat, lon, k, na.ROUND_DIGITS)
    kk = o_pos.shape[1]
    assert len(rows) == len(lat) * kk
    order = np.lexsort((rank, rows))
    rows_s, pos_s, d_s, rank_s = rows[order], pos[order], d[order], rank[order]
    np.testing.assert_array_equal(rows_s, np.repeat(np.arange(len(lat)), kk))
    np.testing.assert_array_equal(rank_s, np.tile(np.arange(1, kk + 1), len(lat)))
    np.testing.assert_array_equal(pos_s.reshape(len(lat), kk), o_pos)
    np.testing.assert_array_equal(d_s.reshape(len(lat), kk), o_d)


def test_topk_duplicate_sites_rank_by_id(idx):
    """A point sitting exactly on a 5-way duplicate site must list the
    five co-located cities first, in city_id order, at distance 0."""
    site = np.argwhere(
        (idx.city_id[:, None] + 1 == idx.city_id[None, :])
        & (idx.rad_lat[:, None] == idx.rad_lat[None, :])
    )
    assert len(site)
    p = int(site[0][0])
    lat = np.array([np.degrees(idx.rad_lat[p])])
    lon = np.array([np.degrees(idx.rad_lon[p])])
    rows, pos, d, rank = na._topk_batch(idx, lat, lon, 3, na.ROUND_DIGITS)
    order = np.argsort(rank)
    assert d[order][0] == 0.0
    # ranked ids strictly ascending among zero-distance ties
    zero = d[order] == 0.0
    ids = idx.city_id[pos[order]][zero]
    assert np.all(np.diff(ids) > 0)


def test_f32_prefilter_parity_with_f64(spark):
    """The float32 squared-difference prefilter (half the gather
    traffic on the bandwidth-bound hot loop) returns BIT-IDENTICAL
    (position, rounded distance) to the float64 dot prefilter —
    margins widen by the f32 error budget, survivors re-measure in
    float64, so only the candidate set (never the answer) differs.
    Includes near-tie pairs 1-2 m apart, where a naive f32 dot form
    would misrank."""
    import pandas as pd

    rng = np.random.default_rng(77)
    n = 400
    pdf = pd.DataFrame(
        {
            "city_id": np.arange(n, dtype=np.int64),
            "lat": rng.uniform(-85, 85, n),
            "lon": rng.uniform(-180, 180, n),
            "name": [f"c{i}" for i in range(n)],
            "country": ["XX"] * n,
        }
    )
    # plant near-tie twins ~1.5 m apart (sub-f32-position-error scale)
    pdf.loc[1, ["lat", "lon"]] = (pdf.loc[0, "lat"] + 1.4e-5, pdf.loc[0, "lon"])
    pdf.loc[3, ["lat", "lon"]] = (pdf.loc[2, "lat"], pdf.loc[2, "lon"] + 2e-5)
    cities = spark.createDataFrame(pdf)
    idx32 = na.build_city_index(cities, 5, 1)
    assert getattr(idx32, "use_f32_prefilter", None) is True
    idx64 = na.build_city_index(cities, 5, 1)
    idx64.use_f32_prefilter = False
    lat = rng.uniform(-85, 85, 3000)
    lon = rng.uniform(-180, 180, 3000)
    # aim a third of the probes at the planted near-tie sites
    lat[:1000] = pdf.loc[0, "lat"] + rng.uniform(-0.01, 0.01, 1000)
    lon[:1000] = pdf.loc[0, "lon"] + rng.uniform(-0.01, 0.01, 1000)
    p32, d32 = na._solve_batch(idx32, lat, lon, na.ROUND_DIGITS)
    p64, d64 = na._solve_batch(idx64, lat, lon, na.ROUND_DIGITS)
    np.testing.assert_array_equal(p32, p64)
    np.testing.assert_array_equal(d32, d64)
