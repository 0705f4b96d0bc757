"""Adversarial geometry for the region cover (operators/cover.py):
random convex polygons of wildly different sizes — including polygons
SMALLER than a max-level cell (vertex-witness only) and thin slivers
(border-crossing witness only) — must still classify exactly:
cover_read == brute-force ray cast on random probe points."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.operators.cover import cover_read, region_cover
from cityfinder_spark.operators.point_in_polygon import point_in_polygon_np


def _poly_df(spark, polys):
    rows = [
        (pid, f"P{pid}", [float(v) for v in lats], [float(v) for v in lons])
        for pid, (lats, lons) in enumerate(polys)
    ]
    return spark.createDataFrame(
        rows,
        "polygon_id int, country string, ring_lats array<double>, "
        "ring_lons array<double>",
    )


def _random_convex(rng, clat, clon, r_lat, r_lon, nv=7):
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    lats = clat + r_lat * np.sin(ang)
    lons = clon + r_lon * np.cos(ang)
    return lats, lons


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_cover_read_exact_on_random_polygons(spark, seed):
    rng = np.random.RandomState(seed)
    polys = []
    # big (spans several coarse cells), medium, tiny (sub-cell at
    # max level: 180/2^7 = 1.4 deg), and a thin sliver
    polys.append(_random_convex(rng, rng.uniform(-50, 50), rng.uniform(-150, 150), 20.0, 25.0))
    polys.append(_random_convex(rng, rng.uniform(-50, 50), rng.uniform(-150, 150), 5.0, 6.0))
    polys.append(_random_convex(rng, rng.uniform(-50, 50), rng.uniform(-150, 150), 0.4, 0.5))
    polys.append(_random_convex(rng, rng.uniform(-40, 40), rng.uniform(-140, 140), 0.15, 30.0))
    pdf = _poly_df(spark, polys)

    n = 4000
    lat = rng.uniform(-75.0, 75.0, n)
    lon = rng.uniform(-178.0, 178.0, n)
    pts = spark.createDataFrame(
        [(i, float(lat[i]), float(lon[i])) for i in range(n)],
        "pt_id long, lat double, lon double",
    )
    got = {
        (r.pt_id, r.polygon_id)
        for r in cover_read(pts, pdf).select("pt_id", "polygon_id").collect()
    }
    want = set()
    for pid, (rl, rn) in enumerate(polys):
        inside = point_in_polygon_np(lat, lon, np.asarray(rl), np.asarray(rn))
        want |= {(int(i), pid) for i in np.nonzero(inside)[0]}
    assert got == want


def test_tiny_polygon_is_covered_by_partial_cells_only(spark):
    # polygon strictly inside one max-level cell: the cover must be
    # non-empty (vertex witness) and all-partial (no full cell fits)
    rng = np.random.RandomState(5)
    lats, lons = _random_convex(rng, 10.2, 40.3, 0.2, 0.2)
    cov = region_cover(_poly_df(spark, [(lats, lons)])).collect()
    assert cov
    assert all(r.coverage == "partial" for r in cov)


def test_sliver_crossing_cells_is_found(spark):
    # a thin band crossing many cells: border-crossing witness — the
    # case corner- and vertex-tests alone would miss
    lats = np.array([0.01, 0.03, 0.05, 0.03])
    lons = np.array([-60.0, -60.0, 60.0, 60.0])
    pdf = _poly_df(spark, [(lats, lons)])
    cov = region_cover(pdf).collect()
    assert cov
    # probe a point mid-band, far from any vertex
    pts = spark.createDataFrame([(1, 0.03, 0.0)], "pt_id long, lat double, lon double")
    hit = cover_read(pts, pdf).collect()
    assert len(hit) == 1
