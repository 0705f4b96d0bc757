"""Cell-grid kernel: parity across NumPy / Column / SQL / pandas-UDF,
ring completeness, certainty-radius soundness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.geo.cells import (
    KM_PER_DEG,
    cell_col,
    cell_of_np,
    cell_size_deg,
    decode_cell_np,
    grid_dims,
    make_cell_udf,
    ring_cells_col,
    ring_neighbors_np,
)
from cityfinder_spark.geo.distance import haversine_np
from cityfinder_spark.sqlcompat import cell_sql

RNG = np.random.default_rng(42)
LAT = RNG.uniform(-90, 90, 500)
LON = RNG.uniform(-180, 180, 500)


@pytest.mark.parametrize("level", [2, 4, 6, 9])
def test_cell_parity_np_column_sql_udf(spark, level):
    pdf = pd.DataFrame({"lat": LAT, "lon": LON})
    want = cell_of_np(LAT, LON, level)
    df = spark.createDataFrame(pdf)
    got_col = np.array(
        [r[0] for r in df.select(cell_col("lat", "lon", level)).collect()]
    )
    got_sql = np.array(
        [r[0] for r in df.selectExpr(cell_sql("lat", "lon", level)).collect()]
    )
    got_udf = np.array(
        [r[0] for r in df.select(make_cell_udf(level)("lat", "lon")).collect()]
    )
    assert (want == got_col).all()
    assert (want == got_sql).all()
    assert (want == got_udf).all()


def test_cell_bounds_and_wrap():
    level = 5
    nlat, nlon = grid_dims(level)
    # poles clamp, antimeridian wraps
    edge = cell_of_np(np.array([90.0, -90.0]), np.array([180.0, -180.0]), level)
    lv, i, j = decode_cell_np(edge)
    assert (lv == level).all()
    assert i[0] == nlat - 1 and i[1] == 0
    assert (j < nlon).all() and (j >= 0).all()


def test_ring_neighbors_wrap_and_clamp():
    level = 4
    nlat, nlon = grid_dims(level)
    # corner cell: i=0 (south pole band), j=0 -> ring clamps lat, wraps lon
    c = cell_of_np(np.array([-89.9]), np.array([-179.9]), level)[0]
    ring = ring_neighbors_np(int(c), 1)
    assert len(ring) == 6  # 2 lat bands x 3 lon cols
    lv, i, j = decode_cell_np(ring)
    assert set(i.tolist()) == {0, 1}
    assert set(j.tolist()) == {0, 1, nlon - 1}


def test_ring_cells_col_matches_np(spark):
    level = 5
    pdf = pd.DataFrame({"lat": LAT[:100], "lon": LON[:100]})
    df = spark.createDataFrame(pdf).withColumn("cell", cell_col("lat", "lon", level))
    rows = df.select("cell", ring_cells_col(F.col("cell"), 2, level).alias("ring")).collect()
    for r in rows:
        want = sorted(ring_neighbors_np(r["cell"], 2).tolist())
        assert sorted(r["ring"]) == want


@pytest.mark.parametrize("level,k", [(4, 1), (6, 1), (6, 2)])
def test_certainty_radius_is_sound(spark, level, k):
    """Any point OUTSIDE a query's ring-k must be farther than the
    certainty radius — the correctness crux of ring expansion
    (SURVEY §7.3)."""
    from cityfinder_spark.geo.cells import certainty_radius_col

    qlat, qlon = LAT[:60], LON[:60]
    pdf = pd.DataFrame({"lat": qlat, "lon": qlon})
    df = spark.createDataFrame(pdf)
    cert = np.array(
        [r[0] for r in df.select(certainty_radius_col("lat", k, level)).collect()]
    )
    qcell = cell_of_np(qlat, qlon, level)
    # dense random cloud of "cities"
    clat = RNG.uniform(-90, 90, 20000)
    clon = RNG.uniform(-180, 180, 20000)
    ccell = cell_of_np(clat, clon, level)
    for qi in range(len(qlat)):
        ring = set(ring_neighbors_np(int(qcell[qi]), k).tolist())
        outside = ~np.isin(ccell, list(ring))
        if outside.any():
            d = haversine_np(
                np.full(outside.sum(), qlat[qi]), np.full(outside.sum(), qlon[qi]),
                clat[outside], clon[outside],
            )
            assert d.min() >= cert[qi] - 1e-9, (
                f"violation at q={qi}: min outside dist {d.min()} < cert {cert[qi]}"
            )


def test_cell_size_and_km_constant():
    assert cell_size_deg(4) == 11.25
    assert abs(KM_PER_DEG - np.pi / 180.0 * 6371.0) < 1e-12


# ----------------------------------------------------------- z-order keys


def _interleave_ref(xi: int, yi: int) -> int:
    z = 0
    for b in range(16):
        z |= ((xi >> b) & 1) << (2 * b)
        z |= ((yi >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_matches_bitwise_reference(spark):
    from pyspark.sql import functions as F

    from cityfinder_spark.geo.cells import zorder_col

    pts = [(-90.0, -180.0), (89.999, 179.999), (0.0, 0.0),
           (12.345, -67.89), (-45.5, 120.25), (90.0, 180.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = df.select("lat", "lon", zorder_col("lat", "lon")).collect()
    n = 1 << 16
    import math
    for r in rows:
        yi = min(max(math.floor((r["lat"] + 90.0) / 180.0 * n), 0), n - 1)
        xi = math.floor((r["lon"] + 180.0) / 360.0 * n) % n
        assert r["zorder"] == _interleave_ref(xi, yi), (r["lat"], r["lon"])


def test_zorder_prefix_is_the_cell_pyramid(spark):
    """Points sharing a level-L square cell share the top 2L key bits:
    every coarse cell is ONE contiguous z-range, which is exactly what
    lets parquet min/max stats prune a z-sorted table for any cell or
    bbox predicate."""
    from pyspark.sql import functions as F

    from cityfinder_spark.geo.cells import zorder_col

    df = spark.range(2000).select(
        ((F.col("id") * 37 % 17000) / 100.0 - 85.0).alias("lat"),
        ((F.col("id") * 91 % 35000) / 100.0 - 175.0).alias("lon"),
    )
    out = df.select("lat", "lon", zorder_col("lat", "lon")).collect()
    n = 1 << 16
    import math
    for L in (2, 5, 9):
        shift = 2 * (16 - L)
        groups = {}
        for r in out:
            yi = min(max(math.floor((r["lat"] + 90.0) / 180.0 * n), 0), n - 1)
            xi = math.floor((r["lon"] + 180.0) / 360.0 * n) % n
            cell = (xi >> (16 - L), yi >> (16 - L))
            groups.setdefault(cell, set()).add(r["zorder"] >> shift)
        for cell, prefixes in groups.items():
            assert len(prefixes) == 1, (L, cell, prefixes)
        # distinct cells -> distinct prefixes (injective both ways)
        all_prefixes = [next(iter(p)) for p in groups.values()]
        assert len(set(all_prefixes)) == len(groups)


def test_geohash_known_vectors(spark):
    """Pinned against published geohash test vectors (Niemeyer/
    Wikipedia examples truncated to 6 chars) + pole/antimeridian
    clamps."""
    import pandas as pd

    from cityfinder_spark.geo.cells import geohash_col

    cases = [
        (57.64911, 10.40744, "u4pruy"),   # Jutland (classic example)
        (42.6, -5.6, "ezs42e"),           # Wikipedia ezs42 prefix
        (-25.382708, -49.265506, "6gkzwg"),  # Curitiba 6gkzwgjz prefix
        (0.0, 0.0, "s00000"),
        (90.0, 180.0, "bpbpbp"),          # north pole clamps, lon wraps
        (-90.0, -180.0, "000000"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(cases, columns=["lat", "lon", "want"])
    )
    for r in df.select("want", geohash_col("lat", "lon", 6)).collect():
        assert r["geohash"] == r["want"], (r["want"], r["geohash"])


def test_geohash_prefix_is_containing_cell(spark):
    """Two points 200 m apart share a 5-char prefix; two points in
    different hemispheres share none."""
    import pandas as pd

    from cityfinder_spark.geo.cells import geohash_col

    df = spark.createDataFrame(
        pd.DataFrame(
            {"lat": [48.8566, 48.8584, -33.86], "lon": [2.3522, 2.3545, 151.2]}
        )
    )
    g = [r["geohash"] for r in df.select(geohash_col("lat", "lon", 6)).collect()]
    assert g[0][:5] == g[1][:5]
    assert g[0][0] != g[2][0]
