"""Hex grid (geo/hexgrid.py): cube-rounding correctness (assignment =
nearest hex center, the Voronoi property), np/Spark parity, and ring
disc size/adjacency."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cityfinder_spark.contract import HEX_RES_TAG, HEX_SIZE_DEG, q_hex_assign
from cityfinder_spark.geo.hexgrid import (
    HEX_OFF,
    HEX_PACK,
    hex_id_col,
    hex_pack_np,
    hex_qr_np,
    hex_ring_col,
    hex_ring_ids,
)
from cityfinder_spark.sqlcompat import LEVEL_STRIDE
from tests.conftest import SF_DIR


def _center(q: np.ndarray, r: np.ndarray, s: float):
    """Axial -> lon/lat for pointy-top hexes (inverse of hex_qr_np's
    fractional transform)."""
    lon = s * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    lat = s * 1.5 * r
    return lat, lon


def test_assignment_is_nearest_center():
    """Cube rounding sends every point to the hex whose center is
    (planar-)nearest — checked against all centers in a 2-disc."""
    rng = np.random.RandomState(7)
    lat = rng.uniform(-60, 60, 500)
    lon = rng.uniform(-170, 170, 500)
    s = HEX_SIZE_DEG
    q, r = hex_qr_np(lat, lon, s)
    clat, clon = _center(q.astype(float), r.astype(float), s)
    d_own = (lat - clat) ** 2 + (lon - clon) ** 2
    for dq in range(-2, 3):
        for dr in range(-2, 3):
            if dq == 0 and dr == 0:
                continue
            olat, olon = _center((q + dq).astype(float), (r + dr).astype(float), s)
            d_other = (lat - olat) ** 2 + (lon - olon) ** 2
            assert (d_own <= d_other + 1e-9).all()


def test_spark_matches_numpy(spark):
    df = spark.createDataFrame(
        [(float(la), float(lo)) for la, lo in zip(
            np.linspace(-80, 80, 200), np.linspace(-179, 179, 200))],
        "lat double, lon double",
    )
    got = np.array(
        df.select(hex_id_col("lat", "lon", HEX_SIZE_DEG, HEX_RES_TAG).alias("h"))
        .toPandas()["h"]
    )
    la = np.linspace(-80, 80, 200)
    lo = np.linspace(-179, 179, 200)
    q, r = hex_qr_np(la, lo, HEX_SIZE_DEG)
    assert (got == hex_pack_np(q, r, HEX_RES_TAG)).all()


def test_ring_sizes_and_membership(spark):
    h = int(hex_pack_np(np.array([10]), np.array([-4]), HEX_RES_TAG)[0])
    for k in (0, 1, 2, 3):
        ids = hex_ring_ids(h, k)
        assert len(ids) == 1 + 3 * k * (k + 1)
        assert h in set(ids.tolist())
    # Column twin agrees with the NumPy twin
    df = spark.createDataFrame([(h,)], "hex_id long")
    got = sorted(
        df.select(F.explode(hex_ring_col(F.col("hex_id"), 2)).alias("n"))
        .toPandas()["n"]
    )
    assert got == sorted(hex_ring_ids(h, 2).tolist())


def test_contract_query_runs(spark):
    out = q_hex_assign(spark, SF_DIR)
    rows = out.limit(5).collect()
    assert all(r.hex_id // LEVEL_STRIDE == HEX_RES_TAG for r in rows)
    # packed q/r decode back into plausible lattice range
    for r in rows:
        rem = r.hex_id % LEVEL_STRIDE
        qv = rem // HEX_PACK - HEX_OFF
        rv = rem % HEX_PACK - HEX_OFF
        assert abs(qv) < 500 and abs(rv) < 500


def test_three_way_parity_random_coords(spark):
    """Spark expr == NumPy twin == DuckDB on 5k random coordinates —
    pins the shared-SQL-text FP contract beyond the fixture points."""
    import duckdb
    import pandas as pd

    from cityfinder_spark.geo.hexgrid import hex_id_sql

    rng = np.random.RandomState(42)
    lat = rng.uniform(-89, 89, 5000)
    lon = rng.uniform(-180, 180, 5000)
    q, r = hex_qr_np(lat, lon, HEX_SIZE_DEG)
    npv = hex_pack_np(q, r, HEX_RES_TAG)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"lat": lat, "lon": lon}))
    duck = con.execute(
        f"SELECT {hex_id_sql('lat', 'lon', HEX_SIZE_DEG, HEX_RES_TAG)} AS h FROM t"
    ).fetchnumpy()["h"]
    assert (duck == npv).all()
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double"
    )
    sp = np.array(
        df.select(
            hex_id_col("lat", "lon", HEX_SIZE_DEG, HEX_RES_TAG).alias("h")
        ).toPandas()["h"]
    )
    assert (sp == npv).all()
