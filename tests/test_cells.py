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
