"""Certain-tile fast-path tests (nearest_arrow.nearest_city_join_tiled).

Two worlds:
  * clustered (isolated towns >= 300 km apart — GeoNames-shaped): most
    tile cells near a town are provably single-winner, so real work
    moves to the JVM join; parity with the arrow kernel must be exact.
  * the driver's synthetic lattice (sf0.001): ~16 km city spacing makes
    almost no cell certain — the path must degenerate gracefully to
    the arrow kernel with identical output.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.operators import nearest_arrow as na
from cityfinder_spark.operators.nearest import nearest_city_join


def _clustered_cities(spark):
    """30 isolated towns on a >= 2000 km grid (5 lats x 6 lons) with a
    small deterministic jitter — every pair far apart, so each town's
    neighborhood is provably its own."""
    rows = []
    cid = 0
    for li, la in enumerate((-60.0, -30.0, 0.0, 30.0, 60.0)):
        for lj, lo in enumerate((-150.0, -90.0, -30.0, 30.0, 90.0, 150.0)):
            rows.append(
                (cid, f"town{cid}", la + 0.11 * li, lo + 0.13 * lj, "XX")
            )
            cid += 1
    return spark.createDataFrame(
        rows, "city_id long, name string, lat double, lon double, country string"
    )


def _points_near(cities_pdf, per_city=30, seed=5):
    rng = np.random.default_rng(seed)
    lat, lon = [], []
    for _, r in cities_pdf.iterrows():
        lat.extend(r["lat"] + rng.uniform(-0.5, 0.5, per_city))
        lon.extend(r["lon"] + rng.uniform(-0.5, 0.5, per_city))
    return np.clip(np.array(lat), -89.9, 89.9), np.array(lon)


def _collect(df):
    return sorted(
        map(
            tuple,
            df.select("pt_id", "city_id", "name", "country", "dist_km").collect(),
        )
    )


def test_tiled_parity_clustered(spark):
    cities = _clustered_cities(spark)
    cpdf = cities.toPandas()
    lat, lon = _points_near(cpdf)
    pts = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lat, lon))],
        "pt_id long, lat double, lon double",
    )
    tiled = _collect(nearest_city_join(pts, cities, strategy="tiled"))
    arrow = _collect(nearest_city_join(pts, cities, strategy="arrow"))
    assert tiled == arrow
    assert len(tiled) == len(lat)


def test_tiled_map_covers_clustered_world(spark):
    """Isolated towns must yield a real certain-tile map: the cells in
    a ring right around each town are provably that town's."""
    cities = _clustered_cities(spark)
    from cityfinder_spark.operators.nearest import choose_level

    idx = na.build_city_index(cities, choose_level(30, 1), 1)
    cells, pos = na.build_tile_map(idx, tile_level=9)
    assert len(cells) > 100, "clustered world should certify many tiles"
    # every certified winner is a real city position
    assert pos.min() >= 0 and pos.max() < len(idx.city_id)
    # spot-check: the cell CONTAINING each town must resolve to it
    # (d1 = 0 at the town, next town >= 300 km away >> 2*r_cell)
    from cityfinder_spark.geo.cells import cell_of_np

    town_cells = cell_of_np(idx.lat, idx.lon, 9)
    where = {c: p for c, p in zip(cells, pos)}
    hits = sum(1 for i, c in enumerate(town_cells) if where.get(c) == i)
    assert hits >= len(town_cells) * 0.9


def test_tiled_parity_lattice_sf(spark):
    """The driver's lattice cities (sf0.001): near-zero coverage, must
    still be row-identical to the arrow path."""
    from cityfinder_spark import sqlcompat as sc

    sf = "/root/testdata/sf0.001"
    for t in ("orders", "customer", "nation"):
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)
    pts = spark.sql(sc.points_from_orders_sql())
    cities = spark.sql(sc.cities_from_customer_sql())
    tiled = _collect(nearest_city_join(pts, cities, strategy="tiled"))
    arrow = _collect(nearest_city_join(pts, cities, strategy="arrow"))
    assert tiled == arrow


def test_tiled_empty_cities(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, 10.0)], "pt_id long, lat double, lon double"
    )
    cities = spark.createDataFrame(
        [], "city_id long, name string, lat double, lon double, country string"
    )
    row = nearest_city_join(pts, cities, strategy="tiled").collect()[0]
    assert row["city_id"] is None and row["dist_km"] is None


def test_tiled_parity_mixed_geometry(spark):
    """Isolated towns (certifiable) + a tight cluster (ambiguous) + a
    5-way co-located site (rounding ties -> must NOT certify) in one
    world: the tiled output still matches arrow row-for-row, and the
    duplicate site's cell is absent from the certain-tile map."""
    import numpy as np
    from cityfinder_spark.geo.cells import cell_of_np
    from cityfinder_spark.operators.nearest import choose_level

    rows = []
    cid = 0
    for la, lo in ((-50.0, -120.0), (40.0, 60.0), (10.0, -30.0)):  # isolated
        rows.append((cid, f"t{cid}", la, lo, "XX")); cid += 1
    for j in range(6):  # tight cluster, ~10 km spacing
        rows.append((cid, f"t{cid}", -10.0 + j * 0.09, 100.0, "XX")); cid += 1
    for _ in range(5):  # exact co-located 5-way duplicate
        rows.append((cid, f"t{cid}", 55.0, -5.0, "XX")); cid += 1
    cities = spark.createDataFrame(
        rows, "city_id long, name string, lat double, lon double, country string"
    )
    rng = np.random.default_rng(17)
    pts = []
    for i, (_, _, la, lo, _) in enumerate(rows):
        for k in range(8):
            pts.append((i * 100 + k, float(np.clip(la + rng.uniform(-1, 1), -89, 89)),
                        float(lo + rng.uniform(-1, 1))))
    points = spark.createDataFrame(pts, "pt_id long, lat double, lon double")
    tiled = _collect(nearest_city_join(points, cities, strategy="tiled"))
    arrow = _collect(nearest_city_join(points, cities, strategy="arrow"))
    assert tiled == arrow
    # the duplicate site's tile must be uncertified (rounded tie)
    idx = na.build_city_index(cities, choose_level(len(rows), 1), 1)
    cells, pos = na.build_tile_map(idx, tile_level=9)
    dup_cell = cell_of_np(np.array([55.0]), np.array([-5.0]), 9)[0]
    assert dup_cell not in set(cells.tolist())
