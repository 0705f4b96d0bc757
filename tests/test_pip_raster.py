"""Point-in-polygon + raster tiling unit semantics (FIXTURES.md §6)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cityfinder_spark.geo.cells import cell_of_np
from cityfinder_spark.operators.point_in_polygon import (
    point_in_polygon_np,
    tag_points_with_polygons,
)
from cityfinder_spark.operators.raster import map_raster_tiles


def test_ray_cast_square():
    # unit square (0,0)-(1,1)
    rl = np.array([0.0, 0.0, 1.0, 1.0])
    rn = np.array([0.0, 1.0, 1.0, 0.0])
    plat = np.array([0.5, 0.5, 1.5, -0.1, 0.999])
    plon = np.array([0.5, 1.5, 0.5, 0.5, 0.001])
    got = point_in_polygon_np(plat, plon, rl, rn)
    assert got.tolist() == [True, False, False, False, True]


def test_ray_cast_concave():
    # L-shape: concavity excluded
    rl = np.array([0.0, 0.0, 2.0, 2.0, 1.0, 1.0])
    rn = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
    plat = np.array([0.5, 1.5, 1.5])
    plon = np.array([0.5, 1.5, 0.5])
    got = point_in_polygon_np(plat, plon, rl, rn)
    assert got.tolist() == [True, True, False]


def test_tag_points_with_polygons(spark):
    polys = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "AA", [0.0, 0.0, 10.0, 10.0], [0.0, 10.0, 10.0, 0.0]),
                (1, "BB", [5.0, 5.0, 15.0, 15.0], [5.0, 15.0, 15.0, 5.0]),
            ],
            columns=["polygon_id", "country", "ring_lats", "ring_lons"],
        )
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            [(0, 2.0, 2.0), (1, 7.0, 7.0), (2, 12.0, 12.0), (3, 50.0, 50.0)],
            columns=["pt_id", "lat", "lon"],
        )
    )
    out = tag_points_with_polygons(pts, polys).select("pt_id", "polygon_id").collect()
    got = sorted((r["pt_id"], r["polygon_id"]) for r in out)
    assert got == [(0, 0), (1, 0), (1, 1), (2, 1)]  # overlap region hits both


def test_map_raster_tiles_grain_and_cells(spark):
    imgs = spark.createDataFrame(
        pd.DataFrame([(0, 10.0, 20.0, 40, 17)], columns=["pt_id", "lat", "lon", "w", "h"])
    )
    rows = map_raster_tiles(imgs, level=8, tile_px=16, deg_per_px=0.001).collect()
    # nx = ceil(40/16)=3, ny = ceil(17/16)=2 -> 6 tiles
    assert len(rows) == 6
    for r in rows:
        want_lat = 10.0 + (r["ty"] * 16 + 8.0 - 17 / 2.0) * 0.001
        want_lon = 20.0 + (r["tx"] * 16 + 8.0 - 40 / 2.0) * 0.001
        assert abs(r["tile_lat"] - want_lat) < 1e-12
        assert abs(r["tile_lon"] - want_lon) < 1e-12
        assert r["cell_id"] == cell_of_np(
            np.array([want_lat]), np.array([want_lon]), 8
        )[0]


# ---------------- cell pyramid (multi-resolution rollup) ----------------


def test_cell_pyramid_matches_per_level_recompute(spark):
    """Arithmetic parents must equal recomputing each level from raw
    coordinates — including clip/wrap edges (poles, antimeridian)."""
    from pyspark.sql import functions as F

    from cityfinder_spark.geo.cells import cell_col
    from cityfinder_spark.operators.raster import cell_pyramid

    pts = [
        (-90.0, -180.0), (90.0, 180.0), (89.999, 179.999),
        (-89.999, -179.999), (0.0, 0.0), (0.005, -0.005),
    ] + [(-85.0 + (k * 37 % 170) + 0.123, -180.0 + (k * 53 % 360) + 0.321)
         for k in range(500)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    level, depth = 6, 4
    got = sorted(
        (r.level, r.cell_id, r.n_points)
        for r in cell_pyramid(df, level=level, depth=depth).collect()
    )
    exp = []
    for lvl in range(level, level - depth - 1, -1):
        exp.extend(
            (lvl, r.cell_id, r.n)
            for r in df.select(cell_col("lat", "lon", lvl).alias("cell_id"))
            .groupBy("cell_id").agg(F.count(F.lit(1)).alias("n")).collect()
        )
    assert got == sorted(exp)
    # mass conservation: every level sums to the full point count
    per_level = {}
    for lvl, _, n in got:
        per_level[lvl] = per_level.get(lvl, 0) + n
    assert set(per_level.values()) == {len(pts)}


def test_cell_pyramid_single_scan_single_exchange(spark):
    """The 10^12 property: one fact scan, one exchange — NOT one
    aggregate branch per level each re-reading the input."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.raster import cell_pyramid

    pts = spark.range(1000).select(
        (F.col("id") % 170 - 85 + 0.25).cast("double").alias("lat"),
        (F.col("id") % 360 - 180 + 0.25).cast("double").alias("lon"),
    )
    plan = (
        cell_pyramid(pts, level=6, depth=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Scan") <= 1  # spark.range shows as Range; no rescans


# ---------------- trajectory stats ----------------


def test_trajectory_stats_hand_computed(spark):
    """Two-point track ~ 111.19 km per degree of latitude at the
    equator; singleton tracks report zero everywhere; steps follow the
    order column, not row order."""
    from cityfinder_spark.operators.trajectory import trajectory_stats

    rows = [
        # entity "a": 3 points, inserted OUT of order-key order
        (1, 3, 2.0, 0.0),
        (1, 1, 0.0, 0.0),
        (1, 2, 1.0, 0.0),
        # entity "b": single point
        (2, 1, 50.0, 50.0),
    ]
    df = spark.createDataFrame(rows, "cust_id long, pt_id long, lat double, lon double")
    got = {r.entity: r for r in trajectory_stats(df).collect()}
    a = got[1]
    assert a.n_points == 3
    # two 1-degree meridian steps of ~111.1949 km each
    assert abs(a.max_step_km - 111.1949) < 0.001
    assert abs(a.min_step_km - 111.1949) < 0.001
    assert abs(a.total_km - 2 * a.max_step_km) < 1e-9
    b = got[2]
    assert (b.n_points, b.total_km, b.max_step_km) == (1, 0.0, 0.0)


def test_trajectory_stats_partition_invariant(spark):
    """Integer micro-unit summation makes the rollup order-free: same
    totals at any parallelism."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.trajectory import trajectory_stats

    df = spark.range(2000).select(
        (F.col("id") % 37).alias("cust_id"),
        F.col("id").alias("pt_id"),
        ((F.col("id") * 31 % 170) - 85 + 0.25).cast("double").alias("lat"),
        ((F.col("id") * 57 % 360) - 180 + 0.25).cast("double").alias("lon"),
    )
    a = sorted(map(tuple, trajectory_stats(df.repartition(1)).collect()))
    b = sorted(map(tuple, trajectory_stats(df.repartition(32)).collect()))
    assert a == b and len(a) == 37


# --------------------------------------------------------------- focal stats


def test_focal_stats_hand_computed_level2(spark):
    """Level 2: 4 lat bands x 8 lon cols, cells 45 deg square. Three
    occupied cells: two Chebyshev-adjacent, one far away."""
    from cityfinder_spark.operators.raster import focal_stats

    # cell centers: band i covers [-90+45i, -45+45i), col j covers
    # [-180+45j, -135+45j). Pick points well inside cells.
    pts = spark.createDataFrame(
        [
            (1, 10.0, 10.0),   # i=2, j=4  (cell A) x3 points
            (2, 10.0, 10.0),
            (3, 10.0, 10.0),
            (4, 10.0, 50.0),   # i=2, j=5  (cell B, adjacent to A) x1
            (5, -80.0, -170.0) # i=0, j=0  (cell C, far) x1
        ],
        "pt_id long, lat double, lon double",
    )
    out = {r["cell_id"]: r for r in focal_stats(pts, level=2, k=1).collect()}
    assert len(out) == 3
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE
    a = 2 * LEVEL_STRIDE + 2 * 8 + 4
    b = 2 * LEVEL_STRIDE + 2 * 8 + 5
    c = 2 * LEVEL_STRIDE + 0 * 8 + 0
    assert out[a]["n_points"] == 3 and out[a]["focal_sum"] == 4  # A+B
    assert out[b]["n_points"] == 1 and out[b]["focal_sum"] == 4
    assert out[a]["focal_max"] == 3 and out[a]["n_occupied_nb"] == 2
    # full interior window = 9 cells
    assert abs(out[a]["focal_mean"] - 4 / 9) < 1e-6
    # C: bottom band -> clamped window = 2 rows x 3 cols = 6
    assert out[c]["focal_sum"] == 1 and abs(out[c]["focal_mean"] - 1 / 6) < 1e-6


def test_focal_stats_lon_wrap(spark):
    """Cells at j=0 and j=nlon-1 are neighbors across the
    antimeridian: their focal sums must see each other."""
    from cityfinder_spark.operators.raster import focal_stats
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    pts = spark.createDataFrame(
        [(1, 10.0, -179.0), (2, 10.0, 179.0)],
        "pt_id long, lat double, lon double",
    )
    out = {r["cell_id"]: r for r in focal_stats(pts, level=2, k=1).collect()}
    west = 2 * LEVEL_STRIDE + 2 * 8 + 0
    east = 2 * LEVEL_STRIDE + 2 * 8 + 7
    assert out[west]["focal_sum"] == 2
    assert out[east]["focal_sum"] == 2


def test_focal_stats_partition_invariant(spark):
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.raster import focal_stats

    pts = spark.range(500).select(
        F.col("id").alias("pt_id"),
        ((F.col("id") * 37 % 160) - 80.0).cast("double").alias("lat"),
        ((F.col("id") * 91 % 360) - 180.0).cast("double").alias("lon"),
    )
    a = sorted(map(tuple, focal_stats(pts.repartition(1), level=4).collect()))
    b = sorted(map(tuple, focal_stats(pts.repartition(17), level=4).collect()))
    assert a == b


# ------------------------------------------------------------ stay points


def test_trajectory_stays_hand_computed(spark):
    """Track a: 3 points within 200 km then a 1-degree jump at r=50km
    -> one 3-point stay; singleton tail never emits at min_pts=2."""
    from cityfinder_spark.operators.trajectory import trajectory_stays

    rows = [
        (1, 1, 0.0, 0.0),
        (1, 2, 0.1, 0.0),    # ~11 km step
        (1, 3, 0.2, 0.0),    # ~11 km step
        (1, 4, 30.0, 0.0),   # break
        (2, 1, 50.0, 50.0),  # singleton entity
    ]
    df = spark.createDataFrame(rows, "cust_id long, pt_id long, lat double, lon double")
    out = trajectory_stays(df, r_km=50.0, min_pts=2).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["entity"], r["stay_id"], r["n_points"]) == (1, 1, 3)
    assert (r["start_ord"], r["end_ord"]) == (1, 3)
    assert abs(r["center_lat"] - 0.1) < 1e-6
    assert abs(r["center_lon"] - 0.0) < 1e-6


def test_trajectory_stays_two_runs_split_on_break(spark):
    from cityfinder_spark.operators.trajectory import trajectory_stays

    rows = [(1, i, 0.01 * i, 0.0) for i in range(1, 4)]          # run 1
    rows += [(1, i, 40.0 + 0.01 * i, 0.0) for i in range(4, 7)]  # run 2
    df = spark.createDataFrame(rows, "cust_id long, pt_id long, lat double, lon double")
    out = sorted(trajectory_stays(df, r_km=50.0, min_pts=2).collect(),
                 key=lambda r: r["stay_id"])
    assert [(r["stay_id"], r["n_points"]) for r in out] == [(1, 3), (2, 3)]


def test_trajectory_stays_partition_invariant(spark):
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.trajectory import trajectory_stays

    df = spark.range(3000).select(
        (F.col("id") % 50).alias("cust_id"),
        F.col("id").alias("pt_id"),
        ((F.col("id") * 31 % 170) - 85 + 0.25).cast("double").alias("lat"),
        ((F.col("id") * 57 % 360) - 180 + 0.25).cast("double").alias("lon"),
    )
    a = sorted(map(tuple, trajectory_stays(df.repartition(1), r_km=6000.0).collect()))
    b = sorted(map(tuple, trajectory_stays(df.repartition(32), r_km=6000.0).collect()))
    assert a == b and len(a) > 0


def test_getis_ord_hotspot_zscores(spark):
    """Gi* on a hand lattice: a dense clump scores a high positive z
    (hot), an isolated far-away point does not; values match a NumPy
    replay of the same formula with raster (full-lattice) semantics."""
    from cityfinder_spark.geo.cells import cell_of_np, grid_dims
    from cityfinder_spark.operators.raster import GI_HOT_Z, getis_ord

    level, k = 6, 1
    # clump: 60 points in one interior cell; noise: 1 point far away
    pts = pd.DataFrame(
        {"lat": [10.1] * 60 + [-60.1], "lon": [20.1] * 60 + [-120.1]}
    )
    out = {
        r["cell_id"]: r
        for r in getis_ord(
            spark.createDataFrame(pts), level=level, k=k
        ).collect()
    }
    clump = int(cell_of_np(np.array([10.1]), np.array([20.1]), level)[0])
    lone = int(cell_of_np(np.array([-60.1]), np.array([-120.1]), level)[0])
    assert set(out) == {clump, lone}
    nlat, nlon = grid_dims(level)
    n = float(nlat * nlon)
    mean = 61.0 / n
    s = ((60.0**2 + 1.0) / n - mean * mean) ** 0.5
    for cell, x in ((clump, 60.0), (lone, 1.0)):
        w = 9.0  # both cells interior
        gi = (x - mean * w) / (s * ((n * w - w * w) / (n - 1.0)) ** 0.5)
        assert abs(out[cell]["gi_z"] - gi) < 1e-5, (cell, out[cell]["gi_z"], gi)
        assert out[cell]["window"] == 9
    assert out[clump]["hot"] and not out[lone]["hot"]
    assert out[clump]["gi_z"] > GI_HOT_Z > out[lone]["gi_z"]


def test_distance_transform_properties(spark):
    """d_hot == 0 exactly on hot cells; on any occupied neighbor of a
    hot cell d_hot <= 1; all distances are >= 0."""
    from cityfinder_spark.contract import CELL_LEVEL, HOT_THRESHOLD, _points
    from cityfinder_spark.operators.raster import distance_transform
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE
    from tests.conftest import SF_DIR_01

    rows = distance_transform(
        _points(spark, SF_DIR_01), level=CELL_LEVEL, hot_threshold=HOT_THRESHOLD
    ).collect()
    assert rows
    nlon = 2 << CELL_LEVEL
    ij = {}
    for r in rows:
        base = r.cell_id - CELL_LEVEL * LEVEL_STRIDE
        ij[(base // nlon, base % nlon)] = r
    for (i, j), r in ij.items():
        assert r.d_hot >= 0
        assert (r.d_hot == 0) == (r.n_points >= HOT_THRESHOLD)
        if r.d_hot == 0:
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    nb = ij.get((i + di, (j + dj) % nlon))
                    if nb is not None:
                        assert nb.d_hot <= 1


def test_distance_transform_staged_parity_with_cross(spark):
    """The staged doubling-ring probe returns EXACTLY the crossJoin
    result (same occupied cells, same integer distances) on the
    contract's own inputs."""
    from cityfinder_spark.contract import CELL_LEVEL, HOT_THRESHOLD, _points
    from cityfinder_spark.operators.raster import distance_transform
    from tests.conftest import SF_DIR_01

    pts = _points(spark, SF_DIR_01)
    want = sorted(
        map(tuple, distance_transform(
            pts, level=CELL_LEVEL, hot_threshold=HOT_THRESHOLD, strategy="cross"
        ).collect())
    )
    # cross_budget=0 forces the pure doubling rounds (the default
    # budget would route this small product straight to the bounded
    # cross finish, which is the "cross" plan again)
    got = sorted(
        map(tuple, distance_transform(
            pts, level=CELL_LEVEL, hot_threshold=HOT_THRESHOLD,
            strategy="staged", cross_budget=0,
        ).collect())
    )
    assert want and got == want
    # the default budget takes the bounded cross finish on this small
    # product — same rows either way
    hybrid = sorted(
        map(tuple, distance_transform(
            pts, level=CELL_LEVEL, hot_threshold=HOT_THRESHOLD, strategy="staged"
        ).collect())
    )
    assert hybrid == want


def test_distance_transform_staged_level12_vs_brute(spark):
    """At level 12 (33M-cell grid — where the crossJoin shape dies)
    the staged probe matches a NumPy brute force, including lon-wrap
    and multi-round resolution for cells far from every hot core."""
    from cityfinder_spark.geo.cells import grid_dims
    from cityfinder_spark.operators.raster import distance_transform
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    level = 12
    nlat, nlon = grid_dims(level)
    rng = np.random.default_rng(7)
    # two tight hot clumps + a far-flung sparse field (some points
    # hundreds of cells from any hot cell -> exercises many rounds)
    hotspots = [(40.7, -74.0), (35.7, 139.7)]
    rows = []
    for k in range(600):
        base = hotspots[k % 2]
        rows.append((base[0] + rng.uniform(-0.01, 0.01),
                     base[1] + rng.uniform(-0.01, 0.01)))
    for _ in range(250):
        rows.append((float(rng.uniform(-85, 85)), float(rng.uniform(-180, 180))))
    pts = spark.createDataFrame(rows, "lat double, lon double")
    out = distance_transform(
        pts, level=level, hot_threshold=5, strategy="staged", cross_budget=0
    ).collect()
    assert out
    # NumPy brute force over the distinct occupied cells
    ij = {}
    for r in out:
        base_id = r.cell_id - level * LEVEL_STRIDE
        ij[r.cell_id] = (base_id // nlon, base_id % nlon, r.n_points, r.d_hot)
    arr = np.array([(i, j, n) for i, j, n, _ in ij.values()], dtype=np.int64)
    hot = arr[arr[:, 2] >= 5]
    assert len(hot) >= 2
    di = np.abs(arr[:, None, 0] - hot[None, :, 0])
    djraw = np.abs(arr[:, None, 1] - hot[None, :, 1])
    dj = np.minimum(djraw, nlon - djraw)
    want = np.maximum(di, dj).min(axis=1)
    got = np.array([d for _, _, _, d in ij.values()])
    assert (got == want).all()
    # far-field points genuinely exercised the doubling (d >> 2)
    assert int(got.max()) > 64


def test_distance_transform_staged_plan_has_no_nested_loop(spark):
    """The staged round is an equi-join (hash/sort-merge), never a
    CartesianProduct / BroadcastNestedLoopJoin — the plan shape that
    survives a level-12 grid."""
    from cityfinder_spark.geo.cells import cell_col, grid_dims
    from cityfinder_spark.operators.raster import _staged_round
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE
    from pyspark.sql import functions as F

    level = 12
    nlat, nlon = grid_dims(level)
    pts = spark.range(2000).select(
        (F.rand(1) * 160 - 80).alias("lat"), (F.rand(2) * 360 - 180).alias("lon")
    )
    occ = (
        pts.select(cell_col("lat", "lon", level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    base = F.col("cell_id") - level * LEVEL_STRIDE
    cells = occ.select(
        "cell_id", "n_points",
        (base / nlon).cast("long").alias("i"),
        F.pmod(base, F.lit(nlon)).alias("j"),
    )
    hot = cells.where(F.col("n_points") >= 1).select(
        F.col("i").alias("hi"), F.col("j").alias("hj")
    )
    dj = F.abs(F.col("j") - F.col("hj"))
    cheb = F.greatest(F.abs(F.col("i") - F.col("hi")), F.least(dj, F.lit(nlon) - dj))
    for f in (1, 64, 1024):
        best, _fc = _staged_round(cells, hot, cheb, nlat, nlon, f)
        plan = best._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan, (f, plan)


def test_distance_transform_routing_and_empty_hot(spark):
    """auto routes cross at the contract level and staged above the
    threshold; with no hot cells both strategies return empty."""
    from cityfinder_spark.operators.raster import (
        DT_CROSSJOIN_MAX_LEVEL,
        distance_transform,
    )

    assert DT_CROSSJOIN_MAX_LEVEL < 12
    pts = spark.createDataFrame(
        [(10.0 + k * 0.5, 20.0 + k * 0.5) for k in range(6)], "lat double, lon double"
    )
    # level 6 auto == cross plan (contains the broadcast product)
    auto_small = distance_transform(pts, level=6, hot_threshold=2, strategy="auto")
    plan = auto_small._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in plan or "CartesianProduct" in plan
    # every point alone in its cell -> nothing hot -> empty result
    for strat in ("cross", "staged"):
        out = distance_transform(
            pts, level=12, hot_threshold=2, strategy=strat
        ).collect()
        assert out == []


def test_region_rings_polygonize_cases(spark):
    """Raster->vector polygonization: hand-built grids with known
    boundary geometry — single cell (one CCW 4-ring), 3x3 block
    (one 12-ring), donut (outer +4 ring AND a -4 hole ring),
    diagonal-touching cells (TWO rings: the 4-connected corner rule),
    antimeridian-crossing block (one ring, wraps), full latitude band
    (two wrap rings, turning number 0), and seq chains head->tail."""
    import pandas as pd

    from cityfinder_spark.geo.cells import grid_dims
    from cityfinder_spark.operators.raster import region_rings

    level = 3
    nlat, nlon = grid_dims(level)

    def pts(cells, per=3):
        rows = []
        for i, j in cells:
            lat = (i + 0.5) * 180.0 / nlat - 90.0
            lon = (j + 0.5) * 360.0 / nlon - 180.0
            rows.extend([(lat, lon)] * per)
        return spark.createDataFrame(pd.DataFrame(rows, columns=["lat", "lon"]))

    def rings_of(cells, per=3):
        out = region_rings(pts(cells, per), level=level, hot_threshold=2).collect()
        rings: dict = {}
        for r in out:
            rings.setdefault(r.ring_id, []).append(r)
        return out, rings

    # single hot cell: one CCW ring of its 4 lattice edges
    out, rings = rings_of([(3, 5)])
    assert len(rings) == 1 and len(out) == 4
    assert all(r.turn_sum == 4 and not r.is_hole for r in out)
    assert sorted(r.seq for r in out) == [0, 1, 2, 3]

    # 3x3 block: one 12-edge ring
    block = [(i, j) for i in (2, 3, 4) for j in (4, 5, 6)]
    out, rings = rings_of(block)
    assert len(rings) == 1 and len(out) == 12 and out[0].turn_sum == 4
    # consecutive segments chain head -> tail and close the loop
    by_seq = {r.seq: r for r in out}
    for s in range(len(out)):
        cur, nxt = by_seq[s], by_seq[(s + 1) % len(out)]
        assert (cur.vi1, cur.vj1) == (nxt.vi0, nxt.vj0), s

    # donut: outer ring (+4) and a true hole ring (-4)
    donut = [c for c in block if c != (3, 5)]
    _out, rings = rings_of(donut)
    info = sorted(
        (len(v), v[0].turn_sum, v[0].is_hole) for v in rings.values()
    )
    assert info == [(4, -4, True), (12, 4, False)]

    # diagonal touch: 4-connected foreground keeps regions separate
    _out, rings = rings_of([(3, 5), (4, 6)])
    assert len(rings) == 2 and all(len(v) == 4 for v in rings.values())

    # antimeridian: a 1x2 block across the seam is ONE 6-edge ring
    out, rings = rings_of([(3, nlon - 1), (3, 0)])
    assert len(rings) == 1 and len(out) == 6 and out[0].turn_sum == 4

    # full latitude band: two globe-circling rings, turning number 0
    _out, rings = rings_of([(3, j) for j in range(nlon)])
    assert len(rings) == 2
    assert all(v[0].turn_sum == 0 and not v[0].is_hole for v in rings.values())

    # below threshold: empty result
    assert (
        region_rings(pts([(3, 5)], per=1), level=level, hot_threshold=2).count()
        == 0
    )
