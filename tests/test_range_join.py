"""bbox_join: gridded spatial range join (points x rectangles).

Exactness vs a brute-force cross join on adversarial geometry (wrap,
pole clamp, shared boundary values), and the plan shape that makes it
scale (hash equi-join on the cell key, never a nested loop).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cityfinder_spark.operators.range_join import bbox_join, box_cover


def _brute(spark, pts, boxes):
    inside_lat = (F.col("lat") >= F.col("lat_min")) & (F.col("lat") <= F.col("lat_max"))
    inside_lon = F.when(
        F.col("lon_min") <= F.col("lon_max"),
        (F.col("lon") >= F.col("lon_min")) & (F.col("lon") <= F.col("lon_max")),
    ).otherwise((F.col("lon") >= F.col("lon_min")) | (F.col("lon") <= F.col("lon_max")))
    return sorted(
        (r.pt_id, r.box_id)
        for r in pts.crossJoin(boxes).where(inside_lat & inside_lon)
        .select("pt_id", "box_id").collect()
    )


def _mk(spark, pts, boxes):
    p = spark.createDataFrame(pts, "pt_id long, lat double, lon double")
    b = spark.createDataFrame(
        boxes, "box_id long, lat_min double, lat_max double, lon_min double, lon_max double"
    )
    return p, b


def test_bbox_join_adversarial_geometry(spark):
    pts = [
        (1, 0.0, 0.0),
        (2, 10.0, 179.5),      # inside a wrap box's east slice
        (3, 10.0, -179.5),     # inside the same wrap box's west slice
        (4, 10.0, 170.0),      # outside the wrap box
        (5, 89.9, 5.0),        # near-pole
        (6, -89.9, 5.0),
        (7, 2.0, 2.0),         # exactly on a box corner (inclusive)
        (8, 2.0, 2.0000001),   # just outside
        (9, 45.0, -120.0),
    ]
    boxes = [
        (100, -1.0, 2.0, -1.0, 2.0),       # point 7 on the max corner, 1 inside
        (200, 9.0, 11.0, 178.0, -178.0),   # antimeridian-crossing
        (300, 85.0, 90.0, -180.0, 180.0),  # pole cap (full-lat slab)
        (400, -90.0, -85.0, 0.0, 10.0),
        (500, 44.0, 46.0, -121.0, -119.0),
    ]
    p, b = _mk(spark, pts, boxes)
    got = sorted(
        (r.pt_id, r.box_id) for r in bbox_join(p, b, level=6).collect()
    )
    assert got == _brute(spark, p, b)
    # the hand-derived truth, so the brute force is itself checked
    assert got == [
        (1, 100),
        (2, 200),
        (3, 200),
        (5, 300),
        (6, 400),
        (7, 100),
        (9, 500),
    ]


def test_bbox_join_matches_brute_force_bulk(spark):
    """Dense deterministic sweep: every lattice point against boxes of
    assorted spans/wraps — pairs must equal the cross-join exactly."""
    pts = [
        (i, -85.0 + (i * 37 % 170), -180.0 + (i * 53 % 360) + 0.25)
        for i in range(400)
    ]
    boxes = []
    for k in range(40):
        lat0 = -88.0 + (k * 17 % 170)
        lon0 = -180.0 + (k * 91 % 360)
        dlat = 1.0 + (k % 5) * 2.0
        dlon = 1.0 + (k % 7) * 3.0
        lon_min = ((lon0 + 540.0) % 360.0) - 180.0
        lon_max = ((lon0 + dlon + 540.0) % 360.0) - 180.0
        boxes.append((k, max(-90.0, lat0), min(90.0, lat0 + dlat), lon_min, lon_max))
    p, b = _mk(spark, pts, boxes)
    got = sorted((r.pt_id, r.box_id) for r in bbox_join(p, b, level=6).collect())
    exp = _brute(spark, p, b)
    assert got == exp
    assert len(exp) > 10  # the sweep actually produces matches
    # at a second grid level too (cover/refine must be level-invariant)
    got9 = sorted((r.pt_id, r.box_id) for r in bbox_join(p, b, level=9).collect())
    assert got9 == exp


def test_bbox_join_plan_is_gridded_not_nested_loop(spark):
    """The 100 TB property: candidates come from a broadcast hash
    equi-join on the cell key — no BroadcastNestedLoopJoin / cartesian
    product anywhere in the plan, and the fact side has no Exchange."""
    pts = spark.range(100).select(
        F.col("id").alias("pt_id"),
        (F.col("id") % 170 - 85).cast("double").alias("lat"),
        (F.col("id") % 360 - 180).cast("double").alias("lon"),
    )
    boxes = spark.createDataFrame(
        [(1, 0.0, 5.0, 0.0, 5.0)],
        "box_id long, lat_min double, lat_max double, lon_min double, lon_max double",
    )
    plan = bbox_join(pts, boxes, level=6)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the only Exchange allowed is the broadcast of the tiny cover side
    assert "Exchange hashpartitioning" not in plan


def test_box_cover_walk_is_bounded_and_unique(spark):
    """Cover rows per box are bounded by one full longitude circle and
    contain no duplicate (box, cell) pairs even for near-global boxes."""
    b = spark.createDataFrame(
        [
            (1, -90.0, 90.0, -180.0, 179.9999),  # near-global
            (2, 0.0, 1.0, 179.0, -179.0),        # small wrap box
        ],
        "box_id long, lat_min double, lat_max double, lon_min double, lon_max double",
    )
    cover = box_cover(b, level=4)  # 16 x 32 grid
    rows = cover.groupBy("box_id").agg(
        F.count("*").alias("n"), F.countDistinct("cell").alias("nd")
    ).collect()
    by_id = {r.box_id: (r.n, r.nd) for r in rows}
    assert by_id[1][0] == by_id[1][1] <= 16 * 32
    assert by_id[2][0] == by_id[2][1] <= 2 * 32


# ---------------- radius_join (distance-band join) ----------------

def test_radius_join_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from cityfinder_spark.geo.distance import haversine_np
    from cityfinder_spark.operators.range_join import radius_join

    rng = np.random.default_rng(11)
    plat = rng.uniform(-89, 89, 300).round(3)
    plon = rng.uniform(-180, 180, 300).round(3)
    clat = rng.uniform(-85, 85, 40).round(3)
    clon = rng.uniform(-180, 180, 40).round(3)
    # force antimeridian + near-polar coverage
    clat[:4] = [84.9, -84.9, 10.0, -10.0]
    clon[:4] = [179.9, -179.9, 179.95, -179.95]
    plat[:4] = [84.8, -84.8, 10.1, -10.1]
    plon[:4] = [-179.8, 179.8, -179.9, 179.9]
    pts = spark.createDataFrame(
        pd.DataFrame({"pt_id": range(300), "lat": plat, "lon": plon})
    )
    cities = spark.createDataFrame(
        pd.DataFrame({"city_id": range(40), "lat": clat, "lon": clon})
    )
    r = 250.0
    got = {
        (x.pt_id, x.city_id): x.dist_km
        for x in radius_join(pts, cities, r, level=6).collect()
    }
    # brute force with the same rounding discipline
    d = haversine_np(
        plat[:, None], plon[:, None], clat[None, :], clon[None, :]
    )
    d = np.floor(d * 10000.0 + 0.5) / 10000.0
    want = {
        (i, j): d[i, j]
        for i in range(300)
        for j in range(40)
        if d[i, j] <= r
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9
    # the planted antimeridian pairs must be present
    assert any(p < 4 and c < 4 for (p, c) in got)


def test_radius_join_polar_cap_full_ring(spark):
    import pandas as pd

    from cityfinder_spark.operators.range_join import radius_join

    # city inside the polar cap: every longitude qualifies at tiny
    # lat separation, including the far side of the pole
    cities = spark.createDataFrame(
        pd.DataFrame({"city_id": [0], "lat": [89.5], "lon": [0.0]})
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"pt_id": [0, 1, 2], "lat": [89.4, 89.5, 88.0],
             "lon": [170.0, -90.0, 0.0]}
        )
    )
    got = {r.pt_id for r in radius_join(pts, cities, 200.0, level=6).collect()}
    assert {0, 1, 2} == got
