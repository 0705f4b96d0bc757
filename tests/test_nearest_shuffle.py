"""Big-dimension (no-broadcast) kNN join: exact parity with the global
brute-force argmin, the escalation ladder, empty/sparse dimensions, and
the no-BroadcastExchange plan guarantee that is the operator's point."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.operators.nearest import brute_force_nearest
from cityfinder_spark.operators.nearest_shuffle import nearest_city_join_bigdim
from tests.test_nearest import _cities_df, _points_df


def _want(spark, pts, cities):
    return (
        brute_force_nearest(pts, cities)
        .select(
            "pt_id",
            F.col("__best.city_id").alias("city_id"),
            F.col("__best.dist_km").alias("dist_km"),
        )
        .orderBy("pt_id")
        .collect()
    )


@pytest.mark.parametrize(
    "level,n_cities,n_pts",
    [(4, 300, 500), (6, 2000, 800), (5, 12, 400)],  # 12 cities: heavy escalation
)
def test_bigdim_equals_bruteforce(spark, level, n_cities, n_pts):
    rng = np.random.default_rng(level * 1000 + n_cities)
    cities = _cities_df(
        spark,
        [
            (i, f"c{i}", float(la), float(lo), "ZZ")
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-90, 90, n_cities), rng.uniform(-180, 180, n_cities))
            )
        ],
    )
    lats = np.concatenate(
        [rng.uniform(-90, 90, n_pts - 20), rng.uniform(85, 90, 10), rng.uniform(-90, -85, 10)]
    )
    lons = rng.uniform(-180, 180, n_pts)
    pts = _points_df(spark, list(zip(lats.tolist(), lons.tolist())))
    got = (
        nearest_city_join_bigdim(pts, cities, level=level)
        .select("pt_id", "city_id", "dist_km")
        .orderBy("pt_id")
        .collect()
    )
    want = _want(spark, pts, cities)
    assert len(got) == n_pts
    for g, w in zip(got, want):
        assert (g["pt_id"], g["city_id"], g["dist_km"]) == (
            w["pt_id"], w["city_id"], w["dist_km"],
        )


def test_bigdim_empty_cities_gives_null(spark):
    """Full-cover terminal round with an empty dimension: every point
    survives with NULL city columns (reference 'no city found' mapped
    to NULL), never dropped, never an infinite ladder."""
    cities = _cities_df(spark, [(1, "x", 0.0, 0.0, "XX")]).where(F.lit(False))
    pts = _points_df(spark, [(10.0, 20.0), (-45.0, 170.0)])
    rows = nearest_city_join_bigdim(pts, cities, level=3, n_cities=0).collect()
    assert len(rows) == 2
    assert all(r["city_id"] is None and r["dist_km"] is None for r in rows)


def test_bigdim_single_remote_city(spark):
    """One city on the far side of the planet: every point must climb
    the full ring ladder and still find it exactly."""
    cities = _cities_df(spark, [(7, "lone", -30.0, 150.0, "AU")])
    pts = _points_df(spark, [(64.0, -22.0), (0.0, 0.0), (-89.5, 10.0)])
    got = {
        r["pt_id"]: (r["city_id"], r["name"])
        for r in nearest_city_join_bigdim(pts, cities, level=5, n_cities=1).collect()
    }
    assert got == {0: (7, "lone"), 1: (7, "lone"), 2: (7, "lone")}


def test_bigdim_carries_payload_columns(spark):
    """Non-key point columns ride through both the fast path and the
    escalation rounds (the image+caption contract shape)."""
    pts = _points_df(spark, [(48.85, 2.35), (89.9, 0.0)]).withColumn(
        "caption", F.concat(F.lit("img_"), F.col("pt_id"))
    )
    cities = _cities_df(spark, [(1, "paris", 48.86, 2.35, "FR")])
    rows = {
        r["pt_id"]: r
        for r in nearest_city_join_bigdim(pts, cities, level=6, n_cities=1).collect()
    }
    assert rows[0]["caption"] == "img_0" and rows[0]["name"] == "paris"
    assert rows[1]["caption"] == "img_1" and rows[1]["name"] == "paris"


def test_bigdim_plan_has_no_broadcast_of_dim(spark):
    """The round-0 plan must not contain a BroadcastExchange/
    BroadcastHashJoin — a shuffled hash join of fact and cover is the
    whole point of the strategy. (Escalation rounds run eagerly via
    isEmpty, so the returned plan IS the round-0 + union plan.)"""
    rng = np.random.default_rng(3)
    cities = _cities_df(
        spark,
        [
            (i, f"c{i}", float(la), float(lo), "ZZ")
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-80, 80, 500), rng.uniform(-180, 180, 500))
            )
        ],
    )
    pts = _points_df(
        spark,
        list(
            zip(
                rng.uniform(-80, 80, 300).tolist(),
                rng.uniform(-180, 180, 300).tolist(),
            )
        ),
    )
    plan = nearest_city_join_bigdim(
        pts, cities, level=5, n_cities=500
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
