"""Nearest-city operator: the reference's golden fixtures
(lib/finder/coordinates/s2_test.go) + brute-force equality at random.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.operators.nearest import (
    brute_force_nearest,
    choose_level,
    nearest_city_join,
    nearest_city_topk,
)

# golden 3-city fixture (reference s2_test.go:12-16)
THREE = [
    (0, "San Francisco", 37.7749, -122.4194, "US"),
    (1, "New York", 40.7128, -74.0060, "US"),
    (2, "London", 51.5074, -0.1278, "GB"),
]

# the 12 benchmark coordinates (reference cmd/benchmark/main.go:18-35)
BENCH12 = [
    (40.7128, -74.0060, "New York"),
    (34.0522, -118.2437, "Los Angeles"),
    (41.8781, -87.6298, "Chicago"),
    (51.5074, -0.1278, "London"),
    (48.8566, 2.3522, "Paris"),
    (35.6895, 139.6917, "Tokyo"),
    (55.7558, 37.6176, "Moscow"),
    (-33.8688, 151.2093, "Sydney"),
    (39.9042, 116.4074, "Beijing"),
    (19.4326, -99.1332, "Mexico City"),
    (55.7963, 49.1088, "Kazan"),
    (54.5378, 52.7985, "Bugulma"),
]


def _cities_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["city_id", "name", "lat", "lon", "country"])
    )


def _points_df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, la, lo) for i, (la, lo) in enumerate(pts)],
            columns=["pt_id", "lat", "lon"],
        )
    )


def test_golden_three_city(spark):
    """s2_test.go:29-55: SF query ~0.04km, NY exact 0km, mid-Atlantic->NY."""
    cities = _cities_df(spark, THREE)
    pts = _points_df(spark, [(37.7750, -122.4190), (40.7128, -74.0060), (30.0, -40.0)])
    out = {
        r["pt_id"]: r
        for r in nearest_city_join(pts, cities, level=4).collect()
    }
    assert out[0]["name"] == "San Francisco"
    assert abs(out[0]["dist_km"] - 0.04) < 0.1
    assert out[1]["name"] == "New York"
    assert out[1]["dist_km"] < 0.1
    assert out[2]["name"] == "New York"  # mid-Atlantic tie case


def test_single_city_honolulu(spark):
    """s2_test.go:96-108."""
    cities = _cities_df(spark, [(0, "Honolulu", 21.3069, -157.8583, "US")])
    pts = _points_df(spark, [(21.3, -157.8)])
    row = nearest_city_join(pts, cities, level=3).collect()[0]
    assert row["name"] == "Honolulu"
    assert row["dist_km"] < 10  # true great-circle distance ~6.09 km


def test_empty_cities_gives_null(spark):
    """s2_test.go:85-94: 'no city found' -> NULL columns relationally."""
    cities = spark.createDataFrame(
        [], "city_id long, name string, lat double, lon double, country string"
    )
    pts = _points_df(spark, [(10.0, 10.0)])
    row = nearest_city_join(pts, cities, level=3).collect()[0]
    assert row["city_id"] is None and row["name"] is None


def test_bench12_assignments_match_bruteforce(spark):
    """The 12 benchmark points against a 200-city synthetic world must
    match brute force exactly — fixture parity per BASELINE.json."""
    rng = np.random.default_rng(7)
    world = [
        (i, f"city_{i}", float(la), float(lo), "XX")
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-80, 80, 200), rng.uniform(-180, 180, 200))
        )
    ] + [(200 + i, nm, la, lo, "YY") for i, (la, lo, nm) in enumerate(BENCH12)]
    cities = _cities_df(spark, world)
    pts = _points_df(spark, [(la, lo) for la, lo, _ in BENCH12])
    got = nearest_city_join(pts, cities).orderBy("pt_id").collect()
    # each benchmark point sits exactly on its own city
    for i, r in enumerate(got):
        assert r["name"] == BENCH12[i][2]
        assert r["dist_km"] == 0.0


@pytest.mark.parametrize("level,ring,n_cities,n_pts", [(4, 1, 300, 500), (6, 1, 2000, 800), (5, 2, 50, 400)])
def test_random_equals_bruteforce(spark, level, ring, n_cities, n_pts):
    """Engine == global argmin on random clouds, incl. polar points and
    sparse dimensions (forces the escalation path)."""
    rng = np.random.default_rng(level * 100 + ring)
    cities = _cities_df(
        spark,
        [
            (i, f"c{i}", float(la), float(lo), "ZZ")
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-90, 90, n_cities), rng.uniform(-180, 180, n_cities))
            )
        ],
    )
    lats = np.concatenate([rng.uniform(-90, 90, n_pts - 20), rng.uniform(85, 90, 10), rng.uniform(-90, -85, 10)])
    lons = rng.uniform(-180, 180, n_pts)
    pts = _points_df(spark, list(zip(lats.tolist(), lons.tolist())))
    got = (
        nearest_city_join(pts, cities, level=level, ring=ring)
        .select("pt_id", "city_id", "dist_km")
        .orderBy("pt_id")
        .collect()
    )
    want = (
        brute_force_nearest(pts, cities)
        .select("pt_id", F.col("__best.city_id").alias("city_id"), F.col("__best.dist_km").alias("dist_km"))
        .orderBy("pt_id")
        .collect()
    )
    assert len(got) == n_pts
    for g, w in zip(got, want):
        assert (g["pt_id"], g["city_id"], g["dist_km"]) == (w["pt_id"], w["city_id"], w["dist_km"])


def test_topk_matches_bruteforce_window(spark):
    rng = np.random.default_rng(11)
    cities = _cities_df(
        spark,
        [
            (i, f"c{i}", float(la), float(lo), "ZZ")
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-90, 90, 500), rng.uniform(-180, 180, 500))
            )
        ],
    )
    pts = _points_df(spark, list(zip(rng.uniform(-90, 90, 200).tolist(), rng.uniform(-180, 180, 200).tolist())))
    got = nearest_city_topk(pts, cities, k=3, level=5).orderBy("pt_id", "rank").collect()
    # oracle: full cross join + window
    from pyspark.sql import Window
    from cityfinder_spark.geo.distance import haversine_rounded_col

    cdf = cities.select("city_id", F.col("lat").alias("c_lat"), F.col("lon").alias("c_lon"))
    w = Window.partitionBy("pt_id").orderBy("dist_km", "city_id")
    want = (
        pts.crossJoin(cdf)
        .withColumn("dist_km", haversine_rounded_col("lat", "lon", "c_lat", "c_lon", 4))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .orderBy("pt_id", "rank")
        .collect()
    )
    assert len(got) == len(want) == 600
    for g, v in zip(got, want):
        assert (g["pt_id"], g["city_id"], g["dist_km"], g["rank"]) == (
            v["pt_id"], v["city_id"], v["dist_km"], v["rank"])


def test_choose_level():
    assert choose_level(0) == 2
    assert 3 <= choose_level(1500) <= 6
    assert choose_level(13_000_000) >= 9


def test_strategies_agree_knn_and_topk(spark):
    """arrow (mapInPandas, scale path) and jvm (pure-Catalyst plan)
    strategies must produce identical rows, including tie-breaks."""
    rng = np.random.default_rng(23)
    cities = _cities_df(
        spark,
        [
            (i, f"c{i}", float(la), float(lo), "ZZ")
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-90, 90, 400), rng.uniform(-180, 180, 400))
            )
        ],
    )
    pts = _points_df(
        spark,
        list(zip(rng.uniform(-90, 90, 300).tolist(), rng.uniform(-180, 180, 300).tolist())),
    )
    a = (
        nearest_city_join(pts, cities, strategy="arrow", n_cities=400)
        .orderBy("pt_id").collect()
    )
    j = (
        nearest_city_join(pts, cities, strategy="jvm", n_cities=400)
        .orderBy("pt_id").collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in j]
    at = (
        nearest_city_topk(pts, cities, k=4, strategy="arrow", n_cities=400)
        .orderBy("pt_id", "rank").collect()
    )
    jt = (
        nearest_city_topk(pts, cities, k=4, strategy="jvm", n_cities=400)
        .orderBy("pt_id", "rank").collect()
    )
    assert [tuple(r) for r in at] == [tuple(r) for r in jt]


def test_chord_helpers_roundtrip_and_monotone():
    """chord^2 <-> km conversions: monotone, inclusive bound, antipode
    clamp (the correctness basis of the escalation prefilter)."""
    from cityfinder_spark.operators.nearest_arrow import (
        _chord_sq_to_km,
        _km_to_chord_sq_bound,
    )
    from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM

    d = np.array([0.0, 1e-3, 1.0, 500.0, 5000.0, 15000.0, np.pi * EARTH_RADIUS_KM])
    half = d / (2.0 * EARTH_RADIUS_KM)
    c2 = (2.0 * np.sin(half)) ** 2
    back = _chord_sq_to_km(c2)
    assert np.allclose(back, d, rtol=1e-12, atol=1e-9)
    # the bound for margin d must admit chord^2(d) itself (inclusive)
    bound = _km_to_chord_sq_bound(d)
    assert (c2 <= bound).all()
    # monotone in d below the antipode; beyond it keeps everything
    assert (np.diff(bound[:-1]) > 0).all()
    assert _km_to_chord_sq_bound(np.array([1e9]))[0] > 4.0


def test_index_cache_reuse(spark):
    """cache_key reuses the driver-built index across calls; different
    knobs under the same key rebuild (reference gob-cache analog)."""
    from cityfinder_spark.operators import nearest_arrow as na

    cities = _cities_df(spark, THREE)
    na._INDEX_CACHE.clear()
    nearest_city_join(_points_df(spark, [(48.8, 2.3)]), cities,
                      level=4, cache_key=("t", "x")).collect()
    assert len(na._INDEX_CACHE) == 1
    idx1 = next(iter(na._INDEX_CACHE.values()))
    nearest_city_join(_points_df(spark, [(51.5, -0.1)]), cities,
                      level=4, cache_key=("t", "x")).collect()
    assert len(na._INDEX_CACHE) == 1
    assert next(iter(na._INDEX_CACHE.values())) is idx1
    nearest_city_join(_points_df(spark, [(51.5, -0.1)]), cities,
                      level=5, cache_key=("t", "x")).collect()
    assert len(na._INDEX_CACHE) == 2
    na._INDEX_CACHE.clear()


def test_escalation_tiebreak_equidistant_cities(spark):
    """Cities EXACTLY equidistant (symmetric dlon) from sparse query
    points: lowest city_id must win on both the in-ring path and the
    chord-prefiltered escalation path (rounded-dist-then-id mandate)."""
    pts = []
    cities = []
    cid = 0
    for j, plat in enumerate([0.0, 20.0, 45.0, -60.0, 80.0]):
        plon = j * 30.0
        # two cities symmetric about the point's meridian: identical
        # great-circle distance by construction; far enough (~8 deg)
        # that a sparse dimension forces escalation
        for dlon, _tag in ((8.0, "east"), (-8.0, "west")):
            cities.append((cid, f"c{cid}", plat, plon + dlon, "ZZ"))
            cid += 1
        pts.append((plat, plon))
    got = (
        nearest_city_join(
            _points_df(spark, pts), _cities_df(spark, cities), level=7, ring=1
        )
        .orderBy("pt_id")
        .collect()
    )
    for i, r in enumerate(got):
        assert r["city_id"] == 2 * i  # lower id of the equidistant pair
    # top-k: both of the pair appear, ordered by id at equal distance
    topk = (
        nearest_city_topk(
            _points_df(spark, pts), _cities_df(spark, cities), k=2, level=7, ring=1
        )
        .orderBy("pt_id", "rank")
        .collect()
    )
    for i in range(len(pts)):
        a, b = topk[2 * i], topk[2 * i + 1]
        assert (a["city_id"], b["city_id"]) == (2 * i, 2 * i + 1)
        assert a["dist_km"] == b["dist_km"]


def test_topk_k_exceeds_city_count(spark):
    """k > |cities|: every city returned once per point, ranks 1..n,
    ordered (rounded dist, city_id) — blind escalation edge (counts<k
    means no certainty proof; the full-scan path with the chord-kth
    margin keeps everything)."""
    cities = _cities_df(spark, THREE)
    pts = _points_df(spark, [(40.73, -74.0), (-33.9, 151.2)])
    rows = nearest_city_topk(pts, cities, k=5, level=6).orderBy(
        "pt_id", "rank"
    ).collect()
    assert len(rows) == 2 * len(THREE)
    for p in range(2):
        chunk = rows[p * 3 : (p + 1) * 3]
        assert [r["rank"] for r in chunk] == [1, 2, 3]
        ds = [r["dist_km"] for r in chunk]
        assert ds == sorted(ds)


def test_topk_empty_cities(spark):
    cities = spark.createDataFrame(
        [], "city_id long, name string, lat double, lon double, country string"
    )
    pts = _points_df(spark, [(10.0, 10.0)])
    assert nearest_city_topk(pts, cities, k=3, level=4).count() == 0
