"""IDW interpolation (operators/nearest.py::idw_interpolate):
integer-weight determinism, bounds, and nearest-station dominance."""

from __future__ import annotations

from pyspark.sql import functions as F

from cityfinder_spark.contract import q_idw_interpolate
from cityfinder_spark.operators.nearest import idw_interpolate
from tests.conftest import SF_DIR


def test_estimates_bounded_and_complete(spark):
    out = q_idw_interpolate(spark, SF_DIR).collect()
    assert len(out) == 1500
    for r in out:
        assert r.n_used == 4
        assert 0.0 <= r.est <= 999.0  # convex combination of station values


def test_determinism_across_partitioning(spark):
    pairs = spark.createDataFrame(
        [(f"p{i % 50}", 0.5 + (i % 13) * 0.7, (i * 37) % 100) for i in range(400)],
        "pt_id string, dist_km double, value int",
    )
    a = {(r.pt_id, r.n_used, r.est) for r in idw_interpolate(pairs).collect()}
    b = {
        (r.pt_id, r.n_used, r.est)
        for r in idw_interpolate(pairs.repartition(17)).collect()
    }
    assert a == b


def test_nearest_station_dominates(spark):
    # one station at distance ~0 (clamped to 0.1), three far away:
    # the estimate must sit within 1 unit of the near station's value
    pairs = spark.createDataFrame(
        [("p", 0.0001, 700), ("p", 900.0, 10), ("p", 950.0, 20), ("p", 990.0, 30)],
        "pt_id string, dist_km double, value int",
    )
    est = idw_interpolate(pairs).collect()[0].est
    assert abs(est - 700.0) < 1.0


def test_knn_classify_majority_and_ties(spark):
    from cityfinder_spark.operators.nearest import knn_classify

    pairs = spark.createDataFrame(
        [("p1", "DE"), ("p1", "DE"), ("p1", "FR"),
         ("p2", "FR"), ("p2", "DE")],  # tie -> smallest label wins
        "pt_id string, label string",
    )
    out = {r.pt_id: (r.pred, r.n_votes) for r in knn_classify(pairs).collect()}
    assert out == {"p1": ("DE", 2), "p2": ("DE", 1)}


def test_knn_classify_contract_runs(spark):
    from cityfinder_spark.contract import q_knn_classify

    rows = q_knn_classify(spark, SF_DIR).collect()
    assert len(rows) == 1500
    assert all(1 <= r.n_votes <= 5 for r in rows)
