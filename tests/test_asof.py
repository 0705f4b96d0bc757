"""As-of join: hand-checkable semantics — inclusive vs strict, ts
tie-breaks, no-match nulls, per-key isolation — plus plan shape (one
window, no theta-join)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cityfinder_spark.operators.asof import asof_join


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, k, datetime(2024, 1, 1, 0, 0, s), float(v)) for i, (k, s, v) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )


def test_asof_basic_and_no_match(spark):
    views = _df(spark, [(1, 10, 1.0), (1, 20, 2.0), (2, 15, 3.0)])
    clicks = _df(spark, [(1, 15, 0.0), (1, 25, 0.0), (2, 5, 0.0)])
    out = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in asof_join(clicks, views).collect()
    }
    assert out[0] == (0, 1.0)   # click@15 -> view@10
    assert out[1] == (1, 2.0)   # click@25 -> view@20
    assert out[2] == (None, None)  # user 2 has no view before s=5


def test_asof_equal_ts_inclusive_vs_strict(spark):
    views = _df(spark, [(1, 10, 1.0)])
    clicks = _df(spark, [(1, 10, 0.0)])
    incl = asof_join(clicks, views).collect()[0]
    assert incl["r_event_id"] == 0
    strict = asof_join(clicks, views, strict=True).collect()[0]
    assert strict["r_event_id"] is None


def test_asof_tie_on_ts_takes_max_tie_col(spark):
    views = _df(spark, [(1, 10, 1.0), (1, 10, 2.0), (1, 10, 3.0)])
    clicks = _df(spark, [(1, 12, 0.0)])
    row = asof_join(clicks, views).collect()[0]
    assert (row["r_event_id"], row["r_value"]) == (2, 3.0)


def test_asof_keys_are_isolated(spark):
    views = _df(spark, [(1, 10, 1.0), (2, 11, 2.0)])
    clicks = _df(spark, [(2, 12, 0.0)])
    row = asof_join(clicks, views).collect()[0]
    assert (row["r_event_id"], row["r_value"]) == (1, 2.0)


def test_asof_plan_is_window_not_theta_join(spark):
    views = _df(spark, [(1, 10, 1.0)])
    clicks = _df(spark, [(1, 12, 0.0)])
    plan = (
        asof_join(clicks, views)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, plan


def test_asof_left_columns_ride_through(spark):
    views = _df(spark, [(1, 10, 1.0)])
    clicks = _df(spark, [(1, 12, 7.5)]).withColumn(
        "tag", F.concat(F.lit("t"), F.col("event_id"))
    )
    row = asof_join(clicks, views).collect()[0]
    assert row["tag"] == "t0" and row["value"] == 7.5 and row["r_value"] == 1.0
