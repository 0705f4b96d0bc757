"""Geofence transitions (trajectory.py::geofence_events) and the
space-time OLAP cube (raster.py::spacetime_cube): episode structure
and cross-granularity consistency."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from cityfinder_spark.contract import (
    _polygons,
    q_geofence_events,
    q_spacetime_cube,
)
from cityfinder_spark.operators.trajectory import geofence_events
from tests.conftest import SF_DIR


def test_episodes_alternate_and_balance(spark):
    rows = q_geofence_events(spark, SF_DIR).collect()
    assert rows
    by_pair = defaultdict(list)
    for r in rows:
        by_pair[(r.cust_id, r.polygon_id)].append((r.seq, r.event))
    for events in by_pair.values():
        events.sort()
        # same-seq enter+exit (single-point episode) sorts enter first
        kinds = [e for _, e in sorted(events, key=lambda x: (x[0], x[1] != "enter"))]
        assert kinds[::2] == ["enter"] * (len(kinds) // 2)
        assert kinds[1::2] == ["exit"] * (len(kinds) // 2)


def test_synthetic_track_transitions(spark):
    # entity walks: outside, inside, inside, outside, inside -> two
    # episodes: enter@2 exit@3, enter@5 exit@5
    polys = _polygons(spark, SF_DIR).where(F.col("polygon_id") == 0)
    row = polys.collect()[0]
    clat = sum(row.ring_lats) / len(row.ring_lats)
    clon = sum(row.ring_lons) / len(row.ring_lons)
    far = (clat + 40.0 if clat < 0 else clat - 40.0, clon)
    pts = spark.createDataFrame(
        [
            (1, 1, far[0], far[1]),
            (1, 2, clat, clon),
            (1, 3, clat + 0.1, clon),
            (1, 4, far[0], far[1]),
            (1, 5, clat, clon + 0.1),
        ],
        "cust_id int, pt_id int, lat double, lon double",
    )
    ev = {
        (r.event, r.seq)
        for r in geofence_events(pts, polys).collect()
    }
    assert ev == {("enter", 2), ("exit", 3), ("enter", 5), ("exit", 5)}


def test_cube_granularities_consistent(spark):
    rows = q_spacetime_cube(spark, SF_DIR).collect()
    fine = [r for r in rows if r.gid == 0]
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1
    assert sum(r.n_points for r in fine) == total[0].n_points == 1500
    per_cell = {r.cell_id: r.n_points for r in rows if r.gid == 1}
    agg = defaultdict(int)
    for r in fine:
        agg[r.cell_id] += r.n_points
    assert dict(agg) == per_cell
    per_month = {r.month: r.n_points for r in rows if r.gid == 2}
    assert set(per_month) <= set(range(1, 13))
