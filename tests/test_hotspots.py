"""Grid-DBSCAN hotspot clustering: hand-checkable lattices, longitude
wrap-around merging, threshold gating, and the DuckDB recursive-CTE
closure parity on real testdata."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cityfinder_spark import contract, sqlcompat as sc
from cityfinder_spark.geo.cells import cell_size_deg
from cityfinder_spark.operators.hotspots import hotspot_clusters
from tests.conftest import SF_DIR_01


def _pts(spark, coords):
    return spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(coords)],
        "pt_id long, lat double, lon double",
    )


def test_two_separate_blobs(spark):
    """Two dense blobs far apart -> two clusters; a lone point below
    the threshold contributes no hot cell."""
    level = 4  # 11.25-degree cells
    h = cell_size_deg(level)
    blob_a = [(10.0 + 0.01 * i, 10.0) for i in range(5)]
    blob_b = [(-40.0, -120.0 + 0.01 * i) for i in range(4)]
    lone = [(60.0, 60.0)]
    out = hotspot_clusters(
        _pts(spark, blob_a + blob_b + lone), level=level, min_count=3
    ).collect()
    assert len(out) == 2
    # isolated hot cells: each its own cluster, labelled by itself
    assert all(r["cluster_id"] == r["cell_id"] for r in out)
    counts = sorted(r["n_points"] for r in out)
    assert counts == [4, 5]
    assert abs(blob_a[0][0] - blob_b[0][0]) > 2 * h  # sanity: truly apart


def test_adjacent_cells_merge_into_one_cluster(spark):
    """A dense strip crossing three adjacent cells merges into ONE
    cluster labelled by the smallest member cell id."""
    level = 4
    h = cell_size_deg(level)
    strip = [
        (5.0, 10.0 + dx * h + eps)
        for dx in (0, 1, 2)
        for eps in (0.1, 0.2, 0.3)
    ]
    out = hotspot_clusters(_pts(spark, strip), level=level, min_count=3).collect()
    assert len(out) == 3
    labels = {r["cluster_id"] for r in out}
    assert labels == {min(r["cell_id"] for r in out)}


def test_diagonal_adjacency_counts(spark):
    """8-adjacency: diagonal neighbors merge (Chebyshev ring, not
    von-Neumann)."""
    level = 4
    h = cell_size_deg(level)
    a = [(5.0 + 0.1, 10.0 + 0.1)] * 3
    b = [(5.0 + h + 0.1, 10.0 + h + 0.1)] * 3  # one step up AND right
    out = hotspot_clusters(_pts(spark, a + b), level=level, min_count=3).collect()
    assert len(out) == 2
    assert len({r["cluster_id"] for r in out}) == 1


def test_antimeridian_wraparound_merges(spark):
    """Hot cells on either side of lon=180 are ring-adjacent (lon
    wraps) and must land in one cluster."""
    level = 4
    east = [(0.0, 179.9)] * 3
    west = [(0.0, -179.9)] * 3
    out = hotspot_clusters(_pts(spark, east + west), level=level, min_count=3).collect()
    assert len(out) == 2
    assert len({r["cluster_id"] for r in out}) == 1


def test_matches_duckdb_recursive_closure(spark):
    """Full parity with the oracle's recursive-CTE transitive closure
    on the real sf0.01 points (sf0.001 has no cell above threshold)."""
    spark_rows = sorted(
        (r["cell_id"], r["cluster_id"], r["n_points"])
        for r in contract.q_hotspot_clusters(spark, SF_DIR_01).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR_01}/orders.parquet')"
    )
    duck_rows = sorted(
        (a, b, c)
        for a, b, c in con.execute(contract._o_hotspot_clusters()).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0


def test_kanon_cells_suppression(spark):
    """Cells below k distinct contributors are suppressed even when
    point-count is high (one user, many points); >= k distinct users
    publishes."""
    import pandas as pd

    from cityfinder_spark.operators.hotspots import kanon_cells

    rows = (
        # cell A (lat 10.1): 3 distinct users -> published
        [(u, 10.1, 20.1) for u in (1, 2, 3)]
        # cell B (lat -40.1): 1 user, 5 points -> suppressed
        + [(7, -40.1, 30.1)] * 5
    )
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "lat", "lon"])
    )
    out = {
        r["cell_id"]: (r["n_points"], r["n_users"], r["published"])
        for r in kanon_cells(pts, "user_id", 6, 3).collect()
    }
    assert len(out) == 2
    vals = sorted(out.values())
    assert vals == [(3, 3, True), (5, 1, False)]


def test_od_flows_transitions_and_suppression(spark):
    """Track a->a->b yields self-loop (a,a) and (a,b); a pair seen by
    only one entity is suppressed at k=2, one seen by two publishes."""
    import pandas as pd

    from cityfinder_spark.geo.cells import cell_of_np
    from cityfinder_spark.operators.trajectory import od_flows
    import numpy as np

    a = (10.1, 20.1)
    b = (-40.1, 30.1)
    rows = [
        (1, 0, *a), (1, 1, *a), (1, 2, *b),   # (a,a), (a,b)
        (2, 0, *a), (2, 1, *b),               # (a,b)
    ]
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cust_id", "pt_id", "lat", "lon"])
    )
    ca = int(cell_of_np(np.array([a[0]]), np.array([a[1]]), 6)[0])
    cb = int(cell_of_np(np.array([b[0]]), np.array([b[1]]), 6)[0])
    out = {
        (r["o_cell"], r["d_cell"]): (r["n_trips"], r["n_users"], r["published"])
        for r in od_flows(pts, level=6, k_anon=2).collect()
    }
    assert out == {
        (ca, ca): (1, 1, False),
        (ca, cb): (2, 2, True),
    }
