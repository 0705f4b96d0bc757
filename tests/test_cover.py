"""S2-style region covering (operators/cover.py): exactness of the
full/partial classification, disjointness of the emitted cover, and
value-parity of cover_read with the plain ray-cast PIP operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.contract import _points, _polygons
from cityfinder_spark.operators.cover import (
    COVER_MAX_LEVEL,
    COVER_MIN_LEVEL,
    cover_read,
    region_cover,
)
from cityfinder_spark.operators.point_in_polygon import (
    point_in_polygon_np,
    tag_points_with_polygons,
)
from cityfinder_spark.sqlcompat import LEVEL_STRIDE
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def polys(spark):
    return _polygons(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def cover(spark, polys):
    return region_cover(polys).cache()


def _decode(cell_id: int) -> tuple[int, int, int]:
    level = cell_id // LEVEL_STRIDE
    rem = cell_id % LEVEL_STRIDE
    nlon = 2 << level
    return level, rem // nlon, rem % nlon


def test_cover_disjoint_per_polygon(cover):
    """No emitted cell is an ancestor of another emitted cell of the
    same polygon — the cover partitions its region."""
    rows = cover.collect()
    by_poly: dict[int, set[tuple[int, int, int]]] = {}
    for r in rows:
        by_poly.setdefault(r.polygon_id, set()).add(_decode(r.cell_id))
    for cells in by_poly.values():
        for level, i, j in cells:
            for a in range(COVER_MIN_LEVEL, level):
                sh = level - a
                assert (a, i >> sh, j >> sh) not in cells
    # partial cells only at max level; full cells can sit anywhere
    for r in rows:
        if r.coverage == "partial":
            assert r.level == COVER_MAX_LEVEL


def test_full_cells_are_inside(cover, polys):
    """Every corner + center of every full cell passes the exact
    ray cast — full means contained, no sampling involved."""
    rings = {
        r.polygon_id: (np.array(r.ring_lats), np.array(r.ring_lons))
        for r in polys.collect()
    }
    for r in cover.where("coverage = 'full'").collect():
        level, i, j = _decode(r.cell_id)
        s = 180.0 / (1 << level)
        lat0, lon0 = i * s - 90.0, j * s - 180.0
        py = np.array([lat0, lat0, lat0 + s, lat0 + s, lat0 + s / 2])
        px = np.array([lon0, lon0 + s, lon0, lon0 + s, lon0 + s / 2])
        ring_lat, ring_lon = rings[r.polygon_id]
        assert point_in_polygon_np(py, px, ring_lat, ring_lon).all(), (
            r.polygon_id,
            level,
            i,
            j,
        )


def test_cover_contains_all_member_points(spark, cover, polys):
    """Every point the exact PIP tags lands in exactly one cover cell
    of that polygon (the covering is complete and disjoint)."""
    pts = _points(spark, SF_DIR).select("pt_id", "lat", "lon")
    tags = tag_points_with_polygons(pts, polys).select(
        "pt_id", "lat", "lon", "polygon_id"
    )
    rows = tags.collect()
    cov = {}
    for r in cover.collect():
        cov.setdefault(r.polygon_id, set()).add(r.cell_id)
    for r in rows:
        hits = 0
        for level in range(COVER_MIN_LEVEL, COVER_MAX_LEVEL + 1):
            s = 180.0 / (1 << level)
            nlat, nlon = 1 << level, 2 << level
            i = min(max(int(np.floor((r.lat + 90.0) / s)), 0), nlat - 1)
            j = int(np.floor((r.lon + 180.0) / s)) % nlon
            if level * LEVEL_STRIDE + i * nlon + j in cov[r.polygon_id]:
                hits += 1
        assert hits == 1, (r.pt_id, r.polygon_id)


def test_cover_read_matches_ray_cast(spark, polys):
    """cover_read == tag_points_with_polygons as a row set (the
    contract cross-validation, locally)."""
    pts = _points(spark, SF_DIR).select("pt_id", "lat", "lon")
    got = {
        (r.pt_id, r.polygon_id, r.poly_country)
        for r in cover_read(pts, polys).collect()
    }
    want = {
        (r.pt_id, r.polygon_id, r.poly_country)
        for r in tag_points_with_polygons(pts, polys)
        .select("pt_id", "polygon_id", "poly_country")
        .collect()
    }
    assert got == want and len(want) > 0


def test_interior_share_dominates(spark, polys):
    """The scale claim: most tagged rows ride the zero-geometry
    full-cell path; only a boundary minority pays the ray cast."""
    pts = _points(spark, SF_DIR).select("pt_id", "lat", "lon")
    cov = region_cover(polys)
    lat = F.col("lat")
    cells = F.expr(
        f"transform(sequence({COVER_MIN_LEVEL}, {COVER_MAX_LEVEL}), l -> "
        f"cast(l AS bigint) * {LEVEL_STRIDE}"
        f" + least(greatest(cast(floor((lat + 90.0) / (180.0 / cast(shiftleft(1, l) AS double))) AS bigint), 0),"
        f" cast(shiftleft(1, l) AS bigint) - 1) * cast(shiftleft(2, l) AS bigint)"
        f" + pmod(cast(floor((lon + 180.0) / (180.0 / cast(shiftleft(1, l) AS double))) AS bigint),"
        f" cast(shiftleft(2, l) AS bigint)))"
    )
    tagged = pts.select(F.explode(cells).alias("cell_id")).join(
        F.broadcast(cov), "cell_id"
    )
    n_full = tagged.where("coverage = 'full'").count()
    n_partial = tagged.where("coverage = 'partial'").count()
    assert n_full > n_partial  # interior dominates already at level 7


def test_cover_read_plan_shape(spark, polys):
    """Fact side: broadcast hash joins only — no cartesian/nested-loop
    join, no row-at-a-time Python."""
    pts = _points(spark, SF_DIR).select("pt_id", "lat", "lon")
    plan = cover_read(pts, polys)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the fact table joins the cover by broadcast hash on cell_id
    assert "BroadcastHashJoin [cell_id" in plan
    # the only nested-loop joins are the 6-row VALUES hex-coef cross
    # inside the polygon FIXTURE (dimension-side); none touch orders
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "orders" not in line


def test_ocean_points_partition_the_points(spark):
    """inside ∪ outside == all points, disjoint (the anti-join is the
    exact complement of the PIP tags)."""
    from cityfinder_spark.contract import _points, q_cover_read, q_ocean_points

    inside = {r.pt_id for r in q_cover_read(spark, SF_DIR).collect()}
    outside = {r.pt_id for r in q_ocean_points(spark, SF_DIR).collect()}
    allpts = {r.pt_id for r in _points(spark, SF_DIR).select("pt_id").collect()}
    assert inside | outside == allpts
    assert not (inside & outside)
