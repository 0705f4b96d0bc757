"""Property-based tests (hypothesis) for the geo kernels — the
correctness crux of replacing ClosestEdgeQuery (SURVEY §7.3): the
certainty radius must NEVER exceed the true distance to any location
outside the ring-k neighborhood, or the kNN join could return a false
nearest. Pure NumPy, no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from cityfinder_spark.geo.cells import (
    KM_PER_DEG,
    cell_of_np,
    certainty_radius_np,
    decode_cell_np,
    grid_dims,
    ring_neighbors_np,
)
from cityfinder_spark.geo.distance import haversine_np

lat_st = st.floats(-89.999, 89.999, allow_nan=False)
lon_st = st.floats(-179.999, 179.999, allow_nan=False)
level_st = st.integers(2, 8)
ring_st = st.integers(1, 3)


@given(lat_st, lon_st, level_st)
@settings(max_examples=200, deadline=None)
def test_cell_decode_roundtrip(lat, lon, level):
    cell = cell_of_np(np.array([lat]), np.array([lon]), level)
    lv, i, j = decode_cell_np(cell)
    nlat, nlon = grid_dims(level)
    assert lv[0] == level and 0 <= i[0] < nlat and 0 <= j[0] < nlon


@given(lat_st, lon_st, level_st, ring_st)
@settings(max_examples=100, deadline=None)
def test_ring_contains_own_cell_and_is_unique(lat, lon, level, ring):
    cell = int(cell_of_np(np.array([lat]), np.array([lon]), level)[0])
    ring_cells = ring_neighbors_np(cell, ring)
    assert cell in ring_cells
    assert len(ring_cells) == len(set(ring_cells.tolist()))
    assert len(ring_cells) <= (2 * ring + 1) ** 2


@given(lat_st, lon_st, lat_st, lon_st)
@settings(max_examples=200, deadline=None)
def test_haversine_metric_properties(la1, lo1, la2, lo2):
    a = np.array([la1]), np.array([lo1])
    b = np.array([la2]), np.array([lo2])
    d_ab = haversine_np(a[0], a[1], b[0], b[1])[0]
    d_ba = haversine_np(b[0], b[1], a[0], a[1])[0]
    assert abs(d_ab - d_ba) < 1e-9
    assert 0.0 <= d_ab <= np.pi * 6371.0 + 1e-6
    assert haversine_np(a[0], a[1], a[0], a[1])[0] < 1e-9


@given(lat_st, lon_st, level_st, ring_st, st.integers(0, 10_000))
@settings(max_examples=300, deadline=None)
def test_certainty_radius_is_sound(lat, lon, level, ring, seed):
    """THE completeness invariant: every point whose cell lies OUTSIDE
    the ring-k neighborhood is at great-circle distance >= the
    certainty radius. (If this held not, the fast path could declare a
    non-global candidate 'proven'.)"""
    cell = int(cell_of_np(np.array([lat]), np.array([lon]), level)[0])
    ring_set = set(ring_neighbors_np(cell, ring).tolist())
    cert = certainty_radius_np(np.array([lat]), ring, level)[0]
    rng = np.random.default_rng(seed)
    qlat = rng.uniform(-90, 90, 200)
    qlon = rng.uniform(-180, 180, 200)
    qcell = cell_of_np(qlat, qlon, level)
    outside = np.array([c not in ring_set for c in qcell.tolist()])
    if outside.any():
        d = haversine_np(
            np.full(outside.sum(), lat), np.full(outside.sum(), lon),
            qlat[outside], qlon[outside],
        )
        assert d.min() >= cert - 1e-9, (d.min(), cert, lat, lon, level, ring)


@given(lat_st, ring_st, level_st)
@settings(max_examples=200, deadline=None)
def test_certainty_radius_formula_bounds(lat, ring, level):
    cert = certainty_radius_np(np.array([lat]), ring, level)[0]
    h = 180.0 / (1 << level)
    assert 0.0 <= cert <= ring * h * KM_PER_DEG + 1e-9
