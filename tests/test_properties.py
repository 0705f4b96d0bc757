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


# ---- randomized end-to-end kernel property: _solve_batch / _topk_batch
# vs the all-pairs rounded oracle, over arbitrary city layouts.
# Exercises every pruning layer added to the batch kernels (ring
# chord prefilter in dot space, per-component box cuts, tie-collapsed
# k-th-max) without Spark: CityIndex builds straight from arrays.


def _rand_index(seed: int, n_cities: int, level: int, ring: int):
    from cityfinder_spark.operators.nearest_arrow import CityIndex

    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.9, 89.9, n_cities)
    lon = rng.uniform(-180.0, 180.0, n_cities)
    # force some exact duplicates and micro-ties into every layout
    if n_cities >= 8:
        lat[1], lon[1] = lat[0], lon[0]
        lat[3] = lat[2] + 1e-9
        lon[3] = lon[2]
    ids = np.arange(n_cities, dtype=np.int64)
    names = np.array([f"c{i}" for i in ids], dtype=object)
    ctry = np.array(["XX"] * n_cities, dtype=object)
    return CityIndex(ids, lat, lon, names, ctry, level, ring)


def _rand_points(seed: int, idx, npts: int):
    rng = np.random.default_rng(seed + 1)
    lat = rng.uniform(-89.99, 89.99, npts)
    lon = rng.uniform(-180.0, 180.0, npts)
    # half the points huddle near cities (the skewed real shape)
    near = rng.integers(0, len(idx.lat), npts // 2)
    lat[: npts // 2] = np.clip(
        idx.lat[near] + rng.uniform(-0.3, 0.3, npts // 2), -89.99, 89.99
    )
    lon[: npts // 2] = idx.lon[near] + rng.uniform(-0.3, 0.3, npts // 2)
    return lat, lon


@given(
    st.integers(0, 10_000),
    st.integers(2, 300),
    st.integers(2, 7),
    st.integers(1, 2),
    st.sampled_from([1, 2, 3, 5]),
)
@settings(max_examples=30, deadline=None)
def test_batch_kernels_match_allpairs_oracle(seed, n_cities, level, ring, k):
    from cityfinder_spark.operators import nearest_arrow as na

    idx = _rand_index(seed, n_cities, level, ring)
    lat, lon = _rand_points(seed, idx, 60)
    npts, nc = len(lat), n_cities
    pt = np.repeat(np.arange(npts, dtype=np.int64), nc)
    ct = np.tile(np.arange(nc, dtype=np.int64), npts)
    d_all = na._hav_pairs_rounded(
        idx, np.radians(lat), np.radians(lon), np.cos(np.radians(lat)),
        pt, ct, na.ROUND_DIGITS,
    ).reshape(npts, nc)

    pos, d = na._solve_batch(idx, lat, lon, na.ROUND_DIGITS)
    for i in range(npts):
        order = np.lexsort((np.arange(nc), d_all[i]))
        assert pos[i] == order[0], (i, pos[i], order[0])
        assert d[i] == d_all[i][order[0]]

    rows, tpos, td, trank = na._topk_batch(idx, lat, lon, k, na.ROUND_DIGITS)
    kk = min(k, nc)
    assert len(rows) == npts * kk
    by_row = np.lexsort((trank, rows))
    tpos = tpos[by_row].reshape(npts, kk)
    td = td[by_row].reshape(npts, kk)
    for i in range(npts):
        order = np.lexsort((np.arange(nc), d_all[i]))[:kk]
        assert np.array_equal(tpos[i], order), (i, tpos[i], order)
        assert np.array_equal(td[i], d_all[i][order])


# ---------------- round-3 operators: pure-math properties ----------------


def _chunks64(x: int, max_dist: int) -> list[int]:
    """Python mirror of dedup.hamming_pairs' chunking (unsigned shifts,
    remainder-absorbing last chunk)."""
    bits, nchunks = 64, max_dist + 1
    chunk_bits = max(1, bits // nchunks)
    u = x & (2**64 - 1)
    out = []
    for c in range(nchunks):
        lo = c * chunk_bits
        width = bits - lo if c == nchunks - 1 else chunk_bits
        out.append((u >> lo) & ((1 << width) - 1))
    return out


@given(
    st.integers(0, 2**64 - 1),
    st.integers(1, 6),
    st.sets(st.integers(0, 63), max_size=6),
)
@settings(max_examples=300, deadline=None)
def test_hamming_chunk_pigeonhole(x, max_dist, flip_bits):
    """Pairs within max_dist hamming MUST share >= 1 chunk (the
    exactness guarantee of the banded join), and the chunks must
    PARTITION all 64 bits (losing a bit would admit false pairs)."""
    y = x
    for b in flip_bits:
        y ^= 1 << b
    hamming = len(flip_bits)
    cx, cy = _chunks64(x, max_dist), _chunks64(y, max_dist)
    if hamming <= max_dist:
        assert any(a == b for a, b in zip(cx, cy))
    # partition: chunks reconstruct the full word
    bits, nchunks = 64, max_dist + 1
    chunk_bits = max(1, bits // nchunks)
    rebuilt = 0
    for c, v in enumerate(cx):
        rebuilt |= v << (c * chunk_bits)
    assert rebuilt == x & (2**64 - 1)


@given(st.integers(0, 10**6), st.integers(2, 6), st.integers(1, 8))
@settings(max_examples=100, deadline=None)
def test_phash64_brightness_scaling_invariant(seed, scale, size):
    """Perceptual property: multiplying all pixels by a constant (no
    clipping) preserves every block-vs-global mean comparison, so the
    hash is brightness-scaling invariant. Guards the integer
    cross-multiplication rule S_b*C > S*c_b."""
    from cityfinder_spark.codecs.fakeimage import gen_pixels, phash64

    w, h = 8 * size, 8 + size
    pix = (gen_pixels(seed, w, h) % 32).astype(np.uint8)  # headroom for x scale
    assert phash64(pix) == phash64((pix.astype(np.int64) * scale).astype(np.uint8))


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=200),
    st.floats(0.01, 1.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_type1_percentile_definition_equals_sorted_index(values, p):
    """'Smallest value whose cumulative count reaches ceil(p*N)' (the
    count-by-value plan) must equal sorted[ceil(p*N) - 1] (the naive
    global sort) for every multiset and p."""
    import math

    s = sorted(values)
    need = math.ceil(p * len(s))
    naive = s[need - 1]
    cum, by_count = 0, None
    for v in sorted(set(s)):
        cum += s.count(v)
        if cum >= need:
            by_count = v
            break
    assert by_count == naive


@given(
    st.floats(-89.9, 89.9),
    st.floats(-179.9, 179.9),
    st.floats(0.01, 30.0),
    st.floats(0.01, 30.0),
    st.floats(-89.9, 89.9),
    st.floats(-179.9, 179.9),
    st.integers(3, 8),
)
@settings(max_examples=300, deadline=None)
def test_box_cover_never_misses_inside_point(
    lat0, lon0, dlat, dlon, plat, plon, level
):
    """NumPy mirror of range_join.box_cover's walk: any point inside
    the box (including antimeridian wrap) must land in a covered cell.
    Guards the endpoint-modding bug class (lon_max=180 collapse)."""
    lat_min, lat_max = max(-90.0, lat0), min(90.0, lat0 + dlat)
    lon_min = ((lon0 + 540.0) % 360.0) - 180.0
    lon_max = ((lon0 + dlon + 540.0) % 360.0) - 180.0
    inside_lat = lat_min <= plat <= lat_max
    wrap = lon_min > lon_max
    inside_lon = (
        (plon >= lon_min or plon <= lon_max)
        if wrap
        else (lon_min <= plon <= lon_max)
    )
    if not (inside_lat and inside_lon):
        return
    nlat, nlon = grid_dims(level)

    def band(lat):
        return min(nlat - 1, max(0, int(np.floor((lat + 90.0) / 180.0 * nlat))))

    def lcolraw(lon):
        return int(np.floor((lon + 180.0) / 360.0 * nlon))

    i0, i1 = band(lat_min), band(lat_max)
    j0, j1 = lcolraw(lon_min), lcolraw(lon_max)
    if wrap:
        j1 += nlon
    j1 = min(j1, j0 + nlon - 1)
    cover = {
        (i, j % nlon) for i in range(i0, i1 + 1) for j in range(j0, j1 + 1)
    }
    pc = int(cell_of_np(np.array([plat]), np.array([plon]), level)[0])
    _, pi, pj = decode_cell_np(np.array([pc]))
    assert (int(pi[0]), int(pj[0])) in cover
