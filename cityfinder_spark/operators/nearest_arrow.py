"""Nearest-city kNN as a single-pass Arrow-vectorized operator.

Same semantics as operators.nearest.nearest_city_join (the reference's
ClosestEdgeQuery lookup, lib/finder/coordinates/s2.go:52-75, as a
distributed operator) but a different physical strategy, built for the
10^12-row scale path:

  * the static city index (cell cover + coordinate arrays) is built
    driver-side from the broadcast-size cities DataFrame and shipped to
    each Python worker ONCE via SparkContext.broadcast — the exact
    Spark analog of the reference's process-wide ShapeIndex;
  * the fact side flows through ONE mapInPandas pass: Arrow batches
    in, NumPy-vectorized cell assignment -> ragged candidate gather ->
    segment argmin (rounded-distance-then-city_id tie-break) -> exact
    full-scan refinement for rows whose ring result is not provably
    global (certainty_radius_np) — all inside the same batch, so there
    is NO shuffle, NO second pass, NO broadcast nested-loop join;
  * ~40M haversines/s/core in NumPy vs ~1M/s/core for the interpreted
    higher-order-function argmin of the JVM strategy (Spark evaluates
    lambda expressions outside whole-stage codegen).

Why not the JVM broadcast join for this? Catalyst's BroadcastHashJoin
+ aggregate is codegen'd, but the per-point argmin over a candidate
ARRAY is a lambda expression (interpreted, row-at-a-time, allocating),
and the escalation cross join is a BroadcastNestedLoopJoin — both
measured 10-40x slower at sf0.1. The relational plan is kept available
as nearest.nearest_city_join(strategy="jvm") for plan-level tests.

Output rows = global argmin exactly (ties by rounded dist then
city_id); empty cities dimension -> NULL city columns (maps the
reference's "no city found" error, s2.go:61-63).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cityfinder_spark.geo.cells import (
    cell_of_np,
    certainty_radius_np,
    grid_dims,
)
from cityfinder_spark.geo.distance import haversine_np
from cityfinder_spark.sqlcompat import LEVEL_STRIDE, ROUND_DIGITS
from cityfinder_spark.workerenv import tune_malloc

_CHUNK = 1 << 22  # max elements per dense escalation chunk

# per-process allocator tuning (shared with the similarity kernels)
_tune_malloc = tune_malloc


def _round_np(d: np.ndarray, digits: int) -> np.ndarray:
    scale = 10.0 ** digits
    return np.floor(d * scale + 0.5) / scale


# ---- chord-distance prefilter ----
# Great-circle distance is strictly monotone in 3D chord length
# (chord = 2 sin(d/2R), d in [0, pi*R]), so chord^2 — three mults and
# two adds per pair, no trig — can (1) find the argmin-by-true-distance
# candidate and (2) prune every candidate that cannot tie the rounded
# minimum, before the rounded-haversine kernel runs. The exact kernel
# then touches only the near-disc survivors instead of the whole
# latitude band / dense scan (escalated rows were ~95% of kernel time).


def _dot_pairs(
    index: CityIndex,
    px: np.ndarray,
    py: np.ndarray,
    pz: np.ndarray,
    flat: np.ndarray,
) -> np.ndarray:
    """Raw unit-vector dot products between per-PAIR point components
    (px/py/pz, already expanded by the caller — np.repeat over segment
    counts is a sequential fill, ~2x faster than a random fancy-gather
    per component) and city[flat] vectors. The dot-space prefilters
    consume this directly (chord^2 = 2 - 2*dot, monotone decreasing)."""
    dot = np.take(index.ux, flat)
    dot *= px
    t = np.take(index.uy, flat)
    t *= py
    dot += t
    t = np.take(index.uz, flat)
    t *= pz
    dot += t
    return dot


def _chord_sq_pairs(
    index: CityIndex,
    px: np.ndarray,
    py: np.ndarray,
    pz: np.ndarray,
    flat: np.ndarray,
) -> np.ndarray:
    """chord^2 for per-pair point/city unit vectors (see _dot_pairs)."""
    dot = _dot_pairs(index, px, py, pz, flat)
    np.clip(dot, -1.0, 1.0, out=dot)
    dot *= -2.0
    dot += 2.0
    return dot


# The float32 prefilter's error budget, in km, covering BOTH sides of
# the comparison: storing unit vectors at float32 loses <= ~0.8 m of
# position per endpoint (6371 km x sqrt(3) x 2^-24), and the
# squared-DIFFERENCE chord form keeps full relative precision on the
# small differences (unlike 2 - 2*dot, which cancels catastrophically
# below ~20 km) — total bound ~2-3 m; 10 m is a 3x guard. Widening the
# prefilter margin by this can only ADD survivors, and every survivor
# is re-measured by the exact float64 rounded haversine, so outputs
# are bit-identical to the float64 prefilter (parity-pinned) while the
# per-candidate gather traffic halves (measured 1.8x on the 32-worker
# prefilter microbenchmark — the bandwidth-bound regime BASELINE.md's
# 8->32 step identified).
F32_PREFILTER_SLACK_KM = 0.01


def _chord_sq_pairs_f32(
    index: CityIndex,
    px32: np.ndarray,
    py32: np.ndarray,
    pz32: np.ndarray,
    flat: np.ndarray,
) -> np.ndarray:
    """float32 squared-difference chord^2 between per-pair point
    components and city[flat] float32 unit vectors — half the memory
    traffic of the float64 dot form on the gather-dominated hot loop.
    MUST be consumed with margins widened by F32_PREFILTER_SLACK_KM
    (see above); never use the value as a distance."""
    dx = np.take(index.ux32, flat)
    dx -= px32
    dx *= dx
    t = np.take(index.uy32, flat)
    t -= py32
    t *= t
    dx += t
    t = np.take(index.uz32, flat)
    t -= pz32
    t *= t
    dx += t
    return dx


def _chord_sq_to_km(c2: np.ndarray) -> np.ndarray:
    """Exact great-circle km for a chord^2 (used per-SEGMENT on the
    minima only, never per pair)."""
    from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM

    half = np.sqrt(np.maximum(c2, 0.0)) * 0.5
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.minimum(half, 1.0))


def _km_to_chord_sq_bound(margin_km: np.ndarray) -> np.ndarray:
    """chord^2 upper bound for 'true distance <= margin_km', inclusive
    with a relative guard against sin/asin roundtrip ulps. Margins at or
    beyond the antipode keep everything (bound 4)."""
    from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM

    half_angle = margin_km / (2.0 * EARTH_RADIUS_KM)
    t = 2.0 * np.sin(np.minimum(half_angle, np.pi / 2.0))
    t2 = t * t * (1.0 + 1e-12) + 1e-30
    return np.where(half_angle >= np.pi / 2.0, 4.000001, t2)


def _hav_pairs_rounded(
    index: CityIndex,
    rad_lat: np.ndarray,
    rad_lon: np.ndarray,
    cos_lat: np.ndarray,
    pt_rep: np.ndarray,
    flat: np.ndarray,
    digits: int,
) -> np.ndarray:
    """Rounded haversine for (point[pt_rep], city[flat]) pairs using the
    index's precomputed radians/cos and in-place ops — ~2x less memory
    traffic than the generic kernel (the hot loop is bandwidth-bound at
    high core counts). Differs from haversine_np only by ulps
    (radians(a)-radians(b) vs radians(a-b)); both sides of every
    comparison round to ROUND_DIGITS first."""
    from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM

    s1 = index.rad_lat[flat]
    s1 -= rad_lat[pt_rep]          # fancy-index result is a fresh array
    s1 *= 0.5
    np.sin(s1, out=s1)
    s1 *= s1
    s2 = index.rad_lon[flat]
    s2 -= rad_lon[pt_rep]
    s2 *= 0.5
    np.sin(s2, out=s2)
    s2 *= s2
    s2 *= index.cos_lat[flat]
    s2 *= cos_lat[pt_rep]
    s1 += s2                       # a = sin^2(dphi/2) + cos*cos*sin^2(dlmb/2)
    np.subtract(1.0, s1, out=s2)
    np.maximum(s2, 0.0, out=s2)
    np.sqrt(s2, out=s2)
    np.sqrt(s1, out=s1)
    np.arctan2(s1, s2, out=s1)
    s1 *= 2.0 * EARTH_RADIUS_KM
    scale = 10.0 ** digits
    s1 *= scale
    s1 += 0.5
    np.floor(s1, out=s1)
    s1 /= scale
    return s1


def _csr_cover(
    lat: np.ndarray, lon: np.ndarray, level: int, ring: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ring-expanded cell cover as CSR: (unique cells, offsets, flat
    candidate positions). Candidate lists ascend in position (== in
    city_id once cities are sorted) -> np first-min == reference
    tie-break."""
    n = len(lat)
    nlat, nlon = grid_dims(level)
    base = cell_of_np(lat, lon, level)
    rem = base - level * LEVEL_STRIDE
    ci, cj = rem // nlon, rem % nlon
    cells_parts, idx_parts = [], []
    pos = np.arange(n, dtype=np.int64)
    for di in range(-ring, ring + 1):
        ii = ci + di
        keep = (ii >= 0) & (ii < nlat)
        for dj in range(-ring, ring + 1):
            jj = (cj + dj) % nlon
            cells_parts.append(level * LEVEL_STRIDE + ii[keep] * nlon + jj[keep])
            idx_parts.append(pos[keep])
    cells = np.concatenate(cells_parts)
    idx = np.concatenate(idx_parts)
    order = np.lexsort((idx, cells))
    cells, idx = cells[order], idx[order]
    ucells, starts = np.unique(cells, return_index=True)
    return ucells, np.append(starts, len(cells)).astype(np.int64), idx


def _csr_slices(
    ucells: np.ndarray, offsets: np.ndarray, cells: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(starts, counts) per query cell against a CSR cover."""
    if not len(ucells):
        z = np.zeros(len(cells), np.int64)
        return z, z
    pos = np.searchsorted(ucells, cells)
    pos_c = np.minimum(pos, len(ucells) - 1)
    found = (pos < len(ucells)) & (ucells[pos_c] == cells)
    starts = np.where(found, offsets[pos_c], 0)
    counts = np.where(found, offsets[pos_c + 1] - starts, 0)
    return starts.astype(np.int64), counts.astype(np.int64)


class CityIndex:
    """Driver-built static index: city arrays (sorted by city_id) plus
    a CSR-style cell cover (unique cell ids -> slices of candidate city
    positions). Pickles compactly; one copy per Python worker.

    With max_per_cell set, cover cells whose candidate list exceeds it
    ("dense urban cells", the north rule's skew source) are re-covered
    at level+fine_delta with ring*2**fine_delta (same physical
    guarantee radius, tighter neighborhoods -> bounded per-row compute
    skew). The certainty radius depends only on ring*cell_size, which
    the split preserves, so the proof logic is level-independent."""

    def __init__(
        self,
        city_id: np.ndarray,
        lat: np.ndarray,
        lon: np.ndarray,
        name: np.ndarray,
        country: np.ndarray,
        level: int,
        ring: int,
        max_per_cell: int | None = None,
        fine_delta: int = 2,
        use_f32_prefilter: bool = True,
    ):
        # travels with the pickle so the worker-side kernel sees it
        self.use_f32_prefilter = use_f32_prefilter
        order = np.argsort(city_id, kind="stable")
        self.city_id = city_id[order]
        self.lat = lat[order]
        self.lon = lon[order]
        self.name = name[order]
        self.country = country[order]
        self.level = level
        self.ring = ring
        self.fine_level = level + fine_delta
        self.hot_cells = np.empty(0, np.int64)
        self.fine_cells = np.empty(0, np.int64)
        self.fine_offsets = np.zeros(1, np.int64)
        n = len(self.city_id)
        # lat-sorted view for the escalation window prune: any city
        # within rounded distance d of a point lies within d/KM_PER_DEG
        # degrees of latitude (meridian arc is a great-circle lower
        # bound), so the exact refinement scans a searchsorted slice
        # instead of every city.
        self.lat_order = np.argsort(self.lat, kind="stable").astype(np.int64)
        self.lat_sorted = self.lat[self.lat_order]
        # precomputed radians/cos: halves the per-candidate transcendental
        # count and memory traffic of the hot haversine kernel
        self.rad_lat = np.radians(self.lat)
        self.rad_lon = np.radians(self.lon)
        self.cos_lat = np.cos(self.rad_lat)
        # unit vectors for the chord^2 prefilter (no trig per pair);
        # float32 twins serve the bandwidth-bound in-ring prefilter
        # (margins widened by F32_PREFILTER_SLACK_KM keep it exact)
        self.ux = self.cos_lat * np.cos(self.rad_lon)
        self.uy = self.cos_lat * np.sin(self.rad_lon)
        self.uz = np.sin(self.rad_lat)
        self.ux32 = self.ux.astype(np.float32)
        self.uy32 = self.uy.astype(np.float32)
        self.uz32 = self.uz.astype(np.float32)
        if n == 0:
            self.cover_cells = np.empty(0, np.int64)
            self.cover_offsets = np.zeros(1, np.int64)
            self.cover_idx = np.empty(0, np.int64)
            return
        self.cover_cells, self.cover_offsets, self.cover_idx = _csr_cover(
            self.lat, self.lon, level, ring
        )
        if max_per_cell is None:
            return
        counts = np.diff(self.cover_offsets)
        self.hot_cells = self.cover_cells[counts > max_per_cell]
        if not len(self.hot_cells):
            return
        fine_ring = ring * (1 << fine_delta)
        fcells, foffsets, fidx = _csr_cover(
            self.lat, self.lon, self.fine_level, fine_ring
        )
        # keep only fine cells whose parent base cell is hot
        _, nlon_f = grid_dims(self.fine_level)
        _, nlon_b = grid_dims(level)
        rem = fcells - self.fine_level * LEVEL_STRIDE
        fi, fj = rem // nlon_f, rem % nlon_f
        parent = (
            level * LEVEL_STRIDE
            + (fi >> fine_delta) * nlon_b
            + (fj >> fine_delta)
        )
        keep = np.isin(parent, self.hot_cells)
        fcounts = np.diff(foffsets)[keep]
        kept_starts = foffsets[:-1][keep]
        total = int(fcounts.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(fcounts) - fcounts, fcounts
        )
        self.fine_cells = fcells[keep]
        self.fine_offsets = (
            np.append(np.cumsum(fcounts) - fcounts, total).astype(np.int64)
            + len(self.cover_idx)
        )
        fine_idx = fidx[np.repeat(kept_starts, fcounts) + within]
        self.cover_idx = np.concatenate([self.cover_idx, fine_idx])

    def xyz(self) -> np.ndarray:
        """(n,3) unit-vector matrix for the dense blind-scan matmul —
        built lazily per process (sole consumer is the rare no-in-ring
        path) so the broadcast pickle carries only the 3 components."""
        m = getattr(self, "_xyz", None)
        if m is None:
            m = np.column_stack([self.ux, self.uy, self.uz])
            self._xyz = m
        return m

    def lookup(self, lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(starts, counts) slices into cover_idx per point, routing
        points in hot base cells to the fine cover."""
        cells = cell_of_np(lat, lon, self.level)
        starts, counts = _csr_slices(self.cover_cells, self.cover_offsets, cells)
        if len(self.hot_cells):
            pos = np.searchsorted(self.hot_cells, cells)
            pos_c = np.minimum(pos, len(self.hot_cells) - 1)
            hot = (pos < len(self.hot_cells)) & (self.hot_cells[pos_c] == cells)
            if hot.any():
                fcells = cell_of_np(lat[hot], lon[hot], self.fine_level)
                fs, fc = _csr_slices(self.fine_cells, self.fine_offsets, fcells)
                starts[hot] = fs
                counts[hot] = fc
        return starts, counts


# driver-side build-once cache — the Spark analog of the reference's
# gob-serialized index reuse (initializer.go:198-213: build if missing,
# else load). Keyed by a caller-supplied identity for the cities
# dimension (e.g. its source path) + the build knobs; callers own key
# correctness (a stale key for changed data returns the stale index).
_INDEX_CACHE: dict[tuple, CityIndex] = {}


def _index_broadcast(spark, full_key: tuple | None, index: CityIndex):
    """Broadcast the index once per context per key (bcast.memo_broadcast):
    a stable broadcast id lets reused Python workers keep the unpickled
    index across queries instead of re-fetching a fresh broadcast every
    invocation (the per-call broadcast was measured as multi-second
    serial fetch at 32 workers for multi-MB indexes)."""
    from cityfinder_spark.bcast import memo_broadcast

    key = None if full_key is None else ("cityidx-bc", *full_key)
    return memo_broadcast(spark, key, lambda: index)[1]


def build_city_index(
    cities: DataFrame,
    level: int,
    ring: int,
    max_per_cell: int | None = None,
    fine_delta: int = 2,
) -> CityIndex:
    cols = set(cities.columns)
    pdf = cities.select(
        "city_id",
        "lat",
        "lon",
        *(c for c in ("name", "country") if c in cols),
    ).toPandas()
    n = len(pdf)
    name = (
        pdf["name"].to_numpy(object) if "name" in pdf else np.full(n, None, object)
    )
    country = (
        pdf["country"].to_numpy(object) if "country" in pdf else np.full(n, None, object)
    )
    return CityIndex(
        pdf["city_id"].to_numpy(np.int64),
        pdf["lat"].to_numpy(np.float64),
        pdf["lon"].to_numpy(np.float64),
        name,
        country,
        level,
        ring,
        max_per_cell=max_per_cell,
        fine_delta=fine_delta,
    )


def _solve_batch(
    index: CityIndex,
    lat: np.ndarray,
    lon: np.ndarray,
    digits: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(best_city_pos or -1, rounded dist) per point — exact global
    argmin with (rounded dist, city_id) tie-break."""
    npts = len(lat)
    best_pos = np.full(npts, -1, np.int64)
    best_d = np.full(npts, np.nan)
    ncities = len(index.city_id)
    if ncities == 0 or npts == 0:
        return best_pos, best_d

    p_rad_lat = np.radians(lat)
    p_rad_lon = np.radians(lon)
    p_cos = np.cos(p_rad_lat)
    p_ux = p_cos * np.cos(p_rad_lon)
    p_uy = p_cos * np.sin(p_rad_lon)
    p_uz = np.sin(p_rad_lat)
    slack = 10.0 ** (-digits)
    starts, counts = index.lookup(lat, lon)
    total = int(counts.sum())
    if total:
        seg_starts = np.cumsum(counts) - counts
        # cover positions: per pair, cover_idx[start_of_my_cell + my
        # offset]; built as ONE sequential repeat + arange + take so no
        # 27M-element fancy-gather chain materializes
        flat = np.take(
            index.cover_idx,
            np.repeat(starts - seg_starts, counts)
            + np.arange(total, dtype=np.int64),
        )
        has = counts > 0
        red_at = seg_starts[has]
        # chord prefilter, same proof as the refinement paths below:
        # the minimum chord is the true in-ring nearest, and only
        # candidates within (that distance + 2*round-step) can tie the
        # rounded minimum — so the transcendental kernel runs on the
        # near-disc survivors only (~50 ring candidates/point at the
        # default level, ~1-2 survivors).
        if getattr(index, "use_f32_prefilter", True):
            # float32 squared-difference form: half the gather traffic
            # (the hot loop is bandwidth-bound at 32 cores); margins
            # widen by the f32 error budget so the survivor set can
            # only GROW — every survivor is re-measured in float64, so
            # the output is identical (parity-pinned in tests)
            c2 = _chord_sq_pairs_f32(
                index,
                np.repeat(p_ux.astype(np.float32), counts),
                np.repeat(p_uy.astype(np.float32), counts),
                np.repeat(p_uz.astype(np.float32), counts),
                flat,
            )
            min_c2 = np.minimum.reduceat(c2, red_at).astype(np.float64)
            margin_km = (
                _chord_sq_to_km(min_c2)
                + 2.0 * slack
                + 2.0 * F32_PREFILTER_SLACK_KM
            )
            c2_bound_pt = np.full(npts, np.inf)
            c2_bound_pt[has] = _km_to_chord_sq_bound(margin_km)
            keep = c2 <= np.repeat(c2_bound_pt, counts)
        else:
            # float64 DOT space (chord^2 = 2 - 2*dot, monotone
            # decreasing): min chord == max dot, and only the
            # per-SEGMENT extrema pay the chord/km conversions
            dot = _dot_pairs(
                index,
                np.repeat(p_ux, counts),
                np.repeat(p_uy, counts),
                np.repeat(p_uz, counts),
                flat,
            )
            max_dot = np.maximum.reduceat(dot, red_at)
            min_c2 = 2.0 - 2.0 * np.minimum(max_dot, 1.0)
            margin_km = _chord_sq_to_km(min_c2) + 2.0 * slack
            # c2 <= bound  <=>  dot >= 1 - bound/2
            dot_bound_pt = np.full(npts, np.inf)
            dot_bound_pt[has] = 1.0 - 0.5 * _km_to_chord_sq_bound(margin_km)
            keep = dot >= np.repeat(dot_bound_pt, counts)
        counts2 = np.add.reduceat(keep, red_at, dtype=np.int64)
        seg2 = np.cumsum(counts2) - counts2
        sel = np.flatnonzero(keep)
        flat2 = np.take(flat, sel)
        pt2 = np.repeat(np.flatnonzero(has), counts2)
        d = _hav_pairs_rounded(index, p_rad_lat, p_rad_lon, p_cos, pt2, flat2, digits)
        minv = np.minimum.reduceat(d, seg2)
        is_min = d == np.repeat(minv, counts2)
        # tie-break: lowest city position (== lowest city_id, the same
        # rule as the refinement paths; cover lists ascend by position)
        cand_pos = np.where(is_min, flat2, np.iinfo(np.int64).max)
        best_pos[has] = np.minimum.reduceat(cand_pos, seg2)
        best_d[has] = minv

    # exact refinement where the ring result is not provably global
    cert = certainty_radius_np(lat, index.ring, index.level)
    esc = (best_pos < 0) | ~(best_d + slack < cert)

    # (a) rows with an in-ring best: the true nearest has rounded
    # distance <= best_d, hence |dlat| <= (best_d + round-step)/deg_km
    # — refine over the lat-window slice only (exact: any city outside
    # has a strictly larger rounded distance; equal-distance ties
    # outside the window are impossible since the window includes the
    # full <= best_d + step band). Within the window, the chord^2
    # prefilter shrinks the exact kernel to the near-disc: minimum
    # chord identifies the true-nearest pair, and only candidates whose
    # chord fits inside (that distance + 2*round-step) can tie the
    # rounded minimum.
    wb = np.flatnonzero(esc & (best_pos >= 0))
    if len(wb):
        from cityfinder_spark.geo.cells import KM_PER_DEG

        margin = (best_d[wb] + 2.0 * slack) / KM_PER_DEG
        lo = np.searchsorted(index.lat_sorted, lat[wb] - margin, side="left")
        hi = np.searchsorted(index.lat_sorted, lat[wb] + margin, side="right")
        counts = (hi - lo).astype(np.int64)
        have = counts > 0
        wbi = wb[have]
        counts = counts[have]
        if len(wbi):
            total = int(counts.sum())
            seg_starts = np.cumsum(counts) - counts
            flat = np.take(
                index.lat_order,
                np.repeat(lo[have] - seg_starts, counts)
                + np.arange(total, dtype=np.int64),
            )
            # per-component box prune BEFORE the 3-component chord dot:
            # any candidate within the (best_d + 2*round-step) disc has
            # every unit-vector component within the same chord length
            # of the point's — the lat band bounds uz, and ux/uy cut the
            # band's full longitude sweep down to the near arc. Each cut
            # is 4 array passes vs 8 for the chord, and the in-ring best
            # always survives (its distance fits the margin), so no
            # segment empties.
            cb = np.sqrt(_km_to_chord_sq_bound(best_d[wbi] + 2.0 * slack))
            for comp, pcomp in ((index.ux, p_ux), (index.uy, p_uy)):
                t = np.take(comp, flat)
                t -= np.repeat(pcomp[wbi], counts)
                np.abs(t, out=t)
                pre = t <= np.repeat(cb, counts)
                counts = np.add.reduceat(pre, seg_starts, dtype=np.int64)
                seg_starts = np.cumsum(counts) - counts
                flat = np.take(flat, np.flatnonzero(pre))
            c2 = _chord_sq_pairs(
                index,
                np.repeat(p_ux[wbi], counts),
                np.repeat(p_uy[wbi], counts),
                np.repeat(p_uz[wbi], counts),
                flat,
            )
            min_c2 = np.minimum.reduceat(c2, seg_starts)
            margin_km = _chord_sq_to_km(min_c2) + 2.0 * slack
            keep = c2 <= np.repeat(_km_to_chord_sq_bound(margin_km), counts)
            # the min-chord pair always survives its own margin, so
            # every segment keeps >= 1 candidate
            counts2 = np.add.reduceat(keep, seg_starts, dtype=np.int64)
            seg2 = np.cumsum(counts2) - counts2
            flat2 = np.take(flat, np.flatnonzero(keep))
            pt2 = np.repeat(wbi, counts2)
            d = _hav_pairs_rounded(
                index, p_rad_lat, p_rad_lon, p_cos, pt2, flat2, digits
            )
            minv = np.minimum.reduceat(d, seg2)
            is_min = d == np.repeat(minv, counts2)
            # tie-break: lowest city position (== lowest city_id)
            cand_pos = np.where(is_min, flat2, np.iinfo(np.int64).max)
            win_pos = np.minimum.reduceat(cand_pos, seg2)
            better = (minv < best_d[wbi]) | (
                (minv == best_d[wbi]) & (win_pos < best_pos[wbi])
            )
            best_pos[wbi[better]] = win_pos[better]
            best_d[wbi[better]] = minv[better]

    # (b) rows with NO in-ring candidate (empty polar/sparse
    # neighborhoods — rare): dense chord^2 scan via one BLAS matmul per
    # chunk (argmin-by-chord == argmin-by-true-distance), then the
    # rounded kernel on the per-row near-minimum survivors only.
    blind = np.flatnonzero(esc & (best_pos < 0))
    if len(blind):
        rows_per_chunk = max(1, _CHUNK // ncities)
        for s in range(0, len(blind), rows_per_chunk):
            sel = blind[s : s + rows_per_chunk]
            pxyz = np.column_stack([p_ux[sel], p_uy[sel], p_uz[sel]])
            c2m = pxyz @ index.xyz().T
            np.clip(c2m, -1.0, 1.0, out=c2m)
            c2m *= -2.0
            c2m += 2.0
            min_c2 = c2m.min(axis=1)
            margin_km = _chord_sq_to_km(min_c2) + 2.0 * slack
            mask = c2m <= _km_to_chord_sq_bound(margin_km)[:, None]
            rows_rep, flat = np.nonzero(mask)  # row-major: city pos ascends
            counts = mask.sum(axis=1)
            seg = np.cumsum(counts) - counts
            d = _hav_pairs_rounded(
                index, p_rad_lat, p_rad_lon, p_cos, sel[rows_rep], flat, digits
            )
            minv = np.minimum.reduceat(d, seg)
            is_min = d == np.repeat(minv, counts)
            cand_pos = np.where(is_min, flat, np.iinfo(np.int64).max)
            best_pos[sel] = np.minimum.reduceat(cand_pos, seg)
            best_d[sel] = minv
    return best_pos, best_d


def _topk_batch(
    index: CityIndex,
    lat: np.ndarray,
    lon: np.ndarray,
    k: int,
    digits: int,
    ring_only: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Top-k nearest per point. Returns (point_row, city_pos, dist,
    rank) flat arrays, rank 1..min(k, n_cities), ordered by (rounded
    dist, city_id) — same proof structure as k=1: a point's in-ring
    top-k is global iff it has k in-ring candidates and the k-th is
    inside the certainty radius; others take a dense exact pass."""
    npts = len(lat)
    ncities = len(index.city_id)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64))
    if ncities == 0 or npts == 0:
        return empty

    p_rad_lat = np.radians(lat)
    p_rad_lon = np.radians(lon)
    p_cos = np.cos(p_rad_lat)
    p_ux = p_cos * np.cos(p_rad_lon)
    p_uy = p_cos * np.sin(p_rad_lon)
    p_uz = np.sin(p_rad_lat)
    starts, counts = index.lookup(lat, lon)
    total = int(counts.sum())
    proven = np.zeros(npts, bool)
    kth_d = np.full(npts, np.inf)
    out_rows, out_pos, out_d, out_rank = [], [], [], []
    if total:
        seg_starts = np.cumsum(counts) - counts
        flat = np.take(
            index.cover_idx,
            np.repeat(starts - seg_starts, counts)
            + np.arange(total, dtype=np.int64),
        )
        has = counts > 0
        red_at = seg_starts[has]
        slack = 10.0 ** (-digits)
        if k <= 16:
            # k-th-chord prefilter, the top-k analog of _solve_batch's
            # ring prune: a conservative (tie-collapsed) k-th-largest
            # dot per segment lower-bounds the true k-th, so keeping
            # every candidate within (that distance + 2*round-step)
            # keeps the entire rounded top-k — the exact kernel and
            # the ranking lexsort then run on ~k survivors per point
            # instead of the full ring cover. Tie collapsing only
            # lowers the threshold (larger margin), never drops a
            # winner; segments with < k distinct values keep all.
            dot = _dot_pairs(
                index,
                np.repeat(p_ux, counts),
                np.repeat(p_uy, counts),
                np.repeat(p_uz, counts),
                flat,
            )
            work = dot.copy()
            kth_dot = np.full(npts, -np.inf)
            for _ in range(k):
                m = np.full(npts, -np.inf)
                m[has] = np.maximum.reduceat(work, red_at)
                live = np.isfinite(m)
                kth_dot = np.where(live, m, kth_dot)
                work = np.where(work == np.repeat(m, counts), -np.inf, work)
            kth_c2 = 2.0 - 2.0 * np.minimum(kth_dot, 1.0)
            margin_km = _chord_sq_to_km(kth_c2) + 2.0 * slack
            dot_bound = 1.0 - 0.5 * _km_to_chord_sq_bound(margin_km)
            keep = dot >= np.repeat(dot_bound, counts)
            counts = np.zeros(npts, np.int64)
            counts[has] = np.add.reduceat(keep, red_at, dtype=np.int64)
            seg_starts = np.cumsum(counts) - counts
            flat = np.take(flat, np.flatnonzero(keep))
            total = len(flat)
        pt_rep = np.repeat(np.arange(npts, dtype=np.int64), counts)
        d = _hav_pairs_rounded(index, p_rad_lat, p_rad_lon, p_cos, pt_rep, flat, digits)
        # survivors preserve cover-list order, so a stable 2-key sort
        # reproduces the (rounded dist, city_id) tie-break
        order = np.lexsort((np.arange(total, dtype=np.int64), d, pt_rep))
        d_s, flat_s, pt_s = d[order], flat[order], pt_rep[order]
        rank_within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, counts)
        cert = certainty_radius_np(lat, index.ring, index.level)
        has_k = counts >= k
        kth_idx = np.minimum(seg_starts + k - 1, np.maximum(seg_starts, seg_starts + counts - 1))
        kth_d = np.where(has_k, d_s[np.minimum(kth_idx, total - 1)], np.inf)
        proven = has_k & (kth_d + slack < cert)
        take = (rank_within < k) & proven[pt_s]
        out_rows.append(pt_s[take])
        out_pos.append(flat_s[take])
        out_d.append(d_s[take])
        out_rank.append(rank_within[take] + 1)

    # escalation: rows with an in-ring k-th distance get the lat-window
    # prune (every global top-k member has rounded d <= in-ring kth, so
    # |dlat| <= (kth + step)/deg_km); rows without k in-ring candidates
    # scan everything. Both paths share the ragged top-k selection.
    if ring_only:
        # build-time fast path (tile precomputation): emit only rows
        # whose ring top-k is PROVEN global; unproven rows get no
        # output instead of the exact escalation — far-from-city
        # centers would otherwise pay near-full scans for an answer
        # the caller treats as "ambiguous" anyway.
        esc = np.empty(0, np.int64)
    else:
        esc = np.flatnonzero(~proven)
    if len(esc):
        from cityfinder_spark.geo.cells import KM_PER_DEG

        slack = 10.0 ** (-digits)
        e_kth = kth_d[esc]
        windowed = np.isfinite(e_kth)
        e_lo = np.zeros(len(esc), np.int64)
        e_hi = np.full(len(esc), ncities, np.int64)
        if windowed.any():
            margin = (e_kth[windowed] + 2.0 * slack) / KM_PER_DEG
            e_lo[windowed] = np.searchsorted(
                index.lat_sorted, lat[esc[windowed]] - margin, side="left"
            )
            e_hi[windowed] = np.searchsorted(
                index.lat_sorted, lat[esc[windowed]] + margin, side="right"
            )
        e_counts = e_hi - e_lo
        keep = e_counts > 0
        esc, e_lo, e_counts, windowed = esc[keep], e_lo[keep], e_counts[keep], windowed[keep]
        etotal = int(e_counts.sum())
        if etotal:
            eseg = np.cumsum(e_counts) - e_counts
            ewithin = np.arange(etotal, dtype=np.int64) - np.repeat(eseg, e_counts)
            gather = np.repeat(e_lo, e_counts) + ewithin
            eflat = np.where(
                np.repeat(windowed, e_counts), index.lat_order[gather], gather
            )
            # per-component box prune for WINDOWED rows before the
            # 3-component chord (same proof as _solve_batch's windowed
            # path, with the in-ring k-th margin): the lat band bounds
            # uz but sweeps all longitudes; two 4-pass cuts on ux/uy
            # shrink it to the near arc. A pair inside the margin disc
            # has every |component delta| within the chord bound, so
            # the cuts only drop pairs the chord filter would drop —
            # and the in-ring k-th always survives, so no windowed
            # segment empties. Blind rows get an infinite bound (their
            # margin needs the dense chord pass below).
            cb = np.full(len(esc), np.inf)
            cb[windowed] = np.sqrt(
                _km_to_chord_sq_bound(kth_d[esc[windowed]] + 2.0 * slack)
            )
            for comp, pcomp in ((index.ux, p_ux), (index.uy, p_uy)):
                t = np.take(comp, eflat)
                t -= np.repeat(pcomp[esc], e_counts)
                np.abs(t, out=t)
                pre = t <= np.repeat(cb, e_counts)
                e_counts = np.add.reduceat(pre, eseg, dtype=np.int64)
                eseg = np.cumsum(e_counts) - e_counts
                eflat = np.take(eflat, np.flatnonzero(pre))
            ept = np.repeat(esc, e_counts)
            # chord^2 prefilter: only candidates whose chord fits the
            # per-row margin (in-ring kth for windowed rows; the k-th
            # smallest chord's distance for blind full scans) can enter
            # the global top-k — the exact kernel and the lexsort then
            # run on the survivors only.
            c2 = _chord_sq_pairs(
                index,
                np.repeat(p_ux[esc], e_counts),
                np.repeat(p_uy[esc], e_counts),
                np.repeat(p_uz[esc], e_counts),
                eflat,
            )
            margin_km = np.where(windowed, kth_d[esc] + 2.0 * slack, np.inf)
            blind_rows = np.flatnonzero(~windowed)
            if len(blind_rows):
                pair_blind = np.repeat(~windowed, e_counts)
                bc2 = c2[pair_blind]
                bpt = ept[pair_blind]
                bcounts = e_counts[blind_rows]
                bseg = np.cumsum(bcounts) - bcounts
                bo = np.lexsort((bc2, bpt))
                kth_idx = np.minimum(bseg + k - 1, bseg + bcounts - 1)
                kth_c2 = bc2[bo][kth_idx]
                enough = bcounts >= k
                margin_km[blind_rows[enough]] = (
                    _chord_sq_to_km(kth_c2[enough]) + 2.0 * slack
                )
            seg_rep = np.repeat(np.arange(len(esc), dtype=np.int64), e_counts)
            # inf margins fall into _km_to_chord_sq_bound's antipode
            # clamp (bound > 4 keeps every candidate)
            keep = c2 <= _km_to_chord_sq_bound(margin_km)[seg_rep]
            eflat2 = eflat[keep]
            ept2 = ept[keep]
            counts2 = np.bincount(seg_rep[keep], minlength=len(esc))
            seg2 = np.cumsum(counts2) - counts2
            ed = _hav_pairs_rounded(
                index, p_rad_lat, p_rad_lon, p_cos, ept2, eflat2, digits
            )
            o2 = np.lexsort((eflat2, ed, ept2))
            ed_s, eflat_s, ept_s = ed[o2], eflat2[o2], ept2[o2]
            erank = (
                np.arange(int(counts2.sum()), dtype=np.int64)
                - np.repeat(seg2, counts2)
            )
            tk = erank < k
            out_rows.append(ept_s[tk])
            out_pos.append(eflat_s[tk])
            out_d.append(ed_s[tk])
            out_rank.append(erank[tk] + 1)
    if not out_rows:
        return empty
    return (
        np.concatenate(out_rows),
        np.concatenate(out_pos),
        np.concatenate(out_d),
        np.concatenate(out_rank),
    )


def nearest_city_topk_arrow(
    points: DataFrame,
    cities: DataFrame,
    *,
    k: int = 3,
    level: int | None = None,
    ring: int = 1,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    digits: int = ROUND_DIGITS,
    n_cities: int | None = None,
    cache_key: tuple | None = None,
) -> DataFrame:
    """Top-k variant of nearest_city_join_arrow: one mapInPandas pass,
    output one row per (point, rank). Selects (id, lat, lon) only —
    top-k is a fan-out, payload columns should be re-attached by id."""
    from cityfinder_spark.operators.nearest import choose_level

    # same key shape as the k=1 path: both build build_city_index(
    # cities, level, ring) with no cell-split knobs, so one cached
    # index serves nearest_city_join_arrow AND the top-k variant
    req_level = level  # unresolved form keys the shared index memo
    full_key = None if cache_key is None else (*cache_key, req_level, ring, None, 2)
    index = _INDEX_CACHE.get(full_key) if full_key is not None else None
    if index is None:
        if level is None:
            n = n_cities if n_cities is not None else cities.count()
            level = choose_level(n, ring)
        index = build_city_index(cities, level, ring)
        if full_key is not None:
            _INDEX_CACHE[full_key] = index

    spark = points.sparkSession
    index_bc = _index_broadcast(spark, full_key, index)
    slim = points.select(id_col, lat_col, lon_col)

    out_schema = T.StructType(
        [slim.schema[id_col]]
        + [
            T.StructField("city_id", T.LongType()),
            T.StructField("dist_km", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        index = index_bc.value
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(np.float64)
            lon = pdf[lon_col].to_numpy(np.float64)
            rows, pos, d, rank = _topk_batch(index, lat, lon, k, digits)
            out = pdf.iloc[rows][[id_col]].reset_index(drop=True)
            out["city_id"] = index.city_id[pos]
            out["dist_km"] = d
            out["rank"] = rank.astype(np.int32)
            yield out

    # primitives-only through Arrow (same shape as the k=1 path): the
    # top-k fan-out is k x |points| rows, and emitting name/country as
    # Python strings per output row dominated the kernel; the string
    # payload re-attaches via a JVM broadcast hash join on city_id.
    cols = set(cities.columns)
    payload = F.broadcast(
        cities.select(
            F.col("city_id").cast("long").alias("city_id"),
            (F.col("name") if "name" in cols else F.lit(None).cast("string")).alias(
                "name"
            ),
            (
                F.col("country") if "country" in cols else F.lit(None).cast("string")
            ).alias("country"),
        )
    )
    return (
        slim.mapInPandas(solve, out_schema)
        .join(payload, "city_id", "left")
        .select(id_col, "city_id", "name", "country", "dist_km", "rank")
    )


def nearest_city_join_arrow(
    points: DataFrame,
    cities: DataFrame,
    *,
    level: int | None = None,
    ring: int = 1,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    digits: int = ROUND_DIGITS,
    n_cities: int | None = None,
    max_per_cell: int | None = None,
    fine_delta: int = 2,
    city_index: CityIndex | None = None,
    cache_key: tuple | None = None,
) -> DataFrame:
    """points + (city_id, name, country, dist_km) of the global nearest
    city — one mapInPandas pass, zero shuffle. See module docstring.
    max_per_cell enables adaptive cell splitting (see CityIndex).

    Pass a prebuilt city_index — or a cache_key naming the cities
    dimension's identity — to amortize the driver-side index build
    across queries: the Spark analog of the reference's build-once
    gob-cached index (initializer.go:198-213)."""
    full_key = (
        None
        if cache_key is None
        else (*cache_key, level, ring, max_per_cell, fine_delta)
    )
    if city_index is None:
        from cityfinder_spark.operators.nearest import choose_level

        city_index = _INDEX_CACHE.get(full_key) if full_key is not None else None
        if city_index is None:
            if level is None:
                n = n_cities if n_cities is not None else cities.count()
                level = choose_level(n, ring)
            city_index = build_city_index(cities, level, ring, max_per_cell, fine_delta)
            if full_key is not None:
                _INDEX_CACHE[full_key] = city_index

    spark = points.sparkSession
    index_bc = _index_broadcast(spark, full_key, city_index)

    # SCALAR pandas UDF, not mapInPandas: ArrowEvalPython ships ONLY
    # the UDF's input columns (lat, lon) to the Python worker — image
    # bytes / captions stay JVM-side and are zipped back with the
    # result struct. With mapInPandas every payload byte crossed the
    # Arrow pipe twice, turning the join memory-bandwidth-bound
    # (measured: local[32] SLOWER than local[8] on 1M image rows).
    # The UDF returns only (city_id, dist_km) — primitives; the string
    # payload (name, country) is attached by a JVM broadcast hash join
    # so no Python string objects are ever created in the hot path.
    result_type = T.StructType(
        [
            T.StructField("city_id", T.LongType()),
            T.StructField("dist_km", T.DoubleType()),
        ]
    )

    @F.pandas_udf(result_type)
    def solve(lat_s: pd.Series, lon_s: pd.Series) -> pd.DataFrame:
        _tune_malloc()
        index = index_bc.value
        lat = lat_s.to_numpy(np.float64)
        lon = lon_s.to_numpy(np.float64)
        pos, d = _solve_batch(index, lat, lon, digits)
        hit = pos >= 0
        if hit.all() and len(pos):
            return pd.DataFrame({"city_id": index.city_id[pos], "dist_km": d})
        pc = np.maximum(pos, 0)
        cid = pd.Series(
            np.where(hit, index.city_id[pc] if len(index.city_id) else 0, 0),
            dtype="Int64",
        )
        cid[~hit] = pd.NA
        dk = pd.Series(d, dtype="Float64")
        dk[~hit] = pd.NA
        return pd.DataFrame({"city_id": cid, "dist_km": dk})

    cols = set(cities.columns)
    payload = F.broadcast(
        cities.select(
            F.col("city_id").cast("long").alias("city_id"),
            (F.col("name") if "name" in cols else F.lit(None).cast("string")).alias(
                "name"
            ),
            (
                F.col("country") if "country" in cols else F.lit(None).cast("string")
            ).alias("country"),
        )
    )
    res = F.col("__nearest")
    assigned = points.withColumn(
        "__nearest", solve(F.col(lat_col), F.col(lon_col))
    ).select(
        *points.columns,
        res["city_id"].alias("city_id"),
        res["dist_km"].alias("dist_km"),
    )
    return assigned.join(payload, "city_id", "left").select(
        *points.columns, "city_id", "name", "country", "dist_km"
    )


# ---- certain-tile precomputation: the raster->vector assignment map ----
# The north rule's tiling made executable: at a fine grid level, most
# cells lie strictly inside one city's (rounded-distance) Voronoi
# region — every possible point in such a cell provably resolves to the
# same city, so assignment is a pure JVM broadcast hash join + codegen
# haversine with NO Python in the path. Only boundary-ambiguous cells
# (and cells whose winner has a rounding-tie rival) fall through to the
# Arrow kernel. The proof per cell, from the top-2 at the cell CENTER:
#   d(p, X)  <= d1_true + r_cell          for every p in the cell
#   d(p, Y)  >= d2_true - r_cell          for every other city Y
# so d2_true - d1_true > 2*r_cell + slack makes X's rounded distance
# strictly smallest everywhere in the cell (no tie-break needed); with
# the kernel's ROUNDED top-2, d2r - d1r > 2*r_cell + 2*slack implies
# it. r_cell is the triangle-inequality bound on center->anywhere:
# a meridian arc of half the cell height plus a parallel arc of half
# the width at the cell's most-equatorial latitude. Duplicate or
# rounding-tied winners give d2r == d1r -> ambiguous -> kernel path
# (conservative, never wrong).

TILE_LEVEL = 9  # ~0.35 deg cells; ~2^19 cells, certain subset broadcast

_TILE_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
_TILE_DF_CACHE: dict[tuple, DataFrame] = {}


def build_tile_map(
    index: CityIndex,
    tile_level: int = TILE_LEVEL,
    digits: int = ROUND_DIGITS,
    chunk: int = 1 << 17,
) -> tuple[np.ndarray, np.ndarray]:
    """(cell_ids, city_pos) for every tile-level cell whose nearest
    city is provably unique in rounded distance for EVERY point in the
    cell (see module comment above for the margin proof)."""
    from cityfinder_spark.geo.cells import KM_PER_DEG

    nlat, nlon = grid_dims(tile_level)
    slack = 10.0 ** (-digits)
    half_lat = 90.0 / nlat
    half_lon = 180.0 / nlon
    total = nlat * nlon
    cells_out, pos_out = [], []
    for s in range(0, total, chunk):
        idxs = np.arange(s, min(s + chunk, total), dtype=np.int64)
        ii, jj = idxs // nlon, idxs % nlon
        clat = -90.0 + (ii + 0.5) * (180.0 / nlat)
        clon = -180.0 + (jj + 0.5) * (360.0 / nlon)
        rows, pos, d, rank = _topk_batch(index, clat, clon, 2, digits, ring_only=True)
        d1 = np.full(len(idxs), np.inf)
        p1 = np.full(len(idxs), -1, np.int64)
        d2 = np.full(len(idxs), np.inf)
        r1 = rank == 1
        d1[rows[r1]] = d[r1]
        p1[rows[r1]] = pos[r1]
        r2 = rank == 2
        d2[rows[r2]] = d[r2]
        # isolated-winner case (the GeoNames shape this path exists
        # for): k=2 unprovable in-ring because the runner-up is beyond
        # the certainty radius — but that IS a lower bound: a k=1-
        # proven center with no provable second place has d2_true >=
        # cert(center) (any in-ring runner-up that failed the proof
        # sits within 3*slack/2 of cert, hence the 2*slack guard).
        unproven = np.flatnonzero(p1 < 0)
        if len(unproven):
            rows1, pos1, dk1, _rank1 = _topk_batch(
                index, clat[unproven], clon[unproven], 1, digits, ring_only=True
            )
            hit = unproven[rows1]
            cert = certainty_radius_np(clat[hit], index.ring, index.level)
            d1[hit] = dk1
            p1[hit] = pos1
            d2[hit] = cert - 2.0 * slack
        lat_lo, lat_hi = clat - half_lat, clat + half_lat
        cosmax = np.maximum(
            np.cos(np.radians(lat_lo)), np.cos(np.radians(lat_hi))
        )
        cosmax = np.where((lat_lo < 0.0) & (lat_hi > 0.0), 1.0, cosmax)
        r_cell = KM_PER_DEG * (half_lat + half_lon * cosmax)
        with np.errstate(invalid="ignore"):  # inf - inf on unproven cells
            certain = (p1 >= 0) & (d2 - d1 > 2.0 * r_cell + 2.0 * slack)
        cells_out.append(tile_level * LEVEL_STRIDE + idxs[certain])
        pos_out.append(p1[certain])
    return np.concatenate(cells_out), np.concatenate(pos_out)


def _tile_df(spark, full_key, index: CityIndex, tile_level: int, digits: int):
    """Broadcastable (cell -> winner city) DataFrame, memoized per
    application + cities-dimension key like the index broadcast.
    `digits` is part of the key: the certainty margin depends on the
    rounding step, so a map certified at one step must never serve
    another."""
    ckey = None if full_key is None else (*full_key, "tiles", tile_level, digits)
    tiles = _TILE_CACHE.get(ckey) if ckey is not None else None
    if tiles is None:
        tiles = build_tile_map(index, tile_level, digits)
        if ckey is not None:
            _TILE_CACHE[ckey] = tiles
    cells, pos = tiles
    if not len(cells):
        return None
    # applicationId, not id(sc): object ids recycle across sessions and
    # would serve a DataFrame bound to a stopped context (same
    # convention as bcast.memo_broadcast / memo_table)
    dfkey = None if ckey is None else (spark.sparkContext.applicationId, *ckey)
    df = _TILE_DF_CACHE.get(dfkey) if dfkey is not None else None
    if df is None:
        pdf = pd.DataFrame(
            {
                "__tcell": cells,
                "__tcity": index.city_id[pos],
                "__tlat": index.lat[pos],
                "__tlon": index.lon[pos],
            }
        )
        df = spark.createDataFrame(pdf)
        if dfkey is not None:
            _TILE_DF_CACHE[dfkey] = df
    return df


def nearest_city_join_tiled(
    points: DataFrame,
    cities: DataFrame,
    *,
    level: int | None = None,
    ring: int = 1,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    digits: int = ROUND_DIGITS,
    n_cities: int | None = None,
    tile_level: int = TILE_LEVEL,
    cache_key: tuple | None = None,
) -> DataFrame:
    """nearest_city_join_arrow semantics with the certain-tile fast
    path: rows landing in a provably-single-winner cell are assigned
    by a JVM broadcast hash join + whole-stage-codegen haversine (zero
    Python); the ambiguous remainder flows through the Arrow kernel.
    Output is row-identical to the arrow strategy (parity-tested)."""
    from cityfinder_spark.geo.cells import cell_col
    from cityfinder_spark.geo.distance import haversine_rounded_col
    from cityfinder_spark.operators.nearest import choose_level

    req_level = level  # unresolved form keys the shared index memo
    full_key = None if cache_key is None else (*cache_key, req_level, ring, None, 2)
    index = _INDEX_CACHE.get(full_key) if full_key is not None else None
    if index is None:
        if level is None:
            n = n_cities if n_cities is not None else cities.count()
            level = choose_level(n, ring)
        index = build_city_index(cities, level, ring)
        if full_key is not None:
            _INDEX_CACHE[full_key] = index

    spark = points.sparkSession
    tiles = _tile_df(spark, full_key, index, tile_level, digits)
    if tiles is None:
        return nearest_city_join_arrow(
            points, cities, level=req_level, ring=ring, id_col=id_col,
            lat_col=lat_col, lon_col=lon_col, digits=digits,
            city_index=index, cache_key=cache_key,
        )

    j = points.withColumn(
        "__tcell", cell_col(F.col(lat_col), F.col(lon_col), tile_level)
    ).join(F.broadcast(tiles), "__tcell", "left")
    certain = (
        j.where(F.col("__tcity").isNotNull())
        .withColumn(
            "dist_km",
            haversine_rounded_col(
                F.col(lat_col), F.col(lon_col), F.col("__tlat"), F.col("__tlon"), digits
            ),
        )
        .select(
            *points.columns, F.col("__tcity").alias("city_id"), "dist_km"
        )
    )
    rest = j.where(F.col("__tcity").isNull()).select(*points.columns)
    rest_assigned = nearest_city_join_arrow(
        rest, cities, level=req_level, ring=ring, id_col=id_col,
        lat_col=lat_col, lon_col=lon_col, digits=digits,
        city_index=index, cache_key=cache_key,
    ).select(*points.columns, "city_id", "dist_km")
    assigned = certain.unionByName(rest_assigned)

    cols = set(cities.columns)
    payload = F.broadcast(
        cities.select(
            F.col("city_id").cast("long").alias("city_id"),
            (F.col("name") if "name" in cols else F.lit(None).cast("string")).alias(
                "name"
            ),
            (
                F.col("country") if "country" in cols else F.lit(None).cast("string")
            ).alias("country"),
        )
    )
    return assigned.join(payload, "city_id", "left").select(
        *points.columns, "city_id", "name", "country", "dist_km"
    )
