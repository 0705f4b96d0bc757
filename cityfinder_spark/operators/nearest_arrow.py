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
from pyspark.sql import DataFrame, types as T

from cityfinder_spark.geo.cells import (
    cell_of_np,
    certainty_radius_np,
    grid_dims,
)
from cityfinder_spark.geo.distance import haversine_np
from cityfinder_spark.sqlcompat import LEVEL_STRIDE, ROUND_DIGITS

_CHUNK = 1 << 22  # max elements per dense escalation chunk


def _round_np(d: np.ndarray, digits: int) -> np.ndarray:
    scale = 10.0 ** digits
    return np.floor(d * scale + 0.5) / scale


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
    ):
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

    starts, counts = index.lookup(lat, lon)
    total = int(counts.sum())
    if total:
        seg_starts = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, counts)
        flat = index.cover_idx[np.repeat(starts, counts) + within]
        pt_rep = np.repeat(np.arange(npts, dtype=np.int64), counts)
        d = _round_np(
            haversine_np(lat[pt_rep], lon[pt_rep], index.lat[flat], index.lon[flat]),
            digits,
        )
        has = counts > 0
        red_at = seg_starts[has]
        minv = np.minimum.reduceat(d, red_at)
        # first (== lowest city_id, cover lists ascend) position hitting
        # the segment min
        min_rep = np.empty(npts)
        min_rep[has] = minv
        is_min = d == np.repeat(min_rep, counts)
        gpos = np.where(is_min, np.arange(total, dtype=np.int64), total)
        first = np.minimum.reduceat(gpos, red_at)
        best_pos[has] = flat[first]
        best_d[has] = minv

    # exact refinement where the ring result is not provably global
    cert = certainty_radius_np(lat, index.ring, index.level)
    slack = 10.0 ** (-digits)
    esc = (best_pos < 0) | ~(best_d + slack < cert)
    if esc.any():
        ei = np.flatnonzero(esc)
        rows_per_chunk = max(1, _CHUNK // ncities)
        for s in range(0, len(ei), rows_per_chunk):
            sel = ei[s : s + rows_per_chunk]
            dm = _round_np(
                haversine_np(
                    lat[sel][:, None], lon[sel][:, None],
                    index.lat[None, :], index.lon[None, :],
                ),
                digits,
            )
            am = np.argmin(dm, axis=1)  # first min == lowest city_id
            best_pos[sel] = am
            best_d[sel] = dm[np.arange(len(sel)), am]
    return best_pos, best_d


def _topk_batch(
    index: CityIndex,
    lat: np.ndarray,
    lon: np.ndarray,
    k: int,
    digits: int,
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

    starts, counts = index.lookup(lat, lon)
    total = int(counts.sum())
    proven = np.zeros(npts, bool)
    out_rows, out_pos, out_d, out_rank = [], [], [], []
    if total:
        seg_starts = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, counts)
        flat = index.cover_idx[np.repeat(starts, counts) + within]
        pt_rep = np.repeat(np.arange(npts, dtype=np.int64), counts)
        d = _round_np(
            haversine_np(lat[pt_rep], lon[pt_rep], index.lat[flat], index.lon[flat]),
            digits,
        )
        order = np.lexsort((within, d, pt_rep))
        d_s, flat_s, pt_s = d[order], flat[order], pt_rep[order]
        rank_within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, counts)
        cert = certainty_radius_np(lat, index.ring, index.level)
        slack = 10.0 ** (-digits)
        has_k = counts >= k
        kth_idx = np.minimum(seg_starts + k - 1, np.maximum(seg_starts, seg_starts + counts - 1))
        kth_d = np.where(has_k, d_s[np.minimum(kth_idx, total - 1)], np.inf)
        proven = has_k & (kth_d + slack < cert)
        take = (rank_within < k) & proven[pt_s]
        out_rows.append(pt_s[take])
        out_pos.append(flat_s[take])
        out_d.append(d_s[take])
        out_rank.append(rank_within[take] + 1)

    esc = np.flatnonzero(~proven)
    if len(esc):
        kk = min(k, ncities)
        rows_per_chunk = max(1, _CHUNK // ncities)
        for s in range(0, len(esc), rows_per_chunk):
            sel = esc[s : s + rows_per_chunk]
            m = len(sel)
            dm = _round_np(
                haversine_np(
                    lat[sel][:, None], lon[sel][:, None],
                    index.lat[None, :], index.lon[None, :],
                ),
                digits,
            )
            if ncities > kk:
                part = np.argpartition(dm, kk - 1, axis=1)[:, :kk]
            else:
                part = np.broadcast_to(np.arange(ncities), (m, ncities)).copy()
            part_d = np.take_along_axis(dm, part, axis=1)
            rows_rep = np.repeat(np.arange(m, dtype=np.int64), kk)
            o2 = np.lexsort((part.ravel(), part_d.ravel(), rows_rep))
            out_rows.append(sel[rows_rep[o2]])
            out_pos.append(part.ravel()[o2])
            out_d.append(part_d.ravel()[o2])
            out_rank.append(np.tile(np.arange(1, kk + 1, dtype=np.int64), m))
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
) -> DataFrame:
    """Top-k variant of nearest_city_join_arrow: one mapInPandas pass,
    output one row per (point, rank). Selects (id, lat, lon) only —
    top-k is a fan-out, payload columns should be re-attached by id."""
    from cityfinder_spark.operators.nearest import choose_level

    if level is None:
        n = n_cities if n_cities is not None else cities.count()
        level = choose_level(n, ring)

    spark = points.sparkSession
    index_bc = spark.sparkContext.broadcast(build_city_index(cities, level, ring))
    slim = points.select(id_col, lat_col, lon_col)

    out_schema = T.StructType(
        [slim.schema[id_col]]
        + [
            T.StructField("city_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("country", T.StringType()),
            T.StructField("dist_km", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = index_bc.value
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(np.float64)
            lon = pdf[lon_col].to_numpy(np.float64)
            rows, pos, d, rank = _topk_batch(index, lat, lon, k, digits)
            out = pdf.iloc[rows][[id_col]].reset_index(drop=True)
            out["city_id"] = index.city_id[pos]
            out["name"] = index.name[pos]
            out["country"] = index.country[pos]
            out["dist_km"] = d
            out["rank"] = rank.astype(np.int32)
            yield out

    return slim.mapInPandas(solve, out_schema)


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
) -> DataFrame:
    """points + (city_id, name, country, dist_km) of the global nearest
    city — one mapInPandas pass, zero shuffle. See module docstring.
    max_per_cell enables adaptive cell splitting (see CityIndex)."""
    from cityfinder_spark.operators.nearest import choose_level

    if level is None:
        n = n_cities if n_cities is not None else cities.count()
        level = choose_level(n, ring)

    spark = points.sparkSession
    index_bc = spark.sparkContext.broadcast(
        build_city_index(cities, level, ring, max_per_cell, fine_delta)
    )

    out_schema = T.StructType(
        list(points.schema.fields)
        + [
            T.StructField("city_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("country", T.StringType()),
            T.StructField("dist_km", T.DoubleType()),
        ]
    )

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = index_bc.value
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(np.float64)
            lon = pdf[lon_col].to_numpy(np.float64)
            pos, d = _solve_batch(index, lat, lon, digits)
            hit = pos >= 0
            out = pdf.copy()
            if hit.all() and len(pos):
                out["city_id"] = index.city_id[pos]
                out["name"] = index.name[pos]
                out["country"] = index.country[pos]
                out["dist_km"] = d
            elif len(index.city_id) == 0:
                out["city_id"] = pd.Series(pd.NA, dtype="Int64", index=out.index)
                out["name"] = pd.Series(None, dtype=object, index=out.index)
                out["country"] = pd.Series(None, dtype=object, index=out.index)
                out["dist_km"] = pd.Series(pd.NA, dtype="Float64", index=out.index)
            else:
                pc = np.maximum(pos, 0)
                cid = pd.Series(
                    np.where(hit, index.city_id[pc], 0), dtype="Int64", index=out.index
                )
                cid[~hit] = pd.NA
                out["city_id"] = cid
                out["name"] = np.where(hit, index.name[pc], None)
                out["country"] = np.where(hit, index.country[pc], None)
                dk = pd.Series(d, dtype="Float64", index=out.index)
                dk[~hit] = pd.NA
                out["dist_km"] = dk
            yield out

    return points.mapInPandas(solve, out_schema)
