"""Nearest-city kNN join for a city dimension TOO LARGE TO BROADCAST.

Every other J1 physical strategy (jvm / arrow / tiled,
operators/nearest.py + nearest_arrow.py) assumes the city index fits
the broadcast budget — true for the reference's world-cities table
(lib/finder/coordinates/s2.go builds one in-process index), but not for
the general 10^12-scale regime where the "dimension" may itself be
hundreds of millions of POIs. This module is the shuffle-partitioned
plan for that regime; it produces bit-identical output to
`nearest_city_join` (same rounding, same (rounded dist, city_id)
tie-break, NULL city columns on an empty dimension).

Plan — a FIXED, FULLY LAZY three-stage union (no driver loop, no
action inside the operator; an earlier revision used a geometric
ring-doubling ladder with per-round counts, which cost a fixed 2-3
Spark jobs per round and re-evaluated the fact join each time):

  stage 0 — dim-side ring expansion, ONE fact shuffle:
    cities explode into their ring-1 neighbor cells (a flat per-cell
    candidate list — ~9 rows per city). Points compute their cell id
    (pure codegen), repartition EXPLICITLY on it (an explicit
    repartition survives AQE coalescing, which would otherwise shrink
    the compute-heavy argmin stage to a handful of tasks — measured
    7.3s -> 2.1s at sf0.1/32 cores), and SHUFFLE-hash-join the flat
    cover on cell_id. The argmin is `min_by(payload, (rounded_dist,
    city_id))` — a codegen'd hash aggregate whose ordering key is the
    2-field numeric struct (measured ~2x faster than folding a
    4-field struct with string members through a lambda aggregate);
    map-side partial aggregation collapses each point's ~|ring|
    candidates to one row before the groupBy exchange. A row is
    proven global iff its best rounded distance clears the ring-1
    certainty radius (SURVEY §7.3).

  stage 1 — one-shot per-point exact region (ring OR lat-strip):
    an unproven point with round-0 best distance d needs a candidate
    region whose certainty bound exceeds d — COMPUTABLE per point:
      * Chebyshev ring r: invert the lat-band and cross-track bounds
        of geo.cells.certainty_radius_col (+1 safety); cost (2r+1)^2
        cells. The cross-track bound degenerates near the poles
        (cos(lat) -> 0), where no finite ring proves anything.
      * LAT STRIP r_lat: ALL longitude columns within r_lat latitude
        bands. Any city outside the strip differs by > r_lat bands, so
        its meridian arc alone is >= r_lat*h degrees — an EXACT bound
        with no cos term: valid at the pole, and capped at the full
        grid it IS the global brute force. Cost (2*r_lat+1) * nlon
        cells, no wrap duplicates.
    Each point takes whichever region is cheaper ((2r+1)^2 vs
    (2r_lat+1)*nlon cells) and explodes into exactly those cells
    (dynamic `sequence` — region varies by row) joining a
    cities-own-cell map. Because candidates only improve, the proof
    holds by construction; the forward certainty check is still
    applied, so an inversion edge case degrades to stage 2, never to
    a wrong answer.

  stage 2 — recurse two levels coarser on the residue:
    ONLY points with NO round-0 candidate at all (city deserts) —
    every point with a candidate is settled by stage 1. The recursion
    re-runs the operator at level-2 (4x coarser cells: ring-1
    neighborhoods 16x larger in area, so a candidate appears after
    few levels unless the dimension is empty). Strictly decreasing
    level guarantees termination; at `level <= 2` the terminal is the
    full-grid strip (the exact global argmin over a 4x8 grid), which
    also serves the empty-dimension case (NULL city columns,
    reference "no city found" s2.go:61-63).

Scale notes (100 TB / 1000 executors): total shuffle = facts x 1 +
cities x 9 + remainder-sized stages; with density-sized levels
(`nearest.choose_level`) the stage-0 proof rate is ~99%+ away from
the poles. Only the small remainders are persisted (MEMORY_AND_DISK);
the fact-sized stage-0 join is evaluated at most twice (fast path +
remainder materialization), never cached. Dense-urban-cell skew widens
candidate arrays, not shuffle partitions (arrays pre-group on the dim
side); pathological mega-cells are bounded by adaptive cell splitting
upstream (operators/skew.py).

Reference tie-in: ring expansion + exact refinement mirrors
ClosestEdgeQuery's traversal (s2.go:52-75).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cityfinder_spark.geo.cells import (
    KM_PER_DEG,
    cell_col,
    cell_size_deg,
    certainty_radius_col,
    grid_dims,
    ring_cells_col,
)
from cityfinder_spark.geo.distance import haversine_rounded_col
from cityfinder_spark.operators.nearest import (
    _SLACK,
    _prep_cities,
    choose_level,
)
from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM, LEVEL_STRIDE, ROUND_DIGITS

_TERMINAL_LEVEL = 2


def _required_ring(lat_col: str, d: Column, level: int) -> Column:
    """Smallest Chebyshev ring r with certainty_radius(lat, r, level)
    > d, +1 safety margin. NULL when the cross-track bound cannot
    exceed d at any ring (polar degeneration: sin(d/R)/cos(lat) >= 1)
    or when d is NULL (no candidate)."""
    h = cell_size_deg(level)
    dd = d + F.lit(2.0 * _SLACK)
    r_lat = F.ceil(dd / F.lit(h * KM_PER_DEG))
    rhs = F.sin(dd / F.lit(EARTH_RADIUS_KM)) / F.cos(F.radians(F.col(lat_col)))
    # An over-quarter-circumference d makes sin() wrap and
    # under-estimate r — harmless: the forward certainty check in the
    # one-shot stage re-validates, so a bad inversion degrades to the
    # strip branch, never to a wrong answer.
    return F.when(
        rhs < 1.0,
        (F.greatest(r_lat, F.ceil(F.degrees(F.asin(rhs)) / F.lit(h))) + 1).cast(
            "int"
        ),
    )


def _required_strip(d: Column, level: int) -> Column:
    """Smallest lat-band count r_lat whose meridian-arc bound
    r_lat*h*KM_PER_DEG exceeds d, +1 safety, capped at nlat-1 (the
    full grid — at the cap the strip IS the exact global argmin, so
    the cap loses nothing). NULL iff d is NULL."""
    h = cell_size_deg(level)
    nlat, _ = grid_dims(level)
    r = F.ceil((d + F.lit(2.0 * _SLACK)) / F.lit(h * KM_PER_DEG)) + 1
    return F.least(r, F.lit(nlat - 1)).cast("int")


def _certainty_dyn(lat_col: str, rcol: Column, level: int) -> Column:
    """certainty_radius_col with a per-row ring column (same bounds:
    lat-band arc, cross-track arc at the point's own latitude)."""
    h = cell_size_deg(level)
    lat_bound = rcol.cast("double") * F.lit(h * KM_PER_DEG)
    dlon = F.radians(F.least(rcol.cast("double") * F.lit(h), F.lit(90.0)))
    lon_bound = F.lit(EARTH_RADIUS_KM) * F.asin(
        F.sin(dlon) * F.greatest(F.lit(0.0), F.cos(F.radians(F.col(lat_col))))
    )
    return F.least(lat_bound, F.greatest(lon_bound, F.lit(0.0)))


def _dyn_ring_expr(level: int, cell: str = "__cell", r: str = "__r") -> str:
    """array<bigint> of ring-`r` neighbor cells where r is a COLUMN —
    the SQL twin of geo.cells.ring_cells_col (lon wraps, lat clamps)."""
    nlat, nlon = grid_dims(level)
    base = f"({cell} - {level * LEVEL_STRIDE}L)"
    i = f"({base} div {nlon})"
    j = f"pmod({base}, {nlon})"
    return (
        f"filter(flatten(transform(sequence(-{r}, {r}), di -> "
        f"transform(sequence(-{r}, {r}), dj -> "
        f"if({i} + di >= 0 and {i} + di < {nlat}, "
        f"{level * LEVEL_STRIDE}L + ({i} + di) * {nlon} + pmod({j} + dj, {nlon}), "
        f"cast(null as bigint))))), c -> c is not null)"
    )


def _dyn_strip_expr(level: int, cell: str = "__cell", r: str = "__r") -> str:
    """array<bigint> of ALL cells within `r` (column) lat bands of the
    point's band, every longitude column — the lat-strip candidate
    region. No wrap arithmetic, so no duplicate cells at any r."""
    nlat, nlon = grid_dims(level)
    base = f"({cell} - {level * LEVEL_STRIDE}L)"
    i = f"({base} div {nlon})"
    return (
        f"flatten(transform("
        f"sequence(greatest({i} - {r}, 0L), least({i} + {r}, {nlat - 1}L)), "
        f"ii -> transform(sequence(0, {nlon - 1}), "
        f"jj -> {level * LEVEL_STRIDE}L + ii * {nlon} + jj)))"
    )


def nearest_city_join_bigdim(
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
) -> DataFrame:
    """points + (city_id, name, country, dist_km) of the globally
    nearest city, computed WITHOUT broadcasting the city dimension.
    Exactly equal to `nearest_city_join` / the brute-force argmin
    (rounded-distance-then-id tie-break); all non-key point columns
    ride through. Fully lazy — triggers no jobs until consumed."""
    if level is None:
        n = n_cities if n_cities is not None else cities.count()
        level = choose_level(n)
    pts_cols = points.columns

    def unpack(df: DataFrame) -> DataFrame:
        return df.select(
            *pts_cols,
            F.col("__best")["city_id"].alias("city_id"),
            F.col("__best")["name"].alias("name"),
            F.col("__best")["country"].alias("country"),
            F.col("__best")["dist_km"].alias("dist_km"),
        )

    cdf = _prep_cities(cities)
    d = haversine_rounded_col(
        F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), digits
    )
    # ordering key is the 2-field NUMERIC struct (the mandated rounded-
    # distance-then-id tie-break); the payload rides via min_by, so no
    # string ever enters a comparison and no re-join attaches names
    best_key = F.struct(d.alias("dist_km"), F.col("city_id").alias("city_id"))
    best_pay = F.struct(
        d.alias("dist_km"),
        F.col("city_id").alias("city_id"),
        F.col("c_name").alias("name"),
        F.col("c_country").alias("country"),
    )
    carry = [c for c in pts_cols if c != id_col]
    n_part = max(64, points.sparkSession.sparkContext.defaultParallelism * 2)

    def argmin_join(pts_df: DataFrame, flat_cover: DataFrame, extra: list[str]) -> DataFrame:
        """shuffled hash join on cell_id + min_by hash-aggregate; NULL
        best when the point's region holds no city (left join)."""
        return (
            pts_df.join(
                flat_cover.hint("shuffle_hash"),
                pts_df["cell_id"] == flat_cover["cell_id"],
                "left",
            )
            .drop(flat_cover["cell_id"])
            .groupBy(id_col)
            .agg(
                # the when() guards map left-join-unmatched rows to a
                # NULL ordering key, which min_by SKIPS — without them
                # an empty region yields a struct of NULL FIELDS (not a
                # NULL struct) and poisons the certainty predicate
                F.min_by(
                    F.when(F.col("city_id").isNotNull(), best_pay),
                    F.when(F.col("city_id").isNotNull(), best_key),
                ).alias("__best"),
                *[F.first(c).alias(c) for c in carry],
                *[F.first(c).alias(c) for c in extra],
            )
        )

    def region_join(rem: DataFrame, lvl: int, region_expr: str) -> DataFrame:
        """Point-side dynamic-region explode against the cities-own-
        cell map; -> (pts_cols..., __cell, __r, __best)."""
        cities_cells = cdf.withColumn("cell_id", cell_col("c_lat", "c_lon", lvl))
        exploded = rem.withColumn("cell_id", F.explode(F.expr(region_expr)))
        return argmin_join(exploded, cities_cells, ["__cell", "__r"])

    # ---- stage 0: dim-side ring cover, shuffled hash join ----
    cover_flat = cdf.withColumn(
        "__cells", ring_cells_col(cell_col("c_lat", "c_lon", level), ring, level)
    ).select(
        F.explode("__cells").alias("cell_id"),
        "city_id", "c_lat", "c_lon", "c_name", "c_country",
    )
    pts = (
        points.withColumn("cell_id", cell_col(lat_col, lon_col, level))
        .withColumn("__certainty", certainty_radius_col(lat_col, ring, level))
        .repartition(n_part, F.col("cell_id"))
    )
    # persisted so the fast path and the remainder read ONE evaluation
    # of the fact join (slim post-aggregate rows, one per point;
    # MEMORY_AND_DISK spills at cluster scale — replace with a staged
    # checkpoint table via plans/ when the fact side is 10^12 rows)
    joined = (
        argmin_join(pts, cover_flat, ["__certainty", "cell_id"])
        .withColumnRenamed("cell_id", "__cell")
        .persist()
    )
    ok = F.col("__best").isNotNull() & (
        F.col("__best")["dist_km"] + _SLACK < F.col("__certainty")
    )
    out = unpack(joined.where(ok))

    # remainder: small by construction — the only thing persisted.
    # __r_ring / __r_strip are the two per-point exact-region radii;
    # the point takes whichever region is cheaper in cells.
    nlat, nlon = grid_dims(level)
    d0 = F.col("__best")["dist_km"]
    # no persist: a cheap filter+projection over the cached `joined`
    rem = joined.where(~ok).select(
        *pts_cols,
        "__cell",
        _required_ring(lat_col, d0, level).alias("__r_ring"),
        _required_strip(d0, level).alias("__r_strip"),
    )
    ring_cells = (2 * F.col("__r_ring") + 1) * (2 * F.col("__r_ring") + 1)
    strip_cells = (2 * F.col("__r_strip") + 1) * nlon
    use_ring = F.col("__r_ring").isNotNull() & (ring_cells <= strip_cells)

    # ---- stage 1: one-shot exact region for points with a candidate --
    ring_rem = rem.where(use_ring).withColumn("__r", F.col("__r_ring"))
    strip_rem = rem.where(
        ~use_ring & F.col("__r_strip").isNotNull()
    ).withColumn("__r", F.col("__r_strip"))
    best_ring = region_join(ring_rem, level, _dyn_ring_expr(level))
    best_strip = region_join(strip_rem, level, _dyn_strip_expr(level))
    proven_ring = F.col("__best").isNotNull() & (
        F.col("__best")["dist_km"] + _SLACK
        < _certainty_dyn(lat_col, F.col("__r"), level)
    )
    h = cell_size_deg(level)
    proven_strip = (
        # full-grid strip IS the global argmin (NULL best = empty dim)
        F.col("__r") >= nlat - 1
    ) | (
        F.col("__best").isNotNull()
        & (
            F.col("__best")["dist_km"] + _SLACK
            < F.col("__r").cast("double") * F.lit(h * KM_PER_DEG)
        )
    )
    best1 = (
        best_ring.withColumn("__proven", proven_ring)
        .unionByName(best_strip.withColumn("__proven", proven_strip))
        .persist()
    )
    out = out.unionByName(unpack(best1.where(F.col("__proven"))))

    # ---- stage 2: residue -> coarser recursion / terminal strip ----
    # no-candidate points, plus any forward-check stragglers
    residue = (
        rem.where(F.col("__r_strip").isNull())
        .select(*pts_cols)
        .unionByName(best1.where(~F.col("__proven")).select(*pts_cols))
    )
    if level <= _TERMINAL_LEVEL:
        term = residue.withColumn(
            "__cell", cell_col(lat_col, lon_col, level)
        ).withColumn("__r", F.lit(nlat - 1).cast("int"))
        out = out.unionByName(
            unpack(region_join(term, level, _dyn_strip_expr(level)))
        )
    else:
        out = out.unionByName(
            nearest_city_join_bigdim(
                residue,
                cities,
                level=max(_TERMINAL_LEVEL, level - 2),
                ring=ring,
                id_col=id_col,
                lat_col=lat_col,
                lon_col=lon_col,
                digits=digits,
                n_cities=n_cities,
            )
        )
    return out
