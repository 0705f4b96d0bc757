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

Plan (no broadcast of the dimension anywhere):

  round 0 — dim-side ring expansion, ONE fact shuffle:
    cities explode into their ring-1 neighbor cells and group into the
    per-cell candidate-array cover (`nearest.build_cover`, reused
    verbatim minus the broadcast hint). Points compute their cell id
    (pure codegen) and SHUFFLE-hash-join the cover on cell_id — the
    fact side shuffles exactly once, the dim side ~9 rows per city.
    The argmin over candidates is the same codegen'd lambda-aggregate
    (`nearest._best_over_cands`); a row is proven global iff its best
    rounded distance clears the ring-1 certainty radius
    (geo.cells.certainty_radius_col — SURVEY §7.3 proof).

  escalation — POINT-side ring doubling against a cities-own-cell map:
    expanding the dim side again would re-explode ALL cities per round
    to serve a shrinking remainder. Instead the cover is inverted once
    (each city in its OWN cell only) and each unproven point explodes
    into its ring-r cells, r = 2, 4, 8, ... — the per-round join cost
    is |remainder| * (2r+1)^2, tiny after round 0 resolves the bulk.
    A round proves a point when its best clears certainty(r), or
    unconditionally once the ring covers the whole grid
    (r >= nlat-1 and 2r+1 >= nlon: lat clamps, lon wraps — at that
    point the candidate set IS the full dimension, so the min is the
    global argmin and a NULL best means an empty dimension). Ring
    doubling reaches full cover in O(level) rounds; each round's
    remainder is materialized (persist + count) so lineage stays flat
    — the same bounded-iteration shape as components.dedup_resolve.

Scale notes (100 TB / 1000 executors): total shuffle = facts x 1 +
cities x 9 + sum_r |rem_r| * (2r+1)^2; with density-sized levels
(`nearest.choose_level`) the round-0 proof rate is ~99%+ away from the
poles, so the escalation terms are noise. Dense-urban-cell skew widens
candidate arrays, not shuffle partitions (arrays are pre-grouped on
the dim side); a pathological mega-cell is bounded by adaptive cell
splitting upstream (operators/skew.py). AQE handles the remainder
joins' shrinking sizes (they fall below the advisory partition size
and coalesce).

Reference tie-in: ring expansion + exact refinement mirrors
ClosestEdgeQuery's traversal (s2.go:52-75); the full-cover terminal
round replaces the reference's "no city found" error (s2.go:61-63)
with NULL columns, same as the broadcast plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.geo.cells import (
    cell_col,
    certainty_radius_col,
    grid_dims,
    ring_cells_col,
)
from cityfinder_spark.geo.distance import haversine_rounded_col
from cityfinder_spark.operators.nearest import (
    _SLACK,
    _best_over_cands,
    _prep_cities,
    build_cover,
    choose_level,
)
from cityfinder_spark.sqlcompat import ROUND_DIGITS


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
    ride through. Triggers jobs (per-round remainder counts): call it
    like an action-producing build step, not a lazy view."""
    if level is None:
        n = n_cities if n_cities is not None else cities.count()
        level = choose_level(n)
    nlat, nlon = grid_dims(level)
    pts_cols = points.columns

    def unpack(df: DataFrame) -> DataFrame:
        return df.select(
            *pts_cols,
            F.col("__best")["city_id"].alias("city_id"),
            F.col("__best")["name"].alias("name"),
            F.col("__best")["country"].alias("country"),
            F.col("__best")["dist_km"].alias("dist_km"),
        )

    # ---- round 0: dim-side ring cover, shuffled hash join ----
    cover = build_cover(cities, level, ring).withColumnRenamed("cands", "__cands")
    pts = points.withColumn("__cell", cell_col(lat_col, lon_col, level)).withColumn(
        "__certainty", certainty_radius_col(lat_col, ring, level)
    )
    joined = (
        pts.join(
            cover.hint("shuffle_hash"),
            pts["__cell"] == cover["cell_id"],
            "left",
        )
        .drop("cell_id")
        .withColumn("__best", _best_over_cands(lat_col, lon_col, digits))
    )
    ok = F.col("__best").isNotNull() & (
        F.col("__best")["dist_km"] + _SLACK < F.col("__certainty")
    )
    out = unpack(joined.where(ok))

    # ---- escalation: point-side ring doubling vs cities-own-cell ----
    cdf = _prep_cities(cities)
    cities_cells = cdf.withColumn("cell_id", cell_col("c_lat", "c_lon", level))
    cand_struct = F.struct(
        haversine_rounded_col(
            F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), digits
        ).alias("dist_km"),
        F.col("city_id").alias("city_id"),
        F.col("c_name").alias("name"),
        F.col("c_country").alias("country"),
    )
    carry = [c for c in pts_cols if c != id_col]

    # Each round's `best` is persisted (MEMORY_AND_DISK default) and
    # stays persisted: the returned lazy union reads the proven slice
    # of every round, so releasing them before the caller consumes the
    # result would force a full per-round recompute chain. Remainders
    # shrink geometrically, so the pinned footprint is ~|round-1 rem|.
    rem = joined.where(~ok).select(*pts_cols, "__cell")
    r = max(2, 2 * ring)
    while not rem.isEmpty():
        full_cover = r >= nlat - 1 and 2 * r + 1 >= nlon
        exploded = rem.withColumn(
            "cell_id", F.explode(ring_cells_col(F.col("__cell"), r, level))
        )
        # left join: a point whose ring holds no cities keeps a NULL
        # best — it escalates, or finishes NULL at full cover (the
        # empty-dimension case, reference "no city found" s2.go:61-63).
        best = (
            exploded.join(cities_cells.hint("shuffle_hash"), "cell_id", "left")
            .groupBy(id_col)
            .agg(
                F.min(
                    F.when(F.col("city_id").isNotNull(), cand_struct)
                ).alias("__best"),
                *[F.first(c).alias(c) for c in carry],
                F.first("__cell").alias("__cell"),
            )
            .persist()
        )
        proven = (
            F.lit(True)
            if full_cover
            else F.col("__best").isNotNull()
            & (
                F.col("__best")["dist_km"] + _SLACK
                < certainty_radius_col(F.col(lat_col), r, level)
            )
        )
        out = out.unionByName(unpack(best.where(proven)))
        if full_cover:
            break
        rem = best.where(~proven).select(*pts_cols, "__cell")
        r *= 2
    return out
