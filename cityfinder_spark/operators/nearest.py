"""Nearest-city kNN (k=1 / top-k) as a distributed broadcast join.

Reimplements the reference's S2 ShapeIndex + ClosestEdgeQuery lookup
(lib/finder/coordinates/s2.go:52-75) as a Spark-first plan:

  1. every city gets a spatial cell id at level L and is exploded into
     its ring-k neighbor cells ("cell covering + ring expansion");
     grouped per cell into a candidate array -> small broadcast table;
  2. every fact row gets its cell id (pure Column arithmetic, codegen)
     and takes ONE broadcast hash join against the cover — NO shuffle
     of the fact side at all;
  3. the argmin over candidates runs inside a higher-order `aggregate`
     expression (JVM, whole-stage codegen): exact haversine refinement
     with the mandated deterministic tie-break (rounded distance, then
     city_id) — replaces `results[0]` at s2.go:65;
  4. rows whose best candidate is not *provably* the global nearest
     (certainty-radius lower bound, see geo.cells.certainty_radius_col)
     escalate to an exact brute-force pass (cross join against the
     broadcast cities + map-side-combined min aggregate). Replaces the
     reference's "no city found" / index-miss path (s2.go:61-63) and
     makes the operator exactly equal to a global argmin.

Scale notes (100 TB / 1000 executors): the fast path is shuffle-free
(broadcast join only) so dense-urban-cell skew cannot create shuffle
skew — it only widens some candidate arrays, which adaptive cell
splitting (operators.skew) bounds. The `bytes` image payload never
enters a shuffle: the fallback joins back on the id column only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.geo.cells import (
    cell_col,
    certainty_radius_col,
    ring_cells_col,
)
from cityfinder_spark.geo.distance import haversine_rounded_col
from cityfinder_spark.sqlcompat import ROUND_DIGITS

# rounding slack (km) when comparing the rounded best distance against
# the certainty lower bound — keeps the rounded tie-break exact.
_SLACK = 10.0 ** (-ROUND_DIGITS)

_BEST_TYPE = "struct<dist_km:double,city_id:bigint,name:string,country:string>"


def choose_level(n_cities: int, ring: int = 1, target_cands: int = 72) -> int:
    """Pick the grid level so a cell's ring-expanded candidate list
    averages ~`target_cands` cities: cands/cell ~ n*(2k+1)^2 / (2*4^L).

    Coarser-than-minimal cells are deliberate: the per-candidate argmin
    is codegen'd JVM work (~100 cands ~ microseconds/row), while an
    under-filled neighborhood forfeits the certainty proof and
    escalates the row to the exact cross-join fallback — far costlier.
    The reference's S2 config is dead code (SURVEY §4 'Dead S2
    config'); we size from density instead."""
    if n_cities <= 0:
        return 2
    ratio = max(n_cities, 2) * (2 * ring + 1) ** 2 / (2.0 * target_cands)
    level = int(math.log2(max(ratio, 2.0)) / 2 + 0.5)  # round to nearest
    return max(2, min(12, level))


def _prep_cities(cities: DataFrame) -> DataFrame:
    cols = set(cities.columns)
    sel = [
        F.col("city_id").cast("long").alias("city_id"),
        F.col("lat").cast("double").alias("c_lat"),
        F.col("lon").cast("double").alias("c_lon"),
        (F.col("name") if "name" in cols else F.lit(None).cast("string")).alias("c_name"),
        (F.col("country") if "country" in cols else F.lit(None).cast("string")).alias(
            "c_country"
        ),
    ]
    return cities.select(*sel)


def build_cover(cities: DataFrame, level: int, ring: int) -> DataFrame:
    """(cell_id, cands: array<struct<city_id,c_lat,c_lon,c_name,c_country>>)
    — each city emitted into its own cell + ring-k neighbors, grouped.
    Runs only on the small dimension side."""
    cdf = _prep_cities(cities)
    cell = cell_col("c_lat", "c_lon", level)
    return (
        cdf.withColumn("__cells", ring_cells_col(cell, ring, level))
        .select(
            F.explode("__cells").alias("cell_id"),
            F.struct("city_id", "c_lat", "c_lon", "c_name", "c_country").alias("cand"),
        )
        .groupBy("cell_id")
        .agg(F.sort_array(F.collect_list("cand")).alias("cands"))
    )


def _best_over_cands(lat_col: str, lon_col: str, digits: int) -> F.Column:
    """min(struct(rounded dist, city_id, name, country)) over the
    per-cell candidate array, as a codegen'd aggregate expression."""

    def merge(acc, c):
        d = haversine_rounded_col(F.col(lat_col), F.col(lon_col), c["c_lat"], c["c_lon"], digits)
        cand = F.struct(
            d.alias("dist_km"),
            c["city_id"].alias("city_id"),
            c["c_name"].alias("name"),
            c["c_country"].alias("country"),
        )
        return F.when(acc.isNull() | (cand < acc), cand).otherwise(acc)

    return F.aggregate(
        F.coalesce(
            F.col("__cands"),
            F.expr(
                "cast(array() as array<struct<"
                "city_id:bigint,c_lat:double,c_lon:double,"
                "c_name:string,c_country:string>>)"
            ),
        ),
        F.lit(None).cast(_BEST_TYPE),
        merge,
    )


def brute_force_nearest(
    points: DataFrame,
    cities: DataFrame,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    digits: int = ROUND_DIGITS,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact global argmin: cross join vs broadcast cities + min(struct).
    Map-side partial aggregation reduces the shuffle to one row per
    point. Used as (a) the escalation path, (b) the test oracle.

    carry_cols ride through the aggregation via F.first (every row of a
    group shares them — they come from the same fact row), so the
    escalation path needs NO join back against its input (which would
    re-execute the candidate-join subtree a third time)."""
    cdf = _prep_cities(cities)
    d = haversine_rounded_col(
        F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), digits
    )
    cand = F.when(
        F.col("city_id").isNotNull(),
        F.struct(
            d.alias("dist_km"),
            F.col("city_id").alias("city_id"),
            F.col("c_name").alias("name"),
            F.col("c_country").alias("country"),
        ),
    )
    carry = [c for c in carry_cols if c != id_col]
    return (
        # left join on TRUE (not crossJoin): an empty cities table must
        # yield NULL city columns, not drop the points (s2.go:61-63).
        points.select(id_col, lat_col, lon_col, *[c for c in carry if c not in (lat_col, lon_col)])
        .join(F.broadcast(cdf), F.lit(True), "left")
        .groupBy(id_col)
        .agg(
            F.min(cand).alias("__best"),
            *[F.first(c).alias(c) for c in carry],
        )
    )


def nearest_city_join(
    points: DataFrame,
    cities: DataFrame,
    *,
    level: int | None = None,
    ring: int = 1,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    digits: int = ROUND_DIGITS,
    fallback: bool = True,
    n_cities: int | None = None,
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """points + (city_id, name, country, dist_km) of the nearest city.

    Exactly equal (incl. rounded-distance-then-id tie-break) to the
    global brute-force argmin whenever fallback=True. Points with an
    empty cities table get NULL city columns (the reference errors
    "no city found", s2.go:61-63 — mapped to NULL in the relational
    model).

    strategy="arrow" (default): single-pass vectorized mapInPandas with
    a worker-resident city index (see operators.nearest_arrow) — the
    scale path, ~20x faster than the relational plan. strategy="jvm":
    pure-Catalyst broadcast-join + lambda-aggregate plan below.
    strategy="tiled": arrow plus the precomputed certain-tile fast
    path (JVM-only assignment for rows in provably-single-winner
    cells) — pays off on clustered real-world city layouts; on the
    dense synthetic lattice it degenerates to the arrow path (see
    SCALE.md "tiling economics").
    """
    if strategy == "tiled" and fallback:
        from cityfinder_spark.operators.nearest_arrow import nearest_city_join_tiled

        return nearest_city_join_tiled(
            points, cities,
            level=level, ring=ring, id_col=id_col, lat_col=lat_col,
            lon_col=lon_col, digits=digits, n_cities=n_cities,
            cache_key=cache_key,
        )
    if strategy == "arrow" and fallback:
        from cityfinder_spark.operators.nearest_arrow import nearest_city_join_arrow

        return nearest_city_join_arrow(
            points, cities,
            level=level, ring=ring, id_col=id_col, lat_col=lat_col,
            lon_col=lon_col, digits=digits, n_cities=n_cities,
            cache_key=cache_key,
        )
    if level is None:
        n = n_cities if n_cities is not None else cities.count()
        level = choose_level(n)

    cover = build_cover(cities, level, ring)
    pts_cols = points.columns
    pts = points.withColumn("__cell", cell_col(lat_col, lon_col, level)).withColumn(
        "__certainty", certainty_radius_col(lat_col, ring, level)
    )
    cov = cover.withColumnRenamed("cands", "__cands")
    joined = (
        pts.join(F.broadcast(cov), pts["__cell"] == cov["cell_id"], "left")
        .drop("cell_id")
        .withColumn("__best", _best_over_cands(lat_col, lon_col, digits))
    )
    ok = F.col("__best").isNotNull() & (
        F.col("__best")["dist_km"] + _SLACK < F.col("__certainty")
    )

    def unpack(df: DataFrame) -> DataFrame:
        return df.select(
            *pts_cols,
            F.col("__best")["city_id"].alias("city_id"),
            F.col("__best")["name"].alias("name"),
            F.col("__best")["country"].alias("country"),
            F.col("__best")["dist_km"].alias("dist_km"),
        )

    if not fallback:
        return unpack(joined)

    fast = unpack(joined.where(ok))
    rem = joined.where(~ok).drop("__best", "__cands", "__cell", "__certainty")
    carry = tuple(c for c in pts_cols if c != id_col)
    slow = unpack(
        brute_force_nearest(rem, cities, id_col, lat_col, lon_col, digits, carry)
    )
    return fast.unionByName(slow)


def nearest_city_topk(
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
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Top-k nearest cities per point (explode + window strategy).

    strategy="arrow" (default) runs the single-pass vectorized
    mapInPandas plan (operators.nearest_arrow); "jvm" keeps the
    relational explode + window plan below.

    Certainty rule generalizes k=1: all k results are proven global iff
    the k-th distance is below the ring's certainty radius; other rows
    escalate to the exact cross-join path. Output one row per
    (point, rank), rank 1..k ordered by (rounded dist, city_id).
    """
    if strategy == "arrow":
        from cityfinder_spark.operators.nearest_arrow import nearest_city_topk_arrow

        return nearest_city_topk_arrow(
            points, cities,
            k=k, level=level, ring=ring, id_col=id_col, lat_col=lat_col,
            lon_col=lon_col, digits=digits, n_cities=n_cities,
            cache_key=cache_key,
        )
    if level is None:
        n = n_cities if n_cities is not None else cities.count()
        level = choose_level(n)
    from pyspark.sql import Window

    cdf = _prep_cities(cities)
    cover = (
        cdf.withColumn("__cells", ring_cells_col(cell_col("c_lat", "c_lon", level), ring, level))
        .select(F.explode("__cells").alias("cell_id"), "city_id", "c_lat", "c_lon", "c_name", "c_country")
    )
    pts = points.select(id_col, lat_col, lon_col).withColumn(
        "__cell", cell_col(lat_col, lon_col, level)
    ).withColumn("__certainty", certainty_radius_col(lat_col, ring, level))

    cand = pts.join(F.broadcast(cover), pts["__cell"] == cover["cell_id"], "inner").withColumn(
        "dist_km",
        haversine_rounded_col(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), digits),
    )
    w = Window.partitionBy(id_col).orderBy("dist_km", "city_id")
    ranked = cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    # a point is proven iff it has k in-ring results and the k-th is certain
    kth = ranked.groupBy(id_col).agg(
        F.max("rank").alias("__n"), F.max("dist_km").alias("__kth"),
        F.first("__certainty").alias("__cert"),
    )
    proven = kth.where((F.col("__n") == k) & (F.col("__kth") + _SLACK < F.col("__cert"))).select(id_col)
    fast = ranked.join(proven, id_col, "left_semi").select(
        id_col, "city_id",
        F.col("c_name").alias("name"), F.col("c_country").alias("country"),
        "dist_km", "rank",
    )
    # escalate the rest: exact cross join + window
    rem = pts.join(proven, id_col, "left_anti").select(id_col, lat_col, lon_col)
    bf = rem.crossJoin(F.broadcast(cdf)).withColumn(
        "dist_km",
        haversine_rounded_col(F.col(lat_col), F.col(lon_col), F.col("c_lat"), F.col("c_lon"), digits),
    )
    slow = (
        bf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col, "city_id",
            F.col("c_name").alias("name"), F.col("c_country").alias("country"),
            "dist_km", "rank",
        )
    )
    return fast.unionByName(slow)


def idw_interpolate(
    pairs: DataFrame,
    *,
    id_col: str = "pt_id",
    dist_col: str = "dist_km",
    value_col: str = "value",
    min_dist_km: float = 0.1,
) -> DataFrame:
    """Inverse-distance-weighted spatial interpolation (the classic
    IDW estimator) over a (point, neighbor) pair table — typically the
    output of nearest_city_topk: estimate a field value at each query
    point from its k nearest stations.

    Integer-exact stance (the lm_score / events_decay pattern applied
    to interpolation): the weight is the INTEGER floor(1e9 /
    max(dist, min_dist) + 0.5), so both the numerator sum(w*v) and
    denominator sum(w) are order-free int64 rollups — the estimate is
    a single double division rounded at the end, identical at any
    parallelism and bit-replayable in the oracle. A raw float
    sum(w_i*v_i) would accumulate in partition order and flip last
    digits under AQE re-planning.

    Scale shape: one keyed exchange (the groupBy on id_col) over slim
    (id, w, w*v) rows — the kNN pair generation upstream is the
    zero-shuffle broadcast kernel. Output: (id_col, n_used, est).
    """
    from cityfinder_spark.colutils import round6_col

    d = F.greatest(F.col(dist_col), F.lit(min_dist_km))
    w = F.floor(F.lit(1e9) / d + F.lit(0.5)).cast("long")
    rows = pairs.select(
        id_col,
        w.alias("w"),
        (w * F.col(value_col).cast("long")).alias("wv"),
    )
    agg = rows.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("w").alias("den"),
        F.sum("wv").alias("num"),
    )
    return agg.select(
        id_col,
        "n_used",
        round6_col(F.col("num") / F.col("den")).alias("est"),
    )


def knn_classify(
    pairs: DataFrame,
    *,
    id_col: str = "pt_id",
    label_col: str = "label",
) -> DataFrame:
    """kNN majority-vote classification over a (point, neighbor-label)
    pair table — the categorical twin of idw_interpolate: label each
    query point by the most frequent label among its k nearest
    neighbors. Deterministic tie-break: highest vote count, then
    LEXICOGRAPHICALLY SMALLEST label (encoded as one min over the
    struct (-n, label), so the argmax needs no window/sort — two
    map-side-combined groupBys on slim rows and nothing else).

    Output: (id_col, pred, n_votes).
    """
    votes = pairs.groupBy(id_col, label_col).agg(F.count(F.lit(1)).alias("n"))
    w = F.min(
        F.struct((-F.col("n")).alias("nn"), F.col(label_col).alias("lab"))
    ).alias("w")
    return (
        votes.groupBy(id_col)
        .agg(w)
        .select(
            id_col,
            F.col("w.lab").alias("pred"),
            (-F.col("w.nn")).alias("n_votes"),
        )
    )
