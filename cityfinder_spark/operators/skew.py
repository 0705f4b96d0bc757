"""Skew handling for dense urban cells (north rule):
hot-cell detection, salted two-phase aggregation, and adaptive
cell-level splitting for the nearest-city cover.

Why each exists at 100 TB:
  * the nearest join's fast path is shuffle-free, so key skew cannot
    stall a shuffle — but a dense city cell inflates its candidate
    array, turning into per-row COMPUTE skew. Adaptive splitting
    re-covers hot cells two levels finer, bounding candidates/row.
  * per-cell aggregations (hot-cell stats, tile rollups) DO shuffle on
    cell_id; salting splits a hot key across `n_salt` reducers and a
    second phase merges — the classic two-phase pattern, exposed as a
    reusable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.geo.cells import cell_col, certainty_radius_col
from cityfinder_spark.operators import nearest as _nearest
from cityfinder_spark.sqlcompat import ROUND_DIGITS


def detect_hot_cells(
    points: DataFrame,
    level: int,
    threshold: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(cell_id, n_points) for cells above `threshold` — the cheap
    pre-pass that feeds salting / adaptive splitting (SURVEY §2.3)."""
    return (
        points.select(cell_col(lat_col, lon_col, level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .where(F.col("n_points") >= threshold)
    )


def with_salt(df: DataFrame, key_col: str, n_salt: int = 16) -> DataFrame:
    """Deterministic salt in [0, n_salt): xxhash of the row's unique id."""
    return df.withColumn("salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salt)))


def salted_agg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(key, salt) partials, then
    merge per key — splits a hot key across n_salt reducers.
    Returns (group_col, n_rows, sum_value)."""
    partial = (
        with_salt(df, id_col, n_salt)
        .groupBy(group_col, "salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(value_col).alias("__s"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("__n").alias("n_rows"), F.sum("__s").alias("sum_value")
    )


def build_adaptive_cover(
    cities: DataFrame,
    base_level: int,
    ring: int = 1,
    max_per_cell: int = 256,
    fine_delta: int = 2,
) -> tuple[DataFrame, DataFrame, int, int]:
    """Split overfull cover cells to base_level+fine_delta.

    Returns (cover_base_without_hot, cover_fine_for_hot, fine_level,
    fine_ring). fine_ring = ring * 2**fine_delta preserves the physical
    guarantee radius (cells shrink 2**fine_delta per axis)."""
    fine_level = base_level + fine_delta
    fine_ring = ring * (1 << fine_delta)
    cover = _nearest.build_cover(cities, base_level, ring)
    hot = cover.where(F.size("cands") > max_per_cell).select("cell_id")
    cover_ok = cover.join(hot, "cell_id", "left_anti")
    # fine cover restricted to sub-cells whose parent is hot
    fine = _nearest.build_cover(cities, fine_level, fine_ring)
    # parent cell id of a fine cell: decode fine (i, j), shift down
    stride = 18014398509481984  # 2**54
    nlon_f = 2 << fine_level
    nlon_b = 2 << base_level
    shift = 1 << fine_delta
    fine = fine.withColumn(
        "__parent",
        (
            F.lit(base_level).cast("long") * stride
            + (((F.col("cell_id") - F.lit(fine_level) * stride) / nlon_f).cast("long") / shift).cast("long") * nlon_b
            + (F.pmod(F.col("cell_id") - F.lit(fine_level) * stride, F.lit(nlon_f)) / shift).cast("long")
        ),
    )
    cover_fine = fine.join(
        hot.withColumnRenamed("cell_id", "__parent"), "__parent", "left_semi"
    ).drop("__parent")
    return cover_ok, cover_fine, fine_level, fine_ring


def nearest_city_join_adaptive(
    points: DataFrame,
    cities: DataFrame,
    *,
    base_level: int,
    ring: int = 1,
    max_per_cell: int = 256,
    fine_delta: int = 2,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    digits: int = ROUND_DIGITS,
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """nearest_city_join with adaptive cell splitting: fact rows in hot
    cells use a cover re-built at base_level+fine_delta with
    ring*2**fine_delta (same guarantee radius, tighter neighborhoods);
    results stay equal to the global argmin.

    strategy="arrow" (default): the split lives inside the worker-
    resident CityIndex (operators.nearest_arrow) — one vectorized
    mapInPandas pass. strategy="jvm": two chained broadcast joins
    (base + fine cover), still zero fact-side shuffle."""
    if strategy == "arrow":
        from cityfinder_spark.operators.nearest_arrow import nearest_city_join_arrow

        return nearest_city_join_arrow(
            points, cities,
            level=base_level, ring=ring, id_col=id_col, lat_col=lat_col,
            lon_col=lon_col, digits=digits,
            max_per_cell=max_per_cell, fine_delta=fine_delta,
            cache_key=cache_key,
        )
    cover_ok, cover_fine, fine_level, fine_ring = build_adaptive_cover(
        cities, base_level, ring, max_per_cell, fine_delta
    )
    pts_cols = points.columns
    pts = (
        points.withColumn("__cell_b", cell_col(lat_col, lon_col, base_level))
        .withColumn("__cell_f", cell_col(lat_col, lon_col, fine_level))
        .withColumn("__cert_b", certainty_radius_col(lat_col, ring, base_level))
        .withColumn("__cert_f", certainty_radius_col(lat_col, fine_ring, fine_level))
    )
    cb = cover_ok.withColumnRenamed("cands", "__cands_b").withColumnRenamed(
        "cell_id", "__jb"
    )
    cf = cover_fine.withColumnRenamed("cands", "__cands_f").withColumnRenamed(
        "cell_id", "__jf"
    )
    joined = (
        pts.join(F.broadcast(cb), pts["__cell_b"] == cb["__jb"], "left")
        .join(F.broadcast(cf), pts["__cell_f"] == cf["__jf"], "left")
        .withColumn("__cands", F.coalesce(F.col("__cands_b"), F.col("__cands_f")))
        .withColumn(
            "__certainty",
            F.when(F.col("__cands_b").isNotNull(), F.col("__cert_b")).otherwise(
                F.col("__cert_f")
            ),
        )
        .withColumn("__best", _nearest._best_over_cands(lat_col, lon_col, digits))
    )
    ok = F.col("__best").isNotNull() & (
        F.col("__best")["dist_km"] + _nearest._SLACK < F.col("__certainty")
    )

    def unpack(df: DataFrame) -> DataFrame:
        return df.select(
            *pts_cols,
            F.col("__best")["city_id"].alias("city_id"),
            F.col("__best")["name"].alias("name"),
            F.col("__best")["country"].alias("country"),
            F.col("__best")["dist_km"].alias("dist_km"),
        )

    fast = unpack(joined.where(ok))
    rem = joined.where(~ok).select(*pts_cols)
    carry = tuple(c for c in pts_cols if c != id_col)
    slow = unpack(
        _nearest.brute_force_nearest(rem, cities, id_col, lat_col, lon_col, digits, carry)
    )
    return fast.unionByName(slow)
