"""Point-in-polygon admin-boundary tiling (north-rule addition).

The reference has no polygon support (its MBR geometry ops at
lib/city/city.go:28-57 are R-tree legacy, unused — SURVEY §2.2 P11);
this operator supplies the country/admin tiling the north star
requires on top of the same broadcast-dimension design.

Plan (scale-first):
  1. polygons (small: countries/admin areas) are collected to the
     driver once and closure-captured as NumPy rings by the pandas
     UDF; only (polygon_id, bbox) travels in the broadcast join;
  2. candidate pairs = fact rows x broadcast polygon bboxes filtered
     by lat/lon BETWEEN (JVM, codegen) — the cheap prune;
  3. exact ray-cast (even-odd crossing rule) runs as an
     Arrow-vectorized pandas UDF over the surviving candidates only.

Boundary rule: strict even-odd crossing parity (a point exactly on an
edge follows the half-open convention of the crossing test); synthetic
fixtures avoid on-edge points (FIXTURES.md §6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def point_in_polygon_np(
    plat: np.ndarray, plon: np.ndarray, ring_lat: np.ndarray, ring_lon: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd ray cast: horizontal ray in +lon direction.
    ring_* are the polygon vertices in order (closed implicitly)."""
    inside = np.zeros(plat.shape[0], dtype=bool)
    n = len(ring_lat)
    for v in range(n):
        y1, x1 = ring_lat[v], ring_lon[v]
        y2, x2 = ring_lat[(v + 1) % n], ring_lon[(v + 1) % n]
        crosses = (y1 > plat) != (y2 > plat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (plat - y1) / (y2 - y1) + x1
        inside ^= crosses & (plon < xint)
    return inside


def tag_points_with_polygons(
    points: DataFrame,
    polygons: DataFrame,
    *,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Inner-join rows (point columns + polygon_id, poly_country) for
    every polygon containing the point.

    polygons: polygon_id, country, ring_lats array<double>,
    ring_lons array<double> (vertices in order, not closed).
    """
    polys = polygons.select("polygon_id", "country", "ring_lats", "ring_lons").collect()
    rings = {
        int(r["polygon_id"]): (
            np.asarray(r["ring_lats"], dtype=np.float64),
            np.asarray(r["ring_lons"], dtype=np.float64),
        )
        for r in polys
    }
    spark = points.sparkSession
    bbox = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "polygon_id": int(r["polygon_id"]),
                    "poly_country": r["country"],
                    "min_lat": float(np.min(r["ring_lats"])),
                    "max_lat": float(np.max(r["ring_lats"])),
                    "min_lon": float(np.min(r["ring_lons"])),
                    "max_lon": float(np.max(r["ring_lons"])),
                }
                for r in polys
            ]
        )
    )

    @F.pandas_udf(T.BooleanType())
    def _inside(pid: pd.Series, plat: pd.Series, plon: pd.Series) -> pd.Series:
        out = np.zeros(len(pid), dtype=bool)
        la = plat.to_numpy(np.float64)
        lo = plon.to_numpy(np.float64)
        for p in pid.unique():
            rl, rn = rings[int(p)]
            m = (pid == p).to_numpy()
            out[m] = point_in_polygon_np(la[m], lo[m], rl, rn)
        return pd.Series(out)

    # candidate generation is a HASH equi-join on the spatial cell, not
    # a range-predicate broadcast nested loop: the polygon bboxes
    # explode into covering cells (range_join.box_cover — the cover can
    # never miss an in-bbox point), each fact row keys to its ONE cell,
    # and the bbox BETWEEN becomes a cheap refine on the survivors.
    # With a nested loop, EVERY point is tested against EVERY polygon
    # bbox; with the grid, a point only meets polygons whose cover
    # touches its cell — the plan that holds when the polygon set grows.
    from cityfinder_spark.geo.cells import cell_col
    from cityfinder_spark.operators.range_join import box_cover

    level = 6
    cover = box_cover(
        bbox.withColumnRenamed("min_lat", "lat_min")
        .withColumnRenamed("max_lat", "lat_max")
        .withColumnRenamed("min_lon", "lon_min")
        .withColumnRenamed("max_lon", "lon_max"),
        level,
        id_col="polygon_id",
        extra_cols=("poly_country",),
    )
    latc, lonc = F.col(lat_col), F.col(lon_col)
    cand = (
        points.withColumn("__cell", cell_col(lat_col, lon_col, level))
        .join(F.broadcast(cover), F.col("__cell") == F.col("cell"))
        .where(
            latc.between(F.col("lat_min"), F.col("lat_max"))
            & lonc.between(F.col("lon_min"), F.col("lon_max"))
        )
    )
    return (
        cand.where(_inside(F.col("polygon_id"), latc, lonc))
        .drop("lat_min", "lat_max", "lon_min", "lon_max", "__cell", "cell")
    )
