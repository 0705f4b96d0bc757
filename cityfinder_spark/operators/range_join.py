"""Spatial range join: points x lat/lon rectangles, without a cross
join.

Spark has no native range/interval join strategy — a naive
`points JOIN boxes ON lat BETWEEN ...` plans as
BroadcastNestedLoopJoin (every point tested against every box: O(N*B)
comparisons, the 100 TB killer). This module grids the problem the
way Sedona/GeoSpark do: each box explodes into the spatial cells it
covers (bounded by box area / cell area), each point keys to its one
cell (`geo/cells.py`, the engine's S2/H3-analog index), candidates
come from an equi-join on the cell id, and the exact rectangle test
refines survivors. Cost: |boxes| * cells_per_box cover rows (a
dimension-side projection) + one hash join + O(candidates) refines.

Antimeridian-crossing boxes (lon_min > lon_max) are first-class: the
cover walks the longitude columns modulo the grid width, and the
refine predicate splits into the two-slice test. Latitude clamps at
the poles.

The cover/point cell formulas are the SAME monotone floor expressions
(`cell_col` arithmetic), so no qualifying pair can be lost to float
rounding: lat in [lat_min, lat_max] implies the point's band index
lies in the cover's band range, and likewise for longitude columns
(shifted by the grid width across the wrap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cityfinder_spark.geo.cells import cell_col, grid_dims
from cityfinder_spark.sqlcompat import LEVEL_STRIDE


def box_cover(
    boxes: DataFrame,
    level: int,
    id_col: str = "box_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each rectangle (id, lat_min, lat_max, lon_min, lon_max)
    into its covering cells at `level` -> (id_col, cell, bounds...).
    Pure Catalyst (sequence + explode, no UDF); each (box, cell) pair
    appears exactly once (the longitude walk is clamped to one full
    circle). Assumes lat_min <= lat_max (latitude does not wrap)."""
    nlat, nlon = grid_dims(level)

    def band(latc: Column) -> Column:
        return F.least(
            F.greatest(
                F.floor((latc + 90.0) / 180.0 * nlat).cast("long"), F.lit(0)
            ),
            F.lit(nlat - 1),
        )

    def lcol(lonc: Column) -> Column:
        return F.floor((lonc + 180.0) / 360.0 * nlon).cast("long")

    # RAW (un-modded) floor columns: lon in [-180, 180] -> [0, nlon].
    # Modding the endpoints first would collapse lon_max = 180 onto
    # column 0 and break the walk; instead the walk runs on the raw
    # range and each element mods into the grid.
    wrap = F.col("lon_min") > F.col("lon_max")
    j0 = lcol(F.col("lon_min"))
    j1 = lcol(F.col("lon_max"))
    # unwrapped end column: shift by a full circle when the box
    # crosses the antimeridian, then clamp the walk to one circle
    j1 = F.when(wrap, j1 + nlon).otherwise(j1)
    j1 = F.least(j1, j0 + F.lit(nlon - 1))

    covered = boxes.select(
        F.col(id_col),
        *extra_cols,
        "lat_min",
        "lat_max",
        "lon_min",
        "lon_max",
        band(F.col("lat_min")).alias("i0"),
        band(F.col("lat_max")).alias("i1"),
        j0.alias("j0"),
        j1.alias("j1"),
    )
    return (
        covered.select(
            id_col,
            *extra_cols,
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
            F.explode(F.sequence("i0", "i1")).alias("i"),
            "j0",
            "j1",
        )
        .select(
            id_col,
            *extra_cols,
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
            "i",
            F.explode(
                F.expr("transform(sequence(j0, j1), x -> pmod(x, {n}))".format(n=nlon))
            ).alias("j"),
        )
        .select(
            id_col,
            *extra_cols,
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
            (
                F.lit(level).cast("long") * F.lit(LEVEL_STRIDE)
                + F.col("i") * nlon
                + F.col("j")
            ).alias("cell"),
        )
    )


def bbox_join(
    points: DataFrame,
    boxes: DataFrame,
    level: int = 6,
    pt_id_col: str = "pt_id",
    box_id_col: str = "box_id",
    broadcast_boxes: bool = True,
) -> DataFrame:
    """All (point, box) pairs where the point falls inside the
    rectangle, bounds inclusive. points: (pt_id_col, lat, lon);
    boxes: (box_id_col, lat_min, lat_max, lon_min, lon_max), where
    lon_min > lon_max means the box crosses the antimeridian.

    Scale shape: the fact side gets ONE projected cell column and
    never shuffles when `broadcast_boxes` (the default — boxes are a
    dimension); with broadcast off, both sides exchange on the cell
    key, which is the co-located equi-join shape for box sets too big
    to broadcast. Either way the candidate set is linear in the
    box-area/cell-area ratio — never the O(N*B) nested loop Spark
    would plan for a raw BETWEEN join. Output: (pt_id_col,
    box_id_col) exactly once per qualifying pair."""
    cover = box_cover(boxes, level, id_col=box_id_col)
    if broadcast_boxes:
        cover = F.broadcast(cover)
    pts = points.select(
        pt_id_col, "lat", "lon", cell_col("lat", "lon", level).alias("cell")
    )
    inside_lat = (F.col("lat") >= F.col("lat_min")) & (
        F.col("lat") <= F.col("lat_max")
    )
    no_wrap = F.col("lon_min") <= F.col("lon_max")
    inside_lon = F.when(
        no_wrap,
        (F.col("lon") >= F.col("lon_min")) & (F.col("lon") <= F.col("lon_max")),
    ).otherwise(
        (F.col("lon") >= F.col("lon_min")) | (F.col("lon") <= F.col("lon_max"))
    )
    return (
        pts.join(cover, "cell")
        .where(inside_lat & inside_lon)
        .select(pt_id_col, box_id_col)
    )


def radius_join(
    points: DataFrame,
    cities: DataFrame,
    radius_km: float,
    level: int = 6,
    pt_id_col: str = "pt_id",
    city_id_col: str = "city_id",
    broadcast_cities: bool = True,
) -> DataFrame:
    """Distance-band join: every (point, city) pair within `radius_km`
    great-circle km, with the rounded distance — the "what's near this
    geotag" complement to the kNN join (kNN answers "closest one",
    this answers "everything within R").

    The disc reduces to the bbox machinery above: each city expands to
    its bounding box — meridian arc gives the EXACT latitude extent;
    longitude uses the tangent bound dlon = asin(sin(r)/cos(lat))
    (Bourke's bounding-box formula; grows toward the poles, full lon
    ring inside the polar cap where |lat|+r_deg >= 90). The bound is
    inflated by 1e-9 relative so float rounding can't shave a
    qualifying cell; correctness never rests on the cover (the refine
    is the exact shared-rounded haversine, identical IEEE text to the
    DuckDB oracle; the cover only bounds the CANDIDATE count).

    Scale shape: identical to bbox_join — fact side gets one codegen
    cell column and never shuffles while the city covers broadcast;
    candidates are linear in disc-area/cell-area; refine is O(1) per
    candidate. Antimeridian wrap rides the bbox cover's modulo walk.
    Output: (pt_id_col, city_id_col, dist_km)."""
    import math

    from cityfinder_spark.geo.distance import haversine_rounded_col

    r_deg = radius_km / 111.19492664455873
    rad = radius_km / 6371.0  # EARTH_RADIUS_KM
    lat = F.col("__clat")
    lat_min = F.greatest(lat - F.lit(r_deg), F.lit(-90.0))
    lat_max = F.least(lat + F.lit(r_deg), F.lit(90.0))
    # polar cap: the tangent bound diverges -> full longitude ring
    polar = (F.abs(lat) + F.lit(r_deg)) >= F.lit(90.0)
    dlon = F.degrees(
        F.asin(
            F.least(
                F.lit(1.0),
                F.lit(math.sin(rad)) / F.cos(F.radians(lat)),
            )
        )
    ) * F.lit(1.000000001)
    full = polar | (dlon >= F.lit(180.0))
    raw_min = F.col("__clon") - dlon
    raw_max = F.col("__clon") + dlon
    lon_min = F.when(full, F.lit(-180.0)).otherwise(
        F.when(raw_min < -180.0, raw_min + 360.0).otherwise(raw_min)
    )
    lon_max = F.when(full, F.lit(180.0)).otherwise(
        F.when(raw_max > 180.0, raw_max - 360.0).otherwise(raw_max)
    )
    boxes = cities.select(
        F.col(city_id_col),
        F.col("lat").alias("__clat"),
        F.col("lon").alias("__clon"),
    ).select(
        city_id_col,
        "__clat",
        "__clon",
        lat_min.alias("lat_min"),
        lat_max.alias("lat_max"),
        lon_min.alias("lon_min"),
        lon_max.alias("lon_max"),
    )
    cover = box_cover(
        boxes, level, id_col=city_id_col, extra_cols=("__clat", "__clon")
    )
    if broadcast_cities:
        cover = F.broadcast(cover)
    pts = points.select(
        pt_id_col,
        F.col("lat").alias("__plat"),
        F.col("lon").alias("__plon"),
        cell_col("lat", "lon", level).alias("cell"),
    )
    dist = haversine_rounded_col("__plat", "__plon", "__clat", "__clon")
    return (
        pts.join(cover, "cell")
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= F.lit(float(radius_km)))
        .select(pt_id_col, city_id_col, "dist_km")
    )
