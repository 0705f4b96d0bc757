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
