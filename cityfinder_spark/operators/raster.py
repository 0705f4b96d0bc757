"""Raster-tile -> vector-cell mapping (north-rule addition).

Each image is a w x h pixel raster whose footprint is centered on the
row's (lat, lon) geotag at a fixed degrees-per-pixel scale. The
operator tiles the raster into tile_px x tile_px blocks and assigns
every tile's center to its covering spatial cell — pure Column
arithmetic (explode of sequences + cell grid), no UDF, fully codegen.

Output grain: one row per (image, tile): tx, ty, tile_lat, tile_lon,
cell_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.geo.cells import cell_col


def map_raster_tiles(
    images: DataFrame,
    *,
    level: int,
    tile_px: int = 16,
    deg_per_px: float = 0.001,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    nx = F.floor((F.col(w_col) + (tile_px - 1)) / F.lit(float(tile_px))).cast("long")
    ny = F.floor((F.col(h_col) + (tile_px - 1)) / F.lit(float(tile_px))).cast("long")
    df = (
        images.withColumn("__nx", nx)
        .withColumn("__ny", ny)
        .withColumn("tx", F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nx") - 1)))
        .withColumn("ty", F.explode(F.sequence(F.lit(0).cast("long"), F.col("__ny") - 1)))
    )
    tile_lat = F.col(lat_col) + (
        F.col("ty") * tile_px + tile_px / 2.0 - F.col(h_col) / F.lit(2.0)
    ) * deg_per_px
    tile_lon = F.col(lon_col) + (
        F.col("tx") * tile_px + tile_px / 2.0 - F.col(w_col) / F.lit(2.0)
    ) * deg_per_px
    return (
        df.withColumn("tile_lat", tile_lat)
        .withColumn("tile_lon", tile_lon)
        .withColumn("cell_id", cell_col("tile_lat", "tile_lon", level))
        .drop("__nx", "__ny")
    )
