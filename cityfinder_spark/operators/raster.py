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


def cell_pyramid(
    points: DataFrame,
    *,
    level: int,
    depth: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Multi-resolution tile pyramid: point counts per cell at `level`
    and every coarser level down to `level - depth` (H3 `cellToParent`
    rollup / slippy-map tile pyramid). Output: (level, cell_id,
    n_points), one row per non-empty cell per level.

    Scale shape: ONE fact scan, ONE exchange. The finest cell id is a
    codegen'd projection; every coarser ancestor derives from it by
    pure id arithmetic IN THE SAME ROW (parent i = i//2, j = j//2 —
    exact, because the grid halves per level and recomputing a coarser
    cell from raw coordinates multiplies the same IEEE quotient by a
    power of two, which is exact — so arithmetic parents equal
    per-level recomputation bit-for-bit). The (level, cell) pairs
    explode and feed a single map-side-combined groupBy: partial
    aggregation collapses each task's output to at most (depth+1) x
    |cells touched by the task| rows, so the exchange carries
    cell-count rows, never point rows, and the pyramid never rescans
    the fact table per level (a union of per-level aggregates would —
    each lazy branch re-reads the scan).
    """
    from cityfinder_spark.geo.cells import grid_dims
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    if depth < 0 or level - depth < 0:
        raise ValueError(f"bad pyramid range: level={level} depth={depth}")

    cell = cell_col(lat_col, lon_col, level)
    entries = [
        F.struct(F.lit(level).alias("level"), cell.alias("cell_id"))
    ]
    i = F.floor((cell - F.lit(level).cast("long") * F.lit(LEVEL_STRIDE)) / grid_dims(level)[1]).cast("long")
    j = F.pmod(cell - F.lit(level).cast("long") * F.lit(LEVEL_STRIDE), F.lit(grid_dims(level)[1]))
    for lvl in range(level - 1, level - depth - 1, -1):
        i = F.floor(i / 2).cast("long")
        j = F.floor(j / 2).cast("long")
        _, nlon = grid_dims(lvl)
        parent = F.lit(lvl).cast("long") * F.lit(LEVEL_STRIDE) + i * nlon + j
        entries.append(F.struct(F.lit(lvl).alias("level"), parent.alias("cell_id")))
    return (
        points.select(F.explode(F.array(*entries)).alias("e"))
        .select(F.col("e.level").alias("level"), F.col("e.cell_id").alias("cell_id"))
        .groupBy("level", "cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def focal_stats(
    pts: DataFrame,
    *,
    level: int,
    k: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Focal (moving-window) statistics over the cell lattice: for
    every OCCUPIED cell, the density aggregate of its Chebyshev-ring-k
    neighborhood — the raster convolution shape (heat-map smoothing,
    density gradients, edge detection pre-pass) computed vector-side.

    Output grain: one row per occupied cell —
      (cell_id, n_points, focal_sum, focal_mean, focal_max,
       n_occupied_nb)
    where focal_sum/max aggregate the per-cell counts over the
    (2k+1)^2 window (lon wraps, lat clamps — polar windows are
    smaller) and focal_mean divides by the EXACT valid window size
    (clamped rows x full wrap columns), counting empty cells as zero —
    raster semantics, not sparse-average semantics.

    Scale shape: ONE corpus-sized exchange (the map-side-combined
    groupBy(cell) count — identical to hot_cells); everything after is
    GRID-BOUNDED: each occupied cell scatters its count to its <=
    (2k+1)^2 window centers (ring membership is symmetric under the
    clamp/wrap rules, so gather == scatter), a second groupBy reduces
    <= (2k+1)^2 x |occupied| tiny rows, and the final join back to the
    occupied-cell table is dimension-sized (AQE broadcasts it). At
    10^12 points the corpus is touched exactly once.
    """
    from cityfinder_spark.colutils import round_digits_col
    from cityfinder_spark.geo.cells import grid_dims, ring_cells_col
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    nlat, _nlon = grid_dims(level)
    counts = (
        pts.select(cell_col(lat_col, lon_col, level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    contrib = counts.select(
        F.explode(ring_cells_col(F.col("cell_id"), k, level)).alias("center"),
        F.col("n_points").alias("nb_points"),
    )
    focal = contrib.groupBy("center").agg(
        F.sum("nb_points").alias("focal_sum"),
        F.max("nb_points").alias("focal_max"),
        F.count(F.lit(1)).alias("n_occupied_nb"),
    )
    i = F.floor((F.col("cell_id") - F.lit(level * LEVEL_STRIDE)) / F.lit(_nlon))
    rows_valid = (
        F.least(i + F.lit(k), F.lit(nlat - 1))
        - F.greatest(i - F.lit(k), F.lit(0))
        + F.lit(1)
    )
    win = (rows_valid * F.lit(2 * k + 1)).cast("double")
    return (
        counts.join(focal, counts["cell_id"] == focal["center"])
        .select(
            "cell_id",
            "n_points",
            "focal_sum",
            round_digits_col(F.col("focal_sum") / win, 6).alias("focal_mean"),
            "focal_max",
            "n_occupied_nb",
        )
    )


GI_HOT_Z = 2.576  # two-sided 99% confidence bar on the rounded z


def getis_ord(
    pts: DataFrame,
    *,
    level: int,
    k: int = 1,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores over the cell lattice — the
    standard local spatial statistic behind every "statistically
    significant hotspot" map (Getis & Ord 1992; the ArcGIS Hot Spot
    Analysis tool): for each occupied cell, how far its windowed
    density sum deviates from the global expectation, in units of the
    window-size-adjusted standard error:

        Gi* = (S_i - mean * w_i)
              / (s * sqrt((n * w_i - w_i^2) / (n - 1)))

    with raster semantics matching `focal_stats`: the population is
    the FULL n = nlat x nlon lattice (empty cells are zeros), S_i the
    (2k+1)^2 clamped/wrapped window sum, w_i the exact valid window
    size, mean = N/n and s the population std from the exact integer
    (N, sum x^2) pair.

    Output: (cell_id, n_points, focal_sum, window, gi_z, hot) with
    gi_z rounded to 6 digits and hot := gi_z > 2.576 evaluated ON the
    rounded value (so the verdict replays exactly).

    Determinism: every aggregate feeding the formula is an integer
    (counts, squared counts, window sizes); the two global scalars
    collapse to ONE tiny agg row embedded as literals (the bm25
    stance), so the per-cell expression is a fixed dataflow of
    correctly-rounded IEEE ops — no order-dependence anywhere.

    Scale shape: identical to `focal_stats` — ONE corpus exchange
    (the cell-count groupBy), grid-bounded scatter/gather for S_i,
    plus a 2-long-column global agg that rides the same count table;
    the corpus is scanned once.
    """
    from cityfinder_spark.colutils import round_digits_col
    from cityfinder_spark.geo.cells import grid_dims, ring_cells_col
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    nlat, nlon = grid_dims(level)
    n_cells = nlat * nlon
    counts = (
        pts.select(cell_col(lat_col, lon_col, level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    counts = counts.persist()
    tot, ss = (
        counts.agg(
            F.sum("n_points").cast("long"),
            F.sum(F.col("n_points") * F.col("n_points")).cast("long"),
        ).collect()[0]
    )
    mean = float(tot) / float(n_cells)
    s = ((float(ss) / float(n_cells)) - mean * mean) ** 0.5
    contrib = counts.select(
        F.explode(ring_cells_col(F.col("cell_id"), k, level)).alias("center"),
        F.col("n_points").alias("nb_points"),
    )
    focal = contrib.groupBy("center").agg(F.sum("nb_points").alias("focal_sum"))
    i = F.floor((F.col("cell_id") - F.lit(level * LEVEL_STRIDE)) / F.lit(nlon))
    rows_valid = (
        F.least(i + F.lit(k), F.lit(nlat - 1))
        - F.greatest(i - F.lit(k), F.lit(0))
        + F.lit(1)
    )
    w = (rows_valid * F.lit(2 * k + 1)).cast("long")
    wd = w.cast("double")
    gi = (F.col("focal_sum") - F.lit(mean) * wd) / (
        F.lit(s)
        * F.sqrt(
            (F.lit(float(n_cells)) * wd - wd * wd) / F.lit(float(n_cells - 1))
        )
    )
    return (
        counts.join(focal, counts["cell_id"] == focal["center"])
        .withColumn("window", w)
        .withColumn("gi_z", round_digits_col(gi, 6))
        .select(
            "cell_id",
            "n_points",
            "focal_sum",
            "window",
            "gi_z",
            (F.col("gi_z") > F.lit(GI_HOT_Z)).alias("hot"),
        )
    )


def spacetime_cube(
    points: DataFrame,
    *,
    level: int = 3,
    lat_col: str = "lat",
    lon_col: str = "lon",
    time_col: str = "month",
) -> DataFrame:
    """Space-time OLAP cube: one pass producing ALL four aggregation
    granularities over (spatial cell, time bucket) — per (cell, time),
    per cell, per time, and the grand total — via relational GROUPING
    SETS (`cube`), the serving shape for dashboard pre-aggregation
    (every drill-down level materialized from one fact scan).

    Scale shape: Spark expands the cube map-side (each input row emits
    its 4 grouping-set keys before the exchange, partial-aggregated),
    so the shuffle carries at most 4x the DISTINCT group keys — cells
    x buckets, corpus-independent — never 4x the fact rows. Rolled-up
    key columns are coalesced to -1 (never a valid cell id or month)
    so the output is NULL-free and integer-typed end to end; gid is
    the standard grouping bit-vector (spatial = MSB), matching the
    CUBE/GROUPING convention DuckDB replays exactly.
    """
    cell = cell_col(lat_col, lon_col, level)
    base = points.select(cell.alias("cell_id"), F.col(time_col))
    return (
        base.cube("cell_id", time_col)
        .agg(F.count(F.lit(1)).alias("n_points"), F.grouping_id().alias("gid"))
        .select(
            F.coalesce(F.col("cell_id"), F.lit(-1)).alias("cell_id"),
            F.coalesce(F.col(time_col), F.lit(-1)).alias(time_col),
            F.col("gid").cast("int").alias("gid"),
            "n_points",
        )
    )


def distance_transform(
    points: DataFrame,
    *,
    level: int,
    hot_threshold: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Grid distance transform — the raster proximity-map primitive:
    for every OCCUPIED cell, the Chebyshev grid distance (lon wraps)
    to the nearest HOT cell (count >= hot_threshold). Downstream of
    the same density pre-pass as hot_cells; used to grade how far any
    activity sits from the dense cores (coverage analysis, anomaly
    screens, expansion planning).

    Scale shape: ONE map-side-combined groupBy(cell) is the only
    corpus-sized exchange; the transform itself is a broadcast join
    of occupied cells x hot cells — both grid-bounded (<= nlat*nlon
    rows regardless of corpus size), min_by over integer distances.
    Output: (cell_id, n_points, d_hot); d_hot = 0 on hot cells.
    """
    from cityfinder_spark.geo.cells import grid_dims
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    nlat, nlon = grid_dims(level)
    occ = (
        points.select(cell_col(lat_col, lon_col, level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    base = F.col("cell_id") - level * LEVEL_STRIDE
    cells = occ.select(
        "cell_id",
        "n_points",
        (base / nlon).cast("long").alias("i"),
        F.pmod(base, F.lit(nlon)).alias("j"),
    )
    hot = cells.where(F.col("n_points") >= hot_threshold).select(
        F.col("i").alias("hi"), F.col("j").alias("hj")
    )
    dj = F.abs(F.col("j") - F.col("hj"))
    cheb = F.greatest(
        F.abs(F.col("i") - F.col("hi")), F.least(dj, F.lit(nlon) - dj)
    )
    return (
        cells.crossJoin(F.broadcast(hot))
        .groupBy("cell_id", "n_points")
        .agg(F.min(cheb).alias("d_hot"))
    )
