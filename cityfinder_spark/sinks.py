"""Partition-aware Parquet sinks — the output side of the 100 TB plan.

The reference writes gob blobs and a flat results.csv
(cmd/benchmark/main.go:108-143); at engine scale the assignment table
itself is 10^12 rows, so HOW it lands on disk decides whether every
downstream read is a full scan or a pruned one:

  * partition by a COARSE spatial cell (bounded directory cardinality:
    2*4^L dirs at level L, e.g. 128 at L=3) — regional consumers
    ("all assignments in this country/area") prune to the cells that
    cover their region instead of scanning the world;
  * never partition by a high-cardinality key (city_id, image_id):
    millions of directories destroys both the writers (small files)
    and the metastore;
  * cap records per file so a skewed hot cell (NYC) splits into many
    right-sized files instead of one multi-GB file that a single
    downstream task must swallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cityfinder_spark.geo.cells import cell_col

DEFAULT_PARTITION_LEVEL = 3  # 128 directories worldwide
DEFAULT_MAX_RECORDS_PER_FILE = 5_000_000


def write_partitioned(
    df: DataFrame,
    path: str,
    by: list[str],
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    mode: str = "overwrite",
) -> None:
    """Parquet write partitioned by `by`, with per-file record caps so
    partition skew becomes more files, not bigger ones."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*by)
        .parquet(path)
    )


def write_assignments(
    assignments: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    partition_level: int = DEFAULT_PARTITION_LEVEL,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Write a nearest-city assignment table partitioned by its coarse
    spatial cell: downstream regional reads prune on part_cell, and
    rows for the same area land together (spatial locality)."""
    out = assignments.withColumn(
        "part_cell", cell_col(lat_col, lon_col, partition_level)
    )
    write_partitioned(out, path, ["part_cell"], max_records_per_file)


def read_assignments_region(
    spark: SparkSession,
    path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    partition_level: int = DEFAULT_PARTITION_LEVEL,
) -> DataFrame:
    """Read only the partitions whose cells cover the lat/lon box
    (partition pruning on part_cell — the scan never touches other
    directories), then apply the exact box filter.

    lon_min > lon_max means the box crosses the antimeridian (a
    Pacific region like lon in [170, -170]): the cell cover and the
    exact filter both become the union of [lon_min, 180] and
    [-180, lon_max]."""
    import numpy as np

    from cityfinder_spark.geo.cells import cell_of_np, grid_dims

    nlat, nlon = grid_dims(partition_level)
    # Sample the box densely enough that no cell can be skipped: the
    # sampling step is < half a cell side for ANY box (2*n+2 points
    # over a span that is at most n cells wide).
    lats = np.linspace(lat_min, lat_max, 2 * nlat + 2)
    lon_spans = (
        [(lon_min, 180.0), (-180.0, lon_max)]
        if lon_min > lon_max
        else [(lon_min, lon_max)]
    )
    cells: set[int] = set()
    for lo_a, lo_b in lon_spans:
        lons = np.linspace(lo_a, lo_b, 2 * nlon + 2)
        la, lo = np.meshgrid(lats, lons, indexing="ij")
        cells.update(cell_of_np(la.ravel(), lo.ravel(), partition_level).tolist())
    df = spark.read.parquet(path).where(F.col("part_cell").isin(sorted(cells)))
    lon_pred = (
        F.col("lon").between(lon_min, 180.0) | F.col("lon").between(-180.0, lon_max)
        if lon_min > lon_max
        else F.col("lon").between(lon_min, lon_max)
    )
    return df.where(F.col("lat").between(lat_min, lat_max) & lon_pred)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted table: joins and aggregations on
    bucket_col between tables bucketed the same way need NO exchange —
    the shuffle is paid once at write time and reused by every
    downstream stage (the 'co-locate joins via bucketing' leg of the
    100 TB plan; at 10^12 rows the per-query shuffle IS the cost)."""
    w = df.write.mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    if sort_col is not None:
        w = w.bucketBy(n_buckets, bucket_col).sortBy(sort_col)
    else:
        w = w.bucketBy(n_buckets, bucket_col)
    w.format("parquet").saveAsTable(table)
