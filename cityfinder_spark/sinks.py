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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


# ---------------------------- z-order layout ----------------------------


def _z_interleave(xi: int, yi: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((xi >> b) & 1) << (2 * b)
        z |= ((yi >> b) & 1) << (2 * b + 1)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order layout write: stamp the Morton key, range-partition and
    sort by it — spatial neighbors land in the same parquet row groups,
    so file/row-group min/max statistics on `zorder` prune any
    cell/bbox/radius read. The layout cost is one range exchange + a
    per-file sort, paid once at write time; every later spatial read
    gets storage pruning for free (directory partitioning prunes at
    one coarse level; the z-sort prunes at EVERY level at once)."""
    from cityfinder_spark.geo.cells import zorder_col

    out = df.withColumn("zorder", zorder_col(lat_col, lon_col))
    (
        out.repartitionByRange(n_files, "zorder")
        .sortWithinPartitions("zorder")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_bbox_ranges(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    bits: int = 16,
    level: int = 6,
) -> list[tuple[int, int]]:
    """The bbox's covering z-key ranges at a coarse level: each
    level-`level` cell touching the box is one contiguous
    [prefix << 2(bits-level), (prefix+1) << 2(bits-level)) range
    (the z-prefix property). Exactly consistent with zorder_col:
    floor(x * 2^bits) >> (bits-L) == floor(x * 2^L)."""
    import math

    n = 1 << level
    shift = 2 * (bits - level)

    def band(lat: float) -> int:
        return min(max(math.floor((lat + 90.0) / 180.0 * n), 0), n - 1)

    def col(lon: float) -> int:
        return math.floor((lon + 180.0) / 360.0 * n) % n

    i0, i1 = band(lat_min), band(lat_max)
    j0, j1 = col(lon_min), col(lon_max)
    js = (
        list(range(j0, j1 + 1))
        if j0 <= j1
        else list(range(j0, n)) + list(range(0, j1 + 1))
    )
    return [
        (_z_interleave(j, i, level) << shift,
         (_z_interleave(j, i, level) + 1) << shift)
        for i in range(i0, i1 + 1)
        for j in js
    ]


def read_zordered_bbox(
    spark: SparkSession,
    path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    level: int = 6,
) -> DataFrame:
    """bbox read over a z-sorted table: an OR of coarse z-key ranges
    (pushed to the parquet scan, where the sorted layout makes row-
    group min/max stats skip everything outside the cover) + the exact
    box refinement on the survivors. The cover is a superset by
    construction, so the result equals a plain filter over the
    original table — which is exactly what the contract gate checks."""
    df = spark.read.parquet(path)
    ranges = zorder_bbox_ranges(lat_min, lat_max, lon_min, lon_max, level=level)
    cond = None
    for lo, hi in ranges:
        c = (F.col("zorder") >= F.lit(lo)) & (F.col("zorder") < F.lit(hi))
        cond = c if cond is None else cond | c
    lon_ok = (
        (F.col("lon") >= lon_min) & (F.col("lon") <= lon_max)
        if lon_min <= lon_max
        else (F.col("lon") >= lon_min) | (F.col("lon") <= lon_max)
    )  # antimeridian-wrapped boxes: two lon arcs
    return df.where(cond).where(
        (F.col("lat") >= lat_min) & (F.col("lat") <= lat_max) & lon_ok
    )


def upsert_merge(
    base: DataFrame,
    updates: DataFrame,
    id_col: str,
    ver_col: str,
) -> DataFrame:
    """CDC upsert (the merge-on-read compaction kernel an Iceberg/
    Delta MERGE executes): one surviving row per id from base ∪
    updates — highest `ver_col` wins, updates beat base on a version
    tie (the re-crawl-replaces-snapshot rule), and the winner keeps
    ALL its columns. Inserts (update ids absent from base) flow
    through the same path; there is no separate insert branch to
    drift.

    Scale: ONE id-keyed exchange (the ranking window) over base +
    updates — the relational minimum for a global last-write-wins
    merge. In steady state the base side is the bucketed snapshot
    (write via `write_bucketed_table` on id) and only the delta
    re-shuffles; AQE handles the size asymmetry. Output adds
    `from_update` (whether the surviving row came from the delta) so
    a merge audit is one aggregation away."""
    from pyspark.sql import Window

    a = base.withColumn("__upd", F.lit(0))
    b = updates.withColumn("__upd", F.lit(1))
    u = a.unionByName(b)
    w = Window.partitionBy(id_col).orderBy(
        F.desc(ver_col), F.desc("__upd")
    )
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .withColumn("from_update", F.col("__upd") == 1)
        .drop("__rn", "__upd")
    )


def write_compactable(
    df: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    partition_level: int = DEFAULT_PARTITION_LEVEL,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """write_assignments with a DETERMINISTIC file layout: an explicit
    repartition on part_cell keeps every cell inside one task (Spark's
    dynamic-partition writer then sorts by the partition column, so the
    record cap rolls files as ceil(n/cap) units of cap..remainder rows
    per cell) — which is what lets compaction_plan's oracle derive the
    physical file inventory from source row counts alone."""
    out = df.withColumn("part_cell", cell_col(lat_col, lon_col, partition_level))
    (
        out.repartition("part_cell")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("part_cell")
        .parquet(path)
    )


def compaction_plan(
    spark: SparkSession,
    path: str,
    target_rows: int,
) -> DataFrame:
    """Small-file compaction planner — the Iceberg `rewrite_data_files`
    maintenance shape: inventory the REAL physical files of a
    partitioned table (via the `_metadata.file_path` hidden column, so
    the plan reflects written bytes, not assumptions), then next-fit
    bin-pack file units into merge groups of ~target_rows in spatial
    order (part_cell), preserving locality in the rewritten files.

    At 10^12 rows the maintenance economics are the point: the planner
    touches only file METADATA (one |files|-sized aggregate — at 100 TB
    with 128 MB files that is ~800k slim rows), never the data; the
    rewrite itself then reads exactly the binned files. Determinism:
    units order by (part_cell, n_rows DESC) — within a cell the cap
    rolls indistinguishable cap-sized units plus one remainder, so the
    plan is a pure function of per-cell row counts and the DuckDB
    oracle replays it from the SOURCE table. A red row here means the
    written layout broke its invariant (cap overrun, cell split across
    tasks, lost file).

    Output: (bin_id, n_files, n_rows, min_cell, max_cell).
    """
    return _compaction_units(spark, path, target_rows).groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("n_rows"),
        F.min("part_cell").alias("min_cell"),
        F.max("part_cell").alias("max_cell"),
    )


def _compaction_units(
    spark: SparkSession, path: str, target_rows: int
) -> DataFrame:
    """Per-file merge-group assignment: (fp, part_cell, n_rows,
    bin_id) — the file-level plan compaction_plan aggregates and
    compaction_apply executes. Metadata-only (one |files|-sized
    aggregate over the hidden `_metadata.file_path`)."""
    files = (
        spark.read.parquet(path)
        .select(
            F.col("part_cell").cast("long").alias("part_cell"),
            F.col("_metadata.file_path").alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.first("part_cell").alias("part_cell"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    w = Window.orderBy("part_cell", F.desc("n_rows"), "fp")
    units = files.select(
        "fp",
        "part_cell",
        "n_rows",
        (
            F.sum("n_rows").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("n_rows")
        ).alias("cum_before"),
    )
    return units.select(
        "fp",
        "part_cell",
        "n_rows",
        F.floor(F.col("cum_before") / F.lit(target_rows)).alias("bin_id"),
    )


def compaction_apply(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows: int,
) -> DataFrame:
    """EXECUTE the compaction plan — the Iceberg `rewrite_data_files`
    action itself, not just its planner: rewrite each planned merge
    group into exactly one file and PROVE the new layout against the
    plan from the real rewritten `_metadata` inventory.

    Mechanics: the per-file bin map (_compaction_units — metadata-
    sized) broadcast-joins the table on the hidden file path, the data
    repartitions BY BIN (hash on bin_id puts every bin wholly inside
    one task — the single-writer-per-bin guarantee) and writes
    partitioned by bin_id with no record cap, so each merge group
    lands as ONE parquet file in cell-sorted spatial order. Only the
    binned files' data is read — at 100 TB the rewrite pays exactly
    the planned bytes, and the audit pays one metadata aggregate per
    side.

    Returns the audit, one row per bin, every column replayable from
    source row counts alone:
      (bin_id, n_files, n_rows, min_cell, max_cell, planned_files,
       rows_ok)
    where n_files counts the REWRITTEN files of the bin (must be 1),
    n_rows/min_cell/max_cell are read back from the rewritten table,
    planned_files is the pre-compaction file count the bin merged,
    and rows_ok compares read-back rows to planned rows. A red row
    means the rewrite lost/duplicated data or split a merge group."""
    units = _compaction_units(spark, path, target_rows)
    plan = units.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("planned_files"),
        F.sum("n_rows").alias("planned_rows"),
    )
    data = (
        spark.read.parquet(path)
        .withColumn("fp", F.col("_metadata.file_path"))
        .join(F.broadcast(units.select("fp", "bin_id")), "fp")
        .drop("fp")
    )
    (
        data.repartition("bin_id")
        .write.mode("overwrite")
        .partitionBy("bin_id")
        .parquet(out_path)
    )
    audit = (
        spark.read.parquet(out_path)
        .select(
            F.col("bin_id").cast("long").alias("bin_id"),
            F.col("part_cell").cast("long").alias("part_cell"),
            F.col("_metadata.file_path").alias("fp"),
        )
        .groupBy("bin_id")
        .agg(
            F.countDistinct("fp").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("part_cell").alias("min_cell"),
            F.max("part_cell").alias("max_cell"),
        )
    )
    return audit.join(F.broadcast(plan), "bin_id").select(
        "bin_id",
        "n_files",
        "n_rows",
        "min_cell",
        "max_cell",
        "planned_files",
        (F.col("n_rows") == F.col("planned_rows")).alias("rows_ok"),
    )
