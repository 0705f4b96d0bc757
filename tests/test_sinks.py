"""Partition-aware sinks: directory layout, skew-capped files, and
partition pruning on regional reads."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cityfinder_spark import contract
from cityfinder_spark.operators.nearest import nearest_city_join
from cityfinder_spark.sinks import (
    read_assignments_region,
    write_assignments,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _assignments(spark):
    pts = contract._points(spark, SF)
    cities = contract._cities(spark, SF)
    return nearest_city_join(pts, cities).select(
        "pt_id", "lat", "lon", "city_id", "dist_km"
    )


def test_write_assignments_partitions_by_cell(spark, tmp_path):
    out = str(tmp_path / "assign")
    asg = _assignments(spark)
    write_assignments(asg, out, partition_level=2)
    dirs = sorted(glob.glob(os.path.join(out, "part_cell=*")))
    assert 1 < len(dirs) <= 2 * 4**2  # bounded directory cardinality
    back = spark.read.parquet(out)
    assert back.count() == asg.count()


def test_regional_read_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "assign")
    write_assignments(_assignments(spark), out, partition_level=2)
    region = read_assignments_region(spark, out, 30.0, 60.0, -10.0, 40.0,
                                     partition_level=2)
    # correct rows: equals the full-scan filter
    full = spark.read.parquet(out).where(
        F.col("lat").between(30.0, 60.0) & F.col("lon").between(-10.0, 40.0)
    )
    assert region.count() == full.count() > 0
    # pruned scan: the physical plan's partition filter keeps the scan
    # away from out-of-region directories
    plan = region._jdf.queryExecution().executedPlan().toString()
    assert "part_cell" in plan


def test_max_records_per_file_splits_hot_partitions(spark, tmp_path):
    out = str(tmp_path / "split")
    df = spark.range(0, 5000).withColumn("k", F.lit(1))
    write_partitioned(df, out, ["k"], max_records_per_file=1000)
    files = glob.glob(os.path.join(out, "k=1", "*.parquet"))
    assert len(files) >= 5  # 5000 rows / 1000 cap
