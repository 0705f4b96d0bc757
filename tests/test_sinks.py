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


def test_regional_read_antimeridian_wrap(spark, tmp_path):
    """lon_min > lon_max = a box crossing the antimeridian: rows on
    BOTH sides of the seam come back, nothing in between."""
    out = str(tmp_path / "assign")
    rows = [(1, 10.0, 175.0), (2, 10.0, -175.0), (3, 10.0, 0.0),
            (4, 80.0, 175.0)]
    df = spark.createDataFrame(rows, "pt_id int, lat double, lon double")
    write_assignments(df, out, partition_level=2)
    region = read_assignments_region(spark, out, 0.0, 20.0, 170.0, -170.0,
                                     partition_level=2)
    assert sorted(r.pt_id for r in region.collect()) == [1, 2]


def test_max_records_per_file_splits_hot_partitions(spark, tmp_path):
    out = str(tmp_path / "split")
    df = spark.range(0, 5000).withColumn("k", F.lit(1))
    write_partitioned(df, out, ["k"], max_records_per_file=1000)
    files = glob.glob(os.path.join(out, "k=1", "*.parquet"))
    assert len(files) >= 5  # 5000 rows / 1000 cap


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    """Two tables bucketed on the join key: the sort-merge join reads
    buckets directly — NO Exchange in the physical plan (the shuffle
    was paid once at write time)."""
    from cityfinder_spark.sinks import write_bucketed_table

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("text_len"))
    write_bucketed_table(docs.select("doc_id", "lang"), "b_docs", "doc_id",
                         n_buckets=8, sort_col="doc_id",
                         path=str(tmp_path / "b_docs"))
    write_bucketed_table(stats, "b_stats", "doc_id",
                         n_buckets=8, sort_col="doc_id",
                         path=str(tmp_path / "b_stats"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would hide the point:
        # at 10^12 rows neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # no shuffle
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


# ------------------------------------------------------------ z-order sink


def test_zordered_write_read_equals_plain_filter(spark, tmp_path):
    from pyspark.sql import functions as F

    from cityfinder_spark.sinks import read_zordered_bbox, write_zordered

    pts = spark.range(4000).select(
        F.col("id").alias("pt_id"),
        ((F.col("id") * 37 % 17000) / 100.0 - 85.0).alias("lat"),
        ((F.col("id") * 91 % 35000) / 100.0 - 175.0).alias("lon"),
    )
    path = str(tmp_path / "zord")
    write_zordered(pts, path)
    got = sorted(
        (r["pt_id"],)
        for r in read_zordered_bbox(spark, path, 10.0, 40.0, -30.0, 55.0).collect()
    )
    want = sorted(
        (r["pt_id"],)
        for r in pts.where(
            (F.col("lat") >= 10.0) & (F.col("lat") <= 40.0)
            & (F.col("lon") >= -30.0) & (F.col("lon") <= 55.0)
        ).collect()
    )
    assert got == want and len(got) > 0


def test_zordered_read_handles_antimeridian_wrap(spark, tmp_path):
    from pyspark.sql import functions as F

    from cityfinder_spark.sinks import read_zordered_bbox, write_zordered

    pts = spark.createDataFrame(
        [(1, 0.0, 170.0), (2, 0.0, -170.0), (3, 0.0, 0.0)],
        "pt_id long, lat double, lon double",
    )
    path = str(tmp_path / "zwrap")
    write_zordered(pts, path)
    got = {r["pt_id"]
           for r in read_zordered_bbox(spark, path, -10.0, 10.0, 160.0, -160.0).collect()}
    assert got == {1, 2}


def test_zordered_scan_pushes_zorder_ranges(spark, tmp_path):
    """The pruning mechanics: the z-range disjunction must reach the
    parquet scan as a pushed filter (row-group min/max on the sorted
    zorder column is what skips data at scale)."""
    from pyspark.sql import functions as F

    from cityfinder_spark.sinks import read_zordered_bbox, write_zordered

    pts = spark.range(1000).select(
        F.col("id").alias("pt_id"),
        ((F.col("id") % 170) - 85.0).cast("double").alias("lat"),
        ((F.col("id") % 360) - 180.0).cast("double").alias("lon"),
    )
    path = str(tmp_path / "zplan")
    write_zordered(pts, path)
    df = read_zordered_bbox(spark, path, 0.0, 20.0, 0.0, 20.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "zorder" in plan.split("PushedFilters")[1][:4000]


def test_upsert_merge_last_write_wins(spark):
    """Highest version wins; updates beat base on version ties;
    inserts flow through; every surviving row keeps its own columns."""
    import pandas as pd

    from cityfinder_spark.sinks import upsert_merge

    base = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["a", "b", "c"], "version": [5, 1, 0]}
        )
    )
    upd = spark.createDataFrame(
        pd.DataFrame(
            {
                # id 1: older update loses; id 2: tie -> update wins;
                # id 3: newer wins; id 9: insert
                "doc_id": [1, 2, 3, 9],
                "text": ["a2", "b2", "c2", "i"],
                "version": [3, 1, 7, 1],
            }
        )
    )
    out = {
        r["doc_id"]: (r["text"], r["version"], r["from_update"])
        for r in upsert_merge(base, upd, "doc_id", "version").collect()
    }
    assert out == {
        1: ("a", 5, False),
        2: ("b2", 1, True),
        3: ("c2", 7, True),
        9: ("i", 1, True),
    }
