"""Skew ops (salting, adaptive cell split) + checkpoint/lineage resume."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.operators.nearest import brute_force_nearest
from cityfinder_spark.operators.skew import (
    build_adaptive_cover,
    detect_hot_cells,
    nearest_city_join_adaptive,
    salted_agg,
)
from cityfinder_spark.plans.checkpoint import (
    partition_metrics,
    read_result,
    run_resumable,
)


def _clustered_cities(spark, n_hot=400, n_sparse=100):
    """Cities hyper-concentrated around one spot (dense urban cell)."""
    rng = np.random.default_rng(5)
    rows = [
        (i, f"hot{i}", 40.7 + float(rng.uniform(-0.5, 0.5)),
         -74.0 + float(rng.uniform(-0.5, 0.5)), "US")
        for i in range(n_hot)
    ] + [
        (n_hot + i, f"sp{i}", float(rng.uniform(-80, 80)),
         float(rng.uniform(-180, 180)), "ZZ")
        for i in range(n_sparse)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["city_id", "name", "lat", "lon", "country"])
    )


def test_detect_hot_cells(spark):
    pts = spark.createDataFrame(
        pd.DataFrame(
            [(i, 40.7, -74.0) for i in range(50)] + [(100 + i, float(i), 10.0) for i in range(5)],
            columns=["pt_id", "lat", "lon"],
        )
    )
    hot = detect_hot_cells(pts, level=6, threshold=40).collect()
    assert len(hot) == 1 and hot[0]["n_points"] == 50


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": range(1000), "k": ["hot"] * 900 + ["cold"] * 100, "v": [1.0] * 1000}
        )
    )
    got = {r["k"]: (r["n_rows"], r["sum_value"]) for r in salted_agg(df, "k", "v", "id").collect()}
    assert got == {"hot": (900, 900.0), "cold": (100, 100.0)}


def test_adaptive_cover_splits_hot_cells(spark):
    cities = _clustered_cities(spark)
    cover_ok, cover_fine, fine_level, fine_ring = build_adaptive_cover(
        cities, base_level=4, ring=1, max_per_cell=64
    )
    assert fine_level == 6 and fine_ring == 4
    # base cover must no longer contain any overfull cell
    assert cover_ok.where(F.size("cands") > 64 * 9).count() == 0
    assert cover_fine.count() > 0


def test_adaptive_join_equals_bruteforce(spark):
    cities = _clustered_cities(spark)
    rng = np.random.default_rng(17)
    pts = spark.createDataFrame(
        pd.DataFrame(
            # half the queries inside the hot blob, half global
            [(i, 40.7 + float(rng.uniform(-0.6, 0.6)), -74.0 + float(rng.uniform(-0.6, 0.6)))
             for i in range(150)]
            + [(1000 + i, float(rng.uniform(-89, 89)), float(rng.uniform(-180, 180)))
               for i in range(150)],
            columns=["pt_id", "lat", "lon"],
        )
    )
    got = (
        nearest_city_join_adaptive(pts, cities, base_level=4, max_per_cell=64)
        .select("pt_id", "city_id", "dist_km").orderBy("pt_id").collect()
    )
    want = (
        brute_force_nearest(pts, cities)
        .select("pt_id", F.col("__best.city_id").alias("city_id"),
                F.col("__best.dist_km").alias("dist_km"))
        .orderBy("pt_id").collect()
    )
    assert len(got) == 300
    for g, w in zip(got, want):
        assert (g["pt_id"], g["city_id"], g["dist_km"]) == (
            w["pt_id"], w["city_id"], w["dist_km"])


def test_partition_metrics(spark):
    df = spark.range(0, 1000, 1, 4)
    m = partition_metrics(df).collect()
    assert sum(r["rows"] for r in m) == 1000
    assert len(m) == 4


def test_resumable_rerun_skips_completed(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    src = spark.range(0, 2000, 1, 4).withColumnRenamed("id", "pt_id")

    def process(df):
        return df.withColumn("double", F.col("pt_id") * 2)

    # first run crashes after 3 of 8 buckets
    first = run_resumable(
        spark, src, process, out, stage="s1", id_col="pt_id", n_buckets=8, fail_after=3
    )
    assert len(first) == 3
    # mid-run the staged copy exists and per-bucket reads are partition-
    # PRUNED (without staging, where(bucket==b) on a hash column scans
    # the full source once per bucket — O(n_buckets x input) at scale)
    import os

    assert os.path.exists(f"{out}/staged/_SUCCESS")
    staged = spark.read.parquet(f"{out}/staged")
    plan = staged.where(F.col("bucket") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan
    # rerun resumes: only the remaining 5 buckets are processed
    second = run_resumable(
        spark, src, process, out, stage="s1", id_col="pt_id", n_buckets=8
    )
    assert len(second) == 5
    assert set(first) | set(second) == set(range(8))
    assert set(first).isdisjoint(second)
    total = read_result(spark, out)
    assert total.count() == 2000
    assert total.agg(F.sum("double")).collect()[0][0] == 2 * sum(range(2000))
    # manifest lineage: rows per bucket sum to the input size (the
    # __meta__ row carrying n_buckets is excluded via bucket == -1)
    man = spark.read.parquet(f"{out}/manifest")
    assert man.where(F.col("bucket") >= 0).agg(F.sum("rows")).collect()[0][0] == 2000
    meta = man.where(F.col("stage") == "__meta__:s1").collect()
    assert len(meta) == 1 and meta[0]["rows"] == 8
    # completion deletes the staged working copy (no duplicate of the
    # input left on disk)
    assert not os.path.exists(f"{out}/staged")
    # third run: nothing left to do
    assert run_resumable(spark, src, process, out, stage="s1", id_col="pt_id", n_buckets=8) == []


def test_resumable_refuses_changed_source(spark, tmp_path):
    """If the source changes between crash and resume, the staged-copy
    fingerprint check must refuse rather than silently process stale
    data against a half-complete manifest."""
    import pytest

    out = str(tmp_path / "ckpt")
    src = spark.range(0, 800, 1, 4).withColumnRenamed("id", "pt_id")

    def process(df):
        return df

    run_resumable(
        spark, src, process, out, stage="s", id_col="pt_id", n_buckets=4, fail_after=2
    )
    changed = spark.range(0, 801, 1, 4).withColumnRenamed("id", "pt_id")
    with pytest.raises(RuntimeError, match="fingerprint mismatch"):
        run_resumable(
            spark, changed, process, out, stage="s", id_col="pt_id", n_buckets=4
        )


def test_resumable_refuses_changed_payload_same_ids(spark, tmp_path):
    """The resume guard fingerprints ALL columns, not just the id: a
    re-crawled source with the same ids but new payload must be
    refused (id-only XOR would pass it straight through)."""
    import pytest

    out = str(tmp_path / "ckpt")
    src = (
        spark.range(0, 800, 1, 4)
        .withColumnRenamed("id", "pt_id")
        .withColumn("payload", F.col("pt_id") * 10)
    )

    run_resumable(
        spark, src, lambda df: df, out, stage="s", id_col="pt_id",
        n_buckets=4, fail_after=2,
    )
    same_ids_new_payload = (
        spark.range(0, 800, 1, 4)
        .withColumnRenamed("id", "pt_id")
        .withColumn("payload", F.col("pt_id") * 11)
    )
    with pytest.raises(RuntimeError, match="fingerprint mismatch"):
        run_resumable(
            spark, same_ids_new_payload, lambda df: df, out, stage="s",
            id_col="pt_id", n_buckets=4,
        )


def test_resumable_refuses_duplicated_rows_even_count(spark, tmp_path):
    """XOR cancels even-count duplicate additions; the row-count compare
    must catch a source that doubled every row."""
    import pytest

    out = str(tmp_path / "ckpt")
    src = spark.range(0, 400, 1, 4).withColumnRenamed("id", "pt_id")
    run_resumable(
        spark, src, lambda df: df, out, stage="s", id_col="pt_id",
        n_buckets=4, fail_after=1,
    )
    doubled = src.union(src)
    with pytest.raises(RuntimeError, match="fingerprint mismatch"):
        run_resumable(
            spark, doubled, lambda df: df, out, stage="s",
            id_col="pt_id", n_buckets=4,
        )


def test_resumable_refuses_n_buckets_change(spark, tmp_path):
    """Resuming with a different n_buckets must refuse: a smaller value
    would report completion while staged buckets beyond the new range
    are never processed."""
    import pytest

    out = str(tmp_path / "ckpt")
    src = spark.range(0, 800, 1, 4).withColumnRenamed("id", "pt_id")
    run_resumable(
        spark, src, lambda df: df, out, stage="s", id_col="pt_id",
        n_buckets=8, fail_after=2,
    )
    with pytest.raises(RuntimeError, match="n_buckets mismatch"):
        run_resumable(
            spark, src, lambda df: df, out, stage="s", id_col="pt_id",
            n_buckets=4,
        )
    # the original value still resumes to completion
    rest = run_resumable(
        spark, src, lambda df: df, out, stage="s", id_col="pt_id", n_buckets=8
    )
    assert len(rest) == 6
    assert read_result(spark, out).count() == 800


def test_resumable_empty_source(spark, tmp_path):
    """A 0-row source must complete (empty staged dir reads back via
    the explicit schema, no inference failure)."""
    out = str(tmp_path / "ckpt")
    src = spark.range(0, 0, 1, 2).withColumnRenamed("id", "pt_id")

    done = run_resumable(
        spark, src, process_fn=lambda df: df, out_dir=out, stage="s",
        id_col="pt_id", n_buckets=4,
    )
    assert done == [0, 1, 2, 3]


def test_resumable_unstaged_matches_staged(spark, tmp_path):
    """stage_input=False (for sources already bucketed in storage)
    must produce identical data + manifest totals."""
    src = spark.range(0, 500, 1, 4).withColumnRenamed("id", "pt_id")

    def process(df):
        return df.withColumn("double", F.col("pt_id") * 2)

    outs = {}
    for label, staged in (("a", True), ("b", False)):
        out = str(tmp_path / f"ckpt_{label}")
        run_resumable(
            spark, src, process, out, stage="s", id_col="pt_id",
            n_buckets=4, stage_input=staged,
        )
        outs[label] = sorted(
            (r["pt_id"], r["double"]) for r in read_result(spark, out).collect()
        )
    assert outs["a"] == outs["b"] and len(outs["a"]) == 500


def test_adaptive_strategies_agree(spark):
    """arrow CityIndex splitting and the jvm two-cover join must give
    identical rows (hot NYC blob forces the fine path)."""
    cities = _clustered_cities(spark)
    rng = np.random.default_rng(29)
    pts = spark.createDataFrame(
        pd.DataFrame(
            [(i, 40.7 + float(rng.uniform(-0.6, 0.6)), -74.0 + float(rng.uniform(-0.6, 0.6)))
             for i in range(100)]
            + [(1000 + i, float(rng.uniform(-89, 89)), float(rng.uniform(-180, 180)))
               for i in range(100)],
            columns=["pt_id", "lat", "lon"],
        )
    )
    a = (
        nearest_city_join_adaptive(pts, cities, base_level=4, max_per_cell=64, strategy="arrow")
        .orderBy("pt_id").collect()
    )
    j = (
        nearest_city_join_adaptive(pts, cities, base_level=4, max_per_cell=64, strategy="jvm")
        .orderBy("pt_id").collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in j]


def test_city_index_adaptive_split_routes_hot_cells(spark):
    """Unit: the CityIndex fine cover exists exactly for hot cells and
    lookup() routes hot-cell points to slices past the base cover."""
    from cityfinder_spark.operators.nearest_arrow import build_city_index

    cities = _clustered_cities(spark)
    idx = build_city_index(cities, level=4, ring=1, max_per_cell=64)
    assert len(idx.hot_cells) > 0 and len(idx.fine_cells) > 0
    base_len = idx.cover_offsets[-1]
    # a point in the NYC blob must read from the fine region
    s, c = idx.lookup(np.array([40.7]), np.array([-74.0]))
    assert c[0] > 0 and s[0] >= base_len
    # a remote point stays on the base cover
    s2, c2 = idx.lookup(np.array([-40.0]), np.array([100.0]))
    assert s2[0] < base_len
