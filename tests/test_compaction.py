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


def test_compaction_apply_rewrites_one_file_per_bin(spark, tmp_path):
    """The rewrite action: every merge group lands as EXACTLY one
    parquet file, the audit is green on every bin, and the rewritten
    table holds the source rows verbatim (multiset equality over all
    payload columns — no loss, no duplication)."""
    from cityfinder_spark.sinks import compaction_apply, compaction_plan

    src = _points(spark, SF_DIR).select("pt_id", "lat", "lon", "caption")
    path = os.path.join(str(tmp_path), "compactable")
    out = os.path.join(str(tmp_path), "compacted")
    write_compactable(src, path, max_records_per_file=COMPACT_CAP)
    plan = {r.bin_id: r for r in compaction_plan(spark, path, COMPACT_TARGET).collect()}
    audit = compaction_apply(spark, path, out, COMPACT_TARGET).collect()
    assert len(audit) == len(plan) and len(audit) > 1
    for r in audit:
        p = plan[r.bin_id]
        assert r.n_files == 1, r  # the merge actually merged
        assert r.rows_ok and r.n_rows == p.n_rows
        assert r.planned_files == p.n_files
        assert (r.min_cell, r.max_cell) == (p.min_cell, p.max_cell)
    # some bin really merged multiple small files
    assert any(r.planned_files > 1 for r in audit)
    # physical file count shrank to the bin count
    back = spark.read.parquet(out)
    n_out_files = back.select("_metadata.file_path").distinct().count()
    assert n_out_files == len(audit)
    # value proof: the rewritten rows ARE the source rows
    src_rows = sorted(map(tuple, src.collect()))
    out_rows = sorted(map(tuple, back.select("pt_id", "lat", "lon", "caption").collect()))
    assert out_rows == src_rows


def test_compaction_apply_contract_key_matches_oracle_shape(spark):
    """The driver-gated key: audit green at contract scale, and the
    column set matches the oracle's."""
    from cityfinder_spark.contract import q_compaction_apply

    rows = q_compaction_apply(spark, SF_DIR).collect()
    assert rows
    assert rows[0].asDict().keys() == {
        "bin_id", "n_files", "n_rows", "min_cell", "max_cell",
        "planned_files", "rows_ok",
    }
    assert all(r.n_files == 1 and r.rows_ok for r in rows)
