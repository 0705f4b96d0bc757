"""Geo-blocked perceptual near-dup (operators/images_ops.py::
geo_phash_near_dup): planted re-uploads are caught, distant
visual twins are NOT merged, and the plan is cell-blocked."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cityfinder_spark.contract import q_geo_image_dedup, q_phash_near_dup
from cityfinder_spark.operators.images_ops import geo_phash_near_dup
from tests.conftest import SF_DIR


def test_planted_dups_found_and_geo_gate_bites(spark):
    """Every emitted pair is visually near AND spatially near; the
    geo gate strictly shrinks the global phash pair set (visual
    twins at different sites are rejected)."""
    pairs = q_geo_image_dedup(spark, SF_DIR).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.hamming <= 3 and r.dist_km <= 1.0
    global_pairs = q_phash_near_dup(spark, SF_DIR).count()
    assert len(pairs) < global_pairs  # the location constraint bites
    # the planted 'dup' re-uploads sit a jittered few hundred meters
    # from their base image: base->dup pairs dominate the output
    base_dup = [r for r in pairs if r.img_a.startswith("img") and r.img_b.startswith("dup")
                or r.img_a.startswith("dup") and r.img_b.startswith("img")]
    assert len(base_dup) > 0


def test_pair_uniqueness_and_symmetry(spark):
    """Each unordered pair appears exactly once, ordered img_a < img_b
    (b's unique cell occurs at most once in a's ring-1 list)."""
    rows = q_geo_image_dedup(spark, SF_DIR).collect()
    keys = [(r.img_a, r.img_b) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_blocking_plan_is_hash_join(spark):
    """The self-join is a hash equi-join on the exploded ring cells —
    no cartesian, no nested loop, no Python in the join path."""
    sig = spark.range(100).select(
        F.concat(F.lit("im"), F.col("id")).alias("image_id"),
        (F.col("id") * 7919).alias("phash"),
        (F.col("id") % 90 - 45).cast("double").alias("lat"),
        (F.col("id") % 180 - 90).cast("double").alias("lon"),
    )
    plan = (
        geo_phash_near_dup(sig)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
