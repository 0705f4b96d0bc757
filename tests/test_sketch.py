"""HyperLogLog distinct sketch (operators/sketch.py): register math,
partition independence, estimate accuracy, and the codegen guarantee
of the production hash mode."""

from __future__ import annotations

import pandas as pd
import pytest

from cityfinder_spark.operators.sketch import (
    hll_distinct,
    hll_registers,
    hll_vs_exact,
)


def _df(spark, n_ids, rows_per_id=3, parts=4):
    pdf = pd.DataFrame(
        {
            "grp": ["g" + str(i % 2) for i in range(n_ids * rows_per_id)],
            "uid": [i % n_ids for i in range(n_ids * rows_per_id)],
        }
    )
    return spark.createDataFrame(pdf).repartition(parts)


def _splitmix_ref(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) % 2**64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % 2**64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % 2**64
    return z ^ (z >> 31)


@pytest.mark.parametrize("hash_mode", ["xxhash64", "splitmix"])
def test_registers_partition_independent(spark, hash_mode):
    a = hll_registers(
        _df(spark, 500, parts=2), "grp", "uid", hash_mode=hash_mode
    )
    b = hll_registers(
        _df(spark, 500, parts=16), "grp", "uid", hash_mode=hash_mode
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_splitmix_registers_match_python_replay(spark):
    regs = hll_registers(
        _df(spark, 200, rows_per_id=1), "grp", "uid", hash_mode="splitmix"
    ).collect()
    # python replay
    expect: dict[tuple[str, int], int] = {}
    for i in range(200):
        grp = "g" + str(i % 2)
        z = _splitmix_ref(i)
        bucket, w = z >> 56, z & ((1 << 56) - 1)
        rho = 57 if w == 0 else ((w & -w).bit_length() - 1) + 1
        k = (grp, bucket)
        expect[k] = max(expect.get(k, 0), rho)
    got = {(r.grp, r.bucket): r.rho for r in regs}
    assert got == expect


@pytest.mark.parametrize("hash_mode", ["xxhash64", "splitmix"])
def test_estimate_accuracy(spark, hash_mode):
    # duplicates must not move the estimate; m=256 -> sigma ~6.5%
    out = hll_vs_exact(
        _df(spark, 2000, rows_per_id=5), "grp", "uid", hash_mode=hash_mode
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.exact_distinct == 1000
        assert abs(r.rel_err) < 0.25, (hash_mode, r)


def test_xxhash_mode_is_pure_codegen(spark):
    plan = hll_distinct(
        _df(spark, 100), "grp", "uid", hash_mode="xxhash64"
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python anywhere in the plan


def test_tiny_sets_hit_documented_raw_floor(spark):
    # 5 distinct ids per group: the raw estimator (linear-counting
    # correction deliberately omitted — ln() is not cross-engine
    # stable) floors near alpha*m ~ 184 when registers are nearly
    # empty. Pin that envelope: sketches are for large cardinalities;
    # small groups use exact counting.
    out = hll_distinct(
        _df(spark, 5, rows_per_id=10), "grp", "uid"
    ).collect()
    for r in out:
        assert r.n_zero >= 250  # nearly all registers untouched
        assert 150 < r.est_distinct < 230


# ------------------------------------------------------- count-min sketch


def _keyed(spark, n_keys=400, parts=4):
    """Zipf-ish key stream: key k appears (n_keys // (k+1)) + 1 times."""
    rows = []
    for k in range(n_keys):
        rows.extend([(f"key_{k}",)] * (n_keys // (k + 1) + 1))
    return spark.createDataFrame(rows, "shingle string").repartition(parts)


def test_cms_never_underestimates(spark):
    """The one-sided CMS guarantee, row-wise, at a width small enough
    to force collisions."""
    from cityfinder_spark.operators.sketch import cms_vs_exact

    out = cms_vs_exact(_keyed(spark), "shingle", depth=4, width=64).collect()
    assert len(out) == 400
    assert all(r.overest >= 0 for r in out)
    assert any(r.overest > 0 for r in out)  # width=64 must collide


def test_cms_exact_when_collision_free(spark):
    """Wide enough sketch -> est == exact for every key."""
    from cityfinder_spark.operators.sketch import cms_vs_exact

    out = cms_vs_exact(
        _keyed(spark, n_keys=50), "shingle", depth=4, width=65536
    ).collect()
    assert all(r.overest == 0 for r in out)


def test_cms_partition_independent(spark):
    from cityfinder_spark.operators.sketch import cms_vs_exact

    a = sorted(map(tuple, cms_vs_exact(
        _keyed(spark, parts=1), "shingle", depth=4, width=256).collect()))
    b = sorted(map(tuple, cms_vs_exact(
        _keyed(spark, parts=13), "shingle", depth=4, width=256).collect()))
    assert a == b


def test_heavy_hitters_superset_no_false_negatives(spark):
    """Every true-frequent key appears; FPs allowed but bounded here."""
    from cityfinder_spark.operators.sketch import heavy_hitters

    df = _keyed(spark)
    exact = {r.shingle: r.cnt for r in
             df.groupBy("shingle").count().withColumnRenamed("count", "cnt").collect()}
    got = {r.shingle for r in
           heavy_hitters(df, "shingle", threshold=20, depth=4, width=4096).collect()}
    true_hh = {k for k, c in exact.items() if c >= 20}
    assert true_hh <= got
    assert len(got) <= len(true_hh) + 20  # wide sketch: few FPs


def test_cms_counters_merge_by_addition(spark):
    """Counters over a union == counter-wise sum of the two halves —
    the property that makes the sketch stream/day-partition mergeable."""
    from pyspark.sql import functions as F
    from cityfinder_spark.operators.sketch import cms_counters

    a = spark.createDataFrame([(f"k{i}",) for i in range(50) for _ in range(3)],
                              "shingle string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(50, 90) for _ in range(5)],
                              "shingle string")
    whole = cms_counters(a.union(b), "shingle", depth=4, width=128)
    summed = (
        cms_counters(a, "shingle", depth=4, width=128)
        .union(cms_counters(b, "shingle", depth=4, width=128))
        .groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, summed.collect()))
