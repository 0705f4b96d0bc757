"""Distinct-count sketches (HyperLogLog) for 100 TB cardinality jobs.

"How many distinct users/domains/documents per group" at corpus scale
is the canonical sketch job: the exact answer needs a shuffle of every
distinct key; the HLL answer shuffles (group, bucket, max_rho) — at
p=8 that is <= 256 tiny rows per group REGARDLESS of input size, and
registers merge associatively (stream-safe, union-able across days).

Spark ships approx_count_distinct (HLL++), but its register layout is
opaque and its result is not reproducible against an independent
engine. This operator IS reproducible: the register update uses
trailing-zero rank (rho = tz(w)+1 over the low 56 hash bits — the
Flajolet bit-pattern observable; bits are iid, so trailing zeros are
as valid as leading and, unlike them, exactly SQL-expressible via
bit_count((w & -w) - 1)), and the estimator is the plain harmonic-mean
HLL formula computed over an EXACT integer register sum
(sum of 2^(57-rho) held in DECIMAL(38,0) — never an FP accumulation,
so the result is order- and partition-independent and value-hashes
against a DuckDB replay).

Two hash modes:
  * "xxhash64" (default): F.xxhash64 — the whole operator is JVM
    whole-stage codegen, zero Python. Production path.
  * "splitmix": splitmix64 via one Arrow-vectorized pandas UDF — the
    portable hash the DuckDB oracle replays bit-exactly with HUGEINT
    modular arithmetic (contract._duck_mix64). Gate path.
Both feed the same Column-expression register/estimator pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

WBITS_TOTAL = 64


def splitmix64_col() -> "F.pandas_udf":
    """splitmix64 over an int64 column (Arrow-vectorized NumPy,
    uint64 wraparound semantics), returned as signed int64 —
    bit-identical to codecs/fakeimage._mix64 and to the DuckDB
    HUGEINT replay in contract._duck_mix64."""

    @F.pandas_udf("long")
    def mix(x: pd.Series) -> pd.Series:
        z = x.to_numpy(np.int64).astype(np.uint64)
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return pd.Series(z.astype(np.int64))

    return mix


def _bucket_rho(h: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) from a 64-bit hash held as signed long: bucket =
    top p bits (logical shift), w = low 64-p bits, rho = trailing
    zeros of w + 1 (w == 0 -> 64-p+1). Pure codegen bit ops."""
    wbits = WBITS_TOTAL - p
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    bucket = F.shiftrightunsigned(h, wbits)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    p: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The mergeable sketch: (group, bucket, rho) with rho = register
    max. ONE map-side-combined exchange carrying <= 2^p rows per group
    (registers merge with MAX, so partial aggregation collapses each
    task's output before the shuffle — the whole point at 100 TB)."""
    if hash_mode == "xxhash64":
        h = F.xxhash64(F.col(id_col))
    elif hash_mode == "splitmix":
        h = splitmix64_col()(F.col(id_col).cast("long"))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    bucket, rho = _bucket_rho(h, p)
    return (
        df.select(
            F.col(group_col).alias("grp"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def _estimate(registers: DataFrame, p: int) -> DataFrame:
    """Harmonic-mean HLL estimate from registers, with the integer
    register sum S = sum(2^(wbits+1-rho)) + zero_buckets * 2^(wbits+1)
    held exactly in DECIMAL(38,0). est = alpha_m * m^2 * 2^(wbits+1)/S
    — one double division at the end, identical IEEE sequence in the
    SQL replay. (Raw estimator only, no small/large-range correction:
    corrections need ln(), whose libm rounding is not cross-engine
    stable; the raw estimate is the value-hashable contract.)"""
    m = 1 << p
    wbits = WBITS_TOTAL - p
    # shiftleft's python wrapper takes only a literal shift; the SQL
    # form accepts a column expression
    term = F.expr(
        f"cast(shiftleft(cast(1 as bigint), {wbits + 1} - rho)"
        " as decimal(38,0))"
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    per = registers.groupBy("grp").agg(
        F.sum(term).alias("s_present"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_zero"),
    )
    s_total = (
        F.col("s_present")
        + F.col("n_zero").cast("decimal(38,0)")
        * F.lit(1 << (wbits + 1)).cast("decimal(38,0)")
    ).cast("double")
    est = (
        alpha * F.lit(float(m) * float(m)) * F.lit(float(1 << (wbits + 1)))
    ) / s_total
    return per.select("grp", "n_zero", est.alias("est_raw"))


def hll_distinct(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    p: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Grouped distinct-count estimate: (grp, n_zero, est_distinct).
    Exchange volume: register rows only (<= 2^p per group)."""
    from cityfinder_spark.colutils import round_digits_col

    regs = hll_registers(df, group_col, id_col, p=p, hash_mode=hash_mode)
    out = _estimate(regs, p)
    return out.select(
        "grp", "n_zero", round_digits_col(F.col("est_raw"), 6).alias("est_distinct")
    )


def finish_sketch(
    registers: DataFrame,
    exact_src: DataFrame,
    group_col: str,
    id_col: str,
    *,
    p: int = 8,
) -> DataFrame:
    """Turn a registers table (grp, bucket, rho — e.g. the final
    emissions of a STREAMING register aggregation) into the
    hll_vs_exact output shape, measuring against the exact distinct
    count over `exact_src`. Registers merge with MAX, so feeding
    per-batch update-mode emissions reduced by max(rho) here is
    exactly the batch sketch — the streaming/batch parity the
    streaming_distinct_sketch gate proves."""
    from cityfinder_spark.colutils import round_digits_col

    regs = registers.groupBy("grp", "bucket").agg(F.max("rho").alias("rho"))
    out = _estimate(regs, p)
    est = out.select(
        "grp",
        "n_zero",
        round_digits_col(F.col("est_raw"), 6).alias("est_distinct"),
    )
    exact = exact_src.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(F.col(id_col)).alias("exact_distinct")
    )
    rel = round_digits_col(
        (F.col("est_distinct") - F.col("exact_distinct").cast("double"))
        / F.col("exact_distinct").cast("double"),
        6,
    )
    return est.join(exact, "grp").select(
        "grp", "n_zero", "est_distinct", "exact_distinct", rel.alias("rel_err")
    )


def hll_vs_exact(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    p: int = 8,
    hash_mode: str = "splitmix",
) -> DataFrame:
    """Demo/gate shape: sketch estimate side-by-side with the exact
    per-group distinct count and the relative error. (The exact count
    is the thing the sketch exists to avoid at scale — here it is the
    ruler the gate measures against.)"""
    from cityfinder_spark.colutils import round_digits_col

    est = hll_distinct(df, group_col, id_col, p=p, hash_mode=hash_mode)
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(F.col(id_col)).alias("exact_distinct")
    )
    rel = round_digits_col(
        (F.col("est_distinct") - F.col("exact_distinct").cast("double"))
        / F.col("exact_distinct").cast("double"),
        6,
    )
    return est.join(exact, "grp").select(
        "grp", "n_zero", "est_distinct", "exact_distinct", rel.alias("rel_err")
    )


# ------------------------------------------------------- count-min sketch

CMS_P = 2147483647  # 2^31 - 1; a < 2^15 keeps a*x inside int64 (x = md5 int48)
CMS_DEPTH = 4
CMS_WIDTH = 16384


def cms_funcs(depth: int = CMS_DEPTH) -> list[tuple[int, int, int]]:
    """The CMS affine hash family (i, a, b): h_i(x) = ((a*x + b) % P) % W.
    Same overflow-safe construction as MINHASH_FUNCS — and the same
    LARGE-multiplier requirement (see the MINHASH_FUNCS note: tiny
    multipliers leave small residues un-wrapped, correlating the rows
    and defeating the min-over-rows collision reduction); distinct
    from MinHash's multipliers so the two sketches decorrelate on
    shared keys."""
    return [(i, 32717 - 1013 * i, (15485863 * (i + 1)) % CMS_P) for i in range(depth)]


def _cms_explode(depth: int) -> Column:
    """The hash family as an exploded LITERAL array of structs — a
    generator in the same stage, never a join (a broadcast crossJoin
    of the family would plan as BroadcastNestedLoopJoin and trip the
    repo's plan-hygiene net)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.lit(a).alias("a"),
                    F.lit(b).alias("b"),
                )
                for i, a, b in cms_funcs(depth)
            ]
        )
    )


def _cms_key_hash(key_col: str) -> Column:
    from cityfinder_spark.operators.dedup import MD5_INT_SPARK

    return F.expr(MD5_INT_SPARK.format(x=key_col))


def cms_counters(
    keyed: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch counter table over a key stream:
    (row_i, bucket, cnt), one row per occupied counter.

    The frequency question at 100 TB ("how often does this shingle /
    domain / n-gram occur?") exactly, needs a groupBy(key) whose
    exchange carries the full distinct-key stream — for web shingles
    that is the corpus again. The CMS answers every point query with
    +eps*N one-sided error in depth x width LONGS: here the input is
    multiplied by `depth` map-side (a broadcast crossJoin with the
    hash-family literals — no fact exchange), then ONE map-side-
    combined groupBy collapses each task to <= depth*width partial
    rows before the only shuffle. Counter state is input-size-
    independent; width scales ~N/eps at constant memory-per-accuracy.

    Deterministic end-to-end: md5-int48 key hash + affine family →
    the DuckDB oracle rebuilds every counter exactly. Counters are
    plain sums, so they merge across days/streams by addition and run
    unchanged as a Structured Streaming update-mode aggregation
    (state = the counter table; see contract streaming_heavy_hitters)."""
    return (
        keyed.select(_cms_key_hash(key_col).alias("__x"))
        .select("__x", _cms_explode(depth).alias("f"))
        .groupBy(
            F.col("f.i").alias("row_i"),
            (
                ((F.col("f.a") * F.col("__x") + F.col("f.b")) % F.lit(CMS_P))
                % F.lit(width)
            ).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_probe(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for a key set: (key, est_count) with est =
    min_i counter[i][h_i(key)] — never an underestimate, overshoot
    bounded by eps*N. The counter table (<= depth*width rows) is
    BROADCAST; the probe side pays no exchange beyond its own
    depth-fold explode + the final groupBy(key) min (keys arriving
    distinct collapse map-side)."""
    probes = (
        keys.select(F.col(key_col), _cms_key_hash(key_col).alias("__x"))
        .select(key_col, "__x", _cms_explode(depth).alias("f"))
        .select(
            key_col,
            F.col("f.i").alias("i"),
            (
                ((F.col("f.a") * F.col("__x") + F.col("f.b")) % F.lit(CMS_P))
                % F.lit(width)
            ).alias("bucket"),
        )
    )
    return (
        probes.join(
            F.broadcast(counters),
            (probes["i"] == counters["row_i"])
            & (probes["bucket"] == counters["bucket"]),
            "left",
        )
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_vs_exact(
    keyed: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Gate shape: (key, est_count, exact_count, overest) for every
    distinct key — overest = est - exact is >= 0 BY CONSTRUCTION (the
    CMS one-sided guarantee; the pytest asserts it row-wise). The
    exact groupBy(key) is the cost the sketch exists to avoid at
    scale; here it is the ruler."""
    counters = cms_counters(keyed, key_col, depth=depth, width=width)
    exact = keyed.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_probe(counters, exact, key_col, depth=depth, width=width)
    return est.join(exact, key_col).select(
        key_col,
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overest"),
    )


def heavy_hitters(
    keyed: DataFrame,
    key_col: str,
    *,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Keys whose CMS estimate >= threshold: a SUPERSET of the true
    heavy hitters (no false negatives — est >= exact always), with
    false positives bounded by the eps*N overshoot. The production
    shape for "hot shingles / hot domains" gating (word_shingles'
    max_df bound, URL quota pre-screens) without a key-grain exact
    aggregation."""
    counters = cms_counters(keyed, key_col, depth=depth, width=width)
    probes = keyed.select(key_col).distinct()
    est = cms_probe(counters, probes, key_col, depth=depth, width=width)
    return est.where(F.col("est_count") >= F.lit(threshold))
