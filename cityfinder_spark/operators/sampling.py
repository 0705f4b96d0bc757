"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on wholesale: pipelines take
reproducible rate samples ("5% of web, 50% of books") and per-group
quotas ("at most K docs per domain"). Both operators here are
deterministic pure functions of the row id — reruns, resumes, and the
DuckDB oracle all see the same sample, with no RNG state anywhere
(contrast `DataFrame.sample`, whose seed is per-partition-location and
not stable across cluster layouts).

Scale shape:
  * `rate_sample` / `stratified_rate_sample`: zero shuffle — a
    whole-stage-codegen filter on a multiplicative hash; predicate
    pushdown-friendly (pure column arithmetic).
  * `quota_sample`: one exchange on the group key (the theoretical
    minimum — a global per-group rank needs co-located groups). For
    hot groups at extreme scale, pass `prefilter_rate` to cheaply
    rate-cut each group first (map-side, no shuffle) so the windowed
    sort never sees more than ~rate x |group| rows; correctness is
    unchanged when the prefilter keeps >= k rows per group (callers
    size it from approximate group counts).

The multiplicative hash (id * 48271 mod 100000; 48271 = MINSTD
multiplier) is chosen over xxhash/md5 for one reason: it is exactly
expressible in ANSI SQL, so the driver's DuckDB oracle can replicate
the sample bit-for-bit. Ids up to ~1.9e14 stay within int64 before the
mod — fine for 10^12-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_A = 48271
HASH_M = 100000


def sample_hash(id_col: F.Column | str) -> F.Column:
    """Deterministic uniform-ish bucket in [0, HASH_M) from an integer
    id — the shared Spark/SQL sampling key."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(c * F.lit(HASH_A), F.lit(HASH_M))


def rate_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~`rate` of rows, deterministically by id. Zero shuffle."""
    return df.where(sample_hash(id_col) < F.lit(int(rate * HASH_M)))


def stratified_rate_sample(
    df: DataFrame,
    id_col: str,
    strat_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rates (e.g. {"web": 0.05, "books": 0.5}); strata
    absent from `rates` use default_rate. Zero shuffle: the threshold
    is a CASE expression, the filter is codegen'd."""
    thresh = F.lit(int(default_rate * HASH_M))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strat_col) == F.lit(value), F.lit(int(rate * HASH_M))
        ).otherwise(thresh)
    return df.where(sample_hash(id_col) < thresh)


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    prefilter_rate: float | None = None,
) -> DataFrame:
    """At most k rows per group, chosen deterministically: rank by
    (sample_hash(id), id) within each group, keep rank <= k. The hash
    front-loads a uniform spread so the kept rows are an unbiased
    deterministic subsample rather than the lowest ids.

    One exchange on group_col. With `prefilter_rate`, a zero-shuffle
    rate cut runs first so hot groups shrink before the windowed sort
    (caller guarantees rate x min-group-size >= k)."""
    base = df if prefilter_rate is None else rate_sample(df, id_col, prefilter_rate)
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


SPLIT_A = 16807  # a DIFFERENT MINSTD multiplier than sample_hash's


def split_hash(id_col: F.Column | str) -> F.Column:
    """The split family's own hash — deliberately a different
    multiplier than sample_hash: with the SAME hash, the val/test band
    would coincide with rate_sample's kept band (rate_sample(0.05)
    then corpus_split would label every survivor 'val'). A distinct
    linear map scatters one hash's band across the other's range, so
    sampling and splitting compose independently."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(c * F.lit(SPLIT_A), F.lit(HASH_M))


def corpus_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_rate: float = 0.05,
    test_rate: float = 0.05,
) -> DataFrame:
    """Deterministic train/val/test assignment by the split hash:
    (*, split) with split in {train, val, test}. Zero shuffle, zero
    data movement — a codegen'd projection, reproducible bit-for-bit
    across engines and runs (the leakage-safe way to split a corpus:
    membership is a pure function of the id, so re-runs and increments
    never move a document across the boundary; see split_hash for why
    the sampling operators use a different multiplier)."""
    h = split_hash(id_col)
    val_hi = int(val_rate * HASH_M)
    test_hi = val_hi + int(test_rate * HASH_M)
    return df.withColumn(
        "split",
        F.when(h < val_hi, F.lit("val"))
        .when(h < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
    default_weight: float = 0.0,
) -> DataFrame:
    """Corpus-mixture sampling (the Pile/DoReMi shape): given target
    mixture WEIGHTS per group and a total TOKEN BUDGET, derive each
    group's sampling rate from its measured token mass and keep a
    deterministic hash sample at that rate.

        rate_g = min(1, token_budget * w_g / tokens_g)

    Unlike `stratified_rate_sample` (rates handed in), the engine
    computes the rates from corpus statistics: one tiny map-side-
    combined agg over (group, tokens) — a column-pruned scan that
    never touches text/payload columns — then the zero-shuffle hash
    filter with per-group thresholds attached via a broadcast join.
    Groups whose full mass is below their budget share keep everything
    (rate capped at 1; upsampling/multi-epoch is the trainer's job,
    not the sampler's). Every step is integer-or-IEEE-double exact, so
    the DuckDB oracle reproduces the sample bit-for-bit.

    Determinism: membership is a pure function of the id (same
    MINSTD hash as rate_sample), so resumes and re-runs keep the same
    rows as long as the group totals are unchanged; a changed corpus
    re-derives rates, which is the point of a mixture."""
    w_expr = F.lit(float(default_weight))
    for value, w in sorted(weights.items()):
        w_expr = F.when(F.col(group_col) == F.lit(value), F.lit(float(w))).otherwise(
            w_expr
        )
    thresholds = (
        df.groupBy(group_col)
        .agg(F.sum(F.col(token_col)).alias("__tok_total"))
        .select(
            group_col,
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.lit(float(token_budget)) * w_expr / F.col("__tok_total"),
                )
                * F.lit(HASH_M)
            ).alias("__thr"),
        )
    )
    return (
        df.join(F.broadcast(thresholds), group_col, "inner")
        .where(sample_hash(id_col) < F.col("__thr"))
        .drop("__thr")
    )


def cluster_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    val_rate: float = 0.05,
    test_rate: float = 0.05,
) -> DataFrame:
    """Leakage-safe train/val/test split BY NEAR-DUP CLUSTER:
    (doc_id, canonical_id, split), where every member of a duplicate
    cluster lands on the same side of the boundary.

    `corpus_split` alone is leakage-safe against re-runs (membership
    is a pure function of the id) but NOT against near-duplicates: two
    paraphrases with different ids can straddle train/val, and the
    eval set silently scores memorization. The fix is to hash the
    CLUSTER, not the row — canonical ids come from the same
    connected-components resolution as `dedup_resolve` (pairs from any
    candidate generator: MinHash-LSH, SimHash, phash), and the split
    hash is applied to `canonical_id`, so the whole cluster moves
    together by construction.

    Scale shape: the CC loop shuffles only (node, label) longs
    (`operators/components.py`); the split itself adds ZERO exchanges
    on top of `dedup_resolve` — one codegen'd projection of the hash
    CASE over the resolve output, then the id-grain join back to docs
    that dedup_resolve already pays. Deterministic end-to-end (md5
    pair candidates + min-label CC + MINSTD split hash), so the DuckDB
    oracle replays the full assignment bit-for-bit."""
    from cityfinder_spark.operators.components import dedup_resolve

    resolved = dedup_resolve(docs, pairs, id_col, pair_a, pair_b)
    h = split_hash("canonical_id")
    val_hi = int(val_rate * HASH_M)
    test_hi = val_hi + int(test_rate * HASH_M)
    return resolved.select(
        "doc_id",
        "canonical_id",
        F.when(h < val_hi, F.lit("val"))
        .when(h < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
