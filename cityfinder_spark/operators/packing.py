"""Sequence packing for training-data pipelines (driver mandate's
training-pipeline extension family): concatenate documents in a
deterministic pseudo-random order and chunk the token stream into
fixed-budget bins — the standard LLM pretraining layout ("pack then
split at the context boundary"; documents may straddle bins).

Semantics (exactly SQL-expressible, DuckDB-oracled):
  * order: (sample_hash(doc_id), doc_id) — the same portable
    multiplicative hash as operators.sampling, giving a reproducible
    shuffle of the corpus (desirable for training; deterministic for
    the oracle);
  * n_tokens: whitespace token count, identical to token_stats;
  * start = exclusive prefix sum of n_tokens in that order;
    bin_id = start div budget, bin_offset = start mod budget.

Scale shape (100 TB): a single global running-sum window would funnel
every row through ONE task. Instead the prefix sum is distributed the
classic two-level way, with NO sampled range partitioner (sampling
would make the two passes see different boundaries):
  * chunk id = hash * n_chunks div HASH_M — an arithmetic, data-
    independent range split of the hash domain, uniform because the
    hash is uniform (no skew possible);
  * per-chunk totals: one map-side-combined groupBy down to n_chunks
    rows, cumulated into exclusive offsets by a single-partition
    window over those n_chunks rows — kept INSIDE the lazy plan (no
    driver action) and broadcast-joined back;
  * per-chunk running sum: one window partitioned by chunk id — every
    window partition is bounded by ~1/n_chunks of the corpus and they
    all run in parallel. n_chunks defaults to max(64, 4x the
    context's default parallelism) so per-window volume shrinks as
    the cluster grows instead of being a fixed constant.
Two exchanges total (the window's hash partition + the n_chunks-row
aggregate), both on a uniform key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cityfinder_spark.operators.sampling import HASH_M, sample_hash
from cityfinder_spark.operators.textops import _words

DEFAULT_BUDGET = 512
DEFAULT_CHUNKS = 64


def _resolve_chunks(docs: DataFrame, n_chunks: int | None) -> int:
    if n_chunks is not None:
        return n_chunks
    return max(DEFAULT_CHUNKS, 4 * docs.sparkSession.sparkContext.defaultParallelism)


def pack_sequences(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    n_chunks: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, bin_id, bin_offset): position of every
    document in the packed fixed-budget token stream. n_tokens reuses
    textops._words so it stays identical to token_stats by
    construction."""
    n_chunks = _resolve_chunks(docs, n_chunks)
    h = sample_hash(id_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_words(text_col)).alias("n_tokens"),
        h.alias("__h"),
        F.floor(h * F.lit(n_chunks) / F.lit(HASH_M)).cast("long").alias("__chunk"),
    )
    # exclusive prefix over the per-chunk totals: an n_chunks-row
    # window (single partition of <= n_chunks rows — trivial at any
    # data scale), kept INSIDE the lazy plan so the whole operator is
    # one job with no driver-side action
    tot = base.groupBy("__chunk").agg(F.sum("n_tokens").alias("__total"))
    w0 = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    off_df = F.broadcast(
        tot.select(
            "__chunk",
            F.coalesce(F.sum("__total").over(w0), F.lit(0)).alias("__offset"),
        )
    )
    w = (
        Window.partitionBy("__chunk")
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.col("__offset") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        base.join(off_df, "__chunk")
        .withColumn("bin_id", F.floor(start / F.lit(budget)).cast("long"))
        .withColumn("bin_offset", (start % F.lit(budget)).cast("long"))
        .select("doc_id", "n_tokens", "bin_id", "bin_offset")
    )


def bin_manifest(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    n_chunks: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The data-loader view of pack_sequences: one row per (bin,
    document segment) — (bin_id, doc_id, doc_from, bin_from, seg_len).
    A document spanning several bins emits one segment per bin
    (F.sequence + explode — the manifold step itself is whole-stage
    codegen on top of pack_sequences' two exchanges); concatenating a
    bin's segments ordered by bin_from reconstructs its exact token
    window. seg_len sums to `budget` for every bin but the last."""
    packed = pack_sequences(docs, budget, n_chunks, id_col, text_col)
    start = F.col("bin_id") * budget + F.col("bin_offset")
    end = start + F.col("n_tokens")  # exclusive
    bins = F.sequence(
        F.col("bin_id"), F.floor((end - 1) / F.lit(budget)).cast("long")
    )
    b = F.col("bin")
    seg_start = F.greatest(start, b * budget)
    seg_end = F.least(end, (b + 1) * budget)
    return (
        packed.where(F.col("n_tokens") > 0)
        .select("doc_id", "n_tokens", "bin_id", "bin_offset", F.explode(bins).alias("bin"))
        .select(
            b.alias("bin_id"),
            "doc_id",
            (seg_start - start).cast("long").alias("doc_from"),
            (seg_start - b * budget).cast("long").alias("bin_from"),
            (seg_end - seg_start).cast("long").alias("seg_len"),
        )
    )
