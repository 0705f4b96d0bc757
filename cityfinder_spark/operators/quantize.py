"""Embedding scalar quantization (int8) — the storage/serving path of
a large-scale vector pipeline.

Per-vector symmetric int8: scale = max|x| / 127, q_i = half-up
round(x_i / scale) (in [-127, 127] by construction — |x_i|/scale <=
127, and floor(+-127 + 0.5) stays inside). A 10^12-vector corpus at
dim-768 float32 is ~3 PB; int8 + one float scale per vector is ~770 TB
— the standard 4x shrink before ANN serving.

Everything is a pure Catalyst projection (higher-order transform +
sequential aggregate folds): zero shuffle, zero UDF, embarrassingly
parallel. Determinism: scale is one exact division, q_i one
floor(x/s + 0.5) per element, and the error/checksum folds run
left-to-right — the same IEEE sequence DuckDB's list_sum performs, so
every output (including the full quantized vector, pinned through two
integer checksums) value-hashes against the SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.colutils import round6_col


def quantize_embeddings(
    embs: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """-> (vec_id, dim, scale, qsum, qdot, l2_err):

      * scale  — round6(max|x| / 127), the dequantization factor;
      * qsum   — sum of the int8 codes (integer, exact);
      * qdot   — position-weighted checksum sum(q_i * (i+1)): pins
        every code's VALUE AND POSITION, so the whole quantized vector
        is hash-gated without emitting an array column;
      * l2_err — round6(||x - dequantize(q)||_2), the reconstruction
        error actually paid at serving time.
    """
    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    s = maxabs / F.lit(127.0)

    def q_of(x):
        return F.when(s == 0.0, F.lit(0).cast("long")).otherwise(
            F.floor(x / s + 0.5).cast("long")
        )

    qsum = F.aggregate(
        F.transform(v, q_of),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    qdot = F.aggregate(
        F.transform(v, lambda x, i: q_of(x) * (i.cast("long") + 1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    err2 = F.aggregate(
        F.transform(v, lambda x: (x - q_of(x) * s) * (x - q_of(x) * s)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return embs.select(
        F.col(id_col),
        F.size(v).alias("dim"),
        round6_col(s).alias("scale"),
        qsum.alias("qsum"),
        qdot.alias("qdot"),
        round6_col(F.sqrt(err2)).alias("l2_err"),
    )


def _codes_of(M, maxabs=None):
    """int64 codes of a float64 matrix, row-wise symmetric int8 — the
    exact numpy twin of the Catalyst per-element expression
    floor(x / (max|x|/127) + 0.5) (same IEEE op sequence)."""
    import numpy as np

    a = np.abs(M).max(axis=1) if maxabs is None else maxabs
    s = a / 127.0
    safe = np.where(s == 0.0, 1.0, s)
    q = np.floor(M / safe[:, None] + 0.5).astype(np.int64)
    q[s == 0.0] = 0
    return q


def quantized_cosine_topk(
    embs: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Exact cosine top-k over the INT8 CODES — the serving-side
    companion of quantize_embeddings. The per-vector scale cancels out
    of cosine (cos(q*s_a, q*s_b) = (q_a . q_b) / (|q_a| |q_b|)), so
    similarity is one integer dot product per pair + two precomputed
    integer norms: fully deterministic (integer folds, one sqrt+divide
    rounded at the end), hence DuckDB-value-hashable — unlike float
    cosine over re-ordered sums. This is the quantized-exact BASELINE
    (broadcast O(N^2), like cosine_topk); at corpus scale the same
    codes feed the LSH/IVF candidate paths and only the refinement
    arithmetic changes. Output: (vec_id, neighbor_id, cos_sim, rank),
    ties broken by rounded cos desc then neighbor_id asc.

    strategy="arrow" (default): broadcast EmbIndex + one mapInPandas
    pass — codes derive in numpy with the SAME IEEE sequence as the
    Catalyst expression, dots are exact int64 matmul (any order),
    zero shuffle. strategy="jvm": crossJoin + Catalyst folds + window
    — the plan the oracle SQL mirrors literally; kept as the
    parity-pinned reference."""
    from pyspark.sql import Window

    if strategy == "arrow":
        return _quantized_topk_arrow(embs, k, id_col, emb_col, cache_key)

    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    s = maxabs / F.lit(127.0)
    q = F.when(s == 0.0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(v, lambda x: F.floor(x / s + 0.5).cast("long"))
    )
    coded = embs.select(F.col(id_col), q.alias("__q"))
    n2 = F.aggregate(
        F.transform(F.col("__q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    a = coded.select(
        F.col(id_col).alias("vec_id"), F.col("__q").alias("qa"), n2.alias("na2")
    )
    b = coded.select(
        F.col(id_col).alias("neighbor_id"), F.col("__q").alias("qb"), n2.alias("nb2")
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("na2") == 0) | (F.col("nb2") == 0), F.lit(0.0)
    ).otherwise(dot / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", round6_col(cos))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


def _quantized_topk_arrow(
    embs: DataFrame,
    k: int,
    id_col: str,
    emb_col: str,
    cache_key: tuple | None,
) -> DataFrame:
    """Arrow kernel: quantize the broadcast index once per worker,
    int64 matmul per batch (exact — integer sums are order-free, so no
    exact-fold machinery is needed), one division by the norm product,
    floor-form rounding, stable argsort ranking. Bit-identical to the
    jvm strategy (parity-pinned in tests)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from cityfinder_spark.operators.similarity import (
        EmbIndex,
        _emb_index_bc,
        _id_field,
        _round_np,
        _tune_malloc,
    )

    index, bc = _emb_index_bc(embs, id_col, emb_col, cache_key)
    schema = T.StructType(
        [
            _id_field(embs, id_col, "vec_id"),
            _id_field(embs, id_col, "neighbor_id"),
            T.StructField("cos_sim", T.DoubleType(), True),
            T.StructField("rank", T.IntegerType(), True),
        ]
    )
    digits = 6  # round6, matching round6_col / sqlcompat.round6_sql

    def gen(batches):
        _tune_malloc()
        idx: EmbIndex = bc.value
        n = len(idx.ids)
        codes = _codes_of(idx.M)
        cn = np.sqrt((codes * codes).sum(axis=1).astype(np.float64))
        for pdf in batches:
            q = len(pdf)
            if q == 0 or n <= 1:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            q_ids = pdf[id_col].to_numpy()
            qc = _codes_of(Q)
            qn = np.sqrt((qc * qc).sum(axis=1).astype(np.float64))
            dots = (qc @ codes.T).astype(np.float64)
            denom = qn[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom == 0.0, 0.0, dots / denom)
            cos = _round_np(cos, digits)
            pos = idx.positions(q_ids)
            rows = np.arange(q)
            is_self = idx.ids[np.minimum(pos, n - 1)] == q_ids
            cos[rows[is_self], np.minimum(pos, n - 1)[is_self]] = -np.inf
            kk = min(k, n)
            top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(cos, top, axis=1)
            keep = np.isfinite(vals)
            rr, cc = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_id": q_ids[rr],
                    "neighbor_id": idx.ids[top[rr, cc]],
                    "cos_sim": vals[rr, cc],
                    "rank": (cc + 1).astype(np.int32),
                }
            )

    return embs.select(id_col, emb_col).mapInPandas(gen, schema)
