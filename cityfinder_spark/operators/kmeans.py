"""Distributed k-means training over an embedding column.

The missing piece of the IVF similarity story: `ivf_topk`/`ivf_search`
(similarity.py) build their coarse quantizer from a pre-existing
`label` column; `kmeans_train` LEARNS those centroids from the vectors
alone with Lloyd's algorithm, run as a fixed number of full-corpus
DataFrame passes (reference parity note: the reference engine has no
clustering — this is engine surface for the LLM-data-pipeline ANN
path, SURVEY §2.7).

Why this is oracle-exact (the design trick): floating-point partial
aggregation is order-dependent, so a naive distributed mean can never
hash-match a single-threaded replay. Instead each Lloyd update
accumulates FIXED-POINT integer sums — components quantized once per
row as floor(x * 1e6 + 0.5) (the same portable half-up rounding as
sqlcompat.round6_sql) — and integer addition is associative, so ANY
combine order (per-batch, per-partition, shuffle-reduced) produces the
identical centroid sums, and the final sum/(quant*count) division is
one IEEE double op on identical operands in every engine. That makes a
genuinely distributed iterative algorithm replayable row-for-row by
DuckDB SQL (contract keys `kmeans_train` / `kmeans_assign`).

Scale shape (per iteration, at 10^12 rows):
  * ONE corpus scan; assignment + quantized sums run inside a single
    mapInPandas pass against the BROADCAST (k x dim) centroid matrix
    — zero shuffle of corpus rows, no ids cross Arrow.
  * each task emits k partial rows of (dim+1) longs; the combine
    shuffles only (tasks x k) narrow rows and collects (k x dim)
    longs to the driver — the model, not the data.
  * driver state is the (k x dim) float64 centroid matrix.
Overflow bound: |component| <= B needs rows-per-cluster * B * 1e6 <
2^63, i.e. ~9e11 rows per cluster at B=10 — at larger scale drop
`quant` a digit or split clusters; the bound is asserted nowhere
because count*quant*max|x| is data-dependent: callers at that scale
own the choice (documented here and in SCALE.md).

Assignment ties and rounding follow the IVF convention exactly
(similarity.py IVFIndex): cosine rounded to COS_DIGITS BEFORE the
argmax (sub-1e-6 fold noise can't flip a list choice), first-max ==
lowest cluster_id, all dot products in the exact left-fold dimension
order DuckDB's list_sum uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cityfinder_spark.colutils import spread
from cityfinder_spark.operators.similarity import (
    COS_DIGITS,
    _fold_dots,
    _fold_norms,
    _id_field,
    _round_np,
)
from cityfinder_spark.workerenv import tune_malloc as _tune_malloc

KMEANS_QUANT = 10**6


def _assign_np(Q: np.ndarray, C: np.ndarray, digits: int) -> np.ndarray:
    """Top-1 cluster per row of Q: rounded exact-fold cosine desc,
    cluster_id asc on ties (np.argmax returns the first maximum)."""
    qn = _fold_norms(Q)
    cn = _fold_norms(C)
    csim = _fold_dots(Q, C)
    csim /= qn[:, None] * cn[None, :]
    return np.argmax(_round_np(csim, digits), axis=1)


def _init_centroids(
    emb: DataFrame, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic seeding: the vectors of the k lowest ids (a top-k
    pass, not a full sort — Spark's orderBy+limit is a TakeOrdered)."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return np.array(
        [np.asarray(r[vec_col], dtype=np.float64) for r in rows]
    )


def _lloyd_update(
    emb: DataFrame,
    C: np.ndarray,
    quant: int,
    vec_col: str,
    digits: int,
) -> tuple[np.ndarray, np.ndarray]:
    """One Lloyd iteration: (new_centroids, counts). Empty clusters
    keep their previous centroid (count 0)."""
    spark = emb.sparkSession
    k, dim = C.shape
    bc = spark.sparkContext.broadcast(C)

    # one partial row per cluster per TASK (not per batch): the k
    # accumulators live across the partition's batches, so the shuffle
    # input is (tasks x k) rows however many Arrow batches stream by.
    # cnt rides as the (dim+1)-th slot so ONE posexplode+sum covers
    # sums and counts without a second pass over the scan.
    out_schema = T.StructType(
        [
            T.StructField("cluster_id", T.LongType()),
            T.StructField("qsum", T.ArrayType(T.LongType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        Cw = bc.value
        S = np.zeros((k, dim + 1), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            Q = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            a = _assign_np(Q, Cw, digits)
            qv = np.floor(Q * quant + 0.5).astype(np.int64)
            np.add.at(S[:, :dim], a, qv)
            S[:, dim] += np.bincount(a, minlength=k)
        if seen:
            yield pd.DataFrame(
                {"cluster_id": np.arange(k, dtype=np.int64), "qsum": list(S)}
            )

    agg = (
        spread(emb.select(vec_col))
        .mapInPandas(partials, out_schema)
        .select("cluster_id", F.posexplode("qsum").alias("pos", "qs"))
        .groupBy("cluster_id", "pos")
        .agg(F.sum("qs").alias("qs"))
        .collect()
    )
    S = np.zeros((k, dim + 1), dtype=np.int64)
    for r in agg:
        S[r["cluster_id"], r["pos"]] = r["qs"]
    cnt = S[:, dim].copy()
    newC = C.copy()
    nz = cnt > 0
    # exact replay of DuckDB's cast(s AS double)/(quant.0 * cast(cnt
    # AS double)): int64 -> float64 conversions are exact below 2^53,
    # then one IEEE division — identical operands, identical result
    denom = float(quant) * cnt[nz].astype(np.float64)
    newC[nz] = S[nz, :dim].astype(np.float64) / denom[:, None]
    return newC, cnt


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    quant: int = KMEANS_QUANT,
) -> tuple[np.ndarray, np.ndarray]:
    """Train: returns (centroids (k x dim) float64, counts (k,) int64)
    where counts are the cluster sizes of the FINAL update pass (the
    assignment that produced the returned centroids)."""
    C = _init_centroids(emb, k, id_col, vec_col)
    if not len(C):
        return C, np.zeros(0, dtype=np.int64)
    cnt = np.zeros(len(C), dtype=np.int64)
    for _ in range(n_iter):
        C, cnt = _lloyd_update(emb, C, quant, vec_col, digits)
    return C, cnt


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    quant: int = KMEANS_QUANT,
) -> DataFrame:
    """The model as a DataFrame, exploded for exact comparison:
    (cluster_id, pos (1-based dimension), val (round6 centroid
    component), n_points). k x dim rows — a model-sized local
    relation, never corpus-sized."""
    spark = emb.sparkSession
    C, cnt = kmeans_fit(emb, k, n_iter, id_col, vec_col, digits, quant)
    Cr = _round_np(C, digits)
    rows = [
        (int(c), int(p + 1), float(Cr[c, p]), int(cnt[c]))
        for c in range(Cr.shape[0])
        for p in range(Cr.shape[1])
    ]
    return spark.createDataFrame(
        rows, "cluster_id long, pos long, val double, n_points long"
    )


def kmeans_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """Predict: (id, cluster_id) for every row against a trained
    centroid matrix — the steady-state ingestion surface (train once,
    assign each incoming batch; batch or readStream alike, the pass is
    stateless). Zero shuffle: broadcast centroids, one mapInPandas."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    schema = T.StructType(
        [
            _id_field(emb, id_col, id_col),
            T.StructField("cluster_id", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        Cw = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster_id": _assign_np(Q, Cw, digits).astype(np.int64),
                }
            )

    return spread(emb.select(id_col, vec_col)).mapInPandas(gen, schema)
