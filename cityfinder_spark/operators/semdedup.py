"""SemDeDup: cluster-pruned semantic deduplication over embeddings
(the shape of Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — public arXiv:2303.09540).

All-pairs cosine dedup is O(N^2) and dead at corpus scale. SemDeDup's
observation: semantic near-duplicates land in the same k-means cluster,
so it suffices to compare pairs WITHIN each cluster — O(sum c_i^2),
a k-fold cost cut for balanced clusters, and embarrassingly parallel
across clusters.

Engine shape (one exchange total):

  1. assign — broadcast the trained centroid matrix (learned by
     `kmeans.kmeans_fit`, the hash-exact distributed Lloyd's), one
     zero-shuffle mapInPandas emits (id, vec, cluster); assignment is
     `kmeans._assign_np` (rounded exact-fold cosine, ties -> lowest
     cluster id), identical to `kmeans_assign`'s convention so the
     DuckDB oracle replays it closed-form.
  2. per-cluster pair scan — ONE exchange keyed on cluster_id
     (`groupBy(cluster).applyInPandas`): inside a cluster the kernel
     sorts by id, computes the pairwise rounded exact-fold cosine
     matrix in row blocks (bounded temp: block x |cluster|), and emits
     each DROPPED row with its keeper.

Drop rule (deterministic, no RNG, no iteration-order dependence):
row v is dropped iff some u < v in the SAME cluster has
round(cos(u, v), digits) >= threshold; keeper(v) = the smallest such
u. A keeper may itself be dropped by a yet-smaller id — chains are a
transitive-closure question, and `components.dedup_resolve` already
owns that (feed it these pairs to get one canonical per semantic
group).

Skew note (100 TB): cluster sizes are data-dependent; a pathological
mega-cluster makes one task O(c^2). The mitigation is upstream — train
with k sized so N/k rows fit a task (the IVF sizing rule), and split
hot clusters by re-running kmeans within them (hierarchical SemDeDup,
same operator recursively). The row-block loop keeps MEMORY bounded
regardless; only time skews.

Reference tie-in: the within-group argmin/threshold scan generalizes
the reference's per-cell candidate refinement (lib/finder/coordinates/
s2.go:59-65) from geo cells to semantic clusters.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from cityfinder_spark.operators.kmeans import _assign_np
from cityfinder_spark.operators.similarity import (
    COS_DIGITS,
    _fold_dots,
    _fold_norms,
    _id_field,
    _round_np,
    spread,
)
from cityfinder_spark.workerenv import tune_malloc as _tune_malloc

# query-side row block for the within-cluster pair matrix: bounds the
# kernel temp at block x |cluster| doubles irrespective of cluster size
SEMDEDUP_BLOCK = 1024


def semdedup(
    emb: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """-> (vec_id, cluster_id, keeper_id, cos_sim): one row per DROPPED
    vector — its cluster, the smallest same-cluster id that semantically
    covers it, and the rounded cosine to that keeper. Vectors absent
    from the output survive dedup."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    assign_schema = T.StructType(
        [
            _id_field(emb, id_col, id_col),
            emb.schema[vec_col],
            T.StructField("cluster_id", T.LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            out = pdf[[id_col, vec_col]].copy()
            out["cluster_id"] = _assign_np(Q, C, digits).astype(np.int64)
            yield out

    assigned = spread(emb.select(id_col, vec_col)).mapInPandas(assign, assign_schema)

    out_schema = T.StructType(
        [
            _id_field(emb, id_col, id_col),
            T.StructField("cluster_id", T.LongType()),
            _id_field(emb, id_col, "keeper_id"),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def pair_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        _tune_malloc()
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        c = len(pdf)
        if c < 2:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema}
            ).iloc[:0]
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        ids = pdf[id_col].to_numpy()
        cluster = int(pdf["cluster_id"].iloc[0])
        norms = _fold_norms(V)
        drop_ids, keepers, sims = [], [], []
        for lo in range(1, c, SEMDEDUP_BLOCK):
            hi = min(lo + SEMDEDUP_BLOCK, c)
            # rows lo..hi vs ALL earlier-sorted rows 0..hi (mask below
            # keeps only j < i); single division by the norm product,
            # matching the JVM/DuckDB expression dot / (na * nb)
            cos = _fold_dots(V[lo:hi], V[:hi])
            cos /= norms[lo:hi, None] * norms[None, :hi]
            cos = _round_np(cos, digits)
            ok = (cos >= threshold) & (
                np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
            )
            hit = ok.any(axis=1)
            if not hit.any():
                continue
            first = np.argmax(ok[hit], axis=1)  # smallest matching id
            rows = np.nonzero(hit)[0]
            drop_ids.append(ids[lo:hi][rows])
            keepers.append(ids[first])
            sims.append(cos[rows, first])
        if not drop_ids:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema}
            ).iloc[:0]
        return pd.DataFrame(
            {
                id_col: np.concatenate(drop_ids),
                "cluster_id": np.full(
                    sum(map(len, drop_ids)), cluster, dtype=np.int64
                ),
                "keeper_id": np.concatenate(keepers),
                "cos_sim": np.concatenate(sims),
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(pair_scan, out_schema)
