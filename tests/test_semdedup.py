"""semdedup (operators/semdedup.py): cluster-pruned semantic dedup.

Load-bearing properties: (1) the drop set equals the brute-force
within-cluster rule computed locally; (2) planted near-duplicates in
the same cluster are dropped with the smallest matching keeper; (3)
partition layout never changes the result (the kernel sorts by id
inside each cluster group); (4) cluster pruning is the ONLY difference
vs all-pairs cosine dedup — every dropped row corresponds to a
cosine_dedup pair, and pairs split across clusters are the ones it
trades away for the O(sum c_i^2) cost."""

import numpy as np
import pandas as pd
import pytest

from cityfinder_spark.operators.kmeans import _assign_np, kmeans_fit
from cityfinder_spark.operators.semdedup import semdedup
from cityfinder_spark.operators.similarity import (
    COS_DIGITS,
    _fold_dots,
    _fold_norms,
    _round_np,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _emb(spark, parts=None):
    df = spark.read.parquet(EMB)
    return df.repartition(parts) if parts else df


def _local_semdedup(ids, V, C, threshold, digits=COS_DIGITS):
    """Brute-force local replay of the drop rule."""
    labels = _assign_np(V, C, digits)
    order = np.argsort(ids, kind="stable")
    ids, V, labels = ids[order], V[order], labels[order]
    norms = _fold_norms(V)
    cos = _fold_dots(V, V) / (norms[:, None] * norms[None, :])
    cos = _round_np(cos, digits)
    out = {}
    n = len(ids)
    for i in range(n):
        for j in range(i):
            if labels[i] == labels[j] and cos[i, j] >= threshold:
                out[ids[i]] = (int(labels[i]), ids[j], float(cos[i, j]))
                break
    return out


@pytest.fixture(scope="module")
def fitted(spark):
    emb = _emb(spark)
    C, _ = kmeans_fit(emb, k=6, n_iter=2)
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return emb, C, ids, V


def test_matches_local_brute_force(spark, fitted):
    emb, C, ids, V = fitted
    got = {
        r["vec_id"]: (r["cluster_id"], r["keeper_id"], r["cos_sim"])
        for r in semdedup(emb, C, threshold=0.5).collect()
    }
    want = _local_semdedup(ids, V, C, 0.5)
    assert got == want


def test_planted_duplicate_dropped_with_min_keeper(spark, fitted):
    emb, C, ids, V = fitted
    spark_df = emb.sparkSession.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.concatenate([ids, [10_000, 10_001]]),
                "embedding": list(V) + [V[0].copy(), V[0].copy()],
                "label": 0,
            }
        )
    )
    out = {
        r["vec_id"]: (r["keeper_id"], r["cos_sim"])
        for r in semdedup(spark_df, C, threshold=0.99).collect()
    }
    # both planted copies are exact duplicates of ids[0]: same cluster,
    # cosine 1.0, keeper = the ORIGINAL (smallest id of the group)
    assert out[10_000] == (ids[0], 1.0)
    assert out[10_001] == (ids[0], 1.0)
    assert 10_000 not in {k for k, _ in out.values()}  # keeper is the first id


def test_partition_independence(spark, fitted):
    emb, C, ids, V = fitted
    base = sorted(
        (r["vec_id"], r["cluster_id"], r["keeper_id"], r["cos_sim"])
        for r in semdedup(_emb(spark, 1), C, threshold=0.5).collect()
    )
    for parts in (3, 8):
        got = sorted(
            (r["vec_id"], r["cluster_id"], r["keeper_id"], r["cos_sim"])
            for r in semdedup(_emb(spark, parts), C, threshold=0.5).collect()
        )
        assert got == base


def test_drop_set_is_cluster_pruned_cosine_dedup(spark, fitted):
    """Every dropped row is an all-pairs cosine_dedup pair; rows whose
    only near-dup partner sits in ANOTHER cluster survive — that is
    precisely the approximation SemDeDup trades for scale."""
    from cityfinder_spark.operators.similarity import cosine_dedup_pairs

    emb, C, ids, V = fitted
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_dedup_pairs(emb, threshold=0.5).collect()
    }
    dropped = {
        r["vec_id"]: r["keeper_id"]
        for r in semdedup(emb, C, threshold=0.5).collect()
    }
    for v, keeper in dropped.items():
        assert (keeper, v) in pairs  # keeper < v by construction
    labels = dict(zip(ids, _assign_np(V, C, COS_DIGITS)))
    cross_only = {
        b
        for a, b in pairs
        if labels[a] != labels[b]
        and not any(
            (x, b) in pairs and labels[x] == labels[b] for x, _ in pairs
        )
    }
    assert all(b not in dropped for b in cross_only)


def test_small_block_size_equivalent(spark, fitted, monkeypatch):
    """The row-block memory bound never changes results."""
    import cityfinder_spark.operators.semdedup as sd

    emb, C, ids, V = fitted
    base = sorted(
        tuple(r) for r in semdedup(emb, C, threshold=0.5).collect()
    )
    monkeypatch.setattr(sd, "SEMDEDUP_BLOCK", 3)
    got = sorted(tuple(r) for r in semdedup(emb, C, threshold=0.5).collect())
    assert got == base
