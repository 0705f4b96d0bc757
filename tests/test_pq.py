"""Product quantization semantics: codebook shapes, encode
determinism across parallelism, ADC recall vs the exact scan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(24, 64))
    # 240 vectors in 24 tight clusters of 10 -> PQ codes must keep
    # cluster neighbors closer than cross-cluster vectors
    vecs = np.repeat(base, 10, axis=0) + 0.03 * rng.normal(size=(240, 64))
    # permuted ids: the deterministic lowest-id seeding must span
    # clusters (cluster-ordered ids would seed from just two clusters)
    ids = rng.permutation(240).astype(np.int64)
    pdf = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
        }
    )
    return spark.createDataFrame(pdf).repartition(6)


def test_pq_fit_shapes_and_counts(spark, emb):
    from cityfinder_spark.operators.pq import pq_fit

    CB, cnt = pq_fit(emb, m_sub=4, k_codes=16, n_iter=2)
    assert CB.shape == (4, 16, 16)
    assert cnt.shape == (4, 16)
    assert cnt.sum(axis=1).tolist() == [240] * 4


def test_pq_encode_partition_independent(spark, emb):
    """Codes and recon_err are bit-identical at any parallelism —
    the fixed-point/fold design claim, pinned."""
    from cityfinder_spark.operators.pq import pq_encode, pq_fit

    CB, _ = pq_fit(emb, m_sub=4, k_codes=16, n_iter=2)
    a = {
        r["vec_id"]: (tuple(r["codes"]), r["recon_err"])
        for r in pq_encode(emb.repartition(2), CB).collect()
    }
    b = {
        r["vec_id"]: (tuple(r["codes"]), r["recon_err"])
        for r in pq_encode(emb.repartition(13), CB).collect()
    }
    assert a == b
    assert all(0 <= c < 16 for v in a.values() for c in v[0])


def test_pq_search_recall_at_10(spark, emb):
    """The PQ paper's own metric (Jegou et al. 2011, recall@R): the
    TRUE nearest other neighbor appears in the ADC top-10 for >= 0.95
    of queries. (Top-5-vs-top-5 overlap is the wrong bar for PQ:
    cluster members share a code tuple, so their ADC distances tie
    exactly and fine within-cluster ranking is quantized away by
    design — the candidate window is what PQ guarantees.)"""
    from cityfinder_spark.operators.pq import pq_encode, pq_fit, pq_search

    CB, _ = pq_fit(emb, m_sub=4, k_codes=16, n_iter=2)
    codes = pq_encode(emb, CB)
    queries = emb.where("vec_id % 10 = 0").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    approx: dict[int, set[int]] = {}
    for r in pq_search(queries, codes, CB, k=10).collect():
        approx.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    X = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").collect()
        ]
    )
    hit = n = 0
    for q in range(0, 240, 10):
        d = ((X - X[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        hit += int(np.argmin(d)) in approx[q]
        n += 1
    assert hit / n >= 0.95, hit / n


def test_pq_search_rank_order(spark, emb):
    from cityfinder_spark.operators.pq import pq_encode, pq_fit, pq_search

    CB, _ = pq_fit(emb, m_sub=4, k_codes=16, n_iter=2)
    codes = pq_encode(emb, CB)
    queries = emb.where("vec_id = 0").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    rows = sorted(
        pq_search(queries, codes, CB, k=5).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)


def test_ivfpq_search_recall_and_probe_locality(spark, emb):
    """IVFADC on the clustered fixture: recall@10 of the true nearest
    other neighbor >= 0.9 at n_probe=2 of 8 cells, and every returned
    neighbor belongs to one of the query's probed cells."""
    from cityfinder_spark.operators.kmeans import kmeans_fit
    from cityfinder_spark.operators.pq import (
        ivfpq_search,
        pq_encode,
        pq_fit,
        residual_vectors,
    )
    from cityfinder_spark.operators.similarity import (
        _fold_dots,
        _fold_norms,
        _round_np,
    )

    C, _ = kmeans_fit(emb, k=8, n_iter=2)
    resid = residual_vectors(emb, C)
    CB, _ = pq_fit(resid, vec_col="residual")
    enc = pq_encode(resid, CB, vec_col="residual").join(
        resid.select("vec_id", "cluster_id"), "vec_id"
    )
    queries = emb.where("vec_id % 10 = 0").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    out = ivfpq_search(queries, enc, C, CB, k=10, n_probe=2).collect()
    labels = {r["vec_id"]: r["cluster_id"] for r in resid.collect()}
    X = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").collect()
        ]
    )
    cos = _fold_dots(X, C) / (
        _fold_norms(X)[:, None] * _fold_norms(C)[None, :]
    )
    cosr = _round_np(cos, 6)
    probed = {
        q: set(np.lexsort((np.arange(8), -cosr[q]))[:2])
        for q in range(0, 240, 10)
    }
    approx: dict[int, set[int]] = {}
    for r in out:
        assert labels[r["neighbor_id"]] in probed[r["q_id"]]
        approx.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hit = n = 0
    for q in range(0, 240, 10):
        d = ((X - X[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        hit += int(np.argmin(d)) in approx.get(q, set())
        n += 1
    assert hit / n >= 0.9, hit / n


def test_pq_search_jvm_strategy_parity_and_routing(spark, emb):
    """The count-guarded relational fallback (nothing collects to the
    driver) returns EXACTLY the arrow path's rows — same neighbors,
    same rounded ADC distances, same ranks; auto routes arrow under
    the cap and jvm above it."""
    from cityfinder_spark.operators.pq import (
        PQ_MAX_DRIVER_QUERIES,
        _resolve_pq_strategy,
        pq_encode,
        pq_fit,
        pq_search,
    )

    CB, _ = pq_fit(emb, m_sub=4, k_codes=16, n_iter=2)
    codes = pq_encode(emb, CB)
    queries = emb.where("vec_id % 10 = 0").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    want = sorted(
        map(tuple, pq_search(queries, codes, CB, k=5, strategy="arrow").collect())
    )
    got = sorted(
        map(tuple, pq_search(queries, codes, CB, k=5, strategy="jvm").collect())
    )
    assert want and got == want
    # routing: small query table -> arrow; above the cap -> jvm
    assert _resolve_pq_strategy(queries, "auto") == "arrow"
    assert _resolve_pq_strategy(queries, "auto", max_rows=3) == "jvm"
    assert PQ_MAX_DRIVER_QUERIES >= 1000
    with pytest.raises(ValueError):
        _resolve_pq_strategy(queries, "bogus")


def test_ivfpq_search_jvm_strategy_parity_and_plan(spark, emb):
    """IVFADC's relational fallback: per-(query, probe) shifted ADC
    tables reach the corpus through an EQUI-JOIN on the probed
    cluster id (plan-checked: no nested-loop join) and the rows match
    the arrow path exactly."""
    from cityfinder_spark.operators.kmeans import kmeans_fit
    from cityfinder_spark.operators.pq import (
        ivfpq_search,
        pq_encode,
        pq_fit,
        residual_vectors,
    )

    C, _ = kmeans_fit(emb, k=8, n_iter=2)
    resid = residual_vectors(emb, C)
    CB, _ = pq_fit(resid, vec_col="residual")
    enc = pq_encode(resid, CB, vec_col="residual").join(
        resid.select("vec_id", "cluster_id"), "vec_id"
    )
    queries = emb.where("vec_id % 10 = 0").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    want = sorted(
        map(
            tuple,
            ivfpq_search(
                queries, enc, C, CB, k=10, n_probe=2, strategy="arrow"
            ).collect(),
        )
    )
    jvm_df = ivfpq_search(queries, enc, C, CB, k=10, n_probe=2, strategy="jvm")
    plan = jvm_df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    got = sorted(map(tuple, jvm_df.collect()))
    assert want and got == want


def test_ivfpq_upsert_equals_scratch_reencode(spark, emb):
    """Index lifecycle: updates (re-embedded vectors) + inserts merge
    into the stored artifact by encoding ONLY the delta against the
    frozen models; the merged index — and IVFADC search over it — is
    IDENTICAL to re-encoding the merged corpus from scratch."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.kmeans import kmeans_fit
    from cityfinder_spark.operators.pq import (
        ivfpq_search,
        ivfpq_upsert,
        pq_encode,
        pq_fit,
        residual_vectors,
    )

    base = emb.where("vec_id % 5 <> 0")
    C, _ = kmeans_fit(base, k=8, n_iter=2)
    resid = residual_vectors(base, C)
    CB, _ = pq_fit(resid, vec_col="residual")
    enc_base = pq_encode(resid, CB, vec_col="residual").join(
        resid.select("vec_id", "cluster_id"), "vec_id"
    )
    # delta: every %7==3 base vector re-embedded (negated) + the
    # held-out %5==0 rows as inserts
    updates = base.where("vec_id % 7 = 3").select(
        "vec_id", F.expr("transform(embedding, x -> -x)").alias("embedding")
    )
    inserts = emb.where("vec_id % 5 = 0").select("vec_id", "embedding")
    delta = updates.unionByName(inserts)
    merged = ivfpq_upsert(enc_base, delta, C, CB)

    # scratch: encode the merged corpus with the same frozen models
    merged_corpus = (
        base.where("vec_id % 7 <> 3")
        .select("vec_id", "embedding")
        .unionByName(delta)
    )
    resid_m = residual_vectors(merged_corpus, C)
    scratch = pq_encode(resid_m, CB, vec_col="residual").join(
        resid_m.select("vec_id", "cluster_id"), "vec_id"
    )
    key = lambda r: (r["vec_id"], r["cluster_id"], tuple(r["codes"]), r["recon_err"])
    got = sorted(map(key, merged.select("vec_id", "cluster_id", "codes", "recon_err").collect()))
    want = sorted(map(key, scratch.select("vec_id", "cluster_id", "codes", "recon_err").collect()))
    assert got == want and len(got) == merged_corpus.count()

    # the merge audit: exactly the delta ids came from the update side
    fu = {r["vec_id"]: r["from_update"] for r in merged.collect()}
    delta_ids = {r["vec_id"] for r in delta.collect()}
    assert all(fu[i] == (i in delta_ids) for i in fu)

    # search over the incrementally maintained index == search over
    # the scratch index
    queries = emb.where("vec_id % 10 = 1").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    a = sorted(map(tuple, ivfpq_search(queries, merged, C, CB, k=5, n_probe=2).collect()))
    b = sorted(map(tuple, ivfpq_search(queries, scratch, C, CB, k=5, n_probe=2).collect()))
    assert a and a == b


def test_ivfpq_save_load_roundtrip_and_persisted_serving(spark, emb, tmp_path):
    """Index persistence closes the lifecycle: ivfpq_save writes the
    models + encoded corpus as parquet tables, ivfpq_load rebuilds
    BIT-IDENTICAL serving state (parquet doubles are exact), and
    upsert+search from the loaded artifacts equals the never-persisted
    chain row-for-row."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.kmeans import kmeans_fit
    from cityfinder_spark.operators.pq import (
        ivfpq_load,
        ivfpq_save,
        ivfpq_search,
        ivfpq_upsert,
        pq_encode,
        pq_fit,
        residual_vectors,
    )

    C, _ = kmeans_fit(emb, k=8, n_iter=2)
    resid = residual_vectors(emb, C)
    CB, _ = pq_fit(resid, vec_col="residual")
    enc = pq_encode(resid, CB, vec_col="residual").join(
        resid.select("vec_id", "cluster_id"), "vec_id"
    )
    path = str(tmp_path / "ivfpq_store")
    ivfpq_save(path, C, CB, enc)
    C2, CB2, enc2 = ivfpq_load(spark, path)
    # models reload bit-exactly
    assert C2.shape == C.shape and (C2 == C).all()
    assert CB2.shape == CB.shape and (CB2 == CB).all()
    # corpus reloads row-exactly (codes are ints, recon_err doubles)
    a = sorted(
        (r["vec_id"], tuple(r["codes"]), r["recon_err"], r["cluster_id"])
        for r in enc.collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["codes"]), r["recon_err"], r["cluster_id"])
        for r in enc2.collect()
    )
    assert a == b
    # upsert + search from loaded artifacts == in-memory chain
    delta = emb.where("vec_id % 9 = 1").select(
        "vec_id", F.expr("transform(embedding, x -> -x)").alias("embedding")
    )
    queries = emb.where("vec_id % 10 = 0").select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    mem = sorted(
        map(
            tuple,
            ivfpq_search(
                queries, ivfpq_upsert(enc, delta, C, CB), C, CB, k=5, n_probe=2
            ).collect(),
        )
    )
    per = sorted(
        map(
            tuple,
            ivfpq_search(
                queries, ivfpq_upsert(enc2, delta, C2, CB2), C2, CB2, k=5, n_probe=2
            ).collect(),
        )
    )
    assert mem == per and len(mem) > 0
