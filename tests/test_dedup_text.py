"""Dedup + text + similarity operator semantics on hand fixtures,
and ANN recall against the brute-force baseline."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cityfinder_spark.operators.dedup import (
    dedup_exact,
    hamming_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from cityfinder_spark.operators.similarity import cosine_topk, ivf_topk, lsh_bucket_topk
from cityfinder_spark.operators.textops import lang_id, quality_score, token_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame([(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"])
    )


def test_dedup_exact_groups(spark):
    out = {
        r["doc_id"]: r
        for r in dedup_exact(
            _docs(spark, ["a b c", "a b c", "x y z", "a b c"])
        ).collect()
    }
    assert out[0]["canonical_id"] == 0 and not out[0]["is_dup"]
    assert out[1]["canonical_id"] == 0 and out[1]["is_dup"]
    assert out[2]["canonical_id"] == 2 and not out[2]["is_dup"]
    assert out[3]["canonical_id"] == 0 and out[3]["is_dup"]


def test_word_shingles(spark):
    rows = word_shingles(_docs(spark, ["a b c d"]), n=3).collect()
    assert sorted(r["shingle"] for r in rows) == ["a b c", "b c d"]


def test_ngram_jaccard_known_value(spark):
    # doc0: shingles {abc, bcd, cde}; doc1: {abc, bcd, cdx}
    # inter=2, union=4 -> jaccard 0.5
    out = ngram_jaccard_pairs(
        _docs(spark, ["a b c d e", "a b c d x"]), n=3, threshold=0.4
    ).collect()
    assert len(out) == 1
    assert out[0]["doc_a"] == 0 and out[0]["doc_b"] == 1
    assert out[0]["jaccard"] == 0.5


def test_minhash_lsh_finds_near_dups(spark):
    # identical shingle sets -> identical signatures -> candidate with
    # probability 1 (band matches are probabilistic for jaccard < 1,
    # so a mid-similarity pair would make this test flaky by design)
    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog tonight",
        "completely different words appear inside this other document here now",
    ]
    pairs = minhash_lsh_pairs(_docs(spark, texts), n=3, threshold=0.3).collect()
    assert [(p["doc_a"], p["doc_b"], p["jaccard"]) for p in pairs] == [(0, 1, 1.0)]


def test_simhash_near_dups_close(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # 1 token swap
        "one two three four five six seven eight nine ten",
    ]
    sig = simhash(_docs(spark, texts))
    pairs = hamming_pairs(sig, max_dist=4).collect()
    got = {(p["doc_a"], p["doc_b"]): p["hamming"] for p in pairs}
    assert (0, 1) in got  # near-dups collide within 4 bits
    assert (0, 2) not in got or got[(0, 2)] > got[(0, 1)]


def test_token_stats_and_quality(spark):
    out = token_stats(_docs(spark, ["the cat sat"])).collect()[0]
    assert out["n_tokens"] == 3 and out["n_chars"] == 11 and out["bpe_est"] == 3
    q = quality_score(_docs(spark, ["the the cat"])).collect()[0]
    assert q["stopword_ratio"] == pytest.approx(2 / 3, abs=1e-6)
    assert q["uniq_ratio"] == pytest.approx(2 / 3, abs=1e-6)


def test_lang_id_heuristic(spark):
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in lang_id(
            _docs(
                spark,
                [
                    "the cat and the dog is a pet",
                    "le chat et la maison est grande",
                    "der hund und die katze ist nicht da",
                    "qqq www eee",  # no hits anywhere -> earliest lang (de)
                ],
            )
        ).collect()
    }
    assert out[0] == "en" and out[1] == "fr" and out[2] == "de" and out[3] == "de"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ann_lsh_default_recall(spark, emb):
    """The SHIPPED defaults must be practically strong, not just
    mechanically correct: recall@5 >= 0.9 for lsh_bucket_topk(k=5)
    with no tuning (measured 0.99-1.00 on sf0.001/sf0.1 with the
    3-plane x 16-table defaults)."""
    truth = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"])
        for r in lsh_bucket_topk(emb, k=5).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"LSH default recall too low: {recall}"


@pytest.mark.parametrize("strategy", ["arrow", "jvm"])
def test_ann_ivf_default_recall(spark, emb, strategy):
    """ivf_topk(k=5) shipped default (n_probe=8 of the 10 lists) must
    hit recall@5 >= 0.9 on the contract embeddings, on BOTH physical
    strategies (measured 0.93-0.94)."""
    truth = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k=5, strategy=strategy).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"IVF default recall too low: {recall}"


def test_ann_recall_is_parameter_controlled(spark, emb):
    """The approximation error is a CONTROLLABLE function of the
    family parameters, not a property of the operator: deliberately
    under-provisioned configs (LSH 6 planes x 2 tables, IVF probe-1)
    must lose recall vs the shipped defaults — the economics knob
    works in both directions. At corpus scale the knobs move the
    OTHER way for the same recall: LSH n_planes grows ~log N (bucket
    selectivity), IVF n_list grows ~sqrt(N) at fixed probe ratio."""
    truth = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5).collect()
    }
    lo_lsh = {
        (r["vec_id"], r["neighbor_id"])
        for r in lsh_bucket_topk(emb, k=5, n_planes=6, n_tables=2).collect()
    }
    lo_ivf = {
        (r["vec_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k=5, n_probe=1).collect()
    }
    assert len(truth & lo_lsh) / len(truth) < 0.9
    assert len(truth & lo_ivf) / len(truth) < 0.9


def test_asymmetric_search_strategies_and_recall(spark, emb):
    """cosine_search / lsh_search (query batch vs corpus): arrow and
    jvm strategies must be value-identical, exact search must return
    the true top-k (cross-checked against a pandas argsort), and the
    ANN variant must hit recall@5 >= 0.9 at shipped defaults."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.similarity import cosine_search, lsh_search

    queries = emb.where("vec_id % 5 = 0").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    base = emb.where("vec_id % 5 <> 0")
    exact_a = sorted(map(tuple, cosine_search(queries, base, k=5).collect()))
    exact_j = sorted(
        map(tuple, cosine_search(queries, base, k=5, strategy="jvm").collect())
    )
    assert exact_a == exact_j and len(exact_a) == queries.count() * 5
    truth = {(r[0], r[1]) for r in exact_a}
    ann_a = lsh_search(queries, base, k=5, strategy="arrow")
    ann_j = lsh_search(queries, base, k=5, strategy="jvm")
    got_a = sorted(map(tuple, ann_a.collect()))
    got_j = sorted(map(tuple, ann_j.collect()))
    assert got_a == got_j
    approx = {(r[0], r[1]) for r in got_a}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"asymmetric ANN default recall too low: {recall}"
    # no query row may receive a neighbor from the query set itself
    q_ids = {r["q_id"] for r in queries.select("q_id").collect()}
    assert not any(n in q_ids for _, n, _, _ in got_a)


def test_asymmetric_ivf_search_strategies_and_recall(spark, emb):
    """ivf_search (query batch vs corpus, the coarse-quantizer shape):
    arrow and jvm strategies value-identical, recall@5 >= 0.9 vs the
    exact cosine_search truth at shipped defaults (n_probe=8 of the 10
    corpus lists), no neighbor from the query set, deterministic
    across repartitioning."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.similarity import cosine_search, ivf_search

    queries = emb.where("vec_id % 5 = 0").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    base = emb.where("vec_id % 5 <> 0")
    truth = {
        (r[0], r[1]) for r in cosine_search(queries, base, k=5).collect()
    }
    got_a = sorted(
        map(tuple, ivf_search(queries, base, k=5, strategy="arrow").collect())
    )
    got_j = sorted(
        map(tuple, ivf_search(queries, base, k=5, strategy="jvm").collect())
    )
    assert got_a == got_j
    approx = {(r[0], r[1]) for r in got_a}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"asymmetric IVF default recall too low: {recall}"
    q_ids = {r["q_id"] for r in queries.select("q_id").collect()}
    assert not any(n in q_ids for _, n, _, _ in got_a)
    two = sorted(
        map(
            tuple,
            ivf_search(queries.repartition(7), base, k=5, strategy="arrow").collect(),
        )
    )
    assert got_a == two


def test_refine_kernels_bitwise_equal(spark, emb):
    """_refine_pairs_relational's vectorized arrow kernel must equal
    the pure-Catalyst zip_with/aggregate fold EXACTLY (same left-fold
    add sequence, same rounding) — this is what keeps the jvm ANN path
    oracle-green after the kernel swap."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.similarity import _refine_pairs_relational

    ids = emb.select(F.col("vec_id")).limit(40)
    cand = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        .where("vec_id <> neighbor_id")
    )
    out = {}
    for kernel in ("arrow", "catalyst"):
        out[kernel] = sorted(
            map(
                tuple,
                _refine_pairs_relational(
                    cand, emb, "vec_id", "embedding", 6, kernel=kernel
                ).collect(),
            )
        )
    assert out["arrow"] == out["catalyst"] and len(out["arrow"]) == 40 * 39


def test_ann_auto_strategy_size_adaptive(spark, emb):
    """Plan regression (100 TB mandate): strategy='auto' must route a
    base side above the broadcast budget to the fully relational jvm
    path — NEVER through build_emb_index's driver toPandas — and a
    small base to the broadcast-index arrow path. The threshold is
    exercised exactly (<=: arrow, >: jvm) with a tiny max_rows so no
    big table is materialized."""
    from cityfinder_spark.operators.similarity import _resolve_ann_strategy

    assert _resolve_ann_strategy(emb, "auto", None, max_rows=500) == "arrow"
    assert _resolve_ann_strategy(emb, "auto", None, max_rows=499) == "jvm"
    # explicit strategies pass through untouched (no count job)
    assert _resolve_ann_strategy(emb, "arrow", None) == "arrow"
    assert _resolve_ann_strategy(emb, "jvm", None) == "jvm"
    # the memoized count is keyed by cache_key: second call = no job
    from cityfinder_spark import bcast

    key = ("embs_autotest",)
    assert _resolve_ann_strategy(emb, "auto", key, max_rows=500) == "arrow"
    assert bcast._CACHE[("__value__", "baserows", *key)][1] == 500


def test_ann_ivf_strategies_agree(spark, emb):
    """Candidate semantics are identical across strategies; centroid
    fold order differs only in ulps (bincount id-ascending vs F.avg
    partition order), which on this well-separated synthetic table
    never flips a probe choice — so results match exactly."""
    a = sorted(map(tuple, ivf_topk(emb, k=5, strategy="arrow").collect()))
    j = sorted(map(tuple, ivf_topk(emb, k=5, strategy="jvm").collect()))
    assert a == j


def test_ann_ivf_arrow_deterministic(spark, emb):
    one = sorted(map(tuple, ivf_topk(emb.repartition(7), k=5).collect()))
    two = sorted(map(tuple, ivf_topk(emb.repartition(3), k=5).collect()))
    assert one == two


def test_cosine_strategies_bitwise_equal(spark, emb):
    """Arrow kernels must reproduce the JVM fold bit-for-bit (same
    left-fold add sequence, single division by the norm product) —
    this is what keeps the DuckDB oracle hash-matching when the
    default strategy is arrow."""
    from cityfinder_spark.operators.similarity import cosine_dedup_pairs

    for fn, kwargs in (
        (cosine_topk, {"k": 5}),
        (cosine_dedup_pairs, {"threshold": 0.5}),
        (lsh_bucket_topk, {"k": 5}),
    ):
        a = sorted(map(tuple, fn(emb, strategy="arrow", **kwargs).collect()))
        j = sorted(map(tuple, fn(emb, strategy="jvm", **kwargs).collect()))
        assert a == j, f"{fn.__name__} strategies diverge"


def test_dedup_strategies_exactly_equal(spark):
    """simhash / minhash / shingles are pure integer+string pipelines,
    so arrow and jvm strategies must be EXACTLY equal, not just
    hash-close."""
    from cityfinder_spark.operators.dedup import (
        minhash_signatures,
        simhash,
        word_shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(8)
    for fn in (simhash, minhash_signatures, word_shingles):
        a = sorted(map(tuple, fn(docs, strategy="arrow").collect()))
        j = sorted(map(tuple, fn(docs, strategy="jvm").collect()))
        assert a == j, f"{fn.__name__} strategies diverge"


def test_decontaminate_flags_exact_overlap(spark):
    """A train doc copying a held-out doc's text must be contaminated;
    a train doc with disjoint vocabulary must be clean."""
    from cityfinder_spark.operators.dedup import decontaminate
    from cityfinder_spark.operators.sampling import HASH_M, SPLIT_A

    # find ids landing in train (h >= 10000) vs held (h < 10000)
    train_ids = [i for i in range(1, 400) if (i * SPLIT_A) % HASH_M >= 10000]
    held_ids = [i for i in range(1, 400) if (i * SPLIT_A) % HASH_M < 10000]
    assert train_ids and held_ids
    held_text = "alpha beta gamma delta epsilon"
    rows = [(held_ids[0], held_text),
            (train_ids[0], held_text),                      # verbatim copy
            (train_ids[1], "zeta eta theta iota kappa")]    # disjoint
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_shared"], r["contaminated"])
           for r in decontaminate(docs, n=3).collect()}
    assert set(out) == {train_ids[0], train_ids[1]}
    assert out[train_ids[0]] == (3, True)   # 5 words -> 3 shingles, all shared
    assert out[train_ids[1]] == (0, False)


def test_repetition_stats_hand_computed(spark):
    """Hand-computable docs: uniform text, a degenerate one-word loop,
    a single-word doc (no bigrams), and a half-repeated doc."""
    from cityfinder_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            ("all_same", "x x x x x"),        # bigrams: 4x "x x"
            ("distinct", "a b c d e"),        # 4 distinct bigrams
            ("one_word", "solo"),             # no bigrams at all
            ("half_rep", "a b a b a"),        # bigrams: ab,ba,ab,ba
        ],
        "doc_id string, text string",
    )
    got = {r.doc_id: r.asDict() for r in repetition_stats(docs).collect()}
    assert got["all_same"]["top_bigram_ratio"] == 1.0
    assert got["all_same"]["dup_bigram_ratio"] == 0.75
    assert got["all_same"]["dup_trigram_ratio"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["all_same"]["repetitive"] is True
    assert got["distinct"]["top_bigram_ratio"] == 0.25
    assert got["distinct"]["dup_bigram_ratio"] == 0.0
    assert got["distinct"]["repetitive"] is False
    assert got["one_word"]["top_bigram_ratio"] == 0.0
    assert got["one_word"]["dup_bigram_ratio"] == 0.0
    assert got["one_word"]["repetitive"] is False
    assert got["half_rep"]["top_bigram_ratio"] == 0.5
    assert got["half_rep"]["dup_bigram_ratio"] == 0.5


def test_repetition_stats_zero_shuffle_plan(spark):
    """Pure projection (jvm reference plan): no Exchange anywhere.
    The arrow default adds only spread()'s round-robin scan widening,
    never a keyed exchange."""
    from cityfinder_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "x y z")], "doc_id string, text string"
    )
    plan = (
        repetition_stats(docs, strategy="jvm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    aplan = (
        repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in aplan


def test_repetition_stats_arrow_jvm_parity(spark):
    """The Arrow Counter kernel and the Catalyst HOF fold are
    value-identical, including edge docs (empty, 1-token, all-same,
    exactly-2-token)."""
    from cityfinder_spark.operators.textops import repetition_stats

    texts = [
        "",
        "one",
        "a a a a a a a a",
        "x y",
        "p q p q p q r s t",
        " ".join(f"w{i % 7}" for i in range(60)),
    ]
    docs = _docs(spark, texts)
    a = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    j = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(docs, strategy="jvm").collect()
    }
    assert a == j


def test_exact_percentiles_hand_computed(spark):
    """Type-1 percentile = smallest value whose cumulative count
    reaches ceil(p*N) — pinned against a hand-computed distribution,
    including a p that lands exactly on a bracket boundary."""
    from cityfinder_spark.operators.textops import exact_percentiles

    # values: 1 x10, 2 x5, 10 x4, 100 x1  (N=20)
    rows = [(1,)] * 10 + [(2,)] * 5 + [(10,)] * 4 + [(100,)] * 1
    df = spark.createDataFrame(rows, "v long")
    got = {
        r.p: (r.value, r.cum_count, r.total)
        for r in exact_percentiles(df, "v", ps=(0.5, 0.75, 0.76, 0.95, 1.0)).collect()
    }
    assert got[0.5] == (1, 10, 20)    # ceil(10) = 10 -> value 1 exactly
    assert got[0.75] == (2, 15, 20)   # ceil(15) = 15 -> value 2 exactly
    assert got[0.76] == (10, 19, 20)  # needs 16 -> first bracket >= is 10
    assert got[0.95] == (10, 19, 20)
    assert got[1.0] == (100, 20, 20)


def test_exact_percentiles_partition_invariant(spark):
    """Same answer at any parallelism — the count-by-value plan has no
    order dependence."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.textops import exact_percentiles

    df = spark.range(10007).select((F.col("id") * 37 % 500).alias("v"))
    a = sorted(map(tuple, exact_percentiles(df.repartition(1), "v").collect()))
    b = sorted(map(tuple, exact_percentiles(df.repartition(32), "v").collect()))
    assert a == b and len(a) == 3


def test_quantize_embeddings_numpy_parity(spark):
    """Spark codes/checksums/error equal an independent numpy
    implementation, and the reconstruction error is bounded by the
    quantization step (|x - q*s| <= s/2 per element)."""
    import math

    import numpy as np

    from cityfinder_spark.operators.quantize import quantize_embeddings

    rng = np.random.default_rng(7)
    vecs = [(f"v{i}", rng.normal(size=16).astype("float32").tolist()) for i in range(50)]
    vecs.append(("zero", [0.0] * 16))  # s = 0 edge: all codes 0
    df = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for vid, emb in vecs:
        x = np.array(emb, dtype=np.float64)
        s = float(np.abs(x).max()) / 127.0
        q = np.zeros_like(x) if s == 0 else np.floor(x / s + 0.5)
        r = got[vid]
        assert r.dim == 16
        assert np.abs(q).max() <= 127
        assert r.qsum == int(q.sum())
        assert r.qdot == int((q * np.arange(1, 17)).sum())
        err = math.sqrt(float(((x - q * s) ** 2).sum()))
        assert abs(r.l2_err - err) < 1e-6
        assert np.abs(x - q * s).max() <= s / 2 + 1e-12
        assert abs(r.scale - s) < 1e-6


def test_quantize_embeddings_zero_shuffle_plan(spark):
    from cityfinder_spark.operators.quantize import quantize_embeddings

    df = spark.createDataFrame(
        [("a", [1.0, -2.0])], "vec_id string, embedding array<float>"
    )
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quantized_cosine_topk_recall_vs_exact(spark):
    """The int8 serving path must return (nearly) the same neighbors
    as exact float cosine: recall@5 >= 0.95 on the contract
    embeddings, and the quantized similarities sit within the
    quantization error of the exact ones for shared pairs."""
    from cityfinder_spark.operators.quantize import quantized_cosine_topk

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r.vec_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(embs, k=5).collect()
    }
    quant = {
        (r.vec_id, r.neighbor_id): r.cos_sim
        for r in quantized_cosine_topk(embs, k=5).collect()
    }
    shared = set(exact) & set(quant)
    recall = len(shared) / len(exact)
    assert recall >= 0.95, f"quantized recall@5 = {recall:.3f}"
    for pair in shared:
        assert abs(exact[pair] - quant[pair]) < 0.02


def test_quantized_cosine_topk_arrow_jvm_parity(spark):
    """The arrow kernel (int64 matmul) must equal the jvm plan
    (Catalyst folds + window) row-for-row — integer dots are order-free
    so the two strategies are bit-identical, not just close."""
    from cityfinder_spark.operators.quantize import quantized_cosine_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, quantized_cosine_topk(embs, k=5, strategy="arrow").collect()))
    j = sorted(map(tuple, quantized_cosine_topk(embs, k=5, strategy="jvm").collect()))
    assert a == j and len(a) > 0


def test_group_topk_equals_naive_window(spark):
    """Two-phase top-k (local per-partition prune + global merge) must
    equal the naive window plan row-for-row, at any parallelism, with
    deterministic tie-breaks on equal scores."""
    from pyspark.sql import Window, functions as F

    from cityfinder_spark.operators.topk import group_topk

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
        # coarse score -> plenty of exact ties to exercise the tie-break
        ((F.col("id") * 37 % 50) / 10.0).alias("quality"),
    )
    naive_w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    naive = (
        df.withColumn("rank", F.row_number().over(naive_w))
        .where(F.col("rank") <= 4)
        .select("source", "rank", "doc_id", "quality")
    )
    want = sorted(map(tuple, naive.collect()))
    for parts in (1, 32):
        got = sorted(
            map(
                tuple,
                group_topk(df.repartition(parts), 4, "source", "quality", "doc_id").collect(),
            )
        )
        assert got == want
    assert len(want) == 7 * 4


def test_ngram_containment_catches_quotes_jaccard_misses(spark):
    """A short doc quoted verbatim inside a long one: containment 1.0,
    Jaccard diluted below the near-dup threshold."""
    from cityfinder_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"tok{i}" for i in range(120))
    docs = spark.createDataFrame(
        [("a", short), ("b", filler + " " + short + " " + filler)],
        "doc_id string, text string",
    )
    cont = ngram_containment_pairs(docs, n=3, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.doc_a, row.doc_b, row.containment) == ("a", "b", 1.0)
    assert row.jaccard < 0.2  # the Jaccard gate would miss this pair
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.2).count() == 0


def test_vocab_topk_hand_computed(spark):
    """Counts, doc frequency, and the (count desc, token asc)
    tie-break on a corpus small enough to count by hand."""
    from cityfinder_spark.operators.textops import vocab_topk

    docs = _docs(spark, ["b a b", "a b c", "c a"])
    rows = vocab_topk(docs, k=10).collect()
    got = [(r["rank"], r["token"], r["n_occurrences"], r["doc_freq"]) for r in rows]
    # a: 3 occurrences in 3 docs; b: 3 in 2; c: 2 in 2 — the a/b count
    # tie breaks on token ascending
    assert got == [(1, "a", 3, 3), (2, "b", 3, 2), (3, "c", 2, 2)]


def test_vocab_topk_k_truncates_and_skips_empty(spark):
    from cityfinder_spark.operators.textops import vocab_topk

    docs = _docs(spark, ["x  y", "y"])  # double space -> empty token
    rows = vocab_topk(docs, k=1).collect()
    assert [(r["rank"], r["token"], r["n_occurrences"]) for r in rows] == [
        (1, "y", 2)
    ]


def test_bm25_hand_computed(spark):
    """Score formula checked against a from-scratch Python replay on a
    corpus small enough to verify by eye; absent terms contribute 0;
    docs with no query term never appear."""
    import math

    from cityfinder_spark.operators.textops import bm25_topk

    texts = ["a b c d", "a a b", "c c c", "d d"]
    docs = _docs(spark, texts)
    rows = bm25_topk(docs, ["a", "b", "zz"], k=10).collect()
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in rows}
    assert set(got) == {0, 1}  # docs 2 and 3 contain no query term

    n, avgdl = 4.0, (4 + 3 + 3 + 2) / 4.0
    k1, b = 1.2, 0.75

    def s(tf, dl, df):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    exp0 = math.floor((s(1, 4, 2) + s(1, 4, 2)) * 1e6 + 0.5) / 1e6
    exp1 = math.floor((s(2, 3, 2) + s(1, 3, 2)) * 1e6 + 0.5) / 1e6
    assert got[1] == (1, exp1)  # doc 1: tf(a)=2 on a shorter doc
    assert got[0] == (2, exp0)
    assert exp1 > exp0


def test_bm25_tie_breaks_on_doc_id(spark):
    from cityfinder_spark.operators.textops import bm25_topk

    docs = _docs(spark, ["a x", "a x", "y y"])
    rows = bm25_topk(docs, ["a"], k=5).collect()
    assert [(r["rank"], r["doc_id"]) for r in rows] == [(1, 0), (2, 1)]
    assert rows[0]["score"] == rows[1]["score"]


def test_tokenize_ids_hand_computed(spark):
    """Vocab-id mapping, 0-based positions, OOV -> 0, empty tokens
    from double spaces -> 0 (not in vocab)."""
    from cityfinder_spark.operators.textops import tokenize_ids, vocab_topk

    docs = _docs(spark, ["b a b", "a  z"])  # double space -> empty token
    vocab = vocab_topk(docs, k=2).selectExpr("rank as token_id", "token")
    # vocab: a(3 occ... wait: a:2, b:2 -> tie -> a rank 1, b rank 2
    rows = tokenize_ids(docs, vocab).collect()
    got = sorted((r["doc_id"], r["pos"], r["token_id"]) for r in rows)
    assert got == [
        (0, 0, 2), (0, 1, 1), (0, 2, 2),   # b a b
        (1, 0, 1), (1, 1, 0), (1, 2, 0),   # a <empty> z (z is OOV, k=2)
    ]


def test_tokenize_ids_plan_has_no_shuffle_of_corpus(spark):
    from cityfinder_spark.operators.textops import tokenize_ids, vocab_topk

    docs = _docs(spark, ["a b", "b c"])
    vocab = vocab_topk(docs, k=3).selectExpr("rank as token_id", "token")
    plan = (
        tokenize_ids(docs, vocab)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ------------------------------------------------------ bloom decontaminate


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_bloom_decontaminate_superset_of_exact(spark, docs):
    """No false negatives: every exactly-contaminated doc is flagged,
    and n_flagged >= n_shared row-wise."""
    from cityfinder_spark.operators.dedup import bloom_decontaminate, decontaminate

    exact = {r["doc_id"]: r["n_shared"] for r in decontaminate(docs, n=3).collect()}
    bloom = {r["doc_id"]: r["n_flagged"]
             for r in bloom_decontaminate(docs, n=3).collect()}
    assert set(bloom) == set(exact)
    for doc_id, n_shared in exact.items():
        assert bloom[doc_id] >= n_shared
    # at m=2^20 / gate-scale eval sets, FPs should be rare: totals close
    assert sum(bloom.values()) <= sum(exact.values()) + 25


def test_bloom_probe_side_has_no_exchange(spark, docs):
    """The 100 TB property: the train probe is scan -> filter ->
    mapInPandas, with the eval side living entirely in the broadcast
    filter — no exchange anywhere in the returned plan."""
    from cityfinder_spark.operators.dedup import bloom_decontaminate

    out = bloom_decontaminate(docs, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_tiny_filter_still_superset(spark):
    """Degenerate m forces heavy FP collisions; the one-sided
    guarantee must hold anyway."""
    from cityfinder_spark.operators.dedup import bloom_decontaminate, decontaminate

    docs = spark.createDataFrame(
        [(i, f"tok{i%7} tok{(i*3)%11} tok{(i*5)%13} shared phrase here")
         for i in range(1, 200)],
        "doc_id long, text string",
    )
    exact = {r["doc_id"]: r["n_shared"] for r in decontaminate(docs, n=3).collect()}
    bloom = {r["doc_id"]: r["n_flagged"]
             for r in bloom_decontaminate(docs, n=3, m=64, k=2).collect()}
    assert set(bloom) == set(exact)
    assert all(bloom[d] >= s for d, s in exact.items())


# -------------------------------------------------------- length outliers


def test_length_outliers_hand_computed(spark):
    """Group of nine 10-token docs + one 100-token doc: only the long
    one is beyond 2 sigma; z-scores match a direct computation."""
    import math

    from cityfinder_spark.operators.textops import length_outliers

    rows = [(i, "g", " ".join(["w"] * 10)) for i in range(9)]
    rows.append((9, "g", " ".join(["w"] * 100)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in length_outliers(docs, z=2).collect()}
    xs = [10] * 9 + [100]
    n, s, ss = len(xs), sum(xs), sum(x * x for x in xs)
    for i, x in enumerate(xs):
        want_z = (n * x - s) / math.sqrt(n * ss - s * s)
        assert abs(out[i]["z_score"] - want_z) < 1e-6
        assert out[i]["is_outlier"] == ((n * x - s) ** 2 > 4 * (n * ss - s * s))
    assert out[9]["is_outlier"] and not out[0]["is_outlier"]


def test_length_outliers_constant_group_never_flags(spark):
    from cityfinder_spark.operators.textops import length_outliers

    docs = spark.createDataFrame(
        [(i, "g", "a b c") for i in range(20)],
        "doc_id long, source string, text string",
    )
    out = length_outliers(docs).collect()
    assert all(r["z_score"] == 0.0 and not r["is_outlier"] for r in out)


def test_length_outliers_partition_invariant(spark):
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.textops import length_outliers

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("tok"), (F.col("id") % 40 + 1).cast("int"))
        ).alias("text"),
    )
    a = sorted(map(tuple, length_outliers(docs.repartition(1)).collect()))
    b = sorted(map(tuple, length_outliers(docs.repartition(23)).collect()))
    assert a == b


# ------------------------------------------------------- minhash estimate


def test_minhash_estimate_identical_docs_score_one(spark):
    from cityfinder_spark.operators.dedup import minhash_estimate_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "one two three four five six seven")],
        "doc_id long, text string",
    )
    out = minhash_estimate_pairs(docs, n=3, threshold=0.2).collect()
    assert [(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in out] == [(1, 2, 1.0)]


def test_minhash_estimate_tracks_exact_jaccard(spark, docs):
    """On the contract corpus: every estimated pair is an LSH
    candidate with agreement-fraction within 0.35 of its exact J
    (M=16 -> sd <= 0.125; 0.35 ~ is just under 3 sd), and the
    est-pair set covers most exact pairs (same candidates, estimator
    noise only)."""
    from cityfinder_spark.operators.dedup import (
        minhash_estimate_pairs,
        minhash_lsh_pairs,
    )

    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs, n=3, threshold=0.2).collect()}
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
           for r in minhash_estimate_pairs(docs, n=3, threshold=0.2).collect()}
    assert est, "no estimated pairs at all"
    hits = sum(1 for p in exact if p in est)
    assert hits >= 0.5 * len(exact)
    from cityfinder_spark.operators.dedup import _pair_jaccard, word_shingles
    sh = word_shingles(docs, 3)
    true_j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in _pair_jaccard(sh, "doc_id").collect()}
    for p, e in est.items():
        assert abs(e - true_j.get(p, 0.0)) <= 0.35, (p, e, true_j.get(p))


# ---------- exact substring-span dedup (ExactSubstr shape) ----------


def _tok(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_duplicated_spans_cross_doc(spark):
    """A 6-token run shared by two docs flags exactly that span in
    both; unique surroundings stay unflagged."""
    from cityfinder_spark.operators.dedup import duplicated_spans

    shared = _tok(6, "s")
    docs = _docs(
        spark,
        [
            _tok(4, "a") + " " + shared + " " + _tok(4, "b"),  # span [4,10)
            _tok(2, "c") + " " + shared + " " + _tok(7, "d"),  # span [2,8)
        ],
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(docs, gram_len=6).collect()
    }
    assert rows == {0: (4, 10, 6), 1: (2, 8, 6)}


def test_duplicated_spans_merge_overlap_and_adjacent(spark):
    """Two shared runs overlapping in one doc merge into ONE maximal
    interval (gaps-and-islands), and a doc repeating a gram WITHIN
    itself is flagged even with no cross-doc partner."""
    from cityfinder_spark.operators.dedup import duplicated_spans

    rep = _tok(6, "r")
    # doc 0: rep at [0,6) and again at [6,12) -> every 6-gram inside
    # the 12-token run that appears twice merges to one [0,12) island
    # (the two copies of `rep` alone guarantee >= 2 occurrences).
    docs = _docs(spark, [rep + " " + rep + " " + _tok(5, "x"), _tok(7, "y")])
    rows = [
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, gram_len=6).collect()
    ]
    assert rows == [(0, 0, 12)]


def test_substring_dedup_verdict_boundary(spark):
    """keep is the strict integer cross-multiplication
    dup_tokens*den < total_tokens*num (default < 1/5): a doc at
    exactly 1/5 duplicated is dropped, below it is kept."""
    from cityfinder_spark.operators.dedup import substring_dedup

    shared = _tok(6, "s")
    # doc 0: 6 dup tokens of 30 total = exactly 1/5 -> NOT kept
    # doc 1: 6 dup tokens of 31 total < 1/5 -> kept
    # doc 2: no duplicated span -> kept with zeros
    docs = _docs(
        spark,
        [
            shared + " " + _tok(24, "a"),
            shared + " " + _tok(25, "b"),
            _tok(8, "c"),
        ],
    )
    out = {
        r["doc_id"]: (r["total_tokens"], r["dup_spans"], r["dup_tokens"], r["keep"])
        for r in substring_dedup(docs, gram_len=6).collect()
    }
    assert out[0] == (30, 1, 6, False)
    assert out[1] == (31, 1, 6, True)
    assert out[2] == (8, 0, 0, True)


def test_duplicated_spans_short_docs_excluded(spark):
    """Docs shorter than gram_len produce no occurrences (and no
    crash from a negative sequence bound)."""
    from cityfinder_spark.operators.dedup import duplicated_spans

    docs = _docs(spark, [_tok(3, "a"), _tok(3, "a")])
    assert duplicated_spans(docs, gram_len=6).count() == 0


def test_substring_scrub_keeps_canonical_copy(spark):
    """The globally-canonical occurrence (min (doc_id, start)) of a
    duplicated run survives; the other doc loses exactly that span.
    clean_text is token-rejoined on both paths."""
    from cityfinder_spark.operators.dedup import substring_scrub

    shared = _tok(6, "s")
    t0 = _tok(4, "a") + " " + shared + " " + _tok(4, "b")
    t1 = _tok(2, "c") + " " + shared + " " + _tok(7, "d")
    out = {
        r["doc_id"]: (r["total_tokens"], r["removed_tokens"], r["clean_text"])
        for r in substring_scrub(_docs(spark, [t0, t1]), gram_len=6).collect()
    }
    # doc 0 holds the canonical copy -> untouched
    assert out[0] == (14, 0, t0)
    # doc 1 loses tokens [2, 8)
    assert out[1] == (15, 6, _tok(2, "c") + " " + _tok(7, "d"))


def test_substring_scrub_within_doc_repeat_keeps_first(spark):
    """A doc repeating a 6-token run back-to-back keeps the FIRST
    copy: only the second occurrence's span [6,12) is scrubbed."""
    from cityfinder_spark.operators.dedup import substring_scrub

    rep = _tok(6, "r")
    text = rep + " " + rep + " " + _tok(5, "x")
    out = substring_scrub(_docs(spark, [text, _tok(7, "y")]), gram_len=6)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["removed_tokens"] == 6
    assert rows[0]["clean_text"] == rep + " " + _tok(5, "x")
    assert rows[1]["removed_tokens"] == 0
    assert rows[1]["clean_text"] == _tok(7, "y")


def test_substring_scrub_fully_duplicate_doc_empties(spark):
    """A doc that is a verbatim copy of an earlier doc scrubs to the
    empty string (its every gram's canonical lives in the earlier
    doc)."""
    from cityfinder_spark.operators.dedup import substring_scrub

    t = _tok(9, "z")
    rows = {
        r["doc_id"]: (r["removed_tokens"], r["clean_text"])
        for r in substring_scrub(_docs(spark, [t, t]), gram_len=6).collect()
    }
    assert rows[0] == (0, t)
    assert rows[1] == (9, "")
