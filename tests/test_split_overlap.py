"""Corpus-level k-mins overlap sketch (dedup.py::split_minhash_overlap):
estimator tracks exact shingle-set Jaccard, and the sketch is
merge-stable (MIN) across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from cityfinder_spark.contract import _docs, q_split_overlap
from cityfinder_spark.operators.dedup import split_minhash_overlap, word_shingles
from cityfinder_spark.operators.sampling import corpus_split
from tests.conftest import SF_DIR_01


def _exact_jaccard(spark):
    sh = corpus_split(word_shingles(_docs(spark, SF_DIR_01).select("doc_id", "text")))
    sets = {
        r.split: r.shingles
        for r in sh.groupBy("split")
        .agg(F.collect_set("shingle").alias("shingles"))
        .collect()
    }
    out = {}
    for a in sets:
        for b in sets:
            if a < b:
                sa, sb = set(sets[a]), set(sets[b])
                out[(a, b)] = len(sa & sb) / len(sa | sb)
    return out

def test_estimator_tracks_exact_jaccard(spark):
    exact = _exact_jaccard(spark)
    est = {
        (r.split_a, r.split_b): r.jaccard_est
        for r in q_split_overlap(spark, SF_DIR_01).collect()
    }
    assert set(est) == set(exact)
    for pair, e in est.items():
        # k=256 one-min-per-bucket: stderr ~ sqrt(J(1-J)/k) ~ 0.02;
        # allow 4 sigma plus a floor
        assert abs(e - exact[pair]) < 0.09, (pair, e, exact[pair])


def test_sketch_partition_invariant(spark):
    docs = _docs(spark, SF_DIR_01)
    a = {tuple(r) for r in split_minhash_overlap(docs).collect()}
    b = {tuple(r) for r in split_minhash_overlap(docs.repartition(13)).collect()}
    assert a == b
