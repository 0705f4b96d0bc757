"""Sequence packing (operators/packing.py): concat-and-chunk layout."""

from __future__ import annotations

import numpy as np
import pytest

from cityfinder_spark.operators.packing import pack_sequences
from cityfinder_spark.operators.sampling import HASH_A, HASH_M


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(9)
    rows = [
        (i, " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(1, 40)))))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _np_oracle(pdf, budget):
    toks = pdf["text"].str.split(" ").str.len().to_numpy()
    h = (pdf["doc_id"].to_numpy() * HASH_A) % HASH_M
    order = np.lexsort((pdf["doc_id"].to_numpy(), h))
    start = np.zeros(len(pdf), np.int64)
    start[order] = np.concatenate([[0], np.cumsum(toks[order])[:-1]])
    return dict(
        zip(pdf["doc_id"], zip(toks, start // budget, start % budget))
    )


def test_pack_matches_serial_oracle(spark, docs):
    out = pack_sequences(docs, budget=64, n_chunks=7).collect()
    want = _np_oracle(docs.toPandas(), 64)
    assert len(out) == len(want)
    for r in out:
        nt, b, o = want[r["doc_id"]]
        assert (r["n_tokens"], r["bin_id"], r["bin_offset"]) == (nt, b, o)


def test_pack_deterministic_across_partitionings(spark, docs):
    a = sorted(map(tuple, pack_sequences(docs.repartition(11), budget=100).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(2), budget=100, n_chunks=3).collect()))
    assert a == b


def test_pack_stream_is_gapless(spark, docs):
    """Consecutive docs in packed order tile the token stream exactly:
    global starts are 0, t0, t0+t1, ... — no gaps, no overlaps."""
    rows = pack_sequences(docs, budget=64).collect()
    toks_total = sum(r["n_tokens"] for r in rows)
    starts = sorted(
        (64 * r["bin_id"] + r["bin_offset"], r["n_tokens"]) for r in rows
    )
    expect = 0
    for s, nt in starts:
        assert s == expect
        expect += nt
    assert expect == toks_total


def test_bin_manifest_tiles_bins_and_docs(spark, docs):
    from cityfinder_spark.operators.packing import bin_manifest

    B = 64
    rows = bin_manifest(docs, budget=B).collect()
    by_bin: dict = {}
    by_doc: dict = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append((r["bin_from"], r["seg_len"]))
        by_doc.setdefault(r["doc_id"], []).append((r["doc_from"], r["seg_len"]))
    # every bin except the last is tiled gaplessly to exactly B tokens
    last = max(by_bin)
    for bid, segs in by_bin.items():
        segs.sort()
        pos = 0
        for frm, ln in segs:
            assert frm == pos and ln > 0
            pos += ln
        if bid != last:
            assert pos == B, (bid, pos)
    # every document's segments tile [0, n_tokens)
    toks = {r["doc_id"]: len(r["text"].split(" ")) for r in docs.collect()}
    for did, segs in by_doc.items():
        segs.sort()
        pos = 0
        for frm, ln in segs:
            assert frm == pos
            pos += ln
        assert pos == toks[did]


def test_corpus_split_deterministic_and_leakage_safe(spark, docs):
    from cityfinder_spark.operators.sampling import corpus_split

    full = {r["doc_id"]: r["split"] for r in corpus_split(docs).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    # membership is a pure function of the id: a subset sees the SAME
    # assignments (no leakage across reruns / incremental loads)
    sub = {r["doc_id"]: r["split"]
           for r in corpus_split(docs.where("doc_id % 3 = 0")).collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_corpus_split_independent_of_rate_sample(spark, docs):
    """The split hash uses a different multiplier than sample_hash:
    a 5% rate-sample must still contain all three splits (with the
    SAME hash the survivors would be exactly the 'val' band)."""
    from cityfinder_spark.operators.sampling import corpus_split, rate_sample

    kept = corpus_split(rate_sample(docs, "doc_id", 0.1))
    splits = {r["split"] for r in kept.collect()}
    assert splits == {"train", "val", "test"}
