"""BPE merge-table training: parity with a pure-Python reference
implementation of the Sennrich algorithm, greedy-overlap semantics,
determinism across parallelism."""

from __future__ import annotations

from collections import Counter

import pytest

from cityfinder_spark.operators.bpe import BPE_EOW, bpe_train


def _ref_bpe(texts: list[str], n_merges: int):
    """Sennrich et al. 2016 pseudocode, verbatim: word-frequency
    table, most-frequent adjacent pair, greedy left-to-right fuse.
    Tie-break (count DESC, pair ASC) matches the operator's."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = Counter()
    for w, c in words.items():
        vocab[tuple(list(w) + [BPE_EOW])] += c
    out = []
    for r in range(1, n_merges + 1):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        m = max(pc.values())
        best = sorted(k for k, v in pc.items() if v == m)[0]
        if pc[best] < 2:
            break
        out.append((r, best[0], best[1], pc[best]))
        nxt: Counter = Counter()
        for syms, c in vocab.items():
            fused, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    fused.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    fused.append(syms[i])
                    i += 1
            nxt[tuple(fused)] += c
        vocab = nxt
    return out


def _run(spark, texts, n_merges, partitions=4):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    ).repartition(partitions)
    return [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, n_merges).orderBy("merge_rank").collect()
    ]


def test_bpe_train_matches_reference(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wide wider widest new new",
    ]
    assert _run(spark, texts, 10) == _ref_bpe(texts, 10)


def test_bpe_train_greedy_chains_and_eow(spark):
    """Runs of identical symbols fuse greedily left-to-right (the
    islands construction), and end-of-word merges are first-class."""
    texts = ["aaaa aaaa aa b b b"]
    got = _run(spark, texts, 6)
    assert got == _ref_bpe(texts, 6)
    # the (a, a) merge must appear and count chains greedily:
    # "aaaa"+EOW has 3 adjacent (a,a) pairs but only 2 greedy fuses
    pairs = {(l, r): c for _, l, r, c in got}
    assert ("a", "a") in pairs
    # EOW-touching merge learned too
    assert any(r == BPE_EOW for _, _, r, _ in got)


def test_bpe_train_partition_invariant(spark):
    texts = [f"tok{i % 7} tok{i % 3} shared shared" for i in range(40)]
    a = _run(spark, texts, 8, partitions=2)
    b = _run(spark, texts, 8, partitions=13)
    assert a == b == _ref_bpe(texts, 8)


def test_bpe_train_early_stop_and_empty(spark):
    # all pairs unique -> nothing repeats twice -> no merges survive
    got = _run(spark, ["abc def"], 5)
    ref = _ref_bpe(["abc def"], 5)
    assert got == ref
    # single repeated word trains until the word is one symbol
    got2 = _run(spark, ["xy xy xy"], 5)
    assert got2 == _ref_bpe(["xy xy xy"], 5)
    assert len(got2) == 2  # (x,y) then (xy, EOW); then nothing repeats


def test_bpe_segment_matches_reference(spark):
    """Apply half: replaying the learned merges segments every word
    exactly as the reference greedy implementation does."""
    from cityfinder_spark.operators.bpe import bpe_segment

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wide wider widest new new",
    ]
    merges = [(l, r) for _, l, r, _ in _ref_bpe(texts, 6)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {}
    for row in bpe_segment(docs, merges).collect():
        got.setdefault((row.doc_id, row.wpos), {})[row.tpos] = row.token
    # reference: apply merges in order per word
    def seg(word):
        syms = list(word) + [BPE_EOW]
        for pair in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for di, t in enumerate(texts):
        for wi, w in enumerate(t.split(" ")):
            want = seg(w)
            toks = got[(di, wi)]
            assert [toks[j] for j in sorted(toks)] == want, (di, wi, w)
    # tokens reassemble the corpus exactly
    for (di, wi), toks in got.items():
        joined = "".join(toks[j] for j in sorted(toks))
        assert joined == texts[di].split(" ")[wi] + BPE_EOW
