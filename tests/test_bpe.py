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


def _ref_bpe_bytes(texts: list[str], n_merges: int):
    """Byte-level reference: UTF-8 bytes as two-hex-digit symbols,
    no end-of-word marker, otherwise the identical Sennrich loop."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = Counter()
    for w, c in words.items():
        hx = w.encode("utf-8").hex().upper()
        vocab[tuple(hx[i : i + 2] for i in range(0, len(hx), 2))] += c
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


def test_bpe_train_driver_parity_char(spark):
    """The count-guarded driver heap trainer produces the IDENTICAL
    merge table (values AND tie-breaks) as the relational path and
    the pure-Python reference."""
    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wide wider widest new new",
        "aaaa aaaa aa b b b",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    ).repartition(5)
    rel = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, 12, strategy="relational")
        .orderBy("merge_rank")
        .collect()
    ]
    drv = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, 12, strategy="driver")
        .orderBy("merge_rank")
        .collect()
    ]
    assert rel == drv == _ref_bpe(texts, 12)


def test_bpe_train_bytes_mode_parity_and_multibyte(spark):
    """Byte-level mode: UTF-8 bytes, no EOW — a non-ASCII corpus
    exercises multi-byte characters (merges may fuse the bytes WITHIN
    a character first), and driver/relational agree exactly."""
    texts = [
        "héllo héllo héllo wörld wörld",
        "héllo wörld déjà déjà vu vu vu",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rel = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, 10, strategy="relational", mode="bytes")
        .orderBy("merge_rank")
        .collect()
    ]
    drv = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, 10, strategy="driver", mode="bytes")
        .orderBy("merge_rank")
        .collect()
    ]
    ref = _ref_bpe_bytes(texts, 10)
    assert rel == drv == ref
    # every learned symbol is a whole number of hex-digit pairs and
    # multi-byte fusions appear (é = C3 A9 is frequent)
    assert all(len(l) % 2 == 0 and len(r) % 2 == 0 for _, l, r, _ in ref)
    assert any(l == "C3" for _, l, _r, _ in ref)


def test_bpe_segment_broadcast_parity(spark):
    """The broadcast-merge-table Arrow segmenter returns the exact
    rows of the relational per-merge replay (both modes)."""
    from cityfinder_spark.operators.bpe import bpe_segment

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wide wider widest new new",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    ).repartition(3)
    for mode, ref in (
        ("char", _ref_bpe(texts, 6)),
        ("bytes", _ref_bpe_bytes(texts, 6)),
    ):
        merges = [(l, r) for _, l, r, _ in ref]
        rel = sorted(
            map(tuple, bpe_segment(docs, merges, strategy="relational", mode=mode).collect())
        )
        bc = sorted(
            map(tuple, bpe_segment(docs, merges, strategy="broadcast", mode=mode).collect())
        )
        assert rel == bc and len(rel) > 0, mode


def test_bpe_auto_routes_by_merge_count(spark):
    """auto = relational at small n_merges (the oracle shape), driver/
    broadcast above BPE_RELATIONAL_MAX_MERGES; a high-merge-count
    train over a real-ish corpus completes in driver time (seconds,
    not one Spark job per merge) and its prefix equals the relational
    table (merge sequences are prefix-stable in n_merges)."""
    import time

    from cityfinder_spark.operators.bpe import (
        BPE_RELATIONAL_MAX_MERGES,
        _resolve_bpe_strategy,
        bpe_segment,
    )

    assert _resolve_bpe_strategy(8, "auto", "driver") == "relational"
    assert (
        _resolve_bpe_strategy(BPE_RELATIONAL_MAX_MERGES + 1, "auto", "driver")
        == "driver"
    )
    words = [f"w{i % 97}x{i % 31}y{i % 11}" for i in range(4000)]
    texts = [" ".join(words[k : k + 40]) for k in range(0, 4000, 40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    t0 = time.time()
    big = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, 1000).orderBy("merge_rank").collect()
    ]
    dt = time.time() - t0
    assert len(big) > 200  # plenty of repeated pairs to learn
    assert dt < 60, f"driver trainer took {dt:.1f}s for 1000 merges"
    small = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, 6, strategy="relational")
        .orderBy("merge_rank")
        .collect()
    ]
    assert big[: len(small)] == small
    # the broadcast segmenter swallows the full 1000-merge table in
    # one pass and reassembles every word byte-for-byte
    from pyspark.sql import functions as F

    merges = [(l, r) for _, l, r, _ in big]
    seg = bpe_segment(docs, merges, strategy="broadcast")
    joined = (
        seg.orderBy("doc_id", "wpos", "tpos")
        .groupBy("doc_id", "wpos")
        .agg(F.concat_ws("", F.sort_array(F.collect_list(F.struct("tpos", "token")))["token"]).alias("j"))
    )
    bad = joined.where(~F.col("j").rlike("</w>$")).count()
    assert bad == 0


def test_indexed_segmenter_equals_naive_replay():
    """The serving-path indexed replay (symbol->ranks inverted index +
    lazy heap) is EXACTLY the naive sequential rank loop, including
    the subtle case where a fuse creates a symbol that a LOWER-rank
    merge mentions (the rank is in the past and must NOT re-apply).
    Randomized words over a real learned table + adversarial
    hand-built tables."""
    import random

    from cityfinder_spark.operators.bpe import (
        _apply_merges_indexed,
        _apply_merges_py,
        _merge_rank_index,
    )

    # a real learned table from a mixed corpus
    texts = [
        "low low low lower lowest newest newer",
        "aaaa aaab aabb abbb bbbb",
        "xyxy xyxz xzxz zzzz",
    ]
    merges = [(l, r) for _, l, r, _ in _ref_bpe(texts, 40)]
    idx = _merge_rank_index(merges)
    rng = random.Random(17)
    alphabet = list("abxyzlowenst")
    for trial in range(300):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        syms = list(w) + [BPE_EOW]
        assert _apply_merges_indexed(list(syms), merges, idx) == (
            _apply_merges_py(list(syms), merges)
        ), (trial, w)
    # adversarial: rank 2 creates "ab" but rank 0 mentions "ab" — the
    # naive loop passes rank 0 before "ab" exists; indexed must too.
    tricky = [("ab", "c"), ("x", "y"), ("a", "b")]
    tidx = _merge_rank_index(tricky)
    for w in ("abc", "abcabc", "xyab", "aabbcc"):
        syms = list(w)
        assert _apply_merges_indexed(list(syms), tricky, tidx) == (
            _apply_merges_py(list(syms), tricky)
        ), w
