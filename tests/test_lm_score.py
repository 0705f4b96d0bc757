"""Bigram-LM scoring (textops.train_bigram_lm / lm_score)."""

from __future__ import annotations

import math

import pandas as pd

from cityfinder_spark.operators.textops import lm_score, train_bigram_lm


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


CORPUS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat on the rug"),
    ("d3", "the dog sat on the mat"),
    ("d4", "zq xv qqq zz yy"),  # out-of-distribution transitions
]


def test_self_scoring_ranks_in_distribution_docs_higher(spark):
    out = {r.doc_id: r for r in lm_score(_docs(spark, CORPUS)).collect()}
    assert set(out) == {"d1", "d2", "d3", "d4"}
    # the templated docs share transitions -> higher avg log-prob
    assert out["d1"].avg_logp > out["d4"].avg_logp
    assert out["d2"].avg_logp > out["d4"].avg_logp
    n_tokens = {d: len(t.split(" ")) for d, t in CORPUS}
    for r in out.values():
        assert r.n_bigrams == n_tokens[r.doc_id] - 1
        assert r.avg_logp < 0.0


def test_score_matches_python_replay(spark):
    docs = _docs(spark, CORPUS)
    out = {r.doc_id: r for r in lm_score(docs).collect()}
    # python replay
    toks = {d: t.split(" ") for d, t in CORPUS}
    bigrams = [
        (w[i], w[i + 1]) for w in toks.values() for i in range(len(w) - 1)
    ]
    c12: dict = {}
    c1: dict = {}
    for b in bigrams:
        c12[b] = c12.get(b, 0) + 1
        c1[b[0]] = c1.get(b[0], 0) + 1
    v = len({t for w in toks.values() for t in w})
    for d, w in toks.items():
        lps = []
        for i in range(len(w) - 1):
            p = (c12[(w[i], w[i + 1])] + 1.0) / (c1[w[i]] + float(v))
            lps.append(math.floor(math.log(p) * 1e6 + 0.5))
        assert out[d].sum_lp_micro == sum(lps)
        n = len(lps)
        want = math.floor(((sum(lps) / 1e6) / n) * 1e6 + 0.5) / 1e6
        assert out[d].avg_logp == want


def test_heldout_scoring_with_pretrained_lm(spark):
    lm, v = train_bigram_lm(_docs(spark, CORPUS[:3]))
    held = _docs(
        spark,
        [
            ("h_in", "the cat sat on the mat"),  # fully in-model
            ("h_oov", "purple elephant flies sideways now"),  # all unseen
        ],
    )
    out = {r.doc_id: r for r in lm_score(held, lm=lm, vocab_size=v).collect()}
    assert out["h_in"].avg_logp > out["h_oov"].avg_logp
    # fully-unseen transitions floor at p = 1/V
    assert abs(out["h_oov"].avg_logp - math.floor(math.log(1.0 / v) * 1e6 + 0.5) / 1e6) < 1e-6


def test_short_docs_dropped(spark):
    out = lm_score(_docs(spark, [("one", "solo"), ("two", "a b")])).collect()
    assert {r.doc_id for r in out} == {"two"}


# ---------------- PII redaction ----------------

def test_redact_pii_placeholders_and_counts(spark):
    from cityfinder_spark.operators.textops import redact_pii

    docs = _docs(
        spark,
        [
            ("a", "mail me at jo.doe+x@sub.example.org or 555-123-4567"),
            ("b", "server 192.168.1.30 and 10.0.0.1 are fine"),
            ("c", "nothing sensitive here"),
        ],
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out["a"].text_redacted == "mail me at <EMAIL> or <PHONE>"
    assert (out["a"].n_email, out["a"].n_phone, out["a"].n_ipv4) == (1, 1, 0)
    assert out["b"].text_redacted == "server <IPV4> and <IPV4> are fine"
    assert out["b"].n_pii == 2
    assert out["c"].text_redacted == "nothing sensitive here"
    assert out["c"].n_pii == 0


def test_importance_sample_selects_target_like_docs(spark):
    """DSIR shape: candidates whose transitions match the target LM
    accept at tau=0; alien-transition candidates reject."""
    from cityfinder_spark.operators.textops import importance_sample

    target = _docs(
        spark,
        [
            ("t1", "the cat sat on the mat"),
            ("t2", "the cat sat on the rug"),
            ("t3", "the dog sat on the mat"),
        ],
    )
    cands = _docs(
        spark,
        [
            ("c1", "the cat sat on the mat"),  # pure target style
            ("c2", "zq xv qqq zz yy zq xv"),   # alien transitions
            ("c3", "aa bb cc dd ee ff gg"),    # alien transitions
        ],
    )
    out = {r.doc_id: r for r in importance_sample(cands, target).collect()}
    assert set(out) == {"c1", "c2", "c3"}
    assert out["c1"].accept and out["c1"].delta_micro > 0
    assert not out["c2"].accept and out["c2"].delta_micro < 0
    assert not out["c3"].accept
    # delta is the integer micro-nat sum; avg ties out with n_bigrams
    r = out["c1"]
    assert abs(r.avg_delta - r.delta_micro / 1e6 / r.n_bigrams) < 1e-6
