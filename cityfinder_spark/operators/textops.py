"""Text-analysis operators for the training-data pipeline (driver
mandate: language-ID, quality scoring, token counting, document
fingerprinting over the `documents` table).

All kernels are pure Column expressions (JVM, codegen) — tokenization
is whitespace split, hashing is md5-hex -> int48 (portable to the
DuckDB oracle via sqlcompat.md5_int_*)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from cityfinder_spark.colutils import round6_col

# per-language stopword lists for the n-gram/stopword-hit language-ID
# heuristic; tie-break = language code ascending.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "los", "las", "y", "que"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "le", "bu"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def _words(text_col: str = "text") -> F.Column:
    return F.split(F.col(text_col), " ")


def _hits(words: F.Column, stops: tuple[str, ...]) -> F.Column:
    arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (~4 chars per
    token, the usual byte-pair heuristic)."""
    w = _words(text_col)
    return docs.select(
        F.col(id_col),
        F.size(w).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.floor((F.length(F.col(text_col)) + 3) / F.lit(4.0)).cast("long").alias("bpe_est"),
    )


def quality_col(text_col: str = "text") -> F.Column:
    """Rounded composite quality score as a reusable Column (used by
    quality_score and the corpus-curation composite)."""
    w = _words(text_col)
    n = F.size(w)
    stop_ratio = _hits(w, EN_STOPWORDS) / n
    uniq_ratio = F.size(F.array_distinct(w)) / n
    avg_len = (F.length(F.col(text_col)) - (n - 1)) / n
    return round6_col(
        0.4 * stop_ratio + 0.3 * uniq_ratio + 0.3 * F.least(avg_len / 10.0, F.lit(1.0))
    )


def lang_pred_col(text_col: str = "text") -> F.Column:
    """Stopword-hit language prediction as a reusable Column; argmax
    score, tie-break language code ascending (strict > fold)."""
    w = _words(text_col)
    best = None
    best_lang = F.lit(None).cast("string")
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        score = _hits(w, stops)
        if best is None:
            best, best_lang = score, F.lit(lang)
        else:
            best_lang = F.when(score > best, F.lit(lang)).otherwise(best_lang)
            best = F.when(score > best, score).otherwise(best)
    return best_lang


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword / uniqueness quality heuristics; composite
    score = 0.4*stopword_ratio + 0.3*uniq_ratio + 0.3*min(avg_len/10,1)."""
    w = _words(text_col)
    n = F.size(w)
    stop_ratio = _hits(w, EN_STOPWORDS) / n
    uniq_ratio = F.size(F.array_distinct(w)) / n
    # chars minus separating spaces, over tokens
    avg_len = (F.length(F.col(text_col)) - (n - 1)) / n
    quality = quality_col(text_col)
    return docs.select(
        F.col(id_col),
        round6_col(stop_ratio).alias("stopword_ratio"),
        round6_col(uniq_ratio).alias("uniq_ratio"),
        round6_col(avg_len).alias("avg_word_len"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID; argmax score, tie-break lang asc."""
    w = _words(text_col)
    scores = {lang: _hits(w, stops) for lang, stops in sorted(LANG_STOPWORDS.items())}
    best = None
    best_lang = F.lit(None).cast("string")
    # fold in ascending lang order; strict > keeps earlier lang on ties
    for lang, score in scores.items():
        if best is None:
            best, best_lang = score, F.lit(lang)
        else:
            best_lang = F.when(score > best, F.lit(lang)).otherwise(best_lang)
            best = F.when(score > best, score).otherwise(best)
    sel = [F.col(id_col)] + [
        scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_STOPWORDS)
    ]
    return docs.select(*sel, best_lang.alias("lang_pred"))


def curate_corpus(
    docs: DataFrame,
    quality_min: float = 0.5,
    lang: str = "en",
    dedup_key: str = "substr(text, 1, 80)",
    rate: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """End-to-end corpus curation in ONE pass over the scan:
    quality floor + language filter + exact-dedup keep-first +
    deterministic rate sample, rolled up per source
    (source, n_docs, total_tokens, total_bpe).

    Plan shape: quality and language are pure column expressions
    computed in the same projection as the scan (joining the
    individual operators' outputs on doc_id would add two exchanges
    for what is per-row arithmetic); dedup keep-first is the single
    required window exchange on the normalization key; the sample is
    a codegen filter; the rollup is one map-side-combined aggregation.
    Two exchanges total, none carrying text payloads past the window.
    """
    from pyspark.sql import Window

    from cityfinder_spark.operators.sampling import rate_sample

    w = Window.partitionBy(F.expr(dedup_key))
    annotated = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.col(text_col),
        quality_col(text_col).alias("__quality"),
        lang_pred_col(text_col).alias("__lang"),
    ).withColumn("__is_dup", F.col(id_col) != F.min(id_col).over(w))
    kept = annotated.where(
        (F.col("__quality") >= F.lit(quality_min))
        & (F.col("__lang") == F.lit(lang))
        & (~F.col("__is_dup"))
    )
    sampled = rate_sample(kept, id_col, rate)
    wds = _words(text_col)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(wds)).alias("total_tokens"),
        F.sum(
            F.floor((F.length(F.col(text_col)) + 3) / F.lit(4.0)).cast("long")
        ).alias("total_bpe"),
    )


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    stride: int = 16,
) -> DataFrame:
    """Rolling-window document fingerprint: min md5-int48 over
    `window`-char substrings sampled every `stride` chars (winnowing-
    style sketch)."""
    expr = (
        f"array_min(transform("
        f"sequence(1, greatest(length({text_col}) - {window - 1}, 1), {stride}), "
        f"i -> cast(conv(substr(md5(substr({text_col}, i, {window})), 1, 12), 16, 10) as bigint)"
        f"))"
    )
    return docs.select(F.col(id_col), F.expr(expr).alias("fingerprint"))


# repetition gates. Gopher's web-text values are ~0.18 (top-bigram
# share) / ~0.30 (dup trigram share); the synthetic corpus draws from
# a ~30-word vocabulary, so the same percentile intent lands lower —
# these sit at ~p95 of the sf0.01 distribution, keeping both branches
# of the `repetitive` flag live in tests and the contract gate.
REP_TOP_BIGRAM_MAX = 0.09
REP_DUP_TRIGRAM_MAX = 0.02


def _grams_col(w: F.Column, k: int) -> F.Column:
    """array<string> of word k-grams (space-joined), empty when the
    doc has fewer than k words. Pure Catalyst higher-order functions."""
    n = F.size(w)
    gram = lambda i: F.concat_ws(" ", *[F.get(w, i + j) for j in range(k)])
    return F.when(n >= k, F.transform(F.sequence(F.lit(0), n - k), gram)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "arrow",
) -> DataFrame:
    """Gopher-style within-document repetition quality signals:

      * top_bigram_ratio  — share of all bigram occurrences taken by
        the single most frequent bigram (Gopher gates ~0.18);
      * dup_bigram_ratio  — share of bigram occurrences that are
        repeats of an earlier one (1 - distinct/total);
      * dup_trigram_ratio — same at trigram granularity;
      * repetitive        — the composite gate.

    Pure codegen projection — zero shuffle, no UDF: k-gram arrays via
    higher-order transform, then ONE aggregate fold over the SORTED
    gram array per k (the accumulator carries the previous element, so
    max multiplicity and distinct count fall out of run boundaries in
    a single O(n log n) sort + O(n) pass — each element is visited
    once, with no per-step re-evaluation of the outer array the naive
    distinct-x-filter count would pay). Per-row work, embarrassingly
    parallel at any corpus scale. Ratios are round6'd with the shared
    floor-form half-up so the DuckDB list-function replay is
    bit-identical.

    strategy="arrow" (default): one mapInPandas pass, per-doc Counter
    over the k-gram tuples — the fold runs in C instead of Catalyst's
    INTERPRETED higher-order aggregate (HOF lambdas never enter
    whole-stage codegen; measured 2.3s -> ~0.5s at sf0.1). Identical
    arithmetic (same IEEE division order, same floor-half-up round),
    parity-pinned against the jvm plan, which is retained as the
    relational reference. Zero shuffle either way."""
    if strategy == "arrow":
        return _repetition_stats_arrow(docs, id_col, text_col)
    w = _words(text_col)

    def ratios(k: int):
        g = F.array_sort(_grams_col(w, k))
        total = F.size(g)
        acc0 = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("dis"),
        )

        def step(acc, x):
            same = x.eqNullSafe(acc["prev"])  # prev=null on the 1st step
            run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
                F.when(same, acc["dis"]).otherwise(acc["dis"] + 1).alias("dis"),
            )

        folded = F.aggregate(g, acc0, step)
        top_ratio = F.when(total > 0, folded["best"] / total).otherwise(F.lit(0.0))
        dup_ratio = F.when(total > 0, 1.0 - folded["dis"] / total).otherwise(
            F.lit(0.0)
        )
        return round6_col(top_ratio), round6_col(dup_ratio)

    top2, dup2 = ratios(2)
    _, dup3 = ratios(3)
    # the top-share gate also requires an actual repeat (dup2 > 0):
    # a short all-distinct doc has top share 1/n_bigrams, which clears
    # the threshold by shortness alone, not by repetition
    rep = ((top2 > REP_TOP_BIGRAM_MAX) & (dup2 > 0.0)) | (
        dup3 > REP_DUP_TRIGRAM_MAX
    )
    return docs.select(
        F.col(id_col),
        top2.alias("top_bigram_ratio"),
        dup2.alias("dup_bigram_ratio"),
        dup3.alias("dup_trigram_ratio"),
        rep.alias("repetitive"),
    )


def _repetition_stats_arrow(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Arrow twin of the jvm repetition fold: Counter over k-gram
    tuples per doc; best/distinct/total are exact integers and the
    two divisions + floor-half-up round replicate round6_col."""
    from collections.abc import Iterator

    import pandas as pd

    from cityfinder_spark.operators.similarity import _id_field

    schema = T.StructType(
        [
            _id_field(docs, id_col, id_col),
            T.StructField("top_bigram_ratio", T.DoubleType()),
            T.StructField("dup_bigram_ratio", T.DoubleType()),
            T.StructField("dup_trigram_ratio", T.DoubleType()),
            T.StructField("repetitive", T.BooleanType()),
        ]
    )

    def r6(x: float) -> float:
        import math

        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    def stats(toks: list, k: int) -> tuple[float, float]:
        from collections import Counter

        n = len(toks) - k + 1
        if n <= 0:
            return 0.0, 0.0
        c = Counter(tuple(toks[i : i + k]) for i in range(n))
        best, dis = max(c.values()), len(c)
        return r6(best / n), r6(1.0 - dis / n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split(" ")
                top2, dup2 = stats(toks, 2)
                _t3, dup3 = stats(toks, 3)
                rep = (top2 > REP_TOP_BIGRAM_MAX and dup2 > 0.0) or (
                    dup3 > REP_DUP_TRIGRAM_MAX
                )
                out.append(
                    {
                        id_col: doc_id,
                        "top_bigram_ratio": top2,
                        "dup_bigram_ratio": dup2,
                        "dup_trigram_ratio": dup3,
                        "repetitive": rep,
                    }
                )
            yield pd.DataFrame(out, columns=list(schema.names))

    from cityfinder_spark.colutils import spread

    return spread(docs.select(id_col, text_col)).mapInPandas(gen, schema)


def exact_percentiles(
    df: DataFrame, value_col: str, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """EXACT type-1 percentiles of an integer-valued column: the
    smallest value whose cumulative count reaches ceil(p * N). Output:
    (p, value, cum_count, total), one row per requested percentile.

    Scale shape — percentiles without sorting the corpus: a map-side-
    combined groupBy(value) collapses 10^12 rows to |distinct values|
    counts (token counts, durations, sizes — domains in the thousands),
    the cumulative sum runs in a single-partition window over THAT tiny
    domain (never the fact table; the usual global-sort percentile
    funnels everything through one task), and each requested p picks
    its bracket with one broadcast-joined filter. Exact and
    deterministic — unlike approx_percentile, the result is oracle-
    able bit-for-bit."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    # total = the full-frame window sum — stays inside the same tiny
    # single-partition pass as the cumulative sum (no scalar crossJoin,
    # which would plan as a BroadcastNestedLoopJoin)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    # the requested ps ride along as an exploded literal array column
    return (
        cum.select(
            "v",
            "cum",
            "total",
            F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
        )
        .where(F.col("cum") >= F.ceil(F.col("p") * F.col("total")))
        .groupBy("p")
        .agg(
            F.min("v").alias("value"),
            F.min_by("cum", "v").alias("cum_count"),
            F.first("total").alias("total"),
        )
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-vocabulary build: the k most frequent tokens in the
    corpus with total occurrence count and document frequency. Output:
    (rank, token, n_occurrences, doc_freq), rank 1-based by
    (n_occurrences desc, token asc) — a deterministic ordering, so the
    result value-hashes against the DuckDB unnest replay.

    The first step of training any tokenizer (BPE/unigram vocab
    initialization, stopword discovery, OOV analysis) is exactly this
    aggregation. Scale shape: explode(split) is a codegen generator
    (no Python), groupBy(token) is map-side combined so the exchange
    carries |vocab| partial counts per task, not corpus tokens;
    count(distinct doc_id) rides the same exchange via partial
    distinct aggregation. The final top-k over the |vocab|-sized agg
    is TakeOrdered (per-partition heap + k-row driver merge), never a
    global sort of the corpus."""
    w = _words(text_col)
    tokens = docs.select(F.col(id_col), F.explode(w).alias("token")).where(
        F.col("token") != ""
    )
    counts = tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("doc_freq"),
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(k)
    # rank over the k surviving rows only (a k-row single-partition
    # window, not a corpus sort)
    from pyspark.sql import Window

    wr = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"),
        "token",
        "n_occurrences",
        "doc_freq",
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword search over the corpus: the k best documents for a
    bag of query TERMS. Output (rank, doc_id, score), rank 1-based by
    (score desc, doc_id asc), score round6'd — fully deterministic, so
    it value-hashes against the DuckDB replay.

    Robertson/Sparck-Jones BM25 with the standard +1 idf smoothing
    (idf = ln(1 + (N - df + .5)/(df + .5)), never negative):

        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Scale shape: the only corpus-sized work is one projection pass —
    explode(split) filtered to the query terms (a literal isin, pushed
    inside the generator), carrying dl along so NO join back to the
    corpus is needed; groupBy(doc) is map-side combined and only docs
    CONTAINING a term survive the filter, so the exchange is hit-sized,
    not corpus-sized. Corpus stats (N, avgdl) and per-term df are
    scalar/term-sized aggregates attached by broadcast. Determinism:
    per-(doc, term) tf is unique, so per-term scores pivot into fixed
    columns via max(when) — the final sum is a FIXED-ORDER chain of
    adds, never an order-dependent FP reduction.

    The serving-at-scale variant persists the (token -> postings)
    inverted index once (sinks.write_bucketed_table on token) and
    probes it per query; this operator IS the index-build + probe
    fused, which is the right plan for ad-hoc corpus queries."""
    w = _words(text_col)
    dl = F.size(w).cast("double")
    tok = (
        docs.select(F.col(id_col), dl.alias("__dl"), F.explode(w).alias("__t"))
        .where(F.col("__t").isin(*terms))
    )
    tf = tok.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).cast("double").alias("__tf"),
        F.first("__dl").alias("__dl"),
    )
    # Corpus scalars (N, avgdl) via ONE tiny scalar action, embedded as
    # literals: a crossJoin of the 1-row stats would plan as a nested-
    # loop node (plan-hygiene net) and a constant-key equi-join folds
    # back into one. avgdl is explicit sum/count — dl values are
    # integers, so the sum is exact in double under any combine order
    # (never avg(): engines differ in incremental-mean algorithms) and
    # the final division is the same IEEE op in Python and SQL.
    n_docs, dl_sum = docs.agg(
        F.count(F.lit(1)).cast("double"),
        F.sum(F.size(w).cast("double")),
    ).first()
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .withColumn("__n", F.lit(float(n_docs)))
        .withColumn(
            # empty corpus: tf is empty anyway; 1.0 only avoids the
            # Python-side zero division
            "__avgdl",
            F.lit(float(dl_sum) / float(n_docs) if n_docs else 1.0),
        )
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * F.col("__tf")
            * (k1 + 1.0)
            / (
                F.col("__tf")
                + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    # fixed-order sum: one pivoted column per term (tf is unique per
    # (doc, term), so max() extracts, never FP-reduces)
    per_term = scored.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("__t") == t, F.col("__s"))).alias(f"__s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    top = (
        per_term.select(F.col(id_col), round6_col(total).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    wr = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"), id_col, "score"
    )


def tokenize_ids(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = 0,
) -> DataFrame:
    """Tokenization against a fixed vocabulary — the step that turns a
    curated corpus into trainer input. VOCAB is a (token, token_id)
    table (e.g. `vocab_topk` ranks); output one row per corpus token:
    (doc_id, pos, token_id), pos 0-based within the doc, OOV -> oov_id.

    Scale shape: posexplode(split) is a codegen generator; the vocab
    map is a BROADCAST left join (a real tokenizer vocab is 32-256k
    rows — always broadcastable), so the corpus never shuffles at all.
    The exploded stream feeds `pack_sequences` downstream without
    re-keying. No Python anywhere."""
    w = _words(text_col)
    tok = docs.select(
        F.col(id_col), F.posexplode(w).alias("pos", "__t")
    )
    return tok.join(
        F.broadcast(vocab), tok["__t"] == vocab["token"], "left"
    ).select(
        id_col,
        F.col("pos").cast("int").alias("pos"),
        F.coalesce(vocab["token_id"], F.lit(oov_id)).cast("int").alias("token_id"),
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int]:
    """Train an add-one-smoothed bigram language model over the corpus
    (the KenLM/CCNet shape: score documents by how 'corpus-like' their
    word transitions are, filter the tail). Returns (lm, vocab_size):
    LM rows are (bigram, w1, n12, n1) with n1 = occurrences of w1 as a
    bigram PREFIX (the conditional denominator), derived from the
    bigram counts themselves — one corpus explode, one map-side-
    combined exchange; the prefix rollup is LM-sized. vocab_size is
    ONE scalar action (a literal hyper-parameter of the trained model,
    same pattern as bm25's corpus stats)."""
    w = _words(text_col)
    bg = docs.select(F.explode(_grams_col(w, 2)).alias("bigram"))
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n12"))
    c12 = c12.withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    lm = c12.join(c1, "w1").select("bigram", "w1", "n12", "n1")
    vocab_size = int(
        docs.select(F.explode(w).alias("t"))
        .agg(F.count_distinct("t"))
        .first()[0]
    )
    return lm, vocab_size


def lm_score(
    docs: DataFrame,
    lm: DataFrame | None = None,
    vocab_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-LM log-probability — the perplexity-style
    quality signal used to filter web corpora against a trusted LM.
    With lm=None the model trains on `docs` itself (self-scoring: a
    repetitive/templated doc scores HIGH, an out-of-distribution doc
    scores LOW). Output one row per doc with >= 1 bigram: (doc_id,
    n_bigrams, sum_lp_micro, avg_logp).

    Hash-exact despite logs: P(w2|w1) = (n12+1)/(n1+V) is two adds and
    one division (IEEE-identical cross-engine); each token's ln(p) is
    fixed-pointed to integer micro-nats BEFORE summation, so the
    per-doc rollup is an order-free integer sum, never an FP
    reduction (same discipline as trajectory_stats / kmeans).

    Scale shape: bigram counting is one map-side-combined exchange;
    scoring is one equi-join of the exploded corpus against the LM on
    the bigram key (broadcast when the LM is vocab-truncated, shuffle
    otherwise) plus one map-side-combined doc rollup. The trained LM
    is a reusable artifact — persist it once, score every new crawl
    batch against it."""
    if lm is None:
        lm, vocab_size = train_bigram_lm(docs, text_col=text_col)
        # the freshly-trained LM feeds two join branches (bigram
        # probabilities + prefix counts); persist the LM-sized table so
        # the training aggregation runs once — callers with a prebuilt
        # LM manage its storage themselves
        lm = lm.persist()
    if vocab_size is None:
        raise ValueError("vocab_size required when passing a prebuilt lm")
    w = _words(text_col)
    bg = docs.select(
        F.col(id_col), F.explode(_grams_col(w, 2)).alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    # LEFT joins so held-out docs score too: an unseen bigram gets the
    # add-one mass (n12 -> 0), an unseen prefix the uniform floor
    # (n1 -> 0, p = 1/V). Self-scoring never takes either branch.
    p = (F.coalesce(F.col("n12"), F.lit(0)).cast("double") + F.lit(1.0)) / (
        F.coalesce(F.col("n1"), F.lit(0)).cast("double")
        + F.lit(float(vocab_size))
    )
    lp = F.floor(F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (
        bg.join(lm.select("bigram", "n12"), "bigram", "left")
        .join(lm.select("w1", "n1").distinct(), "w1", "left")
        .select(F.col(id_col), lp.alias("__lp"))
    )
    n = F.count(F.lit(1))
    s = F.sum("__lp")
    return scored.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        s.alias("sum_lp_micro"),
        round6_col(
            (s.cast("double") / F.lit(1000000.0)) / n.cast("double")
        ).alias("avg_logp"),
    )


def importance_sample(
    docs: DataFrame,
    target: DataFrame,
    tau_micro: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, 'Data Selection
    for Language Models via Importance Resampling'): score every
    candidate document by the log importance ratio between a TARGET-
    domain n-gram LM and the raw-corpus LM, keep the docs whose
    transitions look more target-like than source-like. This is the
    'select web data that resembles Wikipedia' step of a pretraining
    mix, downstream of dedup and upstream of mixture_sample.

    Output per candidate doc with >= 1 bigram: (doc_id, n_bigrams,
    delta_micro, avg_delta, accept) where delta_micro is the integer
    micro-nat sum of per-bigram ln p_target - ln p_source and accept
    is the cross-multiplied average-threshold test
    delta_micro >= tau_micro * n_bigrams (order-free integer
    arithmetic throughout — same hash-exact discipline as lm_score;
    full DSIR samples ~ exp(delta) via Gumbel top-k, which composes
    here as sample_rate / a top-k over delta when a fixed budget
    matters).

    Both LMs smooth over the SAME event space — V = the union
    vocabulary of target + candidates — otherwise a tiny target vocab
    makes the unseen-bigram fallback 1/V_t spuriously large and alien
    text scores target-like (the add-one analogue of DSIR's shared
    hashed-ngram buckets).

    Scale shape: two LM trainings (each one map-side-combined
    bigram exchange over its corpus; the target corpus is small by
    construction), LMs merged bigram-wise/prefix-wise and persisted
    (LM-sized artifacts — train once, score every crawl batch), then
    ONE candidate-corpus explode joined against the merged LM + ONE
    map-side-combined doc rollup — the same single-pass cost as
    lm_score despite scoring under two models."""
    lm_t, _ = train_bigram_lm(target, text_col=text_col)
    lm_s, _ = train_bigram_lm(docs, text_col=text_col)
    w_all = _words(text_col)
    v_shared = int(
        docs.select(F.explode(w_all).alias("t"))
        .unionByName(target.select(F.explode(w_all).alias("t")))
        .agg(F.count_distinct("t"))
        .first()[0]
    )
    v_t = v_s = v_shared
    # merged LM: bigram-level numerators + prefix-level denominators
    # from BOTH models, so scoring pays one join chain, not two
    mbg = (
        lm_t.select("bigram", F.col("n12").alias("n12_t"))
        .join(
            lm_s.select("bigram", F.col("n12").alias("n12_s")),
            "bigram",
            "full_outer",
        )
        .persist()
    )
    mw1 = (
        lm_t.select("w1", "n1").distinct()
        .withColumnRenamed("n1", "n1_t")
        .join(
            lm_s.select("w1", "n1").distinct().withColumnRenamed("n1", "n1_s"),
            "w1",
            "full_outer",
        )
        .persist()
    )
    w = _words(text_col)
    bg = docs.select(
        F.col(id_col), F.explode(_grams_col(w, 2)).alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))

    def lp(n12, n1, v: int) -> F.Column:
        p = (F.coalesce(n12, F.lit(0)).cast("double") + F.lit(1.0)) / (
            F.coalesce(n1, F.lit(0)).cast("double") + F.lit(float(v))
        )
        return F.floor(F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")

    dlp = lp(F.col("n12_t"), F.col("n1_t"), v_t) - lp(
        F.col("n12_s"), F.col("n1_s"), v_s
    )
    scored = (
        bg.join(mbg, "bigram", "left")
        .join(mw1, "w1", "left")
        .select(F.col(id_col), dlp.alias("__dlp"))
    )
    n = F.count(F.lit(1))
    s = F.sum("__dlp")
    return scored.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        s.alias("delta_micro"),
        round6_col(
            (s.cast("double") / F.lit(1000000.0)) / n.cast("double")
        ).alias("avg_delta"),
        (s >= F.lit(int(tau_micro)) * n).alias("accept"),
    )


# PII patterns: conservative regex syntax valid in BOTH Java regex
# (Spark) and RE2 (DuckDB) — classes, bounded repeats, \d, \b only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrubbing — the compliance pass every training corpus runs
    before packing: emails/phones/IPs replaced with typed placeholders
    ('<EMAIL>', ...). Pure codegen projection (regexp_replace chain +
    regexp_extract_all counts): zero shuffle, zero Python, pushdown-
    friendly. Output: (id, text_redacted, n_email, n_phone, n_ipv4,
    n_pii). Patterns deliberately use the regex subset whose semantics
    agree between Java regex and RE2, so the DuckDB oracle replays the
    exact redacted strings (leftmost match, global replace)."""
    pats = patterns or PII_PATTERNS
    out = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    total = None
    for name in pats:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col), out.alias("text_redacted"), *counts
    ).withColumn("n_pii", total)


def length_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ps: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Length-bucketed batching assignment (the curriculum / padding-
    efficiency pass: group docs of similar token length so packed
    batches waste minimal padding). Bucket boundaries are the EXACT
    type-1 percentiles of the token-length distribution
    (exact_percentiles — deterministic, unlike approx_percentile), so
    the assignment replays bit-for-bit in SQL. Output: (id, n_tokens,
    bucket) with bucket = #boundaries strictly below n_tokens.

    Scale shape: the boundary fit is the count-by-value percentile job
    (corpus collapses to |distinct lengths| counts); boundaries are a
    tiny collected artifact (same pattern as bm25's corpus stats / the
    trained LM); assignment itself is a ZERO-shuffle codegen
    projection — re-runnable on every new batch against frozen
    boundaries."""
    n = F.size(_words(text_col)).cast("long")
    base = docs.select(F.col(id_col), n.alias("n_tokens"))
    qs = sorted(
        (r.p, int(r.value))
        for r in exact_percentiles(base, "n_tokens", ps).collect()
    )
    bucket = None
    for _, q in qs:
        term = (F.col("n_tokens") > F.lit(q)).cast("int")
        bucket = term if bucket is None else bucket + term
    return base.select(id_col, "n_tokens", bucket.alias("bucket"))


def length_outliers(
    docs: DataFrame,
    group_col: str = "source",
    z: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-length z-score outlier gate, INTEGER-EXACT:
    (doc_id, group, n_tokens, z_score, is_outlier) — the "drop docs
    whose length is alien for their source" curation screen (truncated
    crawls, concatenation bugs, boilerplate walls).

    Why it can be value-hashed at any parallelism: the group moments
    are pure integer sums (n, s = sum x, ss = sum x^2, accumulated in
    decimal(38,0) — order-free, unlike a float variance whose partial-
    aggregation order shifts ulps), and the verdict never touches a
    float:   |x - mu| > z*sigma  <=>  (n*x - s)^2 > z^2 * (n*ss - s^2)
    — cross-multiplied through by n^2, every side an exact integer.
    The reported z_score is one double division/sqrt at the very end
    (IEEE sqrt is correctly rounded, so it is cross-engine stable);
    a constant group (den = 0) scores 0.0 and is never an outlier —
    the same algebra gives 0 > 0 automatically.

    Scale shape: one map-side-combined moments agg (output = |groups|
    rows), then a broadcast join stamps each row's verdict — the
    mixture_sample shape; the corpus is scanned once and never
    shuffled. decimal(38,0) bounds: fine through n ~ 1e12 rows/group
    at x ~ 1e5 tokens (n*ss ~ 1e34 < 1e38); beyond that, drop to
    per-group sharded moments first."""
    x = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = docs.select(
        F.col(id_col),
        F.col(group_col),
        x.alias("__x"),
    )
    xd = F.col("__x").cast("decimal(19,0)")
    mom = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("__s"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("__ss"),
    )
    j = base.join(F.broadcast(mom), group_col)
    nxs = (F.col("__n") * F.col("__x").cast("decimal(38,0)") - F.col("__s")).cast(
        "decimal(38,0)"
    )
    den = (F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")).cast(
        "decimal(38,0)"
    )
    z_col = F.when(
        den > 0,
        round6_col(nxs.cast("double") / F.sqrt(den.cast("double"))),
    ).otherwise(F.lit(0.0))
    return j.select(
        id_col,
        group_col,
        F.col("__x").alias("n_tokens"),
        z_col.alias("z_score"),
        (nxs * nxs > F.lit(z * z).cast("decimal(38,0)") * den).alias("is_outlier"),
    )
