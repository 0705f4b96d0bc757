"""BPE merge-table training — the tokenizer-training step itself.

Sennrich, Haddow & Birch ("Neural Machine Translation of Rare Words
with Subword Units", ACL 2016): byte-pair encoding learns a merge
table by repeatedly fusing the most frequent ADJACENT symbol pair.
The crucial scale property (their own algorithm, not an
approximation): after one corpus pass collapses the text to a
(word, frequency) table, every training iteration operates on that
VOCABULARY-sized table — the corpus is never touched again, so
training cost is independent of corpus size beyond the single word
count. That is exactly the vocab_topk exchange reused as a front end.

Semantics (all deterministic, DuckDB-replayable):
  * words split on single spaces (the corpus tokenization convention
    shared with vocab_topk); each word starts as its character
    sequence plus an explicit end-of-word symbol "</w>" (the standard
    Sennrich construction — merges can't leak across word boundaries
    and learned units know whether they end a word);
  * each iteration counts adjacent pairs weighted by word frequency
    (one vocab-sized map-side-combined exchange), picks the winner by
    (count DESC, left ASC, right ASC) — a total order, so ties are
    deterministic — and fuses its occurrences GREEDILY left-to-right
    ("aaaa" with winner (a,a) becomes "aa","aa", matching the
    reference implementation);
  * greedy overlap resolution is RELATIONAL: candidate positions form
    gaps-and-islands (consecutive-integer runs can only arise when
    left == right), and within each run the even offsets are kept —
    provably the left-to-right greedy set;
  * the per-iteration winner is ONE row collected to the driver (the
    kmeans stance: the model crosses, never the data), and the word
    table is lineage-truncated every round (components.py checkpoint
    stance) so Catalyst never re-analyzes a growing loop plan.

Output: the merge table (merge_rank, lhs, rhs, pair_count) —
model-sized, the artifact a tokenizer ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

BPE_EOW = "</w>"
BPE_MERGES = 8


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, freq, t): word frequencies + initial symbol arrays."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "w",
        "freq",
        F.expr(
            "concat(transform(sequence(1, length(w)),"
            f" i -> substring(w, i, 1)), array('{BPE_EOW}'))"
        ).alias("t"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt): adjacent-pair counts weighted by word freq."""
    pairs = state.select(
        "freq",
        F.explode(
            # guard: a fully-merged word can be ONE symbol, and Spark's
            # sequence(1, 0) DESCENDS instead of being empty
            F.expr(
                "CASE WHEN size(t) < 2 THEN"
                " cast(array() AS array<struct<lhs: string, rhs: string>>)"
                " ELSE transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS lhs,"
                " element_at(t, i + 1) AS rhs)) END"
            )
        ).alias("p"),
    ).select("freq", "p.lhs", "p.rhs")
    return pairs.groupBy("lhs", "rhs").agg(F.sum("freq").alias("cnt"))


def _merge_pair(state: DataFrame, a: str, b: str) -> DataFrame:
    """Fuse every greedy occurrence of the adjacent pair (a, b) in
    every word's symbol array. The winner rides a broadcast 1-row
    frame (no SQL-string injection of data values)."""
    spark = state.sparkSession
    win = F.broadcast(spark.createDataFrame([(a, b)], "ma string, mb string"))
    st = state.crossJoin(win)
    cand = st.select(
        "w",
        F.explode(
            F.expr(
                "CASE WHEN size(t) < 2 THEN cast(array() AS array<int>) ELSE"
                " filter(transform(sequence(1, size(t) - 1), i -> i),"
                " i -> element_at(t, i) = ma"
                " AND element_at(t, i + 1) = mb) END"
            )
        ).alias("i"),
    )
    wrun = Window.partitionBy("w").orderBy("i")
    grp = cand.withColumn("grp", F.col("i") - F.row_number().over(wrun))
    g0 = Window.partitionBy("w", "grp")
    kept = (
        grp.withColumn("g0", F.min("i").over(g0))
        .where((F.col("i") - F.col("g0")) % 2 == 0)
        .groupBy("w")
        .agg(F.sort_array(F.collect_list("i")).alias("k"))
    )
    return (
        st.join(kept, "w", "left")
        .select(
            "w",
            "freq",
            F.expr(
                "filter(transform(sequence(1, size(t)), j -> CASE"
                " WHEN k IS NOT NULL AND array_contains(k, j)"
                "   THEN concat(element_at(t, j), element_at(t, j + 1))"
                " WHEN k IS NOT NULL AND array_contains(k, j - 1)"
                "   THEN NULL"
                " ELSE element_at(t, j) END), x -> x IS NOT NULL)"
            ).alias("t"),
        )
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Learn the BPE merge table: (merge_rank, lhs, rhs, pair_count),
    rank 1 = first (most frequent) merge. Stops early if the corpus
    runs out of repeated pairs."""
    from cityfinder_spark.operators.components import _ckpt

    spark = docs.sparkSession
    state = _ckpt(_word_table(docs, text_col))
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        win = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not win or win[0]["cnt"] < 2:
            break
        a, b, cnt = win[0]["lhs"], win[0]["rhs"], int(win[0]["cnt"])
        merges.append((r, a, b, cnt))
        state = _ckpt(_merge_pair(state, a, b))
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a LEARNED merge table (the apply half
    of BPE): replay the merges in rank order over the DISTINCT-word
    table — segmentation is a pure function of the word, so the
    corpus-sized side pays one split + one word equi-join and the
    merge replay runs on vocabulary-sized state (same _merge_pair
    machinery as training, no winner computation). Output grain:
    (id, wpos, tpos, token) — word position in the doc (0-based,
    pre-filter indices) x token position within the word's
    segmentation; deterministic with NO window, so it value-hashes."""
    from cityfinder_spark.operators.components import _ckpt

    state = _ckpt(_word_table(docs, text_col).select("w", "t"))
    for a, b in merges:
        st = _merge_pair(state.withColumn("freq", F.lit(1)), a, b)
        state = _ckpt(st.select("w", "t"))
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("wpos", "w"),
    ).where(F.col("w") != "")
    return (
        words.join(state, "w")
        .select(
            id_col,
            "wpos",
            F.posexplode("t").alias("tpos", "token"),
        )
    )
