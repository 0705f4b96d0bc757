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
    shared with vocab_topk); under mode="char" each word starts as
    its character sequence plus an explicit end-of-word symbol
    "</w>" (the standard Sennrich construction — merges can't leak
    across word boundaries and learned units know whether they end a
    word); under mode="bytes" each word starts as its UTF-8 byte
    sequence with NO end-of-word marker (the GPT-2-style byte-level
    alphabet — every symbol is a fixed-width two-hex-digit string,
    so merged symbols concatenate unambiguously and the whole chain
    stays replayable as SQL over hex(encode(w)));
  * each iteration counts adjacent pairs weighted by word frequency,
    picks the winner by (count DESC, left ASC, right ASC) — a total
    order, so ties are deterministic — and fuses its occurrences
    GREEDILY left-to-right ("aaaa" with winner (a,a) becomes
    "aa","aa", matching the reference implementation);
  * training stops early when no pair repeats (count < 2).

Two execution strategies, identical outputs (parity pinned in
tests/test_bpe.py), routed by MERGE COUNT because that is the axis
that scales differently:

  * "relational" (the low-merge-count default): every iteration is
    one vocab-sized map-side-combined pair-count exchange; the winner
    is ONE row collected to the driver (the kmeans stance: the model
    crosses, never the data); greedy overlap resolution is
    gaps-and-islands (consecutive-integer candidate runs can only
    arise when left == right, and keeping the even offsets within a
    run is provably the left-to-right greedy set); the word table is
    lineage-truncated every round (components.py checkpoint stance).
    Cost: ~2 Spark jobs PER MERGE — corpus-size-independent but
    linear in n_merges, so it is the wrong shape for a realistic
    32k-merge vocabulary.
  * "driver" (the high-merge-count path): the SAME single corpus
    exchange collapses text to (word, freq); that state is
    vocab-sized — the inverse of the kmeans stance applies (it IS
    the model side), so above the merge-count threshold it MAY cross
    the driver, guarded by BPE_MAX_DRIVER_WORDS (a bounded
    limit-probe collect, never an unguarded full collect). Training
    then runs the classic incremental-pair-count algorithm with a
    lazy max-heap and a pair->words occurrence index: each merge
    touches only the words containing the winning pair, so 32k
    merges cost seconds of driver CPU instead of 32k Spark jobs.

bpe_segment (the APPLY half) mirrors the routing: the corpus-sized
side always pays exactly one split + one word equi-join; the merge
replay over the DISTINCT-word table runs either relationally (same
_merge_pair machinery, one job per merge) or — above the threshold —
as ONE broadcast-merge-table Arrow pass. The Arrow kernel is
DENSITY-ROUTED (_apply_merges_indexed): a symbol -> merge-ranks
inverted index plus a lazy min-heap visits only the ranks whose
symbols ever occur in the word — a win exactly when that seed mass
is well below the merge count R (sparse large alphabets: byte-level
text with punctuation/multi-byte characters); for dense
small-alphabet words, where every rank seeds anyway, the naive
two-set-lookups-per-rank loop is measurably faster and the router
picks it. Exact sequential-replay semantics are preserved on both
paths (ranks created "in the past" by later fuses never re-apply)
and parity is pytest-pinned.

Output: the merge table (merge_rank, lhs, rhs, pair_count) —
model-sized, the artifact a tokenizer ships.
"""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

BPE_EOW = "</w>"
BPE_MERGES = 8

# Strategy routing: at or below this merge count "auto" stays fully
# relational (one pair-count exchange per merge — the oracle-shaped
# path); above it the vocab-sized (word, freq) state crosses to the
# driver and the incremental heap trainer runs all merges in memory.
BPE_RELATIONAL_MAX_MERGES = 64

# Hard cap on vocabulary rows the driver path may collect (the
# PQ_MAX_DRIVER_QUERIES stance: the "model-sized state may cross the
# driver" contract is ENFORCED by a bounded limit-probe, not assumed).
# 2M distinct words x ~50 bytes is ~100 MB — driver-safe; above it
# the trainer falls back to the relational path, which is slower but
# never OOMs the driver.
BPE_MAX_DRIVER_WORDS = 2_000_000


def _syms_expr(mode: str) -> str:
    """SQL expression building a word's initial symbol array from
    column `w` — shared shape with the DuckDB oracle CTE."""
    if mode == "char":
        return (
            "concat(transform(sequence(1, length(w)),"
            f" i -> substring(w, i, 1)), array('{BPE_EOW}'))"
        )
    if mode == "bytes":
        # fixed-width two-hex-digit symbols: concatenation of merged
        # symbols is unambiguous, and hex(encode(..)) is uppercase in
        # both Spark and DuckDB, so the alphabet replays in SQL.
        return (
            "transform(sequence(1, octet_length(w)),"
            " i -> substring(hex(encode(w, 'UTF-8')), 2 * i - 1, 2))"
        )
    raise ValueError(f"unknown BPE mode {mode!r} (want 'char' or 'bytes')")


def _initial_syms_py(w: str, mode: str) -> list[str]:
    """Python twin of _syms_expr — MUST construct the identical
    symbol sequence (parity pinned in tests)."""
    if mode == "char":
        return list(w) + [BPE_EOW]
    hx = w.encode("utf-8").hex().upper()
    return [hx[i : i + 2] for i in range(0, len(hx), 2)]


def _word_table(docs: DataFrame, text_col: str, mode: str = "char") -> DataFrame:
    """(w, freq, t): word frequencies + initial symbol arrays."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select("w", "freq", F.expr(_syms_expr(mode)).alias("t"))


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


def _greedy_fuse(syms: list[str], a: str, b: str) -> tuple[list[str], bool]:
    """Left-to-right greedy fuse of (a, b) — the reference semantics
    shared by every path ("aaaa" + (a,a) -> "aa","aa")."""
    out: list[str] = []
    i, n, changed = 0, len(syms), False
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
            changed = True
        else:
            out.append(syms[i])
            i += 1
    return out, changed


def _train_driver(
    words: list[tuple[str, int]], n_merges: int, mode: str
) -> list[tuple[int, str, str, int]]:
    """Incremental-pair-count BPE on the driver: a lazy max-heap over
    pair counts plus a pair -> word-ids occurrence index, so each
    merge re-segments ONLY the words that contain the winning pair.
    Winner order (-cnt, lhs, rhs) on the heap is exactly the
    relational (count DESC, lhs ASC, rhs ASC) total order — Python
    compares strings by code point, which equals UTF-8 binary order,
    which is what Spark and DuckDB sort by, so tie-breaks agree
    across all three engines."""
    vocab: list[list] = []  # [syms, freq] per word id
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for w, f in words:
        syms = _initial_syms_py(w, mode)
        wid = len(vocab)
        vocab.append([syms, f])
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += f
            pair_words[p].add(wid)

    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = None
        while heap:
            negc, a, b = heap[0]
            cur = pair_counts.get((a, b), 0)
            if cur != -negc:  # stale lazy-heap entry
                heapq.heappop(heap)
                continue
            best = (a, b, cur)
            break
        if best is None or best[2] < 2:
            break
        a, b, cnt = best
        merges.append((r, a, b, cnt))
        for wid in sorted(pair_words.get((a, b), ())):
            syms, f = vocab[wid]
            out, changed = _greedy_fuse(syms, a, b)
            if not changed:
                continue
            old_pairs = Counter(zip(syms, syms[1:]))
            new_pairs = Counter(zip(out, out[1:]))
            vocab[wid][0] = out
            for p in old_pairs.keys() | new_pairs.keys():
                d = new_pairs.get(p, 0) - old_pairs.get(p, 0)
                if d:
                    pair_counts[p] += d * f
                    if pair_counts[p] <= 0:
                        pair_counts.pop(p, None)
                    else:
                        heapq.heappush(
                            heap, (-pair_counts[p], p[0], p[1])
                        )
                if p in new_pairs and p not in old_pairs:
                    pair_words[p].add(wid)
                elif p in old_pairs and p not in new_pairs:
                    pair_words[p].discard(wid)
        # greedy fuse removes every (a, b) adjacency from every word
        pair_words.pop((a, b), None)
        pair_counts.pop((a, b), None)
    return merges


def _resolve_bpe_strategy(n_merges: int, strategy: str, fast: str) -> str:
    if strategy not in ("auto", "relational", fast):
        raise ValueError(f"unknown BPE strategy {strategy!r}")
    if strategy != "auto":
        return strategy
    return "relational" if n_merges <= BPE_RELATIONAL_MAX_MERGES else fast


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    strategy: str = "auto",
    mode: str = "char",
) -> DataFrame:
    """Learn the BPE merge table: (merge_rank, lhs, rhs, pair_count),
    rank 1 = first (most frequent) merge. Stops early if the corpus
    runs out of repeated pairs. strategy: "relational" | "driver" |
    "auto" (auto routes by merge count, see module docstring); the
    driver path is count-guarded and falls back to relational when
    the vocabulary exceeds BPE_MAX_DRIVER_WORDS."""
    from cityfinder_spark.operators.components import _ckpt

    spark = docs.sparkSession
    resolved = _resolve_bpe_strategy(n_merges, strategy, "driver")
    schema = "merge_rank int, lhs string, rhs string, pair_count long"

    if resolved == "driver":
        rows = (
            _word_table(docs, text_col, mode)
            .select("w", "freq")
            .limit(BPE_MAX_DRIVER_WORDS + 1)
            .collect()
        )
        if len(rows) <= BPE_MAX_DRIVER_WORDS:
            merges = _train_driver(
                [(r["w"], int(r["freq"])) for r in rows], n_merges, mode
            )
            return spark.createDataFrame(merges, schema)
        # vocab too large for the driver: the relational path is
        # merge-count-linear but bounded-memory everywhere
        resolved = "relational"

    state = _ckpt(_word_table(docs, text_col, mode))
    merges = []
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
    return spark.createDataFrame(merges, schema)


def _apply_merges_py(
    syms: list[str], merges: list[tuple[str, str]]
) -> list[str]:
    """Sequential rank-order replay of the merge table over one
    word's symbols — identical semantics to chaining _merge_pair.
    The reference implementation (O(R) membership checks per word);
    the serving path uses _apply_merges_indexed, parity-pinned."""
    present = set(syms)
    for a, b in merges:
        if a not in present or b not in present:
            continue
        out, changed = _greedy_fuse(syms, a, b)
        if changed:
            syms = out
            present = set(syms)
    return syms


def _merge_rank_index(
    merges: list[tuple[str, str]]
) -> dict[str, list[int]]:
    """symbol -> ascending ranks (0-based) whose merge mentions it as
    lhs or rhs. Built once per executor from the broadcast table."""
    index: dict[str, list[int]] = {}
    for r, (a, b) in enumerate(merges):
        index.setdefault(a, []).append(r)
        if b != a:
            index.setdefault(b, []).append(r)
    return index


def _apply_merges_indexed(
    syms: list[str],
    merges: list[tuple[str, str]],
    index: dict[str, list[int]],
) -> list[str]:
    """Sequential replay visiting ONLY the ranks whose symbols ever
    occur in this word: candidate ranks come from the symbol->ranks
    inverted index through a lazy min-heap, so per-word cost is
    ~(word symbols + fuses) x index-list length instead of the full
    merge count R. Exactly equivalent to the naive rank loop
    (parity-pinned): a rank r can only apply if both its symbols are
    present when r is reached, and every such symbol is either
    initial (all its ranks seeded) or created by a fuse at q < r
    (which seeds its ranks > q, including r); ranks seeded for
    symbols created at q' > r are correctly excluded — r is in the
    past by then, as in the naive loop.

    DENSITY ROUTER (measured, r5): the heap only wins when the seed
    mass (sum of the word's symbols' index lists) is well below R —
    with a small alphabet (26 letters char-mode) every rank seeds
    anyway and the heap's log factor LOSES to the naive loop's two
    set lookups per rank (225s vs 173s on the 4000-merge bench). So
    words whose seed mass reaches R/2 take the naive loop; sparse
    words (large alphabets, byte-level corpora with punctuation/
    multi-byte text) take the heap. Pure function of (word, table) —
    deterministic either way."""
    import heapq
    from bisect import bisect_right

    seed_mass = 0
    distinct = set(syms)
    for s in distinct:
        seed_mass += len(index.get(s, ()))
    if seed_mass * 2 >= len(merges):
        return _apply_merges_py(syms, merges)

    heap: list[int] = []
    for s in distinct:
        heap.extend(index.get(s, ()))
    heapq.heapify(heap)
    present = set(syms)
    last = -1
    while heap:
        r = heapq.heappop(heap)
        if r == last:  # duplicate seeds (lhs + rhs both present)
            continue
        last = r
        a, b = merges[r]
        if a not in present or b not in present:
            continue
        out, changed = _greedy_fuse(syms, a, b)
        if not changed:
            continue
        syms = out
        present = set(syms)
        ns = a + b
        ranks = index.get(ns, ())
        for q in ranks[bisect_right(ranks, r) :]:
            heapq.heappush(heap, q)
    return syms


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "auto",
    mode: str = "char",
) -> DataFrame:
    """Tokenize the corpus with a LEARNED merge table (the apply half
    of BPE): segmentation is a pure function of the word, so the
    corpus-sized side pays one split + one word equi-join and the
    merge replay runs on vocabulary-sized state. strategy:
    "relational" replays each merge as one _merge_pair job (the
    oracle shape); "broadcast" ships the model-sized merge table to
    every executor and replays ALL merges per distinct word in one
    Arrow pass (the 32k-merge shape); "auto" routes by merge count.
    Output grain: (id, wpos, tpos, token) — word position in the doc
    (0-based, pre-filter indices) x token position within the word's
    segmentation; deterministic with NO window, so it value-hashes."""
    from cityfinder_spark.operators.components import _ckpt

    spark = docs.sparkSession
    resolved = _resolve_bpe_strategy(len(merges), strategy, "broadcast")
    state = _word_table(docs, text_col, mode).select("w", "t")

    if resolved == "broadcast":
        bmerges = spark.sparkContext.broadcast([(a, b) for a, b in merges])

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _seg(t: pd.Series) -> pd.Series:
            mg = bmerges.value
            idx = _merge_rank_index(mg)
            return t.apply(
                lambda syms: _apply_merges_indexed(list(syms), mg, idx)
            )

        state = state.withColumn("t", _seg("t"))
    else:
        state = _ckpt(state)
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
