"""Deduplication suite for the training-data pipeline (driver mandate):
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

Design notes (100 TB scale):
  * shingling / hashing / signatures are pure Column expressions
    (md5 -> int48, JVM codegen; no Python in the hot path);
  * candidate generation is equi-join on shingle / band signature —
    the only shuffles; hot (high-document-frequency) shingles can be
    dropped via max_df to bound quadratic blowup;
  * exact Jaccard verification runs only on candidate pairs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from cityfinder_spark.colutils import round6_col

MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_M = 16
BAND_SIZE = 4
# (k, a, b): h_k(x) = (a*x + b) % p ; a < 2^15 keeps a*x inside int64.
# The multipliers must be LARGE (near 2^15), not small odd numbers:
# with a tiny a, a shingle whose residue v is small maps to a*v + b
# with NO mod-P wrap for every k, so the same shingle wins the min
# under the whole family and the signature components are totally
# correlated (observed: J=0.02 pairs agreeing on 14/16 components).
# Large distinct multipliers wrap ~a times across [0, P), decorrelating
# the functions; the estimator test in tests/test_dedup_text.py pins it.
MINHASH_FUNCS: list[tuple[int, int, int]] = [
    (k, 32749 - 977 * k, (104729 * (k + 1)) % MINHASH_P) for k in range(MINHASH_M)
]

SIMHASH_BITS = 16

MD5_INT_SPARK = "cast(conv(substr(md5({x}), 1, 12), 16, 10) as bigint)"


def _md5_int(s: str) -> int:
    """int48 of md5 — the Python twin of MD5_INT_SPARK / the DuckDB
    oracle's substr(md5(x),1,12). Spark's md5() hashes the UTF-8 bytes
    of the string, which is exactly str.encode()."""
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _md5_int_np(tokens: list[str]) -> np.ndarray:
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(t.encode()).hexdigest()[:12], 16) for t in tokens),
        dtype=np.int64,
        count=len(tokens),
    )


def dedup_exact(
    docs: DataFrame,
    key_expr: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact (hash-groupBy) dedup on a normalization key: every row
    gets the group's canonical (minimum) id + dup flag."""
    w = Window.partitionBy("__key")
    return (
        docs.withColumn("__key", F.expr(key_expr))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "canonical_id", "is_dup")
    )


def word_shingles(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    strategy: str = "arrow",
) -> DataFrame:
    """Distinct n-word shingles per document: (doc_id, shingle).
    max_df drops shingles appearing in more than max_df docs (bounds
    the quadratic candidate join; None = exact semantics).

    strategy="arrow" (default): per-doc shingle SETS built in one
    mapInPandas pass — global distinct on (doc_id, shingle) equals the
    per-doc set because ids are unique, so the explode + distinct
    SHUFFLE of the jvm path disappears entirely. strategy="jvm": the
    relational explode of an interpreted transform() lambda + distinct
    (plan-shape reference; exactly equal output, parity-tested)."""
    if strategy == "jvm":
        parts = ", ".join(f"element_at(__w, i + {j})" for j in range(n))
        sh = (
            docs.withColumn("__w", F.split(F.col(text_col), " "))
            .where(F.size("__w") >= n)
            .select(
                F.col(id_col),
                F.explode(
                    F.expr(f"transform(sequence(1, size(__w) - {n - 1}), i -> concat_ws(' ', {parts}))")
                ).alias("shingle"),
            )
            .distinct()
        )
    else:
        schema = T.StructType(
            [
                T.StructField(id_col, docs.schema[id_col].dataType, True),
                T.StructField("shingle", T.StringType(), True),
            ]
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids_out, sh_out = [], []
                for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                    toks = (text or "").split(" ")
                    if len(toks) < n:
                        continue
                    uniq = set(
                        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    )
                    ids_out.extend([doc_id] * len(uniq))
                    sh_out.extend(uniq)
                if ids_out:
                    yield pd.DataFrame({id_col: ids_out, "shingle": sh_out})

        sh = docs.select(id_col, text_col).mapInPandas(gen, schema)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle").count().where(F.col("count") > max_df).select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def _pair_jaccard(sh: DataFrame, id_col: str) -> DataFrame:
    """All candidate pairs sharing >=1 shingle, with exact Jaccard."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            round6_col(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard >= threshold."""
    sh = word_shingles(docs, n, id_col, text_col, max_df)
    return (
        _pair_jaccard(sh, id_col)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.35,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Partial-duplication pairs by exact n-gram CONTAINMENT:
    inter / min(|A|, |B|) — the asymmetric overlap that catches a
    short document quoted inside a long one, which Jaccard dilutes
    below any usable threshold (inter / union shrinks as the big doc
    grows; containment stays 1.0). Same candidate machinery and scale
    shape as the Jaccard path: only (doc_id, shingle) rows shuffle,
    pair work is O(shared-shingle collisions). Output:
    (doc_a, doc_b, containment, jaccard) for containment >= threshold.
    """
    sh = word_shingles(docs, n, id_col, text_col, max_df)
    pairs = _pair_jaccard(sh, id_col).withColumn(
        "containment",
        round6_col(F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b"))),
    )
    return pairs.where(F.col("containment") >= threshold).select(
        "doc_a", "doc_b", "containment", "jaccard"
    )


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "arrow",
) -> DataFrame:
    """(doc_id, k, minhash) MinHash sketch over n-word shingles with
    the fixed affine hash family MINHASH_FUNCS. Docs with < n words
    emit no rows. All arithmetic is integer, so the two strategies are
    exactly equal (parity-tested):

      * "jvm": explode shingles -> md5 Column expr -> crossJoin the
        hash family -> groupBy min. Two shuffles, |shingles| x M rows
        through the aggregate.
      * "arrow" (default): ONE mapInPandas pass — per doc, shingle
        windows + md5 in Python, then a (shingles x M) affine-hash
        matrix min-reduced in NumPy. Zero shuffles; duplicates need no
        distinct pass because min() is idempotent under multiplicity.
    """
    if strategy == "jvm":
        sh = word_shingles(docs, n, id_col, text_col).withColumn(
            "x", F.expr(MD5_INT_SPARK.format(x="shingle"))
        )
        funcs = docs.sparkSession.createDataFrame(
            MINHASH_FUNCS, "k int, a long, b long"
        )
        return (
            sh.crossJoin(F.broadcast(funcs))
            .groupBy(id_col, "k")
            .agg(F.min((F.col("a") * F.col("x") + F.col("b")) % MINHASH_P).alias("minhash"))
        )

    A = np.array([a for _, a, _ in MINHASH_FUNCS], dtype=np.int64)
    B = np.array([b for _, _, b in MINHASH_FUNCS], dtype=np.int64)
    schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType, True),
            T.StructField("k", T.IntegerType(), True),
            T.StructField("minhash", T.LongType(), True),
        ]
    )
    ks = np.arange(MINHASH_M, dtype=np.int32)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, sigs_out = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split(" ")
                if len(toks) < n:
                    continue
                shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                x = _md5_int_np(shingles)
                # (shingles x M) affine hashes; a < 2^15 keeps a*x in int64
                h = (x[:, None] * A[None, :] + B[None, :]) % MINHASH_P
                ids_out.append(doc_id)
                sigs_out.append(h.min(axis=0))
            if not ids_out:
                continue
            m = len(ids_out)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(np.asarray(ids_out), MINHASH_M),
                    "k": np.tile(ks, m),
                    "minhash": np.concatenate(sigs_out),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    band_size: int = BAND_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: tuple | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band signatures bucket candidates
    (shingle->minhash->band->bucket-join), exact Jaccard verifies.
    Output is a SUBSET of ngram_jaccard_pairs (LSH recall < 1); the
    banding makes BOTH the candidate join AND the verification
    O(collisions), not O(n^2): verification joins per-doc shingle
    SETS to the candidate pairs (array_intersect in codegen) instead
    of re-running the all-pairs shingle self-join — that self-join
    costs the same as the exact ngram path and would defeat the
    banding at scale. With AQE the tiny candidate side broadcasts at
    runtime, so the set rows never shuffle."""
    from cityfinder_spark.bcast import memo_table

    spark = docs.sparkSession
    # the band-signature and shingle-set tables are deterministic
    # derivations of the documents table — with a cache_key naming the
    # table's identity they persist once per session (same build-once
    # stance as the cities index / media tables), so every dedup query
    # after the first pays only the candidate join + verification
    bkey = (
        None
        if cache_key is None
        else ("mh-bands", *cache_key, n, band_size, id_col, text_col)
    )
    bands = memo_table(
        spark, bkey, lambda: minhash_band_sigs(docs, n, band_size, id_col, text_col)
    )
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    skey = None if cache_key is None else ("mh-sets", *cache_key, n, id_col, text_col)
    sets = memo_table(spark, skey, lambda: _shingle_sets(docs, n, id_col, text_col))
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("__shingles").alias("__sa"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("__shingles").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("__inter", inter)
        .withColumn(
            "jaccard",
            round6_col(
                F.col("__inter")
                / (F.size("__sa") + F.size("__sb") - F.col("__inter"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _shingle_sets(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, __shingles: array<string>) — each doc's DISTINCT
    n-word shingle set as one array row (the un-exploded form of
    word_shingles; |array| equals word_shingles' per-doc row count,
    so Jaccard from these sets is exactly _pair_jaccard's)."""
    parts = ", ".join(f"element_at(__w, i + {j})" for j in range(n))
    return (
        docs.withColumn("__w", F.split(F.col(text_col), " "))
        .where(F.size("__w") >= n)
        .select(
            F.col(id_col),
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(__w) - {n - 1}),"
                    f" i -> concat_ws(' ', {parts}))"
                )
            ).alias("__shingles"),
        )
    )


def minhash_band_sigs(
    docs: DataFrame,
    n: int = 3,
    band_size: int = BAND_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, band, sig) LSH band signatures straight from the
    Arrow minhash kernel — sig is the comma-joined minhashes of the
    band in k order, identical to grouping minhash_signatures by
    floor(k/band_size) and concat_ws over array_sort(struct(k, mh))
    (array_sort on structs orders by the first field, k). Emitting
    bands in the same pass removes that groupBy's shuffle and its
    interpreted transform() lambda."""
    n_bands = MINHASH_M // band_size
    A = np.array([a for _, a, _ in MINHASH_FUNCS], dtype=np.int64)
    B = np.array([b for _, _, b in MINHASH_FUNCS], dtype=np.int64)
    schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType, True),
            T.StructField("band", T.IntegerType(), True),
            T.StructField("sig", T.StringType(), True),
        ]
    )
    bands_idx = np.arange(n_bands, dtype=np.int32)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, sig_out = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split(" ")
                if len(toks) < n:
                    continue
                shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                x = _md5_int_np(shingles)
                mh = ((x[:, None] * A[None, :] + B[None, :]) % MINHASH_P).min(axis=0)
                ids_out.append(doc_id)
                sig_out.append(
                    [
                        ",".join(str(v) for v in mh[c * band_size : (c + 1) * band_size])
                        for c in range(n_bands)
                    ]
                )
            if not ids_out:
                continue
            m = len(ids_out)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(np.asarray(ids_out), n_bands),
                    "band": np.tile(bands_idx, m),
                    "sig": [s for row in sig_out for s in row],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def simhash(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "arrow",
) -> DataFrame:
    """SimHash signature over word token hashes (with multiplicity):
    bit b of the signature = sign of sum over tokens of ±1 on bit b.
    Integer arithmetic throughout -> the strategies are exactly equal
    (parity-tested). Assumes unique doc ids (one output row per doc).

      * "jvm": explode tokens x bit table, two groupBy shuffles —
        |tokens| x bits rows through the first aggregate.
      * "arrow" (default): ONE mapInPandas pass — md5 the batch's
        token stream once, per-doc bit balances via segmented
        reduction. Zero shuffles. (x % 2^(b+1)) >= 2^b is just
        "bit b of x is set", so the balance is a popcount diff."""
    if strategy == "jvm":
        toks = docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
        ).withColumn("x", F.expr(MD5_INT_SPARK.format(x="tok")))
        bit_rows = [(b, 1 << b, 1 << (b + 1)) for b in range(bits)]
        bdf = docs.sparkSession.createDataFrame(bit_rows, "b int, lo long, hi long")
        signed = toks.crossJoin(F.broadcast(bdf)).withColumn(
            "s", F.when((F.col("x") % F.col("hi")) >= F.col("lo"), 1).otherwise(-1)
        )
        return (
            signed.groupBy(id_col, "b", "lo")
            .agg(F.sum("s").alias("bal"))
            .withColumn("bitval", F.when(F.col("bal") > 0, F.col("lo")).otherwise(F.lit(0)))
            .groupBy(id_col)
            .agg(F.sum("bitval").alias("simhash"))
        )

    schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType, True),
            T.StructField("simhash", T.LongType(), True),
        ]
    )
    weights = (1 << np.arange(bits)).astype(np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            tok_lists = [(t or "").split(" ") for t in pdf[text_col]]
            counts = np.array([len(l) for l in tok_lists], dtype=np.int64)
            x = _md5_int_np([tok for l in tok_lists for tok in l])
            bit_m = ((x[:, None] >> np.arange(bits)) & 1).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            # split(" ") of any string yields >= 1 token, so every
            # segment is non-empty and reduceat is well-defined
            set_counts = np.add.reduceat(bit_m, starts, axis=0)
            bal = 2 * set_counts - counts[:, None]
            sig = ((bal > 0) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "simhash": sig})

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def hamming_pairs(
    sig: DataFrame,
    max_dist: int = 3,
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    out_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Pairs of rows whose `sig_col` differs in <= max_dist bits.
    Candidate prune: split the signature into max_dist+1 chunks —
    any pair within max_dist agrees exactly on >= 1 chunk (pigeonhole),
    so the join is equi on (chunk_idx, chunk_value), never O(n^2).
    The guarantee is EXACT (all qualifying pairs are found), not
    probabilistic. Works for any signature width up to 64 bits
    (chunk extraction uses unsigned shifts, so sign-bit-set 64-bit
    hashes — e.g. image phash — are handled)."""
    nchunks = max_dist + 1
    chunk_bits = max(1, bits // nchunks)
    col_a, col_b = out_cols

    def chunk_val(c: int):
        lo = c * chunk_bits
        # last chunk absorbs the remainder so the chunks PARTITION
        # all `bits` bits (required for the pigeonhole guarantee)
        width = bits - lo if c == nchunks - 1 else chunk_bits
        shifted = F.shiftrightunsigned(F.col(sig_col), lo)
        if lo + width >= 64:
            return shifted  # top chunk: shift already dropped the rest
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    chunks = sig.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        chunk_val(c).cast("long").alias("v"),
                    )
                    for c in range(nchunks)
                ]
            )
        ).alias("ch"),
    ).select(id_col, sig_col, F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    a = chunks.select(F.col(id_col).alias(col_a), F.col(sig_col).alias("sig_a"), "c", "v")
    b = chunks.select(F.col(id_col).alias(col_b), F.col(sig_col).alias("sig_b"), "c", "v")
    cand = (
        a.join(b, ["c", "v"]).where(F.col(col_a) < F.col(col_b))
        .select(col_a, col_b, "sig_a", "sig_b").distinct()
    )
    hd = F.bit_count(F.expr("sig_a ^ sig_b"))
    return cand.withColumn("hamming", hd).where(F.col("hamming") <= max_dist).select(
        col_a, col_b, "hamming"
    )


def decontaminate(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection for the training split: one
    row per TRAIN document — (doc_id, n_shared, contaminated), where
    n_shared counts the doc's distinct n-word shingles that also occur
    anywhere in the held-out (val/test) splits and contaminated is
    n_shared > 0. The standard pre-training decontamination gate:
    n-gram overlap with the eval set disqualifies a training document.

    Scale shape: the split is a pure function of the id (sampling.
    split_hash), so it is stamped DIRECTLY onto the shingle stream as a
    codegen'd projection — no (doc_id, shingle)-vs-doc-split join, which
    at fact scale would shuffle the entire shingle stream on doc_id
    before the real work starts. Only (doc_id, shingle) rows enter the
    one exchange on the shingle key (the same candidate-join shape as
    the n-gram Jaccard path — text never shuffles), and the held-out
    shingle set is DISTINCT'd before the join so hot shingles count
    once. With a genuinely small benchmark set AQE broadcasts it at
    runtime."""
    from cityfinder_spark.operators.sampling import corpus_split

    with_split = corpus_split(
        word_shingles(docs, n, id_col, text_col), id_col=id_col
    )
    ev = (
        with_split.where(F.col("split") != "train")
        .select("shingle")
        .distinct()
    )
    hits = (
        with_split.where(F.col("split") == "train")
        .join(ev, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    train = (
        corpus_split(docs.select(id_col), id_col=id_col)
        .where(F.col("split") == "train")
        .select(id_col)
    )
    return (
        train.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


BLOOM_M = 1 << 20  # filter bits; ~eval-shingle count * 10 for low FP at gate scale
BLOOM_K = 4        # probes per key; positions via double hashing h1 + j*h2


def bloom_decontaminate(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    cache_key: tuple | None = None,
) -> DataFrame:
    """`decontaminate` with the held-out side compressed to a BLOOM
    FILTER: one row per TRAIN document — (doc_id, n_flagged,
    contaminated), where n_flagged counts the doc's distinct n-gram
    shingles whose k filter bits are ALL set. A superset gate:
    n_flagged >= the exact n_shared row-wise (no false negatives —
    a contaminated doc can never slip through), false positives
    bounded by the classic (1 - e^{-kN/m})^k.

    Why it exists at 100 TB: exact `decontaminate` pays one exchange
    of the FULL train shingle stream on the shingle key (the semi-join
    must co-locate train and eval shingles). Here the eval side
    collapses to an m-BIT ARTIFACT (2^20 bits = 128 KB packed —
    eval-set-size-independent) built from a tiny eval-only aggregation,
    broadcast once; the train side then probes it INSIDE the same
    Arrow pass that builds the shingle sets — the fact table is
    scanned once and NOTHING fact-sized enters any exchange. This is
    the membership-gate shape for any small-set-vs-corpus screen
    (eval decontamination, blocklists, seen-URL filters).

    Determinism: bit positions are (h1 + j*h2) % m with h1/h2 the
    md5-int48 of the shingle and '#'+shingle — exactly replayable in
    SQL, so the DuckDB oracle rebuilds the filter and every probe
    bit-for-bit (h1 + j*h2 <= 2^50: no overflow ambiguity anywhere)."""
    from cityfinder_spark.bcast import memo_broadcast
    from cityfinder_spark.operators.sampling import corpus_split

    spark = docs.sparkSession
    h1c = F.expr(MD5_INT_SPARK.format(x="shingle"))
    h2c = F.expr(MD5_INT_SPARK.format(x="concat('#', shingle)"))
    ev_pos = (
        corpus_split(word_shingles(docs, n, id_col, text_col), id_col=id_col)
        .where(F.col("split") != "train")
        .select("shingle")
        .distinct()
        .select(
            F.explode(
                F.array(*[(h1c + F.lit(j) * h2c) % F.lit(m) for j in range(k)])
            ).alias("pos")
        )
        .distinct()
    )

    def build() -> np.ndarray:
        pos = np.array([r["pos"] for r in ev_pos.collect()], dtype=np.int64)
        bits = np.zeros(m, dtype=np.bool_)
        if pos.size:
            bits[pos] = True
        return np.packbits(bits)

    _, bc = memo_broadcast(spark, cache_key, build)
    train = (
        corpus_split(docs.select(id_col, text_col), id_col=id_col)
        .where(F.col("split") == "train")
        .drop("split")
    )
    schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType, True),
            T.StructField("n_flagged", T.LongType(), True),
        ]
    )
    offs = np.arange(k, dtype=np.int64)[None, :]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.unpackbits(bc.value).view(np.bool_)
        for pdf in batches:
            ids, flags = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split(" ")
                uniq = (
                    list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
                    if len(toks) >= n
                    else []
                )
                if not uniq:
                    ids.append(doc_id)
                    flags.append(0)
                    continue
                h1 = _md5_int_np(uniq)
                h2 = _md5_int_np(["#" + s for s in uniq])
                pos = (h1[:, None] + offs * h2[:, None]) % m
                ids.append(doc_id)
                flags.append(int(bits[pos].all(axis=1).sum()))
            yield pd.DataFrame({id_col: ids, "n_flagged": flags})

    return train.mapInPandas(probe, schema).select(
        id_col,
        "n_flagged",
        (F.col("n_flagged") > 0).alias("contaminated"),
    )


def minhash_estimate_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    band_size: int = BAND_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Signature-only MinHash near-dup pairs: same LSH band
    candidates as minhash_lsh_pairs, but Jaccard is ESTIMATED as the
    agreeing fraction of the M minhash components —
    (doc_a, doc_b, est_jaccard), est >= threshold.

    This is the production verify mode when the shingle sets are too
    wide to carry to the candidate join (a long web doc has thousands
    of shingles; its signature is M=16 longs): per-pair verify cost is
    O(M) REGARDLESS of document length, and nothing doc-length-sized
    ever shuffles. The estimator is the classic unbiased one
    (P[minhash agrees] = J), granularity 1/M — callers needing exact J
    on the survivors chain minhash_lsh_pairs on this output.

    Determinism: signatures are exact integer minima of the fixed
    affine family; agreement counting is integer; the only float is
    the final agree/M division — DuckDB replays everything."""
    from cityfinder_spark.bcast import memo_table

    spark = docs.sparkSession
    bkey = (
        None
        if cache_key is None
        else ("mh-bands", *cache_key, n, band_size, id_col, text_col)
    )
    bands = memo_table(
        spark, bkey, lambda: minhash_band_sigs(docs, n, band_size, id_col, text_col)
    )
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    gkey = None if cache_key is None else ("mh-sigarr", *cache_key, n, id_col, text_col)
    sig_arr = memo_table(
        spark,
        gkey,
        lambda: (
            minhash_signatures(docs, n, id_col, text_col)
            .groupBy(id_col)
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("k", "minhash"))),
                    lambda s: s["minhash"],
                ).alias("__sig")
            )
        ),
    )
    sa = sig_arr.select(F.col(id_col).alias("doc_a"), F.col("__sig").alias("__ga"))
    sb = sig_arr.select(F.col(id_col).alias("doc_b"), F.col("__sig").alias("__gb"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("__ga"), F.col("__gb"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard", round6_col(agree / F.lit(float(MINHASH_M)))
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def duplicated_spans(
    docs: DataFrame,
    gram_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-span dedup, span detection (the "Deduplicating
    Training Data Makes Language Models Better" ExactSubstr shape,
    re-expressed relationally at token grain): every length-`gram_len`
    token window that occurs >= 2 times ANYWHERE in the corpus
    (across documents or repeated within one) flags its token span
    [start, start+gram_len); overlapping/adjacent flagged spans are
    merged into maximal per-document intervals.

    Output: one row per merged interval —
        (id_col, span_start, span_end, span_tokens)
    with span_end exclusive and span_tokens = span_end - span_start.

    100 TB plan (vs the paper's monolithic suffix array, which cannot
    shard): gram construction is a zero-shuffle codegen projection
    (split -> transform/slice/array_join -> posexplode); duplicate
    detection is ONE exchange of the (id, start, gram_hash) occurrence
    stream — a count window partitioned by the hash, so there is no
    second counts-table join and nothing document-sized shuffles (the
    48-bit md5 hash crosses the wire, never the gram text); interval
    merging is a second, doc-keyed exchange over only the FLAGGED
    occurrences (gaps-and-islands: running max-end window + island
    sum), bounded by the duplicate mass, not the corpus.
    """
    occ = _gram_occurrences(docs, gram_len, id_col, text_col)
    flagged = (
        occ.withColumn("__cnt", F.count("*").over(Window.partitionBy("__h")))
        .where(F.col("__cnt") >= 2)
        .select(id_col, "start", (F.col("start") + gram_len).alias("end"))
    )
    return _merge_spans(flagged, id_col)


def _gram_occurrences(
    docs: DataFrame, gram_len: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, start, __h) for every length-`gram_len` token window —
    a zero-shuffle codegen projection + posexplode; only the 48-bit
    md5 of the gram (never its text) survives into downstream plans."""
    toks = F.split(F.col(text_col), " ")
    return (
        docs.withColumn("__toks", toks)
        .where(F.size("__toks") >= gram_len)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(__toks) - {gram_len}),"
                    f" s -> array_join(slice(__toks, s + 1, {gram_len}), ' '))"
                )
            ).alias("start", "__gram"),
        )
        .withColumn("__h", F.expr(MD5_INT_SPARK.format(x="__gram")))
        .drop("__gram")
    )


def _merge_spans(flagged: DataFrame, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of (id, start, end) half-open token
    spans into maximal per-doc intervals: running max-end window +
    island sum, one doc-keyed exchange over only the flagged rows."""
    w_doc = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max("end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = flagged.withColumn(
        "__brk",
        F.when(prev_end.isNull() | (F.col("start") > prev_end), 1).otherwise(0),
    ).withColumn(
        "__isl",
        F.sum("__brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "__isl")
        .agg(F.min("start").alias("span_start"), F.max("end").alias("span_end"))
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def substring_dedup(
    docs: DataFrame,
    gram_len: int = 6,
    max_dup_num: int = 1,
    max_dup_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document verdict over `duplicated_spans`: a document is
    kept while its duplicated-token mass stays strictly under
    max_dup_num/max_dup_den of its token count (default < 1/5). The
    verdict is the integer cross-multiplication
        dup_tokens * max_dup_den < total_tokens * max_dup_num
    so it is exact at any parallelism. Documents with no flagged span
    (including those shorter than gram_len) appear with zeros.

    Output: (id_col, total_tokens, dup_spans, dup_tokens, keep).
    The doc-summary aggregation and the left join back to the corpus
    are both id-keyed (AQE broadcasts the span summary when small)."""
    spans = duplicated_spans(docs, gram_len, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("dup_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    base = docs.select(
        id_col, F.size(F.split(F.col(text_col), " ")).cast("long").alias("total_tokens")
    )
    j = base.join(per_doc, id_col, "left").fillna(
        {"dup_spans": 0, "dup_tokens": 0}
    )
    return j.select(
        id_col,
        "total_tokens",
        F.col("dup_spans").cast("long").alias("dup_spans"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        (
            F.col("dup_tokens") * max_dup_den
            < F.col("total_tokens") * max_dup_num
        ).alias("keep"),
    )


def substring_scrub(
    docs: DataFrame,
    gram_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-span dedup, REMOVAL step (the other half of
    ExactSubstr): for every corpus-duplicated `gram_len`-token window,
    the globally-canonical occurrence — minimum (id, start) across the
    whole corpus — is KEPT; every other occurrence flags its span, and
    the flagged spans (merged per doc) are scrubbed from the text.
    One copy of any duplicated run therefore survives somewhere.

    Output: (id_col, total_tokens, removed_tokens, clean_text).
    clean_text is rebuilt from the token array (single-space joined)
    for EVERY row — scrubbed or not — so whitespace is normalized
    identically on both code paths (and in the DuckDB oracle).

    Edge semantics (deterministic, documented): when a non-canonical
    span overlaps a canonical one inside a doc, the merged island may
    scrub tokens of the kept copy too — same grain as the paper's
    byte-range removal, which also clips at duplicate-range bounds.

    Scale plan: the canonical pick rides the SAME single exchange as
    duplicate detection (count + min-struct over one hash-partitioned
    window); islands merge doc-keyed over the flagged mass only; the
    scrub itself is a codegen projection — the span list (tiny) is
    collected per doc and applied with transform/filter INSIDE the
    row, so tokens are never exploded a second time and the corpus is
    scanned exactly twice (gram pass + rebuild pass)."""
    occ = _gram_occurrences(docs, gram_len, id_col, text_col)
    w_h = Window.partitionBy("__h")
    both = F.struct(F.col(id_col), F.col("start"))
    flagged = (
        occ.withColumn("__cnt", F.count("*").over(w_h))
        .withColumn("__min", F.min(both).over(w_h))
        .where(
            (F.col("__cnt") >= 2)
            & ~(
                (F.col(id_col) == F.col("__min").getField(id_col))
                & (F.col("start") == F.col("__min").getField("start"))
            )
        )
        .select(id_col, "start", (F.col("start") + gram_len).alias("end"))
    )
    per_doc = _merge_spans(flagged, id_col).groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans"),
        F.sum("span_tokens").alias("removed_tokens"),
    )
    scrubbed = F.expr(
        "array_join(filter(transform(__ws, (t, i) ->"
        " IF(exists(__sp, s -> i >= s.span_start AND i < s.span_end),"
        " NULL, t)), x -> x IS NOT NULL), ' ')"
    )
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn("__ws", F.split(F.col(text_col), " "))
        .withColumn(
            "__sp",
            F.coalesce(
                F.col("__spans"),
                F.expr(
                    "cast(array() as array<struct<span_start:int,span_end:int>>)"
                ),
            ),
        )
        .select(
            id_col,
            F.size("__ws").cast("long").alias("total_tokens"),
            F.coalesce(F.col("removed_tokens"), F.lit(0))
            .cast("long")
            .alias("removed_tokens"),
            scrubbed.alias("clean_text"),
        )
    )


def split_minhash_overlap(
    docs: DataFrame,
    *,
    k: int = 256,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CORPUS-level overlap estimation between the train/val/test
    splits — the sketch-scale complement to the exact `decontaminate`
    gate: instead of a shingle-key semi-join, each split is compressed
    to a k-mins MinHash sketch (Broder's original scheme: hash space
    partitioned into k buckets by h % k, min hash per bucket) and the
    Jaccard overlap between two splits is estimated by the fraction of
    buckets whose minima AGREE. Use it to watch contamination drift
    between crawl snapshots before paying for the exact gate.

    Scale shape: the ONLY corpus-sized operation is the map-side-
    combined groupBy((split, bucket)) MIN — output is <= |splits| * k
    slim rows regardless of corpus size, and sketches merge with MIN,
    so per-snapshot sketches union incrementally. The split label is
    stamped onto the shingle stream as a projection (split is a pure
    function of the id — the decontaminate stance), so no join touches
    the corpus. md5-int48 hashing keeps the DuckDB oracle bit-exact.

    Output: (split_a, split_b, k_used, n_agree, jaccard_est).
    """
    from cityfinder_spark.colutils import round6_col
    from cityfinder_spark.operators.sampling import corpus_split

    sh = word_shingles(docs.select(id_col, text_col), n, id_col=id_col)
    sh = corpus_split(sh, id_col=id_col)
    h = F.expr(MD5_INT_SPARK.format(x="shingle"))
    sk = (
        sh.select("split", h.alias("h"))
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(k)))
        .groupBy("split", "bucket")
        .agg(F.min("h").alias("mn"))
    )
    a = sk.select(
        F.col("split").alias("split_a"), "bucket", F.col("mn").alias("mn_a")
    )
    b = sk.select(
        F.col("split").alias("split_b"), "bucket", F.col("mn").alias("mn_b")
    )
    pairs = a.join(b, "bucket").where(F.col("split_a") < F.col("split_b"))
    return (
        pairs.groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.sum((F.col("mn_a") == F.col("mn_b")).cast("int")).alias("n_agree"),
        )
        .select(
            "split_a",
            "split_b",
            "k_used",
            "n_agree",
            round6_col(F.col("n_agree") / F.col("k_used")).alias("jaccard_est"),
        )
    )
