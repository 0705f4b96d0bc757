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

from pyspark.sql import DataFrame, Window, functions as F

from cityfinder_spark.colutils import round6_col

MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_M = 16
BAND_SIZE = 4
# (k, a, b): h_k(x) = (a*x + b) % p ; a < 2^15 keeps a*x inside int64
MINHASH_FUNCS: list[tuple[int, int, int]] = [
    (k, 2 * k + 3, (104729 * (k + 1)) % MINHASH_P) for k in range(MINHASH_M)
]

SIMHASH_BITS = 16

MD5_INT_SPARK = "cast(conv(substr(md5({x}), 1, 12), 16, 10) as bigint)"


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
) -> DataFrame:
    """Distinct n-word shingles per document: (doc_id, shingle).
    max_df drops shingles appearing in more than max_df docs (bounds
    the quadratic candidate join; None = exact semantics)."""
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


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, k, minhash) MinHash sketch over n-word shingles with
    the fixed affine hash family MINHASH_FUNCS."""
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


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    band_size: int = BAND_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band signatures bucket candidates
    (shingle->minhash->band->bucket-join), exact Jaccard verifies.
    Output is a SUBSET of ngram_jaccard_pairs (LSH recall < 1); the
    banding makes the candidate join O(collisions), not O(n^2)."""
    sigs = minhash_signatures(docs, n, id_col, text_col)
    bands = (
        sigs.withColumn("band", F.floor(F.col("k") / F.lit(float(band_size))).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("sig")
        )
    )
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = word_shingles(docs, n, id_col, text_col)
    pairs = _pair_jaccard(sh, id_col).join(cand, ["doc_a", "doc_b"], "left_semi")
    return pairs.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def simhash(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash signature over word token hashes (with multiplicity):
    bit b of the signature = sign of sum over tokens of ±1 on bit b."""
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


def hamming_pairs(
    sig: DataFrame, max_dist: int = 3, bits: int = SIMHASH_BITS, id_col: str = "doc_id"
) -> DataFrame:
    """Pairs of docs whose simhash differs in <= max_dist bits.
    Candidate prune: split the signature into max_dist+1 chunks —
    any pair within max_dist agrees exactly on >= 1 chunk (pigeonhole),
    so the join is equi on (chunk_idx, chunk_value), never O(n^2)."""
    nchunks = max_dist + 1
    chunk_bits = max(1, bits // nchunks)
    chunks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        (
                            (F.col("simhash") % F.lit(1 << min(bits, (c + 1) * chunk_bits)))
                            / F.lit(1 << (c * chunk_bits))
                        ).cast("long").alias("v"),
                    )
                    for c in range(nchunks)
                ]
            )
        ).alias("ch"),
    ).select(id_col, "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    a = chunks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "c", "v")
    b = chunks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "c", "v")
    cand = (
        a.join(b, ["c", "v"]).where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
    )
    xor = F.expr(f"cast(sig_a as int) ^ cast(sig_b as int)")
    hd = F.bit_count(xor)
    return cand.withColumn("hamming", hd).where(F.col("hamming") <= max_dist).select(
        "doc_a", "doc_b", "hamming"
    )
