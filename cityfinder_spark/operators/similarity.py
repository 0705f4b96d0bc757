"""Similarity search over embedding columns (driver mandate):
brute-force cosine top-k baseline + LSH / IVF scale paths.

Embeddings are array<float>; all arithmetic is promoted to double
before any reduction (float-order divergence would break oracle
parity). The dot product runs inside higher-order Column expressions
(zip_with + aggregate -> JVM codegen, sequential left fold)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from cityfinder_spark.colutils import round6_col

COS_DIGITS = 6


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: F.Column | str, b: F.Column | str) -> F.Column:
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ac, bc, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return emb.withColumn("__v", v).withColumn("__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """Exact brute-force cosine top-k per vector (the ANN baseline):
    cross join vs broadcast + window. (vec_id, neighbor_id, cos_sim,
    rank); tie-break (cos desc rounded, neighbor_id asc)."""
    left = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("__v").alias("va"), F.col("__norm").alias("na")
    )
    right = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("vb"), F.col("__norm").alias("nb")
    )
    pairs = (
        left.crossJoin(F.broadcast(right))
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb"))))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (vec_a, vec_b, cos_sim >= t)."""
    left = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_a"), F.col("__v").alias("va"), F.col("__norm").alias("na")
    )
    right = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_b"), F.col("__v").alias("vb"), F.col("__norm").alias("nb")
    )
    return (
        left.crossJoin(F.broadcast(right))
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb"))))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


# ---- scale paths (approximate; verified by recall tests, not oracle) ----

# fixed random-hyperplane family for LSH: deterministic pseudo-random
# +-1 signs via md5 of (plane, dim) — no RNG state, reproducible.
_LSH_SIGN = (
    "cast(conv(substr(md5(concat('plane', cast({p} as string), '_', cast(i as string))), 1, 4), 16, 10) as bigint) % 2"
)


def lsh_bucket_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: n_tables independent
    sign-signatures of n_planes bits each; candidates = pairs sharing
    any (table, bucket); exact cosine + window ranks the union.
    Recall for neighbors at angle θ: 1-(1-(1-θ/π)^n_planes)^n_tables.
    Approximate — recall vs cosine_topk tested statistically.

    Signatures are one Arrow-batched matmul per batch: (rows x dim) @
    (dim x tables*planes) sign matrix (deterministic md5-derived ±1,
    same family as _LSH_SIGN), instead of per-row interpreted
    zip_with/aggregate folds with md5 inside the element lambda."""
    base = with_norm(emb, vec_col)

    def _sign(p: int, i: int) -> float:
        h = hashlib.md5(f"plane{p}_{i}".encode()).hexdigest()
        return 1.0 if int(h[:4], 16) % 2 else -1.0

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy())
        dim = M.shape[1]
        S = np.empty((dim, n_tables * n_planes))
        for t in range(n_tables):
            for p in range(n_planes):
                pid = t * 1000 + p
                for i in range(dim):
                    S[i, t * n_planes + p] = _sign(pid, i + 1)
        proj = M @ S  # (rows, tables*planes)
        bits = (proj > 0).astype(np.int32)
        weights = np.tile(1 << np.arange(n_planes, dtype=np.int32), n_tables)
        weighted = bits * weights
        bkts = weighted.reshape(len(M), n_tables, n_planes).sum(axis=2)
        return pd.Series(list(bkts.astype(np.int32)))

    buckets = F.transform(
        F.col("__bkts"),
        lambda b, t: F.struct(t.cast("int").alias("t"), b.alias("bkt")),
    )
    bucketed = (
        base.withColumn("__bkts", buckets_udf("__v"))
        .withColumn("__b", F.explode(buckets))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col("__b.t").alias("t"), F.col("__b.bkt").alias("bkt"),
        )
    )
    right = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), "t", "bkt"
    )
    cand = (
        bucketed.join(right, ["t", "bkt"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .distinct()
    )
    left = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("__v").alias("va"), F.col("__norm").alias("na")
    )
    rightv = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("vb"), F.col("__norm").alias("nb")
    )
    pairs = (
        cand.join(left, "vec_id")
        .join(F.broadcast(rightv), "neighbor_id")
        .withColumn("cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb"))))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """IVF-style ANN: coarse centroids (per label group), search only
    the n_probe nearest inverted lists. Approximate; recall-tested."""
    base = with_norm(emb, vec_col)
    dim = len(base.select(vec_col).first()[0])
    cents = (
        base.groupBy(label_col)
        .agg(
            F.array(*[F.avg(F.col("__v")[i]) for i in range(dim)]).alias("cv"),
        )
        .withColumn("cnorm", F.sqrt(_dot("cv", "cv")))
    )
    # assign each vector to its n_probe nearest centroids
    assign = (
        base.crossJoin(F.broadcast(cents.select(F.col(label_col).alias("list_id"), "cv", "cnorm")))
        .withColumn("csim", _dot("__v", "cv") / (F.col("__norm") * F.col("cnorm")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("list_id"))
    probes = (
        assign.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select(F.col(id_col).alias("vec_id"), "list_id",
                F.col("__v").alias("va"), F.col("__norm").alias("na"))
    )
    # inverted lists: every vector belongs to its own top-1 list
    lists = (
        assign.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") == 1)
        .select(F.col(id_col).alias("neighbor_id"), "list_id",
                F.col("__v").alias("vb"), F.col("__norm").alias("nb"))
    )
    pairs = (
        probes.join(lists, "list_id")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb"))))
    )
    w2 = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )
