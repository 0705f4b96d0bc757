"""Similarity search over embedding columns (driver mandate):
brute-force cosine top-k baseline + LSH / IVF scale paths.

Embeddings are array<float>; all arithmetic is promoted to double
before any reduction (float-order divergence would break oracle
parity). The dot product runs inside higher-order Column expressions
(zip_with + aggregate -> JVM codegen, sequential left fold)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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
    Approximate — recall vs cosine_topk tested statistically."""
    base = with_norm(emb, vec_col)

    def sig_col(table: int) -> F.Column:
        bits = []
        for p in range(n_planes):
            sign_expr = _LSH_SIGN.format(p=table * 1000 + p)
            proj = F.expr(
                "aggregate(zip_with(__v, transform(sequence(1, size(__v)), i -> "
                f"case when {sign_expr} = 0 then -1.0 else 1.0 end), (x, s) -> x * s), "
                "0.0D, (acc, x) -> acc + x)"
            )
            bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    buckets = F.array(
        *[
            F.struct(F.lit(t).alias("t"), sig_col(t).alias("bkt"))
            for t in range(n_tables)
        ]
    )
    bucketed = (
        base.withColumn("__b", F.explode(buckets))
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
