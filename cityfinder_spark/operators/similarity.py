"""Similarity search over embedding columns (driver mandate):
brute-force cosine top-k baseline + LSH / IVF scale paths.

Embeddings are array<float>; all arithmetic is promoted to double
before any reduction (float-order divergence would break oracle
parity). Two interchangeable physical strategies for the exact
kernels (parity-tested against each other and the DuckDB oracle):

  * strategy="jvm": the dot product runs inside higher-order Column
    expressions (zip_with + aggregate -> sequential left fold). Fully
    relational, but Spark evaluates the lambdas interpreted (outside
    whole-stage codegen) and the all-pairs plan is a cross join —
    correct, and the plan-shape reference.
  * strategy="arrow" (default): the base set is collected driver-side
    into an EmbIndex (float64 matrix + exact-fold norms, ids
    ascending) and broadcast once per Python worker; the query side
    streams through ONE mapInPandas pass — no cross join, no shuffle,
    no interpreted lambdas. The fold order of the JVM/DuckDB dot
    product is reproduced BIT-FOR-BIT: float32 inputs cast to float64
    make every elementwise product exact (24-bit mantissas -> <=48
    bits), and the accumulator adds one dimension at a time in the
    same left-fold sequence, so rounded cos_sim values hash-match the
    oracle. The base side must be broadcast-size — that is what
    "brute-force baseline" means; the 100 TB scale paths are
    lsh_bucket_topk / ivf_topk, whose candidate generation is
    bucketed and whose exact refinement reuses the same index."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from cityfinder_spark.bcast import memo_broadcast, memo_value
from cityfinder_spark.colutils import round6_col, spread
from cityfinder_spark.workerenv import tune_malloc as _tune_malloc

COS_DIGITS = 6

# strategy="auto" (the ANN default) broadcasts a driver-built index only
# while the base side fits a sane broadcast budget; above it the fully
# relational jvm plan runs instead (bucket/list equi-joins, no driver
# collect). 1M rows x dim-64 float64 ~ 0.5 GB of index — the same
# size-adaptive philosophy as components.connected_components'
# driver_max_edges.
ANN_AUTO_MAX_BASE_ROWS = 1_000_000


def _resolve_ann_strategy(
    emb: DataFrame,
    strategy: str,
    cache_key: tuple | None,
    max_rows: int = ANN_AUTO_MAX_BASE_ROWS,
) -> str:
    if strategy != "auto":
        return strategy
    n = memo_value(
        emb.sparkSession,
        None if cache_key is None else ("baserows", *cache_key),
        emb.count,
    )
    return "arrow" if n <= max_rows else "jvm"


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


# ---- Arrow strategy: broadcast index + exact-fold NumPy kernels ----


def _round_np(x: np.ndarray, digits: int) -> np.ndarray:
    scale = 10.0 ** digits
    return np.floor(x * scale + 0.5) / scale


def _fold_dots(Q: np.ndarray, M: np.ndarray) -> np.ndarray:
    """All-pairs dot products (q x n) in the EXACT left-fold order of
    zip_with/aggregate and DuckDB list_sum: accumulator starts at 0.0
    and adds one dimension's product at a time. Products of
    float32-representable doubles are exact in float64, so the only
    rounding is in the adds — and the add sequence is identical, so
    the result is bit-identical to the JVM/DuckDB fold."""
    acc = np.zeros((Q.shape[0], M.shape[0]))
    for d in range(Q.shape[1]):
        acc += Q[:, d, None] * M[None, :, d]
    return acc


def _fold_dots_rows(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise exact-fold dot products (A[i] . B[i])."""
    acc = np.zeros(A.shape[0])
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def _fold_dots_pairs(
    Q: np.ndarray, qi: np.ndarray, M: np.ndarray, cd: np.ndarray
) -> np.ndarray:
    """Exact-fold dot products for index pairs (Q[qi[i]] . M[cd[i]])
    WITHOUT materializing the gathered (pairs x dim) matrices — at
    bucket-collision scale (1M+ candidate pairs) those two gathers are
    GB-size allocations that hit this allocator's page-zeroing wall
    (measured 122s -> sub-second for the same sf0.1 IVF batch). Three
    reused pair-length buffers; the per-dimension add sequence is the
    same left fold as _fold_dots_rows, so results are bit-identical."""
    m = len(qi)
    acc = np.zeros(m)
    ga, gb = np.empty(m), np.empty(m)
    for d in range(Q.shape[1]):
        np.take(Q[:, d], qi, out=ga)
        np.take(M[:, d], cd, out=gb)
        ga *= gb
        acc += ga
    return acc


def _fold_norms(V: np.ndarray) -> np.ndarray:
    return np.sqrt(_fold_dots_rows(V, V))


class EmbIndex:
    """Driver-built static embedding index for the Arrow cosine
    kernels: ids ascending (unique), float64 matrix, exact-fold norms.
    One pickled copy per Python worker via SparkContext.broadcast —
    the similarity analog of nearest_arrow.CityIndex (the reference's
    process-wide in-memory index, lib/finder/finder.go:47-64)."""

    def __init__(self, ids: np.ndarray, M: np.ndarray):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.M = np.ascontiguousarray(M[order])
        self.norms = _fold_norms(self.M)

    def positions(self, ids: np.ndarray) -> np.ndarray:
        """Index positions of `ids` (must all be present)."""
        if not len(self.ids):
            return np.zeros(len(ids), np.int64)
        return np.searchsorted(self.ids, ids).astype(np.int64)


def build_emb_index(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> EmbIndex:
    pdf = emb.select(id_col, vec_col).toPandas()
    n = len(pdf)
    if n == 0:
        return EmbIndex(np.empty(0, np.int64), np.empty((0, 1)))
    ids = pdf[id_col].to_numpy()
    M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return EmbIndex(ids, M)


def _id_field(emb: DataFrame, id_col: str, out_name: str) -> T.StructField:
    return T.StructField(out_name, emb.schema[id_col].dataType, True)


def _emb_index_bc(
    emb: DataFrame, id_col: str, vec_col: str, cache_key: tuple | None
) -> tuple[EmbIndex, "object"]:
    """(EmbIndex, Broadcast), built + broadcast once per context when a
    cache_key names the base table's identity (bcast.memo_broadcast) —
    steady-state queries pay the kernel only, like the reference's
    build-once in-memory index (lib/initializer/initializer.go:198)."""
    key = None if cache_key is None else ("embidx", *cache_key, id_col, vec_col)
    return memo_broadcast(
        emb.sparkSession, key, lambda: build_emb_index(emb, id_col, vec_col)
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k per vector (the ANN baseline).
    (vec_id, neighbor_id, cos_sim, rank); tie-break (cos desc rounded,
    neighbor_id asc). strategy="jvm": cross join vs broadcast +
    window; strategy="arrow": broadcast EmbIndex + one mapInPandas
    pass per query partition (no cross join, no shuffle — the window
    ranking collapses into a per-row stable argsort because ALL
    candidates for a query row live in its own batch)."""
    if strategy == "jvm":
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

    index, bc = _emb_index_bc(emb, id_col, vec_col, cache_key)
    schema = T.StructType(
        [
            _id_field(emb, id_col, "vec_id"),
            _id_field(emb, id_col, "neighbor_id"),
            T.StructField("cos_sim", T.DoubleType(), True),
            T.StructField("rank", T.IntegerType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        idx: EmbIndex = bc.value
        n = len(idx.ids)
        for pdf in batches:
            q = len(pdf)
            if q == 0 or n <= 1:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q_ids = pdf[id_col].to_numpy()
            qn = _fold_norms(Q)
            cos = _fold_dots(Q, idx.M)
            # single division by the norm PRODUCT — x/(a*b) and
            # (x/a)/b differ in ulps; the JVM/DuckDB expression is
            # dot / (na * nb)
            cos /= qn[:, None] * idx.norms[None, :]
            cos = _round_np(cos, digits)
            # exclude self (same id), matching vec_id != neighbor_id
            pos = idx.positions(q_ids)
            rows = np.arange(q)
            is_self = idx.ids[np.minimum(pos, n - 1)] == q_ids
            cos[rows[is_self], pos[is_self]] = -np.inf
            kk = min(k, n)
            # stable argsort on -cos: equal rounded cos -> index order
            # == neighbor_id ascending (idx.ids is sorted)
            top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(cos, top, axis=1)
            keep = np.isfinite(vals)
            rr, cc = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_id": q_ids[rr],
                    "neighbor_id": idx.ids[top[rr, cc]],
                    "cos_sim": vals[rr, cc],
                    "rank": (cc + 1).astype(np.int32),
                }
            )

    # spread() the query side: tiny-sf scans are one parquet file ->
    # one task would run the whole NumPy kernel single-threaded; at
    # fact scale the scan is already wide and this is a no-op
    return spread(emb.select(id_col, vec_col)).mapInPandas(gen, schema)


def cosine_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (vec_a, vec_b, cos_sim >= t).
    Same two strategies as cosine_topk; the arrow path emits pairs
    straight from the thresholded score matrix (id_a < id_b becomes a
    position comparison because the index ids are sorted ascending)."""
    if strategy == "jvm":
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

    index, bc = _emb_index_bc(emb, id_col, vec_col, cache_key)
    schema = T.StructType(
        [
            _id_field(emb, id_col, "vec_a"),
            _id_field(emb, id_col, "vec_b"),
            T.StructField("cos_sim", T.DoubleType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        idx: EmbIndex = bc.value
        n = len(idx.ids)
        for pdf in batches:
            q = len(pdf)
            if q == 0 or n == 0:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q_ids = pdf[id_col].to_numpy()
            qn = _fold_norms(Q)
            cos = _fold_dots(Q, idx.M)
            # single division by the norm PRODUCT — x/(a*b) and
            # (x/a)/b differ in ulps; the JVM/DuckDB expression is
            # dot / (na * nb)
            cos /= qn[:, None] * idx.norms[None, :]
            cos = _round_np(cos, digits)
            pos = idx.positions(q_ids)
            keep = (cos >= threshold) & (pos[:, None] < np.arange(n)[None, :])
            rr, cc = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_a": q_ids[rr],
                    "vec_b": idx.ids[cc],
                    "cos_sim": cos[rr, cc],
                }
            )

    # spread() the query side: tiny-sf scans are one parquet file ->
    # one task would run the whole NumPy kernel single-threaded; at
    # fact scale the scan is already wide and this is a no-op
    return spread(emb.select(id_col, vec_col)).mapInPandas(gen, schema)


# ---- scale paths (approximate; verified by recall tests, not oracle) ----

# fixed random-hyperplane family for LSH: deterministic pseudo-random
# +-1 signs via md5 of (plane, dim) — no RNG state, reproducible.
_LSH_SIGN = (
    "cast(conv(substr(md5(concat('plane', cast({p} as string), '_', cast(i as string))), 1, 4), 16, 10) as bigint) % 2"
)


def lsh_bucket_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 3,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    strategy: str = "auto",
    cache_key: tuple | None = None,
) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: n_tables independent
    sign-signatures of n_planes bits each; candidates = pairs sharing
    any (table, bucket); exact cosine ranks the union.
    Recall for neighbors at angle θ: 1-(1-(1-θ/π)^n_planes)^n_tables.
    The shipped defaults (3 planes x 16 tables) hit recall@5 >= 0.98
    on the contract embeddings (asserted in tests/test_dedup_text.py);
    at corpus scale n_planes grows ~log2(N/target_bucket_size) to keep
    buckets selective — candidate volume per table is sum over buckets
    of |bucket|^2, so selectivity, not table count, is the scale knob.
    Candidate generation + refinement are fully deterministic (md5
    sign family, exact summation folds), so the whole operator is
    DuckDB-oracled exactly, plus recall-vs-cosine_topk tests.

    strategy="auto" (default): broadcast-index arrow path while the
    base side is under ANN_AUTO_MAX_BASE_ROWS, the fully relational
    jvm path (no driver collect anywhere) above — the base-side count
    is memoized per cache_key so steady-state queries pay no extra job.

    strategy="arrow" (the broadcast-size fast path): base signatures and
    per-table CSR bucket lists live in a broadcast LSHIndex; each query
    batch computes its own signatures with one matmul, gathers bucket
    candidates ragged, dedups per query, refines with the exact-fold
    cosine and ranks in-batch — ONE mapInPandas pass, zero shuffles
    (vs jvm's explode + self-join + distinct + window: 3 shuffles).
    Both strategies produce the same candidate set (union of shared
    buckets) and the same deterministic ranking, asserted by test.

    strategy="jvm" (the 100 TB shape): relational pipeline —
    signature UDF per batch (exact-fold projections against the
    deterministic md5-derived ±1 sign matrix), bucket equi-self-join,
    and exact refinement via two hash joins back to the embeddings
    table; only ids and the candidate pairs' vectors ever shuffle, and
    nothing is collected to the driver. The per-pair cosine fold runs
    vectorized in a scalar pandas UDF by default (bit-identical fold
    order; measured 37.4s -> 26.0s on 1.2M rows, BENCH/ann_jvm) with
    the pure-Catalyst zip_with/aggregate kernel retained as the
    plan-reference (_refine_pairs_relational(kernel=...))."""
    strategy = _resolve_ann_strategy(emb, strategy, cache_key)
    if strategy == "arrow":
        return _lsh_topk_arrow(
            emb, k, n_planes, n_tables, id_col, vec_col, digits, cache_key
        )
    base = with_norm(emb, vec_col)

    def _sign(p: int, i: int) -> float:
        h = hashlib.md5(f"plane{p}_{i}".encode()).hexdigest()
        return 1.0 if int(h[:4], 16) % 2 else -1.0

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy())
        S = _sign_matrix(M.shape[1], n_planes, n_tables)
        # exact left fold over dims (not BLAS matmul): bit-identical to
        # LSHIndex.signatures and to the DuckDB oracle's list_sum fold,
        # so the >0 sign bits can never diverge by summation order
        proj = _fold_dots(M, S.T)  # (rows, tables*planes)
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
    pairs = _refine_pairs_relational(cand, emb, id_col, vec_col, digits)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


def _sign_matrix(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix (dim x tables*planes), the
    same md5 family as buckets_udf / _LSH_SIGN — no RNG state."""
    S = np.empty((dim, n_tables * n_planes))
    for t in range(n_tables):
        for p in range(n_planes):
            pid = t * 1000 + p
            for i in range(dim):
                h = hashlib.md5(f"plane{pid}_{i + 1}".encode()).hexdigest()
                S[i, t * n_planes + p] = 1.0 if int(h[:4], 16) % 2 else -1.0
    return S


def _gather_lists(
    offsets: np.ndarray, pos: np.ndarray, bkt: np.ndarray, rows: np.ndarray
) -> tuple[np.ndarray, np.ndarray] | None:
    """Ragged CSR gather: for each query row r with bucket/list id
    bkt[r], emit (row, member_position) for every member of that list.
    Returns None when every addressed list is empty."""
    starts = offsets[bkt]
    counts = offsets[bkt + 1] - starts
    total = int(counts.sum())
    if not total:
        return None
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return np.repeat(rows, counts), pos[np.repeat(starts, counts) + within]


def _rank_topk(
    qi: np.ndarray, cd: np.ndarray, cos: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-query top-k over candidate triples: cos desc (already
    rounded), candidate position asc (== neighbor_id asc because index
    ids are sorted). Returns (qi, cd, cos, rank) filtered to rank<=k —
    the in-batch collapse of the window `partitionBy(vec_id).orderBy
    (desc(cos_sim), asc(neighbor_id))`."""
    order = np.lexsort((cd, -cos, qi))
    qi, cd, cos = qi[order], cd[order], cos[order]
    grp_start = np.concatenate([[0], np.nonzero(np.diff(qi))[0] + 1])
    seg = np.repeat(grp_start, np.diff(np.concatenate([grp_start, [len(qi)]])))
    rank = np.arange(len(qi), dtype=np.int64) - seg
    keep = rank < k
    return qi[keep], cd[keep], cos[keep], (rank[keep] + 1).astype(np.int32)


class LSHIndex(EmbIndex):
    """EmbIndex + per-table CSR bucket lists: for table t and bucket b,
    base-vector positions are bucket_pos[t][offsets[t][b]:offsets[t][b+1]]
    (ascending within a bucket -> ties resolve to neighbor_id asc)."""

    def __init__(self, ids, M, n_planes: int, n_tables: int):
        super().__init__(ids, M)
        self.n_planes = n_planes
        self.n_tables = n_tables
        dim = self.M.shape[1] if len(self.ids) else 1
        self.S = _sign_matrix(dim, n_planes, n_tables)
        n_buckets = 1 << n_planes
        self.offsets = []
        self.bucket_pos = []
        sigs = self.signatures(self.M)  # (n, tables)
        for t in range(n_tables):
            bkt = sigs[:, t]
            order = np.argsort(bkt, kind="stable").astype(np.int64)
            counts = np.bincount(bkt, minlength=n_buckets)
            self.offsets.append(
                np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            )
            self.bucket_pos.append(order)

    def signatures(self, V: np.ndarray) -> np.ndarray:
        """(rows, tables) int32 bucket signatures — identical weighting
        to buckets_udf (bit p of table t = sign of plane t*1000+p)."""
        if not len(V):
            return np.zeros((0, self.n_tables), np.int32)
        # exact left fold over dims — see buckets_udf: keeps sign bits
        # bit-identical across strategies and vs the DuckDB oracle
        proj = _fold_dots(V, self.S.T)
        bits = (proj > 0).astype(np.int32)
        weights = np.tile(
            1 << np.arange(self.n_planes, dtype=np.int32), self.n_tables
        )
        return (
            (bits * weights)
            .reshape(len(V), self.n_tables, self.n_planes)
            .sum(axis=2)
            .astype(np.int32)
        )


def _lsh_topk_arrow(
    emb: DataFrame,
    k: int,
    n_planes: int,
    n_tables: int,
    id_col: str,
    vec_col: str,
    digits: int,
    cache_key: tuple | None = None,
) -> DataFrame:
    """Single-pass LSH ANN (see lsh_bucket_topk): broadcast LSHIndex,
    one mapInPandas over the query side, zero shuffles."""

    def build() -> LSHIndex:
        base = build_emb_index(emb, id_col, vec_col)
        return LSHIndex(base.ids, base.M, n_planes, n_tables)

    key = (
        None
        if cache_key is None
        else ("lshidx", *cache_key, id_col, vec_col, n_planes, n_tables)
    )
    index, bc = memo_broadcast(emb.sparkSession, key, build)
    schema = T.StructType(
        [
            _id_field(emb, id_col, "vec_id"),
            _id_field(emb, id_col, "neighbor_id"),
            T.StructField("cos_sim", T.DoubleType(), True),
            T.StructField("rank", T.IntegerType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        idx: LSHIndex = bc.value
        n = len(idx.ids)
        for pdf in batches:
            q = len(pdf)
            if q == 0 or n <= 1:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q_ids = pdf[id_col].to_numpy()
            sigs = idx.signatures(Q)  # (q, tables)
            qi_parts, cd_parts = [], []
            rows = np.arange(q, dtype=np.int64)
            for t in range(idx.n_tables):
                got = _gather_lists(idx.offsets[t], idx.bucket_pos[t], sigs[:, t], rows)
                if got is None:
                    continue
                qi_parts.append(got[0])
                cd_parts.append(got[1])
            if not qi_parts:
                continue
            qi = np.concatenate(qi_parts)
            cd = np.concatenate(cd_parts)
            # dedup (query, candidate) across tables; drop self
            pos = idx.positions(q_ids)
            keyed = np.unique(qi * n + cd)
            qi, cd = keyed // n, keyed % n
            not_self = idx.ids[cd] != q_ids[qi]
            qi, cd = qi[not_self], cd[not_self]
            if not len(qi):
                continue
            qn = _fold_norms(Q)
            cos = _fold_dots_pairs(Q, qi, idx.M, cd)
            cos /= qn[qi] * idx.norms[cd]
            cos = _round_np(cos, digits)
            qi, cd, cos, rank = _rank_topk(qi, cd, cos, k)
            yield pd.DataFrame(
                {
                    "vec_id": q_ids[qi],
                    "neighbor_id": idx.ids[cd],
                    "cos_sim": cos,
                    "rank": rank,
                }
            )

    # spread() the query side: tiny-sf scans are one parquet file ->
    # one task would run the whole NumPy kernel single-threaded; at
    # fact scale the scan is already wide and this is a no-op
    return spread(emb.select(id_col, vec_col)).mapInPandas(gen, schema)


def _refine_pairs_relational(
    cand: DataFrame,
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    digits: int,
    kernel: str = "arrow",
) -> DataFrame:
    """Exact cosine for candidate pairs WITHOUT any driver-built index:
    two hash joins back to the embeddings table attach the vectors;
    only the candidate set (post-LSH/IVF, orders of magnitude smaller
    than all-pairs) ever shuffles. This is the 100 TB refinement shape.

    kernel="arrow" (default): the per-pair fold runs in a vectorized
    scalar pandas UDF (_fold_dots_rows — the EXACT left-fold add
    sequence, so values are bit-identical to the Catalyst kernel and
    the DuckDB oracle). Measured 7.9us/pair interpreted vs ~0.1us/pair
    vectorized on this host (the zip_with/aggregate lambdas evaluate
    outside whole-stage codegen); nothing is collected to the driver
    either way. kernel="catalyst" keeps the pure-Column fold — the
    plan-reference/debug shape, parity-pinned by test."""
    if kernel == "arrow":

        @F.pandas_udf(T.DoubleType())
        def pair_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
            A = np.vstack(va.to_numpy())
            B = np.vstack(vb.to_numpy())
            d = _fold_dots_rows(A, B)
            # norms in the same exact fold (sqrt of self-dot), one per
            # pair side — recomputed per pair rather than joined in, so
            # the upstream joins ship ONLY the raw float32 vectors
            na = np.sqrt(_fold_dots_rows(A, A))
            nb = np.sqrt(_fold_dots_rows(B, B))
            return pd.Series(_round_np(d / (na * nb), digits))

        a = emb.select(
            F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("va")
        )
        b = emb.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vb")
        )
        return (
            cand.join(a, "vec_id")
            .join(b, "neighbor_id")
            .withColumn("cos_sim", pair_cos("va", "vb"))
            .select("vec_id", "neighbor_id", "cos_sim")
        )
    a = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("__v").alias("va"), F.col("__norm").alias("na"),
    )
    b = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("vb"), F.col("__norm").alias("nb"),
    )
    return (
        cand.join(a, "vec_id")
        .join(b, "neighbor_id")
        .withColumn(
            "cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb")))
        )
        .select("vec_id", "neighbor_id", "cos_sim")
    )


class IVFIndex(EmbIndex):
    """EmbIndex + coarse quantizer: one centroid per distinct label
    (the exact left-fold mean of its members in id-ascending order —
    np.bincount accumulates in input order, so the fold is
    deterministic, unlike F.avg whose partial-aggregation order is
    partition-dependent), plus CSR inverted lists assigning every base
    vector to its top-1 nearest centroid (cosine desc, list asc)."""

    def __init__(self, ids, M, labels):
        order = np.argsort(ids, kind="stable")
        super().__init__(ids, M)
        labels = np.asarray(labels)[order]
        self.list_labels, inv = np.unique(labels, return_inverse=True)
        L = len(self.list_labels)
        dim = self.M.shape[1] if len(self.ids) else 1
        C = np.zeros((L, dim))
        counts = np.bincount(inv, minlength=L).astype(np.float64)
        for d in range(dim):
            C[:, d] = np.bincount(inv, weights=self.M[:, d], minlength=L)
        self.C = C / np.maximum(counts, 1.0)[:, None]
        self.cnorms = _fold_norms(self.C)
        if len(self.ids):
            csim = _fold_dots(self.M, self.C)
            csim /= self.norms[:, None] * self.cnorms[None, :]
            # rounded before the argmax so list assignment is oracle-
            # reproducible (sub-1e-6 summation-order noise can't flip
            # it); first max == list asc tie-break
            csim = _round_np(csim, COS_DIGITS)
            top1 = np.argmax(csim, axis=1)
        else:
            top1 = np.zeros(0, np.int64)
        cnts = np.bincount(top1, minlength=L)
        self.list_offsets = np.concatenate([[0], np.cumsum(cnts)]).astype(np.int64)
        self.list_pos = np.argsort(top1, kind="stable").astype(np.int64)


def _ivf_topk_arrow(
    emb: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    label_col: str,
    digits: int,
    cache_key: tuple | None = None,
) -> DataFrame:
    """Single-pass IVF ANN: broadcast IVFIndex, one mapInPandas over
    the query side — zero shuffles (vs jvm's centroid agg + cross join
    + two windows + candidate join: 4+ exchanges). Per batch: one
    (q x L) matmul picks the n_probe nearest lists, a ragged CSR
    gather pulls their members, and the exact-fold cosine ranks them
    in-batch. Lists are disjoint (top-1 assignment) so no dedup pass
    is needed, unlike LSH's multi-table union."""

    def build() -> IVFIndex:
        pdf = emb.select(id_col, vec_col, label_col).toPandas()
        if not len(pdf):
            return IVFIndex(np.empty(0, np.int64), np.empty((0, 1)), np.empty(0))
        ids = pdf[id_col].to_numpy()
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        return IVFIndex(ids, M, pdf[label_col].to_numpy())

    key = (
        None
        if cache_key is None
        else ("ivfidx", *cache_key, id_col, vec_col, label_col)
    )
    index, bc = memo_broadcast(emb.sparkSession, key, build)
    schema = T.StructType(
        [
            _id_field(emb, id_col, "vec_id"),
            _id_field(emb, id_col, "neighbor_id"),
            T.StructField("cos_sim", T.DoubleType(), True),
            T.StructField("rank", T.IntegerType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        idx: IVFIndex = bc.value
        n = len(idx.ids)
        L = len(idx.list_labels)
        for pdf in batches:
            q = len(pdf)
            if q == 0 or n <= 1 or L == 0:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q_ids = pdf[id_col].to_numpy()
            qn = _fold_norms(Q)
            csim = _fold_dots(Q, idx.C)
            csim /= qn[:, None] * idx.cnorms[None, :]
            # rounded like the IVFIndex assignment: probe choice is
            # oracle-reproducible; ties -> lower list index (label asc)
            csim = _round_np(csim, COS_DIGITS)
            npb = min(n_probe, L)
            probes = np.argsort(-csim, axis=1, kind="stable")[:, :npb]
            rows = np.arange(q, dtype=np.int64)
            qi_parts, cd_parts = [], []
            for j in range(npb):
                got = _gather_lists(
                    idx.list_offsets, idx.list_pos, probes[:, j], rows
                )
                if got is None:
                    continue
                qi_parts.append(got[0])
                cd_parts.append(got[1])
            if not qi_parts:
                continue
            qi = np.concatenate(qi_parts)
            cd = np.concatenate(cd_parts)
            not_self = idx.ids[cd] != q_ids[qi]
            qi, cd = qi[not_self], cd[not_self]
            if not len(qi):
                continue
            cos = _fold_dots_pairs(Q, qi, idx.M, cd)
            cos /= qn[qi] * idx.norms[cd]
            cos = _round_np(cos, digits)
            qi, cd, cos, rank = _rank_topk(qi, cd, cos, k)
            yield pd.DataFrame(
                {
                    "vec_id": q_ids[qi],
                    "neighbor_id": idx.ids[cd],
                    "cos_sim": cos,
                    "rank": rank,
                }
            )

    # spread() the query side: tiny-sf scans are one parquet file ->
    # one task would run the whole NumPy kernel single-threaded; at
    # fact scale the scan is already wide and this is a no-op
    return spread(emb.select(id_col, vec_col)).mapInPandas(gen, schema)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    digits: int = COS_DIGITS,
    strategy: str = "auto",
    cache_key: tuple | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse centroids (per label group), search only
    the n_probe nearest inverted lists. Candidate choice ranks by
    ROUNDED list cosine (ties: label asc), so it is DuckDB-oracled
    exactly (ordered centroid sums reproduce the bincount fold) on top
    of the recall-vs-cosine_topk tests. The shipped default n_probe=8
    hits recall@5 >= 0.9 on the contract embeddings (10 lists —
    asserted in tests); recall is governed by the n_probe/n_list
    RATIO, so at corpus scale n_list grows ~sqrt(N) and the same
    fraction of lists keeps both recall and the per-query candidate
    count (~ n_probe * N / n_list) bounded.

    strategy="auto" (default): broadcast IVFIndex + one mapInPandas
    pass (zero shuffles) while the base side is under
    ANN_AUTO_MAX_BASE_ROWS; above it the fully relational jvm path —
    centroid groupBy agg, broadcast-centroid join with interpreted
    zip_with/aggregate dot products, two row_number windows, candidate
    equi-join, exact refinement via hash joins + the vectorized
    exact-fold pair kernel (no driver collect anywhere). Candidate semantics are identical (n_probe nearest
    lists by rounded cosine, tie list asc; members = top-1
    assignment); centroid arithmetic differs only in fold order
    (bincount id-ascending vs F.avg partition order) — invisible below
    the 1e-6 rounding except for exact boundary values."""
    strategy = _resolve_ann_strategy(emb, strategy, cache_key)
    if strategy == "arrow":
        return _ivf_topk_arrow(
            emb, k, n_probe, id_col, vec_col, label_col, digits, cache_key
        )
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
        .withColumn(
            "csim", round6_col(_dot("__v", "cv") / (F.col("__norm") * F.col("cnorm")))
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("list_id"))
    probes = (
        assign.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select(F.col(id_col).alias("vec_id"), "list_id")
    )
    # inverted lists: every vector belongs to its own top-1 list
    lists = (
        assign.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") == 1)
        .select(F.col(id_col).alias("neighbor_id"), "list_id")
    )
    cand = (
        probes.join(lists, "list_id")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
    )
    # relational exact refinement — the jvm strategy never collects the
    # base side to the driver (that is the point of the strategy); the
    # fold order still matches the arrow kernels bit-for-bit
    pairs = _refine_pairs_relational(cand, emb, id_col, vec_col, digits)
    w2 = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


# ---- asymmetric search: a query batch against a static corpus ----
#
# Every operator above is a SELF-join (dedup within one table). The
# production ingestion shape is asymmetric: k nearest corpus neighbors
# for each row of a NEW batch (dedup a fresh crawl against the existing
# corpus, retrieval for dataset curation). Same kernels, two tables:
# the corpus is the indexed/broadcast side, the query batch streams.


def _refine_pairs_asym(
    cand: DataFrame,
    queries: DataFrame,
    base: DataFrame,
    q_id_col: str,
    id_col: str,
    vec_col: str,
    digits: int,
    kernel: str = "arrow",
) -> DataFrame:
    """_refine_pairs_relational generalized to two tables: cand carries
    (q_id, neighbor_id); vectors join in from `queries` and `base`
    respectively; the per-pair cosine runs in the vectorized exact-fold
    pandas UDF (kernel="catalyst" keeps the pure-Column fold)."""
    if kernel == "arrow":

        @F.pandas_udf(T.DoubleType())
        def pair_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
            A = np.vstack(va.to_numpy())
            B = np.vstack(vb.to_numpy())
            d = _fold_dots_rows(A, B)
            na = np.sqrt(_fold_dots_rows(A, A))
            nb = np.sqrt(_fold_dots_rows(B, B))
            return pd.Series(_round_np(d / (na * nb), digits))

        a = queries.select(
            F.col(q_id_col).alias("q_id"), _as_double(vec_col).alias("va")
        )
        b = base.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vb")
        )
        return (
            cand.join(a, "q_id")
            .join(b, "neighbor_id")
            .withColumn("cos_sim", pair_cos("va", "vb"))
            .select("q_id", "neighbor_id", "cos_sim")
        )
    a = with_norm(queries, vec_col).select(
        F.col(q_id_col).alias("q_id"),
        F.col("__v").alias("va"), F.col("__norm").alias("na"),
    )
    b = with_norm(base, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("vb"), F.col("__norm").alias("nb"),
    )
    return (
        cand.join(a, "q_id")
        .join(b, "neighbor_id")
        .withColumn(
            "cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb")))
        )
        .select("q_id", "neighbor_id", "cos_sim")
    )


def cosine_search(
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    strategy: str = "arrow",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Exact top-k corpus neighbors per QUERY row (the asymmetric twin
    of cosine_topk): (q_id, neighbor_id, cos_sim, rank), ties cos desc
    rounded then neighbor_id asc. No self-exclusion — queries and base
    are distinct tables (overlapping ids are the caller's semantics).

    strategy="arrow" (default): broadcast EmbIndex on the BASE side
    (built once per cache_key), queries stream through one mapInPandas
    — zero shuffles, O(batch x corpus) vectorized folds; the base must
    fit the broadcast budget, which is the brute-force baseline's
    contract. strategy="jvm": crossJoin vs the broadcast base + window
    — the pure-Catalyst reference, value-identical."""
    if strategy == "jvm":
        left = with_norm(queries, vec_col).select(
            F.col(q_id_col).alias("q_id"),
            F.col("__v").alias("va"), F.col("__norm").alias("na"),
        )
        right = with_norm(base, vec_col).select(
            F.col(id_col).alias("neighbor_id"),
            F.col("__v").alias("vb"), F.col("__norm").alias("nb"),
        )
        pairs = left.crossJoin(F.broadcast(right)).withColumn(
            "cos_sim", round6_col(_dot("va", "vb") / (F.col("na") * F.col("nb")))
        )
        w = Window.partitionBy("q_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "cos_sim", "rank")
        )
    index, bc = _emb_index_bc(base, id_col, vec_col, cache_key)
    schema = T.StructType(
        [
            _id_field(queries, q_id_col, "q_id"),
            _id_field(base, id_col, "neighbor_id"),
            T.StructField("cos_sim", T.DoubleType(), True),
            T.StructField("rank", T.IntegerType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        idx: EmbIndex = bc.value
        n = len(idx.ids)
        for pdf in batches:
            q = len(pdf)
            if q == 0 or n == 0:
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q_ids = pdf[q_id_col].to_numpy()
            qn = _fold_norms(Q)
            cos = _fold_dots(Q, idx.M)
            cos /= qn[:, None] * idx.norms[None, :]
            cos = _round_np(cos, digits)
            kk = min(k, n)
            top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(cos, top, axis=1)
            keep = np.isfinite(vals)
            rr, cc = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "q_id": q_ids[rr],
                    "neighbor_id": idx.ids[top[rr, cc]],
                    "cos_sim": vals[rr, cc],
                    "rank": (cc + 1).astype(np.int32),
                }
            )

    return spread(queries.select(q_id_col, vec_col)).mapInPandas(gen, schema)


def _lsh_bucket_rows(
    emb: DataFrame,
    id_col: str,
    out_name: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """(out_name, t, bkt) — one row per (vector, table) with its bucket
    signature, via the batch signature UDF (same md5 family / exact
    fold as LSHIndex.signatures)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy())
        S = _sign_matrix(M.shape[1], n_planes, n_tables)
        proj = _fold_dots(M, S.T)
        bits = (proj > 0).astype(np.int32)
        weights = np.tile(1 << np.arange(n_planes, dtype=np.int32), n_tables)
        bkts = (bits * weights).reshape(len(M), n_tables, n_planes).sum(axis=2)
        return pd.Series(list(bkts.astype(np.int32)))

    v = _as_double(vec_col)
    buckets = F.transform(
        F.col("__bkts"),
        lambda b, t: F.struct(t.cast("int").alias("t"), b.alias("bkt")),
    )
    return (
        emb.withColumn("__v", v)
        .withColumn("__bkts", buckets_udf("__v"))
        .withColumn("__b", F.explode(buckets))
        .select(
            F.col(id_col).alias(out_name),
            F.col("__b.t").alias("t"), F.col("__b.bkt").alias("bkt"),
        )
    )


def lsh_signature_table(
    base: DataFrame,
    n_planes: int = 3,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistable corpus-side LSH index: (vec_id, t, bkt) — one
    row per (vector, table). Write it once (ideally bucketed on
    (t, bkt) via sinks.write_bucketed_table) and pass it back to
    lsh_search(base_sigs=...): the per-ingestion-batch cost drops to
    the QUERY side only — at a 10^12-row corpus, recomputing corpus
    signatures per batch is the difference between a scan of the world
    and a scan of the batch. Same md5 sign family / exact fold as
    every other signature site, so persisted and recomputed signatures
    are identical."""
    return _lsh_bucket_rows(base, id_col, id_col, vec_col, n_planes, n_tables)


def lsh_search(
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    n_planes: int = 3,
    n_tables: int = 16,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    strategy: str = "auto",
    cache_key: tuple | None = None,
    base_sigs: DataFrame | None = None,
) -> DataFrame:
    """ANN corpus search per query row (the asymmetric twin of
    lsh_bucket_topk): candidates = corpus vectors sharing any
    (table, bucket) signature with the query; exact rounded cosine
    ranks them, rank<=k. Fully deterministic (same md5 sign family),
    so DuckDB-oracled exactly like the self-join variant.

    strategy="auto": broadcast LSHIndex on the base while it is under
    ANN_AUTO_MAX_BASE_ROWS — queries stream through ONE mapInPandas,
    zero shuffles; above the budget the relational plan runs (bucket
    signature UDF on BOTH tables, (t, bkt) equi-join, distinct,
    vectorized exact-fold refinement — no driver collect; only the
    query batch, its bucket keys, and the candidate pairs shuffle —
    at 10^12 corpus rows the corpus-side signature pass is a scan,
    not a shuffle).

    base_sigs: a persisted corpus signature table from
    lsh_signature_table (columns (id_col, t, bkt)) — forces the
    relational plan and skips the corpus-side signature pass entirely
    (steady-state ingestion: signatures written once, each new batch
    pays only its own). Must have been built with the SAME n_planes /
    n_tables."""
    if base_sigs is not None:
        strategy = "jvm"
    else:
        strategy = _resolve_ann_strategy(base, strategy, cache_key)
    if strategy == "arrow":

        def build() -> LSHIndex:
            b = build_emb_index(base, id_col, vec_col)
            return LSHIndex(b.ids, b.M, n_planes, n_tables)

        key = (
            None
            if cache_key is None
            else ("lshidx", *cache_key, id_col, vec_col, n_planes, n_tables)
        )
        index, bc = memo_broadcast(base.sparkSession, key, build)
        schema = T.StructType(
            [
                _id_field(queries, q_id_col, "q_id"),
                _id_field(base, id_col, "neighbor_id"),
                T.StructField("cos_sim", T.DoubleType(), True),
                T.StructField("rank", T.IntegerType(), True),
            ]
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _tune_malloc()
            idx: LSHIndex = bc.value
            n = len(idx.ids)
            for pdf in batches:
                q = len(pdf)
                if q == 0 or n == 0:
                    continue
                Q = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                q_ids = pdf[q_id_col].to_numpy()
                sigs = idx.signatures(Q)
                qi_parts, cd_parts = [], []
                rows = np.arange(q, dtype=np.int64)
                for t in range(idx.n_tables):
                    got = _gather_lists(
                        idx.offsets[t], idx.bucket_pos[t], sigs[:, t], rows
                    )
                    if got is None:
                        continue
                    qi_parts.append(got[0])
                    cd_parts.append(got[1])
                if not qi_parts:
                    continue
                qi = np.concatenate(qi_parts)
                cd = np.concatenate(cd_parts)
                keyed = np.unique(qi * n + cd)  # dedup across tables
                qi, cd = keyed // n, keyed % n
                if not len(qi):
                    continue
                qn = _fold_norms(Q)
                cos = _fold_dots_pairs(Q, qi, idx.M, cd)
                cos /= qn[qi] * idx.norms[cd]
                cos = _round_np(cos, digits)
                qi, cd, cos, rank = _rank_topk(qi, cd, cos, k)
                yield pd.DataFrame(
                    {
                        "q_id": q_ids[qi],
                        "neighbor_id": idx.ids[cd],
                        "cos_sim": cos,
                        "rank": rank,
                    }
                )

        return spread(queries.select(q_id_col, vec_col)).mapInPandas(gen, schema)

    qb = _lsh_bucket_rows(queries, q_id_col, "q_id", vec_col, n_planes, n_tables)
    if base_sigs is not None:
        bb = base_sigs.select(
            F.col(id_col).alias("neighbor_id"), "t", "bkt"
        )
    else:
        bb = _lsh_bucket_rows(
            base, id_col, "neighbor_id", vec_col, n_planes, n_tables
        )
    cand = qb.join(bb, ["t", "bkt"]).select("q_id", "neighbor_id").distinct()
    pairs = _refine_pairs_asym(
        cand, queries, base, q_id_col, id_col, vec_col, digits
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_search(
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    digits: int = COS_DIGITS,
    strategy: str = "auto",
    cache_key: tuple | None = None,
) -> DataFrame:
    """IVF ANN corpus search per QUERY row (the asymmetric twin of
    ivf_topk, completing the search matrix: exact/LSH/IVF x self-join/
    asymmetric — this is the "bounded query sets against the corpus"
    shape the IVF coarse quantizer is right for, per SCALE.md). The
    corpus's inverted lists are its top-1 centroid assignments; each
    query probes its n_probe nearest lists by ROUNDED centroid cosine
    (ties label asc), candidates rank by exact rounded cosine, rank<=k.
    No self-exclusion — queries and base are distinct tables. Fully
    deterministic, DuckDB-oracled exactly like ivf_topk.

    strategy="auto": broadcast IVFIndex on the corpus while it is
    under ANN_AUTO_MAX_BASE_ROWS — queries stream through ONE
    mapInPandas, zero shuffles; above the budget the fully relational
    plan runs (centroid groupBy agg on the corpus, broadcast-centroid
    assignment of both sides, candidate equi-join on list_id,
    vectorized exact-fold refinement — no driver collect; only the
    query batch, its probe keys, and candidate pairs shuffle; at
    10^12 corpus rows the corpus-side assignment is a scan + the
    one-time centroid agg, not a per-batch recompute)."""
    strategy = _resolve_ann_strategy(base, strategy, cache_key)
    if strategy == "arrow":

        def build() -> IVFIndex:
            pdf = base.select(id_col, vec_col, label_col).toPandas()
            if not len(pdf):
                return IVFIndex(np.empty(0, np.int64), np.empty((0, 1)), np.empty(0))
            ids = pdf[id_col].to_numpy()
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            return IVFIndex(ids, M, pdf[label_col].to_numpy())

        key = (
            None
            if cache_key is None
            else ("ivfidx", *cache_key, id_col, vec_col, label_col)
        )
        index, bc = memo_broadcast(base.sparkSession, key, build)
        schema = T.StructType(
            [
                _id_field(queries, q_id_col, "q_id"),
                _id_field(base, id_col, "neighbor_id"),
                T.StructField("cos_sim", T.DoubleType(), True),
                T.StructField("rank", T.IntegerType(), True),
            ]
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _tune_malloc()
            idx: IVFIndex = bc.value
            n = len(idx.ids)
            L = len(idx.list_labels)
            for pdf in batches:
                q = len(pdf)
                if q == 0 or n == 0 or L == 0:
                    continue
                Q = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                q_ids = pdf[q_id_col].to_numpy()
                qn = _fold_norms(Q)
                csim = _fold_dots(Q, idx.C)
                csim /= qn[:, None] * idx.cnorms[None, :]
                csim = _round_np(csim, COS_DIGITS)
                npb = min(n_probe, L)
                probes = np.argsort(-csim, axis=1, kind="stable")[:, :npb]
                rows = np.arange(q, dtype=np.int64)
                qi_parts, cd_parts = [], []
                for j in range(npb):
                    got = _gather_lists(
                        idx.list_offsets, idx.list_pos, probes[:, j], rows
                    )
                    if got is None:
                        continue
                    qi_parts.append(got[0])
                    cd_parts.append(got[1])
                if not qi_parts:
                    continue
                qi = np.concatenate(qi_parts)
                cd = np.concatenate(cd_parts)
                cos = _fold_dots_pairs(Q, qi, idx.M, cd)
                cos /= qn[qi] * idx.norms[cd]
                cos = _round_np(cos, digits)
                qi, cd, cos, rank = _rank_topk(qi, cd, cos, k)
                yield pd.DataFrame(
                    {
                        "q_id": q_ids[qi],
                        "neighbor_id": idx.ids[cd],
                        "cos_sim": cos,
                        "rank": rank,
                    }
                )

        return spread(queries.select(q_id_col, vec_col)).mapInPandas(gen, schema)

    # relational plan: centroids + list membership from the corpus,
    # probe assignment for the queries, candidate equi-join, exact
    # refinement — mirrors ivf_topk's jvm path on two tables
    b = with_norm(base, vec_col)
    dim = len(base.select(vec_col).first()[0])
    cents = (
        b.groupBy(label_col)
        .agg(F.array(*[F.avg(F.col("__v")[i]) for i in range(dim)]).alias("cv"))
        .withColumn("cnorm", F.sqrt(_dot("cv", "cv")))
        .select(F.col(label_col).alias("list_id"), "cv", "cnorm")
    )
    assign_b = b.crossJoin(F.broadcast(cents)).withColumn(
        "csim", round6_col(_dot("__v", "cv") / (F.col("__norm") * F.col("cnorm")))
    )
    wb = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("list_id"))
    lists = (
        assign_b.withColumn("pr", F.row_number().over(wb))
        .where(F.col("pr") == 1)
        .select(F.col(id_col).alias("neighbor_id"), "list_id")
    )
    qn = with_norm(queries, vec_col)
    assign_q = qn.crossJoin(F.broadcast(cents)).withColumn(
        "csim", round6_col(_dot("__v", "cv") / (F.col("__norm") * F.col("cnorm")))
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.desc("csim"), F.asc("list_id"))
    probes = (
        assign_q.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= n_probe)
        .select(F.col(q_id_col).alias("q_id"), "list_id")
    )
    cand = probes.join(lists, "list_id").select("q_id", "neighbor_id")
    pairs = _refine_pairs_asym(
        cand, queries, base, q_id_col, id_col, vec_col, digits
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )
