"""Product quantization (PQ) over an embedding column — the FAISS
IVF-PQ compression half (Jegou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011): split each dim-D vector
into M contiguous subvectors, learn a K-centroid codebook PER
SUBSPACE with Lloyd's, store each vector as M small integer codes
(D floats -> M bytes at K<=256 — the 10^12-vector memory story), and
serve queries with Asymmetric Distance Computation (ADC): one
(M x K) lookup table per query, corpus distance = M table adds.

Engine stance (shared with operators/kmeans.py, whose fixed-point
design this reuses wholesale): every distributed aggregate that feeds
the model is an INTEGER (per-component sums quantized once per row,
half-up at 1e-6), so any combine order yields identical codebooks and
the whole train -> encode -> search chain replays closed-form in
DuckDB SQL. Distances are squared L2 (the PQ-native metric) computed
in the exact left-fold dimension order of list_sum, rounded to
COS_DIGITS before every argmin/rank so sub-1e-6 noise can't flip a
code or a neighbor.

Scale shape:
  * train: per iteration ONE corpus scan; assignment for ALL M
    subspaces happens inside a single mapInPandas pass against the
    broadcast (M x K x D/M) codebook; each task emits M*K partial
    rows of (D/M + 1) longs — the model shuffles, never the data.
  * encode: zero shuffle (broadcast codebook, one Arrow pass); the
    output is (id, M codes) — the compressed corpus.
  * search: corpus-side streaming ADC — the QUERY side (small by the
    asymmetric-search contract) broadcasts as per-query lookup
    tables; the encoded corpus streams through one mapInPandas that
    keeps a per-partition top-k per query, and a final dimension-sized
    window merges (tasks x q x k) candidate rows: provably equal to
    the full ranked scan because per-partition and global ranking use
    the same (dist, id) total order. The corpus is scanned once;
    nothing corpus-sized shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from cityfinder_spark.colutils import round_digits_col, spread
from cityfinder_spark.operators.kmeans import KMEANS_QUANT
from cityfinder_spark.operators.similarity import (
    COS_DIGITS,
    _id_field,
    _round_np,
)
from cityfinder_spark.workerenv import tune_malloc as _tune_malloc

PQ_M = 4        # subspaces
PQ_K = 16       # codes per subspace
PQ_ITER = 2     # Lloyd iterations per subspace

# Query rows the serving paths may collect to the driver (the
# asymmetric-search contract says the query batch is small — this
# makes that contract ENFORCED instead of assumed, the
# ANN_AUTO_MAX_BASE_ROWS stance from operators/similarity.py): above
# the cap, strategy="auto" routes to the fully relational path where
# the query side stays distributed (per-query ADC tables built by a
# zero-shuffle Arrow pass, corpus joins them JVM-side) instead of
# silently OOMing the driver on a 50M-row query table.
PQ_MAX_DRIVER_QUERIES = 100_000


def _resolve_pq_strategy(
    queries: DataFrame, strategy: str, max_rows: int = PQ_MAX_DRIVER_QUERIES
) -> str:
    if strategy not in ("auto", "arrow", "jvm"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "auto":
        return strategy
    # Bounded probe: scanning max_rows+1 rows answers "over the cap?"
    # without a full count job over an arbitrarily large query table.
    return "arrow" if queries.limit(max_rows + 1).count() <= max_rows else "jvm"


def _fold_sqdist(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """All-pairs squared L2 (q x n) in the exact left-fold dimension
    order of DuckDB list_sum: acc starts at 0.0, adds one dimension's
    (q_d - c_d)^2 at a time — subtraction of float32-representable
    doubles is exact, the square is one rounding, and the add sequence
    is identical, so results are bit-identical to the SQL fold."""
    acc = np.zeros((Q.shape[0], C.shape[0]))
    for d in range(Q.shape[1]):
        diff = Q[:, d, None] - C[None, :, d]
        acc += diff * diff
    return acc


def _assign_codes(
    X: np.ndarray, CB: np.ndarray, digits: int
) -> np.ndarray:
    """(n x M) code matrix: per subspace, argmin of ROUNDED squared
    L2 (ties -> lowest code; np.argmin returns the first minimum)."""
    n, dim = X.shape
    m_sub, _k, dsub = CB.shape
    codes = np.empty((n, m_sub), dtype=np.int64)
    for m in range(m_sub):
        d2 = _fold_sqdist(X[:, m * dsub : (m + 1) * dsub], CB[m])
        codes[:, m] = np.argmin(_round_np(d2, digits), axis=1)
    return codes


def pq_fit(
    emb: DataFrame,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    n_iter: int = PQ_ITER,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    quant: int = KMEANS_QUANT,
) -> tuple[np.ndarray, np.ndarray]:
    """Train all M subspace codebooks jointly: returns
    (codebooks (M x K x D/M) float64, counts (M x K) int64), counts
    from the final update pass. Seeding mirrors kmeans_fit: the
    subvectors of the k_codes lowest ids seed every subspace."""
    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k_codes).collect()
    if not rows:
        return (
            np.zeros((m_sub, 0, 0)),
            np.zeros((m_sub, 0), dtype=np.int64),
        )
    seed = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    dim = seed.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    CB = np.stack(
        [seed[:, m * dsub : (m + 1) * dsub].copy() for m in range(m_sub)]
    )
    cnt = np.zeros((m_sub, k_codes), dtype=np.int64)

    out_schema = T.StructType(
        [
            T.StructField("sub_id", T.LongType()),
            T.StructField("code_id", T.LongType()),
            T.StructField("qsum", T.ArrayType(T.LongType())),
        ]
    )
    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(CB)

        def partials(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            _tune_malloc()
            CBw = bc.value
            S = np.zeros((m_sub, k_codes, dsub + 1), dtype=np.int64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                codes = _assign_codes(X, CBw, digits)
                for m in range(m_sub):
                    qv = np.floor(
                        X[:, m * dsub : (m + 1) * dsub] * quant + 0.5
                    ).astype(np.int64)
                    np.add.at(S[m, :, :dsub], codes[:, m], qv)
                    S[m, :, dsub] += np.bincount(
                        codes[:, m], minlength=k_codes
                    )
            if seen:
                sub = np.repeat(np.arange(m_sub, dtype=np.int64), k_codes)
                code = np.tile(np.arange(k_codes, dtype=np.int64), m_sub)
                yield pd.DataFrame(
                    {
                        "sub_id": sub,
                        "code_id": code,
                        "qsum": list(S.reshape(m_sub * k_codes, dsub + 1)),
                    }
                )

        agg = (
            spread(emb.select(vec_col))
            .mapInPandas(partials, out_schema)
            .select("sub_id", "code_id", F.posexplode("qsum").alias("pos", "qs"))
            .groupBy("sub_id", "code_id", "pos")
            .agg(F.sum("qs").alias("qs"))
            .collect()
        )
        S = np.zeros((m_sub, k_codes, dsub + 1), dtype=np.int64)
        for r in agg:
            S[r["sub_id"], r["code_id"], r["pos"]] = r["qs"]
        cnt = S[:, :, dsub].copy()
        nz = cnt > 0
        # same exact replay as kmeans: int64 -> float64 exact below
        # 2^53, then ONE IEEE division on identical operands
        denom = float(quant) * cnt[nz].astype(np.float64)
        CB[nz] = S[nz][:, :dsub].astype(np.float64) / denom[:, None]
    return CB, cnt


def pq_train(
    emb: DataFrame,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    n_iter: int = PQ_ITER,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    quant: int = KMEANS_QUANT,
) -> DataFrame:
    """The codebooks as a DataFrame exploded for exact comparison:
    (sub_id, code_id, pos (1-based within the subspace), val (round6
    component), n_points) — M*K*(D/M) rows, model-sized."""
    spark = emb.sparkSession
    CB, cnt = pq_fit(
        emb, m_sub, k_codes, n_iter, id_col, vec_col, digits, quant
    )
    CBr = _round_np(CB, digits)
    rows = [
        (int(m), int(c), int(p + 1), float(CBr[m, c, p]), int(cnt[m, c]))
        for m in range(CBr.shape[0])
        for c in range(CBr.shape[1])
        for p in range(CBr.shape[2])
    ]
    return spark.createDataFrame(
        rows, "sub_id long, code_id long, pos long, val double, n_points long"
    )


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """Compress: (id, codes array<long> (M entries), recon_err) per
    row — recon_err is the squared L2 between the vector and its
    reconstruction, folded over the FULL dimension order (subspace
    slices are contiguous, so one 1..D fold == DuckDB's list_sum over
    the concatenated reconstruction), rounded to 6 digits. Zero
    shuffle: broadcast codebook, one Arrow pass."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    schema = T.StructType(
        [
            _id_field(emb, id_col, id_col),
            T.StructField("codes", T.ArrayType(T.LongType())),
            T.StructField("recon_err", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        CB = bc.value
        m_sub, _k, dsub = CB.shape
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = _assign_codes(X, CB, digits)
            R = np.concatenate(
                [CB[m][codes[:, m]] for m in range(m_sub)], axis=1
            )
            err = np.zeros(len(X))
            for d in range(X.shape[1]):
                diff = X[:, d] - R[:, d]
                err += diff * diff
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "recon_err": _round_np(err, digits),
                }
            )

    return spread(emb.select(id_col, vec_col)).mapInPandas(gen, schema)


def _pq_query_tables(
    queries: DataFrame,
    codebooks: np.ndarray,
    q_id_col: str,
    vec_col: str,
) -> DataFrame:
    """Distributed per-query ADC tables: (q_id, tab array<double> of
    M*K entries, tab[m*K + c] = fold-L2(query subvec m, codebook
    [m][c])). Zero shuffle — broadcast codebooks, one Arrow pass; the
    query side never touches the driver. The entries are the same
    _fold_sqdist doubles the driver-side path computes, so the two
    strategies stay bit-identical."""
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    m_sub, k_codes, dsub = codebooks.shape
    schema = T.StructType(
        [
            _id_field(queries, q_id_col, "q_id"),
            T.StructField("tab", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        CB = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            tabs = np.stack(
                [
                    _fold_sqdist(Q[:, m * dsub : (m + 1) * dsub], CB[m])
                    for m in range(m_sub)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {
                    "q_id": pdf[q_id_col].to_numpy(),
                    "tab": list(tabs.reshape(len(Q), m_sub * k_codes)),
                }
            )

    return spread(queries.select(q_id_col, vec_col)).mapInPandas(gen, schema)


def _adc_fold_expr(m_sub: int, k_codes: int) -> F.Column:
    """JVM-side ADC: left-fold over subspaces m = 0..M-1 adding
    tab[m*K + codes[m]] — the SAME double-add sequence as the Arrow
    kernel's subspace loop, so the rounded distances agree bitwise."""
    return F.expr(
        f"aggregate(sequence(0, {m_sub - 1}), cast(0 as double), "
        f"(acc, m) -> acc + element_at(tab, "
        f"cast(m * {k_codes} + element_at(codes, cast(m + 1 as int)) + 1 as int)))"
    )


def pq_search(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = COS_DIGITS,
    strategy: str = "auto",
) -> DataFrame:
    """ADC top-k: (q_id, neighbor_id, adc_dist, rank), smallest
    approximate squared L2 first, ties neighbor_id asc. `codes` is
    the pq_encode output (the compressed corpus — the only thing
    scanned). Per query the (M x K) table entries are subspace
    L2 folds; a corpus row's distance adds its M table cells in
    subspace order (fixed tree -> deterministic), rounded once.

    Two parity-tested strategies, routed by a COUNT GUARD
    (strategy="auto": arrow iff the query table is under
    PQ_MAX_DRIVER_QUERIES rows):

    * "arrow": the query side collects to a broadcast
      (asymmetric-search contract: the query batch is small; the
      CORPUS must stream) and the encoded corpus makes one
      mapInPandas pass keeping a per-partition top-k per query; the
      global window then ranks (partitions x q x k) candidate rows —
      equal to the full ranked scan because both use the same
      (adc_dist, neighbor_id) order and every global top-k row is its
      partition's top-k.
    * "jvm": nothing touches the driver — per-query ADC tables come
      from a zero-shuffle Arrow pass (_pq_query_tables), the encoded
      corpus joins them and the distance is a JVM aggregate-HOF fold
      in the same subspace order. The corpus x queries product is
      inherent to EXHAUSTIVE ADC at that query scale (use
      ivfpq_search to cut it); the point of the fallback is that the
      plan is fully distributed and spillable instead of a silent
      driver OOM."""
    strategy = _resolve_pq_strategy(queries, strategy)
    m_sub, k_codes, dsub = codebooks.shape
    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if strategy == "jvm":
        qtab = _pq_query_tables(queries, codebooks, q_id_col, vec_col)
        cand = (
            codes.select(F.col(id_col).alias("neighbor_id"), "codes")
            .crossJoin(qtab)
            .select(
                "q_id",
                "neighbor_id",
                round_digits_col(_adc_fold_expr(m_sub, k_codes), digits).alias(
                    "adc_dist"
                ),
            )
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "adc_dist", "rank")
        )

    spark = queries.sparkSession
    qrows = queries.select(q_id_col, vec_col).orderBy(q_id_col).collect()
    if qrows:
        Q = np.array(
            [np.asarray(r[vec_col], dtype=np.float64) for r in qrows]
        )
        # tables[q, m, c] = fold-L2(query subvec m, codebook[m][c])
        tables = np.stack(
            [
                _fold_sqdist(Q[:, m * dsub : (m + 1) * dsub], codebooks[m])
                for m in range(m_sub)
            ],
            axis=1,
        )
    else:
        tables = np.zeros((0, m_sub, k_codes))
    q_ids = np.array([r[q_id_col] for r in qrows])
    bc = spark.sparkContext.broadcast((q_ids, tables))
    schema = T.StructType(
        [
            _id_field(queries, q_id_col, "q_id"),
            _id_field(codes, id_col, "neighbor_id"),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        qids, tabs = bc.value
        nq = len(qids)
        if nq == 0:
            return
        ids_all: list[np.ndarray] = []
        dists_all: list[np.ndarray] = []
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy())
            nid = pdf[id_col].to_numpy()
            # adc[q, row] accumulated in subspace order (fixed tree)
            adc = np.zeros((nq, len(C)))
            for m in range(m_sub):
                adc += tabs[:, m, :][:, C[:, m]]
            adc = _round_np(adc, digits)
            ids_all.append(nid)
            dists_all.append(adc)
        if not ids_all:
            return
        nid = np.concatenate(ids_all)
        adc = np.concatenate(dists_all, axis=1)
        kk = min(k, len(nid))
        # per-partition top-k per query: lexsort (id asc within dist)
        out_q, out_i, out_d = [], [], []
        for qi in range(nq):
            order = np.lexsort((nid, adc[qi]))[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_i.append(nid[order])
            out_d.append(adc[qi][order])
        yield pd.DataFrame(
            {
                "q_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_i),
                "adc_dist": np.concatenate(out_d),
            }
        )

    cand = spread(codes.select(id_col, "codes")).mapInPandas(gen, schema)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "adc_dist", "rank")
    )


def residual_vectors(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "cluster_id",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """IVF-PQ front half: coarse-assign each vector to its kmeans
    cell (rounded-cosine convention shared with kmeans_assign /
    ivf_search), then subtract the cell centroid — PQ then encodes
    the RESIDUAL, which is far lower-variance than the raw vector
    (the Jegou et al. IVFADC construction). Output:
    (id, cluster_id, residual array<double>).

    The subtraction is pure JVM codegen: zip_with against the
    broadcast (cluster -> centroid) mini-table — doubles subtract
    exactly the same way in every engine, so residuals stay
    oracle-replayable. Assignment is the stateless kmeans_assign
    pass (zero shuffle); the centroid attach is a broadcast join."""
    from cityfinder_spark.operators.kmeans import kmeans_assign

    spark = emb.sparkSession
    labels = kmeans_assign(emb, centroids, id_col, vec_col, digits)
    cdf = spark.createDataFrame(
        [
            (int(c), [float(x) for x in centroids[c]])
            for c in range(len(centroids))
        ],
        f"{label_col} long, __c array<double>",
    )
    return (
        emb.select(id_col, vec_col)
        .join(labels, id_col)
        .join(F.broadcast(cdf), label_col)
        .select(
            id_col,
            label_col,
            F.expr(
                f"zip_with(transform({vec_col}, x -> cast(x as double)),"
                " __c, (x, c) -> x - c)"
            ).alias("residual"),
        )
    )


def ivfpq_upsert(
    enc_base: DataFrame,
    delta_emb: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "cluster_id",
    digits: int = COS_DIGITS,
) -> DataFrame:
    """Incremental IVFPQ index maintenance — the steady-state
    ingestion shape for a living corpus: a delta batch (updates +
    inserts) re-encodes ONLY ITSELF against the FROZEN models (coarse
    quantizer + residual codebooks stay fixed between retrains, the
    FAISS add-with-ids contract), then a last-write-wins MERGE on id
    (sinks.upsert_merge — ONE id-keyed window) replaces the stored
    rows. Because encoding is a pure per-row function of the frozen
    models, the merged index is bit-identical to re-encoding the
    merged corpus from scratch (pytest-pinned) — so search over
    base ∪ delta needs no special casing and the base pays ZERO
    re-encode work per batch.

    enc_base: the stored artifact (id, codes, recon_err, cluster_id).
    delta_emb: (id, vector) rows — ids present in base are updates,
    new ids are inserts; both flow through the same path. Output: the
    merged artifact + from_update (merge audit column)."""
    from cityfinder_spark.sinks import upsert_merge

    resid_d = residual_vectors(
        delta_emb, coarse, id_col, vec_col, label_col, digits
    )
    enc_d = pq_encode(resid_d, codebooks, id_col, "residual", digits).join(
        resid_d.select(id_col, label_col), id_col
    )
    cols = [id_col, "codes", "recon_err", label_col]
    return upsert_merge(
        enc_base.select(*cols).withColumn("__ver", F.lit(0)),
        enc_d.select(*cols).withColumn("__ver", F.lit(1)),
        id_col,
        "__ver",
    ).drop("__ver")


def ivfpq_save(
    path: str,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    enc: DataFrame,
) -> None:
    """Persist the complete IVFPQ artifact set as parquet tables (the
    finder.py S5-S7 persistence stance: stored indexes are ordinary
    tables ANY engine can read, not pickled blobs):

      coarse/    (cluster_id long, centroid array<double>) — the
                 coarse quantizer (model-sized, k rows)
      codebooks/ (sub_id int, code_id int, centroid array<double>) —
                 the M x K residual PQ codebooks
      corpus/    the encoded corpus (vec_id, codes, recon_err,
                 cluster_id) — the only data-sized table, written
                 distributed

    Doubles round-trip parquet exactly, so load-then-serve is
    bit-identical to serving the in-memory models (pytest-pinned).
    Closes the index lifecycle: train -> save -> load -> upsert ->
    search all run from stored artifacts."""
    import os

    spark = enc.sparkSession
    spark.createDataFrame(
        [(int(c), [float(x) for x in coarse[c]]) for c in range(len(coarse))],
        "cluster_id long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "coarse"))
    m_sub, k_codes, _dsub = codebooks.shape
    spark.createDataFrame(
        [
            (m, k, [float(x) for x in codebooks[m, k]])
            for m in range(m_sub)
            for k in range(k_codes)
        ],
        "sub_id int, code_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks")
    )
    enc.write.mode("overwrite").parquet(os.path.join(path, "corpus"))


def ivfpq_load(spark, path: str) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """Load an ivfpq_save artifact set -> (coarse (k, D), codebooks
    (M, K, D/M), corpus DataFrame). The two model tables are
    model-sized driver collects (the kmeans stance: the model crosses,
    never the data); the corpus stays a lazy parquet scan."""
    import os

    crows = spark.read.parquet(os.path.join(path, "coarse")).collect()
    coarse = np.array(
        [r["centroid"] for r in sorted(crows, key=lambda r: r["cluster_id"])]
    )
    brows = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    m_sub = 1 + max(r["sub_id"] for r in brows)
    k_codes = 1 + max(r["code_id"] for r in brows)
    codebooks = np.zeros((m_sub, k_codes, len(brows[0]["centroid"])))
    for r in brows:
        codebooks[r["sub_id"], r["code_id"]] = r["centroid"]
    enc = spark.read.parquet(os.path.join(path, "corpus"))
    return coarse, codebooks, enc


def _ivfpq_query_probes(
    queries: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    n_probe: int,
    q_id_col: str,
    vec_col: str,
    digits: int,
) -> DataFrame:
    """Distributed probe selection + shifted ADC tables: n_probe rows
    per query — (q_id, cluster_id, tab array<double> of M*K entries
    for the query SHIFTED by that cluster's centroid). Zero shuffle,
    broadcast (coarse, codebooks); identical NumPy kernels to the
    driver-side path (rounded-cosine probe pick, lexsort ties cell
    asc, _fold_sqdist tables), so the strategies stay bit-identical."""
    from cityfinder_spark.operators.similarity import _fold_dots, _fold_norms

    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((coarse, codebooks))
    m_sub, k_codes, dsub = codebooks.shape
    schema = T.StructType(
        [
            _id_field(queries, q_id_col, "q_id"),
            T.StructField("cluster_id", T.LongType()),
            T.StructField("tab", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        C, CB = bc.value
        k_tab = CB.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cos = _fold_dots(Q, C)
            cos /= _fold_norms(Q)[:, None] * _fold_norms(C)[None, :]
            cosr = _round_np(cos, digits)
            # stable argsort on -cosr == lexsort((arange, -cosr)):
            # equal keys keep index order, the ivf_search tie rule
            probes = np.argsort(-cosr, axis=1, kind="stable")[:, :n_probe]
            nq = len(Q)
            # shifted queries (nq, n_probe, dim); ADC tables built by
            # the SAME per-dimension accumulation order as
            # _fold_sqdist, just with leading batch axes
            SQ = Q[:, None, :] - C[probes]
            tabs = np.zeros((nq, n_probe, m_sub, k_tab))
            for m in range(m_sub):
                sub = SQ[:, :, m * dsub : (m + 1) * dsub]
                acc = tabs[:, :, m, :]
                for d in range(dsub):
                    diff = sub[:, :, d, None] - CB[m][None, None, :, d]
                    acc += diff * diff
            qid = np.repeat(pdf[q_id_col].to_numpy(), n_probe)
            yield pd.DataFrame(
                {
                    "q_id": qid,
                    "cluster_id": probes.reshape(-1),
                    "tab": list(tabs.reshape(nq * n_probe, m_sub * k_tab)),
                }
            )

    return spread(queries.select(q_id_col, vec_col)).mapInPandas(gen, schema)


def ivfpq_search(
    queries: DataFrame,
    enc: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "cluster_id",
    digits: int = COS_DIGITS,
    strategy: str = "auto",
) -> DataFrame:
    """IVFADC serving (the full FAISS IVF-PQ shape): per query, probe
    the n_probe coarse cells with the best rounded centroid cosine
    (ties cell asc — the ivf_search convention), shift the query by
    each probed centroid, build the (M x K) ADC table of the SHIFTED
    query against the residual codebooks, and scan only rows whose
    cell is probed. Output (q_id, neighbor_id, adc_dist, rank), adc
    asc / neighbor asc, round6.

    `enc` is the compressed corpus: (id, cluster_id, codes) — what a
    10^12-vector deployment actually stores (2 bytes + a cell id per
    vector). Two parity-tested strategies behind the
    PQ_MAX_DRIVER_QUERIES count guard (strategy="auto"):

    * "arrow": scale shape matches pq_search (query side broadcasts,
      corpus streams once, per-partition top-k + dimension-sized
      merge), with the probe step additionally cutting the
      scanned-row work to the probed cells' share per query.
    * "jvm" (query table above the driver cap): per-(query, probe)
      shifted ADC tables come from a zero-shuffle Arrow pass and the
      corpus reaches its candidates through a plain EQUI-JOIN on the
      probed cluster id — the inverted-list prune becomes the join
      key, so candidate rows = the probed cells' members exactly,
      nothing collects to the driver, and the distance is the same
      subspace-order JVM fold as pq_search's fallback."""
    strategy = _resolve_pq_strategy(queries, strategy)
    m_sub, k_codes, dsub = codebooks.shape
    n_list = len(coarse)
    n_probe = min(n_probe, n_list)
    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if strategy == "jvm":
        qprobe = _ivfpq_query_probes(
            queries, coarse, codebooks, n_probe, q_id_col, vec_col, digits
        ).withColumnRenamed("cluster_id", label_col)
        cand = (
            enc.select(
                F.col(id_col).alias("neighbor_id"), F.col(label_col), "codes"
            )
            .join(qprobe, label_col)
            .select(
                "q_id",
                "neighbor_id",
                round_digits_col(_adc_fold_expr(m_sub, k_codes), digits).alias(
                    "adc_dist"
                ),
            )
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "adc_dist", "rank")
        )

    spark = queries.sparkSession
    qrows = queries.select(q_id_col, vec_col).orderBy(q_id_col).collect()
    if qrows:
        Q = np.array(
            [np.asarray(r[vec_col], dtype=np.float64) for r in qrows]
        )
        from cityfinder_spark.operators.similarity import (
            _fold_dots,
            _fold_norms,
        )

        cos = _fold_dots(Q, coarse)
        cos /= _fold_norms(Q)[:, None] * _fold_norms(coarse)[None, :]
        cosr = _round_np(cos, digits)
        # per query: top n_probe lists, rounded cos desc, list asc
        probes = np.stack(
            [
                np.lexsort((np.arange(n_list), -cosr[qi]))[:n_probe]
                for qi in range(len(Q))
            ]
        ).astype(np.int64)
        # tables[q, p, m, c]: shifted-query subspace L2 vs codebook
        tables = np.zeros((len(Q), n_probe, m_sub, k_codes))
        for qi in range(len(Q)):
            for p in range(n_probe):
                sq = Q[qi] - coarse[probes[qi, p]]
                for m in range(m_sub):
                    tables[qi, p, m] = _fold_sqdist(
                        sq[None, m * dsub : (m + 1) * dsub], codebooks[m]
                    )[0]
    else:
        probes = np.zeros((0, n_probe), dtype=np.int64)
        tables = np.zeros((0, n_probe, m_sub, k_codes))
    q_ids = np.array([r[q_id_col] for r in qrows])
    bc = spark.sparkContext.broadcast((q_ids, probes, tables))
    schema = T.StructType(
        [
            _id_field(queries, q_id_col, "q_id"),
            _id_field(enc, id_col, "neighbor_id"),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _tune_malloc()
        qids, prb, tabs = bc.value
        nq = len(qids)
        if nq == 0:
            return
        # invert: list -> [(query_idx, probe_rank), ...]
        inv: dict[int, list[tuple[int, int]]] = {}
        for qi in range(nq):
            for p in range(prb.shape[1]):
                inv.setdefault(int(prb[qi, p]), []).append((qi, p))
        cand: dict[int, list] = {qi: [] for qi in range(nq)}
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy())
            nid = pdf[id_col].to_numpy()
            lab = pdf[label_col].to_numpy()
            for l, members in inv.items():
                sel = lab == l
                if not sel.any():
                    continue
                Cl, nl = C[sel], nid[sel]
                for qi, p in members:
                    adc = np.zeros(len(Cl))
                    for m in range(tabs.shape[2]):
                        adc += tabs[qi, p, m][Cl[:, m]]
                    cand[qi].append((nl, _round_np(adc, 6)))
        out_q, out_i, out_d = [], [], []
        for qi in range(nq):
            if not cand[qi]:
                continue
            nl = np.concatenate([c[0] for c in cand[qi]])
            dl = np.concatenate([c[1] for c in cand[qi]])
            order = np.lexsort((nl, dl))[: min(k, len(nl))]
            out_q.append(np.full(len(order), qids[qi]))
            out_i.append(nl[order])
            out_d.append(dl[order])
        if out_q:
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_i),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    cols = enc.select(id_col, label_col, "codes")
    cand_df = spread(cols).mapInPandas(gen, schema)
    return (
        cand_df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "adc_dist", "rank")
    )
