"""Embedding scalar quantization (int8) — the storage/serving path of
a large-scale vector pipeline.

Per-vector symmetric int8: scale = max|x| / 127, q_i = half-up
round(x_i / scale) (in [-127, 127] by construction — |x_i|/scale <=
127, and floor(+-127 + 0.5) stays inside). A 10^12-vector corpus at
dim-768 float32 is ~3 PB; int8 + one float scale per vector is ~770 TB
— the standard 4x shrink before ANN serving.

Everything is a pure Catalyst projection (higher-order transform +
sequential aggregate folds): zero shuffle, zero UDF, embarrassingly
parallel. Determinism: scale is one exact division, q_i one
floor(x/s + 0.5) per element, and the error/checksum folds run
left-to-right — the same IEEE sequence DuckDB's list_sum performs, so
every output (including the full quantized vector, pinned through two
integer checksums) value-hashes against the SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.colutils import round6_col


def quantize_embeddings(
    embs: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """-> (vec_id, dim, scale, qsum, qdot, l2_err):

      * scale  — round6(max|x| / 127), the dequantization factor;
      * qsum   — sum of the int8 codes (integer, exact);
      * qdot   — position-weighted checksum sum(q_i * (i+1)): pins
        every code's VALUE AND POSITION, so the whole quantized vector
        is hash-gated without emitting an array column;
      * l2_err — round6(||x - dequantize(q)||_2), the reconstruction
        error actually paid at serving time.
    """
    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    s = maxabs / F.lit(127.0)

    def q_of(x):
        return F.when(s == 0.0, F.lit(0).cast("long")).otherwise(
            F.floor(x / s + 0.5).cast("long")
        )

    qsum = F.aggregate(
        F.transform(v, q_of),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    qdot = F.aggregate(
        F.transform(v, lambda x, i: q_of(x) * (i.cast("long") + 1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    err2 = F.aggregate(
        F.transform(v, lambda x: (x - q_of(x) * s) * (x - q_of(x) * s)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return embs.select(
        F.col(id_col),
        F.size(v).alias("dim"),
        round6_col(s).alias("scale"),
        qsum.alias("qsum"),
        qdot.alias("qdot"),
        round6_col(F.sqrt(err2)).alias("l2_err"),
    )
