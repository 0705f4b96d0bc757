"""Checkpoint / lineage metadata tables for resumable batch reruns
(north rule: "every stage checkpoints per-partition lineage + row
counts to Iceberg metadata tables for resumable reruns").

Iceberg-style, plain Parquet in sandbox (SURVEY §7.3 'Iceberg in
sandbox'): the metadata layer is a manifest table
  (stage, bucket, rows, input_fingerprint)
next to bucket-partitioned data files. The write API is deliberately
narrow so a real Iceberg catalog can be swapped underneath.

Resume semantics = the reference's build-if-missing index caching
(lib/initializer/initializer.go:198-213) lifted to partition grain:
a rerun anti-joins the completed-bucket manifest and processes only
the remainder. Fingerprints are order-insensitive sums of per-row
hashes, so a resumed run can prove it read the same input slice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = "stage string, bucket int, rows long, input_fingerprint long"


def with_bucket(df: DataFrame, id_col: str, n_buckets: int) -> DataFrame:
    """Deterministic processing bucket (the checkpoint grain)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    )


def input_fingerprint_col(id_col: str) -> F.Column:
    """Order-insensitive lineage fingerprint: XOR of row hashes
    (no overflow under ANSI mode, any row count)."""
    return F.bit_xor(F.xxhash64(F.col(id_col))).alias("input_fingerprint")


def full_fingerprint_col(cols: list[str]) -> F.Column:
    """Order-insensitive fingerprint over ALL columns (not just the id):
    XOR of xxhash64(struct(c1..cn)). Used by the staged-vs-source resume
    guard so a source whose non-id payload changed (same ids — e.g.
    re-crawled docs with new text) is refused, not silently mixed with a
    half-complete manifest. Always paired with a row-count compare,
    because XOR alone cancels even-count duplicate additions."""
    return F.bit_xor(
        F.xxhash64(F.struct(*[F.col(c) for c in cols]))
    ).alias("full_fingerprint")


def partition_metrics(df: DataFrame) -> DataFrame:
    """Per-(Spark-)partition row counts — the runtime metrics table."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows")
    )


def completed_buckets(spark: SparkSession, manifest_path: str, stage: str) -> set[int]:
    if not os.path.exists(manifest_path):
        return set()
    rows = (
        spark.read.parquet(manifest_path)
        .where(F.col("stage") == stage)
        .select("bucket")
        .collect()
    )
    return {r["bucket"] for r in rows}


def _manifest_n_buckets(
    spark: SparkSession, manifest_path: str, meta_stage: str
) -> int | None:
    """n_buckets persisted by the first run (manifest `__meta__` row),
    or None if the manifest doesn't exist / predates the meta row."""
    if not os.path.exists(manifest_path):
        return None
    rows = (
        spark.read.parquet(manifest_path)
        .where(F.col("stage") == meta_stage)
        .select("rows")
        .collect()
    )
    return int(rows[0]["rows"]) if rows else None


def run_resumable(
    spark: SparkSession,
    source: DataFrame,
    process_fn,
    out_dir: str,
    *,
    stage: str,
    id_col: str,
    n_buckets: int = 8,
    fail_after: int | None = None,
    stage_input: bool = True,
) -> list[int]:
    """Process `source` bucket-by-bucket with checkpointing.

    For each bucket not yet in the manifest: run process_fn(bucket_df),
    write the result to out_dir/data/bucket=<b>/, then append a
    manifest row (stage, bucket, rows, input_fingerprint). A rerun
    skips completed buckets. `fail_after` aborts after N buckets (test
    hook simulating a mid-job crash).

    stage_input (default): the bucketed source is first written ONCE,
    partitioned by bucket, to out_dir/staged/. The per-bucket loop then
    reads `staged/bucket=<b>` with partition pruning, so total input
    reads are bounded at a constant (~1x source for staging + ~2x the
    staged copy for the fingerprint pass and the processing pass)
    regardless of n_buckets. Without staging, `where(bucket == b)` on
    a hash-derived column cannot prune files and the loop scans the
    FULL source once per bucket — O(n_buckets x input), a non-starter
    at fact scale. stage_input=False remains for sources already
    partitioned/bucketed on the id (Iceberg bucket transform), where
    the filter does prune. The staging write itself is atomic
    (_SUCCESS marker), not resumable: a crash mid-staging redoes only
    the staging pass. On every resume the source is re-checked against
    the staged copy (one narrow scan of each): row count plus an
    all-columns fingerprint (XOR of xxhash64(struct(*cols))), so a
    source whose ids OR payload columns changed is refused with an
    error rather than silently processed against a half-complete
    manifest. n_buckets is persisted in the manifest (a `__meta__`
    row) on the first run and a resume with a different n_buckets is
    refused — a smaller value would otherwise silently skip the
    staged buckets beyond the new range. The staged copy is deleted
    once every bucket is in the manifest.

    Returns the list of buckets processed in THIS run.
    """
    manifest_path = os.path.join(out_dir, "manifest")
    data_dir = os.path.join(out_dir, "data")
    meta_stage = f"__meta__:{stage}"
    done = completed_buckets(spark, manifest_path, stage)
    persisted_n = _manifest_n_buckets(spark, manifest_path, meta_stage)
    if persisted_n is not None and persisted_n != n_buckets:
        raise RuntimeError(
            f"n_buckets mismatch: out_dir {out_dir} was started with "
            f"n_buckets={persisted_n}, resume requested {n_buckets}. "
            "Resuming with a different bucket count would skip or "
            "re-split completed buckets; use the original value or a "
            "fresh out_dir."
        )
    bucketed = with_bucket(source, id_col, n_buckets)
    staged_dir = os.path.join(out_dir, "staged")
    if stage_input and len(done) < n_buckets:
        staged_schema = bucketed.schema
        src_cols = sorted(source.columns)
        if os.path.exists(os.path.join(staged_dir, "_SUCCESS")):
            src_row = bucketed.agg(
                F.count(F.lit(1)).alias("rows"), full_fingerprint_col(src_cols)
            ).collect()[0]
            staged = spark.read.schema(staged_schema).parquet(staged_dir)
            staged_row = staged.agg(
                F.count(F.lit(1)).alias("rows"), full_fingerprint_col(src_cols)
            ).collect()[0]
            if (
                staged_row["rows"] != src_row["rows"]
                or (staged_row["full_fingerprint"] or 0)
                != (src_row["full_fingerprint"] or 0)
            ):
                raise RuntimeError(
                    f"staged input at {staged_dir} does not match the "
                    "current source (fingerprint mismatch: rows "
                    f"{staged_row['rows']} vs {src_row['rows']}, "
                    "all-columns hash differs or counts differ): the "
                    "source changed mid-run. Use a fresh out_dir "
                    "(completed buckets in the manifest came from the "
                    "OLD input)."
                )
        else:
            bucketed.write.mode("overwrite").partitionBy("bucket").parquet(
                staged_dir
            )
        # explicit schema: an empty source stages to zero data files and
        # schema inference would fail on the bare _SUCCESS marker
        bucketed = spark.read.schema(staged_schema).parquet(staged_dir)
    if persisted_n is None:
        # persist n_buckets before any bucket completes, so even a
        # first-run crash leaves the value a resume must match
        spark.createDataFrame(
            [(meta_stage, -1, n_buckets, 0)], MANIFEST_SCHEMA
        ).write.mode("append").parquet(manifest_path)
    processed: list[int] = []
    for b in range(n_buckets):
        if b in done:
            continue
        part = bucketed.where(F.col("bucket") == b).drop("bucket")
        fp_row = part.agg(
            F.count(F.lit(1)).alias("rows"), input_fingerprint_col(id_col)
        ).collect()[0]
        result = process_fn(part)
        result.write.mode("overwrite").parquet(os.path.join(data_dir, f"bucket={b}"))
        mrow = spark.createDataFrame(
            [(stage, b, fp_row["rows"], fp_row["input_fingerprint"] or 0)],
            MANIFEST_SCHEMA,
        )
        mrow.write.mode("append").parquet(manifest_path)
        processed.append(b)
        if fail_after is not None and len(processed) >= fail_after:
            break
    if stage_input and len(done) + len(processed) >= n_buckets:
        # every bucket is in the manifest: the staged working copy has
        # served its purpose — don't leave a full input copy on disk
        import shutil

        shutil.rmtree(staged_dir, ignore_errors=True)
    return processed


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data", "bucket=*"))
