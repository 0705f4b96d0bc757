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
    the staging pass. On every resume the source's global fingerprint
    is re-checked against the staged copy's (one narrow scan of each);
    a mismatch means the source CHANGED under the run — the staged
    copy is refused with an error rather than silently processing
    stale data against a half-complete manifest. The staged copy is
    deleted once every bucket is in the manifest.

    Returns the list of buckets processed in THIS run.
    """
    manifest_path = os.path.join(out_dir, "manifest")
    data_dir = os.path.join(out_dir, "data")
    done = completed_buckets(spark, manifest_path, stage)
    bucketed = with_bucket(source, id_col, n_buckets)
    staged_dir = os.path.join(out_dir, "staged")
    if stage_input and len(done) < n_buckets:
        staged_schema = bucketed.schema
        if os.path.exists(os.path.join(staged_dir, "_SUCCESS")):
            src_fp = (
                bucketed.agg(input_fingerprint_col(id_col)).collect()[0][0] or 0
            )
            staged = spark.read.schema(staged_schema).parquet(staged_dir)
            staged_fp = (
                staged.agg(input_fingerprint_col(id_col)).collect()[0][0] or 0
            )
            if staged_fp != src_fp:
                raise RuntimeError(
                    f"staged input at {staged_dir} does not match the "
                    "current source (fingerprint mismatch): the source "
                    "changed mid-run. Use a fresh out_dir (completed "
                    "buckets in the manifest came from the OLD input)."
                )
        else:
            bucketed.write.mode("overwrite").partitionBy("bucket").parquet(
                staged_dir
            )
        # explicit schema: an empty source stages to zero data files and
        # schema inference would fail on the bare _SUCCESS marker
        bucketed = spark.read.schema(staged_schema).parquet(staged_dir)
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
