"""Image+caption curation composite — the north star's own domain.

BASELINE.json's table IS an image+caption training corpus; this module
chains the engine's multimodal pieces into the curation pass such a
corpus runs before packing: decode -> integer-exact phash64 -> banded
hamming near-dup pairs -> connected-components canonical resolution,
plus a caption gate, into one per-image verdict table (the keep-list
feeds tokenize/pack downstream).

Scale shape: decode is a zero-shuffle Arrow pass (payload bytes never
leave it); pairs shuffle (id, 3 longs); the CC loop shuffles
(node, label) longs; verdict assembly is id-grain broadcast-sized
joins. Nothing corpus-sized shuffles twice, bytes shuffle never.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cityfinder_spark.operators.components import connected_components
from cityfinder_spark.operators.images_ops import decode_stats


def default_id_to_node(c: str = "image_id") -> Column:
    """Long CC node from the structured media id ('img############' /
    'dup############'): 2*i for base rows, 2*i+1 for dup variants —
    deterministic and SQL-replayable (no hash collisions)."""
    num = F.substring(F.col(c), 4, 12).cast("long")
    return F.when(F.col(c).startswith("dup"), num * 2 + 1).otherwise(num * 2)


def curate_image_captions(
    images: DataFrame,
    *,
    max_dist: int = 3,
    min_caption_chars: int = 40,
    id_to_node: Column | None = None,
) -> DataFrame:
    """Per-image curation verdicts over (image_id, bytes, caption):
    (image_id, fmt, is_dup, caption_ok, keep) with keep = not a
    perceptual near-duplicate AND caption passes the length floor.
    Canonical-per-cluster survives (min node id), exactly like text
    dedup_resolve — one curation policy across modalities."""
    from cityfinder_spark.operators.dedup import hamming_pairs

    node = id_to_node if id_to_node is not None else default_id_to_node()
    # one slim post-decode persist: stats feeds BOTH the pair branch
    # and the final fmt join — without it every payload decodes twice
    # (id-grain rows only; bytes are dropped before the persist)
    stats = (
        decode_stats(images.select("image_id", "bytes"))
        .select("image_id", "fmt", "phash")
        .persist()
    )
    pairs = hamming_pairs(
        stats.select("image_id", "phash"),
        max_dist=max_dist,
        bits=64,
        id_col="image_id",
        sig_col="phash",
    )

    labels = connected_components(
        pairs.select(
            default_id_to_node("doc_a").alias("src"),
            default_id_to_node("doc_b").alias("dst"),
        ),
        src="src",
        dst="dst",
    )
    base = images.select(
        "image_id",
        "caption",
        node.alias("node"),
        (F.length("caption") >= F.lit(min_caption_chars)).alias("caption_ok"),
    )
    canon = F.coalesce(F.col("label"), F.col("node"))
    verdict = (
        base.join(
            labels.withColumnRenamed("node", "node_"),
            base["node"] == F.col("node_"),
            "left",
        )
        .withColumn("is_dup", canon != F.col("node"))
        .select("image_id", "is_dup", "caption_ok")
        .withColumn("keep", (~F.col("is_dup")) & F.col("caption_ok"))
    )
    return verdict.join(stats.select("image_id", "fmt"), "image_id").select(
        "image_id", "fmt", "is_dup", "caption_ok", "keep"
    )
