"""Connected components over dup-pair graphs: dedup RESOLUTION.

The dedup operators (dedup.py, similarity.py) emit candidate PAIRS;
an actual pipeline must then pick one canonical document per duplicate
cluster and drop the rest. Pairs form a graph whose connected
components are the clusters; the canonical member is the minimum id
(deterministic, order-independent).

Spark-first algorithm: iterative min-label propagation —
    label(v) <- min(label(v), min over neighbors' label)
repeated to fixpoint. Each round is one join + one map-side-combinable
min aggregation; rounds needed = graph diameter (dup clusters are
near-cliques, so 2-3 rounds in practice). This is the standard
MapReduce-CC shape (Kiveris et al. "Connected Components in MapReduce
and Beyond" simplifies to exactly this for small-diameter graphs).

Scale notes:
  * `localCheckpoint` truncates lineage each round — without it the
    plan doubles per iteration and the driver re-optimizes an
    exponentially growing tree (on a cluster, use a checkpoint dir +
    `checkpoint` for fault tolerance; the loop structure is the same).
  * Each round shuffles only (node, label) longs — never document
    payloads.
  * The convergence check (count of changed labels) piggybacks on the
    round's aggregation; no extra pass over the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, label) with label = min node id in the component.

    Nodes are every id appearing in `edges`; isolated nodes (absent
    from edges) are their own component by definition and need no rows
    here — callers coalesce(label, id) after a left join.
    """
    und = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    und = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()

    for _ in range(max_iter):
        nbr = und.join(labels, und["v"] == labels["node"], "inner").select(
            F.col("u").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_resolve(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Canonical assignment per document from duplicate pairs:
    (doc_id, canonical_id, is_dup). Documents outside any pair are
    their own canonical. The keep-list is `where(~is_dup)`."""
    labels = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("canonical_id"),
            (F.coalesce("label", "doc_id") != F.col("doc_id")).alias("is_dup"),
        )
    )
