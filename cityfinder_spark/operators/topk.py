"""Per-group exact top-k without a group-parallel window bottleneck.

The naive plan — row_number() OVER (PARTITION BY group ORDER BY ...)
then rank <= k — shuffles EVERY row and caps parallelism at the
number of groups: with a handful of sources over 10^12 documents,
that is a few tasks each sorting ~10^11 rows. This operator uses the
two-phase shape instead:

  1. LOCAL top-k per (partition, group) inside one mapInPandas pass —
     zero shuffle, full scan parallelism, each task emits at most
     k x |groups| rows;
  2. GLOBAL top-k per group over the <= k x |groups| x n_partitions
     surviving rows — a dimension-sized exchange.

Exactness: the final top-k of a union is the top-k of the per-part
top-k's (any row outside its partition's local top-k is dominated by
k better rows that also reached the merge). Ordering is (score desc,
id asc) on an already-rounded score, so ties are deterministic and
the result equals the naive window plan row-for-row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def group_topk(
    df: DataFrame,
    k: int,
    group_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """-> (group_col, rank, id_col, score_col): the k best rows per
    group by (score desc, id asc). Requires a deterministic score
    (round it first) and unique ids within a group."""

    def local_topk(batches):
        acc: list[pd.DataFrame] = []
        for pdf in batches:
            if len(pdf):
                acc.append(pdf)
        if not acc:
            return
        allp = pd.concat(acc, ignore_index=True)
        allp = allp.sort_values(
            [group_col, score_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        yield allp.groupby(group_col, sort=False).head(k)

    cols = df.select(group_col, score_col, id_col)
    partial = cols.mapInPandas(local_topk, schema=cols.schema)
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, "rank", id_col, score_col)
    )
