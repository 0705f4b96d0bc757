#!/usr/bin/env python
"""Regression-track BPE training/segmentation in the MERGE dimension.

Round-4's demerit: the relational trainer pays ~2 Spark jobs per
merge — corpus-size-independent but merge-count-LINEAR, so a realistic
32k-merge vocabulary costs hours of pure job overhead. Round 5 added
the count-guarded driver heap trainer and the broadcast-merge-table
Arrow segmenter (operators/bpe.py); this script records the evidence
(VERDICT r4 task #1 done-criterion: "minutes-not-hours at
n_merges >= 1000"):

  * driver trainer at n_merges = 1000 and 4000 — wall-timed end to
    end including the one corpus exchange. The sf0.1 documents table
    has only 31 distinct words (synthetic text), which exhausts BPE
    at ~107 merges; a merge-dimension bench needs a real vocabulary,
    so the input is a DETERMINISTIC synthetic corpus (no RNG): 400k
    docs x 40 words drawn from a 60k-word cube-skewed (Zipf-ish)
    vocabulary of 6-14-char base-26 spellings — thousands of
    learnable merges, word-frequency table ~60k rows (the state that
    crosses the driver under the BPE_MAX_DRIVER_WORDS guard);
  * broadcast segmenter applying the FULL learned table in one Arrow
    pass over the distinct-word table + one corpus join;
  * the relational path timed at n_merges = 8 (the oracle shape) on
    the SAME corpus to expose the per-merge job cost the fast path
    removes, plus its extrapolation to the same merge counts.

Writes BENCH/bpe_scale.json.

Usage: PYTHONPATH=/root/repo python scripts/bpe_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(_HERE, "BENCH", "bpe_scale.json")


def main() -> None:
    from cityfinder_spark.operators.bpe import bpe_segment, bpe_train
    from cityfinder_spark.session import get_spark

    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bpe-scale", cores=cpus, shuffle_partitions=cpus)

    # deterministic large-vocab corpus (see module docstring): word id
    # w = floor(V * u^3) for u = splitmix-style hash of (doc, pos) in
    # [0,1) — cube skew gives a Zipf-ish frequency curve; spelling =
    # 6-14 lowercase letters from base-26 digits of a second hash.
    n_docs, words_per_doc, vocab = 400_000, 40, 60_000
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"""
                concat_ws(' ', transform(
                  transform(sequence(1, {words_per_doc}),
                    p -> cast({vocab} * pow(
                      (abs(xxhash64(id * 1000003 + p)) % 1000000) / 1000000.0d,
                      3) AS long)),
                  w -> concat_ws('', transform(
                    sequence(1, 6 + cast(abs(xxhash64(w + 7)) % 9 AS int)),
                    i -> chr(97 + cast(abs(xxhash64(w * 31 + i)) % 26 AS int))))))
                """
            ).alias("text"),
        )
        .persist()
    )
    n_docs = docs.count()

    result: dict = {
        "metric": "BPE merge-dimension scaling (driver trainer + broadcast segmenter)",
        "corpus": f"deterministic synthetic, {n_docs} docs x {words_per_doc} words, vocab {vocab}",
        "cpus": cpus,
        "runs": [],
    }

    # relational baseline at the oracle's 8 merges -> sec/merge
    t0 = time.perf_counter()
    rel = bpe_train(docs, n_merges=8, strategy="relational")
    n_rel = rel.count()
    rel_wall = time.perf_counter() - t0
    sec_per_merge = rel_wall / max(n_rel, 1)
    result["relational_8_merges_sec"] = round(rel_wall, 2)
    result["relational_sec_per_merge"] = round(sec_per_merge, 3)

    merges_big: list = []
    for n_merges in (1000, 4000):
        t0 = time.perf_counter()
        table = bpe_train(docs, n_merges=n_merges, strategy="driver")
        rows = [(r.lhs, r.rhs) for r in table.orderBy("merge_rank").collect()]
        wall = round(time.perf_counter() - t0, 2)
        result["runs"].append(
            {
                "n_merges_requested": n_merges,
                "n_merges_learned": len(rows),
                "driver_train_sec": wall,
                "relational_extrapolation_sec": round(
                    sec_per_merge * n_merges, 1
                ),
            }
        )
        merges_big = rows
        print(f"train {n_merges}: {wall}s ({len(rows)} learned)", file=sys.stderr)

    # broadcast segmenter with the full learned table, one Arrow pass
    t0 = time.perf_counter()
    seg = bpe_segment(docs, merges_big, strategy="broadcast")
    n_tokens = seg.count()
    seg_wall = round(time.perf_counter() - t0, 2)
    result["segment_broadcast_sec"] = seg_wall
    result["segment_n_merges"] = len(merges_big)
    result["segment_output_tokens"] = n_tokens
    result["segment_relational_extrapolation_sec"] = round(
        sec_per_merge * len(merges_big), 1
    )
    print(f"segment {len(merges_big)} merges: {seg_wall}s", file=sys.stderr)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
