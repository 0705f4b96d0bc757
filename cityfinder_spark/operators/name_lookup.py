"""City-by-name lookup: exact inverted-index join + fuzzy Levenshtein
fallback.

Reimplements the reference's NameFinder (lib/finder/name/name.go:56-75):
  * build: every city indexed under its primary name AND each alternate
    name (name.go:43-53 appends Name to AltNames and indexes each);
    duplicates per (country, name) keep insertion order -> our
    monotonic city_id column (J6).
  * exact: InvertedIndex[country][name] -> cities[0], i.e. lowest
    city_id among duplicates (J2; name.go:60-62). Country codes are
    uppercased at the boundary (routes.go:49, P5).
  * fuzzy: on exact miss, BK-tree search radius 2 then first candidate
    present in the queried country's index (J3; name.go:64-72 +
    util/util.go:99-137). The BK-tree is purely a pruning structure —
    the semantics are "any indexed name within Levenshtein distance
    <= 2". Reference candidate ORDER is BK-tree-traversal-dependent
    (SURVEY §7.3); we standardize the documented deterministic
    tie-break: (edit distance, name asc, city_id).

Spark plan: the name dictionary is the small broadcast side; exact
lookup is a broadcast equi-join on (country, name); fuzzy is a
broadcast join on country pruned by the length-difference bound
(|len(a)-len(b)| <= k is implied by lev(a,b) <= k — replaces the
BK-tree triangle-inequality prune, SURVEY §4) + exact levenshtein.
The first-match resolution is a min(struct) aggregation keyed by the
unique query id — map-side combinable, so the only shuffled data is
one best-candidate row per matched query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cityfinder_spark.bcast import memo_broadcast


def build_name_index(cities: DataFrame) -> DataFrame:
    """Exploded-name dictionary: one row per (country, name, city).

    cities: city_id, name, lat, lon, country [, alt_names array<string>].
    """
    cols = set(cities.columns)
    names = (
        F.array_union(F.array(F.col("name")), F.col("alt_names"))
        if "alt_names" in cols
        else F.array(F.col("name"))
    )
    return (
        cities.withColumn("__names", names)
        .select(
            F.col("city_id").cast("long").alias("city_id"),
            F.col("name").alias("primary_name"),
            F.col("lat").cast("double").alias("c_lat"),
            F.col("lon").cast("double").alias("c_lon"),
            F.upper(F.col("country")).alias("c_country"),
            F.explode("__names").alias("indexed_name"),
        )
        .where(F.col("indexed_name").isNotNull() & (F.col("indexed_name") != ""))
        .dropDuplicates(["c_country", "indexed_name", "city_id"])
    )


def city_by_name(
    queries: DataFrame,
    cities: DataFrame,
    *,
    fuzzy: bool = True,
    max_dist: int = 2,
    id_col: str = "q_id",
    name_col: str = "q_name",
    country_col: str = "q_country",
    fuzzy_strategy: str = "symspell",
    cache_key: tuple | None = None,
) -> DataFrame:
    """queries + (city_id, name, c_lat, c_lon, match_type, edit_dist).

    match_type in ('exact', 'fuzzy', NULL-on-miss). Exact hits resolve
    to the lowest city_id (reference first-match). Fuzzy hits resolve
    by (edit distance, indexed name asc, city_id).

    fuzzy_strategy picks the candidate-resolution physical plan (all
    three produce identical rows, parity-tested):
      * "symspell" (default): relational deletion-neighborhood
        equi-join — explode both sides into <= max_dist deletion
        variants, equi-join, verify Levenshtein on collisions only.
        Fastest measured at sf0.1 (~7s vs ~11s scan / ~9s arrow
        warm) and fully JVM-side.
      * "scan": per-country broadcast join + codegen'd Levenshtein
        over |keys| x |dict/country| pairs — simplest plan, best when
        the per-country dictionary is tiny.
      * "arrow": the first-match dictionary resolves every distinct
        key in ONE mapInPandas pass (exact hash probe, then SymSpell
        variant probe + integer Levenshtein verify) against a
        per-worker NameIndex — this IS the reference's in-process
        structure (inverted index + BK-tree as pruning map,
        name.go:14-18). Loses to symspell here only because each call
        rebuilds the worker indexes; wins when the same dictionary
        serves many queries per process.
    """
    index = build_name_index(cities)
    q_all = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(name_col).alias("q_name"),
        F.upper(F.col(country_col)).alias("q_country"),
    )
    # resolution is a pure function of (name, country): dedupe the key
    # space before the expensive fuzzy scan and join answers back —
    # real lookup workloads repeat keys heavily, so the Levenshtein
    # work scales with |distinct keys|, not |rows|. The explicit
    # repartition pins the fan-out stage's parallelism: AQE would
    # coalesce the small distinct output to ~1 partition and the
    # ~|dictionary/country| per-key expansion would run single-threaded.
    q = (
        q_all.select("q_name", "q_country")
        .distinct()
        .repartition(q_all.sparkSession.sparkContext.defaultParallelism)
    )

    # First-match representative per (country, indexed name): the city
    # with the lowest city_id and its payload. Both exact (J2) and
    # fuzzy (J3) resolution end at "lowest city_id for the chosen
    # name", so candidate matching can run on the DISTINCT name
    # dictionary (exactly the structure of the reference: the BK-tree
    # holds distinct names, resolution goes through the inverted
    # index — name.go:64-72).
    reps = F.broadcast(
        index.groupBy("c_country", "indexed_name").agg(
            F.min(
                F.struct(
                    F.col("city_id").alias("city_id"),
                    F.col("primary_name").alias("name"),
                    F.col("c_lat").alias("c_lat"),
                    F.col("c_lon").alias("c_lon"),
                )
            ).alias("rep")
        )
    )

    if fuzzy_strategy == "arrow":
        return _resolve_arrow(q_all, reps, fuzzy, max_dist, cache_key)

    # exact branch: broadcast equi-join on (country, name), rank 0
    exact = q.join(
        reps.withColumnRenamed("indexed_name", "__nm"),
        (q["q_country"] == F.col("c_country")) & (q["q_name"] == F.col("__nm")),
        "inner",
    ).select(
        "q_name", "q_country",
        F.col("__nm").alias("__match_name"),
        F.lit(0).alias("__rank"),
        F.lit(0).alias("__ed"),
    )
    cand = exact
    # NOTE: fuzzy candidates are computed for ALL keys, not only exact
    # misses (the reference's two-phase order, name.go:56-72) — output
    # is identical (an exact hit at rank 0 beats any fuzzy candidate in
    # the min-struct below), and restricting to misses via an anti-join
    # measured ~20% SLOWER on mutation-heavy workloads (the anti-join
    # exchange outweighs the pruned neighborhood work).

    if fuzzy and fuzzy_strategy == "scan":
        # per-country scan of the DISTINCT dictionary: one broadcast
        # hash join on country + inline codegen'd length-prune and
        # Levenshtein — |Q| x |distinct names per country| pairs, all
        # map-side, no extra shuffle. With city-name dictionaries the
        # distinct-per-country fan-out is small (GeoNames: O(10^4));
        # use fuzzy_strategy="symspell" when the dictionary is large
        # and diverse.
        lev = F.levenshtein(q["q_name"], F.col("indexed_name"))
        fuzzy_cand = (
            q.join(reps, q["q_country"] == reps["c_country"], "inner")
            .where(
                (
                    F.abs(F.length(q["q_name"]) - F.length(F.col("indexed_name")))
                    <= max_dist
                )
                & (lev <= max_dist)
            )
            .select(
                "q_name", "q_country",
                F.col("indexed_name").alias("__match_name"),
                F.lit(1).alias("__rank"),
                lev.cast("int").alias("__ed"),
            )
        )
        cand = cand.unionByName(fuzzy_cand)
    elif fuzzy:
        # SymSpell-style deletion-neighborhood join: if lev(a,b) <= d
        # then some string reachable by <= d deletions from each is
        # shared (every edit op removes <= 1 char from each side's
        # alignment). Explode BOTH sides into their <= max_dist
        # deletion variants, equi-join on (country, variant), verify
        # the exact Levenshtein only on collisions — candidate pairs
        # drop from |Q| x |dict/country| to a handful per query when
        # the dictionary is diverse. This replaces the BK-tree
        # triangle-inequality prune (SURVEY §4) with a shuffle-free,
        # broadcast-joinable equivalent.
        # (Variant count is ~1 + L + L^2/2 per string of length L —
        # fine for city-name-length strings; for very long keys the
        # scan strategy bounds it.)
        def dels(col: F.Column) -> F.Column:
            d1 = F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(col, F.lit(1), i - 1),
                    F.substring(col, i + 1, F.length(col)),
                ),
            )
            if max_dist < 1:
                return F.array(col)
            if max_dist < 2:
                return F.array_distinct(F.concat(F.array(col), d1))
            d2 = F.flatten(
                F.transform(
                    d1,
                    lambda s: F.transform(
                        F.sequence(F.lit(1), F.length(s)),
                        lambda i: F.concat(
                            F.substring(s, F.lit(1), i - 1),
                            F.substring(s, i + 1, F.length(s)),
                        ),
                    ),
                )
            )
            return F.array_distinct(F.concat(F.array(col), d1, d2))

        dict_vars = F.broadcast(
            reps.select(
                "c_country",
                "indexed_name",
                F.explode(dels(F.col("indexed_name"))).alias("__var"),
            )
        )
        q_vars = q.select(
            "q_name", "q_country",
            F.explode(dels(F.col("q_name"))).alias("__var"),
        )
        lev = F.levenshtein(F.col("q_name"), F.col("indexed_name"))
        fuzzy_cand = (
            q_vars.join(
                dict_vars,
                (q_vars["q_country"] == dict_vars["c_country"])
                & (q_vars["__var"] == dict_vars["__var"]),
                "inner",
            )
            # collisions repeat per shared variant; dedup BEFORE the
            # Levenshtein so each (query, name) pair is verified once
            .select("q_name", "q_country", "indexed_name")
            .dropDuplicates(["q_name", "q_country", "indexed_name"])
            .withColumn("__ed", lev.cast("int"))
            .where(F.col("__ed") <= max_dist)
            .select(
                "q_name", "q_country",
                F.col("indexed_name").alias("__match_name"),
                F.lit(1).alias("__rank"),
                "__ed",
            )
        )
        cand = cand.unionByName(fuzzy_cand)

    # one map-side-combinable min(struct) per distinct key; field order
    # IS the tie-break: exact (rank 0) beats fuzzy, then edit distance,
    # then name asc (J3's documented deterministic ordering)
    best = cand.groupBy("q_name", "q_country").agg(
        F.min(
            F.struct(
                F.col("__rank").alias("rank"),
                F.col("__ed").alias("edit_dist"),
                F.col("__match_name").alias("indexed_name"),
            )
        ).alias("__best")
    )
    b = F.col("__best")
    resolved = (
        # no broadcast hint: |best| is bounded by the distinct-key space,
        # which can be large for adversarial inputs — AQE promotes the
        # join to broadcast at runtime when it is actually small.
        q_all.join(best, ["q_name", "q_country"], "left")
        .join(
            reps,
            (F.col("q_country") == reps["c_country"])
            & (b["indexed_name"] == reps["indexed_name"]),
            "left",
        )
    )
    r = F.col("rep")
    return resolved.select(
        "q_id", "q_name", "q_country",
        r["city_id"].alias("city_id"),
        r["name"].alias("name"),
        r["c_lat"].alias("c_lat"),
        r["c_lon"].alias("c_lon"),
        F.when(b["rank"] == 0, "exact")
        .when(b["rank"] == 1, "fuzzy")
        .alias("match_type"),
        b["edit_dist"].alias("edit_dist"),
    )


# per-worker-process memo of the built NameIndex (workers run one task
# at a time; the cache is keyed by the operator invocation's token and
# cleared on a new token so stale indexes don't accumulate)
_WORKER_INDEX_CACHE: dict[str, "NameIndex"] = {}


def _deletion_variants(s: str, max_dist: int) -> set[str]:
    """All strings reachable from s by <= max_dist single-char
    deletions (including s itself) — the SymSpell neighborhood."""
    out = {s}
    frontier = {s}
    for _ in range(max_dist):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _levenshtein(a: str, b: str) -> int:
    """Plain integer Levenshtein (insert/delete/substitute, unit
    costs) — identical to Spark's F.levenshtein and DuckDB's
    levenshtein() on these inputs; integer DP, so no parity risk."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _lev_batch(qs: list[str], cs: list[str]) -> np.ndarray:
    """Vectorized Levenshtein over parallel string lists (one distance
    per (qs[i], cs[i]) pair): classic DP with the row loop unrolled
    across ALL pairs as numpy vector ops — ~30x the throughput of a
    per-pair Python DP on city-name-length strings. Padded positions
    use codepoint 0 (never equal to a real char); the answer is
    gathered at each pair's true (len_a, len_b) cell, so padding rows
    never affect results."""
    n = len(qs)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    # single C-level str -> padded codepoint matrix conversion (a
    # per-row encode() loop here was the kernel's hot spot)
    Aq = np.asarray(qs, dtype="U")
    Bq = np.asarray(cs, dtype="U")
    La = Aq.dtype.itemsize // 4
    Lb = Bq.dtype.itemsize // 4
    A = (
        Aq.view(np.uint32).reshape(n, La)
        if La
        else np.zeros((n, 1), dtype=np.uint32)
    )
    B = (
        Bq.view(np.uint32).reshape(n, Lb)
        if Lb
        else np.zeros((n, 1), dtype=np.uint32)
    )
    la = (A != 0).sum(axis=1)
    lb = (B != 0).sum(axis=1)
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    idx = np.arange(n)
    ans = prev[idx, lb]  # rows with len(q) == 0
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        # gather each pair's answer at its true (len_a, len_b) cell as
        # its row completes (keeping all La+1 row arrays and stacking
        # at the end measured 2.5s on this allocator for a 15 MB stack)
        sel = la == i
        if sel.any():
            ans[sel] = cur[sel, lb[sel]]
        prev = cur
    return ans.astype(np.int32)


class NameIndex:
    """Driver-built broadcast name dictionary: first-match payload per
    (country, indexed name) + SymSpell deletion-neighborhood map —
    the Spark analog of the reference's InvertedIndex + BK-tree pair
    (lib/finder/name/name.go:14-18; the BK-tree is only a pruning
    structure, replaced here by the deletion map)."""

    # resolution-memo bound: the memo is per (worker process, dictionary
    # token) and keyed by distinct (country, name) queries; real lookup
    # workloads repeat keys heavily, so it saturates at the distinct key
    # space. The cap only guards adversarial unbounded key streams.
    MEMO_CAP = 1 << 20

    def __init__(self, rows: list[tuple], max_dist: int):
        # rows: (c_country, indexed_name, city_id, name, c_lat, c_lon)
        self.max_dist = max_dist
        self.exact: dict[tuple[str, str], tuple] = {}
        self.variants: dict[tuple[str, str], list[str]] = {}
        self.memo: dict[tuple[str, str], tuple | None] = {}
        for country, iname, city_id, name, lat, lon in rows:
            self.exact[(country, iname)] = (city_id, name, lat, lon)
        for country, iname in self.exact:
            for v in _deletion_variants(iname, max_dist):
                self.variants.setdefault((country, v), []).append(iname)

    def resolve(self, q_name: str, q_country: str, fuzzy: bool):
        """-> (city_id, name, lat, lon, match_type, edit_dist) or None.
        Tie-break identical to the relational min(struct): exact beats
        fuzzy, then edit distance, then indexed name ascending."""
        hit = self.exact.get((q_country, q_name))
        if hit is not None:
            return (*hit, "exact", 0)
        if not fuzzy or q_name is None:
            return None
        cands: set[str] = set()
        for v in _deletion_variants(q_name, self.max_dist):
            cands.update(self.variants.get((q_country, v), ()))
        best = None
        for iname in cands:
            ed = _levenshtein(q_name, iname)
            if ed <= self.max_dist and (best is None or (ed, iname) < best):
                best = (ed, iname)
        if best is None:
            return None
        ed, iname = best
        return (*self.exact[(q_country, iname)], "fuzzy", ed)

    def resolve_batch(self, names, countries, fuzzy: bool) -> list:
        """Batch compact resolve: one (city_id, rank, edit_dist)-or-None
        per input pair. Exact and memoized keys are dict hits; all
        remaining fuzzy verifications across the batch run through ONE
        vectorized _lev_batch call (the per-pair Python DP was the hot
        spot: ~1.3ms per miss, ~30x slower than the batched kernel).
        Tie-break identical to resolve(): edit distance, then indexed
        name ascending."""
        out = [None] * len(names)
        pend_i: list[int] = []
        pend_k: list[tuple] = []
        for i, (nm, co) in enumerate(zip(names, countries)):
            hit = self.exact.get((co, nm))
            if hit is not None:
                out[i] = (hit[0], 0, 0)
                continue
            if not fuzzy or nm is None:
                continue
            k = (co, nm)
            try:
                out[i] = self.memo[k]
            except KeyError:
                pend_i.append(i)
                pend_k.append(k)
        if not pend_k:
            return out
        keys = list(dict.fromkeys(pend_k))
        # distinct (query name, candidate name) pairs only: the same
        # dictionary names recur across countries, so verifying per
        # (country, key) would re-run identical DPs ~|countries| times
        pair_pos: dict[tuple[str, str], int] = {}
        cand_lists: list[tuple[list[str], list[int]]] = []
        for co, nm in keys:
            cands: set[str] = set()
            for v in _deletion_variants(nm, self.max_dist):
                cands.update(self.variants.get((co, v), ()))
            cl = list(cands)  # min((ed, name)) is order-independent
            cand_lists.append(
                (cl, [pair_pos.setdefault((nm, c), len(pair_pos)) for c in cl])
            )
        eds = _lev_batch(
            [p[0] for p in pair_pos], [p[1] for p in pair_pos]
        ).tolist()
        if len(self.memo) + len(keys) >= self.MEMO_CAP:
            self.memo.clear()
        for k, (cl, pids) in zip(keys, cand_lists):
            best = None
            for c, pid in zip(cl, pids):
                ed = eds[pid]
                if ed <= self.max_dist and (best is None or (ed, c) < best):
                    best = (ed, c)
            self.memo[k] = (
                None
                if best is None
                else (self.exact[(k[0], best[1])][0], 1, best[0])
            )
        for i, k in zip(pend_i, pend_k):
            out[i] = self.memo[k]
        return out


def _resolve_arrow(
    q_all: DataFrame,
    reps: DataFrame,
    fuzzy: bool,
    max_dist: int,
    cache_key: tuple | None = None,
) -> DataFrame:
    """Direct probe of every query row against the broadcast NameIndex
    via a SCALAR pandas UDF — zero shuffles. The dictionary build is a
    Spark aggregation (first-match reps), then a driver collect — the
    build-once gob-cache analog (SURVEY §1.3); with a cache_key,
    collect + broadcast happen once per context (bcast.memo_broadcast)
    and the stable token keeps each worker's built NameIndex AND its
    resolution memo hot across queries — steady state is a dict probe
    per repeated key.

    Plan shape vs the previous distinct+mapInPandas+join-back: real
    lookup keys repeat heavily, so per-worker memoization bounds the
    Levenshtein work at |distinct keys seen by this worker| while
    eliminating the distinct exchange, the repartition, AND the
    join-back exchange (measured 5.0s -> see bench; the three
    exchanges dominated, not the probe). ArrowEvalPython ships ONLY
    (q_name, q_country); the UDF returns primitives (city_id, rank,
    edit_dist) and the string payload is attached by a JVM broadcast
    hash join on city_id — no Python string results in the hot path
    (same shape as nearest_arrow's solve UDF)."""

    def build() -> tuple:
        rep_rows = [
            (r["c_country"], r["indexed_name"], r["rep"]["city_id"],
             r["rep"]["name"], r["rep"]["c_lat"], r["rep"]["c_lon"])
            for r in reps.collect()
        ]
        # Broadcast the COMPACT rep rows, not the built index: the
        # variant map pickles ~10x larger than its inputs, and PySpark
        # workers fetch broadcast payloads serially — a multi-MB pickle
        # costs each of N workers its queue position (measured: 4s mean
        # wait at 32 workers for a 5.5 MB index vs ~0.1s for the raw
        # rows). Each worker builds the index once, in parallel,
        # memoized by token.
        token = (
            f"nameidx-{key}" if key is not None
            else f"nameidx-{id(rep_rows)}-{len(rep_rows)}-{max_dist}"
        )
        return (token, rep_rows, max_dist)

    key = None if cache_key is None else ("nameidx", *cache_key, max_dist)
    _, bc = memo_broadcast(q_all.sparkSession, key, build)

    result_type = T.StructType(
        [
            T.StructField("city_id", T.LongType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("edit_dist", T.IntegerType()),
        ]
    )

    @F.pandas_udf(result_type)
    def probe(name_s: pd.Series, country_s: pd.Series) -> pd.DataFrame:
        # Resolve the worker cache THROUGH the module at call time:
        # this probe is a dynamic (nested) function, so cloudpickle
        # ships referenced module-level plain objects (the cache dict)
        # BY VALUE — a direct closure reference would hand every task
        # a fresh empty copy and silently defeat the across-task
        # memoization (classes/functions pickle by reference; dicts
        # don't). Measured: the index rebuilt in every task of every
        # run, ~0.8s x 32 workers per query.
        from cityfinder_spark.operators import name_lookup as _nl

        tok, rows_in, md = bc.value
        cache = _nl._WORKER_INDEX_CACHE
        idx = cache.get(tok)
        if idx is None:
            idx = _nl.NameIndex(rows_in, md)
            cache.clear()
            cache[tok] = idx
        out = idx.resolve_batch(list(name_s), list(country_s), fuzzy)
        return pd.DataFrame(
            [(None, None, None) if r is None else r for r in out],
            columns=["city_id", "rank", "edit_dist"],
        ).astype({"city_id": "Int64", "rank": "Int32", "edit_dist": "Int32"})

    # distinct city payload for the JVM-side attach: city_id uniquely
    # determines (primary name, lat, lon) in the exploded dictionary.
    # Built from the ALREADY-COLLECTED broadcast rows, not from `reps`:
    # deriving it relationally re-ran the whole dictionary aggregation
    # subtree (explode + sort-aggregates, ~0.85s at sf0.1) on every
    # query; a local-relation payload is free and memoized with the
    # same key.
    def build_payload() -> DataFrame:
        _, rows_in, _ = bc.value
        seen: dict = {}
        for _co, _nm, cid, name, lat, lon in rows_in:
            seen.setdefault(cid, (name, lat, lon))
        return q_all.sparkSession.createDataFrame(
            [(cid, n, la, lo) for cid, (n, la, lo) in seen.items()],
            "city_id long, name string, c_lat double, c_lon double",
        )

    from cityfinder_spark.bcast import memo_table

    payload = F.broadcast(
        memo_table(
            q_all.sparkSession,
            None if key is None else ("namepayload", *key),
            build_payload,
        )
    )
    r = F.col("__r")
    probed = q_all.withColumn(
        "__r", probe(F.col("q_name"), F.col("q_country"))
    ).select(
        "q_id", "q_name", "q_country",
        r["city_id"].alias("city_id"),
        F.when(r["rank"] == 0, "exact")
        .when(r["rank"] == 1, "fuzzy")
        .alias("match_type"),
        r["edit_dist"].cast("int").alias("edit_dist"),
    )
    return probed.join(payload, "city_id", "left").select(
        "q_id", "q_name", "q_country",
        "city_id", "name", "c_lat", "c_lon", "match_type", "edit_dist",
    )
