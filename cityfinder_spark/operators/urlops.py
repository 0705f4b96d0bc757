"""URL canonicalization, URL-level dedup, and per-domain quotas.

The C4 / RefinedWeb / CCNet curation step the text suite was missing:
crawl corpora are keyed by URL, near-identical fetches differ only in
scheme/www/query-string/fragment noise, and a handful of boilerplate
domains would dominate the token mix unless capped. One operator does
all three:

  1. canonicalize: lowercase, strip scheme + leading `www.`, drop
     query string + fragment, drop a trailing slash — a zero-shuffle
     codegen regexp chain (patterns restricted to the Java-regex/RE2
     agreeing subset, like pii_redact, and the gate value-hashes the
     exact canonical strings so that agreement is itself under test);
  2. URL dedup: the minimal doc_id per canonical URL is canonical —
     detected with ONE lag() window, not a groupBy+join back;
  3. domain quota: at most `quota` canonical docs survive per domain,
     chosen deterministically by the md5 hex of the canonical URL (a
     portable, content-independent coin — identical string in Spark
     and DuckDB — so the surviving set is reproducible and unbiased by
     crawl order).

Scale shape: ONE exchange, hash-partitioned on domain. Both windows
partition by domain (the dedup window orders by canonical URL inside
it — every canonical-URL group lives inside one domain partition), so
Catalyst reuses a single hash exchange with two local sorts. At 100 TB
the domain key is skewed (a mega-domain holds billions of rows), but
the per-row state of both windows is O(1) (lag(1) / running counter)
and rows stream through the sort — no per-key materialization; a
pathological single domain can additionally be pre-capped with the
salted two-phase pattern from operators/skew.py if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Java-regex/RE2-agreeing subset only (each pattern matches at most
# once, so Spark's replace-all == DuckDB's replace-first)
_SCHEME_RE = "^https?://"
_WWW_RE = r"^www\."
_QUERY_FRAG_RE = "[?#].*$"
_TRAILING_SLASH_RE = "/$"
_DOMAIN_RE = "^[^/]+"


def canonicalize_url(col) -> "F.Column":
    """Lowercase; strip scheme, leading www., query+fragment, trailing
    slash. Pure codegen projection (4 regexp_replace + lower)."""
    x = F.lower(col)
    x = F.regexp_replace(x, _SCHEME_RE, "")
    x = F.regexp_replace(x, _WWW_RE, "")
    x = F.regexp_replace(x, _QUERY_FRAG_RE, "")
    return F.regexp_replace(x, _TRAILING_SLASH_RE, "")


def curate_urls(
    docs: DataFrame,
    *,
    quota: int,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Per-doc URL-curation verdicts:
    (doc_id, canon_url, domain, is_dup, domain_rank, keep) with
    keep = first-fetch-of-its-canonical-URL AND within the domain cap.

    is_dup: any row whose canonical URL equals the previous row's in
    (canon_url, doc_id) order within its domain — i.e. everything but
    the min-doc_id fetch. domain_rank: canonical rows first (dups sort
    last so canonical ranks are dense), ordered by the md5 hex of the
    canonical URL then (canon_url, doc_id) — a deterministic portable
    shuffle of the domain's URLs.
    """
    canon = canonicalize_url(F.col(url_col))
    base = docs.select(
        F.col(id_col),
        canon.alias("canon_url"),
        F.regexp_extract(canon, _DOMAIN_RE, 0).alias("domain"),
    )
    w_dup = Window.partitionBy("domain").orderBy("canon_url", id_col)
    with_dup = base.withColumn(
        "is_dup",
        F.coalesce(
            F.lag("canon_url").over(w_dup) == F.col("canon_url"), F.lit(False)
        ),
    )
    w_rank = Window.partitionBy("domain").orderBy(
        "is_dup", F.md5(F.col("canon_url")), "canon_url", id_col
    )
    return with_dup.withColumn(
        "domain_rank", F.row_number().over(w_rank)
    ).withColumn(
        "keep", (~F.col("is_dup")) & (F.col("domain_rank") <= F.lit(quota))
    )
