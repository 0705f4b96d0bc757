"""URL canonicalization + URL dedup + per-domain quota (operators/urlops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cityfinder_spark.operators.urlops import canonicalize_url, curate_urls


def test_canonicalize_url_forms(spark):
    cases = [
        ("HTTPS://WWW.Site.Ex.Com/P/1/?utm=x&y=2#frag", "site.ex.com/p/1"),
        ("http://site.ex.com/p/1", "site.ex.com/p/1"),
        ("https://site.ex.com/p/1#only-frag", "site.ex.com/p/1"),
        ("site.ex.com/p/1/", "site.ex.com/p/1"),  # schemeless input
        ("https://www.site.ex.com", "site.ex.com"),
        # www only stripped at the START of the host
        ("https://awww.site.ex.com/p", "awww.site.ex.com/p"),
        # only ONE trailing slash is noise; deeper path kept intact
        ("https://site.ex.com/a/b/", "site.ex.com/a/b"),
    ]
    df = spark.createDataFrame(cases, "url string, want string").withColumn(
        "got", canonicalize_url(F.col("url"))
    )
    bad = df.where(F.col("got") != F.col("want")).collect()
    assert not bad, [tuple(r) for r in bad]


def test_curate_urls_dedup_and_quota(spark):
    # domain d1: urls u1 (3 fetches), u2, u3; domain d2: one url
    rows = [
        (1, "https://d1.ex/a"),
        (2, "http://www.d1.ex/a/"),
        (3, "https://d1.ex/a?ref=7"),
        (4, "https://d1.ex/b"),
        (5, "https://d1.ex/c"),
        (6, "https://d2.ex/z#f"),
    ]
    out = curate_urls(
        spark.createDataFrame(rows, "doc_id long, url string"), quota=2
    )
    got = {r.doc_id: r for r in out.collect()}
    assert [got[i].canon_url for i in (1, 2, 3)] == ["d1.ex/a"] * 3
    assert got[1].domain == "d1.ex" and got[6].domain == "d2.ex"
    # min doc_id per canonical URL is the non-dup
    assert not got[1].is_dup and got[2].is_dup and got[3].is_dup
    assert not got[4].is_dup and not got[5].is_dup and not got[6].is_dup
    # quota=2 in d1: exactly 2 of the 3 canonical urls survive;
    # dups never survive regardless of rank
    kept_d1 = [i for i in (1, 2, 3, 4, 5) if got[i].keep]
    assert len(kept_d1) == 2 and all(not got[i].is_dup for i in kept_d1)
    assert got[6].keep
    # canonical rows get the dense low ranks (dups sort last)
    d1_canon_ranks = sorted(got[i].domain_rank for i in (1, 4, 5))
    assert d1_canon_ranks == [1, 2, 3]


def test_curate_urls_single_exchange(spark):
    """Both windows partition by domain -> ONE hash exchange total."""
    df = spark.createDataFrame(
        [(i, f"https://d{i % 3}.ex/p/{i % 5}") for i in range(100)],
        "doc_id long, url string",
    )
    plan = curate_urls(df, quota=3)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning") == 1, plan
