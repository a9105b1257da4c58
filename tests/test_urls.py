"""URL curation operators (functions/urls.py): canonicalization rules,
registrable-domain extraction, URL-level dedup determinism, and the
two-phase per-group cap vs a plain-window oracle.

The reference engine has no URL operators; semantics follow the C4 /
RefinedWeb-style crawl-hygiene conventions documented in the module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pandas_expr_spark.functions import urls


def _norm(spark, raw: str) -> str:
    row = (spark.range(1)
           .select(urls.normalize_url(F.lit(raw)).alias("u"))
           .collect())
    return row[0]["u"]


def _dom(spark, raw: str) -> str:
    row = (spark.range(1)
           .select(urls.extract_domain(F.lit(raw)).alias("d"))
           .collect())
    return row[0]["d"]


@pytest.mark.parametrize("raw,expected", [
    # scheme + host lowering, www strip
    ("HTTPS://WWW.Example.COM/A", "https://example.com/A"),
    # default ports stripped, non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # fragment dropped
    ("https://a.com/x#sec-2", "https://a.com/x"),
    # tracking params stripped, survivors byte-sorted
    ("https://a.com/x?utm_source=t&b=2&a=1", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x?fbclid=abc&gclid=1", "https://a.com/x"),
    ("https://a.com/x?z=9&utm_campaign=c", "https://a.com/x?z=9"),
    # utm_ prefix family, not just the enumerated five
    ("https://a.com/x?utm_id=7&k=v", "https://a.com/x?k=v"),
    # trailing slashes trimmed (root path becomes empty)
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com/x///", "https://a.com/x"),
    # params whose VALUE mentions a tracker name survive
    ("https://a.com/x?q=utm_source", "https://a.com/x?q=utm_source"),
])
def test_normalize_url_rules(spark, raw, expected):
    assert _norm(spark, raw) == expected


@pytest.mark.parametrize("raw,expected", [
    ("https://a.b.Example.com/x", "example.com"),
    ("https://WWW.news.CO.UK/y", "news.co.uk"),
    ("http://deep.sub.shop.net", "shop.net"),
    ("https://x.gov.au/z", "x.gov.au"),
    # bare host (no scheme) accepted
    ("Sub.Blog.org", "blog.org"),
    ("single", "single"),
])
def test_extract_domain(spark, raw, expected):
    assert _dom(spark, raw) == expected


def test_url_dedup_winner_and_count(spark):
    rows = [
        # three URLs canonicalizing to the same https://a.com/x
        (1, "https://WWW.a.com/x?utm_source=t", 100),
        (2, "https://a.com/x/", 300),
        (3, "https://a.com:443/x", 300),   # ties with 2 -> smaller id wins
        (4, "https://b.com/y", 50),
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    out = urls.url_dedup(sdf, prefer_col="n_chars")
    got = {r["norm_url"]: (r["doc_id"], r["url_dup_count"])
           for r in out.collect()}
    assert got == {"https://a.com/x": (2, 3), "https://b.com/y": (4, 1)}


def test_url_dedup_no_prefer_uses_smallest_key(spark):
    rows = [(7, "https://a.com/x"), (3, "https://a.com/x/")]
    sdf = spark.createDataFrame(rows, ["doc_id", "url"])
    out = urls.url_dedup(sdf).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 3 and out[0]["url_dup_count"] == 2


def test_cap_per_group_matches_window_oracle(spark):
    # skewed groups: one mega-group, several small, one under the cap
    rows = ([("big", i) for i in range(2000)]
            + [("mid", i) for i in range(40)]
            + [("tiny", i) for i in range(3)])
    sdf = spark.createDataFrame(rows, ["g", "k"]).repartition(8)
    got = urls.cap_per_group(sdf, 10, "g", "k")
    oracle = spark.sql("""
        SELECT g, k FROM (
          SELECT g, k, ROW_NUMBER() OVER (
              PARTITION BY g ORDER BY md5(CAST(k AS STRING)), k) rn
          FROM {t}) WHERE rn <= 10
    """, t=sdf)
    assert sorted((r["g"], r["k"]) for r in got.collect()) == \
           sorted((r["g"], r["k"]) for r in oracle.collect())
    counts = {r["g"]: r["n"] for r in
              got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "mid": 10, "tiny": 3}


def test_cap_per_group_boundary_bucket_partial(spark):
    # tiny bucket count forces nearly every group through the boundary
    # path; result must still equal the oracle exactly
    rows = [("g%d" % (i % 5), i) for i in range(500)]
    sdf = spark.createDataFrame(rows, ["g", "k"])
    got = urls.cap_per_group(sdf, 7, "g", "k", n_buckets=16)
    oracle = spark.sql("""
        SELECT g, k FROM (
          SELECT g, k, ROW_NUMBER() OVER (
              PARTITION BY g ORDER BY md5(CAST(k AS STRING)), k) rn
          FROM {t}) WHERE rn <= 7
    """, t=sdf)
    assert sorted((r["g"], r["k"]) for r in got.collect()) == \
           sorted((r["g"], r["k"]) for r in oracle.collect())


def test_cap_per_group_mapping_caps(spark):
    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(10)] \
        + [("c", 0)]
    sdf = spark.createDataFrame(rows, ["g", "k"])
    got = urls.cap_per_group(sdf, {"a": 5, "b": 100}, "g", "k")
    counts = {r["g"]: r["n"] for r in
              got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # mapped caps honored; unmapped group dropped
    assert counts == {"a": 5, "b": 10}
    oracle = spark.sql("""
        SELECT g, k FROM (
          SELECT g, k, ROW_NUMBER() OVER (
              PARTITION BY g ORDER BY md5(CAST(k AS STRING)), k) rn
          FROM {t}) WHERE (g = 'a' AND rn <= 5) OR (g = 'b' AND rn <= 100)
    """, t=sdf)
    assert sorted((r["g"], r["k"]) for r in got.collect()) == \
           sorted((r["g"], r["k"]) for r in oracle.collect())


def test_temperature_mix_budget_and_flattening(spark):
    from pandas_expr_spark.functions import curation
    counts = {"big": 10000, "mid": 400, "tiny": 9}
    scale = curation.temperature_scale_for_budget(counts, 0.5, 700)
    caps = curation.temperature_caps(counts, 0.5, scale)
    assert sum(caps.values()) <= 700
    # flattening: big source's keep-RATE far below tiny's
    assert caps["big"] / 10000 < caps["tiny"] / 9
    assert caps["tiny"] <= 9
    rows = [(g, i) for g, n in [("big", 500), ("tiny", 9)]
            for i in range(n)]
    sdf = spark.createDataFrame(rows, ["source", "doc_id"])
    kept = curation.temperature_mix(sdf, alpha=0.5, scale=2.0,
                                    key_col="doc_id")
    got = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["big"] == round(2.0 * 500 ** 0.5)
    assert got["tiny"] == min(9, round(2.0 * 9 ** 0.5))
