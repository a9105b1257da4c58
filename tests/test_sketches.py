"""Tests for the mergeable-sketch analytics (``functions/sketches.py``):
exact heavy-hitters, KLL quantiles, theta distinct/intersection, CMS
point counts — each validated against exact computation on small data."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from pandas_expr_spark.sources.tables import load_table
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def events(spark):
    from pandas_expr_spark.sources.tables import load_table
    return load_table(spark, SF_DIR, "events").cache()


def test_top_tokens_matches_exact(docs):
    from pandas_expr_spark.functions import sketches
    from pandas_expr_spark.functions.text import word_tokens
    got = sketches.top_tokens(docs, "text", k=10).collect()
    exact = (docs.select(F.explode(word_tokens("text")).alias("t"))
             .groupBy("t").count()
             .orderBy(F.col("count").desc(), F.col("t").asc())
             .limit(10).collect())
    assert [(r.token, r.n) for r in got] == [(r.t, r["count"]) for r in exact]


def test_top_tokens_plan_is_topk(docs):
    from pandas_expr_spark.functions import sketches
    plan = sketches.top_tokens(docs, "text", k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_kll_quantiles_close_to_exact(docs):
    from pandas_expr_spark.functions import sketches
    got = {r.lang: (r.q50, r.q90)
           for r in sketches.kll_quantiles(docs, "n_chars", [0.5, 0.9],
                                           by="lang").collect()}
    exact = {r.lang: (r.q50, r.q90) for r in docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("q50"),
        F.expr("percentile(n_chars, 0.9)").alias("q90")).collect()}
    for lang, (q50, q90) in exact.items():
        assert got[lang][0] == pytest.approx(q50, rel=0.1)
        assert got[lang][1] == pytest.approx(q90, rel=0.1)


def test_theta_distinct_close_to_exact(events):
    from pandas_expr_spark.functions import sketches
    got = {r.event_type: r.n_distinct
           for r in sketches.theta_distinct(events, "user_id",
                                            by="event_type").collect()}
    exact = {r.event_type: r.n for r in events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")).collect()}
    for k, n in exact.items():
        assert got[k] == pytest.approx(n, rel=0.05)


def test_audience_overlap_vs_exact(events):
    from pandas_expr_spark.functions import sketches
    got = {(r.seg_a, r.seg_b): r.n_overlap
           for r in sketches.audience_overlap(events, "user_id",
                                              "event_type").collect()}
    assert len(got) == 10  # C(5,2) event-type pairs
    ab = next(iter(got))
    exact = (events.filter(F.col("event_type") == ab[0])
             .select("user_id").distinct()
             .intersect(events.filter(F.col("event_type") == ab[1])
                        .select("user_id").distinct()).count())
    assert got[ab] == pytest.approx(exact, rel=0.05)


def test_cms_counts_at_least_exact(docs):
    from pandas_expr_spark.functions import sketches
    from pandas_expr_spark.functions.text import word_tokens
    cands = ["scan", "window", "zzz_absent_token"]
    got = {r.token: r.est_count
           for r in sketches.cms_token_counts(docs, "text", cands).collect()}
    exact = {r.t: r["count"] for r in
             (docs.select(F.explode(word_tokens("text")).alias("t"))
              .filter(F.col("t").isin(cands)).groupBy("t").count().collect())}
    for t in cands:
        e = exact.get(t, 0)
        assert got[t] >= e            # CMS never under-counts
        assert got[t] <= e + int(0.001 * sum(exact.values())) + 1
