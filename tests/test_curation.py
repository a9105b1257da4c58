"""Curation operators: Gopher rule filters, logistic quality score,
token-budget source mixing, SemDeDup semantic dedup."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_expr_spark.functions import curation, clustering


def test_gopher_rules_flags(spark):
    good = " ".join(["the quick brown fox jumps over that lazy dog and"] * 6)
    rows = [
        (0, good),                                   # 60 words, all rules pass
        (1, "short text"),                           # fails word count
        (2, " ".join(["####"] * 60)),                # fails symbol + alpha + stop
        (3, " ".join(["a"] * 60)),                   # fails mean length
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           sdf.select("doc_id", *curation.gopher_rules("text")).collect()}
    assert out[0]["passes_gopher"] and out[0]["n_words"] == 60
    assert not out[1]["r_word_count"] and not out[1]["passes_gopher"]
    assert not out[2]["r_symbol"] and not out[2]["r_alpha"] \
        and not out[2]["r_stopwords"]
    assert not out[3]["r_mean_len"]
    assert out[3]["mean_word_len"] == 1.0


def test_quality_logit_matches_formula(spark):
    text = "the cat sat on the mat with a hat 123"
    sdf = spark.createDataFrame([(text,)], ["text"])
    got = sdf.select(curation.quality_logit("text").alias("q")).first()["q"]
    toks = text.split()
    stop = sum(t in ["the", "a", "of", "to", "and", "is", "in", "it",
                     "that", "for"] for t in toks) / len(toks)
    punct = sum(not (c.isalnum() or c.isspace()) for c in text) / len(text)
    digit = sum(c.isdigit() for c in text) / len(text)
    mean_len = sum(len(t) for t in toks) / len(toks)
    z = (-1.0 + 6.0 * stop - 8.0 * punct - 4.0 * digit
         - 0.5 * abs(mean_len - 5.5) + 0.25 * math.log1p(len(text)))
    assert got == pytest.approx(1.0 / (1.0 + math.exp(-z)), abs=1e-12)


def _emulate_budget(pdf: pd.DataFrame, budget: int) -> set[int]:
    """Greedy prefix per source in (bucket, md5, id) order."""
    import hashlib
    pdf = pdf.copy()
    pdf["h"] = pdf["doc_id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest())
    pdf["b"] = pdf["h"].map(lambda h: int(h[:8], 16) % 1024)
    keep = set()
    for _, grp in pdf.groupby("source"):
        run = 0
        for _, row in grp.sort_values(["b", "h", "doc_id"]).iterrows():
            run += row["tok"]
            if run > budget:
                break
            keep.add(row["doc_id"])
    return keep


@pytest.mark.parametrize("budget", [0, 37, 500, 10**9])
def test_budget_sample_matches_greedy_prefix(spark, budget):
    pdf = pd.DataFrame({
        "doc_id": range(300),
        "source": [f"s{i % 3}" for i in range(300)],
        "tok": [(i * 7919) % 40 + 1 for i in range(300)],
    })
    sdf = spark.createDataFrame(pdf)
    got = {r["doc_id"] for r in
           curation.budget_sample(sdf, budget, token_col="tok",
                                  key_col="doc_id").collect()}
    assert got == _emulate_budget(pdf, budget)


def test_budget_sample_partition_invariance(spark):
    pdf = pd.DataFrame({
        "doc_id": range(200),
        "source": ["s0"] * 200,
        "tok": [10] * 200,
    })
    a = curation.budget_sample(spark.createDataFrame(pdf).repartition(1),
                               330, token_col="tok", key_col="doc_id")
    b = curation.budget_sample(spark.createDataFrame(pdf).repartition(13),
                               330, token_col="tok", key_col="doc_id")
    assert {r["doc_id"] for r in a.collect()} \
        == {r["doc_id"] for r in b.collect()}
    assert a.count() == 33  # 33 * 10 = 330 exactly fills the budget


def test_semantic_dedup_planted(spark):
    # 4 clusters × 2 cosine subgroups; survivor = min id per (cluster, sub)
    sdf = spark.range(0, 80).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), j -> CAST("
            "CASE WHEN j = id % 4 THEN 10.0 ELSE 0.0 END "
            "+ CASE WHEN j = 4 + (id % 4) THEN 5.0 * (id % 2) ELSE 0.0 END "
            "+ 0.01 * sin(CAST(id * 16 + j AS DOUBLE)) AS DOUBLE))"
        ).alias("embedding"))
    kept = clustering.semantic_dedup(sdf, k=4, threshold=0.98, max_iter=4)
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert ids == sorted({(i % 4, i % 2): i for i in range(79, -1, -1)}.values())
    # survivors of one k-means cluster share one cluster label
    labels = {r["vec_id"] % 4: r["cluster"] for r in kept.collect()}
    assert len(set(labels.values())) == 4


@pytest.mark.parametrize("factor", [0.0, 0.4, 1.0, 2.3, 3.0])
def test_epoch_sample_replication(spark, factor):
    import hashlib
    n = 200
    sdf = spark.range(n).select(F.col("id").alias("doc_id"))
    out = curation.epoch_sample(sdf, F.lit(factor)).collect()
    import math
    full = math.floor(factor)
    frac = factor - full

    def boundary_kept(i):
        h = hashlib.md5(f"{i}#{full}".encode()).hexdigest()
        return (int(h[:8], 16) % 1_000_000) < frac * 1_000_000

    exp_rows = sorted((i, e) for i in range(n)
                      for e in range(full + (1 if boundary_kept(i) else 0)))
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == exp_rows


def test_epoch_sample_deterministic_across_partitionings(spark):
    f = F.lit(1.5)
    a = curation.epoch_sample(
        spark.range(500).select(F.col("id").alias("doc_id")).repartition(1), f)
    b = curation.epoch_sample(
        spark.range(500).select(F.col("id").alias("doc_id")).repartition(17), f)
    ka = sorted((r["doc_id"], r["epoch"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["epoch"]) for r in b.collect())
    assert ka == kb and len(ka) > 500
