"""Tukey length-outlier filtering and Zipf-fit corpus statistics."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_expr_spark.functions import curation, text as tx


def test_length_outlier_bounds_matches_numpy(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "source": np.repeat(["a", "b"], 50),
        "n_chars": np.concatenate([
            rng.integers(90, 110, 49), [10_000],       # one huge outlier in a
            rng.integers(40, 60, 50)]).astype("int64"),
    })
    out = {r["source"]: r for r in
           curation.length_outlier_bounds(
               spark.createDataFrame(pdf), "n_chars", "source").collect()}
    for src in ["a", "b"]:
        vals = pdf[pdf.source == src]["n_chars"].to_numpy()
        q1, q3 = np.percentile(vals, [25, 75])  # linear interpolation
        assert out[src]["lo"] == pytest.approx(q1 - 1.5 * (q3 - q1))
        assert out[src]["hi"] == pytest.approx(q3 + 1.5 * (q3 - q1))
        assert out[src]["n_rows"] == 50


def test_flag_length_outliers(spark):
    pdf = pd.DataFrame({
        "source": ["a"] * 9 + ["a"],
        "n_chars": [100, 101, 102, 103, 104, 105, 106, 107, 108, 99_999],
    })
    flagged = curation.flag_length_outliers(
        spark.createDataFrame(pdf), "n_chars", "source").collect()
    by_val = {r["n_chars"]: r["is_len_outlier"] for r in flagged}
    assert by_val[99_999] is True
    assert sum(v for v in by_val.values()) == 1


def test_flag_outliers_broadcasts_bounds(spark):
    pdf = pd.DataFrame({"source": ["a", "b"] * 10,
                        "n_chars": list(range(20))})
    plan = curation.flag_length_outliers(
        spark.createDataFrame(pdf))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles


def test_zipf_fit_known_distribution(spark):
    # construct token frequencies following freq = round(1000 / rank)
    # (true Zipf, slope -1) and check the recovered slope
    lines = []
    for rank in range(1, 51):
        tok = f"tok{rank:03d}"
        lines.extend([tok] * round(1000 / rank))
    # one doc per token occurrence keeps tokenization trivial
    sdf = spark.createDataFrame(pd.DataFrame({"text": lines}))
    row = tx.zipf_fit(sdf, "text", top_n=50).collect()[0]
    assert row["n_tokens_ranked"] == 50
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.02)
    assert row["zipf_r2"] > 0.999

    # differential vs a numpy least-squares on the same (rank, freq) table
    freqs = sorted((round(1000 / r) for r in range(1, 51)), reverse=True)
    x = np.log(np.arange(1, 51, dtype=float))
    y = np.log(np.array(freqs, dtype=float))
    slope = ((50 * (x * y).sum() - x.sum() * y.sum())
             / (50 * (x * x).sum() - x.sum() ** 2))
    assert row["zipf_slope"] == pytest.approx(slope, rel=1e-9)


def test_zipf_fit_deterministic_ties(spark):
    # equal-frequency tokens rank by token asc — partition-invariant
    pdf = pd.DataFrame({"text": ["b a c", "c a b", "a b c"]})
    r1 = tx.zipf_fit(spark.createDataFrame(pdf), top_n=3).collect()[0]
    r2 = tx.zipf_fit(spark.createDataFrame(pdf).repartition(5),
                     top_n=3).collect()[0]
    assert r1 == r2
