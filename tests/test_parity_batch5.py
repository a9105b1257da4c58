"""Differential tests (vs pandas) for the batch-5 parity ops:

Series.skew/kurt/sem/rank, DataFrame.duplicated/crosstab/resample,
with_ffill/with_bfill, groupby head/tail/nlargest/nsmallest/ffill/bfill.

Reference has none of these (SURVEY §2.5/§2.7 note the gaps); semantics
target pandas, execution targets one-shuffle Spark plans.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frame_eq


@pytest.fixture()
def ts_pdf():
    rng = np.random.RandomState(7)
    n = 200
    return pd.DataFrame({
        "g": [f"g{i % 5}" for i in range(n)],
        "x": [float(v) if v % 3 else np.nan
              for v in rng.randint(0, 50, n)],
        "v": rng.randint(0, 20, n).astype("int64"),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400 * 20, n), unit="s"),
    })


@pytest.fixture()
def tdf(spark, ts_pdf):
    from pandas_expr_spark import from_pandas
    return from_pandas(ts_pdf)


# -- moments -----------------------------------------------------------
def test_skew_kurt_sem(tdf, ts_pdf):
    assert float(tdf.v.skew()) == pytest.approx(ts_pdf.v.skew(), rel=1e-12)
    assert float(tdf.v.kurt()) == pytest.approx(ts_pdf.v.kurt(), rel=1e-12)
    assert float(tdf.v.sem()) == pytest.approx(ts_pdf.v.sem(), rel=1e-12)
    # float column with nulls: pandas skips NaN
    assert float(tdf.x.skew()) == pytest.approx(ts_pdf.x.skew(), rel=1e-12)
    assert float(tdf.x.sem(ddof=2)) == pytest.approx(
        ts_pdf.x.std(ddof=2) / np.sqrt(ts_pdf.x.count()), rel=1e-12)


def test_rank_methods(tdf, ts_pdf):
    for method in ["average", "min", "max", "dense"]:
        got = sorted(tdf.v.rank(method=method).compute().tolist())
        exp = sorted(ts_pdf.v.rank(method=method).tolist())
        assert got == pytest.approx(exp)
    got = sorted(tdf.v.rank(ascending=False).compute().tolist())
    exp = sorted(ts_pdf.v.rank(ascending=False).tolist())
    assert got == pytest.approx(exp)


def test_rank_nulls(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({"v": [3.0, np.nan, 1.0, 3.0, np.nan]})
    df = from_pandas(pdf)
    got = df.v.rank().compute()
    assert got.isna().sum() == 2
    assert sorted(got.dropna().tolist()) == [1.0, 2.5, 2.5]


# -- duplicated --------------------------------------------------------
def test_duplicated_counts(tdf, ts_pdf):
    for keep in ["first", "last", False]:
        got = tdf.duplicated(subset=["g", "v"], keep=keep).compute()
        exp = ts_pdf.duplicated(subset=["g", "v"], keep=keep)
        # row order differs; duplicate COUNTS per flag must match
        assert got.sum() == exp.sum()
        assert len(got) == len(exp)


def test_duplicated_first_positional(spark):
    # keep="first" honors the engine index (set_index -> positional truth)
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({"i": range(6), "k": [1, 1, 2, 2, 2, 3]})
    df = from_pandas(pdf).set_index("i")
    got = (df.duplicated(subset=["k"]).to_frame("dup").reset_index()
           .compute().sort_values("i")["dup"].tolist())
    assert got == [False, True, False, True, True, False]


# -- crosstab ----------------------------------------------------------
def test_crosstab_counts(tdf, ts_pdf):
    # crosstab indexes on the row key like pandas since r5
    got = tdf.crosstab("g", "v").compute().sort_index()
    exp = pd.crosstab(ts_pdf.g, ts_pdf.v)
    for g, row in got.iterrows():
        for c in exp.columns:
            assert row[str(c)] == exp.loc[g, c], (g, c)


def test_crosstab_pinned_values_and_agg(tdf, ts_pdf):
    got = tdf.crosstab("g", "v", values="x", aggfunc="sum",
                       pivot_values=[0, 1, 2]).compute().sort_index()
    exp = ts_pdf.pivot_table(values="x", index="g", columns="v",
                             aggfunc="sum")
    for g, row in got.iterrows():
        for c in [0, 1, 2]:
            e = exp.loc[g, c] if c in exp.columns else np.nan
            if pd.isna(row[str(c)]):
                # Spark sum over no/all-null rows -> null; pandas -> 0.0
                assert pd.isna(e) or e == 0.0
            else:
                assert row[str(c)] == pytest.approx(e)


# -- resample ----------------------------------------------------------
def test_resample_daily(tdf, ts_pdf):
    got = tdf.resample("D", on="ts").agg(
        n=("v", "count"), s=("v", "sum")).reset_index().compute()
    exp = (ts_pdf.resample("D", on="ts").agg(n=("v", "count"), s=("v", "sum"))
           .reset_index())
    exp = exp[exp.n > 0].reset_index(drop=True)  # engine skips empty buckets
    assert_frame_eq(got, exp, sort_by=["ts"])


def test_resample_fixed_interval(tdf, ts_pdf):
    got = tdf.resample("6h", on="ts").agg(n=("v", "count")).reset_index().compute()
    exp = (ts_pdf.resample("6h", on="ts").agg(n=("v", "count")).reset_index())
    assert_frame_eq(got, exp, sort_by=["ts"])   # r4: empty bins filled


# -- fills -------------------------------------------------------------
def test_with_ffill_bfill(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "o": list(range(4)) * 2,
        "x": [1.0, None, None, 4.0, None, 6.0, None, None],
    })
    df = from_pandas(pdf)
    out = (df.with_ffill("ff", "x", partition_by="g", order_by="o")
             .with_bfill("bf", "x", partition_by="g", order_by="o")
             .compute().sort_values(["g", "o"]))
    exp_ff = pdf.sort_values(["g", "o"]).groupby("g")["x"].ffill()
    exp_bf = pdf.sort_values(["g", "o"]).groupby("g")["x"].bfill()
    assert out["ff"].tolist() == pytest.approx(exp_ff.tolist(), nan_ok=True)
    assert out["bf"].tolist() == pytest.approx(exp_bf.tolist(), nan_ok=True)


def test_groupby_ffill_values(tdf, ts_pdf):
    got = (tdf[["g", "x"]].groupby("g").ffill().compute())
    # per-group multiset of filled values must match pandas
    exp = ts_pdf.assign(xf=ts_pdf.groupby("g")["x"].ffill())
    assert sorted(got["x"].fillna(-1).tolist()) == \
        sorted(exp["xf"].fillna(-1).tolist())


# -- groupby head/tail/top-n ------------------------------------------
def test_groupby_head_tail(tdf, ts_pdf):
    got = tdf.groupby("g").head(3).compute()
    exp = ts_pdf.groupby("g").head(3)
    assert_frame_eq(got, exp.reset_index(drop=True), sort_by=["g", "ts", "v"])
    got_t = tdf.groupby("g").tail(2).compute()
    exp_t = ts_pdf.groupby("g").tail(2)
    assert_frame_eq(got_t, exp_t.reset_index(drop=True), sort_by=["g", "ts", "v"])


def test_groupby_nlargest(tdf, ts_pdf):
    got = (tdf.groupby("g").nlargest(2, "v", tiebreak="ts")
           .compute()[["g", "v"]])
    exp = (ts_pdf.sort_values(["v", "ts"], ascending=[False, True])
           .groupby("g").head(2)[["g", "v"]])
    assert_frame_eq(got, exp.reset_index(drop=True), sort_by=["g", "v"])
    got_s = (tdf.groupby("g").nsmallest(2, "v", tiebreak="ts")
             .compute()[["g", "v"]])
    exp_s = (ts_pdf.sort_values(["v", "ts"], ascending=[True, True])
             .groupby("g").head(2)[["g", "v"]])
    assert_frame_eq(got_s, exp_s.reset_index(drop=True), sort_by=["g", "v"])


# -- grouped moments ----------------------------------------------------
def test_groupby_skew_kurt_sem(tdf, ts_pdf):
    got = tdf[["g", "v"]].groupby("g").skew().compute().sort_values("g")
    exp = ts_pdf.groupby("g")["v"].skew()
    assert got["v"].tolist() == pytest.approx(exp.tolist(), rel=1e-9)
    got_k = tdf[["g", "v"]].groupby("g").kurt().compute().sort_values("g")
    # pandas Series groupby has no kurt until 2.x frame path; compute manually
    exp_k = ts_pdf.groupby("g")["v"].apply(lambda s: s.kurt())
    assert got_k["v"].tolist() == pytest.approx(exp_k.tolist(), rel=1e-9)
    got_s = tdf[["g", "v"]].groupby("g").sem().compute().sort_values("g")
    exp_s = ts_pdf.groupby("g")["v"].sem()
    assert got_s["v"].tolist() == pytest.approx(exp_s.tolist(), rel=1e-9)


def test_groupby_agg_spec_with_moments(tdf, ts_pdf):
    got = (tdf.groupby("g").agg(s=("v", "skew"), e=("v", "sem"),
                                m=("v", "mean"))
           .compute().sort_values("g"))
    exp = ts_pdf.groupby("g")["v"].agg(["skew", "sem", "mean"])
    assert got["s"].tolist() == pytest.approx(exp["skew"].tolist(), rel=1e-9)
    assert got["e"].tolist() == pytest.approx(exp["sem"].tolist(), rel=1e-9)
    assert got["m"].tolist() == pytest.approx(exp["mean"].tolist(), rel=1e-9)
