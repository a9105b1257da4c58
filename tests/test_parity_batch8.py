"""Parity batch 8: NaN-as-missing ingest normalization and the gaps the
round-2 continuation-3 differential probe surfaced (replace lists,
rank(pct), frame idxmin/idxmax, axis=1 skipna, groupby.quantile,
str.split(expand)/extract, NaN-sensitive quantile/sort/cov/where)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture()
def nan_pdf():
    rng = np.random.RandomState(0)
    n = 60
    return pd.DataFrame({
        "k": rng.randint(-3, 4, n),
        "g": [["a", "b", "c"][i % 3] for i in range(n)],
        "v": np.where(rng.rand(n) < 0.25, np.nan, rng.randn(n) * 10),
        "w": rng.randint(0, 100, n).astype("int64"),
    })


def test_nan_ingested_as_null(spark, nan_pdf):
    """pandas NaN IS missing: from_pandas must deliver float NaN as Spark
    null, or sorts/percentile/covar silently treat it as the largest
    value."""
    from pyspark.sql import functions as F
    sdf = pes.from_pandas(nan_pdf).to_spark()
    bad = sdf.filter(F.isnan("v")).count()
    assert bad == 0
    assert sdf.filter(F.isnull("v")).count() == int(nan_pdf.v.isna().sum())


def test_quantile_interpolations_with_nan(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    for itp in ["linear", "lower", "higher", "nearest", "midpoint"]:
        got = df.v.quantile(0.37, interpolation=itp).compute()
        assert got == pytest.approx(nan_pdf.v.quantile(0.37, interpolation=itp))


def test_sort_values_na_position_first(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    got = df.sort_values("v", na_position="first").compute() \
        .reset_index(drop=True).v
    exp = nan_pdf.sort_values("v", na_position="first", kind="mergesort") \
        .reset_index(drop=True).v
    pd.testing.assert_series_equal(got, exp, check_dtype=False)


def test_cov_corr_skip_nan_pairs(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    assert df.v.cov(df.w).compute() == pytest.approx(nan_pdf.v.cov(nan_pdf.w))
    assert df.v.corr(df.w).compute() == pytest.approx(
        nan_pdf.v.corr(nan_pdf.w))


def test_where_nan_cond_is_false(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    got = df.v.where(df.v > 0, -1.0).compute().reset_index(drop=True)
    exp = nan_pdf.v.where(nan_pdf.v > 0, -1.0).reset_index(drop=True)
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_replace_list_forms(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    got = df.replace([1, 2], 0).compute().sort_values(["g", "w"]) \
        .reset_index(drop=True)
    exp = nan_pdf.replace([1, 2], 0).sort_values(["g", "w"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    got_s = df.k.replace([1, 2], [10, 20]).compute().reset_index(drop=True)
    exp_s = nan_pdf.k.replace([1, 2], [10, 20]).reset_index(drop=True)
    pd.testing.assert_series_equal(got_s, exp_s, check_dtype=False,
                                   check_names=False)


def test_rank_pct_matches_pandas(spark, nan_pdf):
    pdfu = nan_pdf.copy()
    pdfu.index = pd.Index(np.arange(len(pdfu)), name="i")
    df = pes.from_pandas(pdfu)
    for method in ["average", "min", "max", "dense", "first"]:
        got = df.v.rank(method=method, pct=True).compute().sort_index()
        exp = pdfu.v.rank(method=method, pct=True).sort_index()
        pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                       check_names=False, atol=1e-12)


def test_frame_idxmin_idxmax(spark):
    # tie-free values: the engine's min-label tie contract never fires,
    # so the result must equal pandas exactly
    pdf = pd.DataFrame({
        "i": [10, 30, 20, 40],
        "a": [5.0, np.nan, 1.0, 3.0],
        "b": [2, 9, 4, 7],
    }).set_index("i")
    df = pes.from_pandas(pdf)
    pd.testing.assert_series_equal(df.idxmax().compute().sort_index(),
                                   pdf.idxmax().sort_index(),
                                   check_dtype=False, check_names=False)
    pd.testing.assert_series_equal(df.idxmin().compute().sort_index(),
                                   pdf.idxmin().sort_index(),
                                   check_dtype=False, check_names=False)


def test_sum_axis1_skipna(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    for skipna in (True, False):
        got = df[["v", "w"]].sum(axis=1, skipna=skipna).compute() \
            .reset_index(drop=True)
        exp = nan_pdf[["v", "w"]].sum(axis=1, skipna=skipna) \
            .reset_index(drop=True)
        pd.testing.assert_series_equal(got, exp, check_names=False,
                                       atol=1e-9)


def test_groupby_quantile(spark, nan_pdf):
    df = pes.from_pandas(nan_pdf)
    for q in (0.25, 0.5, 0.9):
        got = df.groupby("g").v.quantile(q).compute().sort_index()
        exp = nan_pdf.groupby("g").v.quantile(q).sort_index()
        pd.testing.assert_series_equal(got, exp, check_names=False,
                                       atol=1e-9)
    with pytest.raises(ValueError):
        df.groupby("g").v.quantile(0.5, interpolation="nearest")


def test_str_split_expand_and_extract(spark):
    ps = pd.Series(["a_b_c", "x_y", None, "solo"], name="s")
    ds = pes.from_pandas(ps.to_frame()).s
    got = ds.str.split("_", expand=True).compute().reset_index(drop=True)
    exp = ps.str.split("_", expand=True).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    got_e = ds.str.extract(r"([a-z])_([a-z])").compute() \
        .reset_index(drop=True)
    exp_e = ps.str.extract(r"([a-z])_([a-z])").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_e, exp_e)
    # single group -> Series; no match -> null (not '')
    # pandas expand=True default: single group still yields a DataFrame
    got_1 = (ds.str.extract(r"x_([a-z])").compute()
             .reset_index(drop=True)[0])
    exp_1 = ps.str.extract(r"x_([a-z])")[0].reset_index(drop=True)
    pd.testing.assert_series_equal(got_1, exp_1, check_names=False)
    # named groups become column names
    named = ds.str.extract(r"(?P<first>[a-z])_(?P<second>[a-z])").compute()
    assert list(named.columns) == ["first", "second"]
