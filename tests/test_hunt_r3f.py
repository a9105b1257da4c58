"""Continuation-8 hunt wave 3 pins: pandas resample anchor/label
conventions, boolean reductions, zfill sign handling, SeriesGroupBy agg
naming, row-wise quantile, where/mask with a frame `other`."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as tm
import pytest

import pandas_expr_spark as pes


@pytest.fixture()
def ts_pdf():
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "v": rng.normal(0, 5, 50).round(2),
        "t": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 90 * 24, 50), unit="h"),
    })


@pytest.mark.parametrize("freq,pandas_freq", [
    ("W", "W"),        # weekly: label = period END (Sunday)
    ("M", "ME"),       # month end
    ("Q", "QE"),       # quarter end
    ("Y", "YE"),       # year end
    ("MS", "MS"),      # explicit starts stay start-labeled
    ("2D", "2D"),      # multi-day: origin = start_day (data-dependent)
    ("3D", "3D"),
    ("36h", "36h"),    # non-day-divisor: origin = start_day
    ("D", "D"),
])
def test_resample_pandas_anchors(spark, ts_pdf, freq, pandas_freq):
    f = pes.from_pandas(ts_pdf)
    got = f.set_index("t").resample(freq)["v"].sum().compute().sort_index()
    exp = ts_pdf.set_index("t").resample(pandas_freq)["v"].sum() \
        .sort_index()   # r4: the engine fills empty bins like pandas
    assert list(got.index) == list(exp.index)
    assert np.allclose(list(got), list(exp))


def test_resample_week_label_left(spark, ts_pdf):
    f = pes.from_pandas(ts_pdf)
    got = (f.set_index("t").resample("W", label="left")["v"].sum()
           .compute().sort_index())
    exp = ts_pdf.set_index("t").resample("W", label="left")["v"].sum() \
        .sort_index()   # r4: full pandas grid
    assert list(got.index) == list(exp.index)


def test_boolean_sum_mean(spark):
    pdf = pd.DataFrame({"v": [1.0, -2.0, 3.0, -4.0, 5.0]})
    f = pes.from_pandas(pdf)
    assert (f["v"] > 0).sum().compute() == int((pdf["v"] > 0).sum())
    assert (f["v"] > 0).mean().compute() == (pdf["v"] > 0).mean()


def test_zfill_signed(spark):
    s = pd.Series(["-5", "12", "+3", "007", "", None])
    f = pes.from_pandas(s.to_frame("z"))
    got = list(f["z"].str.zfill(4).compute())
    exp = list(s.str.zfill(4))
    # missing surfaces as NaN (pandas marker) — compare NA-aware
    assert [None if pd.isna(x) else x for x in got] == \
        [None if pd.isna(x) else x for x in exp]


def test_series_groupby_agg_list_bare_names(spark):
    pdf = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    f = pes.from_pandas(pdf)
    got = f.groupby("g")["v"].agg(["min", "max", "count"]).compute()
    exp = pdf.groupby("g")["v"].agg(["min", "max", "count"])
    tm.assert_frame_equal(got, exp, check_dtype=False)
    # frame slice returns pandas' MultiIndex columns (r5)
    got2 = f.groupby("g")[["v"]].agg(["min"]).compute()
    assert list(got2.columns) == [("v", "min")]


def test_quantile_axis1(spark):
    pdf = pd.DataFrame({"v": [1.0, 5.0, None], "w": [3.0, 1.0, 2.0],
                        "s": ["a", "b", "c"]})
    f = pes.from_pandas(pdf)
    for q in (0.5, 0.25, 0.9):
        got = list(f.quantile(q, axis=1).compute())
        exp = list(pdf.quantile(q, axis=1, numeric_only=True))
        assert got == pytest.approx(exp)


def test_where_with_frame_other_default_index(spark):
    pdf = pd.DataFrame({"v": [1.0, -2.0, 3.0], "w": [-1.0, 2.0, -3.0]})
    f = pes.from_pandas(pdf)
    got = f.where(f > 0, -f).compute().sort_index()
    exp = pdf.where(pdf > 0, -pdf)
    tm.assert_frame_equal(got, exp, check_dtype=False)
    got2 = f.mask(f > 0, f[["v"]]).compute().sort_index()
    exp2 = pdf.mask(pdf > 0, pdf[["v"]])
    tm.assert_frame_equal(got2, exp2, check_dtype=False)


def test_frame_nlargest_keeps_labels(spark):
    pdf = pd.DataFrame({"a": [3, 1, 2, 5], "b": [1.0, 2.0, 3.0, 4.0]})
    f = pes.from_pandas(pdf)
    got = f.nlargest(2, ["a", "b"]).compute()
    exp = pdf.nlargest(2, ["a", "b"])
    tm.assert_frame_equal(got, exp, check_dtype=False)
    got2 = f.nsmallest(2, "a").compute()
    tm.assert_frame_equal(got2, pdf.nsmallest(2, "a"), check_dtype=False)


def test_apply_axis1_rowwise_scalar(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]})
    f = pes.from_pandas(pdf)
    got = f.apply(lambda r: r["a"] + r["b"], axis=1).compute()
    exp = pdf.apply(lambda r: r["a"] + r["b"], axis=1)
    assert list(got.sort_index()) == list(exp)
    # batch-level funcs (engine contract) ride the axis=1 lane
    got2 = f.apply(lambda b: b.assign(s=b["a"] + b["b"]), axis=1)
    assert "s" in got2.columns
    # pandas default axis=0: per-column reducer -> Series by column name
    got3 = f.apply(lambda s: s.max() - s.min()).compute().sort_index()
    exp3 = pdf.apply(lambda s: s.max() - s.min()).sort_index()
    assert list(got3) == list(exp3)


def test_stack_default_index(spark):
    pdf = pd.DataFrame({"x": [1.0, None], "y": [None, 2.0]})
    f = pes.from_pandas(pdf)
    # pandas parity (r5): bare stack() is a Series on the (row, column)
    # MultiIndex
    got = f.stack(dropna=False).compute().sort_index()
    exp = pdf.stack(dropna=False).sort_index()
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_names=False,
                                   check_index_type=False)
    got2 = f.stack().compute().sort_index()
    exp2 = pdf.stack().sort_index()
    pd.testing.assert_series_equal(got2, exp2, check_dtype=False,
                                   check_names=False,
                                   check_index_type=False)
