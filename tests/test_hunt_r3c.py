"""Hunt-wave pins (round 3, batch c): integer-bin cut, frame quantile
lists, callable where/mask, columns-less pivot_table margins, and pandas
int column labels from str accessors."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.normal(0, 10, 30).round(2),
                       "w": rng.integers(-9, 9, 30).astype("int64"),
                       "k": rng.choice(["a", "b"], 30)})
    df.loc[3, "v"] = np.nan
    return df


def _str_cmp(exp, got):
    e = ["<NA>" if pd.isna(x) else str(x) for x in exp]
    g = ["<NA>" if x is None or (isinstance(x, float) and np.isnan(x))
         else str(x) for x in got]
    assert e == g


@pytest.mark.parametrize("right", [True, False])
def test_cut_int_bins(pdf, right):
    edf = pes.from_pandas(pdf)
    _str_cmp(pd.cut(pdf.v, 4, right=right),
             pes.cut(edf.v, 4, right=right).compute())


def test_cut_int_bins_labels_false(pdf):
    edf = pes.from_pandas(pdf)
    _str_cmp(pd.cut(pdf.w, 3, labels=False),
             edf.w.cut(3, labels=False).compute())


def test_cut_degenerate_single_value(spark):
    one = pd.DataFrame({"x": [5.0, 5.0, 5.0]})
    _str_cmp(pd.cut(one.x, 2),
             pes.cut(pes.from_pandas(one).x, 2).compute())


def test_frame_quantile_list(pdf):
    edf = pes.from_pandas(pdf)
    exp = pdf[["v", "w"]].quantile([0.1, 0.5, 0.9])
    got = edf[["v", "w"]].quantile([0.1, 0.5, 0.9]).compute()
    pd.testing.assert_frame_equal(exp, got, check_dtype=False,
                                  check_index_type=False)


def test_where_mask_callable(pdf):
    edf = pes.from_pandas(pdf)
    pd.testing.assert_series_equal(
        pdf.v.where(lambda x: x > 0, 0),
        edf.v.where(lambda x: x > 0, 0).compute(),
        check_dtype=False, check_names=False)
    pd.testing.assert_series_equal(
        pdf.v.mask(lambda x: x > 0, 0),
        edf.v.mask(lambda x: x > 0, 0).compute(),
        check_dtype=False, check_names=False)
    exp = pdf[["v", "w"]].mask(lambda d: d.v > 0, 0)
    got = edf.mask(lambda d: d.v > 0, 0).compute()[["v", "w"]]
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_pivot_table_no_columns_margins(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "b", "b", "b"],
                         "v": [1.0, 2.0, 5.0, 3.0, 4.0]})
    for aggfunc in ["sum", "mean", "count"]:
        exp = pdf2.pivot_table(index="k", values="v", aggfunc=aggfunc,
                               margins=True)
        got = (pes.from_pandas(pdf2)
               .pivot_table(index="k", values="v", aggfunc=aggfunc,
                            margins=True).compute())
        assert dict(zip(got.index, got.v)) == dict(zip(exp.index, exp.v))


def test_str_split_expand_int_columns(spark):
    pdf = pd.DataFrame({"s": ["a_b", "c_d_e", None, "f"]})
    edf = pes.from_pandas(pdf)
    exp = pdf.s.str.split("_", expand=True)
    got = edf.s.str.split("_", expand=True).compute()
    assert list(got.columns) == list(exp.columns) == [0, 1, 2]
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_str_partition_int_columns(spark):
    pdf = pd.DataFrame({"s": ["a_b", "cd", None]})
    got = pes.from_pandas(pdf).s.str.partition("_").compute()
    exp = pdf.s.str.partition("_")
    assert list(got.columns) == [0, 1, 2]
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_str_extract_mixed_group_labels(spark):
    pdf = pd.DataFrame({"s": ["a_b", "c_d", None]})
    edf = pes.from_pandas(pdf)
    exp = pdf.s.str.extract(r"(?P<x>[a-z])_([a-z])")
    got = edf.s.str.extract(r"(?P<x>[a-z])_([a-z])").compute()
    assert list(got.columns) == list(exp.columns) == ["x", 1]
