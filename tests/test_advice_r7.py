"""Round-7 ADVICE pins — five divergences flagged by the r6 advisor,
each verified against pandas before the fix landed.

1. _binop_axis0 positional alignment must follow the _ORDER stamp, not
   the physical partition layout (drop_duplicates → reset_index frames).
2. DataFrame.transform({col: fn}) returns ONLY the dict's columns.
3. Known-categorical value_counts(dropna=False) keeps the NaN count row
   through the zero-fill broadcast join.
4. rolling(closed=) validates with ValueError; center=True composed with
   non-'right' closed raises instead of silently diverging.
5. shift(axis=1) casts by the SOURCE column dtype; numeric fill_value is
   cast to double like the shifted numeric sources.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_expr_spark import from_pandas


def test_binop_axis0_stamp_ordered_frame(spark):
    pdf = pd.DataFrame({"a": [3, 1, 3, 2, 1, 4],
                        "b": [10.0, 20, 30, 40, 50, 60]})
    exp = (pdf.drop_duplicates(subset=["a"]).reset_index(drop=True)
           .add(pd.Series([100.0, 200, 300, 400]), axis=0))
    lhs = from_pandas(pdf).drop_duplicates(subset=["a"]).reset_index(drop=True)
    got = lhs.add(from_pandas(pd.Series([100.0, 200, 300, 400])),
                  axis=0).compute().sort_index()
    pd.testing.assert_frame_equal(got, exp)


def test_binop_axis0_stamp_ordered_other_side(spark):
    # the SERIES operand carries the stamp (a column selected from a
    # stamp-ordered frame)
    pdf = pd.DataFrame({"a": [3, 1, 3, 2, 1, 4],
                        "b": [10.0, 20, 30, 40, 50, 60]})
    sp = pdf.drop_duplicates(subset=["a"]).reset_index(drop=True)["b"]
    lhs_pdf = pd.DataFrame({"x": [1.0, 2, 3, 4]})
    exp = lhs_pdf.add(sp, axis=0)
    s = from_pandas(pdf).drop_duplicates(subset=["a"]) \
        .reset_index(drop=True)["b"]
    got = from_pandas(lhs_pdf).add(s, axis=0).compute().sort_index()
    pd.testing.assert_frame_equal(got, exp)


def test_transform_dict_returns_only_dict_columns(spark):
    pdf = pd.DataFrame({"a": [1.0, 2, 3], "b": [4.0, 5, 6]})
    exp = pdf.transform({"a": np.sqrt})
    got = from_pandas(pdf).transform({"a": np.sqrt}).compute().sort_index()
    assert list(got.columns) == list(exp.columns) == ["a"]
    pd.testing.assert_frame_equal(got, exp)


def test_transform_dict_order_preserved(spark):
    pdf = pd.DataFrame({"a": [1.0, 4], "b": [9.0, 16], "c": [1.0, 1]})
    exp = pdf.transform({"b": np.sqrt, "a": np.abs})
    got = (from_pandas(pdf).transform({"b": np.sqrt, "a": np.abs})
           .compute().sort_index())
    assert list(got.columns) == ["b", "a"]
    pd.testing.assert_frame_equal(got, exp)


def test_categorical_value_counts_dropna_false_keeps_nan(spark):
    sp = pd.Series(pd.Categorical(["x", "y", "x", None, None],
                                  categories=["x", "y", "z"]))
    exp = sp.value_counts(dropna=False)
    got = from_pandas(sp).value_counts(dropna=False).compute()
    assert len(got) == len(exp) == 4
    assert sorted(got.values.tolist()) == sorted(exp.values.tolist())
    # the NaN row is present with the right count
    nan_got = got[got.index.isnull()]
    assert len(nan_got) == 1 and int(nan_got.iloc[0]) == 2


def test_categorical_value_counts_dropna_true_unchanged(spark):
    sp = pd.Series(pd.Categorical(["x", "y", "x", None],
                                  categories=["x", "y", "z"]))
    exp = sp.value_counts(dropna=True)
    got = from_pandas(sp).value_counts(dropna=True).compute()
    assert len(got) == len(exp) == 3
    assert sorted(got.values.tolist()) == sorted(exp.values.tolist())


def test_rolling_closed_invalid_raises_valueerror(spark):
    s = from_pandas(pd.Series([1.0, 2, 3, 4]))
    with pytest.raises(ValueError, match="closed"):
        s.rolling(2, closed="bogus")


def test_rolling_center_closed_left_not_implemented(spark):
    s = from_pandas(pd.Series([1.0, 2, 3, 4]))
    for closed in ("left", "both", "neither"):
        with pytest.raises(NotImplementedError):
            s.rolling(3, center=True, closed=closed)
    # center=True with closed='right'/None still works
    exp = pd.Series([1.0, 2, 3, 4]).rolling(3, center=True).mean()
    got = s.rolling(3, center=True).mean().compute().sort_index()
    pd.testing.assert_series_equal(got, exp)


def test_shift_axis1_mixed_dtypes(spark):
    pdf = pd.DataFrame({"s": ["a", "b"], "n": [1.0, 2], "m": [3.0, 4]})
    exp = pdf.shift(1, axis=1)
    got = from_pandas(pdf).shift(1, axis=1).compute().sort_index()
    # column 'n' receives string values from 's' — no double cast
    assert got["n"].tolist() == exp["n"].tolist() == ["a", "b"]
    assert got["m"].tolist() == exp["m"].tolist() == [1.0, 2.0]
    assert got["s"].isnull().all()


def test_shift_axis1_fill_value_cast(spark):
    pdf = pd.DataFrame({"n": [1.0, 2], "m": [3.0, 4]})
    exp = pdf.shift(1, axis=1, fill_value=0)
    got = (from_pandas(pdf).shift(1, axis=1, fill_value=0)
           .compute().sort_index())
    np.testing.assert_allclose(got.values.astype(float),
                               exp.values.astype(float))
