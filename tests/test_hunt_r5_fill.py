"""Round-5 hunt wave D pins: concat(keys=), lazy-scalar fillna,
categorical null handling.

Before the fixes:
- ``concat(keys=)`` over a mix of default-index and labeled frames
  failed the recursive shared-index check and SILENTLY DROPPED the key
  level (worst class — lost index data);
- ``s.fillna(s.mean())`` crashed on the lazy Scalar (``F.lit(Scalar)``);
  now the 1×1 scalar frame broadcast cross-joins like Series._binop;
- ``cat.as_known()`` collected null as a category (pandas: null is
  never a category) and known-category ``cat.codes`` surfaced null as
  NaN instead of pandas' -1.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


def _frames(got, exp):
    pd.testing.assert_frame_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False,
        check_column_type=False, check_categorical=False, rtol=1e-9)


def _series(got, exp):
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False,
        check_categorical=False, rtol=1e-9)


def test_concat_keys_mixed_default_and_labeled_index(spark):
    pdf = pd.DataFrame({"a": [1.0, 2, 3, 4]})
    a, b = pdf.iloc[:2], pdf.iloc[2:]   # b's labels are 2,3 (non-trivial)
    got = pes.concat([pes.from_pandas(a), pes.from_pandas(b)],
                     keys=["one", "two"]).compute()
    exp = pd.concat([a, b], keys=["one", "two"])
    _frames(got, exp)


def test_concat_keys_labeled_frames(spark):
    a = pd.DataFrame({"v": [1.0, 2]}, index=pd.Index([10, 20], name="i"))
    b = pd.DataFrame({"v": [3.0]}, index=pd.Index([30], name="i"))
    got = pes.concat([pes.from_pandas(a), pes.from_pandas(b)],
                     keys=["x", "y"]).compute()
    exp = pd.concat([a, b], keys=["x", "y"])
    _frames(got, exp)


def test_fillna_with_lazy_scalar(spark):
    s = pd.Series([1.0, np.nan, 3.0, np.nan])
    e = pes.from_pandas(s.to_frame("v"))["v"]
    _series(e.fillna(e.mean()).compute(), s.fillna(s.mean()))


def test_cat_as_known_excludes_null(spark):
    s = pd.Series(["red", None, "blue", "red"])
    e = pes.from_pandas(s.to_frame("c"))["c"].astype("category").cat.as_known()
    assert list(e.cat.categories) == list(s.astype("category").cat.categories)


def test_cat_codes_null_is_minus_one(spark):
    s = pd.Series(["red", None, "blue", "red"])
    e = pes.from_pandas(s.to_frame("c"))["c"].astype("category").cat.as_known()
    got = e.cat.codes.compute()
    exp = s.astype("category").cat.codes
    assert got.tolist() == exp.tolist()


def test_itertuples_default_index(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [3, 4], "s": ["a", "b"]})
    got = list(pes.from_pandas(pdf).itertuples())
    exp = list(pdf.itertuples())
    assert [(t.Index, t.x, t.y, t.s) for t in got] == \
        [(t.Index, t.x, t.y, t.s) for t in exp]


def test_itertuples_named_index(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0]}, index=pd.Index([7, 8], name="i"))
    got = list(pes.from_pandas(pdf).itertuples())
    exp = list(pdf.itertuples())
    assert [(t.Index, t.x) for t in got] == [(t.Index, t.x) for t in exp]


def test_rename_index_callable_and_dict(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0]}, index=pd.Index(["a", "b"],
                                                         name="i"))
    e = pes.from_pandas(pdf)
    _frames(e.rename(index=str.upper).compute(), pdf.rename(index=str.upper))
    _frames(e.rename(index={"a": "z"}).compute(), pdf.rename(index={"a": "z"}))


def test_compare_default_index_positional(spark):
    a = pd.DataFrame({"v": [1.0, 2.0, 3.0], "g": list("abc")})
    b = a.copy()
    b.loc[1, "v"] = 99.0
    b.loc[2, "g"] = "z"
    got = pes.from_pandas(a).compare(pes.from_pandas(b)).compute()
    exp = a.compare(b)
    assert sorted(got.index.tolist()) == sorted(exp.index.tolist())
    assert len(got) == len(exp)


def test_dropna_axis1(spark):
    d = pd.DataFrame({"a": [1.0, np.nan], "b": [1.0, 2.0],
                      "c": [np.nan, np.nan]})
    e = pes.from_pandas(d)
    assert list(e.dropna(axis=1).compute().columns) == \
        list(d.dropna(axis=1).columns)
    assert list(e.dropna(axis=1, how="all").compute().columns) == \
        list(d.dropna(axis=1, how="all").columns)
    assert list(e.dropna(axis=1, thresh=2).compute().columns) == \
        list(d.dropna(axis=1, thresh=2).columns)
