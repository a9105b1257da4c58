"""Regression pins for the round-3 ADVICE.md findings (fixed in round 4).

1 (medium): df.add(series) with default axis silently returned the
   NotImplemented singleton — now broadcasts along the columns axis like
   pandas (labels → column names, one tiny label collect).
2 (low): timedelta/timedelta division lowered x/0 to null; pandas gives
   ±inf for x/0 and NaN only for 0/0.
3 (low): Series.map probed dict-subclass __missing__ with a random object
   key, assuming a key-independent constant.
4 (low): reindex(index=labels) returned rows in arbitrary order instead
   of the requested label order.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frame_eq, assert_series_eq

import pandas_expr_spark as pes


@pytest.fixture
def pdf():
    return pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]})


# ---------------------------------------------------------------- finding 1
def test_frame_add_series_columns_axis(pdf):
    s = pd.Series({"a": 100.0, "b": 200.0})
    df = pes.from_pandas(pdf)
    got = df.add(pes.from_pandas(s.to_frame("v"))["v"])
    assert not isinstance(got, type(NotImplemented))
    assert_frame_eq(got.compute().sort_index(), pdf.add(s))


def test_frame_series_dunders(pdf):
    s = pd.Series({"a": 1.0, "b": 2.0})
    df = pes.from_pandas(pdf)
    es = pes.from_pandas(s.to_frame("v"))["v"]
    assert_frame_eq((df + es).compute().sort_index(), pdf + s)
    assert_frame_eq((es + df).compute().sort_index(), s + pdf)
    assert_frame_eq((df - es).compute().sort_index(), pdf - s)
    assert_frame_eq((df * es).compute().sort_index(), pdf * s)


def test_frame_mul_series_label_mismatch(pdf):
    # one-side-only labels become all-NaN columns, sorted union order
    s = pd.Series({"a": 10.0, "c": 30.0})
    df = pes.from_pandas(pdf)
    es = pes.from_pandas(s.to_frame("v"))["v"]
    got = df.mul(es).compute().sort_index()
    assert_frame_eq(got, pdf.mul(s))


def test_series_add_frame(pdf):
    s = pd.Series({"a": 100.0, "b": 200.0})
    df = pes.from_pandas(pdf)
    es = pes.from_pandas(s.to_frame("v"))["v"]
    got = es.add(df)
    assert not isinstance(got, type(NotImplemented))
    assert_frame_eq(got.compute().sort_index(), s.add(pdf))
    # reflected named form
    assert_frame_eq(es.rsub(df).compute().sort_index(), s.rsub(pdf))


def test_frame_series_fill_value_raises(pdf):
    s = pd.Series({"a": 1.0, "b": 2.0})
    df = pes.from_pandas(pdf)
    es = pes.from_pandas(s.to_frame("v"))["v"]
    with pytest.raises(NotImplementedError, match="fill_value"):
        df.add(es, fill_value=0)
    with pytest.raises(NotImplementedError, match="fill_value"):
        es.add(df, fill_value=0)


def test_frame_cmp_series(pdf):
    s = pd.Series({"a": 2.0, "b": 20.0})
    df = pes.from_pandas(pdf)
    es = pes.from_pandas(s.to_frame("v"))["v"]
    assert_frame_eq((df == es).compute().sort_index(), pdf == s)
    assert_frame_eq(df.ge(es).compute().sort_index(), pdf.ge(s))
    assert_frame_eq(es.lt(df).compute().sort_index(), s.lt(pdf))


def test_frame_binop_lazy_scalar(pdf):
    df = pes.from_pandas(pdf)
    got = (df * df["a"].sum()).compute().sort_index()
    assert_frame_eq(got, pdf * pdf["a"].sum())


def test_frame_series_duplicate_labels_raise(pdf):
    dup = pd.DataFrame({"k": ["a", "a"], "v": [1.0, 2.0]}).set_index("k")["v"]
    df = pes.from_pandas(pdf)
    es = pes.from_pandas(dup.to_frame("v"))["v"]
    with pytest.raises(ValueError, match="duplicate"):
        df.add(es)


# ---------------------------------------------------------------- finding 2
def test_timedelta_div_zero_divisor():
    td = pd.DataFrame({
        "num": pd.to_timedelta(["1 days", "0 days", "-2 days", "0 days"]),
        "den": pd.to_timedelta(["0 days", "0 days", "0 days", "4 days"]),
    })
    df = pes.from_pandas(td)
    got = (df["num"] / df["den"]).compute().sort_index()
    exp = td["num"] / td["den"]        # [inf, nan, -inf, 0.0]
    np.testing.assert_array_equal(got.to_numpy(), exp.to_numpy())


def test_timedelta_div_timedelta_scalar_zero():
    td = pd.DataFrame({"num": pd.to_timedelta(["1 days", "-1 days", "0 days"])})
    df = pes.from_pandas(td)
    got = (df["num"] / pd.Timedelta(0)).compute().sort_index()
    exp = td["num"] / pd.Timedelta(0)
    np.testing.assert_array_equal(got.to_numpy(), exp.to_numpy())


# ---------------------------------------------------------------- finding 3
def test_map_key_dependent_missing():
    class KeyDep(dict):
        def __missing__(self, key):
            return key * 10

    pdf = pd.DataFrame({"v": [1, 2, 3, 4]})
    arg = KeyDep({1: -1, 3: -3})
    got = pes.from_pandas(pdf)["v"].map(arg).compute().sort_index()
    exp = pdf["v"].map(arg)
    assert got.tolist() == exp.tolist()          # [-1, 20, -3, 40]
    # the probe must not have inserted junk keys into the mapping
    assert set(arg.keys()) <= {1, 2, 3, 4}


def test_map_missing_no_mutation():
    class Inserting(dict):
        def __missing__(self, key):
            self[key] = 0
            return 0

    pdf = pd.DataFrame({"v": [7, 8]})
    arg = Inserting({7: 1})
    got = pes.from_pandas(pdf)["v"].map(arg).compute().sort_index()
    assert got.tolist() == [1, 0]
    assert all(isinstance(k, int) for k in arg.keys())


def test_map_defaultdict_still_literal_path():
    from collections import defaultdict
    pdf = pd.DataFrame({"v": [1, 2, 3]})
    arg = defaultdict(lambda: -99, {1: 10})
    got = pes.from_pandas(pdf)["v"].map(arg).compute().sort_index()
    assert got.tolist() == [10, -99, -99]


# ---------------------------------------------------------------- finding 4
def test_reindex_preserves_label_order():
    pdf = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]}
                       ).set_index("k")
    labels = [3, 99, 1, 4]
    got = pes.from_pandas(pdf).reindex(index=labels).compute()
    exp = pdf.reindex(index=labels)
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_array_equal(got["v"].to_numpy(), exp["v"].to_numpy())


def test_reindex_series_label_order():
    pdf = pd.DataFrame({"k": ["b", "a", "c"], "v": [2.0, 1.0, 3.0]}
                       ).set_index("k")
    labels = ["c", "x", "a"]
    got = pes.from_pandas(pdf)["v"].reindex(labels).compute()
    exp = pdf["v"].reindex(labels)
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_array_equal(got.to_numpy(), exp.to_numpy())
