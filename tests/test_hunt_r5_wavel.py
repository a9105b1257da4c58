"""Round-5 hunt wave L pins: index-merge name leak, int/float merge key
dtype, str.get_dummies nulls, concat(axis=1, keys=), rank(axis=1)."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes

L = pd.DataFrame({"k": [1, 2, 3], "a": ["x", "y", "z"]}, index=[10, 20, 30])
R = pd.DataFrame({"b": [1.5, 2.5]}, index=[20, 30])


def test_merge_on_unnamed_indexes_keeps_index_unnamed():
    # the coalesced key column leaked a literal "key_0" index NAME
    el, er = pes.from_pandas(L), pes.from_pandas(R)
    for how in ("inner", "outer"):
        want = L.merge(R, left_index=True, right_index=True, how=how)
        got = (el.merge(er, left_index=True, right_index=True, how=how)
               .compute().sort_index())
        assert got.index.name is None
        pd.testing.assert_frame_equal(got, want)


def test_merge_int_float_keys_keep_int_dtype():
    # pandas coerces the float key side down to int when lossless
    # (_maybe_coerce_merge_keys); Spark's coalesce promoted to double
    el = pes.from_pandas(L)
    er = pes.from_pandas(R.assign(k=[2.0, 3.0]))
    want = L.merge(R.assign(k=[2.0, 3.0]), on="k")
    got = el.merge(er, on="k").compute()
    assert got["k"].dtype == want["k"].dtype == "int64"
    assert sorted(got["k"]) == sorted(want["k"])


def test_str_get_dummies_null_rows_are_zero():
    s = pd.Series(["a", "b", None, "a"], name="s")
    want = s.str.get_dummies()
    got = pes.from_pandas(s).str.get_dummies().compute()
    pd.testing.assert_frame_equal(got, want)


def test_concat_axis1_keys_multiindex_columns():
    el = pes.from_pandas(L)
    want = pd.concat([L, L], axis=1, keys=["p", "q"])
    got = pes.concat([el, el], axis=1, keys=["p", "q"]).compute().sort_index()
    assert got.columns.tolist() == want.columns.tolist()
    assert (got.values == want.values).all()


def test_frame_rank_axis1():
    D = pd.DataFrame({"n": [3.0, 1.0, np.nan], "m": [1.0, 1.0, 5.0],
                      "o": [2.0, 4.0, 5.0]})
    e = pes.from_pandas(D)
    for method in ("average", "min", "max", "dense"):
        for asc in (True, False):
            want = D.rank(axis=1, method=method, ascending=asc)
            got = e.rank(axis=1, method=method, ascending=asc).compute()
            assert np.allclose(want.values, got.values, equal_nan=True), \
                (method, asc)
    want = D.rank(axis=1, pct=True)
    got = e.rank(axis=1, pct=True).compute()
    assert np.allclose(want.values, got.values, equal_nan=True)
