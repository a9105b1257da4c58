"""Round-4 differential-hunt pins: the loc/at/iat/xs label-indexing
surface (VERDICT r3 next-item 8 — "where positional semantics meet
Spark's orderlessness").  Every case here diverged from pandas (or was
unsupported) before the round-4 _LocIndexer rewrite:

- df.loc[scalar] returned a lazy frame instead of the row Series /
  KeyError / dup sub-frame triple;
- df.loc[list] lost the requested order and silently dropped missing
  labels (pandas raises KeyError);
- tuple keys on a multi-level index were misparsed as (rows, cols);
- partial level-0 loc on a multi-level index kept the filtered level
  (pandas drops it — cross-section semantics);
- boolean-list and callable keys were unsupported.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture
def pdf():
    return pd.DataFrame({
        "k": ["b", "a", "c", "a", "d"],
        "g": ["x", "y", "x", "y", "x"],
        "v": [2.0, 1.0, 3.0, 4.0, 5.0],
        "w": [10, 20, 30, 40, 50],
    })


@pytest.fixture
def idx(pdf):
    return pdf.set_index("k")


@pytest.fixture
def eidx(pdf, spark):
    return pes.from_pandas(pdf).set_index("k")


def test_loc_scalar_unique_row_series(idx, eidx):
    got, exp = eidx.loc["b"], idx.loc["b"]
    assert isinstance(got, pd.Series)
    assert got.name == "b"
    pd.testing.assert_series_equal(got, exp, check_dtype=False)


def test_loc_scalar_duplicate_subframe(idx, eidx):
    got = eidx.loc["a"].compute().sort_values("v")
    pd.testing.assert_frame_equal(got, idx.loc["a"].sort_values("v"),
                                  check_dtype=False)


def test_loc_scalar_missing_raises(eidx):
    with pytest.raises(KeyError):
        eidx.loc["zz"]


def test_loc_list_requested_order(idx, eidx):
    got = eidx.loc[["c", "a", "b"]].compute()
    exp = idx.loc[["c", "a", "b"]]
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_array_equal(got["v"].to_numpy(), exp["v"].to_numpy())


def test_loc_list_missing_raises(eidx):
    with pytest.raises(KeyError):
        eidx.loc[["c", "zz"]].compute()


def test_loc_scalar_col_cell(idx, eidx):
    assert eidx.loc["b", "v"] == idx.loc["b", "v"]


def test_loc_scalar_collist_row(idx, eidx):
    got, exp = eidx.loc["b", ["v", "w"]], idx.loc["b", ["v", "w"]]
    assert isinstance(got, pd.Series)
    pd.testing.assert_series_equal(got, exp, check_dtype=False)


def test_series_loc_list_order(idx, eidx):
    got = eidx["v"].loc[["c", "b"]].compute()
    exp = idx["v"].loc[["c", "b"]]
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_array_equal(got.to_numpy(), exp.to_numpy())


def test_loc_bool_list(idx, eidx):
    mask = [True, False, True, False, True]
    got = eidx.loc[mask].compute().sort_index()
    pd.testing.assert_frame_equal(got, idx.loc[mask].sort_index(),
                                  check_dtype=False)


def test_loc_bool_list_wrong_length(eidx):
    with pytest.raises(IndexError):
        eidx.loc[[True, False]]


def test_loc_callable(idx, eidx):
    got = eidx.loc[lambda d: d["v"] > 2.0].compute().sort_index()
    pd.testing.assert_frame_equal(
        got, idx.loc[lambda d: d["v"] > 2.0].sort_index(),
        check_dtype=False)


# ---- multi-level index ----
@pytest.fixture
def mi(pdf):
    return pdf.set_index(["g", "k"])


@pytest.fixture
def emi(pdf, spark):
    return pes.from_pandas(pdf).set_index(["g", "k"])


def test_mi_loc_partial_drops_level(mi, emi):
    got = emi.loc["x"].compute().sort_index()
    pd.testing.assert_frame_equal(got, mi.loc["x"].sort_index(),
                                  check_dtype=False,
                                  check_index_type=False)


def test_mi_loc_full_tuple_dup_keeps_index(mi, emi):
    # ("y", "a") matches TWO rows → sub-frame keeping the full MI
    got = emi.loc[("y", "a")].compute().sort_values("v")
    exp = mi.loc[("y", "a")].sort_values("v")
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_array_equal(got["v"].to_numpy(), exp["v"].to_numpy())


def test_mi_loc_full_tuple_unique_row(pdf, spark):
    uniq = pdf.drop_duplicates(["g", "k"]).set_index(["g", "k"])
    euniq = pes.from_pandas(pdf.drop_duplicates(["g", "k"])) \
        .set_index(["g", "k"])
    got, exp = euniq.loc[("y", "a")], uniq.loc[("y", "a")]
    assert isinstance(got, pd.Series)
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_names=False)


def test_mi_loc_tuple_with_colspec(mi, emi):
    # second element IS a column → (rows, cols) interpretation wins
    got = emi.loc["x", ["v"]].compute().sort_index()
    exp = mi.loc["x", ["v"]].sort_index()
    np.testing.assert_array_equal(got["v"].to_numpy(), exp["v"].to_numpy())


def test_mi_xs_level(mi, emi):
    got = emi.xs("a", level="k").compute().sort_index()
    pd.testing.assert_frame_equal(got, mi.xs("a", level="k").sort_index(),
                                  check_dtype=False,
                                  check_index_type=False)


# ---- hunt wave 2: iloc scalar rows, MI reshaping, set_index edges ----
def test_iloc_int_row_series(pdf, spark):
    e = pes.from_pandas(pdf)
    got, exp = e.iloc[2], pdf.iloc[2]
    assert isinstance(got, pd.Series) and got.name == 2
    pd.testing.assert_series_equal(got, exp, check_dtype=False)
    # negative position
    pd.testing.assert_series_equal(e.iloc[-1], pdf.iloc[-1],
                                   check_dtype=False)
    with pytest.raises(IndexError):
        e.iloc[99]


def test_iloc_int_col_scalar(pdf, spark):
    e = pes.from_pandas(pdf)
    assert e.iloc[2, 2] == pdf.iloc[2, 2]
    pd.testing.assert_series_equal(e.iloc[2, [2, 3]], pdf.iloc[2, [2, 3]],
                                   check_dtype=False)


def test_series_unstack_duplicates_raise(pdf, spark):
    # ("y", "a") appears twice: pandas refuses to reshape — the engine
    # used to silently keep F.first (silent wrong data)
    emi = pes.from_pandas(pdf).set_index(["g", "k"])
    with pytest.raises(ValueError, match="duplicate"):
        emi["v"].unstack()


def test_set_index_drop_false(pdf, spark):
    got = pes.from_pandas(pdf).set_index("k", drop=False).compute() \
        .sort_index()
    pd.testing.assert_frame_equal(got, pdf.set_index("k", drop=False)
                                  .sort_index(), check_dtype=False)


def test_set_index_drops_stale_nontrivial_index(pdf, spark):
    # a non-trivial from_pandas index must NOT leak as __index_0__ data
    d = pdf.drop_duplicates(["g", "k"])
    e = pes.from_pandas(d).set_index(["g", "k"])
    assert e.columns == ["v", "w"]
    pd.testing.assert_frame_equal(e.compute().sort_index(),
                                  d.set_index(["g", "k"]).sort_index(),
                                  check_dtype=False, check_index_type=False)


def test_truncate_labels(pdf, spark):
    srt = pdf.sort_values("k").set_index("k")
    e = pes.from_pandas(pdf.sort_values("k")).set_index("k")
    got = e.truncate(before="b", after="c").compute().sort_index()
    pd.testing.assert_frame_equal(got,
                                  srt.truncate(before="b", after="c")
                                  .sort_index(), check_dtype=False)
