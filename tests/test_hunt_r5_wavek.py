"""Round-5 hunt wave K pins: groupby-derived boolean masks, Series
__getitem__/__iter__, ewm ignore_na, frame pct_change fill, object-column
None→NaN at the compute boundary, cat.remove_unused_categories."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes


def test_filter_by_groupby_cumcount_mask():
    # d[d.groupby(g).cumcount() == 0] — the mask rides the rowid position
    # contract; previously raised "Boolean mask from another frame needs
    # an index on both sides"
    D = pd.DataFrame({"g": list("aabbcc"), "v": [1, 2, 3, 4, 5, 6]})
    e = pes.from_pandas(D)
    want = D[D.groupby("g").cumcount() == 0].reset_index(drop=True)
    got = e[e.groupby("g").cumcount() == 0].compute().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    want2 = D[D.groupby("g").ngroup() < 2].reset_index(drop=True)
    got2 = e[e.groupby("g").ngroup() < 2].compute().reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want2)


def test_series_getitem_mask_slice_label_iter():
    s = pd.Series([1.0, 5.0, 3.0], index=[10, 20, 30], name="s")
    es = pes.from_pandas(s)
    pd.testing.assert_series_equal(es[es > 2].compute(), s[s > 2])
    pd.testing.assert_series_equal(es[0:2].compute(), s[0:2])
    assert es[20] == s[20]
    assert list(es) == list(s)


def test_series_getitem_foreign_groupby_mask():
    D = pd.DataFrame({"g": list("aabbcc"), "v": [1, 2, 3, 4, 5, 6]})
    e = pes.from_pandas(D)
    want = sorted(D["v"][D.groupby("g").cumcount() == 0].tolist())
    got = sorted(e["v"][e.groupby("g").cumcount() == 0].compute().tolist())
    assert got == want


def test_ewm_ignore_na():
    x = pd.Series([1.0, np.nan, 3.0, np.nan, 5.0, 6.0], name="x")
    ex = pes.from_pandas(x)
    for adj in (True, False):
        want = x.ewm(alpha=0.3, adjust=adj, ignore_na=True).mean()
        got = ex.ewm(alpha=0.3, adjust=adj, ignore_na=True).mean().compute()
        assert np.allclose(want, got, equal_nan=True), (adj, want, got)
    # leading NaNs stay NaN
    y = pd.Series([np.nan, np.nan, 2.0, np.nan, 4.0])
    want = y.ewm(com=1, ignore_na=True).mean()
    got = pes.from_pandas(y).ewm(com=1, ignore_na=True).mean().compute()
    assert np.allclose(want, got, equal_nan=True)
    # frame form with per-column null patterns
    D = pd.DataFrame({"a": [1.0, np.nan, 3.0, 4.0],
                      "b": [np.nan, 2.0, np.nan, 8.0]})
    want = D.ewm(alpha=0.4, ignore_na=True).mean()
    got = pes.from_pandas(D).ewm(alpha=0.4, ignore_na=True).mean().compute()
    assert np.allclose(want, got, equal_nan=True)


def test_frame_pct_change_pad_fills_before_ratio():
    D = pd.DataFrame({"v": [1, 2, 3, 4, 5, 6],
                      "x": [1.0, np.nan, 3.0, np.nan, 5.0, 6.0]})
    want = D.pct_change(2)
    got = pes.from_pandas(D).pct_change(2).compute()
    pd.testing.assert_frame_equal(got, want)


def test_compute_object_missing_is_nan_not_none():
    # Arrow hands null strings back as None; pandas' missing marker in
    # object columns is NaN — outer-merge gaps must match pandas exactly
    L = pd.DataFrame({"k": [1, 3, 5], "lv": ["a", "b", "c"]})
    R = pd.DataFrame({"k": [2, 3, 6], "rv": [10., 20., 30.]})
    want = pd.merge(L, R, on="k", how="outer")
    got = (pes.from_pandas(L).merge(pes.from_pandas(R), on="k", how="outer")
           .compute())
    assert all(v is not None for v in got["lv"])  # None never surfaces
    pd.testing.assert_frame_equal(
        got.sort_values("k").reset_index(drop=True),
        want.sort_values("k").reset_index(drop=True))


def test_cat_remove_unused_categories():
    s = pd.Series(list("aabbcc"), name="g")
    es = pes.from_pandas(s)
    out = (es[es != "a"].astype("category").cat.as_known()
           .cat.remove_unused_categories())
    assert out.cat.categories == ["b", "c"]
