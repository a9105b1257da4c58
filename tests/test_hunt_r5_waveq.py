"""Round-5 hunt wave Q pins: presentation-order semantics.

Randomized-chain differentials exposed a silent-wrong-data class: ops
that change the presented row order (sort_values, nlargest, iloc[::-1])
did not carry that order to downstream positional scans (cumsum,
pct_change, rolling), which followed the label-preserving index order
instead; and positional rowids re-attached over join-scrambled arrival
order could misalign later assigns.  The engine now stamps a hidden
presentation-order column and keeps stored rowids through alignment
joins."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes

D = pd.DataFrame({"g": list("abcabc"),
                  "v": [1.0, 5.0, 3.0, np.nan, 2.0, 4.0],
                  "k": [10, 20, 30, 40, 50, 60]})


def test_positional_scans_follow_sorted_order():
    S = pd.DataFrame({"v": [1.0, 5.0, 3.0, 2.0]})
    e = pes.from_pandas(S)
    want = S.sort_values("v", ascending=False)["v"].cumsum()
    got = e.sort_values("v", ascending=False)["v"].cumsum().compute()
    assert got.tolist() == want.tolist()
    want = S.sort_values("v", ascending=False)["v"].pct_change()
    got = e.sort_values("v", ascending=False)["v"].pct_change().compute()
    assert np.allclose(got, want, equal_nan=True)
    # labeled frames too
    Si = S.copy(); Si.index = [10, 11, 12, 13]
    want = Si.sort_values("v", ascending=False)["v"].cumsum()
    got = (pes.from_pandas(Si).sort_values("v", ascending=False)["v"]
           .cumsum().compute())
    assert got.tolist() == want.tolist()
    assert got.index.tolist() == want.index.tolist()


def test_nlargest_then_positional_ops():
    e = pes.from_pandas(D)
    want = D.nlargest(3, "v").assign(p=lambda d: d["v"].pct_change())
    got = e.nlargest(3, "v").assign(p=lambda d: d["v"].pct_change()) \
        .compute()
    assert np.allclose(got["p"], want["p"], equal_nan=True)
    assert got["v"].tolist() == want["v"].tolist()


def test_reversal_then_transform_then_head():
    e = pes.from_pandas(D)
    want = (D.iloc[::-1]
            .assign(m=lambda d: d.groupby("g")["v"].transform("mean"))
            .head(3))
    got = (e.iloc[::-1]
           .assign(m=lambda d: d.groupby("g")["v"].transform("mean"))
           .head(3).compute())
    assert got["k"].tolist() == want["k"].tolist()
    assert np.allclose(got["m"], want["m"], equal_nan=True)


def test_chained_positional_assigns_stay_aligned():
    # two positional assigns: the second must reuse the STORED rowids —
    # re-attaching over the first join's scrambled arrival order
    # misaligned rows nondeterministically
    e = pes.from_pandas(D)
    want = D.assign(cs=D["v"].cumsum())
    want = want.assign(r=want["v"].rank()).round(1)
    g = e.assign(cs=e["v"].cumsum())
    g = g.assign(r=g["v"].rank()).round(1)
    got = g.compute()
    for c in ("v", "cs", "r"):
        assert np.allclose(got[c], want[c], equal_nan=True), c
    # rank pairs with ITS row: the NaN row must have NaN rank
    nan_row = got[got["v"].isna()]
    assert nan_row["r"].isna().all()


def test_sort_then_rolling_follows_presentation():
    S = pd.DataFrame({"v": [4.0, 1.0, 3.0, 2.0]})
    e = pes.from_pandas(S)
    want = S.sort_values("v")["v"].rolling(2).sum()
    got = e.sort_values("v")["v"].rolling(2).sum().compute()
    assert np.allclose(got, want, equal_nan=True)
    assert got.index.tolist() == want.index.tolist()
