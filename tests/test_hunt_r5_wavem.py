"""Round-5 hunt wave M pins: crosstab normalize/values, get_dummies
params, qcut duplicates='drop' degenerate bins, melt(ignore_index=False)."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes

D = pd.DataFrame({"g": list("aabbccab"), "h": list("xyxyxyxy"),
                  "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
                  "w": [10, 20, 30, 40, 50, 60, 70, 80]})


def _cmp(want, got):
    if isinstance(want, pd.Series):
        want, got = want.to_frame("__v__"), got.to_frame("__v__")
    w, g = want.reset_index(), got.reset_index()
    w.columns = [str(c) for c in w.columns]
    g.columns = [str(c) for c in g.columns]
    r = lambda v: repr(round(v, 9)) if isinstance(v, float) else repr(v)
    w, g = w.map(r), g.map(r)
    w = w.sort_values(list(w.columns)).reset_index(drop=True)
    g = g.sort_values(list(g.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_crosstab_normalize():
    e = pes.from_pandas(D)
    for nm in ("all", "index", "columns", True):
        want = pd.crosstab(D["g"], D["h"], normalize=nm)
        got = pes.crosstab(e["g"], e["h"], normalize=nm).compute()
        _cmp(want, got)


def test_crosstab_values_aggfunc_series():
    e = pes.from_pandas(D)
    want = pd.crosstab(D["g"], D["h"], values=D["v"], aggfunc="sum")
    got = pes.crosstab(e["g"], e["h"], values=e["v"],
                       aggfunc="sum").compute()
    _cmp(want.fillna(-9), got.fillna(-9))


def test_get_dummies_prefix_drop_first_dtype():
    e = pes.from_pandas(D)
    want = pd.get_dummies(D[["g"]], drop_first=True, dtype="int64")
    got = pes.get_dummies(e[["g"]], drop_first=True, dtype="int64").compute()
    _cmp(want, got)
    want = pd.get_dummies(D[["g"]], prefix="P", prefix_sep=".",
                          dtype="int64")
    got = pes.get_dummies(e[["g"]], prefix="P", prefix_sep=".",
                          dtype="int64").compute()
    _cmp(want, got)


def test_qcut_duplicates_drop_degenerate():
    # all quantile edges identical → pandas bins every value to NaN
    const = D["w"] * 0 + 5.0
    e = pes.from_pandas(D)
    want = pd.qcut(const, 4, duplicates="drop", labels=False)
    got = pes.qcut(e["w"] * 0 + 5.0, 4, duplicates="drop",
                   labels=False).compute()
    assert want.isna().all() and got.isna().all()


def test_melt_keep_index():
    want = D[["g", "v", "w"]].melt(id_vars="g", ignore_index=False)
    got = (pes.from_pandas(D)[["g", "v", "w"]]
           .melt(id_vars="g", ignore_index=False).compute())
    _cmp(want, got)
    # labels repeat per variable
    assert sorted(got.index) == sorted(want.index)
