"""Round-5 hunt wave N pins: loc setitem, string +/* semantics,
timedelta reductions and scalar boundary types."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes

D = pd.DataFrame({"g": list("abab"), "v": [1.0, 2.0, 3.0, 4.0],
                  "s": list("uvwx")})


def test_loc_setitem_full_slice_and_mask():
    want = D.copy()
    want.loc[:, "w"] = want["v"] * 3
    e = pes.from_pandas(D)
    e.loc[:, "w"] = e["v"] * 3
    pd.testing.assert_frame_equal(e.compute(), want)

    want = D.copy()
    want.loc[want["v"] > 2, "v"] = 0.0
    e = pes.from_pandas(D)
    e.loc[e["v"] > 2, "v"] = 0.0
    pd.testing.assert_frame_equal(e.compute(), want)

    # new column: unmatched rows get NaN like pandas
    want = D.copy()
    want.loc[want["v"] > 2, "flag"] = 1.0
    e = pes.from_pandas(D)
    e.loc[e["v"] > 2, "flag"] = 1.0
    pd.testing.assert_frame_equal(e.compute(), want)


def test_string_plus_concatenates_and_mul_repeats():
    e = pes.from_pandas(D)
    assert list((e["s"] + "_x").compute()) == list(D["s"] + "_x")
    assert list(("p_" + e["s"]).compute()) == list("p_" + D["s"])
    assert sorted((e["s"] + e["g"]).compute()) == sorted(D["s"] + D["g"])
    assert list((e["s"] * 3).compute()) == list(D["s"] * 3)


def test_timedelta_reductions():
    t = pd.Series(pd.date_range("2024-03-01", periods=6, freq="11h"))
    td = t - pd.Timestamp("2024-03-01")
    etd = pes.from_pandas(t) - pd.Timestamp("2024-03-01")
    # sum previously crashed: coalesce(interval, int 0) type error
    assert etd.sum().compute() == td.sum()
    got_mean = etd.mean().compute()
    assert got_mean == td.mean() and isinstance(got_mean, pd.Timedelta)
    assert isinstance(etd.max().compute(), pd.Timedelta)
