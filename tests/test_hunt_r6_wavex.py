"""Round-6 hunt wave X pins: period compute restoration, shift(axis=1),
sum min_count, expanding ddof, factorize(sort=), merge_asof tolerance,
str extras (translate/rsplit/remove*), date-range family."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes


def base_df():
    return pd.DataFrame({
        "g": list("abcabca"),
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
        "s": ["New York", "ab-cd", "", "xx yy", None, "AB", "b"],
        "d": pd.to_datetime(["2024-01-31", "2024-02-29", "2024-03-15",
                             "2024-07-04", "2023-12-31", "2024-06-30",
                             "2024-02-01"]),
    })


def test_period_values_restore_at_compute():
    # unnamed period-valued series key their metadata on None — they
    # computed as raw timestamps instead of PeriodDtype (wave X)
    got = pes.period_range("2024-01", periods=3, freq="M").compute()
    assert str(got.dtype) == "period[M]"
    assert [str(p) for p in got] == ["2024-01", "2024-02", "2024-03"]
    s = pes.from_pandas(pd.Series(pd.to_datetime(["2024-01-15",
                                                  "2024-02-10"])))
    p = s.dt.to_period("M").compute()
    assert str(p.dtype) == "period[M]"


def test_shift_axis1():
    d = base_df()
    e = pes.from_pandas(d)
    got = e[["i", "v"]].shift(1, axis=1).compute()
    want = d[["i", "v"]].shift(1, axis=1)
    assert np.allclose(got["v"].to_numpy(dtype=float),
                       want["v"].to_numpy(dtype=float), equal_nan=True)
    assert got["i"].isna().all()


def test_sum_min_count():
    d = base_df()
    e = pes.from_pandas(d)
    got = e[["v"]].sum(axis=1, min_count=1).compute()
    want = d[["v"]].sum(axis=1, min_count=1)
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
    got0 = e[["v"]].sum(min_count=10).compute()
    want0 = d[["v"]].sum(min_count=10)
    assert np.isnan(got0.iloc[0]) == np.isnan(want0.iloc[0])


def test_expanding_ddof0():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["i"].expanding().std(ddof=0).compute()
    want = d["i"].expanding().std(ddof=0)
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
    # default ddof=1 unchanged
    got1 = e["i"].expanding().var().compute()
    assert np.allclose(got1.to_numpy(),
                       d["i"].expanding().var().to_numpy(), equal_nan=True)


def test_factorize_sort():
    d = base_df()
    codes, uniq = pes.factorize(pes.from_pandas(d)["g"], sort=True)
    wcodes, wuniq = pd.factorize(d["g"], sort=True)
    assert codes.compute().tolist() == list(wcodes)
    assert uniq.compute().tolist() == list(wuniq)


def test_merge_asof_tolerance():
    left = pd.DataFrame({"t": [1, 5, 10]})
    right = pd.DataFrame({"t": [2, 4, 9], "y": [10., 20, 30]})
    got = pes.merge_asof(pes.from_pandas(left), pes.from_pandas(right),
                         on="t", tolerance=2).compute()
    want = pd.merge_asof(left, right, on="t", tolerance=2)
    assert np.allclose(got["y"].to_numpy(), want["y"].to_numpy(),
                       equal_nan=True)


def test_str_extras():
    d = base_df()
    e = pes.from_pandas(d)
    table = str.maketrans({"a": "4", "e": "3"})
    for fn in (lambda s: s.str.translate(table),
               lambda s: s.str.rsplit(" ", n=1).str.get(-1),
               lambda s: s.str.removeprefix("New ").str.removesuffix("-cd"),
               lambda s: s.str.rfind("a")):
        got = fn(e["s"]).compute()
        want = fn(d["s"])
        assert [str(x) for x in got.fillna("<NA>")] == \
            [str(x) for x in want.fillna("<NA>")]
