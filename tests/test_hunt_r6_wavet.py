"""Round-6 hunt wave T pins: rolling closed=, rolling.rank, natural-join
column order, pivot_table margins via the module wrapper + dict aggfunc,
sorted pivot/crosstab presentation, datetime DateOffset arithmetic,
period start/end_time, df.columns setter."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


def base_df():
    return pd.DataFrame({
        "g": list("abcabca"),
        "h": list("xyxyxyx"),
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
        "d": pd.to_datetime(["2024-01-31", "2024-02-29", "2024-03-15",
                             "2024-07-04", "2023-12-31", "2024-06-30",
                             "2024-02-01"]),
    })


def test_rolling_closed_variants():
    # closed= was accepted and silently IGNORED (wrong data) — now each
    # variant reduces to a window-size change + one-row result shift
    d = base_df()
    e = pes.from_pandas(d)
    for cl in ("right", "left", "both", "neither"):
        for mp in (None, 1):
            got = e["i"].rolling(3, closed=cl, min_periods=mp).sum() \
                .compute()
            want = d["i"].rolling(3, closed=cl, min_periods=mp).sum()
            assert np.allclose(got.to_numpy(), want.to_numpy(),
                               equal_nan=True), (cl, mp)
    # min/max ride the same composition
    got = e["i"].rolling(3, closed="left").min().compute()
    want = d["i"].rolling(3, closed="left").min()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)


def test_rolling_rank():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["i"].rolling(3).rank().compute()
    want = d["i"].rolling(3).rank()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
    got = e["i"].rolling(3, min_periods=1).rank(method="min").compute()
    want = d["i"].rolling(3, min_periods=1).rank(method="min")
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)


def test_merge_keys_stay_at_left_positions():
    d = base_df()
    aux = pd.DataFrame({"g": list("abd"), "w": [100.0, 200.0, 300.0],
                        "i": [10, 3, 99]})
    e, ea = pes.from_pandas(d), pes.from_pandas(aux)
    got = e.merge(ea, how="inner")            # natural join on g AND i
    want = d.merge(aux, how="inner")
    assert list(got.columns) == list(want.columns)
    got_on = e[["v", "g"]].merge(ea[["g", "w"]], on="g").compute()
    want_on = d[["v", "g"]].merge(aux[["g", "w"]], on="g")
    assert list(got_on.columns) == list(want_on.columns)  # v, g, w


def test_pivot_table_module_margins_and_dict():
    d = base_df()
    e = pes.from_pandas(d)
    got = pes.pivot_table(e, index="g", columns="h", values="i",
                          aggfunc="sum", margins=True).compute()
    want = pd.pivot_table(d, index="g", columns="h", values="i",
                          aggfunc="sum", margins=True)
    assert [str(i) for i in got.index] == [str(i) for i in want.index]
    assert np.allclose(got.to_numpy(dtype=float),
                       want.to_numpy(dtype=float), equal_nan=True)
    got2 = pes.pivot_table(e, index="g", values=["i", "v"],
                           aggfunc={"i": "sum", "v": "mean"}).compute()
    want2 = pd.pivot_table(d, index="g", values=["i", "v"],
                           aggfunc={"i": "sum", "v": "mean"})
    assert list(got2.columns) == list(want2.columns)
    assert np.allclose(got2.to_numpy(dtype=float),
                       want2.to_numpy(dtype=float), equal_nan=True)


def test_crosstab_margins_sorted_presentation():
    d = base_df()
    e = pes.from_pandas(d)
    got = pes.crosstab(e["g"], e["h"], margins=True).compute()
    want = pd.crosstab(d["g"], d["h"], margins=True)
    assert [str(i) for i in got.index] == [str(i) for i in want.index]
    assert got.to_numpy(dtype="int64").tolist() == \
        want.to_numpy(dtype="int64").tolist()


def test_pivot_sorted_presentation():
    d = base_df().drop_duplicates(subset=["g", "h"])
    e = pes.from_pandas(d)
    got = pes.pivot(e, index="g", columns="h", values="i").compute()
    want = d.pivot(index="g", columns="h", values="i")
    assert [str(i) for i in got.index] == [str(i) for i in want.index]


def test_dateoffset_arithmetic():
    d = base_df()
    e = pes.from_pandas(d)
    for off in (pd.offsets.MonthEnd(0), pd.offsets.MonthEnd(1),
                pd.offsets.MonthEnd(2), pd.offsets.MonthBegin(0),
                pd.offsets.MonthBegin(1), pd.offsets.YearEnd(0),
                pd.offsets.YearEnd(1), pd.offsets.YearBegin(0),
                pd.offsets.Day(3), pd.offsets.Hour(7), pd.offsets.Week(2)):
        got = (e["d"] + off).compute()
        want = d["d"] + off
        assert got.tolist() == want.tolist(), repr(off)
    got = (e["d"] - pd.offsets.Day(2)).compute()
    assert got.tolist() == (d["d"] - pd.offsets.Day(2)).tolist()
    with pytest.raises(NotImplementedError):
        (e["d"] - pd.offsets.MonthEnd(1)).compute()


def test_period_start_end_time():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["d"].dt.to_period("Q").dt.start_time.compute()
    want = d["d"].dt.to_period("Q").dt.start_time
    assert got.tolist() == want.tolist()
    got_e = e["d"].dt.to_period("M").dt.end_time.compute()
    want_e = d["d"].dt.to_period("M").dt.end_time
    # engine's finest unit is 1 us vs pandas 1 ns — compare to the us
    assert got_e.dt.floor("us").tolist() == \
        want_e.dt.floor("us").tolist()


def test_columns_setter():
    d = base_df()
    e = pes.from_pandas(d)[["g", "i"]]
    e.columns = ["k", "n"]
    got = e.compute()
    assert list(got.columns) == ["k", "n"]
    assert got["n"].tolist() == d["i"].tolist()
    with pytest.raises(ValueError, match="Length mismatch"):
        e.columns = ["only_one"]


def test_from_pandas_scrambled_index_positional_order():
    # positional ops follow ROW order, not label order — a from_pandas
    # frame with a non-monotonic index gets an exact presentation stamp
    s = pd.Series([10., 20, 30, 40], index=[3, 0, 2, 1])
    e = pes.from_pandas(s)
    assert e.cumsum().compute().tolist() == s.cumsum().tolist()
    got = e.rolling(2).sum().compute()
    want = s.rolling(2).sum()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
    assert list(got.index) == list(want.index)
