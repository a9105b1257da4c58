"""Round-6 hunt wave W pins: multi-column explode, frame value_counts,
dt flag family, apply(args=), groupby-resample, unstack fill_value,
crosstab values+aggfunc, stable sort-key ties."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes


def base_df():
    return pd.DataFrame({
        "g": list("abcabca"),
        "h": ["x", "y", "x", "y", "x", "y", "x"],
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
        "d": pd.to_datetime(["2024-01-31 09:30", "2024-02-29 14:00",
                             "2024-03-15 09:30", "2024-07-04 23:59",
                             "2023-12-31 00:00", "2024-06-30 12:00",
                             "2024-02-01 09:30"]),
    })


def test_explode_multi_columns():
    base = pd.DataFrame({"k": [1, 2], "a": [[1, 2], [3]],
                         "b": [["x", "y"], ["z"]]})
    got = pes.from_pandas(base).explode(["a", "b"]).compute()
    want = base.explode(["a", "b"])
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()


def test_series_apply_args_kwargs():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["i"].apply(lambda x, k, m=1: x * m + k, args=(5,),
                       m=2).compute()
    want = d["i"].apply(lambda x, k, m=1: x * m + k, args=(5,), m=2)
    assert got.tolist() == want.tolist()


def test_groupby_resample_quarterly():
    d = base_df().set_index("d").sort_index()
    e = pes.from_pandas(base_df()).set_index("d").sort_index()
    got = e.groupby("g")["i"].resample("QE").sum().compute()
    want = d.groupby("g")["i"].resample("QE").sum()
    gd = got.reset_index() if not isinstance(got, pd.DataFrame) else got
    wd = want.reset_index()
    gd = gd.sort_values(["g", "d"]).reset_index(drop=True)
    wd = wd.sort_values(["g", "d"]).reset_index(drop=True)
    assert gd["i"].tolist() == wd["i"].tolist()
    assert [str(x) for x in gd["d"]] == [str(x) for x in wd["d"]]


def test_unstack_fill_value():
    d = base_df()
    e = pes.from_pandas(d)
    got = (e.groupby(["g", "h"])["i"].sum().unstack(fill_value=0)
           .compute().reset_index())
    want = (d.groupby(["g", "h"])["i"].sum().unstack(fill_value=0)
            .reset_index())
    got = got.sort_values("g").reset_index(drop=True)
    got.columns = [str(c) for c in got.columns]
    want.columns = [str(c) for c in want.columns]
    assert got["x"].tolist() == want["x"].tolist()
    assert got["y"].tolist() == want["y"].tolist()


def test_dt_flag_family():
    d = base_df()
    e = pes.from_pandas(d)
    for flag in ("is_month_start", "is_month_end", "is_quarter_start",
                 "is_year_start", "is_year_end"):
        got = getattr(e["d"].dt, flag).compute()
        want = getattr(d["d"].dt, flag)
        assert got.tolist() == want.tolist(), flag


def test_sort_key_ties_are_stable_order():
    # pandas default quicksort tie order is implementation-defined; the
    # engine's rowid tiebreak equals pandas kind='stable'
    d = base_df()
    e = pes.from_pandas(d)
    got = e["v"].sort_values(key=lambda s: s.abs()).compute()
    want = d["v"].sort_values(key=lambda s: s.abs(), kind="stable")
    assert [str(x) for x in got.tolist()] == [str(x) for x in want.tolist()]


def test_crosstab_values_aggfunc():
    d = base_df()
    e = pes.from_pandas(d)
    got = pes.crosstab(e["g"], e["h"], values=e["i"],
                       aggfunc="sum").compute().reset_index()
    want = pd.crosstab(d["g"], d["h"], values=d["i"],
                       aggfunc="sum").reset_index()
    got.columns = [str(c) for c in got.columns]
    want.columns = [str(c) for c in want.columns]
    g = got.fillna(-1).sort_values("g").reset_index(drop=True)
    w = want.fillna(-1).sort_values("g").reset_index(drop=True)
    assert g["x"].tolist() == w["x"].tolist()
    assert g["y"].tolist() == w["y"].tolist()


def test_dedup_reset_dedup_keeps_row_order():
    # randomized-hunt seed 96: reset_index(drop=True) must KEEP row
    # order (the rowid anchor becomes the stamp, not vanish), and a
    # second dedup's positional labels follow the stamp order
    base = pd.DataFrame({"g": list("bcbaab"),
                         "v": [3.9, np.nan, -3.7, -1.0, -7.3, 6.8],
                         "i": [2, 3, 2, 2, 0, -2]})
    want = (base.drop_duplicates(subset=["g"]).reset_index(drop=True)
            .drop_duplicates(subset=["g"]))
    got = (pes.from_pandas(base).drop_duplicates(subset=["g"])
           .reset_index(drop=True).drop_duplicates(subset=["g"]).compute())
    assert got["g"].tolist() == want["g"].tolist()
    assert list(got.index) == list(want.index)


def test_dedup_concat_dedup_keeps_row_order():
    # randomized-hunt seed 24: concat must carry each input's PRESENTED
    # order through the union (arithmetic (input<<44)|pos stamp), even
    # when an input's physical layout is scrambled by a prior dedup
    base = pd.DataFrame({"g": list("bcbaabcaacab"),
                         "v": np.arange(12.0),
                         "i": [2, -5, 2, 0, -4, -1, -2, 5, 4, -3, 2, 1]})
    w1 = base.drop_duplicates(subset=["g"])
    want = pd.concat([w1, w1], ignore_index=True) \
        .drop_duplicates(subset=["g"])
    e1 = pes.from_pandas(base).drop_duplicates(subset=["g"])
    got = pes.concat([e1, e1], ignore_index=True) \
        .drop_duplicates(subset=["g"]).compute()
    assert got["g"].tolist() == want["g"].tolist()
    assert got["i"].tolist() == want["i"].tolist()
    # non-ignore_index spelling keeps duplicate original labels
    want2 = pd.concat([w1, w1])
    got2 = pes.concat([e1, e1]).compute()
    assert got2["g"].tolist() == want2["g"].tolist()
    assert list(got2.index) == list(want2.index)


def test_read_csv_header_none_positional_labels():
    import os
    import tempfile
    d = tempfile.mkdtemp()
    p = os.path.join(d, "nh.csv")
    with open(p, "w") as f:
        f.write("1,a\n2,b\n")
    got = pes.read_csv(p, header=None).compute()
    want = pd.read_csv(p, header=None)
    assert [str(c) for c in got.columns] == [str(c) for c in want.columns]
    got2 = pes.read_csv(p, header=None, names=["u", "v"]).compute()
    assert list(got2.columns) == ["u", "v"]


def test_grouped_rolling_closed():
    # grouped rolling closed= was accepted and silently ignored (same
    # class as the Series fix — maps directly to window-frame bounds)
    d = pd.DataFrame({"g": list("aabbab"), "v": [1., 2, 3, 4, 5, 6]})
    e = pes.from_pandas(d)
    for cl in ("right", "left", "both", "neither"):
        got = (e.groupby("g")["v"].rolling(2, closed=cl, min_periods=1)
               .sum().compute().reset_index(drop=True))
        want = (d.groupby("g")["v"].rolling(2, closed=cl, min_periods=1)
                .sum().reset_index(drop=True))
        assert np.allclose(got.to_numpy(), want.to_numpy(),
                           equal_nan=True), cl
