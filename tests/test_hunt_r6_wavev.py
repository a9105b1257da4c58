"""Round-6 hunt wave V pins: mask-aware all/any(axis=1), comparison
methods with axis=, positional axis=0 binops, tz_localize(None), str
test kwargs (na=/case=), Series.rename(index=), n-week resample."""
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


def test_all_axis1_treats_comparison_nulls_as_false():
    # (df > 0).all(axis=1) silently skipped NaN rows (null counted True)
    d = base_df()
    e = pes.from_pandas(d)
    got = (e[["i", "v"]] > 0).all(axis=1).compute()
    want = (d[["i", "v"]] > 0).all(axis=1)
    assert got.tolist() == want.tolist()
    got_ne = (e[["i", "v"]] != 3).any(axis=1).compute()
    want_ne = (d[["i", "v"]] != 3).any(axis=1)
    assert got_ne.tolist() == want_ne.tolist()


def test_comparison_methods_axis0():
    d = base_df()
    e = pes.from_pandas(d)
    got = e[["i"]].ge(e["i"] - 5, axis=0).compute()["i"]
    want = d[["i"]].ge(d["i"] - 5, axis=0)["i"]
    assert got.tolist() == want.tolist()


def test_add_series_axis0_positional():
    d = base_df()
    e = pes.from_pandas(d)
    got = e[["i", "v"]].add(e["i"], axis=0).compute()["v"]
    want = d[["i", "v"]].add(d["i"], axis=0)["v"]
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)


def test_tz_localize_none_strips_awareness():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["d"].dt.tz_localize("UTC").dt.tz_localize(None).compute()
    want = d["d"].dt.tz_localize("UTC").dt.tz_localize(None)
    assert got.tolist() == want.tolist()
    # non-UTC zone keeps the LOCAL wall clock
    got2 = (e["d"].dt.tz_localize("UTC").dt.tz_convert("US/Eastern")
            .dt.tz_localize(None).compute())
    want2 = (d["d"].dt.tz_localize("UTC").dt.tz_convert("US/Eastern")
             .dt.tz_localize(None))
    assert got2.tolist() == want2.tolist()


def test_str_test_kwargs():
    d = base_df()
    e = pes.from_pandas(d)
    cases = [
        lambda s: s.str.startswith(("New", "ab"), na=False),
        lambda s: s.str.match(r"[a-z]+", na=False),
        lambda s: s.str.fullmatch(r"[a-z]+", na=False),
        lambda s: s.str.replace("AB", "@", case=False, regex=False),
    ]
    for fn in cases:
        got = fn(e["s"]).compute()
        want = fn(d["s"])
        assert [None if pd.isna(x) else x for x in got.tolist()] == \
            [None if pd.isna(x) else x for x in want.tolist()]


def test_series_rename_index_mapping():
    d = base_df()
    e = pes.from_pandas(d)
    got = e.set_index("g")["i"].rename(index={"a": "A"}).compute()
    want = d.set_index("g")["i"].rename(index={"a": "A"})
    assert sorted(map(str, got.index)) == sorted(map(str, want.index))


def test_resample_two_weeks():
    d = base_df()
    s = d.set_index("d").sort_index()["i"]
    e = pes.from_pandas(d).set_index("d").sort_index()["i"]
    got = e.resample("2W").sum().compute()
    want = s.resample("2W").sum()
    assert [str(i) for i in got.index] == [str(i) for i in want.index]
    assert got.tolist() == want.tolist()
    got3 = e.resample("3W").sum().compute()
    want3 = s.resample("3W").sum()
    assert got3.tolist() == want3.tolist()


def test_from_pandas_tz_roundtrip_hours():
    d = base_df()
    e = pes.from_pandas(d)
    got = (e["d"].dt.tz_localize("UTC").dt.tz_convert("US/Eastern")
           .dt.hour.compute())
    want = (d["d"].dt.tz_localize("UTC").dt.tz_convert("US/Eastern")
            .dt.hour)
    assert got.tolist() == want.tolist()
