"""Round-6 hunt wave U pins: ordered-categorical sort, categorical
value_counts zero-fill, add_categories on unknown cats, string
to_timedelta, transform method names + per-column dicts, to_csv index=."""
from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd

import pandas_expr_spark as pes


def base_df():
    return pd.DataFrame({
        "g": list("abcabca"),
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
    })


def test_ordered_categorical_sorts_by_category_order():
    d = base_df()
    s = d["g"].astype(pd.CategoricalDtype(["c", "a", "b"], ordered=True))
    e = pes.from_pandas(d)["g"].astype(
        pd.CategoricalDtype(["c", "a", "b"], ordered=True))
    got = e.sort_values().astype(str).compute()
    want = s.sort_values().astype(str)
    assert got.tolist() == want.tolist()      # c's first, then a's, b's


def test_categorical_value_counts_zero_fills_unobserved():
    d = base_df()
    dt = pd.CategoricalDtype(["a", "b", "c", "z"])
    want = d["g"].astype(dt).value_counts()
    got = pes.from_pandas(d)["g"].astype(dt).value_counts().compute()
    assert dict(zip(got.index, got)) == dict(zip(want.index, want))
    assert got.loc["z"] == 0


def test_add_categories_discovers_unknown():
    d = base_df()
    got = pes.from_pandas(d)["g"].astype("category") \
        .cat.add_categories(["z"]).cat.categories
    want = d["g"].astype("category").cat.add_categories(["z"]) \
        .cat.categories.tolist()
    assert list(got) == want


def test_to_timedelta_strings():
    s = pd.Series(["1 days", "3 hours", None])
    got = pes.to_timedelta(pes.from_pandas(s)).dt.total_seconds().compute()
    want = pd.to_timedelta(s).dt.total_seconds()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)


def test_transform_method_names_and_dict():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["i"].transform("cumsum").compute()
    assert got.tolist() == d["i"].transform("cumsum").tolist()
    gotf = e[["i", "v"]].transform({"i": "cumsum", "v": "abs"}).compute()
    wantf = d[["i", "v"]].transform({"i": "cumsum", "v": "abs"})
    assert gotf["i"].tolist() == wantf["i"].tolist()
    assert np.allclose(gotf["v"].to_numpy(), wantf["v"].to_numpy(),
                       equal_nan=True)


def test_to_csv_index_kwarg_roundtrip():
    d = base_df()[["g", "i"]]
    e = pes.from_pandas(d)
    path = os.path.join(tempfile.mkdtemp(), "t.csv")
    e.to_csv(path, index=False)
    r = pes.read_csv(path).compute()
    assert sorted(r.columns) == ["g", "i"]
    assert int(r["i"].sum()) == int(d["i"].sum())
