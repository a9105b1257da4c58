"""Round-6 hunt wave S pins: replace(NaN), str.len on arrays, cut
include_lowest, pandas-exact qcut edges, interpolate limit_direction,
ewm.var/std, positional truncate, get_dummies dummy_na, column-major
melt order, eval expression form with @refs, dot with eager pandas
weights."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


def base_df():
    return pd.DataFrame({
        "g": list("abcabca"),
        "v": [1.5, -2.5, 3.5, np.nan, 2.5, 0.5, -0.5],
        "i": [10, 3, 7, 3, 10, 1, 5],
        "s": ["New York", "ab-cd", "", "xx yy", None, "AB", "b"],
    })


def test_replace_nan_key_hits_missing():
    # `col == lit(nan)` is never true under SQL null semantics — NaN/None
    # to_replace keys must match missing values (wave-S silent-wrong-data)
    d = base_df()
    e = pes.from_pandas(d)
    got = e["v"].replace(np.nan, -1.0).compute()
    want = d["v"].replace(np.nan, -1.0)
    assert np.allclose(got.to_numpy(), want.to_numpy())
    # frame form: scalar nan → value fills the float column
    gotf = e.replace(np.nan, -9.0).compute()
    wantf = d.replace(np.nan, -9.0)
    assert np.allclose(sorted(gotf["v"]), sorted(wantf["v"]))


def test_str_len_on_findall_arrays():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["s"].str.findall(r"[a-z]+").str.len().compute()
    want = d["s"].str.findall(r"[a-z]+").str.len()
    assert [None if pd.isna(x) else int(x) for x in got] == \
        [None if pd.isna(x) else int(x) for x in want]


def test_cut_include_lowest_right_false():
    d = base_df()
    e = pes.from_pandas(d)
    got = pes.cut(e["i"], bins=[1, 5, 10], right=False,
                  include_lowest=True).astype(str).compute()
    want = pd.cut(d["i"], bins=[1, 5, 10], right=False,
                  include_lowest=True).astype(str)
    assert got.tolist() == want.tolist()
    # cut output is categorical-flavored: astype(str) renders NaN as 'nan'
    assert "nan" in got.tolist()


def test_qcut_edges_match_pandas_ulp():
    # pandas routes quantiles through np.percentile(values, q*100) whose
    # ×100 round-trip + numpy lerp shift the 2/3 edge below 7.0 — the bin
    # of the edge-exact value 7 depends on that ulp
    d = base_df()
    e = pes.from_pandas(d)
    got = pes.qcut(e["i"], 3, labels=["lo", "mid", "hi"],
                   duplicates="drop").astype(str).compute()
    want = pd.qcut(d["i"], 3, labels=["lo", "mid", "hi"],
                   duplicates="drop").astype(str)
    assert got.tolist() == want.tolist()


def test_interpolate_limit_direction():
    s = pd.Series([np.nan, 1.0, np.nan, 3.0, np.nan])
    e = pes.from_pandas(s)
    for ld in ("forward", "backward", "both"):
        got = e.interpolate(limit_direction=ld).compute()
        want = s.interpolate(limit_direction=ld)
        assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True), ld
    with pytest.raises(NotImplementedError):
        e.interpolate(limit=1, limit_direction="both")


def test_ewm_var_std():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["v"].ewm(span=3).var().compute()
    want = d["v"].ewm(span=3).var()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
    gots = e["v"].ewm(alpha=0.4).std().compute()
    wants = d["v"].ewm(alpha=0.4).std()
    assert np.allclose(gots.to_numpy(), wants.to_numpy(), equal_nan=True)


def test_truncate_positional_labels():
    d = base_df()
    e = pes.from_pandas(d)
    got = e["i"].truncate(before=2, after=5).compute()
    want = d["i"].truncate(before=2, after=5)
    assert got.tolist() == want.tolist()
    assert list(got.index) == list(want.index)


def test_get_dummies_dummy_na_and_case_guard():
    d = base_df()
    e = pes.from_pandas(d)
    s = d["s"].str.lower().str[:1]
    got = pes.get_dummies(e["s"].str.lower().str[:1], prefix="p",
                          dummy_na=True, dtype="int64").compute()
    want = pd.get_dummies(s, prefix="p", dummy_na=True, dtype="int64")
    assert list(got.columns) == list(want.columns)
    assert got.to_numpy().sum() == want.to_numpy().sum()
    # case-colliding categories raise actionably (Spark columns are
    # case-insensitive; silent merge would be wrong data)
    with pytest.raises(ValueError, match="case"):
        pes.get_dummies(e["s"].str[:1], dummy_na=True).compute()


def test_melt_column_major_order():
    d = base_df()
    e = pes.from_pandas(d)
    got = pes.melt(e[["g", "v", "i"]], id_vars="g",
                   var_name="metric", value_name="val").compute()
    want = pd.melt(d[["g", "v", "i"]], id_vars="g",
                   var_name="metric", value_name="val")
    assert got["metric"].tolist() == want["metric"].tolist()
    assert got["g"].tolist() == want["g"].tolist()
    # melt of a SORTED frame follows the presented (sorted) order
    got2 = e[["g", "i"]].sort_values("i").melt("g").compute()
    want2 = d[["g", "i"]].sort_values("i").melt("g")
    assert got2["value"].tolist() == want2["value"].tolist()


def test_eval_expression_and_at_refs():
    d = base_df()
    e = pes.from_pandas(d)
    t = 4
    got = e.eval("i > @t", local_dict={"t": t}).compute()
    want = d.eval("i > @t", local_dict={"t": t})
    assert got.tolist() == want.tolist()
    # assignment form still augments the frame
    got2 = e.eval("j = i * 2").compute()
    assert got2["j"].tolist() == (d["i"] * 2).tolist()


def test_dot_with_pandas_weights():
    d = base_df()
    e = pes.from_pandas(d)
    w = pd.Series([2.0, 0.5], index=["v", "i"])
    got = e[["v", "i"]].fillna(0).dot(w).compute()
    want = d[["v", "i"]].fillna(0).dot(w)
    assert np.allclose(got.to_numpy(), want.to_numpy())


def test_stack_row_major_order_kept():
    d = base_df()
    e = pes.from_pandas(d)
    got = e[["v", "i"]].stack().compute()
    want = d[["v", "i"]].stack()
    assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)
