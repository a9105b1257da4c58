"""Round-4 hunt wave 5 pins: resample parity (the engine's opt-in spine
fill diverged from pandas defaults) and merge-indicator dtype.

Before the fixes:
- resample() silently DROPPED empty bins (pandas materializes the grid);
- empty-bin sums stayed null (pandas: 0.0 — the add identity);
- resample().ohlc() ordered rows inside a bin by the BUCKETED index
  value (every row ties) — open/close were arbitrary;
- groupby.resample() required on= (pandas defaults to the index);
- resample().asfreq() did not exist;
- merge(indicator=True) returned a plain string _merge column (pandas:
  categorical with fixed category order).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture
def tsdf():
    rng = np.random.RandomState(8)
    n = 25
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.sort(rng.choice(range(0, 5000), n, replace=False)), unit="min")
    return pd.DataFrame({"t": ts, "v": rng.rand(n).round(3),
                         "u": rng.choice(list("ab"), n)})


def _cmp(got, exp):
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False, check_freq=False,
        rtol=1e-12)


def test_resample_fills_empty_bins_by_default(tsdf, spark):
    e = pes.from_pandas(tsdf).set_index("t")["v"]
    p = tsdf.set_index("t")["v"]
    _cmp(e.resample("30min").sum().compute(), p.resample("30min").sum())
    _cmp(e.resample("1h").count().compute(), p.resample("1h").count())
    _cmp(e.resample("2h").mean().compute(), p.resample("2h").mean())


def test_resample_fill_empty_false_optout(tsdf, spark):
    e = pes.from_pandas(tsdf).set_index("t")["v"]
    sparse = e.resample("30min", fill_empty=False).count().compute()
    full = e.resample("30min").count().compute()
    assert len(sparse) < len(full)
    assert (sparse > 0).all()


def test_resample_ohlc_time_order(tsdf, spark):
    e = pes.from_pandas(tsdf).set_index("t")["v"]
    p = tsdf.set_index("t")["v"]
    got = e.resample("2h").ohlc().compute().sort_index()
    exp = p.resample("2h").ohlc().sort_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_index_type=False, check_freq=False)


def test_grouped_resample_on_index(tsdf, spark):
    e = pes.from_pandas(tsdf).set_index("t")
    p = tsdf.set_index("t")
    got = e.groupby("u")["v"].resample("2h").sum().compute().sort_index()
    exp = p.groupby("u")["v"].resample("2h").sum().sort_index()
    _cmp(got, exp)


def test_resample_asfreq(tsdf, spark):
    e = pes.from_pandas(tsdf).set_index("t")["v"]
    p = tsdf.set_index("t")["v"]
    _cmp(e.resample("45min").asfreq().compute(), p.resample("45min").asfreq())
    _cmp(e.resample("1h").asfreq().compute(), p.resample("1h").asfreq())


def test_merge_indicator_categorical(spark):
    a = pd.DataFrame({"k": [0, 1, 2], "v": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"k": [1, 3], "w": [7.0, 8.0]})
    got = pes.from_pandas(a).merge(pes.from_pandas(b), on="k", how="outer",
                                   indicator=True).compute()
    exp = a.merge(b, on="k", how="outer", indicator=True)
    assert got["_merge"].dtype == exp["_merge"].dtype
    assert (sorted(got["_merge"].astype(str)) ==
            sorted(exp["_merge"].astype(str)))


def test_unobserved_category_sum_identity(spark):
    pdf = pd.DataFrame({"g": pd.Categorical(["x", "x", "y"],
                                            categories=["x", "y", "z"]),
                        "v": [1.0, 2.0, 3.0]})
    e = pes.from_pandas(pdf.assign(g=pdf["g"].astype(str))) \
        .astype({"g": pdf["g"].dtype})
    got = e.groupby("g", observed=False)["v"].sum().compute().sort_index()
    exp = pdf.groupby("g", observed=False)["v"].sum().sort_index()
    assert got.tolist() == exp.tolist()      # unobserved 'z' → 0.0


# ---- groupby agg-spec probe finds ----
def test_grouped_idx_extreme_tie_first_occurrence(spark):
    # duplicate extreme values: pandas returns the FIRST occurrence's
    # label; bare min_by/max_by left the tie arbitrary (silent wrong
    # labels — found by the wave-5 probe battery)
    rng = np.random.RandomState(99)
    pdf = pd.DataFrame({"g": rng.choice(list("xyz"), 20),
                        "v": rng.rand(20).round(3),
                        "w": rng.randint(0, 9, 20)})
    e = pes.from_pandas(pdf)
    for op in ("idxmin", "idxmax"):
        got = getattr(e.groupby("g")[["v", "w"]], op)().compute() \
            .sort_index()
        exp = getattr(pdf.groupby("g")[["v", "w"]], op)().sort_index()
        assert got["w"].tolist() == exp["w"].tolist(), op
        assert got["v"].tolist() == exp["v"].tolist(), op


def test_series_groupby_agg_callable(spark):
    pdf = pd.DataFrame({"g": list("xyxzy"), "v": [1.0, 5.0, 3.0, 2.0, 9.0]})
    e = pes.from_pandas(pdf)
    got = e.groupby("g")["v"].agg(lambda s: s.max() - s.min()).compute() \
        .sort_index()
    exp = pdf.groupby("g")["v"].agg(lambda s: s.max() - s.min()).sort_index()
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy())


# ---- wave 6: rolling order-stats, frame apply axis, grouped window MI ----
def test_rolling_order_stats(spark):
    rng = np.random.RandomState(314)
    pdf = pd.DataFrame({"b": rng.randn(18).round(3)})
    e = pes.from_pandas(pdf)["b"]
    p = pdf["b"]
    for name, eg, xg in [
        ("median", lambda: e.rolling(4).median(), lambda: p.rolling(4).median()),
        ("quantile", lambda: e.rolling(4).quantile(0.25),
         lambda: p.rolling(4).quantile(0.25)),
        ("skew", lambda: e.rolling(5).skew(), lambda: p.rolling(5).skew()),
        ("kurt", lambda: e.rolling(6).kurt(), lambda: p.rolling(6).kurt()),
        ("sem", lambda: e.rolling(5).sem(), lambda: p.rolling(5).sem()),
    ]:
        got = eg().compute().sort_index()
        exp = xg()
        np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                                   rtol=1e-9, equal_nan=True, err_msg=name)


def test_frame_apply_axis0_default(spark):
    pdf = pd.DataFrame({"a": [1.0, 5.0, 3.0], "b": [10.0, 2.0, 8.0]})
    e = pes.from_pandas(pdf)
    got = e.apply(lambda s: s.max() - s.min()).compute().sort_index()
    exp = pdf.apply(lambda s: s.max() - s.min()).sort_index()
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy())


def test_grouped_window_chain_multiindex(spark):
    pdf = pd.DataFrame({"g": list("xyxyx"), "b": [1.0, 2.0, 3.0, 4.0, 5.0]})
    e = pes.from_pandas(pdf)
    # pandas: groupby.rolling/ewm/expanding prepend the keys to the index
    for eg, xg in [
        (lambda: e.groupby("g")["b"].rolling(2).sum(),
         lambda: pdf.groupby("g")["b"].rolling(2).sum()),
        (lambda: e.groupby("g")["b"].ewm(span=3).mean(),
         lambda: pdf.groupby("g")["b"].ewm(span=3).mean()),
        (lambda: e.groupby("g")[["b"]].expanding(2).mean(),
         lambda: pdf.groupby("g")[["b"]].expanding(2).mean()),
    ]:
        got, exp = eg().compute(), xg()
        assert got.index.nlevels == exp.index.nlevels == 2
        g, x = got.sort_index(), exp.sort_index()
        if isinstance(exp, pd.Series):
            np.testing.assert_allclose(g.to_numpy(), x.to_numpy(),
                                       equal_nan=True)
        else:
            np.testing.assert_allclose(g["b"].to_numpy(),
                                       x["b"].to_numpy(), equal_nan=True)
        assert g.index.tolist() == x.index.tolist()


def test_from_dummies_roundtrip(spark):
    pdf = pd.DataFrame({"g": ["x", "y", "x", "z"], "v": [1, 2, 3, 4]})
    dummies = pd.get_dummies(pdf, columns=["g"], dtype="int64")
    e = pes.from_pandas(dummies)
    got = pes.from_dummies(e[["g_x", "g_y", "g_z"]]).compute().sort_index()
    exp = pd.from_dummies(dummies[["g_x", "g_y", "g_z"]], sep="_")
    assert got["g"].tolist() == exp["g"].tolist()
    # default_category for all-zero rows
    z = dummies.copy()
    z.loc[0, ["g_x", "g_y", "g_z"]] = 0
    got2 = pes.from_dummies(pes.from_pandas(z)[["g_x", "g_y", "g_z"]],
                            default_category="none").compute().sort_index()
    assert got2["g"].tolist() == ["none", "y", "x", "z"]


def test_frame_T_guard(spark):
    e = pes.from_pandas(pd.DataFrame({"a": [1]}))
    with pytest.raises(NotImplementedError, match="transpose"):
        e.T


def test_merge_asof_preserves_left_order(spark):
    left = pd.DataFrame({"t": [1, 5, 10, 15], "lv": list("abcd")})
    right = pd.DataFrame({"t": [2, 5, 11], "rv": [10.0, 20.0, 30.0]})
    L, R = pes.from_pandas(left), pes.from_pandas(right)
    for kw in ({"direction": "forward", "tolerance": 2},
               {"direction": "nearest", "tolerance": 3},
               {"allow_exact_matches": False},
               {}):
        # pandas: fresh RangeIndex in LEFT order.  The engine carries the
        # left POSITIONS as the row labels (order itself is deferred
        # presentation — sort_index() restores it exactly)
        got = pes.merge_asof(L, R, on="t", **kw).compute().sort_index()
        exp = pd.merge_asof(left, right, on="t", **kw)
        assert got.index.tolist() == exp.index.tolist(), kw
        assert got["t"].tolist() == exp["t"].tolist(), kw
        assert got["lv"].tolist() == exp["lv"].tolist(), kw
        assert got["rv"].fillna(-1).tolist() == \
            exp["rv"].fillna(-1).tolist(), kw


def test_str_casefold_full_unicode(spark):
    s = pd.Series(["Hello", "ümlaut ß", "ﬁn", None])
    e = pes.from_pandas(s.to_frame("x"))["x"]
    got = e.str.casefold().compute().sort_index()
    exp = s.str.casefold()
    assert [x if isinstance(x, str) else None for x in got] == \
        [x if isinstance(x, str) else None for x in exp]  # ß→ss, ﬁ→fi


def test_series_groupby_transform_callable_is_series(spark):
    pdf = pd.DataFrame({"g": list("xyxy"), "v": [1.0, 2.0, 3.0, 4.0]})
    e = pes.from_pandas(pdf)
    got = e.groupby("g")["v"].transform(lambda s: s - s.mean())
    exp = pdf.groupby("g")["v"].transform(lambda s: s - s.mean())
    gc = got.compute().sort_index()
    assert isinstance(gc, pd.Series)
    np.testing.assert_allclose(gc.to_numpy(), exp.to_numpy())


# ---- wave 12: empty frames + chained compositions ----
def test_foreign_boolean_mask_aligns(spark):
    pdf = pd.DataFrame({"g": list("xyz"), "v": [1.0, 5.0, 3.0]})
    e1 = pes.from_pandas(pdf)
    e2 = pes.from_pandas(pdf)          # a genuinely different frame
    got = e1[e2["v"] > 2.0].compute().sort_values("v") \
        .reset_index(drop=True)
    # default-index filters relabel positionally (engine-wide contract:
    # the raw predicate stays pushdown-eligible); VALUES must match
    exp = pdf[pdf["v"] > 2.0].sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # indexed frames align on labels; missing labels are False
    a = pdf.set_index("g")
    mask = pd.Series({"z": True, "x": False, "q": True})
    em = pes.from_pandas(mask.to_frame("m"))["m"]
    got2 = pes.from_pandas(pdf).set_index("g")[em].compute()
    exp2 = a[mask.reindex(a.index, fill_value=False)]
    assert sorted(got2.index.tolist()) == sorted(exp2.index.tolist())


def test_str_split_empty_pattern(spark):
    s = pd.Series(["xx", "a", ""])
    e = pes.from_pandas(s.to_frame("x"))["x"]
    got = [list(x) for x in e.str.split("").compute().sort_index()]
    exp = s.str.split("").tolist()
    assert got == exp                     # ['', 'x', 'x', ''] edges


def test_pivot_table_columns_name(spark):
    pdf = pd.DataFrame({"g": list("xyxy"), "c": list("abab"),
                        "v": [1.0, 2.0, 3.0, 4.0]})
    got = pes.pivot_table(pes.from_pandas(pdf), values="v", index="g",
                          columns="c", aggfunc="mean").compute()
    exp = pd.pivot_table(pdf, values="v", index="g", columns="c",
                         aggfunc="mean")
    assert got.columns.name == exp.columns.name == "c"
