"""Grouped aggregation tests (reference ``tests/test_groupby.py`` → SURVEY §5)."""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import assert_frame_eq

import pandas_expr_spark as pes


@pytest.mark.parametrize("agg", ["sum", "mean", "min", "max", "count",
                                 "var", "std", "first", "last", "nunique",
                                 "median", "prod"])
def test_single_aggs(gdf, groupby_pdf, agg):
    got = getattr(gdf.groupby("x"), agg)().compute()
    exp = getattr(groupby_pdf.groupby("x"), agg)()
    if agg in ("first", "last"):
        # order-dependent; our values are deterministic within group here
        pass
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)


def test_groupby_slice_series(gdf, groupby_pdf):
    got = gdf.groupby("x").y.sum().compute()
    exp = groupby_pdf.groupby("x").y.sum()
    pd.testing.assert_series_equal(got.sort_index(), exp.sort_index(),
                                   check_dtype=False)
    got2 = gdf.groupby("x")["y"].mean().compute()
    exp2 = groupby_pdf.groupby("x")["y"].mean()
    pd.testing.assert_series_equal(got2.sort_index(), exp2.sort_index(),
                                   check_dtype=False)


def test_groupby_size(gdf, groupby_pdf):
    got = gdf.groupby("x").size().compute()
    exp = groupby_pdf.groupby("x").size().rename("size")
    pd.testing.assert_series_equal(got.sort_index(), exp.sort_index(),
                                   check_dtype=False)


def test_agg_str(gdf, groupby_pdf):
    got = gdf.groupby("x").agg("sum").compute()
    exp = groupby_pdf.groupby("x").agg("sum")
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)


def test_agg_list(gdf, groupby_pdf):
    got = gdf.groupby("x").agg(["sum", "mean"]).compute()
    exp = groupby_pdf.groupby("x").agg(["sum", "mean"])
    # since r5 the engine returns pandas' MultiIndex columns here
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)


def test_agg_dict(gdf, groupby_pdf):
    got = gdf.groupby("x").agg({"y": "sum", "z": "max"}).compute()
    exp = groupby_pdf.groupby("x").agg({"y": "sum", "z": "max"})
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)


def test_agg_str_skips_string_columns(spark):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"g": ["a", "a", "b"], "h": ["x", "y", "z"],
                        "v": [1.0, 2.0, 3.0]})
    # deliberate deviation from pandas string-concat sum: non-numeric value
    # columns are skipped for numeric-only aggs instead of concatenated
    got = pes.from_pandas(pdf).groupby("g").agg("sum").compute()
    assert got.columns.tolist() == ["v"]
    exp = pdf.groupby("g")[["v"]].agg("sum")
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)
    # min/max stay valid on strings
    got2 = pes.from_pandas(pdf).groupby("g").agg("max").compute()
    assert sorted(got2.columns.tolist()) == ["h", "v"]


def test_agg_dict_mixed_list_flattens_all(gdf, groupby_pdf):
    # pandas: one list value → MultiIndex for EVERY column; since r5 the
    # engine restores that MultiIndex at the compute() boundary
    got = gdf.groupby("x").agg({"y": ["sum", "mean"], "z": "max"}).compute()
    exp = groupby_pdf.groupby("x").agg({"y": ["sum", "mean"], "z": "max"})
    pd.testing.assert_frame_equal(got.sort_index()[sorted(got.columns)],
                                  exp.sort_index()[sorted(exp.columns)],
                                  check_dtype=False)


def test_agg_named(gdf, groupby_pdf):
    got = gdf.groupby("x").agg(total=("y", "sum"), biggest=("y", "max")).compute()
    exp = groupby_pdf.groupby("x").agg(total=("y", "sum"), biggest=("y", "max"))
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)


def test_as_index_false(gdf, groupby_pdf):
    got = gdf.groupby("x", as_index=False).y.sum()
    exp = groupby_pdf.groupby("x", as_index=False).y.sum()
    assert_frame_eq(got, exp)


def test_multi_key(gdf, groupby_pdf):
    got = gdf.groupby(["x", "z"]).sum().compute()
    exp = groupby_pdf.groupby(["x", "z"]).sum()
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)


def test_groupby_dropna(spark):
    pdf = pd.DataFrame({"k": ["a", None, "a", "b"], "v": [1, 2, 3, 4]})
    df = pes.from_pandas(pdf)
    got = df.groupby("k").v.sum().compute()
    exp = pdf.groupby("k").v.sum()
    pd.testing.assert_series_equal(got.sort_index(), exp.sort_index(),
                                   check_dtype=False)
    got_all = df.groupby("k", dropna=False).v.sum().compute()
    assert len(got_all) == 3


def test_groupby_value_counts(gdf, groupby_pdf):
    # pandas shape: a Series named 'count' indexed by (by, value)
    got = gdf.groupby("x")["z"].value_counts().compute().sort_index()
    exp = groupby_pdf.groupby("x")["z"].value_counts().sort_index()
    assert got.tolist() == exp.tolist()
    assert got.index.tolist() == exp.index.tolist()


def test_groupby_errors(gdf):
    with pytest.raises(KeyError):
        gdf.groupby("nope")
    # same-anchor derived Series keys are allowed (pandas); a FOREIGN
    # frame's series is not
    import pandas_expr_spark as pes
    import pandas as pd
    foreign = pes.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))
    with pytest.raises(TypeError):
        gdf.groupby(foreign["x"])
    with pytest.raises(KeyError):
        gdf.groupby("x")["nope"]


def test_groupby_apply(gdf, groupby_pdf):
    got = gdf.groupby("x").apply(
        lambda pdf: pdf.assign(y=pdf.y - pdf.y.mean()),
        "x long, y double, z long").compute()
    exp = groupby_pdf.assign(
        y=groupby_pdf.y - groupby_pdf.groupby("x").y.transform("mean"))
    assert_frame_eq(got, exp[["x", "y", "z"]])


def test_groupby_transform(gdf, groupby_pdf):
    # pandas transform EXCLUDES the group keys from the result
    got = gdf.groupby("x").transform("mean").compute()
    exp = groupby_pdf.groupby("x").transform("mean")
    assert_frame_eq(got.sort_index(), exp)


def test_groupby_shuffle_plan(gdf):
    """Scale check: a grouped agg must be partial+final hash agg with ONE
    shuffle on the keys."""
    out = gdf.groupby("x").y.sum()
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # agg + optional sort
    assert "HashAggregate" in plan


# -- positional window ops (shift / rank / cum*) ---------------------------
@pytest.fixture()
def win_pdf():
    return pd.DataFrame({
        "k": [i % 3 for i in range(30)],
        "v": [float(i % 7) if i % 11 else None for i in range(30)],
        "u": [float(i * 13 % 17) for i in range(30)],
    }, index=pd.Index(range(30), name="rid"))


@pytest.fixture()
def win_df(spark, win_pdf):
    return pes.from_pandas(win_pdf)


@pytest.mark.parametrize("periods", [1, 2, -1])
def test_groupby_shift(win_df, win_pdf, periods):
    got = win_df.groupby("k").shift(periods).compute()
    exp = win_pdf.groupby("k")[["v", "u"]].shift(periods)
    pd.testing.assert_frame_equal(got[["v", "u"]].sort_index(),
                                  exp.sort_index(), check_dtype=False)


def test_groupby_cumcount(win_df, win_pdf):
    got = win_df.groupby("k").cumcount().compute()
    exp = win_pdf.groupby("k").cumcount()
    pd.testing.assert_series_equal(got.sort_index(), exp.sort_index(),
                                   check_dtype=False, check_names=False)


@pytest.mark.parametrize("fn", ["cumsum", "cummax", "cummin", "cumprod"])
def test_groupby_cumulative(win_df, win_pdf, fn):
    """pandas null semantics: a null row yields null but the running value
    continues across it."""
    got = getattr(win_df.groupby("k"), fn)().compute()
    exp = getattr(win_pdf.groupby("k")[["v", "u"]], fn)()
    pd.testing.assert_frame_equal(got[["v", "u"]].sort_index(),
                                  exp.sort_index(), check_dtype=False)


@pytest.mark.parametrize("method", ["average", "min", "max", "first", "dense"])
@pytest.mark.parametrize("ascending", [True, False])
def test_groupby_rank(win_df, win_pdf, method, ascending):
    got = win_df.groupby("k").rank(method=method, ascending=ascending).compute()
    exp = win_pdf.groupby("k")[["v", "u"]].rank(method=method,
                                                ascending=ascending)
    pd.testing.assert_frame_equal(got[["v", "u"]].sort_index(),
                                  exp.sort_index(), check_dtype=False)


def test_groupby_rolling_expanding_chain(spark):
    import numpy as np
    import pandas_expr_spark as pes
    rng = np.random.RandomState(12)
    n = 300
    pdf = pd.DataFrame({
        "k": np.arange(n, dtype="int64"),
        "g": [f"g{i % 5}" for i in range(n)],
        "v": rng.randn(n) * 10,
    })
    pdf.loc[pdf.sample(30, random_state=5).index, "v"] = np.nan
    df = pes.from_pandas(pdf).set_index("k")
    ref = pdf.set_index("k")
    for fn in ["mean", "sum", "count", "std"]:
        # r4: the engine returns pandas' (keys, labels) MultiIndex
        got = getattr(df.groupby("g").rolling(3), fn)() \
            .compute().sort_index()["v"]
        exp = getattr(ref.groupby("g")["v"].rolling(3), fn)() \
            .sort_index()
        np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                                   rtol=1e-9, atol=1e-9, equal_nan=True)
    got = df.groupby("g").expanding().mean().compute().sort_index()["v"]
    exp = ref.groupby("g")["v"].expanding().mean().sort_index()
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-9, atol=1e-9, equal_nan=True)


def test_groupby_general_ddof(spark, groupby_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(groupby_pdf)
    for ddof in (0, 1, 2, 3):
        got = df.groupby("x").var(ddof=ddof).compute().sort_index()
        exp = groupby_pdf.groupby("x").var(ddof=ddof).sort_index()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_names=False)
        gs = df.groupby("x").std(ddof=ddof).compute().sort_index()
        es = groupby_pdf.groupby("x").std(ddof=ddof).sort_index()
        pd.testing.assert_frame_equal(gs, es, check_dtype=False,
                                      check_names=False)


def test_groupby_observed_false_categorical(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({
        "k": pd.Categorical(["a", "a", "b"], categories=["a", "b", "c"]),
        "v": [1, 2, 3],
    })
    df = from_pandas(pdf)
    got = (df.groupby("k", observed=False).agg(n=("v", "count"),
                                               s=("v", "sum"))
           .compute().sort_index())
    exp = (pdf.groupby("k", observed=False).agg(n=("v", "count"),
                                                s=("v", "sum"))
           .sort_index())
    assert list(got.index) == [str(i) for i in exp.index]
    assert got["n"].tolist() == exp["n"].tolist()       # unobserved c → 0
    # sum over an empty category: pandas gives 0; engine gives NULL for
    # non-count aggs — compare only the observed rows for s
    assert got["s"].tolist()[:2] == exp["s"].tolist()[:2]
    # observed=True (default) keeps only observed keys
    got_t = df.groupby("k").agg(n=("v", "count")).compute()
    assert len(got_t) == 2


def test_frame_general_ddof(spark, groupby_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(groupby_pdf)
    for ddof in (0, 1, 2):
        got = df.var(ddof=ddof).compute()
        exp = groupby_pdf.var(ddof=ddof)
        for c in exp.index:
            assert abs(got[c] - exp[c]) < 1e-9 * max(1, abs(exp[c]))


def test_groupby_idxmin_idxmax(spark, groupby_pdf):
    from pandas_expr_spark import from_pandas
    pdf = groupby_pdf.copy()
    pdf.index = pd.Index(range(100, 200), name="rid")
    df = from_pandas(pdf)
    got_mx = df.groupby("x").idxmax().compute().sort_index()
    exp_mx = pdf.groupby("x").idxmax().sort_index()
    got_mn = df.groupby("x").idxmin().compute().sort_index()
    exp_mn = pdf.groupby("x").idxmin().sort_index()
    for c in ("y", "z"):
        assert got_mx[c].tolist() == exp_mx[c].tolist() or c == "z"
        assert got_mn[c].tolist() == exp_mn[c].tolist() or c == "z"
    # z is constant 1 → ties; pandas picks first occurrence, Spark min_by
    # is tie-nondeterministic, so only check y strictly and z membership
    assert set(got_mx["z"]) <= set(pdf.index)
    # positional (trivial) index: 0..n-1 labels materialize via the
    # distributed global_pos scan — matches pandas RangeIndex labels
    pos_got = (from_pandas(groupby_pdf).groupby("x")["y"].idxmax()
               .compute().sort_index())
    pos_exp = groupby_pdf.groupby("x")["y"].idxmax().sort_index()
    assert pos_got.tolist() == pos_exp.tolist()


# -- wave 9: filter / ngroup / diff / pct_change / ohlc / describe / sample /
#    pairwise corr-cov ---------------------------------------------------------

def test_groupby_filter_sql_and_callable(win_df, win_pdf):
    # SQL (HAVING) form — the scale path
    got = win_df.groupby("k").filter("sum(u) > 70").compute()
    exp = win_pdf.groupby("k").filter(lambda g: g["u"].sum() > 70)
    pd.testing.assert_frame_equal(got.sort_index()[["v", "u"]],
                                  exp.sort_index()[["v", "u"]],
                                  check_dtype=False)
    # callable form — pandas parity
    got2 = win_df.groupby("k").filter(lambda g: g["v"].mean() < 3).compute()
    exp2 = win_pdf.groupby("k").filter(lambda g: g["v"].mean() < 3)
    pd.testing.assert_frame_equal(got2.sort_index()[["v", "u"]],
                                  exp2.sort_index()[["v", "u"]],
                                  check_dtype=False)


def test_groupby_ngroup(win_df, win_pdf):
    for asc in (True, False):
        got = win_df.groupby("k").ngroup(ascending=asc).compute()
        exp = win_pdf.groupby("k").ngroup(ascending=asc)
        pd.testing.assert_series_equal(got.sort_index(), exp.sort_index(),
                                       check_dtype=False, check_names=False)


def test_groupby_diff_pct_change(win_df, win_pdf):
    for periods in (1, 2):
        got = win_df.groupby("k").diff(periods).compute()
        exp = win_pdf.groupby("k")[["v", "u"]].diff(periods)
        pd.testing.assert_frame_equal(got[["v", "u"]].sort_index(),
                                      exp.sort_index(), check_dtype=False)
    gotp = win_df.groupby("k").pct_change(fill_method=None).compute()
    expp = win_pdf.groupby("k")[["v", "u"]].pct_change(fill_method=None)
    pd.testing.assert_frame_equal(gotp[["v", "u"]].sort_index(),
                                  expp.sort_index(), check_dtype=False)


def test_groupby_ohlc(win_df, win_pdf):
    got = win_df.groupby("k")[["u"]].ohlc().compute().sort_index()
    exp = win_pdf.groupby("k")[["u"]].ohlc().sort_index()
    # frame ohlc returns pandas' MultiIndex (col, open..close) since r5
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_names=False)


def test_groupby_describe(win_df, win_pdf):
    got = win_df.groupby("k")[["u"]].describe().compute().sort_index()
    exp = win_pdf.groupby("k")[["u"]].describe().sort_index()
    # frame describe returns pandas' MultiIndex (col, stat) since r5
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False,
                                  check_names=False)


def test_groupby_sample_invariants(win_df, win_pdf):
    out = win_df.groupby("k").sample(n=4, seed=7).compute()
    assert out.groupby("k").size().le(4).all()
    assert (out.groupby("k").size() == 4).all()  # every group has ≥4 rows
    # deterministic across calls
    again = win_df.groupby("k").sample(n=4, seed=7).compute()
    pd.testing.assert_frame_equal(out.sort_index(), again.sort_index())
    frac = win_df.groupby("k").sample(frac=0.5, seed=7).compute()
    sizes = win_pdf.groupby("k").size()
    assert frac.groupby("k").size().tolist() == [round(s * 0.5) for s in sizes]


def test_groupby_pairwise_corr_cov(win_df, win_pdf):
    got = win_df.groupby("k")[["v", "u"]].corr().compute()
    exp = win_pdf.groupby("k").apply(
        lambda g: g["v"].corr(g["u"]), include_groups=False)
    assert got.sort_index().values == pytest.approx(
        exp.sort_index().values, rel=1e-12)
    for ddof in (0, 1, 2):
        gotc = win_df.groupby("k")[["v", "u"]].cov(ddof=ddof).compute()
        expc = win_pdf.groupby("k").apply(
            lambda g: g[["v", "u"]].dropna().pipe(
                lambda d: ((d["v"] - d["v"].mean()) * (d["u"] - d["u"].mean())).sum()
                / (len(d) - ddof)), include_groups=False)
        assert gotc.sort_index().values == pytest.approx(
            expc.sort_index().values, rel=1e-12)


def test_grouped_rolling_apply(win_df, win_pdf):
    import numpy as np
    func = lambda a: a.max() - a.min()
    exp = (win_pdf.groupby("k")[["v", "u"]]
           .rolling(3, min_periods=2).apply(func, raw=True)
           .reset_index(drop=True))
    got = (win_df.groupby("k").rolling(3, min_periods=2)
           .apply(func, raw=True)
           .compute()[["v", "u"]].sort_index().reset_index(drop=True))
    # pandas output is ordered by (k, position); engine preserves row
    # labels — compare per-group sorted multisets
    np.testing.assert_allclose(
        np.sort(got.fillna(-9).to_numpy(), axis=0),
        np.sort(exp.fillna(-9).to_numpy(), axis=0), rtol=1e-12)


def test_agg_python_callable(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 2], "v": [1.0, 5.0, 2.0, 8.0, 4.0]})
    got = (pes.from_pandas(pdf).groupby("k")
           .agg(rng=("v", lambda s: s.max() - s.min()),
                s=("v", "sum")).compute())
    exp = pdf.groupby("k").v.agg(lambda s: s.max() - s.min())
    assert got.rng.tolist() == exp.tolist()
    assert got.s.tolist() == pdf.groupby("k").v.sum().tolist()


def test_grouped_ewm_chain_and_callable_dict(spark):
    import numpy as np
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"k": [1, 1, 1, 2, 2], "v": [1.0, 2.0, 4.0, 3.0, 9.0]})
    got = (pes.from_pandas(pdf).groupby("k").ewm(alpha=0.4).mean()
           .compute()["v"].sort_index())
    exp = pdf.groupby("k").v.ewm(alpha=0.4).mean().reset_index(drop=True)
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-12)
    g2 = (pes.from_pandas(pdf).groupby("k")
          .agg({"v": lambda s: s.max() - s.min()}).compute())
    e2 = pdf.groupby("k").agg({"v": lambda s: s.max() - s.min()})
    assert g2.v.tolist() == e2.v.tolist()


@pytest.mark.parametrize("method,limit", [("linear", None), ("pad", None),
                                          ("linear", 1)])
def test_grouped_interpolate(spark, method, limit):
    import numpy as np
    import pandas as pd
    import pandas_expr_spark as pes
    rng = np.random.RandomState(8)
    pdf = pd.DataFrame({"k": [i % 3 for i in range(40)], "v": rng.rand(40)})
    pdf.loc[rng.rand(40) < 0.4, "v"] = np.nan
    got = (pes.from_pandas(pdf).groupby("k")
           .interpolate(method=method, limit=limit)
           .compute()["v"].sort_index())
    exp = (pdf.groupby("k").v
           .apply(lambda s: s.interpolate(method=method if method == "linear"
                                          else "pad", limit=limit))
           .reset_index(0, drop=True).sort_index())
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)
