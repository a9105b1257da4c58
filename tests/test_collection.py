"""Differential tests against eager pandas (reference test strategy,
SURVEY §5 — ``tests/test_collection.py``)."""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import assert_frame_eq, assert_series_eq

import pandas_expr_spark as pes


# ---------------------------------------------------------------- milestone 0
def test_read_parquet_filter_project(spark):
    # SURVEY §7.2 minimum slice
    df = pes.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    res = df[df.l_quantity > 40][["l_orderkey", "l_extendedprice"]].compute()
    pdf = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    exp = pdf[pdf.l_quantity > 40][["l_orderkey", "l_extendedprice"]]
    assert_frame_eq(res, exp)


def test_scan_sharing_cse(spark):
    # reference combine_similar (SURVEY §4.2): same path → same scan object
    a = pes.read_parquet("/root/testdata/sf0.001/region.parquet")
    b = pes.read_parquet("/root/testdata/sf0.001/region.parquet")
    assert a.to_spark() is b.to_spark()
    assert a.expr.token == b.expr.token


def test_pushdown_reaches_scan(spark):
    df = pes.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = df[df.l_quantity > 40][["l_orderkey", "l_quantity"]]
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan
    # column pruning: scan should not read all 11 lineitem columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[-1]


# ---------------------------------------------------------------- projections
def test_projection_and_getattr(base, base_pdf):
    assert base.columns == ["x", "y"]
    assert_frame_eq(base[["y"]], base_pdf[["y"]])
    assert_series_eq(base.x, base_pdf.x)
    with pytest.raises(KeyError):
        base[["nope"]]


def test_filter(base, base_pdf):
    assert_frame_eq(base[base.x > 50], base_pdf[base_pdf.x > 50])
    assert_frame_eq(base[(base.x > 10) & (base.y < 500.0)],
                    base_pdf[(base_pdf.x > 10) & (base_pdf.y < 500.0)])
    assert_frame_eq(base[~(base.x > 50)], base_pdf[~(base_pdf.x > 50)])


def test_assign_setitem(base, base_pdf):
    out = base.assign(z=base.x + base.y, w=1)
    exp = base_pdf.assign(z=base_pdf.x + base_pdf.y, w=1)
    assert_frame_eq(out, exp)
    base["v"] = base.x * 2
    base_pdf["v"] = base_pdf.x * 2
    assert_frame_eq(base, base_pdf)


def test_drop_rename(base, base_pdf):
    assert_frame_eq(base.drop(columns=["x"]), base_pdf.drop(columns=["x"]))
    assert_frame_eq(base.rename(columns={"x": "a"}),
                    base_pdf.rename(columns={"x": "a"}))
    with pytest.raises(KeyError):
        base.drop(columns=["nope"])


def test_eval_query(base, base_pdf):
    assert_frame_eq(base.eval("z = x + y"), base_pdf.eval("z = x + y"))
    assert_frame_eq(base.query("x > 90"), base_pdf.query("x > 90"))


def test_select_dtypes(base, base_pdf):
    assert base.select_dtypes(include="int64").columns == ["x"]
    assert base.select_dtypes(include="number").columns == ["x", "y"]
    assert base.select_dtypes(exclude="float64").columns == ["x"]


# ---------------------------------------------------------------- elementwise
@pytest.mark.parametrize("op", [
    lambda s: s + 1, lambda s: 1 + s, lambda s: s - 1, lambda s: 10 - s,
    lambda s: s * 2, lambda s: s / 2, lambda s: s // 7, lambda s: s % 7,
    lambda s: s ** 2, lambda s: -s, lambda s: s.abs(),
    lambda s: s.clip(lower=10, upper=80), lambda s: s.round(0),
    lambda s: s > 50, lambda s: s <= 50, lambda s: s.between(10, 20),
    lambda s: s.isin([1, 2, 3]), lambda s: s.fillna(0),
])
def test_series_blockwise(base, base_pdf, op):
    assert_series_eq(op(base.x), op(base_pdf.x).rename("x"), check_name=False)


def test_series_binop_two_cols(base, base_pdf):
    assert_series_eq(base.x + base.y, base_pdf.x + base_pdf.y, check_name=False)
    assert_series_eq(base.x * base.y - base.x,
                     base_pdf.x * base_pdf.y - base_pdf.x, check_name=False)


def test_isna_replace_astype(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": ["x", None, "y"]})
    df = pes.from_pandas(pdf)
    assert_series_eq(df.a.isna(), pdf.a.isna(), check_name=False)
    assert_series_eq(df.a.notna(), pdf.a.notna(), check_name=False)
    assert_series_eq(df.a.fillna(0.0), pdf.a.fillna(0.0))
    # pandas: float-with-NA → int raises (IntCastingNaNError); fill first
    with pytest.raises(Exception, match="non-finite"):
        df.a.astype("int32").compute()
    assert_series_eq(df.a.fillna(0.0).astype("int32"),
                     pdf.a.fillna(0.0).astype("int32"))
    assert_series_eq(df.a.replace(1.0, 5.0), pdf.a.replace(1.0, 5.0))


def test_dropna(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": [None, None, "y"]})
    df = pes.from_pandas(pdf)
    assert_frame_eq(df.dropna(), pdf.dropna())
    assert_frame_eq(df.dropna(how="all"), pdf.dropna(how="all"))
    assert_frame_eq(df.dropna(subset=["a"]), pdf.dropna(subset=["a"]))
    assert_frame_eq(df.dropna(thresh=2), pdf.dropna(thresh=2))


def test_map_dict(base, base_pdf):
    m = {i: i * 100 for i in range(5)}
    assert_series_eq(base.x.map(m), base_pdf.x.map(m).astype("float64"),
                     check_name=False)


def test_where_mask(base, base_pdf):
    assert_series_eq(base.x.where(base.x > 50, -1),
                     base_pdf.x.where(base_pdf.x > 50, -1), check_name=False)
    assert_series_eq(base.x.mask(base.x > 50, -1),
                     base_pdf.x.mask(base_pdf.x > 50, -1), check_name=False)


# ---------------------------------------------------------------- reductions
@pytest.mark.parametrize("name", ["sum", "mean", "min", "max", "count",
                                  "var", "std", "prod", "nunique", "median"])
def test_series_reductions(base, base_pdf, name):
    got = getattr(base.x, name)().compute()
    exp = getattr(base_pdf.x, name)()
    assert got == pytest.approx(exp)


def test_any_all(spark):
    pdf = pd.DataFrame({"a": [True, False, True], "b": [True, True, True]})
    df = pes.from_pandas(pdf)
    assert df.a.any().compute() is True
    assert df.a.all().compute() is False
    assert df.b.all().compute() is True


def test_len_size(base, base_pdf):
    assert len(base) == len(base_pdf)
    assert base.size.compute() == base_pdf.size


def test_idxmin_idxmax(base, base_pdf):
    assert base.y.idxmax().compute() == base_pdf.y.idxmax()
    assert base.y.idxmin().compute() == base_pdf.y.idxmin()


def test_nunique_approx(base):
    got = base.x.nunique_approx().compute()
    assert 90 <= got <= 110


def test_mode(spark):
    pdf = pd.DataFrame({"a": [1, 2, 2, 3, 3]})
    df = pes.from_pandas(pdf)
    assert sorted(df.a.mode().compute().tolist()) == [2, 3]


def test_frame_reductions(base, base_pdf):
    got = base.sum().compute()
    exp = base_pdf.sum()
    assert got["x"] == exp["x"] and got["y"] == exp["y"]
    got = base.mean().compute()
    assert got["x"] == pytest.approx(base_pdf.x.mean())


def test_var_columns(base, base_pdf):
    got = base.var_columns().compute()
    exp = base_pdf[["x", "y"]].var(axis=1)
    assert got.reset_index(drop=True).tolist() == pytest.approx(exp.tolist())


# ------------------------------------------------------- distinct / ordering
def test_unique_value_counts(gdf, groupby_pdf):
    assert sorted(gdf.x.unique().compute().tolist()) == sorted(
        groupby_pdf.x.unique().tolist())
    got = gdf.x.value_counts().compute()
    exp = groupby_pdf.x.value_counts()
    assert got.sort_index().tolist() == exp.sort_index().tolist()


def test_drop_duplicates(gdf, groupby_pdf):
    assert_frame_eq(gdf[["x", "z"]].drop_duplicates(),
                    groupby_pdf[["x", "z"]].drop_duplicates())
    # keep="first" with positional semantics
    out = gdf.drop_duplicates(subset=["x"], keep="first").compute()
    exp = groupby_pdf.drop_duplicates(subset=["x"], keep="first")
    assert_frame_eq(out.sort_values("x").reset_index(drop=True),
                    exp.sort_values("x").reset_index(drop=True))


def test_sort_head_tail(base, base_pdf):
    got = base.sort_values("x", ascending=False).head(5).compute()
    exp = base_pdf.sort_values("x", ascending=False).head(5)
    assert_frame_eq(got.reset_index(drop=True), exp.reset_index(drop=True),
                    check_index=True)
    got = base.tail(7).compute()
    assert_frame_eq(got.reset_index(drop=True),
                    base_pdf.tail(7).reset_index(drop=True), check_index=True)


def test_nlargest_nsmallest(base, base_pdf):
    got = base.nlargest(5, "x").compute().reset_index(drop=True)
    exp = base_pdf.nlargest(5, "x").reset_index(drop=True)
    assert_frame_eq(got, exp, check_index=True)
    assert sorted(base.x.nlargest(3).compute().tolist()) == [97, 98, 99]
    assert sorted(base.x.nsmallest(3).compute().tolist()) == [0, 1, 2]


def test_sample(base):
    out = base.sample(frac=0.5, random_state=42).compute()
    assert 20 <= len(out) <= 80


def test_explode(spark):
    pdf = pd.DataFrame({"a": [1, 2], "b": [[1, 2], [3]]})
    df = pes.from_pandas(pdf)
    assert_frame_eq(df.explode("b"), pdf.explode("b").astype({"b": "int64"}))


# ----------------------------------------------------------------- index ops
def test_set_reset_index(base, base_pdf):
    out = base.set_index("x")
    exp = base_pdf.set_index("x")
    got = out.compute()
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False)
    back = out.reset_index().compute()
    assert list(back.columns) == ["x", "y"]


def test_index_property(base, base_pdf):
    idx = base.set_index("x").index
    assert sorted(idx.compute().tolist()) == sorted(base_pdf.x.tolist())


def test_head_on_unsorted(base, base_pdf):
    assert len(base.head(5).compute()) == 5


# --------------------------------------------------------------- align/combine
def test_combine_first(spark):
    pdf1 = pd.DataFrame({"a": [None, 2.0, None]}, index=[0, 1, 2])
    pdf2 = pd.DataFrame({"a": [1.0, None, 3.0]}, index=[0, 1, 2])
    d1 = pes.from_pandas(pdf1.reset_index().rename(columns={"index": "i"}).set_index("i"))
    d2 = pes.from_pandas(pdf2.reset_index().rename(columns={"index": "i"}).set_index("i"))
    got = d1.combine_first(d2).compute().sort_index()
    assert got["a"].tolist() == [1.0, 2.0, 3.0]


def test_align(spark):
    p1 = pd.DataFrame({"a": [1, 2]}, index=pd.Index([0, 1], name="i"))
    p2 = pd.DataFrame({"b": [3, 4]}, index=pd.Index([1, 2], name="i"))
    d1, d2 = pes.from_pandas(p1), pes.from_pandas(p2)
    l, r = d1.align(d2)
    lg = l.compute().sort_index()
    rg = r.compute().sort_index()
    assert len(lg) == 3 and len(rg) == 3


# ------------------------------------------------------------------ UDF path
def test_series_apply(base, base_pdf):
    got = base.x.apply(lambda v: v * 3, return_type="int64")
    assert_series_eq(got, base_pdf.x.apply(lambda v: v * 3), check_name=False)


def test_frame_apply_mapinpandas(base, base_pdf):
    out = base.apply(lambda pdf: pdf.assign(z=pdf.x + pdf.y), axis=1)
    exp = base_pdf.assign(z=base_pdf.x + base_pdf.y)
    assert_frame_eq(out, exp)


# ---------------------------------------------------------------- plan utils
def test_expr_tree_and_tokens(base):
    out = base[base.x > 3][["y"]]
    r = out.tree_repr()
    assert "projection" in r and "filter" in r
    out2 = base[base.x > 3][["y"]]
    assert out.expr.token == out2.expr.token  # deterministic identity
    ops = [e.op for e in out.expr.walk() if hasattr(e, "op")]
    assert "from_pandas" in ops


def test_str_accessor(spark):
    pdf = pd.DataFrame({"s": ["Hello World", "foo bar", "Spark"]})
    df = pes.from_pandas(pdf)
    assert_series_eq(df.s.str.upper(), pdf.s.str.upper(), check_name=False)
    assert_series_eq(df.s.str.lower(), pdf.s.str.lower(), check_name=False)
    assert_series_eq(df.s.str.len(), pdf.s.str.len(), check_name=False)
    assert_series_eq(df.s.str.contains("o"), pdf.s.str.contains("o"), check_name=False)
    assert_series_eq(df.s.str.startswith("f"), pdf.s.str.startswith("f"), check_name=False)
    assert_series_eq(df.s.str.replace("o", "0"), pdf.s.str.replace("o", "0"),
                     check_name=False)
    assert_series_eq(df.s.str.slice(0, 3), pdf.s.str.slice(0, 3), check_name=False)


def test_dt_accessor(spark):
    ts = pd.date_range("2024-01-01", periods=5, freq="37h")
    pdf = pd.DataFrame({"t": ts})
    df = pes.from_pandas(pdf)
    assert_series_eq(df.t.dt.year, pdf.t.dt.year, check_name=False)
    assert_series_eq(df.t.dt.month, pdf.t.dt.month, check_name=False)
    assert_series_eq(df.t.dt.day, pdf.t.dt.day, check_name=False)
    assert_series_eq(df.t.dt.hour, pdf.t.dt.hour, check_name=False)
    assert_series_eq(df.t.dt.dayofweek, pdf.t.dt.dayofweek, check_name=False)


def test_cat_accessor(spark):
    pdf = pd.DataFrame({"c": ["b", "a", "b", "c"]})
    df = pes.from_pandas(pdf)
    s = df.c.cat.as_known()
    assert s.cat.known
    assert s.cat.categories == ["a", "b", "c"]
    assert_series_eq(s.cat.codes, pd.Series([1, 0, 1, 2], name="c"),
                     check_name=False)
    renamed = s.cat.rename_categories({"a": "A"})
    assert renamed.cat.categories == ["A", "b", "c"]


def test_astype_category_unknown_then_known(spark):
    # astype("category") = engine metadata, unknown categories (SURVEY §1.4)
    pdf = pd.DataFrame({"c": ["b", "a", "b", "c"]})
    df = pes.from_pandas(pdf)
    s = df.c.astype("category")
    assert s.dtype == "category"
    assert not s.cat.known
    got = s.compute()
    assert str(got.dtype) == "category"
    assert sorted(got.cat.categories) == ["a", "b", "c"]
    # explicit CategoricalDtype arrives known, preserving order + orderedness
    cdt = pd.CategoricalDtype(["c", "b", "a"], ordered=True)
    s2 = df.c.astype(cdt)
    assert s2.cat.known and s2.cat.categories == ["c", "b", "a"]
    got2 = s2.compute()
    assert got2.dtype == cdt and got2.cat.ordered


def test_cat_ordered_set_reorder(spark):
    pdf = pd.DataFrame({"c": ["b", "a", "b", "c"]})
    df = pes.from_pandas(pdf)
    s = df.c.cat.as_known()
    assert not s.cat.ordered
    assert s.cat.as_ordered().cat.ordered
    assert not s.cat.as_ordered().cat.as_unordered().cat.ordered
    # set_categories nulls out-of-list values, like pandas
    sub = s.cat.set_categories(["a", "b"]).compute()
    assert sub.isna().tolist() == [False, False, False, True]
    assert list(sub.cat.categories) == ["a", "b"]
    ro = s.cat.reorder_categories(["c", "b", "a"])
    assert ro.cat.categories == ["c", "b", "a"]
    with pytest.raises(ValueError):
        s.cat.reorder_categories(["c", "b"])


def test_from_pandas_categorical_column(spark):
    pdf = pd.DataFrame({"c": pd.Categorical(["x", "y", "x"]), "v": [1, 2, 3]})
    df = pes.from_pandas(pdf)
    assert df.compute()["c"].tolist() == ["x", "y", "x"]


def test_frame_agg_dict_series_result(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0], "w": [10, 20, 30]})
    df = pes.from_pandas(pdf)
    got = df.agg({"v": "sum", "w": "max"}).compute().sort_index()
    exp = pdf.agg({"v": "sum", "w": "max"}).sort_index()
    assert got.to_dict() == exp.to_dict()


def test_frame_agg_list_frame_result(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0], "w": [10, 20, 30]})
    df = pes.from_pandas(pdf)
    got = df.agg(["sum", "mean"]).compute().sort_index()
    exp = pdf.agg(["sum", "mean"]).sort_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_names=False)


def test_frame_agg_str(spark):
    pdf = pd.DataFrame({"g": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]})
    df = pes.from_pandas(pdf)
    got = df.agg("sum").compute()
    assert got.to_dict() == {"v": 6.0}  # string column skipped


def test_squeeze_valid_index_repeat_iter(spark):
    pdf = pd.DataFrame({"k": [0, 1, 2, 3, 4],
                        "v": [None, None, 3.0, 4.0, None],
                        "w": [1, 2, 3, 4, 5]})
    df = pes.from_pandas(pdf).set_index("k")
    ref = pdf.set_index("k")
    assert isinstance(df[["v"]].squeeze(), pes.Series)
    with pytest.raises(NotImplementedError):
        df.T
    assert df["v"].first_valid_index().compute() == ref["v"].first_valid_index()
    assert df["v"].last_valid_index().compute() == ref["v"].last_valid_index()
    got = df["w"].repeat(2).compute().sort_index()
    assert got.tolist() == ref["w"].repeat(2).sort_index().tolist()
    rows = list(df.itertuples())
    assert len(rows) == 5 and {r.Index for r in rows} == {0, 1, 2, 3, 4}
    idx, ser = next(iter(df.iterrows()))
    assert isinstance(ser, pd.Series) and set(ser.index) == {"v", "w"}


# -- describe / corr / cov / cut / qcut / get_dummies ----------------------
def test_describe_matches_pandas(spark):
    pdf = pd.DataFrame({"a": [float(i) for i in range(50)],
                        "b": [float(i * 3 % 11) for i in range(50)],
                        "s": [str(i) for i in range(50)]})
    got = pes.from_pandas(pdf).describe().compute()
    exp = pdf.describe()
    for stat in ["count", "mean", "std", "min", "25%", "50%", "75%", "max"]:
        for c in ["a", "b"]:
            assert abs(got.loc[stat, c] - exp.loc[stat, c]) < 1e-9, (stat, c)


def test_series_describe(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0]})
    got = pes.from_pandas(pdf).a.describe().compute()
    exp = pdf["a"].describe()
    for stat in exp.index:
        assert abs(got.loc[stat, "a"] - exp[stat]) < 1e-12


def test_corr_cov_match_pandas(spark):
    pdf = pd.DataFrame({"a": [float(i) for i in range(40)],
                        "b": [float((i * 7) % 13) for i in range(40)],
                        "c": [float(-i) for i in range(40)]})
    got = pes.from_pandas(pdf).corr().compute()
    exp = pdf.corr()
    for a in pdf.columns:
        for b in pdf.columns:
            assert abs(got.loc[a, b] - exp.loc[a, b]) < 1e-9
    gotc = pes.from_pandas(pdf).cov().compute()
    expc = pdf.cov()
    for a in pdf.columns:
        for b in pdf.columns:
            assert abs(gotc.loc[a, b] - expc.loc[a, b]) < 1e-9


def test_cut_matches_pandas(spark):
    pdf = pd.DataFrame({"v": [0.5, 1.0, 2.5, 7.0, 9.99, 10.0, 11.0, -1.0]})
    bins = [0, 1, 5, 10]
    got = pes.from_pandas(pdf).v.cut(bins, labels=["lo", "mid", "hi"]).compute()
    exp = pd.cut(pdf["v"], bins, labels=["lo", "mid", "hi"]).astype(object)
    # missing labels surface as NaN at the boundary (pandas marker)
    assert [x if isinstance(x, str) else None for x in got] == \
        [x if isinstance(x, str) else None for x in exp]


def test_cut_interval_labels_left(spark):
    pdf = pd.DataFrame({"v": [0.0, 0.5, 1.0, 2.0]})
    got = pes.from_pandas(pdf).v.cut([0, 1, 2], right=False).compute()
    assert [x if isinstance(x, str) else None for x in got] == \
        ["[0, 1)", "[0, 1)", "[1, 2)", None]


def test_qcut_matches_pandas(spark):
    pdf = pd.DataFrame({"v": [float(i) for i in range(100)]})
    got = pes.from_pandas(pdf).v.qcut(4, labels=["q1", "q2", "q3", "q4"]).compute()
    exp = pd.qcut(pdf["v"], 4, labels=["q1", "q2", "q3", "q4"]).astype(object)
    assert list(got) == list(exp)


def test_get_dummies_matches_pandas(spark):
    pdf = pd.DataFrame({"k": ["a", "b", "a", "c"], "v": [1, 2, 3, 4]})
    got = pes.from_pandas(pdf).get_dummies(["k"]).compute()
    exp = pd.get_dummies(pdf, columns=["k"], dtype="int64")
    got = got.sort_values("v").reset_index(drop=True)[list(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_get_dummies_pinned_values_no_scan(spark):
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    got = pes.from_pandas(pdf).get_dummies(
        ["k"], values={"k": ["a", "b", "z"]}).compute()
    assert set(got.columns) == {"v", "k_a", "k_b", "k_z"}
    assert got["k_z"].sum() == 0


def test_spearman_corr_matches_pandas(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({"a": [1.0, 2.0, 2.0, 4.0, 7.0, 3.0],
                        "b": [2.0, 1.0, 5.0, 4.0, 9.0, 3.0],
                        "c": [9.0, 8.0, 1.0, 2.0, 0.5, 7.0]})
    df = from_pandas(pdf)
    got = df["a"].corr(df["b"], method="spearman").compute()
    # scipy isn't installed, so derive the pandas expectation the
    # definitional way: average ranks + Pearson
    exp = pdf["a"].rank().corr(pdf["b"].rank())
    assert abs(got - exp) < 1e-12
    gm = df.corr(method="spearman").compute().sort_index()
    em = pdf.rank().corr().sort_index()
    for c in ("a", "b", "c"):
        assert (abs(gm[c].values - em[c].values) < 1e-12).all()


def test_sample_n_exact(base):
    out = base.sample(n=17, random_state=7).compute()
    assert len(out) == 17
    assert set(out.columns) == {"x", "y"}


def test_cov_general_ddof(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({"a": [1.0, 2.0, 4.0, 8.0, 16.0],
                        "b": [3.0, 1.0, 5.0, 2.0, 8.0]})
    df = from_pandas(pdf)
    for ddof in (0, 1, 3):
        got = df.cov(ddof=ddof).compute().sort_index()
        exp = pdf.cov(ddof=ddof).sort_index()
        for c in ("a", "b"):
            assert (abs(got[c].values - exp[c].values) < 1e-9).all()


def test_str_cat_reduction_and_nbytes(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({"s": ["b", "a", "c"], "v": [1, 2, 3]},
                       index=[1, 0, 2])
    df = from_pandas(pdf)
    # ordered by the engine index → deterministic
    assert df["s"].str.cat(sep="-").compute() == "a-b-c"
    assert df["v"].nbytes.compute() == pdf["v"].nbytes
    assert df["s"].nbytes.compute() == pdf["s"].nbytes


def test_rank_preserves_index(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({"v": [3.0, 1.0, 2.0, 2.0]}, index=[10, 11, 12, 13])
    df = from_pandas(pdf)
    got = df["v"].rank().compute().sort_index()
    exp = pdf["v"].rank()
    assert got.index.tolist() == exp.index.tolist()
    assert got.tolist() == exp.tolist()


def test_parity_small_surface(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": [4.0, 5.0, 6.0]})
    df = pes.from_pandas(pdf)
    # Series.dropna
    assert df.a.dropna().compute().tolist() == [1.0, 3.0]
    # DataFrame.map elementwise (dict arg stays JVM-side)
    got = df.map({1.0: 10.0, 4.0: 40.0}).compute()
    exp = pdf.map(lambda x: {1.0: 10.0, 4.0: 40.0}.get(x))
    assert got["a"].fillna(-1).tolist() == exp["a"].fillna(-1).tolist()
    # copy + dask accessor
    cp = df.copy()
    assert cp is not df and cp.to_spark() is df.to_spark()
    assert df.dask is df.to_spark()
    # Index.to_frame
    idx = pes.from_pandas(pd.DataFrame({"v": [1, 2]}, index=[7, 9])).index
    fr = idx.to_frame(name="k").compute()
    assert sorted(fr["k"].tolist()) == [7, 9]
    # Series.memory_usage
    assert df.b.memory_usage(index=False).compute() == pdf.b.memory_usage(index=False)
    # groupby aggregate alias
    g = df.groupby("b").aggregate(n=("a", "count")).compute()
    assert len(g) == 3


def test_update_and_frame_where_mask(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]},
                       index=[0, 1, 2])
    upd = pd.DataFrame({"a": [9.0, None]}, index=[1, 2])
    df = pes.from_pandas(pdf)
    got = df.update(pes.from_pandas(upd)).compute().sort_index()
    exp = pdf.copy()
    exp.update(upd)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_names=False)
    # update mutates in place (pandas semantics): df now == exp
    pd.testing.assert_frame_equal(df.compute().sort_index(), exp,
                                  check_dtype=False, check_names=False)
    pdf = exp
    # frame-level where/mask with a same-anchor condition
    got_w = df.where(df.a > 1.5, other=-1.0).compute().sort_index()
    exp_w = pdf.where(pdf.a > 1.5, other=-1.0)
    pd.testing.assert_frame_equal(got_w, exp_w, check_dtype=False,
                                  check_names=False)
    got_m = df.mask(df.a > 1.5, other=-1.0).compute().sort_index()
    exp_m = pdf.mask(pdf.a > 1.5, other=-1.0)
    pd.testing.assert_frame_equal(got_m, exp_m, check_dtype=False,
                                  check_names=False)
    # a cond from ANOTHER frame aligns on the index (pandas semantics)
    other = pes.from_pandas(pdf)
    got_f = df.where(other.a > 1.5, other=-1.0).compute().sort_index()
    pd.testing.assert_frame_equal(got_f, exp_w, check_dtype=False,
                                  check_names=False)


def test_quantile_list_single_pass(base, base_pdf):
    got = base.y.quantile([0.25, 0.5, 0.9]).compute().sort_index()
    exp = base_pdf.y.quantile([0.25, 0.5, 0.9]).sort_index()
    assert got.index.tolist() == exp.index.tolist()
    assert got.tolist() == pytest.approx(exp.tolist())


def test_str_accessor_extended(spark):
    pdf = pd.DataFrame({"s": ["  Hello World ", "foo_bar-baz", "Spark SQL",
                              "", "a,b,c"]})
    df = pes.from_pandas(pdf)
    for op in ("strip", "lstrip", "rstrip", "title"):
        assert_series_eq(getattr(df.s.str, op)(), getattr(pdf.s.str, op)(),
                         check_name=False)
    assert_series_eq(df.s.str.endswith("c"), pdf.s.str.endswith("c"),
                     check_name=False)
    assert_series_eq(df.s.str.pad(12, side="left", fillchar="*"),
                     pdf.s.str.pad(12, side="left", fillchar="*"),
                     check_name=False)
    assert_series_eq(df.s.str.zfill(10), pdf.s.str.zfill(10),
                     check_name=False)
    assert_series_eq(df.s.str.repeat(2), pdf.s.str.repeat(2),
                     check_name=False)
    assert_series_eq(df.s.str.find("a"), pdf.s.str.find("a"),
                     check_name=False)
    got = df.s.str.split(",", regex=False).compute()
    exp = pdf.s.str.split(",", regex=False)
    assert [list(x) for x in got.sort_index()] == [list(x) for x in exp]


def test_dt_accessor_extended(spark):
    ts = pd.date_range("2023-11-30 22:15:45", periods=8, freq="53h")
    pdf = pd.DataFrame({"t": ts})
    df = pes.from_pandas(pdf)
    for fld in ("minute", "second", "dayofyear", "quarter", "week"):
        exp = getattr(pdf.t.dt, "isocalendar")().week.astype("int32") \
            if fld == "week" else getattr(pdf.t.dt, fld)
        assert_series_eq(getattr(df.t.dt, fld), exp, check_name=False)
    assert_series_eq(df.t.dt.date, pdf.t.dt.date, check_name=False)
    assert_series_eq(df.t.dt.strftime("%Y-%m-%d %H:%M"),
                     pdf.t.dt.strftime("%Y-%m-%d %H:%M"), check_name=False)
    assert_series_eq(df.t.dt.floor("D"), pdf.t.dt.floor("D"),
                     check_name=False)


def test_str_title_capitalize_semantics(spark):
    pdf = pd.DataFrame({"s": ["a,b,c", "foo_bar-baz", "HELLO world", ""]})
    df = pes.from_pandas(pdf)
    assert_series_eq(df.s.str.title(), pdf.s.str.title(), check_name=False)
    assert_series_eq(df.s.str.capitalize(), pdf.s.str.capitalize(),
                     check_name=False)


def test_merge_nan_keys_match_pandas(spark):
    pl = pd.DataFrame({"k": [1, 2, 2, None], "v": [1.0, 2.0, 3.0, 4.0]})
    pr = pd.DataFrame({"k": [2, 3, None], "w": [10.0, 20.0, 30.0]})
    for how in ("inner", "left", "right", "outer"):
        got = (pes.merge(pes.from_pandas(pl), pes.from_pandas(pr),
                         on="k", how=how).compute()
               .sort_values(["v", "w"], na_position="last")
               .reset_index(drop=True))
        exp = (pl.merge(pr, on="k", how=how)
               .sort_values(["v", "w"], na_position="last")
               .reset_index(drop=True))
        assert len(got) == len(exp), how
        for c in ("k", "v", "w"):
            assert (got[c].fillna(-9) == exp[c].fillna(-9)).all(), (how, c)


def test_idx_extreme_tie_first_label(spark):
    pt = pd.DataFrame({"v": [3.0, 3.0, 1.0, 1.0]}, index=[10, 11, 12, 9])
    df = pes.from_pandas(pt)
    # min index label among ties (pandas first-occurrence analogue)
    assert df["v"].idxmax().compute() == 10
    assert df["v"].idxmin().compute() == 9
    ps = pd.DataFrame({"s": ["b", "b", "a"]}, index=[5, 4, 3])
    assert pes.from_pandas(ps)["s"].idxmax().compute() == 4  # non-numeric path


def test_isin_null_count_nunique_semantics(spark):
    p = pd.DataFrame({"a": [1, 2, 2, 3], "b": [1.0, None, 3.0, 4.0],
                      "c": ["x", "y", "y", None]})
    d = pes.from_pandas(p)
    # pandas isin: null input -> False (never null)
    got = d["c"].isin(["x"]).compute()
    assert got.notna().all()
    assert sorted(got.tolist()) == sorted(p["c"].isin(["x"]).tolist())
    # count is int64-valued
    gc = d.count().compute()
    assert dict(gc) == dict(p.count())
    assert str(gc.dtype) == "int64"
    # frame nunique
    gn = d.nunique().compute()
    assert dict(gn) == dict(p.nunique())


def test_scalar_lazy_algebra(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    df = pes.from_pandas(pd.DataFrame({"v": [1.0, 2.0, 3.0]}))
    assert (df.v.sum() + 1).compute() == 7.0
    assert (df.v.sum() / df.v.count()).compute() == 2.0
    assert (10 - df.v.max()).compute() == 7.0
    assert (df.v.mean() > 1.5).compute() is True
    assert ((df.v.sum() - df.v.mean()) * 2).compute() == 8.0


def test_series_scalar_binop_and_filter(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0], "k": [1, 1, 2, 2]})
    df = pes.from_pandas(pdf)
    # pandas idiom: filter by an aggregate of the same frame
    out = df[df.v > df.v.mean()].compute()
    assert sorted(out.v.tolist()) == [3.0, 4.0]
    # demean with a lazy scalar
    z = (df.v - df.v.mean()).compute().sort_index()
    assert z.tolist() == [-1.5, -0.5, 0.5, 1.5]
    # scalar on the left
    z2 = (df.v.max() - df.v).compute().sort_index()
    assert z2.tolist() == [3.0, 2.0, 1.0, 0.0]


def test_module_level_wrappers(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"k": [1, 1, 2], "a": [1.0, 2.0, 3.0],
                        "b": ["x", "y", "x"]})
    df = pes.from_pandas(pdf)
    assert len(pes.melt(df, ["k", "b"]).compute()) == 3
    d = pes.get_dummies(df, ["k"], values={"k": [1, 2]}).compute()
    assert "k_1" in d.columns and "k_2" in d.columns
    pt = pes.pivot_table(df, "a", "k", "b",
                         pivot_values=["x", "y"]).compute()
    assert len(pt) == 2
    ct = pes.crosstab(df, "k", "b").compute()
    assert len(ct) == 2
    pv = pes.pivot(df[["k", "b", "a"]], index="k", columns="b",
                   values="a", pivot_values=["x", "y"]).compute()
    assert len(pv) == 2


def test_to_datetime_to_numeric_coerce(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    df = pes.from_pandas(pd.DataFrame({
        "s": ["2024-01-02 03:04:05", "oops", None],
        "n": ["1.5", "x", "3"]}))
    dt = pes.to_datetime(df.s, errors="coerce").compute()
    assert dt.notna().tolist() == [True, False, False]
    assert str(dt.iloc[0]) == "2024-01-02 03:04:05"
    nm = pes.to_numeric(df.n, errors="coerce").compute()
    assert nm.fillna(-1).tolist() == [1.5, -1.0, 3.0]
    import pytest as _pt
    with _pt.raises(Exception):
        pes.to_numeric(df.n).compute()   # ANSI raise like pandas default


def test_loc_iloc_pragmatic(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"k": [10, 20, 30, 40], "v": [1.0, 2.0, 3.0, 4.0]})
    df = pes.from_pandas(pdf).set_index("k")
    # pandas: a unique scalar label yields the ROW as a Series
    row = df.loc[20]
    assert isinstance(row, pd.Series) and row.name == 20
    assert row.v == 2.0
    assert sorted(df.loc[[10, 30]].compute().v.tolist()) == [1.0, 3.0]
    assert df.loc[df.v > 2, ["v"]].compute().v.tolist() == [3.0, 4.0]
    d2 = pes.from_pandas(pdf)
    assert d2.iloc[1:3].compute().v.tolist() == [2.0, 3.0]
    assert d2.iloc[:2, [1]].compute().columns.tolist() == ["v"]
    assert len(d2.iloc[:3].compute()) == 3


def test_frame_stat_reductions(spark):
    import numpy as np
    import pandas as pd
    import pandas_expr_spark as pes
    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({"a": rng.rand(30) * 10, "b": rng.randn(30),
                        "s": ["x"] * 30})
    df = pes.from_pandas(pdf)
    for m in ("median", "skew", "kurt", "sem"):
        got = sorted(getattr(df, m)().compute().tolist())
        exp = sorted(getattr(pdf[["a", "b"]], m)().tolist())
        np.testing.assert_allclose(got, exp, rtol=1e-9, err_msg=m)


def test_frame_quantile_prod_any_all(spark):
    import numpy as np
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 8.0], "b": [4.0, 6.0, 8.0, 2.0],
                        "c": [True, False, True, True]})
    df = pes.from_pandas(pdf)
    np.testing.assert_allclose(sorted(df.quantile(0.5).compute()),
                               sorted(pdf[["a", "b"]].quantile(0.5)))
    np.testing.assert_allclose(sorted(df.prod().compute()),
                               sorted(pdf[["a", "b"]].prod()))
    assert df[["c"]].any().compute().tolist() == [True]
    assert df[["c"]].all().compute().tolist() == [False]


@pytest.mark.parametrize("method", ["average", "min", "dense"])
def test_frame_rank(spark, method):
    import numpy as np
    import pandas as pd
    import pandas_expr_spark as pes
    rng = np.random.RandomState(4)
    pdf = pd.DataFrame({"a": rng.randint(0, 5, 20).astype(float),
                        "b": rng.rand(20), "s": ["x"] * 20})
    pdf.loc[3, "a"] = np.nan
    got = (pes.from_pandas(pdf).rank(method=method)
           .compute().sort_index()[["a", "b"]])
    exp = pdf[["a", "b"]].rank(method=method)
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)


def test_series_repeat(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"v": [1.0, 2.0]})
    got = pes.from_pandas(pdf).v.repeat(3).compute()
    assert sorted(got.tolist()) == sorted(pdf.v.repeat(3).tolist())
    assert len(pes.from_pandas(pdf).v.repeat(0).compute()) == 0


def test_simplify_lower_once_aliases(spark):
    """Reference §2.11 surface parity (`_collection.py:115-124` in the
    reference): simplify()/lower_once() exist and are no-ops under
    Catalyst — the returned collection computes identically."""
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0]})
    df = pes.from_pandas(pdf)
    assert_frame_eq(df.simplify().compute(), pdf)
    assert_frame_eq(df.lower_once().compute(), pdf)
    s = df["a"]
    assert s.simplify().sum().compute() == 6
    assert s.lower_once().sum().compute() == 6
