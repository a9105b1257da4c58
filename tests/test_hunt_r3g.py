"""Hunt wave (round-3 continuation): clip with lazy Scalar bounds,
mode(dropna=) + the null-majority mode bug, sort_values(key=),
DataFrame.nunique(axis=1), and the documented argsort NaN contract."""
import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "k": ["a", "b", "a", "c", "b", "a"],
        "v": [3.0, 1.0, None, 7.0, 2.0, 5.0],
        "i": [10, 20, 30, 40, 50, 60],
        "s": ["x", "yy", "zzz", "x", "yy", "w"],
    })


def test_clip_lazy_scalar_bound(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f["v"].clip(lower=f["v"].quantile(0.2)).compute().sort_index()
    exp = pdf["v"].clip(lower=pdf["v"].quantile(0.2))
    assert np.allclose(got.fillna(-9), exp.fillna(-9))
    got2 = f["v"].clip(lower=f["v"].min() + 1,
                       upper=f["v"].max() - 1).compute().sort_index()
    exp2 = pdf["v"].clip(lower=pdf["v"].min() + 1, upper=pdf["v"].max() - 1)
    assert np.allclose(got2.fillna(-9), exp2.fillna(-9))


def test_mode_null_majority_and_dropna(spark):
    pdf = pd.DataFrame({"v": [None, None, None, 1.0, 1.0, 2.0]})
    f = pes.from_pandas(pdf)
    # dropna=True (default): nulls must NOT win even when they dominate
    assert list(f["v"].mode().compute()) == list(pdf["v"].mode()) == [1.0]
    got = f["v"].mode(dropna=False).compute()
    exp = pdf["v"].mode(dropna=False)
    assert sorted(got.fillna(-9)) == sorted(exp.fillna(-9))


def test_sort_values_key(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.sort_values("s", key=lambda s: s.str.len()).compute()
    exp = pdf.sort_values("s", key=lambda s: s.str.len())
    assert list(got["s"]) == list(exp["s"])
    assert list(got.index) == list(exp.index)
    gs = f["i"].sort_values(ascending=False,
                            key=lambda s: s % 30).compute()
    es = pdf["i"].sort_values(ascending=False, key=lambda s: s % 30)
    assert list(gs) == list(es)


def test_nunique_axis1(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, None], "b": [1, 3, None],
                        "c": [2.0, 2.0, 4.0]})
    f = pes.from_pandas(pdf)
    got = f.nunique(axis=1).compute().sort_index()
    exp = pdf.nunique(axis=1)
    assert list(got) == list(exp)
    got2 = f.nunique(axis=1, dropna=False).compute().sort_index()
    exp2 = pdf.nunique(axis=1, dropna=False)
    assert list(got2) == list(exp2)


def test_argsort_future_nan_contract(spark, pdf):
    # engine follows pandas' ANNOUNCED future argsort semantics (NaN
    # ordered last, positions into the original) instead of the
    # deprecated masked -1 form — pinned here as the engine contract
    f = pes.from_pandas(pdf)
    got = list(f["v"].argsort().compute().sort_index())
    order = list(pdf["v"].fillna(np.inf).to_numpy().argsort(kind="stable"))
    assert got == order


def test_reindex_fill_value(spark, pdf):
    f = pes.from_pandas(pdf).set_index("i")
    got = f.reindex([10, 25, 40], fill_value=0).compute()
    exp = pdf.set_index("i").reindex([10, 25, 40], fill_value=0)
    # engine casts the fill into each column's type (string cols get "0")
    assert list(got.loc[25]) == ["0", 0.0, "0"]
    assert got.loc[25, "v"] == exp.loc[25, "v"]
    assert list(got.loc[10]) == list(exp.loc[10])
    # pre-existing NaN is NOT filled
    got2 = (pes.from_pandas(pdf).set_index("i")
            .reindex([30, 40], fill_value=-1).compute())
    assert np.isnan(got2.loc[30, "v"])
    gs = pes.from_pandas(pdf).set_index("i")["v"].reindex(
        [10, 25], fill_value=-1.0).compute()
    es = pdf.set_index("i")["v"].reindex([10, 25], fill_value=-1.0)
    assert sorted(gs) == sorted(es)


def test_explode_ignore_index(spark):
    pdf = pd.DataFrame({"l": [[1, 2], [3]], "k": ["a", "b"]})
    f = pes.from_pandas(pdf)
    gs = f["l"].explode(ignore_index=True).compute()
    es = pdf["l"].explode(ignore_index=True)
    assert sorted(gs) == sorted(es)
    gf = f.explode("l", ignore_index=True).compute()
    ef = pdf.explode("l", ignore_index=True)
    assert sorted(gf["l"]) == sorted(ef["l"])
    assert list(gf.index) == list(range(len(ef)))


def test_loc_scalar_cell(spark, pdf):
    f = pes.from_pandas(pdf).set_index("i")
    assert f.loc[20, "v"] == pdf.set_index("i").loc[20, "v"]
    # duplicated label -> Series like pandas
    p2 = pd.DataFrame({"i": [1, 1, 2], "v": [10.0, 20.0, 30.0]})
    f2 = pes.from_pandas(p2).set_index("i")
    got = f2.loc[1, "v"]
    assert sorted(got) == [10.0, 20.0]
    with pytest.raises(KeyError):
        f.loc[999, "v"]


def test_grouped_scalar_slice_window_returns_series(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.groupby("k")["v"].cummax().compute().sort_index()
    exp = pdf.groupby("k")["v"].cummax()
    assert isinstance(got, pd.Series)
    assert list(got.fillna(-9)) == list(exp.fillna(-9))
    got2 = f.groupby("k")["v"].diff().compute().sort_index()
    exp2 = pdf.groupby("k")["v"].diff()
    assert list(got2.fillna(-9)) == list(exp2.fillna(-9))
    # list slice stays a frame
    gf = f.groupby("k")[["v"]].cummax().compute()
    assert isinstance(gf, pd.DataFrame) and list(gf.columns) == ["v"]


def test_grouped_shift_fill_value(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.groupby("k")["v"].shift(1, fill_value=0).compute().sort_index()
    exp = pdf.groupby("k")["v"].shift(1, fill_value=0)
    assert list(got.fillna(-9)) == list(exp.fillna(-9))


def test_grouped_rank_pct(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.groupby("k")["v"].rank(pct=True).compute().sort_index()
    exp = pdf.groupby("k")["v"].rank(pct=True)
    assert np.allclose(got.fillna(-9), exp.fillna(-9))


def test_grouped_value_counts_dropna_normalize(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.groupby("k")["v"].value_counts().compute()
    exp = pdf.groupby("k")["v"].value_counts()
    assert sorted(got) == sorted(exp) and len(got) == len(exp)
    gn = f.groupby("k")["v"].value_counts(normalize=True).compute()
    en = pdf.groupby("k")["v"].value_counts(normalize=True)
    assert sorted(np.round(gn, 6)) == sorted(np.round(en, 6))


def test_grouped_apply_schema_inference(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.groupby("k").apply(
        lambda g: float(g["v"].fillna(0).corr(g["i"]))
        if len(g) > 1 else 0.0).compute().sort_index()
    exp = pdf.groupby("k").apply(
        lambda g: float(g["v"].fillna(0).corr(g["i"]))
        if len(g) > 1 else 0.0)
    assert np.allclose(got.fillna(-9), exp.fillna(-9))
    # frame-returning func without schema infers from the sample
    gf = f.groupby("k").apply(
        lambda g: g[["v"]].fillna(0) * 2).compute()
    ef = pdf.groupby("k").apply(lambda g: g[["v"]].fillna(0) * 2)
    assert sorted(gf["v"]) == sorted(ef["v"])


def test_float_floordiv_cpython_exact(spark):
    # hypothesis: 1.023 // -18.000000000000004 was -2.0 (quotient built
    # from the ADJUSTED mod loses a ulp); CPython builds it from the raw
    # fmod, subtracts 1.0 on sign adjust, then floors with the >0.5 fix
    cases = [(1.023070589131164, -18.000000000000004), (5e-324, -2.0),
             (1.0, 2.2e-309), (-2.9e-55, 1.0), (7.5, 2.5), (-7.5, 2.5)]
    for a, b in cases:
        f = pes.from_pandas(pd.DataFrame({"v": [b]}))
        got = f.v.rfloordiv(a).compute().iloc[0]
        exp = a // b
        assert got == exp or (np.isnan(got) and np.isnan(exp)), (a, b)


def test_round_signed_zero(spark):
    vs = [-1.401298464324817e-45, 1.5, -2.5, 0.5, -0.0, 2.5, -0.4]
    got = pes.from_pandas(pd.DataFrame({"v": vs})).v.round(0).compute()
    exp = pd.Series(vs).round(0)
    assert [str(x) for x in got.sort_index()] == [str(x) for x in exp]


def test_concat_series_stays_series(spark):
    s1 = pd.Series([1.0, 2.0], name="a")
    got = pes.concat([pes.from_pandas(s1.to_frame())["a"],
                      pes.from_pandas(s1.to_frame())["a"]]).compute()
    exp = pd.concat([s1, s1])
    assert isinstance(got, pd.Series)
    assert sorted(got) == sorted(exp) and got.name == "a"
    # mixed Series + frame stays a frame
    f = pes.concat([pes.from_pandas(s1.to_frame()),
                    pes.from_pandas(s1.to_frame())["a"]])
    assert hasattr(f, "columns")


def test_query_list_syntax(spark, pdf):
    f = pes.from_pandas(pdf)
    assert f.query("k in ['a','b']").compute().shape[0] == \
        pdf.query("k in ['a','b']").shape[0]
    assert f.query("k not in ['a']").compute().shape[0] == \
        pdf.query("k not in ['a']").shape[0]


def test_timedelta_division(spark):
    pdf = pd.DataFrame({"t": pd.to_datetime(
        ["2024-01-01", "2024-01-05", "2024-01-09", "2024-02-01"])})
    f = pes.from_pandas(pdf)
    g = ((f["t"] - pd.Timestamp("2024-01-01"))
         / pd.Timedelta(days=2)).compute().sort_index()
    e = (pdf["t"] - pd.Timestamp("2024-01-01")) / pd.Timedelta(days=2)
    assert np.allclose(g, e)
    td_e = f["t"] - pd.Timestamp("2024-01-01")
    td_p = pdf["t"] - pd.Timestamp("2024-01-01")
    g2 = (td_e / (td_e + pd.Timedelta(hours=12))).compute().sort_index()
    e2 = td_p / (td_p + pd.Timedelta(hours=12))
    assert np.allclose(g2.fillna(-9), e2.fillna(-9))


def test_fillna_series_and_allnull_group_sum(spark):
    pdf = pd.DataFrame({"k": ["a", "b", "a", "c"],
                        "v": pd.array([3.0, None, None, 7.0],
                                      dtype="float64"),
                        "i": [10, 20, 30, 40]})
    f = pes.from_pandas(pdf)
    got = f["v"].fillna(f["i"]).compute().sort_index()
    exp = pdf["v"].fillna(pdf["i"])
    assert list(got) == list(exp)
    # pandas: an all-NaN group sums to 0 / multiplies to 1
    pdf2 = pd.DataFrame({"k": ["a", "b"],
                         "v": pd.array([None, None], dtype="float64")})
    f2 = pes.from_pandas(pdf2)
    assert list(f2.groupby("k")["v"].sum().compute().sort_index()) == [0, 0]
    assert list(f2.groupby("k")["v"].prod().compute().sort_index()) == [1, 1]
    assert list(f2.groupby("k")["v"].agg("sum").compute()
                .sort_index()) == [0, 0]


def test_null_numeric_reductions_are_nan(spark):
    one = pes.from_pandas(pd.DataFrame({"v": [5.0]}))
    assert np.isnan(float(one["v"].var()))
    assert np.isnan(float(one["v"].skew()))
    assert np.isnan(float(one["v"].sem()))
    two = pes.from_pandas(pd.DataFrame({"v": [1.0, None]}))
    assert np.isnan(float(two["v"].prod(skipna=False)))
    # non-numeric null scalars still come back as None
    s = pes.from_pandas(pd.DataFrame({"s": [None], "i": [1]}))
    assert s["s"].max().compute() is None


def test_categorical_metadata_from_pandas(spark):
    pdf = pd.DataFrame({"c": pd.Categorical(["b", "a", "b", "c"],
                                            categories=["c", "b", "a"]),
                        "v": [1.0, 2, 3, 4]})
    f = pes.from_pandas(pdf)
    assert list(f["c"].cat.codes.compute().sort_index()) == \
        list(pdf["c"].cat.codes)
    assert list(f["c"].cat.categories) == list(pdf["c"].cat.categories)
    got = f.sort_values("c").compute()
    exp = pdf.sort_values("c")
    assert list(got["v"]) == list(exp["v"])
    # descending too
    got2 = f.sort_values("c", ascending=False).compute()
    exp2 = pdf.sort_values("c", ascending=False)
    assert list(got2["v"]) == list(exp2["v"])
