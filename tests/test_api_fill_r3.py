"""Round-3 pandas API fill: Series ordered ops / index surgery /
conversions, DataFrame elementwise NA/membership, named reflected
arithmetic, linear algebra, label lookups.

Every test is differential against eager pandas on the same data.
"""

import numpy as np
import pandas as pd
import pandas.testing as tm
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({"a": [3.0, 1.0, 2.0, 5.0, 4.0, np.nan],
                         "b": list("xyzzxy"),
                         "g": [1, 1, 2, 2, 1, 2]})


@pytest.fixture(scope="module")
def df(spark, pdf):
    return pes.from_pandas(pdf)


def eq_s(ours, theirs, sort=False, **kw):
    if sort:
        ours, theirs = ours.sort_index(), theirs.sort_index()
    tm.assert_series_equal(ours, theirs, check_dtype=False,
                           check_index_type=False, **kw)


def eq_f(ours, theirs, sort=False, **kw):
    if sort:
        ours, theirs = ours.sort_index(), theirs.sort_index()
    tm.assert_frame_equal(ours, theirs, check_dtype=False,
                          check_index_type=False, **kw)


# -- Series ordered ops ------------------------------------------------
def test_series_sort_values(df, pdf):
    eq_s(df.a.sort_values().compute(), pdf.a.sort_values())
    eq_s(df.a.sort_values(ascending=False).compute(),
         pdf.a.sort_values(ascending=False))


def test_series_tail_keeps_labels(df, pdf):
    eq_s(df.a.tail(2).compute(), pdf.a.tail(2))


def test_series_take(df, pdf):
    eq_s(df.a.take([2, 0, 4]).compute(), pdf.a.take([2, 0, 4]))


def test_series_sample_n_keeps_labels(df, pdf):
    got = df.a.sample(n=3).compute()
    assert len(got) == 3
    assert set(got.index) <= set(range(6))


def test_series_duplicated(df, pdf):
    for keep in ("first", "last", False):
        eq_s(df.b.duplicated(keep).compute().sort_index(),
             pdf.b.duplicated(keep))


def test_frame_duplicated_keeps_labels(df, pdf):
    eq_s(df.duplicated(subset=["g"]).compute().sort_index(),
         pdf.duplicated(subset=["g"]))


def test_series_reset_index(df, pdf):
    eq_s(df.a.reset_index(drop=True).compute(), pdf.a.reset_index(drop=True))
    eq_f(df.a.reset_index().compute(), pdf.a.reset_index())
    eq_f(df.a.reset_index(name="v").compute(), pdf.a.reset_index(name="v"))


def test_series_equals(df):
    assert df.a.equals(df.a)
    assert not df.a.equals(df.g)


def test_series_index_surgery(df, pdf):
    idx = pdf.set_index("b")
    dfx = pes.from_pandas(idx)
    eq_s(dfx.a.drop(["x"]).compute().sort_index(),
         idx.a.drop(["x"]).sort_index())
    with pytest.raises(KeyError):
        dfx.a.drop(["nope"])
    eq_s(dfx.a.filter(like="y").compute().sort_index(),
         idx.a.filter(like="y").sort_index())
    eq_s(dfx.a.add_prefix("p_").compute().sort_index(),
         idx.a.add_prefix("p_").sort_index())
    eq_s(dfx.a.add_suffix("_s").compute().sort_index(),
         idx.a.add_suffix("_s").sort_index())


def test_series_xs_get(df, pdf):
    idx = pdf.set_index("b")
    dfx = pes.from_pandas(idx)
    # duplicate label -> sub-Series; unique label -> scalar
    eq_s(dfx.a.xs("z").compute(), idx.a.xs("z"))
    assert dfx.g.get("nope", -1) == -1


def test_series_named_reflected_arith(df, pdf):
    for name in ("radd", "rsub", "rmul", "rdiv", "rtruediv", "rpow",
                 "rmod", "rfloordiv", "mod", "floordiv", "divide",
                 "multiply", "subtract"):
        eq_s(getattr(df.a, name)(7).compute(), getattr(pdf.a, name)(7))


def test_series_named_arith_fill_value(df, pdf):
    eq_s(df.a.rsub(10, fill_value=0).compute(),
         pdf.a.rsub(10, fill_value=0))
    eq_s(df.a.mod(3, fill_value=1).compute(), pdf.a.mod(3, fill_value=1))


def test_series_divmod(df, pdf):
    q, r = df.a.divmod(3)
    pq, pr = pdf.a.divmod(3)
    eq_s(q.compute(), pq)
    eq_s(r.compute(), pr)


def test_series_agg(df, pdf):
    assert float(df.a.agg("sum").compute()) == pdf.a.agg("sum")
    eq_s(df.a.agg(["sum", "mean", "max"]).compute(),
         pdf.a.agg(["sum", "mean", "max"]))


def test_series_transform(df, pdf):
    eq_s(df.a.transform("abs").compute(), pdf.a.transform("abs"))


def test_series_case_when(df, pdf):
    eq_s(df.a.case_when([(df.a > 3, 0.0)]).compute(),
         pdf.a.case_when([(pdf.a > 3, 0.0)]))


def test_series_groupby_key_series(df, pdf):
    eq_s(df.a.groupby(df.g).sum().compute().sort_index(),
         pdf.a.groupby(pdf.g).sum().sort_index())


def test_series_groupby_level(df, pdf):
    idx = pdf.set_index("g")
    got = pes.from_pandas(idx).a.groupby(level=0).mean().compute()
    eq_s(got.sort_index(), idx.a.groupby(level=0).mean().sort_index())


def test_series_factorize(df, pdf):
    codes, uniques = df.b.factorize()
    pc, pu = pdf.b.factorize()
    assert list(codes.compute()) == list(pc)
    assert list(uniques.compute()) == list(pu)


def test_series_factorize_null():
    pdf = pd.DataFrame({"v": ["a", None, "b", "a"]})
    codes, uniques = pes.from_pandas(pdf).v.factorize()
    pc, pu = pdf.v.factorize()
    assert list(codes.compute()) == list(pc)
    assert list(uniques.compute()) == list(pu)


def test_series_searchsorted(df, pdf):
    s = df.a.sort_values()
    p = pdf.a.dropna().sort_values()
    assert s.searchsorted(2.5) == int(p.searchsorted(2.5))
    assert s.searchsorted([0.5, 3.0], side="right") == \
        list(p.searchsorted([0.5, 3.0], side="right"))


def test_series_argsort(df, pdf):
    # engine follows the FUTURE pandas behavior (NaN ordered last, not -1)
    got = df.a.argsort().compute().sort_index().tolist()
    exp = pdf.a.dropna().argsort().tolist()
    assert got[:len(exp)] == exp
    assert got[-1] == 5  # the NaN position sorts last


def test_series_update_align(df, pdf):
    s = pes.from_pandas(pd.DataFrame({"v": [1.0, 2.0, np.nan]},
                                     index=[0, 1, 2])).v
    o = pes.from_pandas(pd.DataFrame({"v": [9.0, np.nan, 8.0]},
                                     index=[1, 2, 3])).v
    ps = pd.Series([1.0, 2.0, np.nan], index=[0, 1, 2], name="v")
    po = pd.Series([9.0, np.nan, 8.0], index=[1, 2, 3], name="v")
    exp = ps.copy()
    exp.update(po)
    s.update(o)
    eq_s(s.compute().sort_index(), exp.sort_index())


def test_series_align(df):
    l = pes.from_pandas(pd.DataFrame({"v": [1.0, 2.0]}, index=[0, 1])).v
    r = pes.from_pandas(pd.DataFrame({"w": [5.0]}, index=[1])).w
    pl, pr = pd.Series([1.0, 2.0], index=[0, 1], name="v").align(
        pd.Series([5.0], index=[1], name="w"))
    al, ar = l.align(r)
    eq_s(al.compute().sort_index(), pl.sort_index())
    eq_s(ar.compute().sort_index(), pr.sort_index())


def test_series_asof(df, pdf):
    s = pes.from_pandas(pd.DataFrame({"v": [1.0, np.nan, 3.0]},
                                     index=[1, 2, 3])).v
    p = pd.Series([1.0, np.nan, 3.0], index=[1, 2, 3])
    assert s.asof(2) == p.asof(2)
    got = s.asof([0, 2, 5]).compute().sort_index()
    exp = p.asof([0, 2, 5])
    assert got.tolist()[1:] == exp.tolist()[1:]
    assert np.isnan(got.tolist()[0]) and np.isnan(exp.tolist()[0])


def test_series_eager_views(df, pdf):
    assert df.b.to_dict() == pdf.b.to_dict()
    assert list(df.g.values) == list(pdf.g.values)
    assert df.g.to_numpy().tolist() == pdf.g.to_numpy().tolist()
    assert dict(df.b.items()) == dict(pdf.b.items())
    assert df.a.hasnans and not df.b.hasnans
    assert df.a.head(1).item() == pdf.a.head(1).item()
    assert df.a.T._col_name == df.a._col_name
    assert list(df.a.keys().compute()) == list(pdf.a.keys())
    assert df.g.head(1).squeeze() == 1


def test_series_pad_backfill(df, pdf):
    eq_s(df.a.pad().compute(), pdf.a.ffill())
    eq_s(df.a.backfill().compute(), pdf.a.bfill(), sort=True)


# -- DataFrame ---------------------------------------------------------
def test_frame_isna_notna(df, pdf):
    eq_f(df.isna().compute(), pdf.isna())
    eq_f(df.notna().compute(), pdf.notna())
    eq_f(df.isnull().compute(), pdf.isnull())


def test_frame_isin(df, pdf):
    eq_f(df.isin([1.0, 2, "y"]).compute(), pdf.isin([1.0, 2, "y"]))
    eq_f(df.isin({"g": [1]}).compute(), pdf.isin({"g": [1]}))


def test_frame_transform(df, pdf):
    num = pdf[["a", "g"]]
    dfn = pes.from_pandas(num)
    eq_f(dfn.transform("sqrt").compute(), num.transform("sqrt"))
    eq_f(dfn.transform(lambda s: s * 2).compute(),
         num.transform(lambda s: s * 2))


def test_frame_named_reflected_arith(df, pdf):
    num = pdf[["a", "g"]]
    dfn = pes.from_pandas(num)
    for name in ("radd", "rsub", "rmul", "rdiv", "rpow", "rmod",
                 "rfloordiv", "divide", "multiply", "subtract", "mod",
                 "floordiv"):
        eq_f(getattr(dfn, name)(7).compute(), getattr(num, name)(7))


def test_frame_dot(df, pdf):
    num = pdf[["a", "g"]].fillna(0.0)
    dfn = pes.from_pandas(num)
    w = pd.Series({"a": 2.0, "g": 0.5})
    wdf = pes.from_pandas(pd.DataFrame({"w": [2.0, 0.5]},
                                       index=["a", "g"]))
    eq_s(dfn.dot(wdf.w).compute(), num.dot(w), check_names=False)
    m = pd.DataFrame({"x": [1.0, 0.0], "y": [1.0, 1.0]},
                     index=["a", "g"])
    eq_f(dfn.dot(pes.from_pandas(m)).compute(), num.dot(m))


def test_frame_combine(df):
    c1 = pd.DataFrame({"a": [1.0, np.nan], "b": [3.0, 4.0]})
    c2 = pd.DataFrame({"a": [5.0, 6.0], "b": [np.nan, 8.0]})
    got = pes.from_pandas(c1).combine(
        pes.from_pandas(c2),
        lambda s1, s2: s1.where(s1 > s2, s2)).compute().sort_index()
    exp = c1.combine(c2, lambda s1, s2: s1.where(s1 > s2, s2))
    eq_f(got, exp)


def test_frame_valid_index(df, pdf):
    assert df.first_valid_index() == pdf.first_valid_index()
    assert df.last_valid_index() == pdf.last_valid_index()
    pna = pd.DataFrame({"a": [np.nan, 2.0], "b": [np.nan, 3.0]})
    assert pes.from_pandas(pna).first_valid_index() == \
        pna.first_valid_index()


def test_frame_xs_asof(df, pdf):
    idx = pdf.set_index("g")
    dfx = pes.from_pandas(idx)
    # duplicate key -> frame of matches
    assert len(dfx.xs(1).compute()) == 3
    u = pdf.set_index("b", drop=True).loc[["w"]] if False else None
    tdf = pd.DataFrame({"v": [1.0, np.nan, 3.0]}, index=[10, 20, 30])
    edf = pes.from_pandas(tdf)
    eq_s(edf.asof(25), tdf.asof(25), check_names=False)
    got = edf.asof([15, 35]).compute().sort_index()
    exp = tdf.asof([15, 35])
    assert got["v"].tolist() == exp["v"].tolist()


def test_frame_reindex_like(df, pdf):
    idx = pdf.assign(b=list("uvwxyz")).set_index("b")
    sub = idx.iloc[[2, 0]]
    got = pes.from_pandas(idx).reindex_like(
        pes.from_pandas(sub)).compute().sort_index()
    eq_f(got, idx.reindex_like(sub).sort_index())


def test_frame_first_last_offset():
    tdf = pd.DataFrame(
        {"v": [1, 2, 3, 4]},
        index=pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-05", "2024-01-09"]))
    edf = pes.from_pandas(tdf)
    eq_f(edf.first("3D").compute(), tdf.first("3D"))
    eq_f(edf.last("3D").compute(), tdf.last("3D"))


def test_frame_from_dict_records_info(df, pdf, capsys):
    eq_f(pes.DataFrame.from_dict({"a": [1, 2]}).compute(),
         pd.DataFrame.from_dict({"a": [1, 2]}))
    recs = [(1, "x"), (2, "y")]
    eq_f(pes.DataFrame.from_records(recs, columns=["n", "s"]).compute(),
         pd.DataFrame.from_records(recs, columns=["n", "s"]))
    df.info()
    out = capsys.readouterr().out
    assert "3 columns" in out and "6 entries" in out


def test_frame_eager_views(df, pdf):
    assert df.to_numpy().shape == pdf.to_numpy().shape
    assert (df.values[:, 2] == pdf.values[:, 2]).all()
    assert "x" in df.to_string()
    assert df.get("nope") is None
    eq_s(df.get("a").compute(), pdf.get("a"))


def test_frame_isetitem_pad(df, pdf):
    num = pdf[["a", "g"]]
    dfn = pes.from_pandas(num)
    dfn.isetitem(1, 7)
    assert dfn.compute()["g"].tolist() == [7] * 6
    eq_f(pes.from_pandas(num).pad().compute(), num.ffill(), sort=True)
    eq_f(pes.from_pandas(num).backfill().compute(), num.bfill(), sort=True)
