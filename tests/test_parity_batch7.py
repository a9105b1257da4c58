"""Differential wave 7 (vs eager pandas): sort orders, astype round trips,
value_counts dropna, quantile interpolation, index-join merges, where/mask,
groupby dict-of-list aggs, sort_index descending."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def pdf7():
    rng = np.random.RandomState(23)
    n = 150
    return pd.DataFrame({
        "g": [f"g{i % 6}" for i in range(n)],
        "x": [float(v) if v % 5 else np.nan
              for v in rng.randint(0, 40, n)],
        "v": rng.randint(-20, 20, n).astype("int64"),
    })


@pytest.fixture()
def df7(spark, pdf7):
    from pandas_expr_spark import from_pandas
    return from_pandas(pdf7)


def test_sort_values_multi_key_na_position(df7, pdf7):
    for asc, napos in [([True, False], "last"), ([False, True], "first")]:
        got = (df7.sort_values(["g", "x"], ascending=asc, na_position=napos)
               .compute().reset_index(drop=True))
        exp = (pdf7.sort_values(["g", "x"], ascending=asc, na_position=napos)
               .reset_index(drop=True))
        assert got["g"].tolist() == exp["g"].tolist()
        np.testing.assert_allclose(got["x"].fillna(-999).values,
                                   exp["x"].fillna(-999).values)


def test_astype_round_trips(df7, pdf7):
    got = df7.v.astype("string").astype("int64").compute().sort_index()
    exp = pdf7.v.astype("string").astype("int64")
    assert got.tolist() == exp.tolist()
    got = df7.v.astype("float64").compute().sort_index()
    assert got.tolist() == pdf7.v.astype("float64").tolist()
    # float -> int truncates toward zero in pandas; engine must match
    f = pdf7.assign(f=pdf7.v * 1.7)
    from pandas_expr_spark import from_pandas
    got = from_pandas(f).f.astype("int64").compute().sort_index()
    assert got.tolist() == f.f.astype("int64").tolist()


def test_value_counts_dropna_false(df7, pdf7):
    got = df7.x.value_counts(dropna=False).compute()
    exp = pdf7.x.value_counts(dropna=False)
    gd = {(-999.0 if pd.isna(k) else k): v for k, v in got.to_dict().items()}
    ed = {(-999.0 if pd.isna(k) else k): v for k, v in exp.to_dict().items()}
    assert gd == ed


def test_quantile_interpolations(df7, pdf7):
    for interp in ["linear", "lower", "higher", "nearest", "midpoint"]:
        got = float(df7.v.quantile(0.37, interpolation=interp))
        exp = float(pdf7.v.quantile(0.37, interpolation=interp))
        assert got == pytest.approx(exp), interp


def test_merge_on_index(spark):
    import pandas_expr_spark as pes
    a = pd.DataFrame({"v": [1, 2, 3]}, index=pd.Index([10, 20, 30], name="k"))
    b = pd.DataFrame({"w": [5, 6]}, index=pd.Index([20, 30], name="k"))
    got = (pes.from_pandas(a).merge(pes.from_pandas(b), left_index=True,
                                    right_index=True)
           .compute().sort_index())
    exp = a.merge(b, left_index=True, right_index=True).sort_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_series_where_mask(df7, pdf7):
    got = df7.v.where(df7.v > 0, -1).compute().sort_index()
    exp = pdf7.v.where(pdf7.v > 0, -1)
    assert got.tolist() == exp.tolist()
    got = df7.v.mask(df7.v > 0).compute().sort_index()
    exp = pdf7.v.mask(pdf7.v > 0)
    np.testing.assert_allclose(got.fillna(-99).values, exp.fillna(-99).values)


def test_groupby_agg_dict_of_lists(df7, pdf7):
    got = (df7.groupby("g").agg({"v": ["sum", "max"], "x": "mean"})
           .compute().sort_index())
    exp = pdf7.groupby("g").agg({"v": ["sum", "max"], "x": "mean"})
    # engine returns pandas' MultiIndex columns since r5
    np.testing.assert_allclose(
        np.asarray(got[sorted(got.columns)], dtype=float),
        np.asarray(exp[sorted(exp.columns)], dtype=float))


def test_sort_index_descending(df7, pdf7):
    got = df7.set_index("v").sort_index(ascending=False).compute()
    exp = pdf7.set_index("v").sort_index(ascending=False, kind="stable")
    assert got.index.tolist() == exp.index.tolist()


def test_str_batch8_methods(spark):
    """New string-accessor breadth vs eager pandas."""
    import pandas_expr_spark as pes
    ss = ["Hello World", "ab", "", "  ", "aaa bbb aaa", "123", "Ⅻ42",
          "MiXeD", "UPPER", "lower", "Title Case Here", "a-b-c", "xxyyxx"]
    pdf = pd.DataFrame({"s": pd.array(ss, dtype="object")})
    df = pes.from_pandas(pdf)
    cases = [
        ("rfind", ("a",)), ("count", ("a",)), ("findall", (r"[a-z]+",)),
        ("fullmatch", (r"[A-Za-z ]+",)), ("center", (8, "*")),
        ("ljust", (8, ".")), ("rjust", (8, ".")),
        ("removeprefix", ("He",)), ("removesuffix", ("xx",)),
        ("slice_replace", (1, 3, "ZZ")),
        ("isnumeric", ()), ("islower", ()), ("isupper", ()),
        ("isspace", ()), ("istitle", ()),
    ]
    for name, args in cases:
        got = getattr(df.s.str, name)(*args).compute().sort_index()
        exp = getattr(pdf.s.str, name)(*args)
        g = [list(x) if isinstance(x, (list, np.ndarray)) else x
             for x in got.tolist()]
        e = [list(x) if isinstance(x, (list, np.ndarray)) else x
             for x in exp.tolist()]
        assert g == e, (name, g, e)
    # translate: char->char and deletion
    tbl = str.maketrans({"a": "A", "-": None})
    got = df.s.str.translate(tbl).compute().sort_index().tolist()
    exp = pdf.s.str.translate(tbl).tolist()
    assert got == exp
    # normalize
    pdf2 = pd.DataFrame({"s": ["é", "café", "A"]})
    got = (pes.from_pandas(pdf2).s.str.normalize("NFC")
           .compute().sort_index().tolist())
    assert got == pdf2.s.str.normalize("NFC").tolist()


def test_corrwith_matches_pandas(spark, pdf7, df7):
    other_p = pdf7.copy()
    other_p["v"] = other_p["v"] * 2 + 1
    other_p["x"] = other_p["x"].fillna(0) - other_p["v"]
    import pandas_expr_spark as pes
    got = df7.corrwith(pes.from_pandas(other_p)).compute().sort_index()
    exp = pdf7.corrwith(other_p, numeric_only=True).sort_index()
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)
    assert got.index.tolist() == exp.index.tolist()


def test_del_dir_contains_iter(spark, pdf7, df7):
    import pandas_expr_spark as pes
    d = pes.from_pandas(pdf7)
    del d["x"]
    assert list(d.columns) == ["g", "v"]
    assert "v" in dir(d) and "g" in d and "x" not in d
    assert list(iter(d)) == ["g", "v"]
    got = d.compute().sort_index()
    exp = pdf7.drop(columns=["x"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_shape_ndim_empty(spark, pdf7, df7):
    assert df7.ndim == 2 and df7.v.ndim == 1
    assert df7.shape == pdf7.shape
    assert df7.v.shape == pdf7.v.shape
    assert not df7.empty
    assert df7[df7.v > 10**9].empty


def test_groupby_level(spark, pdf7, df7):
    got = df7.set_index("g").groupby(level=0).v.sum().compute().sort_index()
    exp = pdf7.set_index("g").groupby(level=0).v.sum().sort_index()
    assert got.to_dict() == exp.to_dict()
    got = (df7.set_index("g").groupby(level="g").v.mean()
           .compute().sort_index())
    exp = pdf7.set_index("g").groupby(level="g").v.mean().sort_index()
    np.testing.assert_allclose(got.values, exp.values)
    with pytest.raises((KeyError, ValueError, TypeError)):
        df7.groupby(level=0)  # no explicit index


def test_axis1_reductions(spark, pdf7):
    import pandas_expr_spark as pes
    d = pes.from_pandas(pdf7)
    for op in ["sum", "mean", "min", "max"]:
        got = getattr(d, op)(axis=1).compute().sort_index()
        exp = getattr(pdf7[["x", "v"]], op)(axis=1)
        np.testing.assert_allclose(got.fillna(-9).values,
                                   exp.fillna(-9).values, rtol=1e-12), op


def test_pop_insert_take_reindex_rename(spark):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"g": list("abcde"), "v": [1, 2, 3, 4, 5],
                        "w": [1.0, 2.0, 3.0, 4.0, 5.0]})
    d = pes.from_pandas(pdf)
    p = pdf.copy()
    s = d.pop("w"); se = p.pop("w")
    assert list(d.columns) == list(p.columns)
    assert s.compute().sort_index().tolist() == se.tolist()
    d.insert(1, "z", d.v * 2); p.insert(1, "z", p.v * 2)
    assert list(d.columns) == list(p.columns)
    got = d.take([3, 0, 2]).compute()
    exp = p.take([3, 0, 2])
    assert got["g"].tolist() == exp["g"].tolist()
    assert got.index.tolist() == exp.index.tolist()
    got = d.reindex(columns=["v", "g", "nope"]).compute().sort_index()
    exp = p.reindex(columns=["v", "g", "nope"])
    assert list(got.columns) == list(exp.columns)
    assert got["nope"].isna().all()
    got = d.rename(columns=str.upper).compute().sort_index()
    assert list(got.columns) == [c.upper() for c in p.columns]


def test_clip_series_bound_and_tolist(spark, pdf7, df7):
    got = df7.v.clip(lower=df7.x).compute().sort_index()
    exp = pdf7.v.clip(lower=pdf7.x)
    np.testing.assert_allclose(got.fillna(-9).values, exp.fillna(-9).values)
    assert df7.v.to_list() == pdf7.v.tolist()
