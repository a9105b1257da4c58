"""Round-4 hunt wave 3 pins: dtype boundaries where ANSI SQL semantics
diverged from pandas/numpy.  All were real engine divergences:

- astype to a narrower int ANSI-crashed on overflow (numpy wraps);
- float(NaN) -> int silently produced garbage/null (pandas raises);
- datetime64 -> int64 would be Spark's epoch SECONDS (pandas: epoch ns);
- `int * bool` / `bool + bool` ANSI-crashed (numpy lifts / ORs);
- `int ** -1` returned a value (numpy raises ValueError);
- `Scalar == value` compared object identity (no __eq__ dunder), so
  `s.sum() == 0.0` was always False.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture
def pdf():
    return pd.DataFrame({
        "i": [1, 2, 3, 4],
        "f": [1.5, 2.5, np.nan, 4.0],
        "b": [True, False, True, False],
        "d": pd.to_datetime(["2024-01-31", "2024-02-29", "2024-03-15",
                             "2024-12-31 23:59:59"], format="mixed"),
    })


@pytest.fixture
def E(pdf, spark):
    return pes.from_pandas(pdf)


def test_astype_int8_overflow_wraps(pdf, E):
    got = (E["i"] * 100).astype("int8").compute().sort_index()
    exp = (pdf["i"] * 100).astype("int8")
    assert got.tolist() == exp.tolist()     # [100, -56, 44, -112]


def test_astype_int16_int32_wrap(spark):
    pdf = pd.DataFrame({"x": [2**20 + 7, -(2**40) - 3]})
    e = pes.from_pandas(pdf)
    assert e["x"].astype("int16").compute().sort_index().tolist() == \
        pdf["x"].astype("int16").tolist()
    assert e["x"].astype("int32").compute().sort_index().tolist() == \
        pdf["x"].astype("int32").tolist()


def test_astype_float_nan_to_int_raises(E):
    with pytest.raises(Exception, match="non-finite"):
        E["f"].astype("int64").compute()


def test_astype_datetime_to_int64_is_nanos(pdf, E):
    got = E["d"].astype("int64").compute().sort_index()
    exp = pdf["d"].astype("int64")
    assert got.tolist() == exp.tolist()


def test_int_times_bool(pdf, E):
    got = (E["i"] * E["b"]).compute().sort_index()
    exp = pdf["i"] * pdf["b"]
    assert got.tolist() == exp.tolist()
    assert got.dtype.kind == "i"


def test_bool_plus_bool_is_or(pdf, E):
    got = (E["b"] + E["b"]).compute().sort_index()
    exp = pdf["b"] + pdf["b"]
    assert got.tolist() == exp.tolist()
    assert got.dtype == bool
    # mul is AND
    got2 = (E["b"] * E["b"]).compute().sort_index()
    assert got2.tolist() == (pdf["b"] * pdf["b"]).tolist()


def test_bool_minus_bool_raises(E):
    with pytest.raises(TypeError, match="boolean subtract"):
        E["b"] - E["b"]


def test_bool_div_bool_raises(E):
    # pandas: truediv/floordiv/mod/pow are undefined for bool∘bool
    with pytest.raises(NotImplementedError, match="bool dtypes"):
        E["b"] / E["b"]
    with pytest.raises(NotImplementedError, match="bool dtypes"):
        E["b"] ** E["b"]


def test_int_pow_negative_raises(E):
    with pytest.raises(ValueError, match="negative integer powers"):
        E["i"] ** -1


def test_scalar_eq_compares_value(spark):
    s = pes.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))["x"]
    total = s.sum()
    assert total.compute() == 0.0           # all-NaN sum identity
    assert bool(total == 0.0)               # lazy __eq__ compares values
    assert not bool(total == 1.0)
    assert bool(total != 1.0)


def test_dt_floor_ceil_round(pdf, E):
    for meth, arg in (("floor", "h"), ("ceil", "D"), ("round", "h"),
                      ("normalize", None)):
        g = getattr(E["d"].dt, meth)
        p = getattr(pdf["d"].dt, meth)
        got = (g() if arg is None else g(arg)).compute().sort_index()
        exp = p() if arg is None else p(arg)
        assert got.tolist() == exp.tolist(), meth


# ---- hunt wave 4 (randomized battery finds) ----
def test_drop_duplicates_keeps_labels(spark):
    pdf = pd.DataFrame({"g": list("xyxzy"), "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    e = pes.from_pandas(pdf)
    for keep in ("first", "last", False):
        got = e.drop_duplicates(["g"], keep=keep).compute().sort_index()
        exp = pdf.drop_duplicates(["g"], keep=keep).sort_index()
        assert got.index.tolist() == exp.index.tolist(), keep
        assert got["v"].tolist() == exp["v"].tolist(), keep


def test_sort_values_kind_inplace(spark):
    pdf = pd.DataFrame({"s": ["bb", "a", "ccc"], "v": [1.0, 2.0, 3.0]})
    e = pes.from_pandas(pdf)
    got = e.sort_values("s", kind="stable", ignore_index=True).compute()
    exp = pdf.sort_values("s", kind="stable", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # key= through the Series form with kind accepted
    got2 = e["s"].sort_values(key=lambda s: s.str.len(), kind="mergesort",
                              ignore_index=True).compute()
    exp2 = pdf["s"].sort_values(key=lambda s: s.str.len(),
                                kind="mergesort", ignore_index=True)
    assert got2.tolist() == exp2.tolist()
    e2 = pes.from_pandas(pdf)
    assert e2.sort_values("v", ascending=False, inplace=True) is None
    assert e2.compute()["v"].tolist() == [3.0, 2.0, 1.0]
    with pytest.raises(ValueError, match="invalid kind"):
        e.sort_values("v", kind="bogo")


def test_where_foreign_cond_positional(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [0.1, 0.9, 0.4],
                        "g": list("xyz")})
    e = pes.from_pandas(pdf)
    got = e[["a", "b"]].where(e["b"] > 0.3, -1.0).compute().sort_index()
    exp = pdf[["a", "b"]].where(pdf["b"] > 0.3, -1.0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    got2 = e[["a"]].mask(e["b"] > 0.3).compute().sort_index()
    exp2 = pdf[["a"]].mask(pdf["b"] > 0.3)
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)


def test_dot_propagates_nan(spark):
    pdf = pd.DataFrame({"a": [1.0, np.nan, 3.0], "b": [2.0, 4.0, 6.0]})
    e = pes.from_pandas(pdf)
    assert np.isnan(e["a"].dot(e["b"]).compute())
    clean = pdf.fillna(0.0)
    ec = pes.from_pandas(clean)
    assert ec["a"].dot(ec["b"]).compute() == clean["a"].dot(clean["b"])


def test_dtype_is_numpy_dtype(spark):
    pdf = pd.DataFrame({"i": [1], "f": [1.5], "s": ["x"],
                        "d": pd.to_datetime(["2024-01-01"])})
    e = pes.from_pandas(pdf)
    assert e["i"].dtype.kind == "i" and e["i"].dtype == "int64"
    assert e["f"].dtype.kind == "f"
    assert e["s"].dtype == object
    assert e["d"].dtype.kind == "M"
    assert list(e.dtypes) == list(pdf.dtypes)
