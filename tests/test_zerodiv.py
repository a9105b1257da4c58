"""Division-by-zero semantics: pandas yields ±inf / NaN (promoting even
integer inputs to float — GH#27398) where ANSI Spark throws
DIVIDE_BY_ZERO.  Every division path is guarded lazily (the real divide
only evaluates when the divisor is nonzero); literal nonzero divisors
skip the guard entirely so int dtypes stay static (int % 3 → int64).

Found by the round-3 hypothesis battery (rdiv over a zero value)."""

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({"a": [1.0, -2.0, 0.0, np.nan],
                         "b": [0.0, -0.0, 0.0, 0.0],
                         "i": [1, -2, 0, 5],
                         "z": [0, 0, 0, 0],
                         "n": [2, 3, 4, 5]})


@pytest.fixture(scope="module")
def df(spark, pdf):
    return pes.from_pandas(pdf)


def same(got, exp):
    assert all((x == y) or (pd.isna(x) and pd.isna(y))
               for x, y in zip(got, exp)), (got, exp)


def test_truediv_zero(df, pdf):
    same((df.a / 0.0).compute().tolist(), (pdf.a / 0.0).tolist())
    same((df.a / df.b).compute().tolist(), (pdf.a / pdf.b).tolist())
    same((0.0 / df.a).compute().tolist(), (0.0 / pdf.a).tolist())
    same(df.a.rdiv(1.0).compute().tolist(), pdf.a.rdiv(1.0).tolist())


def test_floordiv_mod_zero_float(df, pdf):
    same((df.a // 0.0).compute().tolist(), (pdf.a // 0.0).tolist())
    same((df.a % 0.0).compute().tolist(), (pdf.a % 0.0).tolist())
    same(df.a.floordiv(0.0).compute().tolist(),
         pdf.a.floordiv(0.0).tolist())
    same(df.a.rmod(5.0).compute().tolist(), pdf.a.rmod(5.0).tolist())


def test_zero_division_integer_promotes(df, pdf):
    # pandas promotes int inputs to float and yields ±inf/NaN
    same((df.i // 0).compute().tolist(), (pdf.i // 0).tolist())
    same((df.i % 0).compute().tolist(), (pdf.i % 0).tolist())
    same((df.i / 0).compute().tolist(), (pdf.i / 0).tolist())
    same((df.i // df.z).compute().tolist(), (pdf.i // pdf.z).tolist())


def test_literal_nonzero_divisor_keeps_int_dtype(df, pdf):
    assert (df.i % 3).dtype == (pdf.i % 3).dtype == "int64"
    assert (df.i // 2).dtype == (pdf.i // 2).dtype == "int64"
    same((df.i // 2).compute().tolist(), (pdf.i // 2).tolist())
    same((df.i % 3).compute().tolist(), (pdf.i % 3).tolist())


def test_frame_zero_division(df, pdf):
    fr = pes.from_pandas(pdf[["a", "b"]])
    same(sum((fr / 0.0).compute().values.tolist(), []),
         sum((pdf[["a", "b"]] / 0.0).values.tolist(), []))
    same(sum((fr % fr).compute().values.tolist(), []),
         sum((pdf[["a", "b"]] % pdf[["a", "b"]]).values.tolist(), []))
    iz = pes.from_pandas(pdf[["i", "z"]])
    same(sum((iz // 0).compute().values.tolist(), []),
         sum((pdf[["i", "z"]] // 0).values.tolist(), []))


def test_scalar_zero_division(df, pdf):
    got = (df.a.sum() / df.z.sum()).compute()
    exp = pdf.a.sum() / pdf.z.sum()
    assert got == exp


def test_named_div_fill_value_zero(df, pdf):
    same(df.a.div(df.b, fill_value=1.0).compute().tolist(),
         pdf.a.div(pdf.b, fill_value=1.0).tolist())


def test_pow_ieee_identities(df, pdf):
    # x**0 == 1 and 1**y == 1 even for NaN operands (Spark pow
    # propagates null; pandas follows IEEE 754)
    same((df.a ** 0).compute().tolist(), (pdf.a ** 0).tolist())
    same(df.a.rpow(1.0).compute().tolist(), pdf.a.rpow(1.0).tolist())
    same((df.a ** 2).compute().tolist(), (pdf.a ** 2).tolist())
    same(df.a.pow(df.b).compute().tolist(), pdf.a.pow(pdf.b).tolist())


def test_signed_zero_divisor(df, pdf):
    # -0.0 divisor flips the inf sign; only visible via the string form
    same((df.a / df.b).compute().tolist(), (pdf.a / pdf.b).tolist())
    p = pd.DataFrame({"x": [3.0, -3.0], "d": [-0.0, -0.0]})
    e = pes.from_pandas(p)
    same((e.x / e.d).compute().tolist(), (p.x / p.d).tolist())
