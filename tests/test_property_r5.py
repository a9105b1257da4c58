"""Property-based differential tests (hypothesis, derandomized).

Each property generates small frames and asserts the engine matches eager
pandas exactly.  ``derandomize=True`` makes the example stream a fixed,
reproducible battery (no CI flakes, new counterexamples only when the
strategy or code changes); ``deadline=None`` because a Spark action's
latency is not a property of the code under test.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, HealthCheck, strategies as st

import pandas_expr_spark as pes

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False, width=32)
cell = st.one_of(finite, st.none())


@st.composite
def frames(draw, min_rows=1, max_rows=12):
    n = draw(st.integers(min_rows, max_rows))
    g = draw(st.lists(st.sampled_from("abc"), min_size=n, max_size=n))
    x = draw(st.lists(cell, min_size=n, max_size=n))
    y = draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n))
    return pd.DataFrame({"g": g, "x": pd.array(x, dtype="float64"),
                         "y": np.array(y, dtype="int64")})


def _series_eq(got: pd.Series, exp: pd.Series):
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False, rtol=1e-9)


@settings(**SETTINGS)
@given(pdf=frames())
def test_prop_arith_chain(spark, pdf):
    e = pes.from_pandas(pdf)
    got = ((e["x"] * 2 - e["y"]).abs() + 1).compute()
    exp = (pdf["x"] * 2 - pdf["y"]).abs() + 1
    _series_eq(got, exp)


@settings(**SETTINGS)
@given(pdf=frames())
def test_prop_groupby_sum_mean(spark, pdf):
    eg = pes.from_pandas(pdf).groupby("g")["x"]
    pg = pdf.groupby("g")["x"]
    _series_eq(eg.sum().compute(), pg.sum())
    _series_eq(eg.mean().compute(), pg.mean())
    _series_eq(eg.count().compute(), pg.count().astype("float64"))


@settings(**SETTINGS)
@given(pdf=frames(min_rows=2))
def test_prop_fillna_cumsum(spark, pdf):
    e = pes.from_pandas(pdf)
    _series_eq(e["x"].fillna(0.0).cumsum().compute(),
               pdf["x"].fillna(0.0).cumsum())
    _series_eq(e["x"].ffill().compute(), pdf["x"].ffill())


@settings(**SETTINGS)
@given(pdf=frames(min_rows=3), w=st.integers(2, 4))
def test_prop_rolling_sum(spark, pdf, w):
    e = pes.from_pandas(pdf)
    _series_eq(e["x"].rolling(w).sum().compute(), pdf["x"].rolling(w).sum())


@settings(**SETTINGS)
@given(pdf=frames())
def test_prop_filter_agg(spark, pdf):
    e = pes.from_pandas(pdf)
    got = e[e["y"] > 0]["x"].sum().compute()
    exp = pdf[pdf["y"] > 0]["x"].sum()
    assert got == exp or abs(got - exp) < 1e-6


@settings(**SETTINGS)
@given(pdf=frames(min_rows=2))
def test_prop_sort_head_labels(spark, pdf):
    e = pes.from_pandas(pdf)
    got = e.sort_values("y", kind="stable").head(3).compute()
    exp = pdf.sort_values("y", kind="stable").head(3)
    assert got.index.tolist() == exp.index.tolist()
    _series_eq(got["y"], exp["y"])
