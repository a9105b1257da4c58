"""Property-based differential tests (hypothesis) — random small frames
through the engine vs eager pandas.  Bounded example counts: every example
runs Spark jobs, so these are breadth tests, not fuzzing marathons."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import pandas_expr_spark as pes

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _frames():
    n = st.integers(min_value=1, max_value=40)
    return n.flatmap(lambda k: st.tuples(
        st.lists(st.integers(min_value=-3, max_value=3),
                 min_size=k, max_size=k),
        st.lists(st.one_of(st.none(),
                           st.floats(min_value=-100, max_value=100,
                                     allow_nan=False)),
                 min_size=k, max_size=k)))


@given(data=_frames())
@settings(**_SETTINGS)
def test_filter_groupby_sum_matches_pandas(spark, data):
    ks, vs = data
    pdf = pd.DataFrame({"k": ks, "v": pd.array(vs, dtype="float64")})
    df = pes.from_pandas(pdf)
    got = (df[df.k >= 0].groupby("k").agg(s=("v", "sum"), n=("v", "count"))
           .compute().sort_index())
    exp = (pdf[pdf.k >= 0].groupby("k").agg(s=("v", "sum"), n=("v", "count"))
           .sort_index())
    assert got["n"].tolist() == exp["n"].tolist()
    assert np.allclose(got["s"].fillna(0).values, exp["s"].fillna(0).values)


@given(data=_frames())
@settings(**_SETTINGS)
def test_elementwise_chain_matches_pandas(spark, data):
    ks, vs = data
    pdf = pd.DataFrame({"k": ks, "v": pd.array(vs, dtype="float64")})
    df = pes.from_pandas(pdf)
    got = ((df.v.fillna(0.0) * 2 + df.k).clip(lower=-5, upper=5)
           .compute().reset_index(drop=True).sort_values().reset_index(drop=True))
    exp = ((pdf.v.fillna(0.0) * 2 + pdf.k).clip(lower=-5, upper=5)
           .sort_values().reset_index(drop=True))
    assert np.allclose(got.values, exp.values)


@given(data=_frames(), keep=st.sampled_from(["first", "last"]))
@settings(**_SETTINGS)
def test_drop_duplicates_keep_matches_pandas(spark, data, keep):
    ks, vs = data
    pdf = pd.DataFrame({"k": ks, "v": pd.array(vs, dtype="float64")})
    df = pes.from_pandas(pdf)
    got = df.drop_duplicates(subset=["k"], keep=keep).compute()
    exp = pdf.drop_duplicates(subset=["k"], keep=keep)
    assert sorted(got["k"].tolist()) == sorted(exp["k"].tolist())
    a = got.sort_values("k").reset_index(drop=True)["v"].fillna(-9)
    b = exp.sort_values("k").reset_index(drop=True)["v"].fillna(-9)
    assert np.allclose(a.values, b.values)
