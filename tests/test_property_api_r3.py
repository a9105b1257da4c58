"""Property-based differentials for the round-3 API-fill batch: random
small frames (nulls, negatives, duplicate keys) through the engine vs
eager pandas for factorize/argsort/searchsorted/sort_values/duplicated/
named reflected arithmetic/asof."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import pandas_expr_spark as pes

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _vals():
    n = st.integers(min_value=1, max_value=25)
    return n.flatmap(lambda k: st.lists(
        st.one_of(st.none(),
                  st.floats(min_value=-50, max_value=50, allow_nan=False)),
        min_size=k, max_size=k))


def _keys():
    n = st.integers(min_value=1, max_value=25)
    return n.flatmap(lambda k: st.lists(
        st.integers(min_value=-2, max_value=2), min_size=k, max_size=k))


@given(vs=_vals(), asc=st.booleans())
@settings(**_SETTINGS)
def test_sort_values_labels(spark, vs, asc):
    pdf = pd.DataFrame({"v": pd.array(vs, dtype="float64")})
    got = pes.from_pandas(pdf).v.sort_values(ascending=asc).compute()
    exp = pdf.v.sort_values(ascending=asc)
    # identical label->value mapping AND identical sorted value order
    assert got.sort_index().equals(exp.sort_index()) or \
        np.allclose(got.sort_index().fillna(9e9), exp.sort_index().fillna(9e9))
    assert np.allclose(got.fillna(9e9).values, exp.fillna(9e9).values)


@given(ks=_keys())
@settings(**_SETTINGS)
def test_factorize_matches_pandas(spark, ks):
    pdf = pd.DataFrame({"k": ks})
    codes, uniques = pes.from_pandas(pdf).k.factorize()
    pc, pu = pdf.k.factorize()
    assert list(codes.compute().sort_index()) == list(pc)
    assert list(uniques.compute()) == list(pu)


@given(vs=_vals())
@settings(**_SETTINGS)
def test_argsort_future_semantics(spark, vs):
    pdf = pd.DataFrame({"v": pd.array(vs, dtype="float64")})
    got = pes.from_pandas(pdf).v.argsort().compute().sort_index().tolist()
    # future pandas: NaNs ordered last (stable); emulate with numpy
    order = np.argsort(pdf.v.to_numpy(), kind="stable").tolist()
    assert got == order


@given(vs=_vals(),
       probes=st.lists(st.floats(min_value=-60, max_value=60,
                                 allow_nan=False), min_size=1, max_size=4),
       side=st.sampled_from(["left", "right"]))
@settings(**_SETTINGS)
def test_searchsorted(spark, vs, probes, side):
    clean = pd.Series([v for v in vs if v is not None], dtype="float64")
    pdf = pd.DataFrame({"v": clean.sort_values().to_numpy()})
    if len(pdf) == 0:
        return
    got = pes.from_pandas(pdf).v.searchsorted(list(probes), side=side)
    exp = list(pdf.v.searchsorted(probes, side=side))
    assert got == [int(e) for e in exp]


@given(ks=_keys(), keep=st.sampled_from(["first", "last", False]))
@settings(**_SETTINGS)
def test_series_duplicated(spark, ks, keep):
    pdf = pd.DataFrame({"k": ks})
    got = pes.from_pandas(pdf).k.duplicated(keep).compute().sort_index()
    exp = pdf.k.duplicated(keep)
    assert got.tolist() == exp.tolist()


@given(vs=_vals(), other=st.floats(min_value=-9, max_value=9,
                                   allow_nan=False).filter(lambda x: abs(x) > 1e-6),
       op=st.sampled_from(["radd", "rsub", "rmul", "rdiv", "rpow",
                           "rmod", "rfloordiv"]))
@settings(**_SETTINGS)
def test_reflected_named_ops(spark, vs, other, op):
    pdf = pd.DataFrame({"v": pd.array(vs, dtype="float64")})
    if op == "rpow":
        pdf["v"] = pdf["v"].abs()  # avoid complex results
    got = getattr(pes.from_pandas(pdf).v, op)(other).compute()
    exp = getattr(pdf.v, op)(other)
    g, e = got.fillna(1.23456e9), exp.fillna(1.23456e9)
    g = g.replace([np.inf, -np.inf], 8.8e9)
    e = e.replace([np.inf, -np.inf], 8.8e9)
    assert np.allclose(g.values, e.values, rtol=1e-9, atol=1e-12)


@given(vs=_vals(),
       wheres=st.lists(st.integers(min_value=-1, max_value=30),
                       min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_series_asof(spark, vs, wheres):
    pdf = pd.DataFrame({"v": pd.array(vs, dtype="float64")},
                       index=range(len(vs)))
    p = pdf.v
    s = pes.from_pandas(pdf.reset_index().rename(
        columns={"index": "i"})).set_index("i").v
    for w in wheres:
        got, exp = s.asof(w), p.asof(w)
        assert (got == exp) or (pd.isna(got) and pd.isna(exp))


@given(ks=_keys(), vs=_vals())
@settings(**_SETTINGS)
def test_series_groupby_key(spark, ks, vs):
    n = min(len(ks), len(vs))
    pdf = pd.DataFrame({"k": ks[:n], "v": pd.array(vs[:n], dtype="float64")})
    df = pes.from_pandas(pdf)
    got = df.v.groupby(df.k).mean().compute().sort_index()
    exp = pdf.v.groupby(pdf.k).mean().sort_index()
    assert np.allclose(got.fillna(9e9).values, exp.fillna(9e9).values)
