"""Round-5 hunt wave O pins: resample origin/offset, to_numeric int
inference, rolling.agg, groupby list specs with lambdas, iloc reversal."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes

D = pd.DataFrame({"g": list("ababab"), "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                  "n": ["1", "2", "x", "4", "5", "6"],
                  "t": pd.date_range("2024-03-01", periods=6, freq="11h")})


def _ser_eq(w, g):
    w, g = w.sort_index(), g.sort_index()
    assert list(map(str, w.index)) == list(map(str, g.index))
    assert np.allclose(w.values, g.values, equal_nan=True)


def test_resample_origin_and_offset():
    ti = D.set_index("t")
    ei = pes.from_pandas(ti)
    for kw in ({"origin": "epoch"}, {"origin": "start"},
               {"origin": "2024-02-29 04:00"}):
        _ser_eq(ti["v"].resample("16h", **kw).sum(),
                ei["v"].resample("16h", **kw).sum().compute())
    _ser_eq(ti["v"].resample("1D", offset="6h").sum(),
            ei["v"].resample("1D", offset="6h").sum().compute())


def test_to_numeric_integer_inference():
    e = pes.from_pandas(D)
    got = pes.to_numeric(e["n"].iloc[:2]).compute()
    want = pd.to_numeric(D["n"].head(2))
    assert got.dtype == want.dtype == "int64"
    assert list(got) == list(want)
    got = pes.to_numeric(e["n"], errors="coerce").compute()
    want = pd.to_numeric(D["n"], errors="coerce")
    assert got.dtype == want.dtype == "float64"
    assert np.allclose(got, want, equal_nan=True)
    with pytest.raises(ValueError):
        pes.to_numeric(e["n"])        # 'x' is unparseable


def test_rolling_agg_specs():
    e = pes.from_pandas(D)
    want = D["v"].rolling(2).agg(["sum", "mean"])
    got = e["v"].rolling(2).agg(["sum", "mean"]).compute()
    assert list(want.columns) == list(got.columns)
    assert np.allclose(want.values, got.values, equal_nan=True)
    got = e["v"].rolling(2).agg("sum").compute()
    assert np.allclose(D["v"].rolling(2).agg("sum"), got, equal_nan=True)


def test_groupby_agg_list_with_lambda():
    e = pes.from_pandas(D)
    want = D.groupby("g")["v"].agg(["sum", lambda s: s.max() - s.min()])
    got = e.groupby("g")["v"].agg(
        ["sum", lambda s: s.max() - s.min()]).compute()
    assert list(want.columns) == list(got.columns)  # ['sum', '<lambda_0>']
    assert np.allclose(want.values, got.reindex(want.index).values)


def test_iloc_negative_step_reversal():
    e = pes.from_pandas(D)
    for sl in (slice(None, None, -1), slice(None, None, -2),
               slice(4, 1, -1), slice(-1, -4, -1)):
        assert list(e["v"].iloc[sl].compute()) == list(D["v"].iloc[sl])
    assert list(e.iloc[::-1].compute()["v"]) == list(D.iloc[::-1]["v"])
    # downstream scans follow the REVERSED order (pandas presentation)
    assert list(e["v"].iloc[::-1].cummax().compute()) == \
        list(D["v"].iloc[::-1].cummax())
