"""Time-offset rolling windows (rolling("3D")) — block-bucketed self-join
(functions/timeseries.time_rolling), differential vs pandas including
duplicate-timestamp position semantics and closed=."""
import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "t": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-02",
                             "2024-01-05", "2024-01-07", "2024-01-08",
                             "2024-01-11", "2024-01-11"]),
        "v": [1.0, 2.0, None, 4.0, 5.0, 6.0, 7.0, 8.0],
        "k": ["a", "a", "b", "a", "b", "a", "b", "a"],
    })


@pytest.mark.parametrize("how", ["sum", "mean", "count", "min", "max"])
def test_series_time_rolling(spark, pdf, how):
    f = pes.from_pandas(pdf).set_index("t")
    p = pdf.set_index("t")
    got = getattr(f["v"].rolling("3D"), how)().compute().sort_index()
    exp = getattr(p["v"].rolling("3D"), how)()
    assert np.allclose(got.fillna(-9).values, exp.fillna(-9).values), how


def test_frame_grouped_and_params(spark, pdf):
    f = pes.from_pandas(pdf).set_index("t")
    p = pdf.set_index("t")
    gf = f[["v"]].rolling("3D").sum().compute().sort_index()
    ef = p[["v"]].rolling("3D").sum()
    assert np.allclose(gf["v"].fillna(-9).values, ef["v"].fillna(-9).values)
    g2 = f["v"].rolling("5D", min_periods=3).sum().compute().sort_index()
    e2 = p["v"].rolling("5D", min_periods=3).sum()
    assert np.allclose(g2.fillna(-9).values, e2.fillna(-9).values)
    g3 = f["v"].rolling("3D", closed="both").sum().compute().sort_index()
    e3 = p["v"].rolling("3D", closed="both").sum()
    assert np.allclose(g3.fillna(-9).values, e3.fillna(-9).values)
    gq = pes.from_pandas(pdf).set_index("t").groupby("k") \
        .rolling("3D").sum().compute()
    eq = pdf.set_index("t").groupby("k").rolling("3D").sum()
    assert sorted(np.round(gq["v"].fillna(-9), 6)) == \
        sorted(np.round(eq["v"].fillna(-9), 6))


def test_time_rolling_partition_invariant(spark, pdf):
    f = pes.from_pandas(pdf).set_index("t")
    a = f["v"].rolling("3D").sum().compute().sort_index()
    f2 = pes.from_spark(
        pes.from_pandas(pdf)._sdf.repartition(5)).set_index("t")
    b = f2["v"].rolling("3D").sum().compute().sort_index()
    assert np.allclose(a.fillna(-9).values, b.fillna(-9).values)


@pytest.mark.parametrize("how", ["var", "std"])
def test_time_rolling_var_std(spark, pdf, how):
    f = pes.from_pandas(pdf).set_index("t")
    p = pdf.set_index("t")
    got = getattr(f["v"].rolling("5D"), how)().compute().sort_index()
    exp = getattr(p["v"].rolling("5D"), how)()
    assert np.allclose(got.fillna(-9).values, exp.fillna(-9).values), how
