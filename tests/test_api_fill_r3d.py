"""Round-3 continuation API fill: pivot_table aggfunc list, crosstab
normalize/margins, describe(percentiles=), weighted sampling."""
import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "k": ["a", "b", "a", "c", "b", "a"],
        "g": ["x", "x", "y", "y", "x", "y"],
        "v": [3.0, 1.0, None, 7.0, 2.0, 5.0],
        "i": [10, 20, 30, 40, 50, 60]})


def test_pivot_table_aggfunc_list(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.pivot_table(index="k", columns="g", values="v",
                        aggfunc=["sum", "count"]).compute()
    exp = pdf.pivot_table(index="k", columns="g", values="v",
                          aggfunc=["sum", "count"])
    assert sorted(got.columns) == ["x_count", "x_sum", "y_count", "y_sum"]
    assert sorted(str(x) for x in got.fillna(-9).values.ravel()) == \
        sorted(str(x) for x in
               exp.fillna(-9.0).values.ravel().astype(float))


@pytest.mark.parametrize("norm,pd_norm", [
    (True, True), ("index", "index"), ("columns", "columns")])
def test_crosstab_normalize(spark, pdf, norm, pd_norm):
    f = pes.from_pandas(pdf)
    got = f.crosstab("k", "g", normalize=norm).compute()
    exp = pd.crosstab(pdf.k, pdf.g, normalize=pd_norm)
    assert sorted(np.round(got[["x", "y"]].values.ravel(), 6)) == \
        sorted(np.round(exp.values.ravel(), 6))


def test_crosstab_margins(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f.crosstab("k", "g", margins=True).compute()
    exp = pd.crosstab(pdf.k, pdf.g, margins=True)
    assert sorted(got[["x", "y", "All"]].values.ravel()) == \
        sorted(exp.values.ravel())
    # row key is the index like pandas since r5
    assert "All" in set(got.index)


def test_describe_percentiles(spark, pdf):
    f = pes.from_pandas(pdf)
    got = f["v"].describe(percentiles=[0.1, 0.9]).compute()
    exp = pdf["v"].describe(percentiles=[0.1, 0.9])
    assert list(got.index) == list(exp.index)
    assert np.allclose(got["v"].values.astype(float),
                       exp.values.astype(float))


def test_sample_weights(spark):
    pdf = pd.DataFrame({"x": range(100), "w": [1e-9] * 99 + [1e9]})
    f = pes.from_pandas(pdf)
    for seed in range(3):
        smp = f.sample(n=1, weights="w", random_state=seed).compute()
        assert smp["x"].iloc[0] == 99, seed
    s3 = f.sample(n=5, weights="w", random_state=0).compute()
    assert len(s3) == 5
    # zero weights are never selected
    pz = pd.DataFrame({"x": [1, 2], "w": [0.0, 1.0]})
    fz = pes.from_pandas(pz)
    got = fz.sample(n=2, weights="w", random_state=0).compute()
    assert list(got["x"]) == [2]


def test_index_to_series_scalar_str_squeeze(spark, pdf):
    f = pes.from_pandas(pdf).set_index("k")
    p = pdf.set_index("k")
    assert sorted(f.index.to_series().compute()) == \
        sorted(p.index.to_series())
    # str(Scalar) is the value (eager action)
    assert str(f.index.min()) == str(p.index.min()) == "a"
    one = pes.from_pandas(pd.DataFrame({"v": [5.0]}))
    assert float(one.squeeze()) == 5.0


def test_frame_topk_keep(spark):
    pdf = pd.DataFrame({"a": [3, 1, 3, 5, 3], "b": [1.0, 2, 3, 4, 5]})
    f = pes.from_pandas(pdf)
    g_all = f.nlargest(2, "a", keep="all").compute()
    e_all = pdf.nlargest(2, "a", keep="all")
    assert sorted(g_all["a"]) == sorted(e_all["a"])
    g_first = f.nlargest(3, "a", keep="first").compute()
    e_first = pdf.nlargest(3, "a", keep="first")
    assert list(g_first.index) == list(e_first.index)
    g_last = f.nsmallest(2, "a", keep="last").compute()
    e_last = pdf.nsmallest(2, "a", keep="last")
    assert sorted(g_last.index) == sorted(e_last.index)
