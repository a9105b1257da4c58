"""Round-3 API fill, batch 2: Series time-index conveniences
(resample/asfreq/to_period/first/last), at/iat scalar indexers,
module-level isna/notna/unique/factorize, misc shims."""

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def tpdf():
    return pd.DataFrame(
        {"v": [1.0, 2.0, np.nan, 4.0], "g": [1, 1, 2, 2]},
        index=pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-05", "2024-02-01"]))


@pytest.fixture(scope="module")
def tdf(spark, tpdf):
    return pes.from_pandas(tpdf)


def test_series_resample(tdf, tpdf):
    got = tdf.v.resample("D").mean().compute().sort_index().dropna()
    exp = tpdf.v.resample("D").mean().dropna()
    assert got.tolist() == exp.tolist()
    assert [str(i) for i in got.index] == [str(i) for i in exp.index]


def test_series_to_period_index(tdf, tpdf):
    got = tdf.v.to_period("M").compute()
    exp = tpdf.v.to_period("M")
    assert sorted(str(i) for i in got.index) == \
        sorted(str(i) for i in exp.index)


def test_frame_to_period(tdf, tpdf):
    got = tdf.to_period("M").compute().sort_index()
    exp = tpdf.to_period("M").sort_index()
    assert [str(i) for i in got.index] == [str(i) for i in exp.index]


def test_series_asfreq(spark):
    pa = pd.DataFrame({"v": [1.0, 2.0, 3.0]},
                      index=pd.to_datetime(["2024-01-01", "2024-01-02",
                                            "2024-01-04"]))
    ea = pes.from_pandas(pa)
    got = ea.v.asfreq("D").compute().sort_index()
    exp = pa.v.asfreq("D")
    assert got.fillna(-1).tolist() == exp.fillna(-1).tolist()
    got2 = ea.v.asfreq("D", method="pad").compute().sort_index()
    assert got2.tolist() == pa.v.asfreq("D", method="pad").tolist()


def test_series_first_last_offset(tdf, tpdf):
    got = tdf.v.first("3D").compute().sort_index()
    exp = tpdf.v.first("3D")
    assert got.tolist() == exp.tolist()
    got = tdf.v.last("3D").compute().sort_index()
    exp = tpdf.v.last("3D")
    assert got.tolist() == exp.tolist()


def test_at_iat(spark):
    pdx = pd.DataFrame({"a": [1, 2, 3], "b": list("xyz")},
                       index=[10, 20, 30])
    edx = pes.from_pandas(pdx)
    assert edx.at[20, "b"] == pdx.at[20, "b"]
    assert edx.iat[2, 0] == pdx.iat[2, 0]
    assert edx.iat[-1, 1] == pdx.iat[-1, 1]
    assert edx.a.at[30] == pdx.a.at[30]
    assert edx.a.iat[1] == pdx.a.iat[1]
    with pytest.raises(KeyError):
        edx.at[99, "b"]
    with pytest.raises(IndexError):
        edx.a.iat[99]


def test_module_level_na_helpers(spark):
    pdx = pd.DataFrame({"a": [1.0, np.nan], "b": ["x", None]})
    edx = pes.from_pandas(pdx)
    assert pes.isna(edx.a).compute().tolist() == [False, True]
    assert pes.notna(edx.b).compute().tolist() == [True, False]
    assert pes.isna(float("nan")) and not pes.isna(3)
    # missing surfaces as NaN (truthy!) — filter NA-aware like pandas
    assert sorted(x for x in pes.unique(edx.b).compute()
                  if isinstance(x, str)) == ["x"]
    codes, _ = pes.factorize(edx.b)
    assert list(codes.compute()) == list(pd.factorize(pdx.b)[0])


def test_misc_shims(spark):
    pdx = pd.DataFrame({"a": [1, 2, 3]})
    edx = pes.from_pandas(pdx)
    s = edx.a
    assert s.infer_objects() is s
    assert s.convert_dtypes() is s
    assert s.set_flags(allows_duplicate_labels=True) is s
    assert list(s.ravel()) == list(pdx.a.ravel())
    assert list(s.array) == list(pdx.a.array)
    assert s.swapaxes() is s


def test_to_pickle_feather(spark, tmp_path):
    pdx = pd.DataFrame({"a": [1, 2, 3]})
    edx = pes.from_pandas(pdx)
    p = tmp_path / "f.pkl"
    edx.to_pickle(str(p))
    assert pd.read_pickle(str(p))["a"].tolist() == [1, 2, 3]
    f = tmp_path / "f.feather"
    edx.to_feather(str(f))
    assert pd.read_feather(str(f))["a"].tolist() == [1, 2, 3]


def test_series_loc_iloc(spark):
    pdx = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": list("xyzw")},
                       index=[10, 20, 30, 40])
    edx = pes.from_pandas(pdx)
    assert edx.a.loc[20] == pdx.a.loc[20]
    assert edx.a.loc[[10, 30]].compute().sort_index().tolist() == \
        pdx.a.loc[[10, 30]].tolist()
    assert edx.a.iloc[2] == pdx.a.iloc[2]
    assert edx.a.iloc[1:3].compute().sort_index().tolist() == \
        pdx.a.iloc[1:3].tolist()


def test_series_compare_pop_reindex_like(spark):
    p1 = pd.Series([1.0, 2.0, 9.0], name="v")
    p2 = pd.Series([1.0, 5.0, 9.0], name="v")
    e1 = pes.from_pandas(p1.to_frame()).v
    e2 = pes.from_pandas(p2.to_frame()).v
    gc = e1.compare(e2).compute().sort_index()
    pc = p1.compare(p2)
    assert list(gc.columns) == list(pc.columns)
    assert gc.values.tolist() == pc.values.tolist()
    assert list(gc.index) == list(pc.index)

    pdx = pd.DataFrame({"a": [1.0, 2.0, 3.0]}, index=[10, 20, 30])
    edx = pes.from_pandas(pdx)
    s = edx.a
    assert s.pop(20) == 2.0
    assert sorted(s.compute().tolist()) == [1.0, 3.0]


def test_attrs_axes_flags(spark):
    pdx = pd.DataFrame({"a": [1, 2]})
    edx = pes.from_pandas(pdx)
    edx.attrs["k"] = "v"
    assert edx.attrs == {"k": "v"}
    assert edx.flags.allows_duplicate_labels
    assert len(edx.axes) == 2 and list(edx.axes[1]) == ["a"]
    s = edx.a
    assert str(s.dtypes) == str(pdx.a.dtypes)
    assert len(s.axes) == 1
    s.attrs["x"] = 1
    assert s.attrs == {"x": 1}


def test_series_info_latex(spark):
    import io
    pdx = pd.DataFrame({"a": [1.0, None, 3.0]})
    edx = pes.from_pandas(pdx)
    buf = io.StringIO()
    edx.a.info(buf=buf)
    assert "3 entries" in buf.getvalue()
    assert "tabular" in edx.to_latex()
