"""Hunt-wave pins (round 3, batch d): positional list assignment,
axis=1 cumulative/diff ops, map na_action, Scalar.__round__,
cov(min_periods), nlargest label preservation."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"a": rng.normal(0, 5, 10).round(1),
                       "b": rng.normal(0, 5, 10).round(1),
                       "c": rng.integers(0, 9, 10).astype("float64")})
    df.loc[2, "b"] = np.nan
    df.loc[5, "a"] = np.nan
    return df


def test_assign_list_positional(spark):
    pdf = pd.DataFrame({"k": [1, 2, 3]})
    edf = pes.from_pandas(pdf)
    assert edf.assign(l=[10, 20, 30]).compute().l.tolist() == [10, 20, 30]
    assert edf.assign(l=np.array([1.5, 2.5, 3.5])).compute().l.tolist() \
        == [1.5, 2.5, 3.5]
    got = edf.assign(l=[[1], [2, 3], [4]]).compute()
    assert [list(x) for x in got.l] == [[1], [2, 3], [4]]
    # replacement keeps the column's slot; length mismatch raises
    got = edf.assign(k=[9, 8, 7]).compute()
    assert list(got.columns) == ["k"] and got.k.tolist() == [9, 8, 7]
    with pytest.raises(ValueError, match="Length of values"):
        edf.assign(l=[1, 2]).compute()


def test_setitem_list(spark):
    edf = pes.from_pandas(pd.DataFrame({"k": [1, 2]}))
    edf["z"] = [7, 8]
    assert edf.compute().z.tolist() == [7, 8]


@pytest.mark.parametrize("op", ["cumsum", "cumprod", "cummax", "cummin"])
@pytest.mark.parametrize("skipna", [True, False])
def test_frame_cumops_axis1(pdf, op, skipna):
    edf = pes.from_pandas(pdf)
    exp = getattr(pdf, op)(axis=1, skipna=skipna)
    got = getattr(edf, op)(axis=1, skipna=skipna).compute()
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


@pytest.mark.parametrize("periods", [1, 2, -1])
def test_frame_diff_axis1(pdf, periods):
    edf = pes.from_pandas(pdf)
    pd.testing.assert_frame_equal(pdf.diff(periods, axis=1),
                                  edf.diff(periods, axis=1).compute(),
                                  check_dtype=False)


def test_map_na_action_ignore(spark):
    s = pd.Series(["ab", None, "cd"])
    exp = s.map(lambda x: x.upper(), na_action="ignore")
    got = (pes.from_pandas(s.to_frame("s")).s
           .map(lambda x: x.upper(), na_action="ignore").compute())
    assert exp.fillna("-").tolist() == got.fillna("-").tolist()


def test_autocorr_and_scalar_round(pdf):
    edf = pes.from_pandas(pdf)
    assert round(edf.a.autocorr(1), 6) == pytest.approx(
        round(pdf.a.autocorr(1), 6))


def test_cov_min_periods(pdf):
    edf = pes.from_pandas(pdf)
    got = edf.a.cov(edf.b, min_periods=3).compute()
    assert got == pytest.approx(pdf.a.cov(pdf.b, min_periods=3))
    # below the threshold → NaN like pandas (numeric null scalars
    # compute to NaN, not None)
    got9 = edf.a.cov(edf.b, min_periods=9).compute()
    exp9 = pdf.a.cov(pdf.b, min_periods=9)
    assert pd.isna(got9) and pd.isna(exp9)


def test_nlargest_preserves_labels(spark):
    s = pd.Series([4, 1, 3, 3, 4, 0], name="w")
    edf = pes.from_pandas(s.to_frame())
    exp = s.nlargest(3, keep="all")
    got = edf.w.nlargest(3, keep="all").compute()
    assert sorted(got.to_dict().items()) == sorted(exp.to_dict().items())
    exp_f = s.nlargest(2)  # keep='first' tie-break by position
    got_f = edf.w.nlargest(2).compute()
    assert got_f.to_dict() == exp_f.to_dict()
    exp_s = s.nsmallest(2)
    got_s = edf.w.nsmallest(2).compute()
    assert got_s.to_dict() == exp_s.to_dict()
