"""Join tests (reference ``tests/test_merge.py`` → SURVEY §2.3/§5;
fixtures per FIXTURES.md F3)."""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import assert_frame_eq

import pandas_expr_spark as pes


@pytest.fixture()
def left_pdf():
    return pd.DataFrame({"x": range(20), "y": range(20)})


@pytest.fixture()
def right_pdf():
    return pd.DataFrame({"x": range(0, 20, 2), "z": range(10)})


@pytest.fixture()
def left(spark, left_pdf):
    return pes.from_pandas(left_pdf)


@pytest.fixture()
def right(spark, right_pdf):
    return pes.from_pandas(right_pdf)


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_merge_on(left, right, left_pdf, right_pdf, how):
    got = left.merge(right, how=how, on="x")
    exp = left_pdf.merge(right_pdf, how=how, on="x")
    assert_frame_eq(got, exp, sort_by=["x"])


def test_merge_auto_on(left, right, left_pdf, right_pdf):
    got = left.merge(right)  # common column x
    exp = left_pdf.merge(right_pdf)
    assert_frame_eq(got, exp, sort_by=["x"])


def test_merge_left_right_on(left, right, left_pdf, right_pdf):
    r2 = right.rename(columns={"x": "k"})
    rp2 = right_pdf.rename(columns={"k": "k"}).rename(columns={"x": "k"})
    got = left.merge(r2, left_on="x", right_on="k")
    exp = left_pdf.merge(rp2, left_on="x", right_on="k")
    assert_frame_eq(got, exp, sort_by=["x"])


def test_merge_suffixes(spark):
    # collision on non-key column z (reference tests/test_merge.py:86-96)
    p1 = pd.DataFrame({"x": [1, 2, 3], "z": [10, 20, 30]})
    p2 = pd.DataFrame({"x": [1, 2, 4], "z": [100, 200, 400]})
    d1, d2 = pes.from_pandas(p1), pes.from_pandas(p2)
    got = d1.merge(d2, on="x", how="outer")
    exp = p1.merge(p2, on="x", how="outer")
    assert_frame_eq(got, exp, sort_by=["x"])
    assert sorted(got.columns) == ["x", "z_x", "z_y"]
    got2 = d1.merge(d2, on="x", suffixes=("_l", "_r"))
    assert sorted(got2.columns) == ["x", "z_l", "z_r"]


def test_merge_indicator(left, right, left_pdf, right_pdf):
    got = left.merge(right, on="x", how="outer", indicator=True).compute()
    exp = left_pdf.merge(right_pdf, on="x", how="outer", indicator=True)
    got = got.sort_values("x").reset_index(drop=True)
    exp = exp.sort_values("x").reset_index(drop=True)
    assert got["_merge"].tolist() == exp["_merge"].astype(str).tolist()


def test_merge_index(spark):
    p1 = pd.DataFrame({"y": [1, 2, 3]}, index=pd.Index([0, 1, 2], name="i"))
    p2 = pd.DataFrame({"z": [10, 30]}, index=pd.Index([0, 2], name="i"))
    d1, d2 = pes.from_pandas(p1), pes.from_pandas(p2)
    got = d1.merge(d2, left_index=True, right_index=True).compute().sort_index()
    exp = p1.merge(p2, left_index=True, right_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_index_type=False)


def test_join_index(spark):
    p1 = pd.DataFrame({"y": [1, 2, 3]}, index=pd.Index([0, 1, 2], name="i"))
    p2 = pd.DataFrame({"z": [10, 30]}, index=pd.Index([0, 2], name="i"))
    d1, d2 = pes.from_pandas(p1), pes.from_pandas(p2)
    got = d1.join(d2).compute().sort_index()
    exp = p1.join(p2)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_index_type=False)


def test_join_list_rhs(spark):
    # reference JoinRecursive (`_merge.py:82-128`) → n-ary fold
    p1 = pd.DataFrame({"a": [1, 2]}, index=pd.Index([0, 1], name="i"))
    p2 = pd.DataFrame({"b": [3, 4]}, index=pd.Index([0, 1], name="i"))
    p3 = pd.DataFrame({"c": [5, 6]}, index=pd.Index([0, 1], name="i"))
    d1, d2, d3 = map(pes.from_pandas, (p1, p2, p3))
    got = d1.join([d2, d3]).compute().sort_index()
    exp = p1.join([p2, p3])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_index_type=False)


def test_semi_anti(left, right, left_pdf, right_pdf):
    got = left.merge(right, on="x", how="semi").compute()
    assert sorted(got.columns) == ["x", "y"]
    assert sorted(got["x"].tolist()) == sorted(
        left_pdf[left_pdf.x.isin(right_pdf.x)].x.tolist())
    got = left.merge(right, on="x", how="anti").compute()
    assert sorted(got["x"].tolist()) == sorted(
        left_pdf[~left_pdf.x.isin(right_pdf.x)].x.tolist())


def test_cross(spark):
    p1 = pd.DataFrame({"a": [1, 2]})
    p2 = pd.DataFrame({"b": [3, 4, 5]})
    got = pes.from_pandas(p1).merge(pes.from_pandas(p2), how="cross")
    assert len(got.compute()) == 6


def test_broadcast_hint(left, right):
    out = left.merge(right, on="x", broadcast=True)
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
