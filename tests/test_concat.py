"""Concat / set-op tests (reference ``tests/test_concat.py`` → SURVEY §2.4)."""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import assert_frame_eq

import pandas_expr_spark as pes


@pytest.fixture()
def p1():
    return pd.DataFrame({"a": [1, 2], "b": [3.0, 4.0]})


@pytest.fixture()
def p2():
    return pd.DataFrame({"a": [5, 6], "c": ["x", "y"]})


def test_concat_outer(spark, p1, p2):
    got = pes.concat([pes.from_pandas(p1), pes.from_pandas(p2)])
    exp = pd.concat([p1, p2], ignore_index=True)
    assert_frame_eq(got, exp, sort_by=["a"])


def test_concat_inner(spark, p1, p2):
    got = pes.concat([pes.from_pandas(p1), pes.from_pandas(p2)], join="inner")
    exp = pd.concat([p1, p2], join="inner", ignore_index=True)
    assert_frame_eq(got, exp, sort_by=["a"])


def test_concat_axis1_raises(spark, p1, p2):
    # reference rejects axis=1 (`_collection.py:638-652`)
    with pytest.raises(NotImplementedError):
        pes.concat([pes.from_pandas(p1), pes.from_pandas(p2)], axis=1)


def test_concat_same_schema(spark, p1):
    got = pes.concat([pes.from_pandas(p1), pes.from_pandas(p1)])
    exp = pd.concat([p1, p1], ignore_index=True)
    assert_frame_eq(got, exp)


def test_union_distinct(spark, p1):
    d = pes.from_pandas(p1)
    got = pes.union(d, d, distinct=True)
    assert len(got.compute()) == 2


def test_intersect_except(spark):
    pa = pd.DataFrame({"a": [1, 2, 3]})
    pb = pd.DataFrame({"a": [2, 3, 4]})
    da, db = pes.from_pandas(pa), pes.from_pandas(pb)
    assert sorted(pes.intersect(da, db).compute()["a"].tolist()) == [2, 3]
    assert pes.except_(da, db).compute()["a"].tolist() == [1]
