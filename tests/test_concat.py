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


def test_concat_bad_axis_raises(spark, p1, p2):
    # axis=1 is SUPPORTED here (beyond the reference, which rejects it at
    # `_collection.py:638-652`) — only nonsense axes raise
    with pytest.raises(ValueError):
        pes.concat([pes.from_pandas(p1), pes.from_pandas(p2)], axis=2)


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


def test_concat_axis1_outer_inner(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    a = pd.DataFrame({"k": [1, 2, 3], "x": [10., 20., 30.]})
    b = pd.DataFrame({"k": [2, 3, 4], "y": ["b", "c", "d"]})
    fa = pes.from_pandas(a).set_index("k")
    fb = pes.from_pandas(b).set_index("k")
    got = (pes.concat([fa, fb], axis=1).reset_index().compute()
           .sort_values("k").reset_index(drop=True))
    exp = (pd.concat([a.set_index("k"), b.set_index("k")], axis=1)
           .reset_index(names="k"))
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["x"].fillna(-1).tolist() == exp["x"].fillna(-1).tolist()
    assert got["y"].fillna("-").tolist() == exp["y"].fillna("-").tolist()
    inner = (pes.concat([fa, fb], axis=1, join="inner").reset_index()
             .compute().sort_values("k"))
    assert inner["k"].tolist() == [2, 3]


def test_concat_axis1_positional_and_errors(spark):
    import pandas as pd
    import pytest as _pt
    import pandas_expr_spark as pes
    c = pes.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))
    d = pes.from_pandas(pd.DataFrame({"y": [9, 8, 7]}))
    got = pes.concat([c, d], axis=1).compute().sort_values("x")
    assert got["y"].tolist() == [9, 8, 7]  # positional alignment
    with _pt.raises(ValueError):
        pes.concat([c, c], axis=1)  # duplicate column names
