"""Differential wave 6 (vs eager pandas): reshape round-trips, datetime
accessor breadth, replace/fillna edge shapes, concat with missing columns,
groupby head/tail label preservation on default-index frames."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def pdf6():
    rng = np.random.RandomState(11)
    n = 120
    return pd.DataFrame({
        "g": [f"g{i % 4}" for i in range(n)],
        "h": [f"h{i % 3}" for i in range(n)],
        "x": [float(v) if v % 4 else np.nan
              for v in rng.randint(0, 30, n)],
        "v": rng.randint(-10, 10, n).astype("int64"),
        "ts": pd.Timestamp("2023-06-15 01:23:45")
              + pd.to_timedelta(rng.randint(0, 86400 * 400, n), unit="s"),
    })


@pytest.fixture()
def df6(spark, pdf6):
    from pandas_expr_spark import from_pandas
    return from_pandas(pdf6)


def test_series_unstack_levels(df6, pdf6):
    for level in [-1, 0]:
        agg = df6.groupby(["g", "h"]).v.sum().unstack(level=level)
        ref = pdf6.groupby(["g", "h"]).v.sum().unstack(level=level)
        got = agg.compute().sort_index()
        exp = ref.sort_index()
        pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                      exp[sorted(exp.columns)],
                                      check_dtype=False, check_names=False)
    # fill_value path
    got = (df6.groupby(["g", "h"]).v.sum().unstack(fill_value=0)
           .compute().sort_index())
    exp = pdf6.groupby(["g", "h"]).v.sum().unstack(fill_value=0).sort_index()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False, check_names=False)


def test_dt_accessor_breadth(df6, pdf6):
    for attr in ["dayofweek", "dayofyear", "days_in_month", "quarter",
                 "is_month_start", "is_month_end", "week"]:
        got = getattr(df6.ts.dt, attr).compute().sort_index()
        exp = getattr(pdf6.ts.dt, "isocalendar")().week.astype("int64") \
            if attr == "week" else getattr(pdf6.ts.dt, attr)
        assert got.astype("int64").tolist() == exp.astype("int64").tolist(), attr


def test_replace_dict_and_fillna_dict(df6, pdf6):
    got = (df6.replace({"g": {"g0": "G0"}, "v": {0: 99}})
           .fillna({"x": -1.0}).compute().sort_index())
    exp = (pdf6.replace({"g": {"g0": "G0"}, "v": {0: 99}})
           .fillna({"x": -1.0}))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_concat_outer_missing_columns(spark):
    import pandas_expr_spark as pes
    a = pd.DataFrame({"x": [1, 2], "y": [1.0, 2.0]})
    b = pd.DataFrame({"x": [3, 4], "z": ["a", "b"]})
    got = (pes.concat([pes.from_pandas(a), pes.from_pandas(b)])
           .compute().reset_index(drop=True))
    exp = pd.concat([a, b]).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    for c in exp.columns:
        ge = got[c].fillna("~").tolist()
        ee = exp[c].fillna("~").tolist()
        assert ge == ee, c


def test_groupby_head_preserves_labels(df6, pdf6):
    got = df6.groupby("g").head(3).compute().sort_index()
    exp = pdf6.groupby("g").head(3).sort_index()
    assert got.index.tolist() == exp.index.tolist()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_series_between_inclusive(df6, pdf6):
    for inc in ["both", "neither", "left", "right"]:
        got = df6.v.between(-3, 4, inclusive=inc).compute().sort_index()
        exp = pdf6.v.between(-3, 4, inclusive=inc)
        assert got.tolist() == exp.tolist(), inc


def test_diff_pct_change_periods(df6, pdf6):
    for p in [1, 2, -1]:
        got = df6.v.diff(periods=p).compute().sort_index()
        exp = pdf6.v.diff(periods=p)
        np.testing.assert_allclose(got.fillna(-99).values,
                                   exp.fillna(-99).values)
    # explicit fill_method=None on both sides (pad default tested in batch 9)
    got = df6.x.pct_change(fill_method=None).compute().sort_index()
    exp = pdf6.x.pct_change(fill_method=None)
    np.testing.assert_allclose(got.fillna(-99).values,
                               exp.fillna(-99).values)
