"""Round-8 optimization pins.

The r8 optimization folded rolling_minmax's second position join (lagged
running counts for the min_periods guard) into the suffix-at-start join
via the exact identity C(SP-1) = C(SP) - nn(SP).  These tests pin the
fold at the operator level — nulls crossing block boundaries, dual
min+max output, the centered path, and the early-row clamp — against
pandas ground truth.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes
from pandas_expr_spark.functions import scan


@pytest.fixture(scope="module")
def null_pdf():
    rng = np.random.RandomState(11)
    n = 257  # not a multiple of any tested window: exercises ragged tail
    pdf = pd.DataFrame({
        "k": np.arange(n, dtype="int64"),
        "v": rng.randn(n) * 5,
    })
    # null runs LONGER than the window so whole windows are empty, and
    # nulls parked exactly at block boundaries of w=7 (positions 6,7,8)
    pdf.loc[5:13, "v"] = np.nan
    pdf.loc[pdf.sample(40, random_state=3).index, "v"] = np.nan
    return pdf


@pytest.mark.parametrize("w,mp", [(7, None), (7, 1), (7, 3), (4, 2),
                                  (1, None)])
def test_rolling_minmax_fold_null_blocks(spark, null_pdf, w, mp):
    sdf = spark.createDataFrame(null_pdf)
    out = scan.rolling_minmax(sdf, "v", ["k"], w, fn=["min", "max"],
                              out=["mn", "mx"], min_periods=mp)
    got = out.toPandas().sort_values("k").reset_index(drop=True)
    exp_mn = null_pdf["v"].rolling(w, min_periods=mp).min()
    exp_mx = null_pdf["v"].rolling(w, min_periods=mp).max()
    np.testing.assert_allclose(got["mn"].to_numpy(), exp_mn.to_numpy(),
                               equal_nan=True)
    np.testing.assert_allclose(got["mx"].to_numpy(), exp_mx.to_numpy(),
                               equal_nan=True)


@pytest.mark.parametrize("w,mp", [(5, None), (5, 2), (4, 2)])
def test_rolling_minmax_fold_centered(spark, null_pdf, w, mp):
    sdf = spark.createDataFrame(null_pdf)
    out = scan.rolling_minmax(sdf, "v", ["k"], w, fn="min", out="mn",
                              min_periods=mp, center=True)
    got = out.toPandas().sort_values("k").reset_index(drop=True)
    exp = null_pdf["v"].rolling(w, min_periods=mp, center=True).min()
    np.testing.assert_allclose(got["mn"].to_numpy(), exp.to_numpy(),
                               equal_nan=True)


def test_rolling_minmax_single_position_join(spark, null_pdf):
    """The fold's plan contract: exactly ONE position join (on __SP__).

    Before the fold, the lagged-count table added a second equi-join
    keyed on __P__.  prefix_scan's per-partition carry joins (keyed on
    the partition id) are unrelated and excluded."""
    import re
    sdf = spark.createDataFrame(null_pdf)
    out = scan.rolling_minmax(sdf, "v", ["k"], 7, fn="min", out="mn")
    plan = out._jdf.queryExecution().executedPlan().toString()
    pos_joins = [m.group(0) for m in re.finditer(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
        r" \[__(SP|P)__#\d+L?\]", plan)]
    assert len(pos_joins) == 1, f"expected one position join: {pos_joins}"
    assert "__SP__" in pos_joins[0]
