"""Round-6 blast-radius pins for the presentation-order stamp (_ORDER).

The stamp is global and load-bearing (r5 wave Q): these probes pin its
survival through the compositions the r5 verdict flagged as un-probed —
concat of sorted frames, merge-after-sort, groupby-on-sorted, set_index
after sort, drop_duplicates after sort, parquet round-trips, and the new
fused head/tail outputs feeding positional scans.
"""
from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def pdf():
    return pd.DataFrame({
        "k": [2, 1, 3, 1, 2, 3, 1, 2],
        "v": [10., 20., 30., 40., 50., 60., 70., 80.],
        "g": ["a", "b", "a", "b", "a", "b", "a", "b"],
    })


@pytest.fixture()
def other():
    return pd.DataFrame({"k": [1, 2, 3], "w": [100., 200., 300.]})


def _f(pdf):
    import pandas_expr_spark as pes
    return pes.from_pandas(pdf)


def _eq_series(got, exp):
    pd.testing.assert_series_equal(got.compute(), exp, check_dtype=False,
                                   check_index_type=False)


def _eq_frame(got, exp):
    pd.testing.assert_frame_equal(got.compute(), exp, check_dtype=False,
                                  check_index_type=False)


def test_concat_of_sorted_frames_cumsum(spark, pdf):
    import pandas_expr_spark as pes
    got = pes.concat([_f(pdf).sort_values("v", ascending=False),
                      _f(pdf).sort_values("v")])["v"].cumsum()
    exp = pd.concat([pdf.sort_values("v", ascending=False),
                     pdf.sort_values("v")])["v"].cumsum()
    _eq_series(got, exp)


@pytest.mark.parametrize("how", ["left", "inner"])
def test_merge_after_sort_keeps_left_order(spark, pdf, other, how):
    got = _f(pdf).sort_values("v", ascending=False).merge(
        _f(other), on="k", how=how)
    exp = pdf.sort_values("v", ascending=False).merge(other, on="k", how=how)
    _eq_frame(got, exp)


def test_groupby_on_sorted(spark, pdf):
    got = _f(pdf).sort_values("v", ascending=False).groupby("g")["v"].sum()
    exp = pdf.sort_values("v", ascending=False).groupby("g")["v"].sum()
    _eq_series(got, exp)


def test_set_index_after_sort_positional(spark, pdf):
    got = _f(pdf).sort_values("v", ascending=False).set_index("k")["v"].cumsum()
    exp = pdf.sort_values("v", ascending=False).set_index("k")["v"].cumsum()
    _eq_series(got, exp)


def test_drop_duplicates_first_after_sort(spark, pdf):
    got = _f(pdf).sort_values("v", ascending=False).drop_duplicates(subset="k")
    exp = pdf.sort_values("v", ascending=False).drop_duplicates(subset="k")
    _eq_frame(got, exp)


def test_fused_head_assign_cumsum(spark, pdf):
    f = _f(pdf).sort_values("v").head(5)
    got = f.assign(c=f["v"].cumsum())
    e = pdf.sort_values("v").head(5)
    exp = e.assign(c=e["v"].cumsum())
    _eq_frame(got, exp)


def test_fused_tail_cumsum(spark, pdf):
    got = _f(pdf).sort_values("v", ascending=False).tail(4)["v"].cumsum()
    exp = pdf.sort_values("v", ascending=False).tail(4)["v"].cumsum()
    _eq_series(got, exp)


def test_sort_filter_cumsum(spark, pdf):
    f = _f(pdf).sort_values("v", ascending=False)
    got = f[f["v"] > 25.]["v"].cumsum()
    e = pdf.sort_values("v", ascending=False)
    exp = e[e["v"] > 25.]["v"].cumsum()
    _eq_series(got, exp)


def test_double_sort_is_stable(spark, pdf):
    # prior stamp becomes the tie breaker: sort-after-sort matches
    # pandas kind="stable"
    got = _f(pdf).sort_values("v").sort_values("k")
    exp = pdf.sort_values("v").sort_values("k", kind="stable")
    _eq_frame(got, exp)


def test_sorted_rolling_presented_order(spark, pdf):
    got = _f(pdf).sort_values("v", ascending=False)["v"].rolling(3).mean()
    exp = pdf.sort_values("v", ascending=False)["v"].rolling(3).mean()
    _eq_series(got, exp)


def test_sort_to_parquet_roundtrip(spark, pdf, tmp_path):
    import pandas_expr_spark as pes
    path = str(tmp_path / "rt.parquet")
    _f(pdf).sort_values("v", ascending=False).to_parquet(path)
    got = pes.read_parquet(path)["v"].cumsum()
    exp = (pdf.sort_values("v", ascending=False).reset_index(drop=True)
           ["v"].cumsum())
    _eq_series(got, exp)
