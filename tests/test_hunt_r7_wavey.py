"""Round-7 hunt wave Y pins — label/order divergences found by the
randomized index-checking harness (scripts/hunt_prop_r7.py).

Before the fixes:
- ``melt()`` required a positional ``id_vars`` (pandas defaults None);
- ``sort_values(ignore_index=True)`` on an INDEXED frame silently KEPT
  the old index instead of renumbering 0..n-1;
- ``reset_index(drop=True)`` on a pristine default-index frame dropped
  the in-scan label column, so a later filter renumbered where pandas
  (for whom the reset was a no-op) kept original labels;
- sorts of an index-carrying frame had NO tie-break column → Spark's
  unstable sort scrambled tied rows (pandas kind='stable' order);
- ``tail`` (and sorts) on a STAMPED unindexed frame renumbered labels
  by physical layout instead of the stamped presentation order —
  _anchor_rowid now runs a stamp-position pass (extends r6 seed-96).

pandas' default sort kind is UNSTABLE quicksort — differential sort
pins therefore pass kind='stable' on the pandas side, matching the
engine's always-stable contract.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_expr_spark import concat, from_pandas


def test_melt_default_id_vars(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0], "i": [3, 4]})
    got = from_pandas(pdf).melt().compute().sort_index()
    exp = pdf.melt()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sort_ignore_index_on_indexed_frame(spark):
    pdf = pd.DataFrame({"g": list("abab"), "v": [3.0, 1.0, 4.0, 2.0]})
    exp = (pdf.drop_duplicates(subset=["g"])
           .sort_values("v", ignore_index=True, kind="stable"))
    got = (from_pandas(pdf).drop_duplicates(subset=["g"])
           .sort_values("v", ignore_index=True)).compute()
    assert got.index.tolist() == exp.index.tolist()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_reset_drop_noop_keeps_labels(spark):
    # reset_index(drop=True) on a default-index frame is a pandas no-op:
    # a later filter must still return ORIGINAL labels
    pdf = pd.DataFrame({"a": [1, 2, 3, 4, 5]})
    exp = pdf.reset_index(drop=True)
    exp = exp[exp.a > 2]
    f = from_pandas(pdf).reset_index(drop=True)
    got = f[f.a > 2].compute()
    assert got.index.tolist() == exp.index.tolist() == [2, 3, 4]


def test_sort_tie_stability_on_promoted_frame(spark):
    # filter promotes labels; a following sort must break ties in label
    # order (pandas kind='stable')
    pdf = pd.DataFrame({"v": [1.0, 1.0, 1.0, 1.0, 2.0],
                        "i": [5, 4, 3, 2, 1]})
    exp = pdf[pdf.i > 1].sort_values("v", kind="stable")
    f = from_pandas(pdf)
    got = f[f.i > 1].sort_values("v").compute()
    assert got.index.tolist() == exp.index.tolist()
    # and through the TopK fuse (head/tail after the sort)
    exp_t = pdf[pdf.i > 1].sort_values("v", kind="stable").tail(2)
    got_t = f[f.i > 1].sort_values("v").tail(2).compute()
    assert got_t.index.tolist() == exp_t.index.tolist()


def test_tail_on_stamped_frame_keeps_stamp_labels(spark):
    # concat(ignore_index=True) renumbers 0..n-1 in presented order;
    # tail must keep THOSE labels (stamp-position pass, r7 hunt)
    a = pd.DataFrame({"v": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"v": [4.0, 5.0]})
    exp = pd.concat([a, b], ignore_index=True).tail(3)
    got = (concat([from_pandas(a), from_pandas(b)], ignore_index=True)
           .tail(3)).compute()
    assert got.index.tolist() == exp.index.tolist() == [2, 3, 4]
    assert got["v"].tolist() == exp["v"].tolist()


def test_filter_on_stamped_frame_keeps_stamp_labels(spark):
    # sort_values(ignore_index=True) → stamped unindexed frame; a bare
    # filter keeps the dense renumbered labels like pandas
    pdf = pd.DataFrame({"v": [3.0, 1.0, 4.0, 2.0], "i": [1, 2, 3, 4]})
    exp = pdf.sort_values("v", ignore_index=True, kind="stable")
    exp = exp[exp.i > 1]
    got_f = (from_pandas(pdf).sort_values("v", ignore_index=True))
    got = got_f[got_f.i > 1].compute()
    assert got.index.tolist() == exp.index.tolist()
    assert got["v"].tolist() == exp["v"].tolist()


def test_sort_after_concat_ignore_stamp_labels(spark):
    # sort of a stamped frame anchors labels by STAMP position, not the
    # physical union layout
    a = pd.DataFrame({"v": [3.0, 1.0]})
    b = pd.DataFrame({"v": [2.0, 0.5]})
    exp = pd.concat([a, b], ignore_index=True) \
        .sort_values("v", kind="stable")
    got = (concat([from_pandas(a), from_pandas(b)], ignore_index=True)
           .sort_values("v")).compute()
    assert got.index.tolist() == exp.index.tolist()


@pytest.mark.parametrize("seed", [20013, 20016, 20017, 20020, 20042,
                                  20049, 20053, 20056, 20064, 20075,
                                  20078, 20082, 20085, 20086, 20091,
                                  20102, 20104, 20110, 20114])
def test_hunt_seed_replay(spark, seed):
    # the exact failing seeds from the r7 randomized hunt, replayed
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    import hunt_prop_r7 as H
    st, detail = H.run_case(seed)
    assert st == "OK", detail


def test_series_drop_duplicates_keeps_labels(spark):
    sp = pd.Series([3.0, 1.0, 3.0, 2.0, 1.0], name="v")
    exp = sp.drop_duplicates()
    got = from_pandas(sp).drop_duplicates().compute()
    assert got.index.tolist() == exp.index.tolist() == [0, 1, 3]
    assert got.tolist() == exp.tolist()
    exp_l = sp.drop_duplicates(keep="last")
    got_l = from_pandas(sp).drop_duplicates(keep="last").compute()
    assert got_l.sort_index().index.tolist() == \
        exp_l.sort_index().index.tolist()


def test_set_index_reset_keeps_order_and_labels(spark):
    # dedup (rowid-labeled survivors) → set_index → reset_index must keep
    # BOTH the presented row order (stamp carry) and, for pristine
    # frames, pandas' renumbered labels at the next subsetting op
    pdf = pd.DataFrame({"g": list("abab"), "v": [1.0, None, 3.0, 4.0]})
    got = (from_pandas(pdf).set_index("g").reset_index().dropna()
           .compute())
    exp = pdf.set_index("g").reset_index().dropna()
    assert got.index.tolist() == exp.index.tolist()
    assert got["v"].tolist() == exp["v"].tolist()
    # dedup → set_index → reset: row order preserved
    pdf2 = pd.DataFrame({"g": ["b", "b", "a"], "v": [1.0, 2.0, 3.0]})
    got2 = (from_pandas(pdf2).drop_duplicates(subset=["g"])
            .set_index("g").reset_index().compute())
    exp2 = pdf2.drop_duplicates(subset=["g"]).set_index("g").reset_index()
    assert got2["g"].tolist() == exp2["g"].tolist() == ["b", "a"]


def test_sorted_ignore_tail_fuse_labels(spark):
    # the TopK tail fuse on an ignore_index sort derives pandas' dense
    # positions from a lazy count branch (hunt seed 40142)
    pdf = pd.DataFrame({"i": [3, 1, 4, 1, 5, 9, 2, 6]})
    got = (from_pandas(pdf).sort_values("i", ignore_index=True)
           .tail(3).compute())
    exp = pdf.sort_values("i", ignore_index=True, kind="stable").tail(3)
    assert got.index.tolist() == exp.index.tolist() == [5, 6, 7]
    assert got["i"].tolist() == exp["i"].tolist()


def test_iloc_follows_stamp_positions(spark):
    # iloc positions follow the PRESENTED (stamped) order, and a stamped
    # frame's dense labels survive slicing/reversal (seeds 40016/40050)
    pdf = pd.DataFrame({"v": [3.0, 1.0, 4.0, 2.0, 5.0]})
    e = from_pandas(pdf).sort_values("v", ignore_index=True)
    x = pdf.sort_values("v", ignore_index=True, kind="stable")
    for sl in (slice(1, 4), slice(None, None, -1), slice(None, None, 2)):
        got = e.iloc[sl].compute()
        exp = x.iloc[sl]
        assert got.index.tolist() == exp.index.tolist(), sl
        assert got["v"].tolist() == exp["v"].tolist(), sl
    # double reversal round-trips
    got = e.iloc[::-1].iloc[::-1].compute()
    assert got["v"].tolist() == x["v"].tolist()
    assert got.index.tolist() == x.index.tolist()
