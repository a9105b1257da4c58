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


# ---------------------------------------------------------------- session 3


def test_global_pos_lazy_checkpoint_consistent(spark):
    """s3 pin: `_ranged`'s checkpoint is LAZY — both plan branches (local
    arange + per-partition offsets) must still read ONE pinned RDD, so the
    positions are a permutation of 0..n-1 that follows the sort order even
    when the upstream partitioning is adversarial (round-robin scramble)."""
    n = 1003
    pdf = pd.DataFrame({"k": np.random.RandomState(7).permutation(n),
                        "v": np.arange(n)})
    sdf = spark.createDataFrame(pdf).repartition(13)  # scrambled input
    out = scan.global_pos(sdf, ["k"], "pos", num_partitions=7).toPandas()
    assert sorted(out["pos"]) == list(range(n))
    ordered = out.sort_values("k")["pos"].to_numpy()
    assert (ordered == np.arange(n)).all()


def test_edit_distance_prune_broadcast_semi(spark):
    """s3 plan contract: the candidate-id prune must be a BROADCAST semi
    join (an SMJ here would shuffle-sort the whole corpus text to answer
    a candidate-sized membership test), and planted exact copies must
    survive the prune with edit distance 0."""
    from pandas_expr_spark.functions import dedup
    words = ["alpha beta gamma delta epsilon zeta eta theta",
             "one two three four five six seven eight nine",
             "lorem ipsum dolor sit amet consectetur adipiscing"]
    rows = [(i, words[i % 3] + f" tail{i}") for i in range(60)]
    rows += [(1000 + i, words[i % 3] + f" tail{i}") for i in range(5)]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.edit_distance_pairs(sdf, max_dist=4, num_perm=32, bands=8)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # r8-advice fix: assert the broadcast-semi SHAPE on the join's own
    # line (a fixed character window was brittle across Spark versions /
    # AQE re-planning even when the shape was intact)
    import re
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan), \
        "candidate prune is not a broadcast semi join:\n" + plan[:2000]
    got = {(r.id_a, r.id_b): r.edit_dist for r in pairs.collect()}
    for i in range(5):
        assert got.get((i, 1000 + i)) == 0


def test_learn_bpe_periodic_cut_keeps_sequence(spark):
    """s3 pin: the periodic lineage-cut checkpoint (now lazy) must not
    change the merge sequence — learning with checkpoint_every=3 (cut
    fires 3x over 12 merges) equals learning with the cut disabled."""
    from pandas_expr_spark.functions import bpe
    texts = [(i, "the quick brown fox jumps over the lazy dog " * 3)
             for i in range(30)]
    texts += [(100 + i, "pack my box with five dozen liquor jugs " * 2)
              for i in range(20)]
    sdf = spark.createDataFrame(texts, ["doc_id", "text"])
    m_cut, _ = bpe.learn_bpe(sdf, n_merges=12, checkpoint_every=3)
    m_ref, _ = bpe.learn_bpe(sdf, n_merges=12, checkpoint_every=100)
    assert m_cut == m_ref
    assert len(m_cut) == 12


def test_decontaminate_narrow_exchange(spark):
    """s3 plan contract: decontaminate's compute-spreading repartition
    must carry only (id, text) — wide payload columns stay out of every
    hash-partitioning exchange — and the added flags are unchanged."""
    from pandas_expr_spark.functions import dedup
    docs = spark.createDataFrame(
        [(i, f"token{i} shared common words here {i}", "x" * 50, i * 1.5)
         for i in range(40)],
        ["doc_id", "text", "payload", "score"])
    ev = spark.createDataFrame([(0, "shared common words")], ["eid", "text"])
    out = dedup.decontaminate(docs, ev, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(doc_id[^\n]*", plan):
        assert "payload" not in m.group(0), m.group(0)
    got = out.toPandas()
    assert bool(got["contaminated"].all())
    assert set(got.columns) >= {"doc_id", "text", "payload", "score",
                                "n_shared_ngrams", "contaminated"}
