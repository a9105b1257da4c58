"""Round-9 optimization pins: the scan-family summary fold.

The r9 rework fuses the per-partition summary into the local mapInPandas
pass (one trailing marker row per partition) and folds the carries over
that #partitions-row table — deleting the second aggregate pass over the
ranged table.  These tests pin the hazards called out by the r8 advice:
heavily duplicated sort keys plus EMPTY input slices (the originally
observed ``repartitionByRange`` boundary-divergence trigger), and the
branch-consistency contracts every scan op relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_expr_spark.functions import scan


@pytest.fixture(scope="module")
def dup_sdf(spark):
    """200 rows over only 5 distinct sort-key values (40-way ties), with
    nulls in the value column, UNIONED with three empty slices — the
    empty-slice padding is what historically diverged two independent
    range-boundary samplings."""
    rows = [(i % 5, float(i % 13) if i % 7 else None, i) for i in range(200)]
    sdf = spark.createDataFrame(rows, ["k", "v", "payload"])
    empty = spark.createDataFrame([], "k int, v double, payload int")
    return empty.union(sdf.where(F.col("k") < 0)).union(sdf).union(empty)


def test_global_pos_dup_keys_empty_slices(spark, dup_sdf):
    out = scan.global_pos(dup_sdf, ["k"], "pos", num_partitions=7).toPandas()
    # every position exactly once — a boundary divergence between the
    # count branch and the row branch shows up as duplicate/missing pos
    assert sorted(out["pos"]) == list(range(200))
    # positions respect the (non-unique) sort key
    srt = out.sort_values("pos")
    assert srt["k"].is_monotonic_increasing


def test_prefix_scan_dup_keys_empty_slices(spark, dup_sdf):
    out = scan.prefix_scan(dup_sdf, [("v", "sum", "cv")], ["k"],
                           num_partitions=7).toPandas()
    assert len(out) == 200  # no fan-out from the carry join
    # ties make per-row order ambiguous, but the cumsum's set of values
    # within each key group is order-independent ONLY at group ends —
    # check the strongest order-free invariants instead: the global
    # maximum equals the total, and within the sorted frame the running
    # sum is non-decreasing in k-group order for non-null rows
    total = sum(float(i % 13) for i in range(200) if i % 7)
    nn = out["cv"].dropna()
    assert len(nn) and abs(nn.max() - total) < 1e-9
    per_key_sum = {}
    for i in range(200):
        if i % 7:
            per_key_sum.setdefault(i % 5, 0.0)
            per_key_sum[i % 5] += float(i % 13)
    # running total at the END of each key group is deterministic even
    # under ties: sum of all groups up to that key
    acc = 0.0
    for k in range(5):
        acc += per_key_sum[k]
        grp = out[out["k"] == k]["cv"].dropna()
        assert abs(grp.max() - acc) < 1e-9


def test_rolling_minmax_dup_keys_no_fanout(spark, dup_sdf):
    out = scan.rolling_minmax(dup_sdf, "v", ["k"], 9, fn=["min", "max"],
                              out=["rmin", "rmax"], min_periods=1,
                              num_partitions=7).toPandas()
    assert len(out) == 200  # suffix-at-start join must stay 1:1
    # order-free spot check: with min_periods=1 every window holding at
    # least one non-null (all but possibly the first row) is non-null
    assert out["rmin"].notna().sum() >= 199
    assert float(out["rmax"].max()) == 12.0 and float(out["rmin"].min()) == 0.0


def test_last_scan_dup_keys_empty_slices(spark, dup_sdf):
    out = scan.last_scan(dup_sdf, ["v"], ["k"],
                         num_partitions=7).toPandas()
    assert len(out) == 200
    # ffill over a frame whose FIRST sorted rows may be null: null count
    # can only shrink, and every non-null input value is preserved
    assert out["v"].isna().sum() <= sum(1 for i in range(200) if i % 7 == 0)
    assert set(out["v"].dropna()) <= {float(i % 13) for i in range(200)}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bpe_batched_argmax_matches_reference(spark, seed):
    """r9 batched pair-count argmax: the accepted-prefix guard must keep
    the merge sequence byte-identical to the canonical one-at-a-time
    reference, across random corpora with heavy tie pressure (tiny
    alphabet -> many shared symbols, many equal counts) and deep merge
    counts that cross the lineage-cut boundary."""
    import random
    from pandas_expr_spark.functions import bpe
    rng = random.Random(seed)
    alpha = "abcde"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
             for _ in range(40)]
    texts = [(i, " ".join(rng.choices(words, k=rng.randint(3, 12))))
             for i in range(25)]
    sdf = spark.createDataFrame(texts, ["doc_id", "text"])
    wf: dict[str, int] = {}
    for _, t in texts:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    ref = bpe.learn_bpe_py(wf, 20)
    got, _ = bpe.learn_bpe(sdf, n_merges=20, checkpoint_every=6, batch_k=8)
    assert got == ref


def test_bpe_batch_k1_identical(spark):
    """batch_k=1 must reproduce the pre-r9 loop exactly."""
    from pandas_expr_spark.functions import bpe
    texts = [(i, "low lower lowest newer newest wide widest " * 2)
             for i in range(10)]
    sdf = spark.createDataFrame(texts, ["doc_id", "text"])
    m1, _ = bpe.learn_bpe(sdf, n_merges=10, batch_k=1)
    m8, _ = bpe.learn_bpe(sdf, n_merges=10, batch_k=8)
    assert m1 == m8


def test_semdedup_banding_pair_set_identical(spark):
    """r9 skew fix: banding the within-cluster pair join must not change
    the survivor set (every pair still meets exactly once, in the
    b-side's band), and the join must key on (cluster, band) so one
    mega-cluster cannot serialize into a single task."""
    from pandas_expr_spark.functions import clustering
    emb = spark.createDataFrame(
        [(i, [10.0 if j == i % 4 else
              (4.0 * (i % 3) if j == 4 + i % 4 else 0.01 * ((i * 17 + j) % 7))
              for j in range(16)]) for i in range(120)],
        ["vec_id", "embedding"])
    kept1 = clustering.semantic_dedup(emb, k=4, threshold=0.98, max_iter=4,
                                      bands=1)
    kept5 = clustering.semantic_dedup(emb, k=4, threshold=0.98, max_iter=4,
                                      bands=5)
    assert (sorted(r["vec_id"] for r in kept1.collect())
            == sorted(r["vec_id"] for r in kept5.collect()))
    plan = kept5._jdf.queryExecution().executedPlan().toString()
    assert "__band__" in plan, plan


def test_scan_summary_fold_is_single_pass(spark, dup_sdf):
    """Plan contract: prefix_scan's carry fold reads the MARKER rows of
    the one fused (checkpoint-hidden) pass — there is NO second
    aggregate pass over the ranged table (the pre-r9 plan showed a
    HashAggregate pair feeding the carry window; now the carry side is a
    filter over the pinned RDD).  The per-row pass is inside the
    checkpointed RDD, so no MapInPandas appears above it either."""
    out = scan.prefix_scan(dup_sdf, [("v", "sum", "cv")], ["k"],
                           num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan, plan
    assert "MapInPandas" not in plan, plan  # fused + pinned
    assert "Window" in plan and "BroadcastExchange" in plan, plan
