"""Scale-path operators: salted join correctness + plan, bucketed tables
(shuffle-free co-located join)."""

from __future__ import annotations

import contextlib
import io

import pandas as pd
import pytest

from conftest import assert_frame_eq

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey", "l_quantity"]]
    part = pes.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]] \
        .rename(columns={"p_partkey": "l_partkey"})
    plain = li.merge(part, on="l_partkey").compute()
    salted = pes.salted_join(li, part, on="l_partkey", salt=8).compute()
    assert_frame_eq(salted, plain, sort_by=["l_orderkey", "l_partkey",
                                            "l_quantity"])


def test_salted_join_left_how(spark):
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    part = pes.read_parquet(f"{SF}/part.parquet")
    sub = part[part.p_size > 40][["p_partkey", "p_size"]] \
        .rename(columns={"p_partkey": "l_partkey"})
    plain = li.merge(sub, on="l_partkey", how="left").compute()
    salted = pes.salted_join(li, sub, on="l_partkey", how="left",
                             salt=4).compute()
    assert len(salted) == len(plain)
    assert salted["p_size"].notna().sum() == plain["p_size"].notna().sum()


def test_bucketed_table_join_no_shuffle(spark):
    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # dropped in the finally block)
    import pandas_expr_spark as pes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = pes.read_parquet(f"{SF}/orders.parquet")
        o.to_bucketed_table("orders_b", "o_custkey", num_buckets=8)
        c = pes.read_parquet(f"{SF}/customer.parquet")
        c2 = c.assign(o_custkey=c["c_custkey"])
        c2[["o_custkey", "c_name"]].to_bucketed_table(
            "cust_b", "o_custkey", num_buckets=8)

        j = spark.table("orders_b").join(spark.table("cust_b"), "o_custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("simple")
        p = buf.getvalue()
        # co-located bucketed join: SortMergeJoin with NO exchange
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_packing_window_is_partitioned(spark):
    """Sequence packing must never plan a global window (SinglePartition
    funnels 100 TB through one task)."""
    from pandas_expr_spark.functions import packing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = packing.pack_documents(docs, budget=512, n_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "hashpartitioning(bucket" in plan
    assert "SinglePartition" not in plan


def test_observed_spine_is_broadcast(spark):
    """groupby(observed=False)'s category spine must broadcast — never a
    shuffled join against a 3-row literal table."""
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({
        "k": pd.Categorical(["a", "a", "b"], categories=["a", "b", "c"]),
        "v": [1, 2, 3]})
    g = pes.from_pandas(pdf).groupby("k", observed=False).agg(
        n=("v", "count"))
    plan = g.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan


def test_asof_nearest_single_shuffle(spark):
    """direction='nearest' runs both direction windows over ONE by-key
    exchange (two sorts, no second shuffle of the union)."""
    import pandas as pd
    import pandas_expr_spark as pes
    t = pd.DataFrame({"k": ["a", "b"] * 5, "t": range(10)})
    q = pd.DataFrame({"k": ["a", "b"] * 3, "t": range(6), "v": range(6)})
    out = pes.merge_asof(pes.from_pandas(t), pes.from_pandas(q),
                         on="t", by="k", direction="nearest")
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    # exactly ONE data shuffle keyed on the by column; the r4 left-order
    # rowid anchor adds a tiny per-partition-offsets exchange (summary
    # rows, one per partition — the documented carry-fold class), which
    # must NOT be keyed on the data's by column
    import re
    by_exchanges = len(re.findall(r"Exchange hashpartitioning\(k#", plan))
    assert by_exchanges == 1, f"expected 1 by-key shuffle\n{plan[:1500]}"
