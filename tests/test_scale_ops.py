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
