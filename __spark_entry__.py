"""Driver contract for the spark-graft builder (PySpark target).

Every query below runs through the ``pandas_expr_spark`` engine (the lazy
pandas-like API lowering to PySpark — SURVEY §2 operator inventory) or its
LLM-pipeline function modules, and returns a Spark DataFrame.  ``oracle_sql``
holds the DuckDB-equivalent ANSI SQL for the correctness gate.

Float-determinism policy (distributed vs single-node aggregation order):
* raw column values and *elementwise* double arithmetic are bit-identical
  across engines → emitted as-is;
* money/quantity SUMs use the integer-cents basis ``floor(x*100)`` summed
  as BIGINT — floor is ties-free (unlike any rounding mode) and IEEE double
  multiply is deterministic, so the sums are bit-identical across engines
  regardless of partitioning/summation order; the final ``/100.0`` division
  of an integer ≤ 2^53 is exact;
* AVGs use the same basis divided by the count.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tables(spark, sf_dir):
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    return pes, load_table


# ---------------------------------------------------------------------------
# TPC-H-flavored engine queries (SURVEY §2.2/2.3/2.5/2.6/2.7)
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → groupBy → multi-agg (reference §2.6 machinery)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    # Integer-cents basis: floor(x*100) is ties-free and IEEE-deterministic,
    # so the BIGINT sums (and the final double division) are bit-identical
    # across Spark and DuckDB regardless of partitioning / summation order.
    li = li.assign(
        qty_c=(li.l_quantity * 100).floor(),
        price_c=(li.l_extendedprice * 100).floor(),
        disc_c=(li.l_extendedprice * (1 - li.l_discount) * 100).floor(),
        disc_bp=(li.l_discount * 10000).floor(),
    )
    g = (li[li.l_shipdate <= "1998-09-01"]
         .groupby(["l_returnflag", "l_linestatus"])
         .agg(sum_qty=("qty_c", "sum"),
              sum_base_price=("price_c", "sum"),
              sum_disc_price=("disc_c", "sum"),
              avg_disc=("disc_bp", "sum"),
              count_order=("l_orderkey", "count")))
    g = g.assign(sum_qty=g["sum_qty"] / 100.0,
                 sum_base_price=g["sum_base_price"] / 100.0,
                 sum_disc_price=g["sum_disc_price"] / 100.0,
                 avg_disc=g["avg_disc"] / 10000.0 / g["count_order"])
    return g.to_spark()


def q3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (broadcast dims)."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    c = cust[cust.c_mktsegment == "BUILDING"][["c_custkey"]]
    o = orders[orders.o_orderdate < "1998-01-01"][["o_orderkey", "o_custkey"]]
    l = li[li.l_shipdate > "1996-01-01"]
    l = l.assign(rev=(l.l_extendedprice * (1 - l.l_discount) * 100).floor())
    j = (l[["l_orderkey", "rev"]]
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey", broadcast=True))
    g = j.groupby("l_orderkey").agg(revenue=("rev", "sum"))
    g = g.assign(revenue=g["revenue"] / 100.0)
    out = g.reset_index().sort_values(["revenue", "l_orderkey"], ignore_index=True,
                                      ascending=[False, True]).head(10)
    return out.to_spark()


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join over region→nation→customer→orders→lineitem; dims broadcast."""
    import pandas_expr_spark as pes
    region = pes.read_parquet(f"{sf_dir}/region.parquet")
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    r = region[region.r_name == "ASIA"][["r_regionkey"]]
    n = nation.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                     broadcast=True)[["n_nationkey", "n_name"]]
    c = cust.merge(n, left_on="c_nationkey", right_on="n_nationkey",
                   broadcast=True)[["c_custkey", "n_name"]]
    o = orders[["o_orderkey", "o_custkey"]].merge(
        c, left_on="o_custkey", right_on="c_custkey", broadcast=True)
    l = li.assign(rev=(li.l_extendedprice * (1 - li.l_discount) * 100).floor())
    j = l[["l_orderkey", "rev"]].merge(o[["o_orderkey", "n_name"]],
                                       left_on="l_orderkey", right_on="o_orderkey",
                                       hint="shuffle_hash")
    g = j.groupby("n_name").agg(revenue=("rev", "sum"),
                                n_items=("rev", "count"))
    g = g.assign(revenue=g["revenue"] / 100.0)
    return g.to_spark()


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join): orders in a year window with
    any high-quantity lineitem, counted by priority.  (The synthetic schema
    has no commit/receipt dates, so the EXISTS predicate is quantity-based.)"""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = orders[(orders.o_orderdate >= "1997-01-01")
               & (orders.o_orderdate < "1998-01-01")]
    flagged = (li[li.l_quantity >= 45][["l_orderkey"]]
               .rename(columns={"l_orderkey": "o_orderkey"}))
    j = o.merge(flagged, on="o_orderkey", how="semi")
    g = j.groupby("o_orderpriority").agg(order_count=("o_orderkey", "count"))
    return g.to_spark()


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: tight scan-side conjunctive predicate → single-row total.
    All three predicates reach the parquet scan (PushedFilters); the cents
    sum keeps the scalar bit-identical across engines."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    f = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")
           & li.l_discount.between(0.05, 0.07) & (li.l_quantity < 24)]
    f = f.assign(rev_c=(f.l_extendedprice * f.l_discount * 100).floor())
    return f[["rev_c"]].to_spark().agg(
        (F.sum("rev_c") / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer over one quarter,
    top 20 — fact-fact join shuffles once on orderkey, dims broadcast."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    l = li[li.l_returnflag == "R"]
    l = l.assign(rev_c=(l.l_extendedprice * (1 - l.l_discount) * 100).floor())
    o = orders[(orders.o_orderdate >= "1997-01-01")
               & (orders.o_orderdate < "1997-04-01")][["o_orderkey", "o_custkey"]]
    j = l[["l_orderkey", "rev_c"]].merge(
        o, left_on="l_orderkey", right_on="o_orderkey")
    g = j.groupby("o_custkey").agg(revenue_c=("rev_c", "sum"))
    g = g.reset_index()
    g = g.merge(cust[["c_custkey", "c_name", "c_acctbal", "c_nationkey"]],
                left_on="o_custkey", right_on="c_custkey", broadcast=True)
    g = g.merge(nation[["n_nationkey", "n_name"]],
                left_on="c_nationkey", right_on="n_nationkey", broadcast=True)
    g = g.assign(revenue=g["revenue_c"] / 100.0)
    out = (g[["c_custkey", "c_name", "c_acctbal", "n_name", "revenue"]]
           .sort_values(["revenue", "c_custkey"], ascending=[False, True], ignore_index=True)
           .head(20))
    return out.to_spark()


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation (promo share of revenue) —
    Series.where → CASE WHEN inside one partial+final agg, part broadcast."""
    import pandas_expr_spark as pes
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    l = li[(li.l_shipdate >= "1996-03-01") & (li.l_shipdate < "1996-04-01")]
    l = l.assign(rev_c=(l.l_extendedprice * (1 - l.l_discount) * 100).floor())
    j = l[["l_partkey", "rev_c"]].merge(
        part[["p_partkey", "p_type"]],
        left_on="l_partkey", right_on="p_partkey", broadcast=True)
    j = j.assign(promo_c=j["rev_c"].where(j.p_type == "PROMO", 0))
    return j[["promo_c", "rev_c"]].to_spark().agg(
        (100.0 * F.sum("promo_c") / F.sum("rev_c")).alias("promo_pct"),
        (F.sum("rev_c") / 100.0).alias("total_revenue"))


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: groupBy-HAVING over the fact table, then join the ~0.1%
    survivors back to orders/customer (both effectively broadcast-sized)."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    lg = (li.assign(qty_c=(li.l_quantity * 100).floor())
          .groupby("l_orderkey").agg(qty_c=("qty_c", "sum")))
    big = lg[lg["qty_c"] > 30000].reset_index()
    j = big.merge(orders[["o_orderkey", "o_custkey", "o_orderdate",
                          "o_totalprice"]],
                  left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(cust[["c_custkey", "c_name"]],
                left_on="o_custkey", right_on="c_custkey", broadcast=True)
    j = j.assign(total_qty=j["qty_c"] / 100.0,
                 o_orderdate=j["o_orderdate"].dt.strftime("%Y-%m-%d"))
    out = (j[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
              "o_totalprice", "total_qty"]]
           .sort_values(["total_qty", "o_orderkey"], ascending=[False, True], ignore_index=True)
           .head(100))
    return out.to_spark()


def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate over a broadcast part join — the
    brand/size/quantity disjunction stays a single JVM-side filter."""
    import pandas_expr_spark as pes
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    j = li[["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]].merge(
        part[["p_partkey", "p_brand", "p_size"]],
        left_on="l_partkey", right_on="p_partkey", broadcast=True)
    cond = (((j.p_brand == "Brand#12") & j.p_size.between(1, 15)
             & j.l_quantity.between(1, 11))
            | ((j.p_brand == "Brand#23") & j.p_size.between(1, 25)
               & j.l_quantity.between(10, 20))
            | ((j.p_brand == "Brand#34") & j.p_size.between(1, 35)
               & j.l_quantity.between(20, 30)))
    f = j[cond]
    f = f.assign(rev_c=(f.l_extendedprice * (1 - f.l_discount) * 100).floor())
    return f[["rev_c"]].to_spark().agg(
        (F.sum("rev_c") / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by ship year.
    Both nation lineages broadcast; the only shuffle is the
    lineitem⋈orders fact-fact join on orderkey."""
    import pandas_expr_spark as pes
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    n1 = nation[["n_nationkey", "n_name"]].rename(columns={"n_name": "supp_nation"})
    n2 = nation[["n_nationkey", "n_name"]].rename(columns={"n_name": "cust_nation"})
    s = supp[["s_suppkey", "s_nationkey"]].merge(
        n1, left_on="s_nationkey", right_on="n_nationkey", broadcast=True)
    c = cust[["c_custkey", "c_nationkey"]].merge(
        n2, left_on="c_nationkey", right_on="n_nationkey", broadcast=True)
    o = orders[["o_orderkey", "o_custkey"]].merge(
        c[["c_custkey", "cust_nation"]],
        left_on="o_custkey", right_on="c_custkey", broadcast=True)
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1998-01-01")]
    l = l.assign(rev_c=(l.l_extendedprice * (1 - l.l_discount) * 100).floor(),
                 l_year=l.l_shipdate.dt.year)
    j = l[["l_orderkey", "l_suppkey", "l_year", "rev_c"]].merge(
        s[["s_suppkey", "supp_nation"]],
        left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    j = j.merge(o[["o_orderkey", "cust_nation"]],
                left_on="l_orderkey", right_on="o_orderkey")
    j = j[((j.supp_nation == "NATION_1") & (j.cust_nation == "NATION_2"))
          | ((j.supp_nation == "NATION_2") & (j.cust_nation == "NATION_1"))]
    g = j.groupby(["supp_nation", "cust_nation", "l_year"]).agg(
        revenue_c=("rev_c", "sum")).reset_index()
    g = g.assign(revenue=g["revenue_c"] / 100.0)
    return g[["supp_nation", "cust_nation", "l_year", "revenue"]].to_spark()


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's revenue share of a region's market for one
    part type, by order year — conditional-sum ratio of exact cent sums."""
    import pandas_expr_spark as pes
    region = pes.read_parquet(f"{sf_dir}/region.parquet")
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    r = region[region.r_name == "ASIA"][["r_regionkey"]]
    n_cust = nation.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                          broadcast=True)[["n_nationkey"]]
    c = cust[["c_custkey", "c_nationkey"]].merge(
        n_cust, left_on="c_nationkey", right_on="n_nationkey", broadcast=True)
    o = orders[(orders.o_orderdate >= "1995-01-01")
               & (orders.o_orderdate < "1997-01-01")]
    o = o.assign(o_year=o.o_orderdate.dt.year)
    o = o[["o_orderkey", "o_custkey", "o_year"]].merge(
        c[["c_custkey"]], left_on="o_custkey", right_on="c_custkey",
        broadcast=True)
    p = part[part.p_type == "PROMO"][["p_partkey"]]
    s = supp[["s_suppkey", "s_nationkey"]].merge(
        nation[["n_nationkey", "n_name"]],
        left_on="s_nationkey", right_on="n_nationkey", broadcast=True)
    l = li.assign(rev_c=(li.l_extendedprice * (1 - li.l_discount) * 100).floor())
    j = l[["l_orderkey", "l_partkey", "l_suppkey", "rev_c"]].merge(
        p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    j = j.merge(s[["s_suppkey", "n_name"]],
                left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    j = j.merge(o[["o_orderkey", "o_year"]],
                left_on="l_orderkey", right_on="o_orderkey")
    j = j.assign(nation_c=j["rev_c"].where(j.n_name == "NATION_1", 0))
    g = j.groupby("o_year").agg(nation_c=("nation_c", "sum"),
                                total_c=("rev_c", "sum")).reset_index()
    g = g.assign(mkt_share=g["nation_c"] / g["total_c"],
                 total_revenue=g["total_c"] / 100.0)
    return g[["o_year", "mkt_share", "total_revenue"]].to_spark()


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × ship year.  The synthetic
    schema has no partsupp, so supply cost is modeled as
    0.5·p_retailprice·quantity (fixed per-part cost), keeping the
    part⋈lineitem⋈supplier⋈nation join and two-key agg intact."""
    import pandas_expr_spark as pes
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = part[part.p_type == "ECONOMY"][["p_partkey", "p_retailprice"]]
    s = supp[["s_suppkey", "s_nationkey"]].merge(
        nation[["n_nationkey", "n_name"]],
        left_on="s_nationkey", right_on="n_nationkey", broadcast=True)
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    j = j.assign(
        profit_c=((j.l_extendedprice * (1 - j.l_discount)
                   - j.p_retailprice * 0.5 * j.l_quantity) * 100).floor(),
        o_year=j.l_shipdate.dt.year)
    j = j[["l_suppkey", "o_year", "profit_c"]].merge(
        s[["s_suppkey", "n_name"]],
        left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    g = j.groupby(["n_name", "o_year"]).agg(
        profit_c=("profit_c", "sum")).reset_index()
    g = g.assign(sum_profit=g["profit_c"] / 100.0)
    return g[["n_name", "o_year", "sum_profit"]].to_spark()


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line-status (shipmode analogue) count of
    critical- vs non-critical-priority orders shipped in one year —
    conditional counts in a single partial+final agg after the one
    fact-fact shuffle."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    j = l[["l_orderkey", "l_linestatus"]].merge(
        orders[["o_orderkey", "o_orderpriority"]],
        left_on="l_orderkey", right_on="o_orderkey")
    crit = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j = j.assign(high_line=crit.astype("int64"),
                 low_line=(~crit).astype("int64"))
    g = j.groupby("l_linestatus").agg(high_line_count=("high_line", "sum"),
                                      low_line_count=("low_line", "sum"))
    return g.to_spark()


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — left outer join
    (zero-order customers kept) then two stacked aggregations."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = orders[orders.o_orderpriority != "5-LOW"][["o_orderkey", "o_custkey"]]
    j = cust[["c_custkey"]].merge(o, left_on="c_custkey", right_on="o_custkey",
                                  how="left")
    per_cust = j.groupby("c_custkey").agg(
        c_count=("o_orderkey", "count")).reset_index()
    g = per_cust.groupby("c_count").agg(
        custdist=("c_custkey", "count")).reset_index()
    out = g.sort_values(["custdist", "c_count"], ascending=[False, False], ignore_index=True)
    return out[["c_count", "custdist"]].to_spark()


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — the scalar-max
    subquery is a 1-row broadcast cross join against the per-supplier agg;
    exact-cents equality makes the tie test deterministic."""
    import pandas_expr_spark as pes
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")]
    l = l.assign(rev_c=(l.l_extendedprice * (1 - l.l_discount) * 100).floor())
    r = l.groupby("l_suppkey").agg(rev_c=("rev_c", "sum")).reset_index()
    mx = pes.from_spark(r.to_spark().agg(F.max("rev_c").alias("max_c")))
    t = r.merge(mx, how="cross")
    t = t[t["rev_c"] == t["max_c"]]
    t = t.merge(supp[["s_suppkey", "s_name"]],
                left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    t = t.assign(total_revenue=t["rev_c"] / 100.0)
    return t[["s_suppkey", "s_name", "total_revenue"]].to_spark()


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated-min subquery): cheapest EUROPE supplier per
    part.  No partsupp in the synthetic schema, so supply cost is the min
    per-unit price observed in lineitem for the (part, supplier) pair; the
    correlated `= (SELECT MIN(...))` becomes agg + join-back on exact cents."""
    import pandas_expr_spark as pes
    region = pes.read_parquet(f"{sf_dir}/region.parquet")
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    r = region[region.r_name == "EUROPE"][["r_regionkey"]]
    n = nation.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                     broadcast=True)[["n_nationkey", "n_name"]]
    s = supp.merge(n, left_on="s_nationkey", right_on="n_nationkey",
                   broadcast=True)[["s_suppkey", "s_name", "s_acctbal", "n_name"]]
    p = part[(part.p_type == "SMALL") & (part.p_size == 15)][["p_partkey"]]
    l = li.assign(cost_c=(li.l_extendedprice * 100 / li.l_quantity).floor())
    l = l[["l_partkey", "l_suppkey", "cost_c"]].merge(
        p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    l = l.merge(s[["s_suppkey"]], left_on="l_suppkey", right_on="s_suppkey",
                how="semi")
    ps = l.groupby(["l_partkey", "l_suppkey"]).agg(
        cost_c=("cost_c", "min")).reset_index()
    pm = ps.groupby("l_partkey").agg(min_c=("cost_c", "min")).reset_index()
    j = ps.merge(pm, on="l_partkey")
    j = j[j["cost_c"] == j["min_c"]]
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    out = (j[["s_acctbal", "s_name", "n_name", "l_partkey"]]
           .rename(columns={"l_partkey": "p_partkey"})
           .sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"], ignore_index=True,
                        ascending=[False, True, True, True])
           .head(100))
    return out.to_spark()


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value held by one nation's suppliers,
    HAVING value > 0.001 of the total — the scalar-subquery threshold is a
    1-row cross join; the fraction test is integer-exact (×1000 cents)."""
    import pandas_expr_spark as pes
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    n = nation[nation.n_name == "NATION_3"][["n_nationkey"]]
    s = supp.merge(n, left_on="s_nationkey", right_on="n_nationkey",
                   broadcast=True)[["s_suppkey"]]
    l = li.assign(value_c=(li.l_extendedprice * 100).floor())
    l = l[["l_partkey", "l_suppkey", "value_c"]].merge(
        s, left_on="l_suppkey", right_on="s_suppkey", how="semi")
    g = l.groupby("l_partkey").agg(value_c=("value_c", "sum")).reset_index()
    tot = pes.from_spark(g.to_spark().agg(F.sum("value_c").alias("total_c")))
    t = g.merge(tot, how="cross")
    t = t[t["value_c"] * 1000 > t["total_c"]]
    t = t.assign(value=t["value_c"] / 100.0)
    out = t[["l_partkey", "value"]].sort_values(
        ["value", "l_partkey"], ascending=[False, True], ignore_index=True)
    return out.to_spark()


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size),
    excluding one brand/type and complaint suppliers (negative acctbal
    analogue) via a broadcast ANTI join."""
    import pandas_expr_spark as pes
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = part[(part.p_brand != "Brand#1") & (part.p_type != "PROMO")
             & part.p_size.isin([1, 4, 9, 14, 19, 23, 36, 45])]
    bad = supp[supp.s_acctbal < 0][["s_suppkey"]]
    l = li[["l_partkey", "l_suppkey"]].merge(
        p[["p_partkey", "p_brand", "p_type", "p_size"]],
        left_on="l_partkey", right_on="p_partkey", broadcast=True)
    l = l.merge(bad, left_on="l_suppkey", right_on="s_suppkey", how="anti")
    g = l.groupby(["p_brand", "p_type", "p_size"]).agg(
        supplier_cnt=("l_suppkey", "nunique")).reset_index()
    out = g.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"], ignore_index=True,
                        ascending=[False, True, True, True])
    return out.to_spark()


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity orders of one brand — the
    correlated AVG subquery becomes a per-part agg joined back; the
    `qty < 0.2*avg` test is scaled to integers (5·qty_c·cnt < sum_c) so
    boundary rows can't diverge between engines."""
    import pandas_expr_spark as pes
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = part[part.p_brand == "Brand#3"][["p_partkey"]]
    l = li.assign(qty_c=(li.l_quantity * 100).floor(),
                  price_c=(li.l_extendedprice * 100).floor())
    l = l[["l_partkey", "qty_c", "price_c"]].merge(
        p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    stats = l.groupby("l_partkey").agg(cnt=("qty_c", "count"),
                                       qsum_c=("qty_c", "sum")).reset_index()
    j = l.merge(stats, on="l_partkey")
    j = j[j["qty_c"] * 5 * j["cnt"] < j["qsum_c"]]
    return j[["price_c"]].to_spark().agg(
        (F.sum("price_c") / 100.0 / 7.0).alias("avg_yearly"))


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested IN subqueries): one nation's suppliers who
    shipped more than half of some small part's 1996 volume — two stacked
    aggs on exact cents, then a SEMI join into the supplier dim."""
    import pandas_expr_spark as pes
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = part[part.p_type == "SMALL"][["p_partkey"]]
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    l = l.assign(qty_c=(l.l_quantity * 100).floor())
    l = l[["l_partkey", "l_suppkey", "qty_c"]].merge(
        p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    sp = l.groupby(["l_partkey", "l_suppkey"]).agg(
        sq_c=("qty_c", "sum")).reset_index()
    pt = sp.groupby("l_partkey").agg(pq_c=("sq_c", "sum")).reset_index()
    j = sp.merge(pt, on="l_partkey")
    qual = j[j["sq_c"] * 2 > j["pq_c"]][["l_suppkey"]].drop_duplicates(keep="any")
    n = nation[nation.n_name == "NATION_5"][["n_nationkey"]]
    s = supp.merge(n, left_on="s_nationkey", right_on="n_nationkey",
                   broadcast=True)
    s = s.merge(qual, left_on="s_suppkey", right_on="l_suppkey", how="semi")
    return s[["s_suppkey", "s_name"]].sort_values("s_suppkey", ignore_index=True).to_spark()


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS self-joins): suppliers who were
    the *only* late supplier on a finished multi-supplier order.  "Late" is
    quantity-based (no receipt/commit dates in the synthetic schema).  The
    two EXISTS become per-order distinct-supplier counts: n_supp ≥ 2 ∧
    n_late = 1 — one shuffle on orderkey instead of two self-joins."""
    import pandas_expr_spark as pes
    nation = pes.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = orders[orders.o_orderstatus == "F"][["o_orderkey"]]
    l = li[["l_orderkey", "l_suppkey", "l_quantity"]].merge(
        o, left_on="l_orderkey", right_on="o_orderkey", how="semi")
    # ONE pass over the fact: countDistinct ignores nulls, so masking the
    # supplier key to late rows gives n_late in the same agg — and because
    # qualifying orders have n_late == 1, max(late_supp) IS the waiting
    # supplier.  One scan + one shuffle instead of three scans and a
    # qual-pairs self-join.
    l = l.assign(late_supp=l.l_suppkey.where(l.l_quantity >= 48))
    # distinct-per-order via pre-grouping on (order, supplier): partial
    # aggregation collapses the fact map-side, and the second groupby is a
    # plain count — avoids the Expand (row-doubling) plan Spark generates
    # for two countDistincts in one agg
    ps = l.groupby(["l_orderkey", "l_suppkey"]).agg(
        late=("late_supp", "max")).reset_index()
    g = ps.groupby("l_orderkey").agg(n_supp=("l_suppkey", "count"),
                                     n_late=("late", "count"),
                                     late_sup=("late", "max")).reset_index()
    pairs = g[(g["n_supp"] >= 2) & (g["n_late"] == 1)][["l_orderkey", "late_sup"]]
    n = nation[nation.n_name == "NATION_7"][["n_nationkey"]]
    s = supp.merge(n, left_on="s_nationkey", right_on="n_nationkey",
                   broadcast=True)[["s_suppkey", "s_name"]]
    j = pairs.merge(s, left_on="late_sup", right_on="s_suppkey",
                    broadcast=True)
    g2 = j.groupby("s_name").agg(numwait=("l_orderkey", "nunique")).reset_index()
    out = (g2.sort_values(["numwait", "s_name"], ascending=[False, True], ignore_index=True)
           .head(100))
    return out[["s_name", "numwait"]].to_spark()


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers from a key set of nations (phone-prefix
    analogue) with above-average positive balances and no *recent* orders
    (every synthetic customer has some order) — scalar AVG via 1-row cross
    join (integer-exact bal·cnt > sum test) + ANTI join against orders."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    keys = [1, 13, 17, 20, 24]
    c = cust[cust.c_nationkey.isin(keys)]
    c = c.assign(bal_c=(c.c_acctbal * 100).floor())
    pos = c[c.c_acctbal > 0.0]
    stats = pes.from_spark(pos[["bal_c"]].to_spark().agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("cnt")))
    t = c.merge(stats, how="cross")
    t = t[t["bal_c"] * t["cnt"] > t["sum_c"]]
    recent = orders[orders.o_orderdate >= "1999-01-01"][["o_custkey"]]
    t = t.merge(recent, left_on="c_custkey", right_on="o_custkey", how="anti")
    g = t.groupby("c_nationkey").agg(numcust=("c_custkey", "count"),
                                     tot_c=("bal_c", "sum")).reset_index()
    g = g.assign(totacctbal=g["tot_c"] / 100.0)
    return g[["c_nationkey", "numcust", "totacctbal"]].to_spark()


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Milestone-0 slice (SURVEY §7.2): predicate+projection pushdown."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    return li[li.l_quantity > 45][["l_orderkey", "l_linenumber",
                                   "l_quantity", "l_extendedprice"]].to_spark()


def assign_eval_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign/eval computed columns (reference Assign/Eval §2.2) —
    elementwise double math is bit-identical across engines."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    f = li[li.l_quantity < 5]
    out = f.assign(
        disc_price=f.l_extendedprice * (1 - f.l_discount),
        charged=f.l_extendedprice * (1 - f.l_discount) * (1 + f.l_tax))
    return out[["l_orderkey", "l_linenumber", "disc_price", "charged"]].to_spark()


def join_part_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    part = pes.read_parquet(f"{sf_dir}/part.parquet")
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = part[part.p_size > 40][["p_partkey", "p_brand", "p_retailprice"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    return j[["l_orderkey", "l_linenumber", "p_brand", "p_retailprice",
              "l_quantity"]].to_spark()


def outer_join_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-side nulls from a left join + fillna (reference Fillna §2.2)."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    big = orders[orders.o_totalprice > 450000][["o_custkey", "o_orderkey",
                                                "o_totalprice"]]
    g = big.groupby("o_custkey").agg(n_big=("o_orderkey", "count"))
    j = cust[["c_custkey", "c_name"]].merge(
        g.reset_index(), left_on="c_custkey", right_on="o_custkey", how="left")
    j = j.assign(n_big=j["n_big"].fillna(0).astype("int64"))
    return j[["c_custkey", "c_name", "n_big"]].to_spark()


def value_counts_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    return orders.o_orderpriority.value_counts().to_frame("count").to_spark()


def unnamed_vc_reset_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 name-scrub gate (VERDICT r7 #1): an UNNAMED series'
    value_counts must carry index name None — reset_index then names
    the level column "index" (pandas), never the internal ``__v__``
    placeholder.  The oracle asserts the exact output column names, so
    a placeholder leak is a schema mismatch, not a silent pass."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    vc = orders["o_orderpriority"].rename(None).value_counts()
    out = vc.reset_index()          # pandas columns: ["index", "count"]
    return out.to_spark().orderBy("index")


def stamped_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 stamp×rowid gate (VERDICT r7 #2): a stamped, physically
    scrambled frame (drop_duplicates → reset_index(drop=True) hash-
    shuffles survivors; the stamp carries survivor order) feeding the
    positional consumers fixed this round — rank() and a positional
    list assign.  Any stamp-ignoring physical rowid misalignment pairs
    ranks/positions with the wrong rows → value hash mismatch."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    d = (orders[["o_custkey", "o_totalprice", "o_orderkey"]]
         .drop_duplicates(subset=["o_custkey"])
         .reset_index(drop=True))
    r = d.assign(price_rank=d[["o_totalprice"]].rank()["o_totalprice"])
    out = r.reset_index()           # index = survivor positions
    return (out.to_spark()
            .select(F.col("index").cast("long").alias("pos"),
                    "o_orderkey", "o_totalprice", "price_rank")
            .orderBy("pos"))


def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    return li[["l_returnflag", "l_linestatus"]].drop_duplicates(keep="any").to_spark()


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    out = orders.sort_values(["o_totalprice", "o_orderkey"], ignore_index=True,
                             ascending=[False, True]).head(10)
    return out[["o_orderkey", "o_custkey", "o_totalprice"]].to_spark()


def sort_limit_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    out = cust.sort_values(["c_acctbal", "c_custkey"], ignore_index=True,
                           ascending=[False, True]).head(20)
    return out[["c_custkey", "c_name", "c_acctbal"]].to_spark()


def concat_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat axis=0 (reference Concat §2.4) → shuffle-free union."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    a = orders[orders.o_orderstatus == "F"][["o_orderkey", "o_orderstatus"]]
    b = orders[orders.o_orderstatus == "O"][["o_orderkey", "o_orderstatus"]]
    return pes.concat([a, b]).to_spark()


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    urgent = orders[orders.o_orderpriority == "1-URGENT"][["o_custkey"]]
    out = cust.merge(urgent.rename(columns={"o_custkey": "c_custkey"}),
                     on="c_custkey", how="semi")
    return out[["c_custkey", "c_name"]].to_spark()


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    out = cust.merge(orders[["o_custkey"]].rename(columns={"o_custkey": "c_custkey"}),
                     on="c_custkey", how="anti")
    return out[["c_custkey", "c_name"]].to_spark()


def groupby_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = orders.assign(price_dec=orders.o_totalprice.astype("decimal(18,2)"))
    g = o.groupby("o_orderpriority").agg(
        n=("o_orderkey", "count"), total=("price_dec", "sum"),
        last_date=("o_orderdate", "max"))
    g = g.assign(total=g["total"].astype("float64"),
                 last_date=g["last_date"].dt.strftime("%Y-%m-%d"))
    return g.to_spark()


def groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    g = cust.groupby("c_nationkey").agg(n_cust=("c_custkey", "count"))
    out = g[g["n_cust"] > 5]
    return out.to_spark()


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window family (SURVEY §2.7 — absent in reference, Spark-native here):
    top-2 orders per customer by row_number."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    w = orders.with_row_number("rn", partition_by="o_custkey",
                               order_by=["o_totalprice", "o_orderkey"],
                               ascending=[False, True])
    out = w[w["rn"] <= 2][["o_custkey", "o_orderkey", "o_totalprice", "rn"]]
    return out.to_spark()


def groupby_transform_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aligned transform (window aggregate): value share within group."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.assign(qty_dec=li.l_quantity.astype("decimal(18,2)"))
    t = (li[["l_returnflag", "l_orderkey", "l_linenumber", "qty_dec"]]
         .set_index(["l_orderkey", "l_linenumber"])
         .groupby("l_returnflag")[["qty_dec"]].transform("sum")
         .reset_index())
    t = t.rename(columns={"qty_dec": "flag_total"})
    out = t.assign(flag_total=t["flag_total"].astype("float64"))
    return out[["l_orderkey", "l_linenumber", "flag_total"]].to_spark()


def reductions_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-frame reductions (reference §2.5) in one row."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    sdf = li.to_spark()
    return sdf.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.round(F.avg("l_tax"), 4).alias("avg_tax"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.round(F.stddev_samp("l_discount"), 4).alias("std_disc"),
    )


def isin_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    mask = li.l_quantity.between(5, 10) & li.l_returnflag.isin(["A", "R"])
    return li[mask][["l_orderkey", "l_linenumber"]].to_spark()


def astype_cast_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    q = li.assign(qty_int=li.l_quantity.astype("int64"))
    g = q.groupby("qty_int").agg(n=("l_orderkey", "count"))
    return g.to_spark()


def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask/where → CASE WHEN buckets."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    p = orders.o_totalprice
    bucket = (p < 100000).map({True: "low", False: "high"})
    out = orders.assign(bucket=bucket)
    g = out.groupby("bucket").agg(n=("o_orderkey", "count"))
    return g.to_spark()


def str_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str accessor (SURVEY §2.8) — upper/length/regexp_extract."""
    import pandas_expr_spark as pes
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    out = cust.assign(
        name_upper=cust.c_name.str.upper(),
        name_len=cust.c_name.str.len(),
        cust_num=cust.c_name.str.extract(r"([0-9]+)$", 1))
    return out[["c_custkey", "name_upper", "name_len", "cust_num"]].to_spark()


def dt_ops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dt accessor: orders per (year, month)."""
    import pandas_expr_spark as pes
    orders = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = orders.assign(yr=orders.o_orderdate.dt.year,
                      mo=orders.o_orderdate.dt.month)
    g = o.groupby(["yr", "mo"]).agg(n=("o_orderkey", "count"))
    return g.to_spark()


# ---------------------------------------------------------------------------
# events (JSON props, windowed aggs, sessions)
# ---------------------------------------------------------------------------
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandas_expr_spark.sources.tables import load_table
    from pandas_expr_spark.streaming import tumbling_window_agg
    ev = load_table(spark, sf_dir, "events")
    agg = tumbling_window_agg(
        ev, "ts", "1 hour",
        {"n": ("event_id", "count")}, keys=["event_type"])
    return (agg.select(F.date_format("window_start", "yyyy-MM-dd HH").alias("hour"),
                       "event_type", "n"))


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (30-min gap) → sessions-per-user counts.
    Oracle uses the lag/cumsum gaps-and-islands formulation — semantics
    must agree exactly with F.session_window."""
    from pandas_expr_spark.sources.tables import load_table
    from pandas_expr_spark.streaming import session_window_agg
    ev = load_table(spark, sf_dir, "events")
    s = session_window_agg(ev, "ts", "30 minutes",
                           {"n_events": ("event_id", "count")},
                           keys=["user_id"])
    return (s.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("n_events")))


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface (SURVEY §2.8 array/map/json gap — Spark-native)."""
    from pandas_expr_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    # from_json with an explicit schema parses the document once into a
    # struct (schema-aware Jackson parse); get_json_object would re-parse
    # the JSON per extracted path — the wrong shape once props grows past
    # one field at 100 TB.
    k = F.from_json("props", "k INT")["k"]
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("k"), 4).alias("avg_k"),
                 F.max("k").alias("max_k")))


# ---------------------------------------------------------------------------
# LLM-pipeline operators over documents / embeddings
# ---------------------------------------------------------------------------
def _augmented_docs(spark, sf_dir):
    """documents ∪ copies of the first 50 docs (ids +100000) — a corpus with
    known exact duplicates, constructible identically in SQL."""
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    dups = (docs.filter(F.col("doc_id") < 50)
            .withColumn("doc_id", F.col("doc_id") + 100000))
    return docs.unionByName(dups)


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandas_expr_spark.functions import text
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    return (docs.withColumn("n_tok", text.token_count("text"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("n_tok").alias("min_tokens"),
                 F.max("n_tok").alias("max_tokens")))


def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandas_expr_spark.functions import dedup
    aug = _augmented_docs(spark, sf_dir)
    return dedup.exact_dup_groups(aug).select("fp", "n_dups", "keep_id")


def doc_exact_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandas_expr_spark.functions import dedup
    aug = _augmented_docs(spark, sf_dir)
    kept = dedup.exact_dedup(aug)
    return kept.agg(F.count(F.lit(1)).alias("n_kept"),
                    F.min("doc_id").alias("min_id"),
                    F.max("doc_id").alias("max_id"))


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandas_expr_spark.functions import text
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    return (docs.withColumn("pr", text.punct_ratio("text"))
            .withColumn("sr", text.stopword_ratio("text"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("pr"), 4).alias("avg_punct_ratio"),
                 F.round(F.avg("sr"), 4).alias("avg_stopword_ratio")))


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandas_expr_spark.functions import text
    from pandas_expr_spark.sources.tables import load_table
    # widen first: the local documents parquet is ONE indivisible row
    # group and the marker cascade dominates — same pattern as
    # clean_corpus_pipeline / training_mix_pipeline
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    return (docs.withColumn("pred_lang", text.lang_id("text"))
            .groupBy("pred_lang")
            .agg(F.count(F.lit(1)).alias("n")))


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (double-precision sequential fold — identical
    result in DuckDB's list_dot_product on DOUBLE[])."""
    from pandas_expr_spark.functions import similarity
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(v) for v in
         emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    emb_d = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    out = similarity.cosine_topk(emb_d, q, k=10, round_to=4)
    return out


def embedding_ann_exactprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF lossless-configuration gate: with ``nprobe = n_cells`` every
    cell is probed, so the IVF plumbing (sampled centroids → JVM argmin
    cell assignment → cell filter → top-k) must return EXACTLY the
    brute-force cosine top-k — a closed-form SQL oracle.  Proves the
    partition-pruning path loses nothing except by cell SELECTION, which
    is the approximation knob (recall at nprobe<n_cells stays
    pytest-gated in test_knn_join/test_scale_ops)."""
    from pandas_expr_spark.functions import similarity
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(v) for v in
         emb.filter(F.col("vec_id") == 2).select("embedding").collect()[0][0]]
    emb_d = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    out = similarity.ivf_topk(emb_d, q, k=10, n_cells=16, nprobe=16)
    return out.withColumn("cosine", F.round("cosine", 4))


def logit_first_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-oracle anchor for distributed logistic-regression training
    (``curation.fit_logit``): ONE gradient-descent step from w=0 is
    closed-form — p₀ = σ(0) = 0.5 everywhere, so
    w₁ᵢ = −lr·avg((0.5−y)·fᵢ) and b₁ = −lr·avg(0.5−y), pure SQL over the
    same JVM text features as the full ``trained_quality_scorer``
    (rows-only, 10 iters).  A green row proves the feature pipeline, the
    gradient aggregation, and the step arithmetic end-to-end."""
    from pandas_expr_spark.functions import curation, text
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    feats = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("label"),
        text.stopword_ratio("text").alias("f_stop"),
        (text.lang_score("text", "en")
         / (text.token_count("text") + F.lit(1))).alias("f_en"),
        (F.log1p(F.length("text")) - F.lit(6.0)).alias("f_loglen"))
    w = curation.fit_logit(feats, "label",
                           ["f_stop", "f_en", "f_loglen"],
                           lr=2.0, iters=1)
    rows = [("bias", round(w["bias"], 6)),
            ("f_stop", round(w["f_stop"], 6)),
            ("f_en", round(w["f_en"], 6)),
            ("f_loglen", round(w["f_loglen"], 6))]
    return spark.createDataFrame(rows, "term string, weight double")


def knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN join (``functions/similarity.py`` ``knn_join``): every
    query embedding (vec_id < 20) gets its 5 nearest corpus neighbors by
    cosine — the RAG-retrieval / hard-negative-mining shape.  Exact path
    gated here (broadcast query table, corpus streamed once, per-query
    top-k window partitioned by query — never a global sort); the IVF
    cell-probe path is recall-tested in pytest.  Double-precision
    sequential fold == DuckDB list_dot_product, so the oracle is exact."""
    from pandas_expr_spark.functions import similarity
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    q = emb.filter(F.col("vec_id") < 20)
    return similarity.knn_join(q, emb, k=5, round_to=4)


def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall gate with an EXACT oracle: exact text copies have
    IDENTICAL signatures, so every band collides and each planted pair
    (id, id+100000) for doc_id < 50 is a GUARANTEED candidate.  Restricted
    to the planted id range the result is closed-form SQL — a missed pair
    = a missing row = driver hash mismatch.  (Was rows-only through r3;
    the organic full-candidate variant stays covered by the exact
    ``minhash_verified_dups`` end-to-end gate.)"""
    from pandas_expr_spark.functions import dedup
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(aug, num_perm=32, bands=16)
    return (pairs.filter((F.col("id_b") >= 100000)
                         & (F.col("id_a") == F.col("id_b") - 100000))
            .select("id_a", "id_b"))


def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-Jaccard verified pairs on the augmented corpus: the 50 exact
    dup pairs must appear with jaccard == 1.0."""
    from pandas_expr_spark.functions import dedup
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(aug, threshold=0.9)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def minhash_verified_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH exact-gated end-to-end: candidates from banded
    signatures (64 perms × 16 bands — miss probability < 1e-7 for
    Jaccard ≥ 0.9 pairs) are verified with EXACT trigram Jaccard ≥ 0.85,
    and the result must equal the oracle's exhaustive inverted-index
    Jaccard join.  Planted truth: exact copies (J = 1) of doc_id < 20 and
    two-token-appended near copies (J ≈ 0.9+) of long docs 20-39.  A
    single missed pair = missing row = driver hash mismatch, so this is a
    hard recall gate for the MinHash path at its production shape."""
    from pandas_expr_spark.functions import dedup, text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    exact = (docs.filter(F.col("doc_id") < 20)
             .withColumn("doc_id", F.col("doc_id") + 100000))
    near = (docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)
                        & (F.col("n_chars") >= 300))
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"),
                                         F.lit(" zzqxa zzqxb"))))
    aug = (docs.unionByName(exact).unionByName(near)
           .select("doc_id", "text")
           .repartition(spark.sparkContext.defaultParallelism, "doc_id")
           .persist())
    dedup._PERSISTED.append(aug)  # release_caches() discipline (r9)
    cand = dedup._persist(dedup.minhash_lsh_pairs(aug, num_perm=64, bands=16))
    # optimization r8 (guide §2.3 — shuffle fewer bytes): shingle ONLY
    # the candidate docs.  The exact-Jaccard verify inner-joins on
    # id_a/id_b anyway, so a left-semi prune of the corpus first is a
    # result identity — but it cuts the shingle projection and its join
    # input from corpus-sized to candidate-sized (the dedup_against
    # pattern); at 100 TB the shingle arrays of non-candidate docs never
    # exist, let alone shuffle.
    ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id"))
    sh = (aug.join(dedup._maybe_broadcast(ids), "doc_id", "left_semi")
          .select(F.col("doc_id"),
                  tx.word_shingles("text", 3).alias("__sh__")))
    a = sh.select(F.col("doc_id").alias("id_a"),
                  F.col("__sh__").alias("__sa__"))
    b = sh.select(F.col("doc_id").alias("id_b"),
                  F.col("__sh__").alias("__sb__"))
    jac = (F.size(F.array_intersect("__sa__", "__sb__")).cast("double")
           / F.size(F.array_union("__sa__", "__sb__")))
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= 0.85)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")))


def fuzzy_dup_pairs_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy dedup, exact-gated end-to-end: MinHash-LSH
    candidates (64 perms × 16 bands — miss probability < 1e-7 for the
    planted J ≥ 0.9 pairs, and the seeded signatures make recall
    deterministic per dataset) verified JVM-side with
    ``levenshtein(a, b, threshold)`` (banded DP, early exit at the
    threshold).  Planted truth: exact copies (dist 0) of doc_id < 20 and
    ``' zzqxa'`` appendees (dist exactly 6) of long docs 20-39.
    Restricted to the planted id structure the oracle is closed-form
    DuckDB ``levenshtein`` SQL — a missed pair = missing row = driver
    hash mismatch, so this is a hard recall gate for the fuzzy-dedup
    path at its production shape."""
    from pandas_expr_spark.functions import dedup
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    exact = (docs.filter(F.col("doc_id") < 20)
             .withColumn("doc_id", F.col("doc_id") + 100000))
    near = (docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)
                        & (F.col("n_chars") >= 300))
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" zzqxa"))))
    aug = (docs.unionByName(exact).unionByName(near)
           .select("doc_id", "text")
           .repartition(spark.sparkContext.defaultParallelism, "doc_id"))
    pairs = dedup.edit_distance_pairs(aug, max_dist=8, num_perm=64, bands=16)
    return (pairs.filter(
        ((F.col("id_b") >= 200000) & (F.col("id_a") == F.col("id_b") - 200000))
        | ((F.col("id_b") >= 100000) & (F.col("id_b") < 200000)
           & (F.col("id_a") == F.col("id_b") - 100000)))
        .select("id_a", "id_b", "edit_dist"))


def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (`dedup.dedup_against`): a new BATCH — exact
    copies of doc_id < 20, near copies (two appended tokens) of long docs
    20-39, and 40 synthetic fresh docs — checked against the full corpus.
    The banded corpus×batch join's verified result must EXACTLY equal the
    oracle's exhaustive trigram-Jaccard ground truth: a missed planted
    copy or a false fresh-doc flag = row mismatch.  Hard recall gate for
    the production (persisted-signature) dedup shape."""
    from pandas_expr_spark.functions import dedup
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text")
    exact = (docs.filter(F.col("doc_id") < 20)
             .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    near = (docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)
                        & (F.col("n_chars") >= 300))
            .select((F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat(F.col("text"),
                             F.lit(" zzqxa zzqxb")).alias("text")))
    fresh = (docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80))
             .select((F.col("doc_id") + 300000).alias("doc_id"),
                     F.concat_ws(" ",
                                 F.concat(F.lit("qqa"), F.col("doc_id")),
                                 F.concat(F.lit("qqb"), F.col("doc_id")),
                                 F.concat(F.lit("qqc"), F.col("doc_id")),
                                 F.concat(F.lit("qqd"), F.col("doc_id")),
                                 F.concat(F.lit("qqe"), F.col("doc_id")))
                     .alias("text")))
    batch = exact.unionByName(near).unionByName(fresh)
    return dedup.dedup_against(corpus, batch, num_perm=64, bands=16,
                               jaccard_threshold=0.85)


def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash at the max_hamming=4 band threshold, gated EXACTLY on the
    planted range: exact copies have identical 64-bit signatures (Hamming
    0 ≤ 4, all four 16-bit chunks collide), so each (id, id+100000) pair
    for doc_id < 50 must surface with hamming = 0.  Exercises the
    hamming-4 parameterization (vs ``simhash_planted_dups`` at 3); was
    rows-only through r3."""
    from pandas_expr_spark.functions import dedup
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.simhash_pairs(aug, max_hamming=4)
    return (pairs.filter((F.col("id_b") >= 100000)
                         & (F.col("id_a") == F.col("id_b") - 100000))
            .select("id_a", "id_b", "hamming"))


def simhash_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash determinism gate: exact text copies have IDENTICAL
    signatures (Hamming 0), and Hamming ≤ 3 pairs are GUARANTEED
    candidates by pigeonhole (4 × 16-bit chunks) — so every planted pair
    MUST surface.  Restricted to the planted id range so the oracle is
    closed-form SQL; organic near-dups keep the rows-only
    ``simhash_near_dups`` check."""
    from pandas_expr_spark.functions import dedup
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.simhash_pairs(aug, max_hamming=3)
    return (pairs.filter((F.col("id_b") >= 100000)
                         & (F.col("id_a") == F.col("id_b") - 100000))
            .select("id_a", "id_b", "hamming"))


def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k, gated as an EXACT inequality oracle
    (r6 verdict ask #7): recall@10 against the brute-force cosine top-10
    is computed in-engine and emitted as ``recall_ok = recall >= 0.7``;
    the oracle is the constant TRUE.  multiprobe=3 measures 0.9 at the
    driver's sf0.01 (margin 0.2); everything is seed-deterministic.  The
    candidate set itself stays approximate — that's the point of the
    probe knob — so the top-k ROWS are not oracled, the quality bound
    is."""
    from pandas_expr_spark.functions import similarity
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(v) for v in
         emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]]
    emb_d = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    ann = similarity.lsh_topk(emb_d, q, k=10, num_planes=6, multiprobe=3)
    exact = similarity.cosine_topk(emb_d, q, k=10)
    hits = ann.select("vec_id").join(exact.select("vec_id"), "vec_id")
    return hits.agg((F.count(F.lit(1)) >= F.lit(7)).alias("recall_ok"))


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALABLE embedding-dedup path, gated EXACTLY: banded
    random-hyperplane LSH (``functions/dedup.py embedding_near_dup_pairs``,
    8 planes × 4 bands — O(n) bucketing, never a crossJoin) must recover
    every near-dup pair the brute-force oracle finds.  The test corpus has
    no high-cosine pairs, so true near-dups are planted deterministically:
    vec_id < 25 get a perturbed copy ``v[i] * (1 + 0.05·sin(i + vec_id))``
    (cosine ≈ 0.9994 to the original, SQL-expressible — no RNG), and the
    0.99 threshold isolates exactly those planted pairs.  A missed pair =
    a missing row = driver hash mismatch, so this IS a recall gate for
    the plan you'd run at 100 TB."""
    from pandas_expr_spark.functions import dedup
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    # deterministic perturbed copies; (i+1) matches DuckDB's 1-based
    # list_transform index so both engines plant identical vectors
    pert = (emb.filter(F.col("vec_id") < 25)
            .select((F.col("vec_id") + 100000).alias("vec_id"),
                    F.expr("transform(embedding, (x, i) -> x * (1.0d + 0.05d "
                           "* sin(cast(i + 1 + vec_id as double))))")
                    .alias("embedding")))
    aug = emb.select("vec_id", "embedding").unionByName(pert)
    pairs = dedup.embedding_near_dup_pairs(aug, cosine_threshold=0.99,
                                           num_planes=8, bands=4, seed=42)
    return pairs.select("id_a", "id_b",
                        F.round(F.col("cosine"), 4).alias("cosine"))


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicate-trigram fraction (``text.repetition_ratio``) —
    the Gopher-style repetition quality filter.  Per-doc rows (no float
    aggregation → no summation-order drift), exact SQL oracle."""
    from pandas_expr_spark.functions import text
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        F.round(text.repetition_ratio("text", n=3), 4).alias("rep3"),
        F.round(text.repetition_ratio("text", n=2), 4).alias("rep2"))


def doc_dup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2021, strided-window form —
    ``functions/dedup.py duplicate_window_stats``): 40-char windows at
    stride 20, flagged when the exact window text occurs in ≥2 distinct
    docs.  Two hash shuffles (window-text document frequencies, per-doc
    agg), no windows functions, no driver collection; exact vs a DuckDB
    generate_series+substr oracle."""
    from pandas_expr_spark.functions import dedup
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    stats = dedup.duplicate_window_stats(docs, window=40, stride=20,
                                         min_docs=2)
    return stats.filter(F.col("n_dup") > 0).select(
        "doc_id", "n_win", "n_dup", "dup_frac")


def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup (CCNet/RefinedWeb boilerplate removal —
    ``functions/text.py line_dedup``): the synthetic corpus has no
    newlines, so lines are materialized deterministically (8-word chunks
    joined by \\n — identical expression in both engines), then every line
    occurring verbatim in ≥2 distinct docs is dropped and the surviving
    text reassembled in order.  Returns only changed docs; the rebuilt
    ``kept_text`` string makes this an exact reassembly gate."""
    from pandas_expr_spark.functions import text
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    chunks = F.expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ', -1))/8.0) "
        "as int)-1), i -> array_join(slice(split(text, ' ', -1), "
        "i*8+1, 8), ' '))")
    chunked = docs.select("doc_id", F.array_join(chunks, "\n").alias("text"))
    out = text.line_dedup(chunked, sep="\n", min_dup_docs=2)
    return (out.filter(F.col("n_kept") < F.col("n_seg"))
            .select("doc_id", "n_seg", "n_kept", "kept_text"))


def clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A C4-style cleaning pipeline as ONE composed plan: stopword-ratio
    floor (gibberish filter) ∧ repetition-ratio ceiling (template/spam
    filter) ∧ length band — all pure JVM column expressions fused into a
    single narrow scan + one aggregation.  The survival stats per source
    are exact-gated against the identical SQL predicates."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    # spread the per-doc text expressions across cores: the local documents
    # file is one indivisible row group, and the n-gram exprs dominate
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    keep = ((tx.stopword_ratio("text") >= 0.05)
            & (tx.repetition_ratio("text", 3) <= 0.2)
            & F.col("n_chars").between(100, 100000))
    return (docs.filter(keep)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("n_chars").cast("long").alias("kept_chars")))


def doc_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster assignment (``functions/components.py``): near-dup PAIRS
    → connected components → every doc mapped to its cluster's canonical
    id, even when duplicates chain (A~B~C, A!~C).  Large-star/small-star —
    O(log n) rounds of groupBy-min + equi-join, no global sort — vs a
    DuckDB recursive-CTE reachability oracle.  Edges here are a
    deterministic SQL-expressible graph (consecutive doc_ids sharing a
    lang → chains of varying length, the shape that breaks naive one-hop
    label propagation)."""
    from pandas_expr_spark.functions import components
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    nxt = docs.select((F.col("doc_id") - F.lit(1)).alias("doc_id"),
                      F.col("doc_id").alias("dst"), F.col("lang").alias("lang2"))
    edges = (docs.join(nxt, ["doc_id"])
             .filter(F.col("lang") == F.col("lang2"))
             .select(F.col("doc_id").alias("src"), "dst"))
    cc = components.dup_clusters(edges, "src", "dst")
    return cc.orderBy("doc_id")


def doc_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup pipeline, exact-gated at every stage in one row
    set: planted-dup corpus → MinHash LSH candidates (64 perms × 16
    bands) → exact trigram-Jaccard verify (≥ 0.85) → connected
    components (large-star/small-star) → drop every non-canonical
    member.  Returns the REMOVED docs with their canonical keeper — one
    missed candidate pair, one wrong component, or one mis-picked
    canonical is a row/hash mismatch against the oracle's exhaustive
    inverted-index join + recursive-CTE reachability.  This is the
    composition a 100 TB corpus dedup actually runs (banded equi-joins
    and O(log n) groupBy-min rounds; never all-pairs, never a global
    sort)."""
    from pandas_expr_spark.functions import components, dedup, text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    exact = (docs.filter(F.col("doc_id") < 20)
             .withColumn("doc_id", F.col("doc_id") + 100000))
    near = (docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)
                        & (F.col("n_chars") >= 300))
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"),
                                         F.lit(" zzqxa zzqxb"))))
    aug = (docs.unionByName(exact).unionByName(near)
           .select("doc_id", "text")
           .repartition(spark.sparkContext.defaultParallelism, "doc_id")
           .persist())
    dedup._PERSISTED.append(aug)  # release_caches() discipline (r9)
    cand = dedup._persist(dedup.minhash_lsh_pairs(aug, num_perm=64, bands=16))
    # optimization r8 (guide §2.3 — shuffle fewer bytes): shingle ONLY
    # the candidate docs.  The exact-Jaccard verify inner-joins on
    # id_a/id_b anyway, so a left-semi prune of the corpus first is a
    # result identity — but it cuts the shingle projection and its join
    # input from corpus-sized to candidate-sized (the dedup_against
    # pattern); at 100 TB the shingle arrays of non-candidate docs never
    # exist, let alone shuffle.
    ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id"))
    sh = (aug.join(dedup._maybe_broadcast(ids), "doc_id", "left_semi")
          .select(F.col("doc_id"),
                  tx.word_shingles("text", 3).alias("__sh__")))
    a = sh.select(F.col("doc_id").alias("id_a"),
                  F.col("__sh__").alias("__sa__"))
    b = sh.select(F.col("doc_id").alias("id_b"),
                  F.col("__sh__").alias("__sb__"))
    jac = (F.size(F.array_intersect("__sa__", "__sb__")).cast("double")
           / F.size(F.array_union("__sa__", "__sb__")))
    verified = (cand.join(a, "id_a").join(b, "id_b")
                .filter(jac >= 0.85)
                .select("id_a", "id_b"))
    cc = components.dup_clusters(verified)
    return (cc.filter(~F.col("is_canonical"))
            .select("doc_id", F.col("cluster_id").alias("kept_doc_id"))
            .orderBy("doc_id"))


def doc_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (``functions/components.py``) — link-centrality corpus
    quality signal, gated EXACTLY against a 3-iteration unrolled SQL
    power iteration.  Deterministic 3-regular graph over the documents
    table (``doc_id → (doc_id·7 + j) mod N``, j ∈ {1,2,3}) so both
    engines walk the identical structure; ranks round to 6 decimals
    (summation-order float noise is ~1e-16, six orders below the
    rounding).  Per iteration: one ranks⋈edges hash join + one
    map-side-combined groupBy(dst) sum + a 1-row dangling broadcast —
    no global sort, no node-sized collect."""
    from pandas_expr_spark.functions import components
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out_edges = [F.struct(((F.col("doc_id") * 7 + F.lit(j)) % F.lit(n))
                          .alias("dst")) for j in (1, 2, 3)]
    edges = (docs.select(F.col("doc_id").alias("src"),
                         F.explode(F.array(*out_edges)).alias("e"))
             .select("src", F.col("e.dst").alias("dst")))
    # every doc_id is a src and dsts are mod-n, so the node set is
    # exactly the n docs — pass the count we already paid for instead of
    # letting pagerank re-derive it with a distinct+count job
    pr = components.pagerank(edges, iters=3, damping=0.85, n_nodes=n)
    return (pr.select(F.col("node").alias("doc_id"),
                      F.round("rank", 6).alias("pr"))
            .orderBy("doc_id"))


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (``functions/clustering.py``): Lloyd's with
    driver-held centroid literals, JVM argmin assignment, and a
    (cluster, dim)-grouped avg shuffle per iteration.  Planted truth: 8
    well-separated axis clusters built by an identical deterministic
    expression in both engines (margin 10 vs 0.1 noise, so libm-ulp sin
    differences cannot flip an assignment); k-means must recover the
    partition EXACTLY, with labels canonicalized to min vec_id per
    cluster."""
    from pandas_expr_spark.functions import clustering
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.select("vec_id", F.expr(
        "transform(sequence(0, 63), j -> CAST(CASE WHEN j = vec_id % 8 "
        "THEN 10.0 ELSE 0.0 END + 0.1 * sin(CAST(vec_id * 64 + j AS DOUBLE)) "
        "AS DOUBLE))").alias("embedding"))
    # LAZY checkpoint (optimization r8): `out` feeds both the canon
    # broadcast and the main join — without it the final nearest-centroid
    # assignment map (8 distance HOFs per row) is evaluated twice (plan
    # showed the duplicated subtree, no ReusedExchange).
    out = clustering.kmeans_assign(planted, k=8, max_iter=5) \
        .localCheckpoint(eager=False)
    canon = out.groupBy("cluster").agg(F.min("vec_id").alias("rep"))
    return (out.join(F.broadcast(canon), "cluster")
            .select("vec_id", F.col("rep").alias("cluster_rep"))
            .orderBy("vec_id"))


def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (``functions/text.py``): deterministic synthetic PII
    (emails/IPs/SSNs/phones keyed off doc_id — identical CASE/concat in the
    oracle) injected into the corpus, then counted per kind and redacted;
    per-source totals + redacted-length delta.  Pure JVM regexp — narrow
    map, no shuffle."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.lit(" host 10.0."),
                        (F.col("doc_id") % 256).cast("string"),
                        F.lit(".1"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0,
               F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0,
               F.lit(" call 555-867-5309")).otherwise(F.lit("")))
    d = docs.withColumn("t", injected)
    return (d.select(
                "source",
                tx.pii_count("t", "email").alias("e"),
                tx.pii_count("t", "ssn").alias("s"),
                tx.pii_count("t", "ipv4").alias("i"),
                tx.pii_count("t", "phone").alias("p"),
                (F.length("t") - F.length(tx.redact_pii("t"))).alias("dl"))
            .groupBy("source")
            .agg(F.sum("e").cast("long").alias("n_email"),
                 F.sum("s").cast("long").alias("n_ssn"),
                 F.sum("i").cast("long").alias("n_ipv4"),
                 F.sum("p").cast("long").alias("n_phone"),
                 F.sum("dl").cast("long").alias("redacted_delta"))
            .orderBy("source"))


def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (``functions/dedup.py decontaminate``):
    eval set = every 97th doc; training docs flagged when any word 3-gram
    also occurs in the eval set.  Eval shingles are broadcast — the corpus
    is scanned once, never shuffled on text; per-doc shared-shingle counts
    vs an exhaustive SQL shingle-join oracle."""
    from pandas_expr_spark.functions import dedup
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    out = dedup.decontaminate(train, ev, n=3)
    return (out.select("doc_id",
                       F.col("n_shared_ngrams").cast("long").alias("n_shared_ngrams"),
                       "contaminated")
            .orderBy("doc_id"))


def pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training shards (``functions/packing.py``):
    md5-bucketed concat-and-chop pack positions, one bucket-shuffle + one
    PARTITIONED window cumsum (never global).  Exact SQL oracle."""
    from pandas_expr_spark.functions import packing
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    return packing.pack_documents(docs, budget=512, n_buckets=16)


def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (SURVEY §2.10, the row the reference leaves empty):
    document → chunk rows via a registered ``pyspark.sql.udtf`` lateral
    join.  Python-per-row is deliberate here — the gate proves the UDTF
    API; the JVM-side ``chunk_expr`` twin (same oracle, tests) is the
    100 TB path.  Restricted to doc_id < 200 to bound the Python cost."""
    from pandas_expr_spark.functions import udtf as u
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return u.chunk_documents(docs, chunk_size=50, use_udtf=True)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-header metadata extraction with an EXACT oracle
    (repointed in r4 from the stub decode path, which the real PNG codec
    superseded): each doc_id defines a PNG of width ``8 + id%8`` / height
    ``6 + id%5`` (same synthesis formula as ``multimodal_pixel_stats``),
    encoded by the stdlib encoder, then ``image_header_meta`` parses
    (format, width, height) back out of the container header bytes via an
    Arrow pandas_udf — the 100 TB "how big is this image" path that never
    inflates pixel data.  The oracle recomputes the dimensions
    arithmetically, so a green row proves the header round trip."""
    from pandas_expr_spark.functions import multimodal
    from pandas_expr_spark.sources.tables import load_table
    import numpy as _np
    import pandas as _pd

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").alias("media_id")) \
        .repartition(spark.sparkContext.defaultParallelism)

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def synth(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                w, h = 8 + mid % 8, 6 + mid % 5
                i = _np.arange(w * h * 3, dtype=_np.int64)
                px = ((mid * 7 + i * 13) % 256).astype(_np.uint8)
                rows.append((mid,
                             multimodal.encode_png(px.reshape(h, w, 3))))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = base.mapInPandas(synth, schema)
    meta = multimodal.image_header_meta(media)
    return (meta.select("media_id",
                        F.col("img_format").alias("img_format"),
                        F.col("img_width").cast("long").alias("img_width"),
                        F.col("img_height").cast("long").alias("img_height"))
            .orderBy("media_id"))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-checkable half of the multimodal path: byte lengths."""
    from pandas_expr_spark.functions import multimodal
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "UTF-8").alias("payload"))
    meta = multimodal.attach_media_meta(media)
    return (meta.groupBy("media_format")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("media_n_bytes").alias("total_bytes")))


def doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Tukey-fence length outlier filtering
    (``functions/curation.py`` ``flag_length_outliers``): EXACT per-group
    quartiles → [q1-1.5·IQR, q3+1.5·IQR] bounds → broadcast-join flag.
    The corpus is never shuffled — only the tiny bounds table moves.
    Exact oracle via DuckDB quantile_cont."""
    from pandas_expr_spark.functions import curation
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    flagged = curation.flag_length_outliers(docs, "n_chars", "source")
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.col("is_len_outlier").cast("long"))
                 .cast("long").alias("n_outliers"),
                 F.round(F.min("lo"), 4).alias("lo"),
                 F.round(F.min("hi"), 4).alias("hi"))
            .orderBy("source"))


def zipf_slope_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health probe (``functions/text.py`` ``zipf_fit``): the
    least-squares slope/R² of ln(freq) vs ln(rank) over the top-100
    tokens.  One tokenize+count shuffle; the rank window runs on ≤100
    pre-aggregated rows (TakeOrderedAndProject), then a single-row
    closed-form regression agg.  Exact oracle replays the same sums."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    fit = tx.zipf_fit(docs, "text", top_n=100)
    return fit.select(F.col("n_tokens_ranked").cast("long").alias("n_tokens_ranked"),
                      F.round("zipf_slope", 4).alias("zipf_slope"),
                      F.round("zipf_r2", 4).alias("zipf_r2"))


def _synth_messy_urls(docs: DataFrame) -> DataFrame:
    """Deterministic messy-URL synthesis per doc_id (JVM concat): mixed
    scheme case, optional WWW., host pool with cc-TLD variety, default +
    non-default ports, trailing slashes, shuffled tracking params, and
    fragments — every normalization rule gets exercised."""
    i = F.col("doc_id")
    scheme = F.when(i % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    suffix = (F.when(i % 4 == 0, F.lit(".example.com"))
              .when(i % 4 == 1, F.lit(".News.co.uk"))
              .when(i % 4 == 2, F.lit(".blog.org"))
              .otherwise(F.lit(".shop.net")))
    port = (F.when(i % 11 == 0, F.lit(":8080"))
            .when(i % 7 == 0, F.lit(":443")).otherwise(F.lit("")))
    trail = F.when(i % 5 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (F.when(i % 2 == 0,
                    F.concat(F.lit("?b="), (i % 10).cast("string"),
                             F.lit("&utm_source=x&a=1")))
             .otherwise(F.lit("?utm_campaign=c&z=9")))
    frag = F.when(i % 4 == 0, F.lit("#frag")).otherwise(F.lit(""))
    url = F.concat(scheme, F.lit("://"), www,
                   F.lit("site"), (i % 97).cast("string"), suffix, port,
                   F.lit("/p/"), (i % 13).cast("string"), trail,
                   query, frag)
    return docs.select("doc_id", "source", "n_chars",
                       url.alias("url"))


def url_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain extraction
    (``functions/urls.py`` ``normalize_url``/``extract_domain``): pure
    JVM parse_url/regex/array ops — a narrow map, no shuffle.  The
    oracle never parses the messy URL: it recomputes the CANONICAL form
    arithmetically from the same doc_id formula, so a green row proves
    scheme/host lowering, www/port/fragment/tracking-param stripping,
    query sorting, and trailing-slash trimming are all exact."""
    from pandas_expr_spark.functions import urls
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    messy = _synth_messy_urls(docs)
    return (messy.select(
                "doc_id",
                urls.normalize_url("url").alias("norm_url"),
                urls.extract_domain("url").alias("domain"))
            .orderBy("doc_id"))


def url_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (``functions/urls.py`` ``url_dedup``): collapse
    rows whose URLs canonicalize identically, keeping the richest
    capture (max n_chars, ties → smallest doc_id) — ONE hash-shuffle
    groupBy with map-side-combining max_by/count, no window.  URLs are
    synthesized so each doc_id mod-50 class collides after
    normalization; the oracle recomputes the canonical key from the
    formula and picks the winner with a SQL window."""
    from pandas_expr_spark.functions import urls
    from pandas_expr_spark.sources.tables import load_table
    i = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("d"), (i % 50).cast("string"), F.lit(".Example.com/x"),
        F.when(i % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.lit("?utm_source=t")).otherwise(F.lit("")))
    messy = docs.select("doc_id", "n_chars", url.alias("url"))
    kept = urls.url_dedup(messy, url_col="url", key_col="doc_id",
                          prefer_col="n_chars")
    return (kept.select("norm_url",
                        F.col("doc_id").alias("kept_doc_id"),
                        F.col("n_chars").alias("kept_n_chars"),
                        F.col("url_dup_count").cast("long")
                        .alias("url_dup_count"))
            .orderBy("norm_url"))


def cap_per_source_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group document cap (``functions/urls.py`` ``cap_per_group``):
    at most 10 docs per source, the 10 smallest by md5(doc_id) —
    deterministic and engine-reproducible.  The naive per-group window
    is replaced by the two-phase md5-PREFIX-bucket histogram plan (whole
    buckets kept via broadcast semi join; only each group's boundary
    bucket gets an exact window).  Oracle: plain row_number over
    (md5, doc_id) per source."""
    from pandas_expr_spark.functions import urls
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    capped = urls.cap_per_group(docs, 10, "source", "doc_id")
    return (capped.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("id_sum"))
            .orderBy("source"))


def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing (``functions/curation.py``
    ``temperature_mix``, XLM-R/UniMax style): keep
    ``min(n_i, round(scale * sqrt(n_i)))`` docs per source by md5 hash
    order.  ONE tiny histogram collect + the md5-prefix two-phase cap —
    a mega-source never sorts in one task.  scale passed explicitly so
    the oracle reproduces the caps with LEAST/ROUNDBANKERS/SQRT (all
    IEEE-exact on both engines)."""
    from pandas_expr_spark.functions import curation
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    kept = curation.temperature_mix(docs, alpha=0.5, scale=3.0,
                                    source_col="source", key_col="doc_id")
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("id_sum"))
            .orderBy("source"))


def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-weighted data selection (Xie et al. 2023,
    ``functions/curation.py`` ``dsir_logweights``): hashed uni+bigram
    features (md5-bucketed, engine-portable), target = the English docs,
    raw = the whole corpus; log w(x) = Σ_b c_b·(ln p_b − ln q_b), top-100
    by (round(w,4) desc, doc_id).  Both corpora reduce to ≤4096-row
    bucket histograms (broadcast LLR table); the corpus text is read once
    and shuffled only as (doc, bucket) pairs; the top-k lowers to
    TakeOrderedAndProject.  Rounding to 4 decimals makes the JVM/DuckDB
    float comparison exact (same idiom as doc_unigram_ppl)."""
    from pandas_expr_spark.functions import curation
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    # target ⊆ raw → one-pass form: the corpus is featurized ONCE and
    # both histograms derive from the same (doc, bucket) table
    w = curation.dsir_logweights(docs, None, buckets=4096,
                                 target_filter=F.col("lang") == "en")
    return (w.withColumn("logw", F.round("logweight", 4))
            .orderBy(F.col("logw").desc(), "doc_id").limit(100)
            .select("doc_id", "logw"))


def groupby_sample_frac_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupby.sample(frac=)`` (``operators/groupby.py`` ``sample``):
    deterministic md5-hash draw of exactly ``round(frac*size)`` rows per
    priority, lowered to the md5-prefix-bucket two-phase cap — no
    per-group mega-task sort.  Row labels are ``o_orderkey`` (set_index),
    so the oracle reproduces the draw with a plain row_number over
    (md5(key), key).  frac=0.25 keeps cnt*frac exact in both double and
    decimal arithmetic, so the banker's-rounded quota matches bit-for-bit."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    s = o.set_index("o_orderkey").groupby("o_orderpriority").sample(frac=0.25)
    return (s.to_spark().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.sum("o_orderkey").cast("long").alias("key_sum"),
                 F.sum(F.floor("o_totalprice")).cast("long")
                 .alias("price_sum"))
            .orderBy("o_orderpriority"))


def bpe_top_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle anchor for BPE training (``functions/bpe.py``): the
    first-iteration adjacent-symbol pair counts over the corpus word
    histogram (chars + '</w>' marker), top 15 by (count desc, pair asc).
    The oracle replays the pair extraction with substr arithmetic —
    character-exact.  One corpus pass + one vocab-sized shuffle."""
    from pandas_expr_spark.functions import bpe
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    words = bpe.with_symbols(bpe.word_histogram(docs, "text"))
    return (bpe.pair_counts(words)
            .select("left", "right",
                    F.col("pair_count").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(15))


def bpe_learn_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich 2016) — 8 merges
    learned over the documents corpus: per iteration one vocab-sized
    pair-count shuffle + a one-row argmax collect + a compiled JVM merge
    fold (``functions/bpe.py`` ``learn_bpe``).  EXACT oracle since r4:
    the merge sequence is deterministic (ties: count desc, pair asc), so
    the DuckDB oracle unrolls all 8 iterations as CTEs — symbol arrays
    kept as sentinel-delimited strings (\\x01 sym \\x02; corpus verified
    control-char-free), the greedy non-overlapping merge applied by
    left-to-right ``replace`` (same scan semantics as the JVM fold), the
    argmax by ORDER BY/LIMIT 1.  Differential battery vs the canonical
    single-machine algorithm stays in ``tests/test_bpe.py``."""
    from pandas_expr_spark.functions import bpe
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    merges, _words = bpe.learn_bpe(docs, "text", n_merges=8)
    return bpe.merges_to_df(spark, merges)


def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BPE tokenization (new r5): learn 8 merges, then ENCODE
    every document with the Arrow-batched rank-order UDF
    (``functions/bpe.py`` ``encode_bpe`` — the practical path for 32k+
    vocabularies; per-batch word memo).  EXACT oracle: the merge replay
    is deterministic, so the DuckDB twin re-learns the same 8 merges
    (``_bpe_learn_oracle_sql`` CTEs) and re-encodes each doc's words with
    the same 8 sentinel ``replace`` steps — token streams compared
    verbatim.  Corpus cost: tokenization is ONE mapInPandas pass; the
    merge table is driver-held (KBs) and closure-broadcast."""
    from pandas_expr_spark.functions import bpe
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    merges, _words = bpe.learn_bpe(docs, "text", n_merges=8)
    enc = bpe.encode_bpe(docs, "text", merges)
    return enc.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", " ").alias("token_text"))


def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode hot path with an EXACT SQL oracle.  Each doc_id
    deterministically defines an image — width ``8 + id%8``, height
    ``6 + id%5``, RGB pixel bytes ``(id*7 + i*13) % 256`` — which one
    mapInPandas stage ENCODES to an actual PNG (zlib DEFLATE + filter-0
    scanlines) and a second mapInPandas stage DECODES back with the
    stdlib decoder (``functions/multimodal.py`` ``decode_png``: chunk
    walk, inflate, unfilter).  The oracle never touches PNG bytes — it
    recomputes the pixel formula arithmetically — so a green row proves
    the encode→decode round trip is pixel-exact.  Integer pixel sums are
    exact in float64, so mean_px matches to the last bit before the 4dp
    round.

    Optimization r8: synth+encode+decode+stats run FUSED in ONE
    mapInPandas stage (same per-row ``encode_png``→``decode_png`` round
    trip through real PNG bytes, same values) — the previous two-stage
    chain serialized every PNG payload across the JVM↔Python Arrow
    boundary twice for no semantic gain (guide §4.1: you control how
    many bytes cross the boundary)."""
    from pandas_expr_spark.functions import multimodal
    from pandas_expr_spark.sources.tables import load_table
    import numpy as _np
    import pandas as _pd

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").alias("media_id")) \
        .repartition(spark.sparkContext.defaultParallelism)

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("min_px", T.IntegerType()),
        T.StructField("max_px", T.IntegerType()),
    ])

    def synth_roundtrip(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                w, h = 8 + mid % 8, 6 + mid % 5
                i = _np.arange(w * h * 3, dtype=_np.int64)
                px = ((mid * 7 + i * 13) % 256).astype(_np.uint8)
                payload = multimodal.encode_png(px.reshape(h, w, 3))
                try:
                    dec = multimodal.decode_png(payload)
                    rows.append((mid, dec.shape[1], dec.shape[0],
                                 dec.shape[2], float(dec.mean()),
                                 int(dec.min()), int(dec.max())))
                except Exception:
                    rows.append((mid, None, None, None, None, None, None))
            yield _pd.DataFrame(rows,
                                columns=[f.name for f in schema.fields])

    stats = base.mapInPandas(synth_roundtrip, schema)
    return (stats.select("media_id",
                         F.col("width").cast("long").alias("width"),
                         F.col("height").cast("long").alias("height"),
                         F.col("channels").cast("long").alias("channels"),
                         F.round("mean_px", 4).alias("mean_px"),
                         F.col("min_px").cast("long").alias("min_px"),
                         F.col("max_px").cast("long").alias("max_px"))
            .orderBy("media_id"))


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode with an EXACT SQL oracle: per doc_id a PCM16 WAV
    whose sample j is ``(((id + 3j) % 256) - 128) / 256`` (an exact
    dyadic rational — quantization is lossless, sums of squares are
    exact in float64), encoded then decoded sample-by-sample by the
    stdlib RIFF parser (``decode_wav_pcm``).  The oracle recomputes RMS
    arithmetically — no audio bytes involved.

    Optimization r8: synth+encode+decode+stats FUSED into ONE mapInPandas
    stage (same ``encode_wav_pcm``→``decode_wav_pcm`` round trip through
    real RIFF bytes, same values) — the two-stage chain shipped every WAV
    payload across the Arrow boundary twice (guide §4.1)."""
    from pandas_expr_spark.functions import multimodal
    from pandas_expr_spark.sources.tables import load_table
    import numpy as _np
    import pandas as _pd

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").alias("media_id")) \
        .repartition(spark.sparkContext.defaultParallelism)

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def synth_roundtrip(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                n = 1000 + mid % 50
                j = _np.arange(n, dtype=_np.int64)
                s = (((mid + 3 * j) % 256) - 128) / 256.0
                payload = multimodal.encode_wav_pcm(s, 8000)
                try:
                    rate, samp = multimodal.decode_wav_pcm(payload)
                    nf = samp.shape[0]
                    rms = (float(_np.sqrt((samp ** 2).mean()))
                           if nf else 0.0)
                    rows.append((mid, rate, nf, nf / rate, rms))
                except Exception:
                    rows.append((mid, None, None, None, None))
            yield _pd.DataFrame(rows,
                                columns=[f.name for f in schema.fields])

    stats = base.mapInPandas(synth_roundtrip, schema)
    return (stats.select("media_id",
                         F.col("sample_rate").cast("long").alias("sample_rate"),
                         F.col("n_frames").alias("n_frames"),
                         F.round("duration_s", 4).alias("duration_s"),
                         F.round("rms", 4).alias("rms"))
            .orderBy("media_id"))


# ---------------------------------------------------------------------------
# batch 2: as-of join, grouping sets, window family, set ops, streaming
# (SURVEY §2.3/2.5/2.7 gaps + §2.9)
# ---------------------------------------------------------------------------
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 stretch operator): for each purchase event,
    the most recent prior 'view' value of the same user.  Lowered as
    union + last-ignorenulls window — one shuffle on user_id, no range
    explosion (scales to 100 TB event logs)."""
    import pandas_expr_spark as pes
    ev = pes.read_parquet(f"{sf_dir}/events.parquet")
    left = ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
    right = ev[ev.event_type == "view"][["user_id", "ts", "value"]] \
        .rename(columns={"value": "view_value"})
    out = pes.merge_asof(left, right, on="ts", by="user_id",
                         direction="backward")
    return out[["event_id", "user_id", "view_value"]].to_spark()


def asof_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof(direction='nearest'): closest view either side of each
    purchase (tie → backward).  Both direction windows share ONE user_id
    shuffle; oracle is an argmin-by-distance row_number query."""
    import pandas_expr_spark as pes
    ev = pes.read_parquet(f"{sf_dir}/events.parquet")
    left = ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
    right = ev[ev.event_type == "view"][["user_id", "ts", "value"]] \
        .rename(columns={"value": "view_value"})
    out = pes.merge_asof(left, right, on="ts", by="user_id",
                         direction="nearest")
    return out[["event_id", "user_id", "view_value"]].to_spark()


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (Spark-native multi-group agg, one shuffle)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.assign(qty_c=(li.l_quantity * 100).floor())
    g = li.rollup(["l_returnflag", "l_linestatus"]).agg(
        n=("l_orderkey", "count"), qty=("qty_c", "sum"))
    g = g.assign(qty=g["qty"] / 100.0)
    return g.to_spark()


def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    g = li.cube(["l_returnflag", "l_linestatus"]).agg(n=("l_orderkey", "count"))
    return g.to_spark()


def head_sorted_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head after explicit sort (reference Head §2.7 — deterministic via
    order; lowers to TakeOrderedAndProject, no global sort)."""
    import pandas_expr_spark as pes
    n = pes.read_parquet(f"{sf_dir}/nation.parquet")
    return n.sort_values("n_name", ignore_index=True).head(5).to_spark()


def idx_extremes_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """idxmin/idxmax (reference §2.5) → min_by/max_by over the index —
    single agg, no sort.  Index = o_orderkey via set_index."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    lo = o["o_totalprice"].idxmin().to_spark().select(
        F.col("idxmin").cast("long").alias("cheapest_order"))
    hi = o["o_totalprice"].idxmax().to_spark().select(
        F.col("idxmax").cast("long").alias("priciest_order"))
    return lo.crossJoin(hi)


def mode_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.mode (reference §2.5) — deterministic all-ties result."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    return li["l_quantity"].mode().to_spark().select(
        F.col("__v__").alias("mode_qty"))


def quantile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles (pandas semantics; approx=True is
    the documented 100 TB path)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    s = li["l_extendedprice"]
    # list form = ONE aggregation pass for all three percentiles
    qs = s.quantile([0.25, 0.5, 0.9]).to_spark()
    return qs.agg(
        F.max(F.when(F.col("q") == 0.5, F.col("quantile"))).alias("p50"),
        F.max(F.when(F.col("q") == 0.25, F.col("quantile"))).alias("p25"),
        F.max(F.when(F.col("q") == 0.9, F.col("quantile"))).alias("p90"))


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.explode (reference §2.2 nested lists) over whitespace tokens;
    frequent-token profile of the corpus head."""
    import pandas_expr_spark as pes
    docs = pes.read_parquet(f"{sf_dir}/documents.parquet")
    sub = docs[docs.doc_id < 200]
    toks = sub.assign(tok=sub["text"].str.strip().str.split(r"\s+"))
    ex = toks.explode("tok")
    vc = ex.groupby("tok").agg(n=("doc_id", "count"))
    return vc[vc.n >= 50].to_spark()


def combine_first_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask + combine_first (reference CombineFirst §2.2): null-out negative
    balances, overlay the original → index-aligned coalesce."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet").set_index("c_custkey")
    masked = c.assign(c_acctbal=c["c_acctbal"].mask(c["c_acctbal"] < 0))
    filled = masked[["c_acctbal"]].combine_first(c[["c_acctbal"]])
    out = filled.reset_index()
    return out.to_spark().select(F.col("c_custkey").cast("long"),
                                 F.col("c_acctbal"))


def replace_dropna_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replace + dropna (reference Replace/Dropna §2.2)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(prio=o["o_orderpriority"].replace("1-URGENT", None))
    kept = o.dropna(subset=["prio"])
    g = kept.groupby("prio").agg(n=("o_orderkey", "count"))
    return g.to_spark()


def intersect_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except distinct set ops (SURVEY §2.4 noted gap)."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    s = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    cn = c[["c_nationkey"]].rename(columns={"c_nationkey": "nk"})
    sn = s[["s_nationkey"]].rename(columns={"s_nationkey": "nk"})
    both = pes.intersect(cn.drop_duplicates(keep="any"), sn.drop_duplicates(keep="any"))
    only_c = pes.except_(cn.drop_duplicates(keep="any"), sn.drop_duplicates(keep="any"))
    a = both.to_spark().select(F.col("nk").cast("long"), F.lit("both").alias("side"))
    b = only_c.to_spark().select(F.col("nk").cast("long"), F.lit("cust_only").alias("side"))
    return a.unionByName(b)


def window_lag_cumsum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running cumsum windows (SURVEY §2.7 family) per customer in
    integer-cents basis (bit-deterministic)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 100]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    o = o.with_lag("prev_c", "price_c", partition_by="o_custkey",
                   order_by=["o_orderdate", "o_orderkey"])
    o = o.with_cumsum("run_c", "price_c", partition_by="o_custkey",
                      order_by=["o_orderdate", "o_orderkey"])
    o = o.assign(prev_price=o["prev_c"] / 100.0, run_total=o["run_c"] / 100.0)
    return o[["o_orderkey", "o_custkey", "prev_price", "run_total"]].to_spark()


def interval_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized point-in-interval join (scale path for range predicates —
    replaces BroadcastNestedLoopJoin with one equi-join shuffle): high-qty
    shipments matched to every order whose [orderdate, +3 days] window
    covers the ship date, aggregated per ship date."""
    import datetime
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    pts = li[li.l_quantity >= 49][["l_orderkey", "l_shipdate"]]
    iv = o[["o_orderkey", "o_orderdate"]]
    iv = iv.assign(o_end=iv.o_orderdate + datetime.timedelta(days=3))
    j = pes.interval_join(pts, iv, point="l_shipdate", start="o_orderdate",
                          end="o_end", bucket_width=86400.0)
    g = j.groupby("l_shipdate").agg(n=("o_orderkey", "count"),
                                    sum_ok=("o_orderkey", "sum"))
    return g.to_spark()


def window_diff_pct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diff/pct_change window sugar (pandas parity; raw double arithmetic is
    elementwise → bit-identical across engines)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 100]
    o = o.with_diff("price_diff", "o_totalprice", partition_by="o_custkey",
                    order_by=["o_orderdate", "o_orderkey"])
    o = o.with_pct_change("price_pct", "o_totalprice", partition_by="o_custkey",
                          order_by=["o_orderdate", "o_orderkey"])
    return o[["o_orderkey", "o_custkey", "price_diff", "price_pct"]].to_spark()


def rolling_expanding_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas rolling/expanding windows (§2.7 superset) with min_periods
    null-guard semantics.  Sums run on the integer-cents basis so the frame
    aggregation is order-independent and bit-identical across engines; the
    rolling mean divides the exact cents sum by the windowed count."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 100]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    o = o.with_rolling("roll_sum_c", "price_c", partition_by="o_custkey",
                       order_by=["o_orderdate", "o_orderkey"],
                       window=3, fn="sum")
    o = o.with_rolling("roll_cnt", "price_c", partition_by="o_custkey",
                       order_by=["o_orderdate", "o_orderkey"],
                       window=3, fn="count", min_periods=1)
    o = o.with_expanding("exp_sum_c", "price_c", partition_by="o_custkey",
                         order_by=["o_orderdate", "o_orderkey"], fn="sum")
    o = o.assign(roll_avg=o["roll_sum_c"] / o["roll_cnt"] / 100.0,
                 exp_sum=o["exp_sum_c"] / 100.0)
    return o[["o_orderkey", "o_custkey", "roll_avg", "exp_sum"]].to_spark()


def groupby_nunique_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped nunique (countDistinct) + exact median — the groupby surface
    the reference lacks (SURVEY §2.6 'missing but expected')."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    g = li.groupby("l_returnflag").agg(
        n_parts=("l_partkey", "nunique"),
        median_qty=("l_quantity", "median"))
    return g.to_spark()


def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas pivot_table → ``groupBy().pivot()`` with explicit pivot values
    (no eager distinct-discovery scan — required at 100 TB)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    pv = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    p = o.pivot_table(values="price_c", index="o_orderstatus",
                      columns="o_orderpriority", aggfunc="sum",
                      pivot_values=pv).reset_index()
    p = p.rename(columns={"1-URGENT": "urgent_c", "2-HIGH": "high_c",
                          "3-MEDIUM": "medium_c", "4-NOT SPECIFIED": "notspec_c",
                          "5-LOW": "low_c"})
    p = p.assign(urgent=p["urgent_c"] / 100.0, high=p["high_c"] / 100.0,
                 medium=p["medium_c"] / 100.0, notspec=p["notspec_c"] / 100.0,
                 low=p["low_c"] / 100.0)
    return p[["o_orderstatus", "urgent", "high", "medium", "notspec", "low"]].to_spark()


def melt_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas melt → Spark-native ``unpivot`` (narrow, shuffle-free; value
    columns promoted to their common type)."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    return c.melt(id_vars="c_custkey",
                  value_vars=["c_acctbal", "c_nationkey"],
                  var_name="metric", value_name="val").to_spark()


def period_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period dtype workflow (SURVEY §1.4; reference ToTimestamp
    ``_expr.py:1159-1168``): orders → month *period* via
    ``dt.to_period('M')`` (stored as period-start timestamp, pure
    ``date_trunc`` — codegen, no shuffle), grouped revenue per period,
    then the period index → period-END timestamps via
    ``to_timestamp(how='end')`` (start + 1 month - 1µs, column
    arithmetic).  One hash-shuffle groupBy total."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(month=o.o_orderdate.dt.to_period("M"))
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    g = o.groupby("month").agg(n=("o_orderkey", "count"),
                               rev_c=("price_c", "sum"))
    out = g.to_timestamp(freq="M", how="end")
    sdf = out.reset_index().to_spark()
    return sdf.select(F.col("month").alias("month_end"), F.col("n"),
                      (F.col("rev_c") / 100.0).alias("revenue"))


def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (generalizes rollup/cube — one shuffle)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.assign(qty_c=(li.l_quantity * 100).floor())
    g = li.grouping_sets([["l_returnflag", "l_linestatus"],
                          ["l_linestatus"], []]).agg(
        n=("l_orderkey", "count"), qty=("qty_c", "sum"))
    g = g.assign(qty=g["qty"] / 100.0)
    return g.to_spark()


def streaming_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming (SURVEY §2.9): readStream over the events
    parquet → tumbling 1-hour window agg → availableNow micro-batches into
    a memory sink.  The oracle is the equivalent *batch* SQL — proving the
    batch/stream unification contract."""
    from pandas_expr_spark.streaming import stream as st
    # file stream sources take a directory; glob-filter to the events table
    src = st.read_stream("parquet", sf_dir,
                         schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
                         options={"pathGlobFilter": "events.parquet"})
    # normalize event time whatever the parquet layout (int64-nanos,
    # TIMESTAMP_NTZ, or LTZ) — required for watermarks/windows
    from pandas_expr_spark.sources.tables import normalize_ts
    src = normalize_ts(src, "ts")
    # integer-cents before the agg so the windowed SUM is order-independent
    src = src.withColumn("value_c", F.floor(F.col("value") * 100))
    agg = st.tumbling_window_agg(
        src, "ts", "1 hour",
        {"n": ("event_id", "count"), "total_c": ("value_c", "sum")},
        watermark="2 hours")
    # state-store partitioning is pinned at stream start (see
    # streaming.state_partitions) — size it to the stream, not the session
    with st.state_partitions(8):
        q = st.to_memory_sink(agg, "stream_hourly_events", "complete")
        q.awaitTermination()
    out = spark.table("stream_hourly_events")
    return out.select(F.col("window_start").alias("hour_start"),
                      F.col("n"),
                      (F.col("total_c") / 100.0).alias("total"))


def streaming_enriched_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (SURVEY §2.9): the events stream enriched against
    the static customer dimension — Spark broadcasts the static side into
    every micro-batch (no state store, no watermark needed for the join),
    then a windowless grouped agg in complete mode.  Oracle = batch SQL."""
    from pandas_expr_spark.streaming import stream as st
    src = st.read_stream("parquet", sf_dir,
                         schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
                         options={"pathGlobFilter": "events.parquet"})
    src = src.withColumn("value_c", F.floor(F.col("value") * 100))
    dim = (spark.read.parquet(f"{sf_dir}/customer.parquet")
           .select("c_custkey", "c_mktsegment"))
    j = src.join(F.broadcast(dim), src.user_id == dim.c_custkey, "inner")
    agg = j.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value_c").alias("total_c"))
    with st.state_partitions(8):
        q = st.to_memory_sink(agg, "stream_enriched_segments", "complete")
        q.awaitTermination()
    out = spark.table("stream_enriched_segments")
    return out.select(F.col("c_mktsegment").alias("segment"),
                      F.col("event_type"), F.col("n"),
                      (F.col("total_c") / 100.0).alias("total"))


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h window / 1h slide) through the SAME helper that
    serves streaming frames — each event lands in two hour-aligned windows.
    Oracle: union of the two shifted hour buckets."""
    from pandas_expr_spark.sources.tables import load_table
    from pandas_expr_spark.streaming import stream as st
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("value_c", F.floor(F.col("value") * 100))
    agg = st.sliding_window_agg(ev, "ts", "2 hours", "1 hour",
                                {"n": ("event_id", "count"),
                                 "total_c": ("value_c", "sum")})
    return agg.select(F.col("window_start"), F.col("n"),
                      (F.col("total_c") / 100.0).alias("total"))


def streaming_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running count/sum over availableNow micro-batches.  EXACT-gated: the
    final accumulated state per key (max over the update-mode sink's
    emissions) must equal the batch totals — integer-cents accumulation so
    the double group-state sum is order-independent and bit-exact vs the
    SQL oracle."""
    from pandas_expr_spark.streaming import stream as st
    src = st.read_stream("parquet", sf_dir,
                         schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
                         options={"pathGlobFilter": "events.parquet"})
    from pandas_expr_spark.sources.tables import normalize_ts
    src = normalize_ts(src, "ts")
    src = src.withColumn("value_c", F.floor(F.col("value") * 100)
                         .cast("double"))
    run = st.stateful_running_agg(src, ["user_id"], "value_c")
    with st.state_partitions(8):
        q = st.to_memory_sink(run, "stream_stateful_running", "update")
        q.awaitTermination()
    out = spark.table("stream_stateful_running")
    return (out.groupBy("user_id")
            .agg(F.max("running_count").alias("n_events"),
                 (F.max("running_sum") / 100.0).alias("total")))


def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-dedup (custom stateful operator): first row per
    user_id across micro-batches via per-key group state.  Projecting the
    key makes the result order-independent → exact oracle
    (SELECT DISTINCT user_id)."""
    from pandas_expr_spark.streaming import stream as st
    src = st.read_stream("parquet", sf_dir,
                         schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
                         options={"pathGlobFilter": "events.parquet"})
    out = st.stateful_stream_dedup(src, "user_id")
    with st.state_partitions(8):
        q = st.to_memory_sink(out, "stream_dedup_users", "append")
        q.awaitTermination()
    return spark.table("stream_dedup_users").select("user_id")


def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest (streaming × dedup crossover): the incoming document
    stream is fingerprinted per micro-batch and broadcast-joined against a
    STATIC corpus fingerprint table — no state store; the persisted corpus
    *is* the state, exactly how a production ingest gate flags docs already
    present in yesterday's corpus.  Corpus = fingerprints of doc_id % 3 == 0;
    a non-corpus incoming doc is a dup iff its normalized-text md5 exists
    there.  Exact oracle (same md5 in DuckDB)."""
    from pandas_expr_spark.streaming import stream as st
    from pandas_expr_spark.functions.text import fingerprint
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = st.read_stream("parquet", sf_dir, schema=schema,
                         options={"pathGlobFilter": "documents.parquet"})
    corpus = (spark.read.parquet(f"{sf_dir}/documents.parquet")
              .filter(F.col("doc_id") % 3 == 0)
              .select(fingerprint("text").alias("fp")).distinct())
    inc = (src.withColumn("fp", fingerprint("text"))
           .join(F.broadcast(corpus.withColumn("__hit__", F.lit(1))),
                 "fp", "left")
           .withColumn("is_dup", (F.col("doc_id") % 3 != 0)
                       & F.col("__hit__").isNotNull()))
    agg = inc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dups"))
    with st.state_partitions(8):
        q = st.to_memory_sink(agg, "stream_dedup_ingest", "complete")
        q.awaitTermination()
    return spark.table("stream_dedup_ingest").select("source", "n_docs",
                                                     "n_dups")


def sample_fraction_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Sample §2.2, re-expressed as the SCALE-SAFE deterministic
    seeded-hash sample (``splits.hash_sample``): a row's membership is a
    pure function of its key (md5 bucket < frac), so the sample is stable
    across runs, partitionings, and engines — and exactly oracle-checkable
    in DuckDB (r5 verdict ask #7; was rows-only under Spark's
    partition-dependent RNG sample)."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.functions import splits
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet").to_spark()
    key = F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
    out = splits.hash_sample(li, key, 0.1)
    return out.select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# batch 3: remaining SURVEY §2 surface — eval/query, math ops, tail,
# nlargest, normalize, keep-first dedup, inner concat, indicator merge,
# cross join, map/apply UDFs, index-aligned binop
# ---------------------------------------------------------------------------
def eval_query_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Eval (string expr → F.expr, compiled not UDF) + query."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    out = (li.eval("charge = l_extendedprice * (1 + l_tax)")
             .query("charge > 90000 AND l_discount < 0.05"))
    return out[["l_orderkey", "l_linenumber", "charge"]].to_spark()


def math_abs_clip_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Abs/Clip (§2.2) + floor — all JVM elementwise."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    out = c.assign(clipped=c["c_acctbal"].clip(0, 5000),
                   mag=c["c_acctbal"].abs().floor())
    return out[["c_custkey", "clipped", "mag"]].to_spark().select(
        F.col("c_custkey").cast("long"), "clipped", "mag")


def tail_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Tail §2.7 — deterministic after explicit sort."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    return o.sort_values("o_orderkey").tail(5)[
        ["o_orderkey", "o_custkey"]].to_spark()


def nlargest_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference NLargest §2.5 → TakeOrderedAndProject (distributed top-k,
    no global sort)."""
    import pandas_expr_spark as pes
    p = pes.read_parquet(f"{sf_dir}/part.parquet")
    out = p.nlargest(10, ["p_retailprice", "p_partkey"])
    return out[["p_partkey", "p_retailprice"]].to_spark().select(
        F.col("p_partkey").cast("long"), "p_retailprice")


def value_counts_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ValueCounts normalize=True (§2.5)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    vc = o["o_orderpriority"].value_counts(normalize=True)
    return vc.to_spark()


def dedup_keep_first_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates(keep='first') honoring index order (IX §2.5) —
    row_number window over the engine index per subset group."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    first = o.drop_duplicates(subset=["o_custkey"], keep="first")
    out = first.reset_index()
    return out[["o_orderkey", "o_custkey", "o_totalprice"]].to_spark()


def concat_inner_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat join='inner' (§2.4): common-column projection then unionByName."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    a = li[["l_orderkey", "l_quantity", "l_discount"]]
    b = li[li.l_quantity > 45][["l_orderkey", "l_quantity"]]
    return pes.concat([a, b], join="inner").to_spark()


def merge_indicator_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(indicator=True) presence column (§2.3)."""
    import pandas_expr_spark as pes
    n = pes.read_parquet(f"{sf_dir}/nation.parquet")
    r = pes.read_parquet(f"{sf_dir}/region.parquet")
    r3 = r[r.r_regionkey < 3][["r_regionkey", "r_name"]]
    m = n.merge(r3, how="outer", left_on="n_regionkey",
                right_on="r_regionkey", indicator=True)
    g = m.groupby("_merge").agg(n=("n_nationkey", "count"))
    return g.to_spark()


def cross_join_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (§2.3 how='cross')."""
    import pandas_expr_spark as pes
    r = pes.read_parquet(f"{sf_dir}/region.parquet")[["r_name"]]
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    flags = li[["l_returnflag"]].drop_duplicates(keep="any")
    return r.merge(flags, how="cross").to_spark()


def map_dict_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.map(dict) → CASE WHEN chain, JVM-side; unmatched → null
    (pandas semantics), then fillna (§2.2 Map + Fillna)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    mapped = li["l_returnflag"].map({"A": "accepted", "R": "returned"})
    out = li.assign(status=mapped.fillna("other"))
    g = out.groupby("status").agg(n=("l_orderkey", "count"))
    return g.to_spark()


def apply_udf_name_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.apply(callable) → Arrow-batched pandas_udf (§2.10); oracle is
    plain SQL LENGTH — proving the Python UDF path against the JVM answer."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    sub = c[c.c_custkey <= 100]
    out = sub.assign(name_len=sub["c_name"].apply(len, return_type="int64"))
    return out[["c_custkey", "name_len"]].to_spark().select(
        F.col("c_custkey").cast("long"), F.col("name_len").cast("long"))


def align_add_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-aligned cross-frame binop (§2.2 pandas alignment — full outer
    join on the engine index, IX)."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    a = c[(c.c_custkey % 2 == 0) & (c.c_custkey < 500)]
    b = c[(c.c_acctbal > 0) & (c.c_custkey < 500)]
    sa = a.set_index("c_custkey")["c_acctbal"]
    sb = b.set_index("c_custkey")["c_acctbal"]
    tot = sa + sb
    out = tot.to_frame("total").reset_index()
    return out.to_spark().select(F.col("c_custkey").cast("long"), "total")


# ---------------------------------------------------------------------------
# batch 4: categorical codes, grouped applyInPandas, brute-force cosine
# pairs, approx-distinct
# ---------------------------------------------------------------------------
def cat_codes_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical accessor (§1.4/§2.8): as_known computes the category
    list (distinct, sorted — reference ``cat.as_known`` _categorical.py:55-76),
    codes dictionary-encode against it."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    sub = c[c.c_custkey <= 200]
    seg = sub["c_mktsegment"].cat.as_known()
    out = sub.assign(seg_code=seg.cat.codes)
    return out[["c_custkey", "c_mktsegment", "seg_code"]].to_spark().select(
        F.col("c_custkey").cast("long"), "c_mktsegment",
        F.col("seg_code").cast("int"))


def grouped_apply_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF via Arrow applyInPandas (§2.10): integer-exact
    deviation n·x − Σx per mktsegment (no float summation order issues)."""
    import pandas as pd
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    c = c.assign(bal_c=(c["c_acctbal"] * 100).floor())
    g = c[["c_custkey", "c_mktsegment", "bal_c"]].groupby("c_mktsegment")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["dev_c"] = len(pdf) * pdf["bal_c"] - pdf["bal_c"].sum()
        return pdf[["c_custkey", "c_mktsegment", "dev_c"]]

    out = g.apply(demean,
                  "c_custkey long, c_mktsegment string, dev_c long")
    return out.to_spark()


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs cosine ≥ 0.4 — the exact baseline for the LSH
    path (embedding_ann_lsh); double-precision sequential fold matches
    DuckDB's list_dot_product composition term by term."""
    from pandas_expr_spark.functions import similarity
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    return similarity.brute_force_pairs(emb_d, cosine_threshold=0.4,
                                        round_to=4)


def nunique_approx_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dead API made real (``nunique_approx``
    _collection.py:282-283 → AttributeError) — HyperLogLog++
    approx_count_distinct.  The sketch value is engine-specific, but its
    PUBLISHED ERROR BOUND is not: the gate emits the exact distinct count
    plus a boolean asserting the HLL estimate landed within 4×rsd of it
    (rsd defaults to 0.05; P(>4σ) is negligible), which DuckDB oracles
    exactly (r5 verdict ask #7 — inequality oracle, was rows-only)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    approx = o["o_custkey"].nunique_approx().to_spark()
    a = approx.select(F.col(approx.columns[0]).alias("a"))
    exact = (pes.read_parquet(f"{sf_dir}/orders.parquet").to_spark()
             .agg(F.countDistinct("o_custkey").alias("exact_custkeys")))
    return (a.crossJoin(exact)
            .select(F.col("exact_custkeys"),
                    (F.abs(F.col("a") - F.col("exact_custkeys"))
                     <= 4 * 0.05 * F.col("exact_custkeys"))
                    .alias("within_bound")))


# ---------------------------------------------------------------------------
# batch-5 parity ops: resample / crosstab / duplicated / ffill / top-n /
# moments / scalable rank (SURVEY §2.5 + §2.7 gaps, pandas staples)
# ---------------------------------------------------------------------------
def resample_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample (pandas ``df.resample('D', on=ts)``) → per-day
    counts + cents-exact value sums.  date_trunc bucketing is a pure
    projection; the only shuffle is the grouped agg itself."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events"))
    ev = ev.assign(v_c=(ev.value * 100).floor())
    g = ev.resample("D", on="ts").agg(n=("event_id", "count"),
                                      v_sum_c=("v_c", "sum"))
    out = g.reset_index().to_spark()
    return out.select(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                      "n", (F.col("v_sum_c") / 100.0).alias("value_sum"))


def trained_quality_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end trained quality classifier (``curation.fit_logit`` —
    distributed batch-GD logistic regression: per iteration ONE
    k+1-cell hash aggregation with the current weights as literals, the
    corpus never re-read thanks to the up-front checkpoint).  Weak
    labels = lang == 'en' (the stop-word feature IS an English signal,
    so the classifier has something real to learn); features = JVM text
    stats.  r8: EXACT oracle — the fixed-iteration GD unrolls to nested
    SQL CTEs (the PageRank pattern): each iteration is one corpus-wide
    AVG with the prior CTE's weights, IEEE doubles agree to ~1e-15 and
    the 2-dp rounding absorbs the summation-order eps.  5 iterations
    (was 10 rows-only) — same convergence class, half the unroll.  The
    exact-math differential vs numpy GD lives in
    tests/test_fit_logit.py."""
    from pandas_expr_spark.functions import curation, text
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    feats = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("label"),
        text.stopword_ratio("text").alias("f_stop"),
        (text.lang_score("text", "en")
         / (text.token_count("text") + F.lit(1))).alias("f_en"),
        (F.log1p(F.length("text")) - F.lit(6.0)).alias("f_loglen"))
    w = curation.fit_logit(feats, "label",
                           ["f_stop", "f_en", "f_loglen"],
                           lr=2.0, iters=5)
    scored = feats.withColumn(
        "p", curation.logit_score(w, ["f_stop", "f_en", "f_loglen"]))
    return (scored.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("p"), 2).alias("avg_p"))
            .orderBy("label"))


def rolling_time_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-OFFSET rolling window (pandas ``rolling("3D")``,
    ``functions/timeseries.py`` ``time_rolling``): 3-day trailing sums
    over the unique daily event series.  The engine plan is a
    block-bucketed self-join (each row's window reaches only its own and
    the previous W-wide time block) — never a global RANGE window, which
    would single-task at scale.  Unique daily timestamps make the result
    position-independent, so DuckDB's RANGE INTERVAL window is an exact
    oracle (cents-integer sums)."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events"))
    ev = ev.assign(day=ev["ts"].dt.floor("D"),
                   v_c=(ev.value * 100).floor())
    daily = ev.groupby("day").agg(n=("event_id", "count"),
                                  v_c=("v_c", "sum"))
    r = daily.rolling("3D").sum()
    out = r.reset_index().to_spark()
    return out.select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                      F.col("n").cast("long").alias("n3"),
                      (F.col("v_c") / 100.0).alias("v3"))


def crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``pd.crosstab`` → groupBy+pivot with PINNED pivot values (no
    eager distinct-discovery scan — the 100 TB-safe form)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    ct = o.crosstab("o_orderstatus", "o_orderpriority",
                    pivot_values=["1-URGENT", "2-HIGH", "3-MEDIUM",
                                  "4-NOT SPECIFIED", "5-LOW"])
    ct = ct.rename(columns={"1-URGENT": "urgent", "2-HIGH": "high",
                            "3-MEDIUM": "medium",
                            "4-NOT SPECIFIED": "unspecified", "5-LOW": "low"})
    return ct.to_spark()


def duplicated_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.duplicated`` keep="first" over the engine index (`IX`):
    marks later (p_type, p_size) repeats; one window shuffle."""
    import pandas_expr_spark as pes
    p = pes.read_parquet(f"{sf_dir}/part.parquet").set_index("p_partkey")
    dup = p.duplicated(subset=["p_type", "p_size"], keep="first")
    counts = dup.to_frame("dup").groupby("dup").size()
    out = counts.to_frame("n").reset_index().to_spark()
    return out.select("dup", "n")


def ffill_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill: null out click values, forward-fill per user over (ts,
    event_id), then aggregate — ``last(ignorenulls)`` window, one shuffle
    on user_id.  Cents basis keeps the sums engine-exact."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events"))
    v_c = (ev.value * 100).floor().where(ev.event_type != "click")
    ev = ev.assign(v_c=v_c)
    filled = ev.with_ffill("v_f", "v_c", partition_by="user_id",
                           order_by=["ts", "event_id"])
    g = filled.groupby("event_type").agg(n_filled=("v_f", "count"),
                                         fill_sum_c=("v_f", "sum"))
    g = g.assign(fill_sum=g["fill_sum_c"] / 100.0)
    return g.reset_index().to_spark().select("event_type", "n_filled", "fill_sum")


def ffill_global_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UN-grouped forward-fill over the whole table (``Series.ffill`` in
    event_id order) — the distributed ``last_scan`` path (range shuffle +
    per-partition fill + tiny carry fold), NOT a global window; then
    re-aggregated per event_type.  Cents basis keeps sums engine-exact."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events"))
    ev = ev.set_index("event_id")
    v_c = (ev.value * 100).floor().where(ev.event_type != "click")
    filled = ev.assign(v_f=v_c)[["event_type", "v_f"]].ffill()
    g = filled.groupby("event_type").agg(n_filled=("v_f", "count"),
                                         fill_sum_c=("v_f", "sum"))
    g = g.assign(fill_sum=g["fill_sum_c"] / 100.0)
    return g.reset_index().to_spark().select("event_type", "n_filled", "fill_sum")


def groupby_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority — ``groupby.nlargest`` as ONE row-number
    window (partial top-n inside the sort; never a per-group pandas apply)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    top = o.groupby("o_orderpriority").nlargest(3, "o_totalprice",
                                                tiebreak="o_orderkey")
    return top.to_spark().select("o_orderpriority", "o_orderkey", "o_totalprice")


def skew_sem_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected skew/kurt + sem from ONE pass of exact integer power
    sums (decimal accumulation), then IEEE-exact double arithmetic (+,-,*,/,
    sqrt only — no pow) → bit-identical to the DuckDB HUGEINT oracle.
    skew/kurt are scale-invariant, so the floor(price/100) basis loses no
    fidelity; sem uses the dollar basis."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    b = (li.l_extendedprice / 100).floor()   # ~1e3 → Σx⁴ int64/decimal-safe
    d = li.l_extendedprice.floor()           # dollars for sem
    sk = b.skew()._sdf.select(F.col("skew").alias("price_skew"))
    ku = b.kurt()._sdf.select(F.col("kurt").alias("price_kurt"))
    se = d.sem(ddof=2)._sdf.select(F.col("sem").alias("price_sem"))
    return sk.crossJoin(ku).crossJoin(se)


def rank_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-series ``Series.rank`` WITHOUT a global single-partition window:
    distinct-value rank table (shuffle on value) joined back.  Ranks are
    exact multiples of 0.5 → bucketed counts are engine-exact."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    r = o.o_totalprice.rank(method="average")
    buckets = (r / 1000).floor().value_counts(sort=False)
    out = buckets.to_spark()
    val_col = [c for c in out.columns if c != "count"][0]
    return out.select(F.col(val_col).alias("bucket"), "count")


# ---------------------------------------------------------------------------
# sketch analytics (mergeable DataSketches states — KB-per-group shuffle
# instead of raw-column repartition; functions/sketches.py)
# ---------------------------------------------------------------------------
def top_tokens_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy-hitters: explode → count → distributed TopK
    (TakeOrderedAndProject — never a global sort)."""
    from pandas_expr_spark.functions import sketches
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    return sketches.top_tokens(docs, "text", k=20)


def kll_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc-length quantiles from KLL sketches — one pass,
    mergeable KB states.  EXACT oracle (converted r5): at the gate SF the
    largest group (en, 218 docs) fits the level-0 buffer of a k=800
    sketch, so no compaction ever fires — the merged sketch holds every
    value and ``get_quantile`` returns the inclusive order statistic,
    i.e. DuckDB's ``quantile_disc`` (verified identical + deterministic
    across runs).  The 100 TB path is the same code with the default
    k=200: same agg/merge plan, ~1.7% rank error."""
    from pandas_expr_spark.functions import sketches
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    r = sketches.kll_quantiles(docs, "n_chars", [0.5, 0.9, 0.99],
                               by="lang", k=800)
    return r.select("lang", F.col("q50").cast("long").alias("q50"),
                    F.col("q90").cast("long").alias("q90"),
                    F.col("q99").cast("long").alias("q99"))


def audience_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user-audience overlap between event types via theta-sketch
    intersections — raw data is scanned ONCE; pairwise work touches only
    KB-sized sketch states.  EXACT oracle (converted r5): distinct users
    per type is 150 (sf0.01) / 1500 (sf0.1), both far under the sketch's
    k=4096, so every sketch stays in exact mode (all hashes retained, no
    sampling, deterministic) and the intersection estimate IS the exact
    ``COUNT(DISTINCT)`` overlap — verified identical to the DuckDB
    distinct self-join.  ``value > 75`` makes the per-type audiences
    genuinely differ so the gate discriminates."""
    from pandas_expr_spark.functions import sketches
    from pandas_expr_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events").where(F.col("value") > 75)
    return sketches.audience_overlap(ev, "user_id", "event_type")


def concat_axis1_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``concat(axis=1)`` — index-aligned column concat, which the reference
    explicitly rejects (``_collection.py:638-652``); here it is one n-way
    full-outer equi-join on the index."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    s = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    nc = c.groupby("c_nationkey").agg(n_cust=("c_custkey", "count"))
    ns = s.groupby("s_nationkey").agg(n_supp=("s_suppkey", "count"))
    out = pes.concat([nc, ns], axis=1).fillna(0)
    return (out.reset_index().to_spark()
            .select(F.col("c_nationkey").alias("nationkey"),
                    F.col("n_cust").cast("long").alias("n_cust"),
                    F.col("n_supp").cast("long").alias("n_supp")))


def _events_stream(spark, sf_dir):
    """readStream over the events parquet with event-time normalization
    (int64-nanos / NTZ / LTZ all handled by normalize_ts)."""
    from pandas_expr_spark.sources.tables import normalize_ts
    from pandas_expr_spark.streaming import stream as st
    src = st.read_stream(
        "parquet", sf_dir,
        schema=spark.read.parquet(f"{sf_dir}/events.parquet").schema,
        options={"pathGlobFilter": "events.parquet"})
    return normalize_ts(src, "ts")


def streaming_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream through the same sliding-window helper the batch query
    uses (2h window / 1h slide, 2h watermark) — the batch/stream
    unification contract, checked against the batch SQL oracle."""
    from pandas_expr_spark.streaming import stream as st
    src = _events_stream(spark, sf_dir)
    src = src.withColumn("value_c", F.floor(F.col("value") * 100))
    agg = st.sliding_window_agg(src, "ts", "2 hours", "1 hour",
                                {"n": ("event_id", "count"),
                                 "total_c": ("value_c", "sum")},
                                watermark="2 hours")
    with st.state_partitions(8):
        q = st.to_memory_sink(agg, "stream_sliding_events", "complete")
        q.awaitTermination()
    out = spark.table("stream_sliding_events")
    return out.select(F.col("window_start"), F.col("n"),
                      (F.col("total_c") / 100.0).alias("total"))


def streaming_sessions_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows (30-min gap) on a REAL stream — Spark's
    merging-session state machine under a watermark; oracle is the batch
    gaps-and-islands SQL."""
    from pandas_expr_spark.streaming import stream as st
    src = _events_stream(spark, sf_dir)
    agg = st.session_window_agg(src, "ts", "30 minutes",
                                {"n_events": ("event_id", "count")},
                                keys=["user_id"], watermark="2 hours")
    with st.state_partitions(8):
        q = st.to_memory_sink(agg, "stream_sessions_users", "complete")
        q.awaitTermination()
    out = spark.table("stream_sessions_users")
    return (out.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("n_events")))


# ---------------------------------------------------------------------------
# training-pipeline splits & sampling (deterministic hash-based — the
# production alternative to RNG sampling at 100 TB; functions/splits.py)
# ---------------------------------------------------------------------------
def hash_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train/val/test assignment as a pure md5 projection of the key — no
    shuffle, no RNG, reproducible across runs/engines/partitionings (md5 is
    bit-identical everywhere, so this is exactly oracle-checkable)."""
    from pandas_expr_spark.functions import splits
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    s = splits.hash_split(docs, "doc_id",
                          {"train": 0.8, "val": 0.1, "test": 0.1})
    return (s.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_chars").alias("chars")))


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing: ≤50 docs per language by hash order — one
    row-number window (single shuffle on lang); the deterministic selection
    means even the sum of chosen ids is engine-exact."""
    from pandas_expr_spark.functions import splits
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    s = splits.stratified_downsample(docs, "lang", "doc_id", 50)
    return (s.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("doc_id").alias("id_sum")))


# ---------------------------------------------------------------------------
# time-series smoothing + reshape (SURVEY §2.7 superset; reference has no
# ewm/rolling at all and rejects reshape beyond the basics)
# ---------------------------------------------------------------------------
def ewm_price_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exponentially weighted mean (pandas ``groupby.ewm(alpha=0.5)
    .mean()``) of order totals per customer — Arrow-batched applyInPandas,
    one shuffle on the keys (functions/timeseries.py).

    Exact oracle: the pandas ewm kernel is a scalar recurrence
    (``old_wt *= 1-alpha; w = (old_wt*w + cur)/(old_wt + 1); old_wt += 1``
    with an equal-value skip), which the oracle replicates step-for-step in
    a DuckDB recursive CTE — same IEEE ops in the same order, so the doubles
    are bit-identical across engines with no rounding basis needed."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 100]
    o = o.with_ewm("price_ewm", "o_totalprice",
                   order_by=["o_orderdate", "o_orderkey"],
                   partition_by="o_custkey", alpha=0.5)
    return o[["o_orderkey", "o_custkey", "price_ewm"]].to_spark()


def unstack_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``unstack``: long (nation, segment, count) → wide one-column-
    per-segment.  ``groupBy(index).pivot(columns, pinned_values).first`` —
    the pinned pivot values skip the eager distinct-discovery scan (the
    100 TB rule for every pivot in this engine)."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    g = (c.groupby(["c_nationkey", "c_mktsegment"])
         .agg(cnt=("c_custkey", "count")).reset_index())
    return g.unstack("c_nationkey", "c_mktsegment", "cnt",
                     pivot_values=["AUTOMOBILE", "BUILDING", "FURNITURE",
                                   "HOUSEHOLD", "MACHINERY"]).to_spark()


def cumsum_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (un-partitioned) running revenue total in order-key order —
    the distributed two-phase segment scan (``functions/scan.py``): range
    shuffle + per-partition local scan + tiny carry fold, never a
    single-task global window.  Integer-cents basis → BIGINT prefix sums,
    bit-exact vs the oracle's SUM OVER (ORDER BY) window."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 500]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    s = o.set_index("o_orderkey")["price_c"].cumsum()
    return s.to_frame("cum_price_c").reset_index().to_spark()


def shift_diff_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ``Series.diff`` — shift expressed as an equi-join on the
    distributed global position (``scan.global_pos``), no window at all.
    BIGINT cent differences are engine-exact."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 500]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    d = o.set_index("o_orderkey")["price_c"].diff()
    return d.to_frame("price_diff_c").reset_index().to_spark()


def rolling_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global 7-row rolling revenue — prefix-sum differencing
    (``scan.rolling_agg``): rolling_sum_i = S_i - S_{i-7}, one range
    shuffle + one position equi-join, no window function.  Integer-cent
    prefix sums stay below 2^53 so the double arithmetic is exact and the
    BIGINT oracle matches bit-for-bit."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 500]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    r = o.set_index("o_orderkey")["price_c"].rolling(7).sum()
    out = r.to_frame("roll_price_c").reset_index()
    return out.to_spark().select(
        "o_orderkey", F.col("roll_price_c").cast("long"))


def grouped_rolling_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().rolling() chain: per-customer 3-row rolling sum of order
    prices — ONE partitioned rowsBetween window (single shuffle on the
    keys), exact BIGINT oracle."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 300]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    g = (o.set_index("o_orderkey")[["o_custkey", "price_c"]]
         .groupby("o_custkey").rolling(3).sum())
    sdf = g.to_spark()
    return sdf.select(F.col("o_orderkey"), F.col("o_custkey"),
                      F.col("price_c").cast("long").alias("roll_sum_c"))


def rolling_minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global 7-row rolling min AND max — the van Herk two-pass block
    algorithm (``scan.rolling_minmax``): per-block prefix/suffix extremes
    over block-partitioned windows (bounded tasks, never a global window)
    + one position join.  Integer cents → exact BIGINT oracle."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.functions import scan
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_custkey < 500]
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    sdf = o.to_spark().select("o_orderkey", "price_c")
    # min AND max share one scan + block-window pass + position join
    out = scan.rolling_minmax(sdf, "price_c", ["o_orderkey"], 7,
                              fn=["min", "max"],
                              out=["roll_min_c", "roll_max_c"])
    return out.select("o_orderkey",
                      F.col("roll_min_c").cast("long").alias("roll_min_c"),
                      F.col("roll_max_c").cast("long").alias("roll_max_c"))


def stack_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``stack``: wide → long with the pandas default of dropping
    null cells.  The wide frame left-joins a filtered supplier rollup, so
    some nations carry a real NULL that ``stack`` must drop (and
    ``dropna=False`` would keep) — melt is Spark-native ``unpivot``, a
    narrow no-shuffle op."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    s = pes.read_parquet(f"{sf_dir}/supplier.parquet")
    nc = (c.groupby("c_nationkey").agg(cust_cnt=("c_custkey", "count"))
          .reset_index().rename(columns={"c_nationkey": "nk"}))
    ns = (s[s.s_acctbal > 5000].groupby("s_nationkey")
          .agg(supp_cnt=("s_suppkey", "count"))
          .reset_index().rename(columns={"s_nationkey": "nk"}))
    wide = nc.merge(ns, on="nk", how="left")
    return wide.stack("nk", ["cust_cnt", "supp_cnt"]).to_spark()


def resample_gapfill_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``resample(fill_empty=True)`` — pandas' empty-bin materialization:
    one user's sparse activity resampled daily; missing days appear with
    n = 0 (count-like fills) and null value sum.  The spine is a generated
    ``sequence`` over the persisted post-agg result — no second fact-table
    scan."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events"))
    ev = ev.assign(v_c=(ev.value * 100).floor())
    ev = ev[ev.user_id == 7]
    g = ev.resample("D", on="ts", fill_empty=True).agg(
        n=("event_id", "count"), v_sum_c=("v_c", "sum"))
    out = g.reset_index().to_spark()
    return out.select(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                      "n", (F.col("v_sum_c") / 100.0).alias("value_sum"))


def streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join on two REAL streams: each view matched
    to the same user's purchases within the following hour.  Watermarks on
    both sides + the range predicate bound the join state (the equi-only
    variant would buffer both streams forever).  Inner joins emit in the
    matching microbatch → append-mode memory sink; oracle is the identical
    batch equi+range join."""
    from pandas_expr_spark.streaming import stream as st
    views = (_events_stream(spark, sf_dir)
             .filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("view_ts"),
                     F.col("event_id").alias("view_id")))
    buys = (_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(F.col("user_id"), F.col("ts").alias("buy_ts"),
                    F.col("event_id").alias("purchase_id")))
    joined = st.stream_stream_join(views, buys, ["user_id"],
                                   "view_ts", "buy_ts", within="1 hour")
    pairs = joined.select(F.col("l.user_id").alias("user_id"),
                          "view_id", "purchase_id")
    with st.state_partitions(8):
        q = st.to_memory_sink(pairs, "stream_view_purchase", "append")
        q.awaitTermination()
    return spark.table("stream_view_purchase")


def describe_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.describe`` (pandas staple beyond reference §2.5): ONE
    aggregation pass (count/mean/std/min/exact quartiles/max) + a JVM-side
    ``stack`` into stat rows — nothing collects on the driver.  The gate
    drops the ``std`` row only: stddev's partial-merge order is
    engine-specific, while every retained stat is exact integer / dyadic
    IEEE math on the BIGINT quantity column (quartile interpolation
    fractions are 0/.25/.5/.75 — exact in double)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    d = (li.assign(qty=li.l_quantity.astype("int64"))[["qty"]]
         .describe().reset_index().rename(columns={"index": "stat"}))
    return d[d["stat"] != "std"].to_spark()


def cut_quantity_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Series.cut`` with explicit edges (beyond reference §2.5): a pure
    JVM CASE chain — no discovery scan, no shuffle before the final agg."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    b = li.l_quantity.cut([0, 10, 25, 40, 50],
                          labels=["low", "mid", "high", "top"])
    g = li.assign(bucket=b).groupby("bucket").agg(n=("l_orderkey", "count"))
    return g.to_spark()


def get_dummies_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``get_dummies`` one-hot with PINNED category values (no per-column
    distinct-discovery scan — the 100 TB contract) + per-nation sums in one
    shuffle."""
    import pandas_expr_spark as pes
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cust = pes.read_parquet(f"{sf_dir}/customer.parquet")
    d = cust[["c_nationkey", "c_mktsegment"]].get_dummies(
        ["c_mktsegment"], values={"c_mktsegment": segs})
    g = d.groupby("c_nationkey").agg(
        **{f"n_{s[:4].lower()}": (f"c_mktsegment_{s}", "sum") for s in segs})
    return g.to_spark()


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.corr`` — pairwise Pearson matrix in ONE aggregation pass
    (n² agg expressions, stacked JVM-side).  Correlation is scale-free
    O(1); merge-order drift is ~1e-12, so 4-dp rounding is
    engine-stable (same tier as the avg-ratio gates)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    m = li[["l_quantity", "l_extendedprice", "l_tax"]].corr()
    return m.round(4).to_spark()


def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-k (coarse k-means cells from a driver sample,
    JVM-side cell assignment, nprobe nearest cells probed) — the
    partition-pruning scale path, gated as an EXACT inequality oracle
    (r6 verdict ask #7): recall@10 vs brute force emitted as
    ``recall_ok = recall >= 0.6``, oracle TRUE.  nprobe=8 (half the
    cells) measures 0.8 at the driver's sf0.01 (margin 0.2); centroids
    are seed-deterministic."""
    from pandas_expr_spark.functions import similarity
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(v) for v in
         emb.filter(F.col("vec_id") == 2).select("embedding").collect()[0][0]]
    emb_d = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    ann = similarity.ivf_topk(emb_d, q, k=10, n_cells=16, nprobe=8)
    exact = similarity.cosine_topk(emb_d, q, k=10)
    hits = ann.select("vec_id").join(exact.select("vec_id"), "vec_id")
    return hits.agg((F.count(F.lit(1)) >= F.lit(6)).alias("recall_ok"))


def groupby_filter_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby.filter`` (SQL-predicate form): keep the order ROWS
    of customers with ≥ 8 orders — one keys-agg computing the HAVING
    predicate + a left-semi join back, zero Python."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    kept = o.groupby("o_custkey").filter("count(*) >= 8")
    kept = kept.assign(price_c=(kept.o_totalprice * 100).floor())
    out = kept[["o_orderkey", "o_custkey", "price_c"]].reset_index(drop=True)
    return out.to_spark()


def groupby_ohlc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby.ohlc`` in o_orderkey row order: open/high/low/close
    of integer-cents order totals per customer — min_by/max_by on the
    engine index make first/last part of the SAME single agg shuffle."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    o = o.assign(price_c=(o.o_totalprice * 100).floor())
    o = o.set_index("o_orderkey")
    out = o.groupby("o_custkey")[["price_c"]].ohlc()
    return out.reset_index().to_spark()


def interpolate_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Series.interpolate`` (linear) over the global event order —
    distributed neighbor-position scans + position equi-joins, no global
    window.  Every 7th event's value is nulled, then reconstructed."""
    import pandas_expr_spark as pes
    e = pes.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    e = e[e.user_id < 30]
    e = e.assign(v=(e.value * 100).floor())
    e = e.assign(v=e.v.mask(e.event_id % 7 == 0))
    e = e.set_index("event_id")
    out = e["v"].interpolate().round(4).to_frame().reset_index()
    return out.to_spark()


def asfreq_hourly_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``asfreq('h', method='pad')``: hourly max-value series for one
    user, missing hours forward-filled — spine generation + the engine's
    merge_asof (one shuffle)."""
    import pandas_expr_spark as pes
    ev = pes.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["ts", "user_id", "value"])
    ev = ev[ev.user_id == 7]
    ev = ev.assign(vc=(ev.value * 100).floor())
    hourly = ev.resample("h", on="ts").agg(vmax=("vc", "max")).reset_index()
    out = hourly.asfreq("h", on="ts", method="pad")
    return out[["ts", "vmax"]].to_spark()


# ---------------------------------------------------------------------------
# corpus curation: Gopher rule filters + logistic quality scoring,
# token-budget source mixing, SemDeDup semantic dedup
# ---------------------------------------------------------------------------
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document rule filter (Rae et al. 2021 §A1.1 public
    thresholds) + logistic quality score (``functions/curation.py``).
    One narrow JVM map over the corpus — one let-bound tokenization per
    row, no shuffle, no UDF.  Oracle replicates every rule in SQL."""
    from pandas_expr_spark.functions import curation
    from pandas_expr_spark.sources.tables import load_table
    # widen first: single-row-group local parquet + per-row tokenization
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    return (docs.select("doc_id", *curation.gopher_rules("text"),
                        F.round(curation.quality_logit("text"), 4)
                        .alias("q_logit"))
            .orderBy("doc_id"))


def mix_budget_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget source mixing (``curation.budget_sample``): per source,
    keep documents in deterministic md5 order until 600 whitespace tokens
    are used.  Two-phase hash-histogram plan — bucket histogram cumsum +
    broadcast semi-join for whole buckets, exact window only inside the
    one boundary bucket per source (~1/1024 of the data) — so no source
    is ever sorted in a single task.  Oracle = SQL window cumsum over the
    identical (bucket, md5, doc_id) order."""
    from pandas_expr_spark.functions import curation, text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.withColumn("n_tokens", tx.token_count("text").cast("long"))
    kept = curation.budget_sample(docs, budget=600, token_col="n_tokens",
                                  source_col="source", key_col="doc_id")
    return kept.select("doc_id", "source", "n_tokens").orderBy("doc_id")


def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — k-means clusters, then within-cluster
    cosine pruning keeping the smallest id (``clustering.semantic_dedup``).
    Planted truth: 8 axis clusters (margin 10) each split into 3 cosine
    subgroups by a secondary axis weight 4·(vec_id%3) — same-subgroup
    cosine ≥ 0.999, cross-subgroup ≤ 0.96, cross-cluster ≈ 0, so with
    threshold 0.98 the survivor set is EXACTLY one representative (min
    vec_id) per (cluster, subgroup); 0.01·sin noise cannot flip any
    margin.  Cluster labels canonicalized to min surviving vec_id."""
    from pandas_expr_spark.functions import clustering
    from pandas_expr_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.select("vec_id", F.expr(
        "transform(sequence(0, 63), j -> CAST("
        "CASE WHEN j = vec_id % 8 THEN 10.0 ELSE 0.0 END "
        "+ CASE WHEN j = 8 + (vec_id % 8) THEN 4.0 * (vec_id % 3) "
        "ELSE 0.0 END "
        "+ 0.01 * sin(CAST(vec_id * 64 + j AS DOUBLE)) AS DOUBLE))"
    ).alias("embedding"))
    # LAZY checkpoint (optimization r8): `kept` is consumed twice (the
    # canon broadcast side and the main join side); without it the whole
    # within-cluster pair join + anti join subtree is DUPLICATED in the
    # plan (verified: 2× SortMergeJoin LeftAnti, no ReusedExchange) —
    # i.e. the O(Σcᵢ²) SemDeDup core ran twice.  The canon broadcast
    # build materializes the checkpoint; the main side reads the cache.
    kept = clustering.semantic_dedup(planted, k=8, threshold=0.98,
                                     max_iter=5).localCheckpoint(eager=False)
    canon = kept.groupBy("cluster").agg(F.min("vec_id").alias("rep"))
    return (kept.join(F.broadcast(canon), "cluster")
            .select("vec_id", F.col("rep").alias("cluster_rep"))
            .orderBy("vec_id"))


def epoch_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch source mixing (``curation.epoch_sample``): every
    source gets a deterministic replication factor 0.3 + 0.35·(src_num %
    4) — rows replicate floor(f) times plus an md5-bucket fraction for the
    boundary epoch.  No RNG, no shuffle (one generator projection); the
    oracle reproduces the exact same replicas via unnest(range) + md5."""
    from pandas_expr_spark.functions import curation
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    f = (F.lit(0.3) + F.lit(0.35)
         * (F.substring("source", 4, 10).cast("int") % 4))
    mixed = curation.epoch_sample(docs.select("doc_id", "source"), f)
    return (mixed.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.sum("epoch").cast("long").alias("epoch_sum"))
            .orderBy("source"))


def between_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``between_time`` incl. midnight wrap (22:30–02:15): a pure
    time-of-day string-compare predicate (JVM date_format) — pushdown-
    friendly, no shuffle.  Oracle = strftime range in DuckDB."""
    import pandas_expr_spark as pes
    ev = pes.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["ts", "event_id", "user_id"])
    out = ev.set_index("ts").between_time("22:30", "02:15").reset_index()
    r = out.to_spark().select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_id", "user_id")
    return r.orderBy("event_id")


def pivot_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``DataFrame.pivot`` (non-agg): one row per customer, one
    column per order priority, cell = the single max-price order's cents
    (pre-deduped so pivot's duplicate check passes).  Spark
    ``groupBy().pivot(values pinned — no discovery scan).first()``; oracle
    = conditional MAX aggregation."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderpriority",
                                  "o_totalprice"])
    o = o.assign(cents=(o.o_totalprice * 100).round(0))
    top = (o.groupby(["o_custkey", "o_orderpriority"])
           .agg(cents=("cents", "max")).reset_index())
    wide = top.pivot(index="o_custkey", columns="o_orderpriority",
                     values="cents",
                     pivot_values=["1-URGENT", "2-HIGH", "3-MEDIUM",
                                   "4-NOT SPECIFIED", "5-LOW"])
    r = wide.to_spark()
    cols = {"1-URGENT": "p1", "2-HIGH": "p2", "3-MEDIUM": "p3",
            "4-NOT SPECIFIED": "p4", "5-LOW": "p5"}
    sel = [F.col("o_custkey")] + [
        F.col(f"`{c}`").cast("long").alias(a) for c, a in cols.items()]
    return r.select(*sel).orderBy("o_custkey")


def streaming_quality_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus curation: the documents stream run through the SAME
    curation expressions as batch (Gopher rules + PII scrub are pure
    column expressions, so they lift to Structured Streaming unchanged) —
    per-source counts of rule-passing docs, redacted-length delta, token
    totals, in one availableNow pass.  Oracle = identical batch SQL."""
    from pandas_expr_spark.functions import curation, text as tx
    from pandas_expr_spark.streaming import stream as st
    src = st.read_stream(
        "parquet", sf_dir,
        schema=spark.read.parquet(f"{sf_dir}/documents.parquet").schema,
        options={"pathGlobFilter": "documents.parquet"})
    injected = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" mail u"), F.col("doc_id").cast("string"),
                        F.lit("@test.org"))).otherwise(F.lit("")))
    d = src.withColumn("t", injected)
    passes = curation.gopher_rules("t")[-1]   # the conjunction column
    enriched = d.select(
        "source", passes,
        tx.token_count("t").alias("ntok"),
        (F.length("t") - F.length(tx.redact_pii("t"))).alias("dl"))
    agg = enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("passes_gopher").cast("long")).alias("n_pass"),
        F.sum("ntok").cast("long").alias("total_tokens"),
        F.sum("dl").cast("long").alias("redacted_delta"))
    with st.state_partitions(8):
        q = st.to_memory_sink(agg, "stream_quality_curation", "complete")
        q.awaitTermination()
    return (spark.table("stream_quality_curation")
            .select("source", "n_docs", "n_pass", "total_tokens",
                    "redacted_delta").orderBy("source"))


def rolling_center_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered rolling window (``rolling(5, center=True)``) over the
    global order — the distributed prefix-difference read at two shifted
    positions (scan.rolling_agg center path), never a global window.
    Integer-cents sum keeps the oracle exact; min_periods default (=w)
    nulls the truncated edges exactly like the SQL COUNT guard."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    o = o.assign(cents=(o.o_totalprice * 100).floor()).set_index("o_orderkey")
    s = o.cents.rolling(5, center=True).sum()
    out = s.to_frame("csum").reset_index()
    r = out.to_spark()
    return (r.select("o_orderkey", F.col("csum").cast("long").alias("csum"))
            .orderBy("o_orderkey"))


def ffill_limit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded forward fill (``ffill(limit=3)``) over the global event
    order — the position-carrying ``last_scan`` (fill distance computed
    against the origin's global position, so cross-partition gaps count
    exactly).  Oracle: LAST_VALUE IGNORE NULLS over a 3-PRECEDING frame."""
    import pandas_expr_spark as pes
    ev = pes.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_id", "value"])
    ev = ev.assign(v=(ev.value * 1000).floor())
    ev = ev.assign(v=ev.v.mask(ev.v % 3 == 0))         # deterministic holes
    s = ev.set_index("event_id").v.ffill(limit=3)
    out = s.to_frame("v_filled").reset_index()
    r = out.to_spark()
    return (r.select("event_id",
                     F.col("v_filled").cast("long").alias("v_filled"))
            .orderBy("event_id"))


def grouped_resample_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby(user).resample('D', on=ts)`` — per-entity calendar
    bucketing as ONE grouped aggregation on (user, day): the group keys
    simply precede the time bucket (no per-group pass, no window).
    ``fill_empty=False`` exercises the explicit SPARSE-output opt-out
    (pandas' filled default is gated by ``resample_gapfill_grouped``).
    Oracle = GROUP BY user, date_trunc."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events")
                        .select("user_id", "ts", "value"))
    ev = ev[ev.user_id < 40]
    ev = ev.assign(vc=(ev.value * 100).floor())
    out = (ev.groupby("user_id").resample("D", on="ts", fill_empty=False)
           .agg(total=("vc", "sum"), n=("vc", "count")).reset_index())
    r = out.to_spark()
    return (r.select("user_id",
                     F.date_format("ts", "yyyy-MM-dd").alias("day"),
                     F.col("total").cast("long").alias("total"),
                     F.col("n").cast("long").alias("n"))
            .orderBy("user_id", "day"))


def training_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-mix pipeline as ONE composed lazy plan:
    Gopher rule filter → exact fingerprint dedup (keep min doc id) →
    deterministic 90% train split → per-source token budget (500) →
    fractional-epoch mixing → per-source stats.  Every stage is the
    already-gated operator (curation/splits/text modules) — this gate
    proves they COMPOSE without materialization barriers; the oracle
    replays the identical SQL stage by stage."""
    from pandas_expr_spark.functions import curation, splits, text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    flags = curation.gopher_rules("text")
    # the synthetic corpus has no stop-word/symbol variance — gate on the
    # two LENGTH rules so the pipeline actually carries rows (the full
    # conjunction is exact-gated separately in doc_gopher_quality)
    passes = flags[2] & flags[3]          # r_word_count & r_mean_len
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    d = (docs.withColumn("__pass__", passes).filter(F.col("__pass__"))
         .withColumn("__fp__", fp))
    w = Window.partitionBy("__fp__")
    deduped = (d.withColumn("__min_id__", F.min("doc_id").over(w))
               .filter(F.col("doc_id") == F.col("__min_id__")))
    train = deduped.filter(splits.hash_bucket("doc_id", salt="split")
                           < 900_000)
    train = train.withColumn("n_tokens",
                             tx.token_count("text").cast("long"))
    # LAZY checkpoint (optimization r8): budget_sample touches its input
    # three times (histogram, full-bucket branch, boundary branch) — the
    # plan showed the whole upstream gopher→dedup-window→split→token
    # pipeline DUPLICATED per branch (2× Window over __fp__, no
    # ReusedExchange).  Checkpointing the train split materializes that
    # pipeline once; the branches read the cache.  Same at 100 TB: one
    # pass + cached reads instead of three full pipeline re-runs.
    train = train.select("doc_id", "source", "n_tokens") \
        .localCheckpoint(eager=False)
    kept = curation.budget_sample(train, 500, token_col="n_tokens",
                                  source_col="source", key_col="doc_id")
    f = (F.lit(0.5) + F.lit(0.25)
         * (F.substring("source", 4, 10).cast("int") % 3))
    mixed = curation.epoch_sample(kept.select("doc_id", "source",
                                              "n_tokens"), f)
    return (mixed.groupBy("source")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"))
            .orderBy("source"))


def doc_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality scoring (``text.unigram_logprob``): corpus
    counts → smoothed token probabilities → per-doc mean log-prob, two
    distributed passes (the KenLM/CCNet perplexity-filter shape with a
    real, exactly-reproducible model).  Oracle replays both passes in
    SQL; values rounded to 4dp (log of identical IEEE ratios)."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    out = tx.unigram_logprob(docs)
    return (out.select("doc_id",
                       F.col("n_tokens").cast("long").alias("n_tokens"),
                       F.round("avg_logprob", 4).alias("avg_logprob"))
            .orderBy("doc_id"))


def doc_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality scoring (``text.bigram_logprob``): corpus
    bigram+unigram counts in one pass → add-k smoothed conditionals →
    per-doc mean log P(w2|w1).  The order-2 sibling of
    ``doc_unigram_ppl``; oracle replays both count tables and the join
    in SQL (bigrams via the same generate_series lateral as the BPE
    oracle)."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    out = tx.bigram_logprob(docs)
    return (out.select("doc_id",
                       F.col("n_bigrams").cast("long").alias("n_bigrams"),
                       F.round("avg_logprob", 4).alias("avg_logprob"))
            .orderBy("doc_id"))


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF document representation (``text.tfidf_terms``) + the most
    characteristic term per document (deterministic max_by on
    (tfidf, term) with ties to the lexicographically smallest term) —
    two agg shuffles + a broadcast IDF join.  Oracle replays TF/DF/IDF
    in SQL."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    t = tx.tfidf_terms(docs)
    # deterministic top term: order by (tfidf desc, term asc) via window
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term").asc())
    top = (t.withColumn("__rn__", F.row_number().over(w))
           .filter(F.col("__rn__") == 1)
           .select("doc_id", F.col("term").alias("top_term"),
                   F.round("tfidf", 4).alias("top_tfidf")))
    stats = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_terms"))
    return (top.join(stats, "doc_id")
            .select("doc_id", "top_term", "top_tfidf",
                    F.col("n_terms").cast("long").alias("n_terms"))
            .orderBy("doc_id"))


def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (``text.bm25_scores``) for a fixed
    3-term query — top-20 documents by (score desc, id asc).  The corpus
    is only ever exploded on the QUERY terms (array_intersect filter),
    never on its full vocabulary; IDF is a broadcast join.  Pairs with
    the ANN embedding gates as the hybrid-search lexical leg."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    out = tx.bm25_scores(docs, ["query", "join", "table"])
    return (out.select("doc_id", F.round("bm25", 4).alias("bm25"),
                       F.col("n_matched").cast("long").alias("n_matched"))
            .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
            .limit(20))


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking ⊕ embedding-cosine ranking
    fused by Reciprocal Rank Fusion (score = Σ 1/(60 + rank)) — the
    standard RAG-retrieval composition, here as ONE plan over the
    already-gated legs.  Both rankings are deterministic (score desc,
    id asc); the oracle replays BM25, cosine, and the fusion in SQL."""
    from pandas_expr_spark.functions import text as tx
    from pandas_expr_spark.sources.tables import load_table
    from pyspark.sql import Window
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = tx.bm25_scores(docs, ["query", "join", "table"])
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex_r = (lex.withColumn("r_lex", F.row_number().over(wl))
             .filter(F.col("r_lex") <= 50).select("doc_id", "r_lex"))

    # deterministic literal query vector (same expression in the oracle)
    qv = [float((i * 37) % 11 - 5) for i in range(64)]
    from pandas_expr_spark.functions.similarity import _cosine, _dot, _norm, _lit_vec
    q = _lit_vec(qv)
    cos = _cosine(_dot("embedding", q), _norm("embedding"), _norm(q))
    wv = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    vec_r = (emb.select(F.col("vec_id").alias("doc_id"),
                        cos.alias("cosine"))
             .withColumn("r_vec", F.row_number().over(wv))
             .filter(F.col("r_vec") <= 50).select("doc_id", "r_vec"))

    fused = (lex_r.join(vec_r, "doc_id", "outer")
             .withColumn("rrf", F.round(
                 F.coalesce(1.0 / (60 + F.col("r_lex")), F.lit(0.0))
                 + F.coalesce(1.0 / (60 + F.col("r_vec")), F.lit(0.0)), 6)))
    return (fused.select("doc_id", "rrf",
                         F.coalesce("r_lex", F.lit(-1)).cast("long")
                         .alias("r_lex"),
                         F.coalesce("r_vec", F.lit(-1)).cast("long")
                         .alias("r_vec"))
            .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
            .limit(10))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

# --------------------------------------------------------------------------
# Round-3 gates: the parameter-guard lifts (DataFrame.mode, extended iloc,
# reindex(index=), corrwith spearman, grouped resample fill_empty) each get
# an exact SQL oracle so the driver can hash-check them.
# --------------------------------------------------------------------------

def mode_frame_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.mode (SURVEY §2.5 Mode, frame-wide): per-column mode sets
    rank-aligned — hash count + broadcast max-count join + distributed
    global_pos per column, outer-joined on rank.  Oracle replicates the
    rank alignment with ROW_NUMBER over each column's max-count values."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_returnflag", "l_linestatus", "l_quantity"]]
    r = li.mode().to_spark()
    return r.select(F.col("__pos__").alias("rk"), "l_returnflag",
                    "l_linestatus",
                    F.col("l_quantity").cast("bigint").alias("l_quantity"))


def iloc_slice_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iloc positive step slice (iloc[100:1000:7]) over the index order —
    one distributed position pass + modular filter, no global sort."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    r = o.iloc[100:1000:7].to_spark()
    return r.select("o_orderkey", "o_totalprice")


def iloc_tail_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iloc negative positions (iloc[-100:-10]): one count resolves the
    offsets, then the same position pass."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    r = o.iloc[-100:-10].to_spark()
    return r.select("o_orderkey", "o_totalprice")


def reindex_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reindex(index=) row alignment: driver-held label list broadcast
    left-joined on the index; absent labels yield null rows."""
    import pandas_expr_spark as pes
    n = pes.read_parquet(f"{sf_dir}/nation.parquet").set_index("n_nationkey")
    r = n.reindex(index=[0, 5, 30, 7, 11]).to_spark()
    return r.select(F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
                    "n_name")


def corrwith_spearman_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corrwith(method='spearman'): pairwise-complete mask + average-tie
    ranks on the distinct-value table, then Pearson on ranks.  Oracle
    computes the same average-tie rank (min rank + (ties-1)/2) with
    window functions."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    f1 = (o[["o_orderkey", "o_totalprice", "o_custkey"]]
          .rename(columns={"o_totalprice": "x", "o_custkey": "y"})
          .set_index("o_orderkey"))
    o2 = o.assign(dom=o.o_orderdate.dt.day)
    o2 = o2.assign(x=o2.dom, y=o2.dom)
    f2 = o2[["o_orderkey", "x", "y"]].set_index("o_orderkey")
    s = f1.corrwith(f2, method="spearman")
    return s.to_spark().select(
        F.col("__cw_idx__").alias("col"),
        F.round(F.col("__cw__"), 6).alias("rho"))


def resample_gapfill_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(user).resample('D', fill_empty=True): per-group calendar
    spine (each group's own min..max) materializes empty daily bins;
    count-like aggs fill 0.  Oracle = per-group generate_series spine."""
    import pandas_expr_spark as pes
    from pandas_expr_spark.sources.tables import load_table
    ev = pes.from_spark(load_table(spark, sf_dir, "events")
                        .select("user_id", "ts", "value"))
    ev = ev[ev.user_id < 20]
    out = (ev.groupby("user_id").resample("D", "ts", fill_empty=True)
           .agg(n=("value", "count")).reset_index())
    r = out.to_spark()
    return (r.select("user_id",
                     F.date_format("ts", "yyyy-MM-dd").alias("day"),
                     F.col("n").cast("bigint").alias("n"))
            .orderBy("user_id", "day"))


def rolling_corr_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rolling(20).corr between two order columns over the key order —
    the pairwise-moment path (one shared prefix scan + one position
    join, ``_SeriesRolling._pairwise``) vs DuckDB's window ``corr`` with
    the pandas min-periods guard."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    r = o["o_totalprice"].rolling(20).corr(o["o_custkey"])
    # `+ 0.0` normalizes signed zero: Spark's F.round (BigDecimal) emits
    # +0.0 for tiny negatives while DuckDB's round keeps -0.0, and the
    # driver hashes stringified values (IEEE: -0.0 + 0.0 = +0.0).
    return (r.to_frame("c").reset_index().to_spark()
            .select("o_orderkey",
                    (F.round(F.col("c"), 4) + F.lit(0.0)).alias("corr20")))


def rank_naopt_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.rank(na_option=top/bottom, method=average) on a column with
    DETERMINISTICALLY injected nulls (event_id % 7 — identical expression
    in both engines).  Oracle: avg(row_number) over the value partition
    with NULLS FIRST/LAST ordering — exactly pandas' average-tie rank
    with nulls pinned to the chosen end."""
    import pandas_expr_spark as pes
    ev = pes.read_parquet(f"{sf_dir}/events.parquet").set_index("event_id")
    masked = ev["value"].mask((ev.index % 7) == 0)
    top = masked.rank(method="average", na_option="top")
    bot = masked.rank(method="average", na_option="bottom")
    out = top.to_frame("rank_top").reset_index().to_spark().join(
        bot.to_frame("rank_bottom").reset_index().to_spark(), "event_id")
    return out.select("event_id", F.round("rank_top", 2).alias("rank_top"),
                      F.round("rank_bottom", 2).alias("rank_bottom"))


def factorize_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ``Series.factorize``: codes by order of first appearance
    over the o_orderkey index — one ranged position pass + a groupBy-min
    over DISTINCT values (the only window runs on uniques, never the
    data) + one equi-join back.  Oracle replays the same first-appearance
    dense coding with a rank over the per-value min key."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    codes, _uniques = o.o_orderpriority.factorize()
    r = codes.to_frame("code").reset_index().to_spark()
    return r.select(F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
                    F.col("code").cast("bigint").alias("code"))


def asof_lookup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.asof`` with a key list: last row at-or-before each key —
    ONE broadcast range-join + grouped max_by, never a sort of the big
    side.  A key below the index minimum yields the pandas all-NaN row."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    keys = [0, 10, 500, 123456, 99999999]
    r = o[["o_totalprice"]].asof(keys).to_spark()
    return r.select(F.col("__where__").cast("bigint").alias("k"),
                    F.round("o_totalprice", 2).alias("price"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# round-7: positional-label parity gates (VERDICT r6 #1) — the in-scan
# label machinery (parquet `_metadata.row_index` + footer offsets,
# promoted to the index by bare filter/dropna/tail) checked VALUE-EXACT:
# reset_index() materializes the original row positions as a column the
# SQL oracle reproduces with row_number() over the parquet natural order.
# ---------------------------------------------------------------------------
def filter_label_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare boolean filter keeps pandas' ORIGINAL positional labels
    (reference executes `df[mask]` with pandas label preservation,
    `_expr.py:1355-1363`).  Labels come from the scan itself — predicate
    pushdown intact (PLANS_r7 pin)."""
    import pandas_expr_spark as pes
    li = pes.read_parquet(f"{sf_dir}/lineitem.parquet")
    f = li[li.l_quantity > 48].reset_index()
    out = f[["index", "l_orderkey", "l_quantity"]].rename(
        columns={"index": "orig_pos"})
    return out.to_spark()


def dropna_label_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropna(subset=) keeps original labels; the null column is derived
    (TPC-H has no nulls) via where(), which preserves label validity."""
    import pandas_expr_spark as pes
    c = pes.read_parquet(f"{sf_dir}/customer.parquet")
    c2 = c.assign(bal=c.c_acctbal.where(c.c_acctbal > 0))
    f = c2.dropna(subset=["bal"]).reset_index()
    out = f[["index", "c_custkey", "bal"]].rename(
        columns={"index": "orig_pos"})
    return out.to_spark()


def tail_label_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tail(n) on an unsorted scan keeps the last-n ORIGINAL labels —
    the in-scan label is both the reverse-TopK order column and the
    surviving index (no stamp, no count action)."""
    import pandas_expr_spark as pes
    o = pes.read_parquet(f"{sf_dir}/orders.parquet")
    t = o.tail(40).reset_index()
    out = t[["index", "o_orderkey", "o_totalprice"]].rename(
        columns={"index": "orig_pos"})
    return out.to_spark()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver checks the FIRST 50 entries per round.
    # r8 window: 1-2 the NEW r8 gates (name scrub + stamp-vs-rowid,
    # no driver row yet), 3 the rows-only->exact GD conversion's first
    # exact driver row, 4-8 gates whose machinery changed this round
    # (value_counts tie order / rolling _base rewrite / explode stamp
    # carry), 9-50 the freshness rotation onto gates whose newest
    # driver-green row predates r5 (42 such slots — VERDICT r7 #5
    # asked for >=20).  The tail keeps the prior order.
    return {
        # ---- r8 positions 1-8: new gates + changed machinery ----
        "unnamed_vc_reset_names": unnamed_vc_reset_names,
        "stamped_rank_orders": stamped_rank_orders,
        "trained_quality_scorer": trained_quality_scorer,
        "value_counts_priority": value_counts_priority,
        "rank_bucket_orders": rank_bucket_orders,
        "explode_tokens": explode_tokens,
        "rolling_center_orders": rolling_center_orders,
        "rolling_revenue_orders": rolling_revenue_orders,
        # ---- r8 positions 9-50: oldest-evidence rotation (pre-r5) ----
        "ngram_jaccard_dups": ngram_jaccard_dups,
        "simhash_planted_dups": simhash_planted_dups,
        "similarity_topk": similarity_topk,
        "embedding_cosine_pairs": embedding_cosine_pairs,
        "multimodal_meta": multimodal_meta,
        "udtf_chunk_documents": udtf_chunk_documents,
        "pack_sequences_documents": pack_sequences_documents,
        "doc_repetition": doc_repetition,
        "hash_split_documents": hash_split_documents,
        "clean_corpus_pipeline": clean_corpus_pipeline,
        "doc_pii_redaction": doc_pii_redaction,
        "doc_decontaminate": doc_decontaminate,
        "embedding_kmeans": embedding_kmeans,
        "doc_gopher_quality": doc_gopher_quality,
        "mix_budget_sources": mix_budget_sources,
        "semdedup_embeddings": semdedup_embeddings,
        "epoch_mix_sources": epoch_mix_sources,
        "between_time_events": between_time_events,
        "pivot_customer_priority": pivot_customer_priority,
        "streaming_quality_curation": streaming_quality_curation,
        "ffill_limit_events": ffill_limit_events,
        "grouped_resample_user_daily": grouped_resample_user_daily,
        "training_mix_pipeline": training_mix_pipeline,
        "doc_unigram_ppl": doc_unigram_ppl,
        "doc_tfidf_top_terms": doc_tfidf_top_terms,
        "doc_bm25_search": doc_bm25_search,
        "hybrid_search_rrf": hybrid_search_rrf,
        "top_tokens_documents": top_tokens_documents,
        "cube_pricing": cube_pricing,
        "mode_quantity": mode_quantity,
        "replace_dropna_priorities": replace_dropna_priorities,
        "window_diff_pct_orders": window_diff_pct_orders,
        "streaming_stateful_running": streaming_stateful_running,
        "events_sliding_windows": events_sliding_windows,
        "math_abs_clip_floor": math_abs_clip_floor,
        "value_counts_normalized": value_counts_normalized,
        "cross_join_flags": cross_join_flags,
        "merge_indicator_nations": merge_indicator_nations,
        "shift_diff_order_prices": shift_diff_order_prices,
        "cumsum_running_revenue": cumsum_running_revenue,
        "align_add_balances": align_add_balances,
        "skew_sem_prices": skew_sem_prices,
        # ---- beyond the window: prior rotation order preserved ----
        "filter_label_parity": filter_label_parity,
        "dropna_label_parity": dropna_label_parity,
        "tail_label_parity": tail_label_parity,
        "bpe_encode_documents": bpe_encode_documents,
        "fuzzy_dup_pairs_edit": fuzzy_dup_pairs_edit,
        "sample_fraction_lineitem": sample_fraction_lineitem,
        "nunique_approx_custkeys": nunique_approx_custkeys,
        "doc_dedup_pipeline": doc_dedup_pipeline,
        "doc_link_pagerank": doc_link_pagerank,
        "concat_union": concat_union,
        "concat_inner_lineitem": concat_inner_lineitem,
        "concat_axis1_nation_stats": concat_axis1_nation_stats,
        "intersect_except_nations": intersect_except_nations,
        "period_month_revenue": period_month_revenue,
        "factorize_priority_orders": factorize_priority_orders,
        "melt_customer_metrics": melt_customer_metrics,
        "nlargest_parts": nlargest_parts,
        "duplicated_parts": duplicated_parts,
        "filter_project": filter_project,
        "isin_between": isin_between,
        "embedding_ann_lsh": embedding_ann_lsh,
        "embedding_ann_ivf": embedding_ann_ivf,
        "top_orders": top_orders,
        "sort_limit_customers": sort_limit_customers,
        "tail_orders": tail_orders,
        "head_sorted_nations": head_sorted_nations,
        "iloc_tail_orders": iloc_tail_orders,
        "distinct_flags": distinct_flags,
        "q12_priority_shipping": q12_priority_shipping,
        "events_sessions": events_sessions,
        "doc_token_stats": doc_token_stats,
        "streaming_hourly_events": streaming_hourly_events,
        "streaming_sliding_events": streaming_sliding_events,
        "streaming_sessions_users": streaming_sessions_users,
        "streaming_view_purchase_join": streaming_view_purchase_join,
        "streaming_dedup_users": streaming_dedup_users,
        "streaming_enriched_segments": streaming_enriched_segments,
        "asof_join_events": asof_join_events,
        "asof_nearest_events": asof_nearest_events,
        "interval_join_shipments": interval_join_shipments,
        "window_lag_cumsum_orders": window_lag_cumsum_orders,
        "rolling_expanding_orders": rolling_expanding_orders,
        "rolling_minmax_orders": rolling_minmax_orders,
        "ewm_price_per_customer": ewm_price_per_customer,
        "groupby_topn_orders": groupby_topn_orders,
        "grouped_apply_demean": grouped_apply_demean,
        "groupby_nunique_median": groupby_nunique_median,
        "ffill_event_values": ffill_event_values,
        "rollup_pricing": rollup_pricing,
        "resample_daily_events": resample_daily_events,
        "stack_nation_counts": stack_nation_counts,
        "unstack_segment_counts": unstack_segment_counts,
        "pivot_status_priority": pivot_status_priority,
        "map_dict_flags": map_dict_flags,
        "apply_udf_name_len": apply_udf_name_len,
        "combine_first_balances": combine_first_balances,
        "dedup_keep_first_orders": dedup_keep_first_orders,
        "idx_extremes_orders": idx_extremes_orders,
        "quantile_prices": quantile_prices,
        "corr_matrix_lineitem": corr_matrix_lineitem,
        "cat_codes_segments": cat_codes_segments,
        "doc_lang_id": doc_lang_id,
        "minhash_near_dup_pairs": minhash_near_dup_pairs,
        "simhash_near_dups": simhash_near_dups,
        "multimodal_features": multimodal_features,
        "stratified_sample_docs": stratified_sample_docs,
        "grouping_sets_pricing": grouping_sets_pricing,
        "resample_gapfill_user": resample_gapfill_user,
        "describe_quantity": describe_quantity,
        "cut_quantity_bins": cut_quantity_bins,
        "get_dummies_segments": get_dummies_segments,
        "groupby_filter_rows": groupby_filter_rows,
        "groupby_ohlc_orders": groupby_ohlc_orders,
        "interpolate_event_values": interpolate_event_values,
        "asfreq_hourly_user": asfreq_hourly_user,
        "ffill_global_events": ffill_global_events,
        "doc_incremental_dedup": doc_incremental_dedup,
        "streaming_dedup_ingest": streaming_dedup_ingest,
        "mode_frame_lineitem": mode_frame_lineitem,
        "iloc_slice_orders": iloc_slice_orders,
        "reindex_nation_keys": reindex_nation_keys,
        "corrwith_spearman_orders": corrwith_spearman_orders,
        "resample_gapfill_grouped": resample_gapfill_grouped,
        "doc_dup_windows": doc_dup_windows,
        "doc_line_dedup": doc_line_dedup,
        "rank_naopt_events": rank_naopt_events,
        "multimodal_pixel_stats": multimodal_pixel_stats,
        "multimodal_audio_stats": multimodal_audio_stats,
        "bpe_top_pairs_documents": bpe_top_pairs_documents,
        "bpe_learn_documents": bpe_learn_documents,
        "doc_length_outliers": doc_length_outliers,
        "zipf_slope_tokens": zipf_slope_tokens,
        "url_normalize_docs": url_normalize_docs,
        "url_dedup_docs": url_dedup_docs,
        "cap_per_source_docs": cap_per_source_docs,
        "groupby_sample_frac_orders": groupby_sample_frac_orders,
        "temperature_mix_sources": temperature_mix_sources,
        "dsir_select_docs": dsir_select_docs,
        "rolling_time_daily_events": rolling_time_daily_events,
        "knn_join_embeddings": knn_join_embeddings,
        "asof_lookup_orders": asof_lookup_orders,
        "q1_pricing_summary": q1_pricing_summary,
        "minhash_verified_dups": minhash_verified_dups,
        "embedding_near_dup_lsh": embedding_near_dup_lsh,
        "doc_dup_components": doc_dup_components,
        "grouped_rolling_orders": grouped_rolling_orders,
        "eval_query_charges": eval_query_charges,
        "crosstab_status_priority": crosstab_status_priority,
        "rolling_corr_orders": rolling_corr_orders,
        "doc_bigram_ppl": doc_bigram_ppl,
        "embedding_ann_exactprobe": embedding_ann_exactprobe,
        "logit_first_step": logit_first_step,
        "kll_doclen_quantiles": kll_doclen_quantiles,
        "audience_overlap_events": audience_overlap_events,
        "q3_topk_revenue": q3_topk_revenue,
        "q5_region_revenue": q5_region_revenue,
        "q4_order_priority": q4_order_priority,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q10_returned_items": q10_returned_items,
        "q14_promo_revenue": q14_promo_revenue,
        "q18_large_volume": q18_large_volume,
        "q19_disjunctive_pred": q19_disjunctive_pred,
        "q7_volume_shipping": q7_volume_shipping,
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
        "q13_customer_distribution": q13_customer_distribution,
        "q15_top_supplier": q15_top_supplier,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q11_important_stock": q11_important_stock,
        "q16_parts_supplier": q16_parts_supplier,
        "q17_small_qty_revenue": q17_small_qty_revenue,
        "q20_excess_suppliers": q20_excess_suppliers,
        "q21_waiting_suppliers": q21_waiting_suppliers,
        "q22_global_sales": q22_global_sales,
        "assign_eval_disc_price": assign_eval_disc_price,
        "join_part_lineitem": join_part_lineitem,
        "outer_join_fillna": outer_join_fillna,
        "semi_join_customers": semi_join_customers,
        "anti_join_customers": anti_join_customers,
        "groupby_agg_multi": groupby_agg_multi,
        "groupby_having": groupby_having,
        "window_rank_orders": window_rank_orders,
        "groupby_transform_share": groupby_transform_share,
        "reductions_scalar": reductions_scalar,
        "astype_cast_counts": astype_cast_counts,
        "case_when_bucket": case_when_bucket,
        "str_ops_customers": str_ops_customers,
        "dt_ops_orders": dt_ops_orders,
        "events_hourly": events_hourly,
        "events_json_props": events_json_props,
        "doc_fingerprint_dedup": doc_fingerprint_dedup,
        "doc_exact_dedup_count": doc_exact_dedup_count,
        "doc_quality": doc_quality,
    }


_AUG_CTE = """
WITH aug AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id < 50
)
"""

_FP = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

_STOPWORDS_SQL = "['the','a','of','to','and','is','in','it','that','for']"

_LANG_SCORE = ("len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
               "t -> list_contains({words}, t)))")


def _bpe_learn_oracle_sql(n_merges: int = 8) -> str:
    """Unrolled DuckDB twin of ``bpe.learn_bpe`` (deterministic, so exact).

    Words are carried as sentinel-delimited symbol strings
    (``\\x01sym\\x02`` per symbol — the corpus is verified free of control
    chars, so boundaries can't be forged); each iteration re-counts
    adjacent pairs from the extracted symbol list, takes the argmax with
    the engine's exact tie-break (count desc, left asc, right asc), and
    applies the merge with left-to-right non-overlapping ``replace`` —
    the same greedy scan as the engine's JVM ``aggregate`` fold."""
    parts = ["""w0 AS (
      SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g')
             || chr(1) || '</w>' || chr(2) AS s,
             SUM(c)::BIGINT AS freq
      FROM (SELECT word, COUNT(*) AS c
            FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word)
      GROUP BY 1)"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""p{i} AS (
          SELECT l, r, SUM(freq)::BIGINT AS c FROM (
            SELECT freq, syms[i] AS l, syms[i+1] AS r
            FROM (SELECT freq,
                         regexp_extract_all(s, '\\x01([^\\x02]*)\\x02', 1) AS syms
                  FROM w{i - 1}),
                 UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
          ) GROUP BY l, r)""")
        parts.append(f"""m{i} AS (SELECT {i - 1}::BIGINT AS rank, l, r,
                            l || r AS merged, c
                     FROM p{i} ORDER BY c DESC, l, r LIMIT 1)""")
        if i < n_merges:
            parts.append(f"""w{i} AS (
              SELECT replace(s, chr(1)||l||chr(2)||chr(1)||r||chr(2),
                             chr(1)||l||r||chr(2)) AS s, freq
              FROM w{i - 1}, m{i})""")
    union = " UNION ALL ".join(f"SELECT * FROM m{i}"
                               for i in range(1, n_merges + 1))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT rank, l AS left, r AS right, merged, c AS pair_count"
              f" FROM ({union}) ORDER BY rank")


def _bpe_encode_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB twin of ``bpe.encode_bpe`` over learned merges (exact).

    Re-learns the same ``n_merges`` merges (the ``_bpe_learn_oracle_sql``
    CTE chain — deterministic), then re-encodes each doc's words by replaying
    the merges in rank order with the same sentinel ``replace`` steps the
    learn oracle uses (left-to-right non-overlapping — identical greedy
    scan to ``merge_word_py``/the JVM fold).  Token streams compared
    verbatim per document."""
    # rebuild the learn CTEs, including the final w{n} (not needed by the
    # learn oracle but harmless) — copy of the generator above
    parts = ["""w0 AS (
      SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g')
             || chr(1) || '</w>' || chr(2) AS s,
             SUM(c)::BIGINT AS freq
      FROM (SELECT word, COUNT(*) AS c
            FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word)
      GROUP BY 1)"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""p{i} AS (
          SELECT l, r, SUM(freq)::BIGINT AS c FROM (
            SELECT freq, syms[i] AS l, syms[i+1] AS r
            FROM (SELECT freq,
                         regexp_extract_all(s, '\\x01([^\\x02]*)\\x02', 1) AS syms
                  FROM w{i - 1}),
                 UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
          ) GROUP BY l, r)""")
        parts.append(f"""m{i} AS (SELECT {i - 1}::BIGINT AS rank, l, r,
                            l || r AS merged, c
                     FROM p{i} ORDER BY c DESC, l, r LIMIT 1)""")
        if i < n_merges:
            parts.append(f"""w{i} AS (
              SELECT replace(s, chr(1)||l||chr(2)||chr(1)||r||chr(2),
                             chr(1)||l||r||chr(2)) AS s, freq
              FROM w{i - 1}, m{i})""")
    # per-doc word stream in order, then the same replace chain
    parts.append("""e0 AS (
      SELECT doc_id, i AS pos,
             regexp_replace(ws[i], '(.)', chr(1) || '\\1' || chr(2), 'g')
             || chr(1) || '</w>' || chr(2) AS s
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(text), '\\s+') AS ws
            FROM documents),
           UNNEST(generate_series(1, len(ws))) AS t(i)
      WHERE ws[i] <> '')""")
    for i in range(1, n_merges + 1):
        parts.append(f"""e{i} AS (
          SELECT doc_id, pos,
                 replace(s, chr(1)||l||chr(2)||chr(1)||r||chr(2),
                         chr(1)||l||r||chr(2)) AS s
          FROM e{i - 1}, m{i})""")
    parts.append(f"""tok AS (
      SELECT doc_id, pos,
             regexp_extract_all(s, '\\x01([^\\x02]*)\\x02', 1) AS syms
      FROM e{n_merges})""")
    return ("WITH " + ",\n".join(parts) + """
        SELECT doc_id,
               SUM(len(syms))::BIGINT AS n_tokens,
               string_agg(array_to_string(syms, ' '), ' ' ORDER BY pos)
                   AS token_text
        FROM tok GROUP BY doc_id""")


_GD_FEATS_CTE = """
    WITH f AS (
        SELECT CAST(lang = 'en' AS DOUBLE) AS y,
               (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                     THEN CAST(len(list_filter(
                            regexp_split_to_array(trim(text), '\\s+'),
                            x -> list_contains(
                                ['the','a','of','to','and','is','in','it','that','for'],
                                lower(x)))) AS DOUBLE)
                          / len(regexp_split_to_array(trim(text), '\\s+'))
                     ELSE 0.0 END) AS f_stop,
               CAST(len(list_filter(
                        list_transform(
                            regexp_split_to_array(trim(text), '\\s+'),
                            x -> lower(x)),
                        t -> list_contains(['the','and','of','to','is'], t)))
                    AS DOUBLE)
                 / (len(regexp_split_to_array(trim(text), '\\s+')) + 1)
                   AS f_en,
               ln(1 + length(text)) - 6.0 AS f_loglen
        FROM documents
    )"""


def _gd_unrolled_sql(iters: int = 5, lr: float = 2.0) -> str:
    """Unrolled fixed-iteration batch-GD logistic regression as nested
    DuckDB CTEs — the exact-oracle pattern proven on PageRank
    (``doc_link_pagerank``): replay the SAME float ops in the SAME
    per-iteration structure; the 2-dp output rounding absorbs the
    distributed-vs-serial summation-order eps."""
    parts = [_GD_FEATS_CTE,
             ", w0 AS (SELECT 0.0 AS b, 0.0 AS ws, 0.0 AS we, 0.0 AS wl)"]
    for t in range(1, iters + 1):
        z = (f"(w{t-1}.b + w{t-1}.ws * f_stop + w{t-1}.we * f_en"
             f" + w{t-1}.wl * f_loglen)")
        p = f"(1.0 / (1.0 + exp(-{z})))"
        parts.append(f"""
    , g{t} AS (
        SELECT AVG({p} - y) AS gb,
               AVG(({p} - y) * f_stop) AS gs,
               AVG(({p} - y) * f_en) AS ge,
               AVG(({p} - y) * f_loglen) AS gl
        FROM f, w{t-1})""")
        parts.append(f"""
    , w{t} AS (
        SELECT w{t-1}.b - {lr} * g{t}.gb AS b,
               w{t-1}.ws - {lr} * g{t}.gs AS ws,
               w{t-1}.we - {lr} * g{t}.ge AS we,
               w{t-1}.wl - {lr} * g{t}.gl AS wl
        FROM w{t-1}, g{t})""")
    zf = (f"(w{iters}.b + w{iters}.ws * f_stop + w{iters}.we * f_en"
          f" + w{iters}.wl * f_loglen)")
    parts.append(f"""
    SELECT y AS label, COUNT(*) AS n,
           ROUND(AVG(1.0 / (1.0 + exp(-{zf}))), 2) AS avg_p
    FROM f, w{iters}
    GROUP BY y ORDER BY y""")
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    s_de = _LANG_SCORE.format(words="['der','die','und','das','ist']")
    s_en = _LANG_SCORE.format(words="['the','and','of','to','is']")
    s_es = _LANG_SCORE.format(words="['el','la','de','que','y']")
    s_fr = _LANG_SCORE.format(words="['le','la','et','les','des']")
    return {
        # r5 rows-only → exact conversions: at the gate SF both sketches
        # are in exact mode (KLL k=800 never compacts over <=218-row
        # groups; theta keeps all <4096 hashes), so the sketch outputs
        # ARE the exact order statistics / distinct-intersection counts.
        "kll_doclen_quantiles": """
            SELECT lang,
                   CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS q50,
                   CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS q90,
                   CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS q99
            FROM documents GROUP BY lang
        """,
        "audience_overlap_events": """
            WITH d AS (SELECT DISTINCT event_type, user_id FROM events
                       WHERE value > 75),
            n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY event_type)
            SELECT a.event_type AS seg_a, b.event_type AS seg_b,
                   na.n AS n_a, nb.n AS n_b,
                   CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            JOIN n na ON na.event_type = a.event_type
            JOIN n nb ON nb.event_type = b.event_type
            GROUP BY 1, 2, 3, 4
        """,
        "mode_frame_lineitem": """
            WITH qa AS (SELECT l_returnflag v, COUNT(*) n FROM lineitem
                        GROUP BY 1),
            ra AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 rk FROM qa
                   WHERE n = (SELECT MAX(n) FROM qa)),
            qb AS (SELECT l_linestatus v, COUNT(*) n FROM lineitem
                   GROUP BY 1),
            rb AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 rk FROM qb
                   WHERE n = (SELECT MAX(n) FROM qb)),
            qc AS (SELECT l_quantity v, COUNT(*) n FROM lineitem GROUP BY 1),
            rc AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 rk FROM qc
                   WHERE n = (SELECT MAX(n) FROM qc)),
            ks AS (SELECT rk FROM ra UNION SELECT rk FROM rb
                   UNION SELECT rk FROM rc)
            SELECT ks.rk, ra.v AS l_returnflag, rb.v AS l_linestatus,
                   CAST(rc.v AS BIGINT) AS l_quantity
            FROM ks LEFT JOIN ra USING (rk) LEFT JOIN rb USING (rk)
                    LEFT JOIN rc USING (rk)
        """,
        "iloc_slice_orders": """
            WITH r AS (SELECT o_orderkey, o_totalprice,
                              ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 rn
                       FROM orders)
            SELECT o_orderkey, o_totalprice FROM r
            WHERE rn >= 100 AND rn < 1000 AND (rn - 100) % 7 = 0
        """,
        "doc_length_outliers": """
            WITH st AS (SELECT source,
                               quantile_cont(n_chars, 0.25) AS q1,
                               quantile_cont(n_chars, 0.75) AS q3
                        FROM documents GROUP BY source)
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN d.n_chars < st.q1 - 1.5*(st.q3-st.q1)
                                   OR d.n_chars > st.q3 + 1.5*(st.q3-st.q1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   ROUND(MIN(st.q1 - 1.5*(st.q3-st.q1)), 4) AS lo,
                   ROUND(MIN(st.q3 + 1.5*(st.q3-st.q1)), 4) AS hi
            FROM documents d JOIN st USING (source)
            GROUP BY d.source ORDER BY d.source
        """,
        "zipf_slope_tokens": """
            WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token
                         FROM documents),
            cnt AS (SELECT token, COUNT(*) AS freq FROM tok
                    WHERE token <> '' GROUP BY token),
            top AS (SELECT token, freq FROM cnt
                    ORDER BY freq DESC, token LIMIT 100),
            r AS (SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank,
                         freq FROM top),
            s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                         SUM(LN(rank)) AS sx, SUM(LN(freq)) AS sy,
                         SUM(LN(rank)*LN(rank)) AS sxx,
                         SUM(LN(freq)*LN(freq)) AS syy,
                         SUM(LN(rank)*LN(freq)) AS sxy
                  FROM r)
            SELECT CAST(n AS BIGINT) AS n_tokens_ranked,
                   ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS zipf_slope,
                   ROUND(((n*sxy - sx*sy)*(n*sxy - sx*sy))
                         / ((n*sxx - sx*sx)*(n*syy - sy*sy)), 4) AS zipf_r2
            FROM s
        """,
        "url_normalize_docs": """
            -- The oracle never parses the messy URL: it recomputes the
            -- CANONICAL form from the same doc_id arithmetic the Spark
            -- side used to SYNTHESIZE the messy one, so a hash match
            -- proves every normalization rule end-to-end.
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END
                    || '://site' || CAST(doc_id % 97 AS VARCHAR)
                    || CASE doc_id % 4
                         WHEN 0 THEN '.example.com'
                         WHEN 1 THEN '.news.co.uk'
                         WHEN 2 THEN '.blog.org'
                         ELSE '.shop.net' END
                    || CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END
                    || '/p/' || CAST(doc_id % 13 AS VARCHAR)
                    || CASE WHEN doc_id % 2 = 0
                            THEN '?a=1&b=' || CAST(doc_id % 10 AS VARCHAR)
                            ELSE '?z=9' END) AS norm_url,
                   CASE doc_id % 4
                     WHEN 0 THEN 'example.com'
                     WHEN 1 THEN 'news.co.uk'
                     WHEN 2 THEN 'blog.org'
                     ELSE 'shop.net' END AS domain
            FROM documents ORDER BY doc_id
        """,
        "url_dedup_docs": """
            WITH k AS (SELECT doc_id, n_chars, doc_id % 50 AS g
                       FROM documents),
            w AS (SELECT g, doc_id, n_chars,
                         ROW_NUMBER() OVER (PARTITION BY g
                             ORDER BY n_chars DESC, doc_id) AS rn,
                         COUNT(*) OVER (PARTITION BY g) AS cnt
                  FROM k)
            SELECT 'https://d' || CAST(g AS VARCHAR) || '.example.com/x'
                       AS norm_url,
                   doc_id AS kept_doc_id,
                   n_chars AS kept_n_chars,
                   CAST(cnt AS BIGINT) AS url_dup_count
            FROM w WHERE rn = 1 ORDER BY norm_url
        """,
        "temperature_mix_sources": """
            WITH h AS (SELECT source, COUNT(*) AS n FROM documents
                       GROUP BY source),
            c AS (SELECT source,
                         LEAST(n, CAST(roundbankers(3.0 * sqrt(n), 0)
                                       AS BIGINT)) AS cap
                  FROM h),
            r AS (SELECT d.source, d.doc_id,
                         ROW_NUMBER() OVER (PARTITION BY d.source
                             ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                      d.doc_id) AS rn
                  FROM documents d)
            SELECT r.source,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum
            FROM r JOIN c USING (source) WHERE rn <= c.cap
            GROUP BY r.source ORDER BY r.source
        """,
        "dsir_select_docs": r"""
            WITH tok AS (
                SELECT doc_id, lang,
                       regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents
            ), uni AS (
                SELECT doc_id, lang, unnest(ws) AS g FROM tok
            ), bi AS (
                SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS g
                FROM tok, unnest(generate_series(1, len(ws)-1)) AS u(i)
            ), grams AS (
                SELECT doc_id, lang,
                       CAST(concat('0x', substring(md5(g), 1, 8)) AS BIGINT)
                       % 4096 AS b
                FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
            ), feats AS (
                SELECT doc_id, b, COUNT(*) AS c FROM grams GROUP BY 1, 2
            ), q AS (
                SELECT b, COUNT(*) AS qc FROM grams GROUP BY b
            ), p AS (
                SELECT b, COUNT(*) AS pc FROM grams
                WHERE lang = 'en' GROUP BY b
            ), tots AS (
                SELECT (SELECT SUM(qc) FROM q) + 1.0 * 4096 AS qd,
                       (SELECT COALESCE(SUM(pc), 0) FROM p) + 1.0 * 4096
                       AS pdn
            ), llr AS (
                SELECT COALESCE(q.b, p.b) AS b,
                       ln((COALESCE(pc, 0) + 1.0) / pdn)
                       - ln((COALESCE(qc, 0) + 1.0) / qd) AS v
                FROM q FULL OUTER JOIN p USING (b), tots
            ), w AS (
                SELECT doc_id, ROUND(SUM(c * v), 4) AS logw
                FROM feats JOIN llr USING (b) GROUP BY doc_id
            )
            SELECT doc_id, logw FROM w
            ORDER BY logw DESC, doc_id LIMIT 100
        """,
        "knn_join_embeddings": """
            WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 20),
            s AS (
                SELECT q.qid, c.vec_id AS nid,
                       list_dot_product(c.v, q.qv)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS cos
                FROM q, c
            )
            SELECT qid AS vec_id, nid AS neighbor_id,
                   ROUND(cos, 4) AS cosine
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY qid ORDER BY cos DESC, nid) AS rn
                  FROM s)
            WHERE rn <= 5
        """,
        "rolling_time_daily_events": """
            WITH daily AS (
                SELECT date_trunc('day', ts) AS d,
                       COUNT(*) AS n,
                       SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v_c
                FROM events GROUP BY 1
            )
            SELECT strftime(d, '%Y-%m-%d') AS day,
                   CAST(SUM(n) OVER w AS BIGINT) AS n3,
                   SUM(v_c) OVER w / 100.0 AS v3
            FROM daily
            WINDOW w AS (ORDER BY d
                         RANGE BETWEEN INTERVAL 2 DAY PRECEDING
                         AND CURRENT ROW)
        """,
        "groupby_sample_frac_orders": """
            WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
                              ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                           o_orderkey) AS rn,
                              COUNT(*) OVER (PARTITION BY o_orderpriority)
                                  AS cnt
                       FROM orders)
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) AS price_sum
            FROM r WHERE rn <= roundbankers(cnt * 0.25, 0)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "cap_per_source_docs": """
            WITH r AS (SELECT source, doc_id,
                              ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
                       FROM documents)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum
            FROM r WHERE rn <= 10 GROUP BY source ORDER BY source
        """,
        "bpe_top_pairs_documents": """
            WITH words AS (
                SELECT w, COUNT(*) AS freq FROM (
                    SELECT unnest(string_split(lower(text), ' ')) AS w
                    FROM documents) t
                WHERE w <> '' GROUP BY w),
            p AS (
                SELECT words.freq,
                       substr(words.w, j.j, 1) AS l,
                       CASE WHEN j.j < length(words.w)
                            THEN substr(words.w, j.j + 1, 1)
                            ELSE '</w>' END AS r
                FROM words
                JOIN generate_series(1, 64) j(j) ON j.j <= length(words.w))
            SELECT l AS left, r AS right,
                   CAST(SUM(freq) AS BIGINT) AS pair_count
            FROM p GROUP BY l, r
            ORDER BY pair_count DESC, l, r LIMIT 15
        """,
        "multimodal_pixel_stats": """
            WITH dims AS (SELECT doc_id AS media_id,
                                 (8 + doc_id % 8) AS w,
                                 (6 + doc_id % 5) AS h
                          FROM documents),
            px AS (SELECT d.media_id, d.w, d.h,
                          ((d.media_id * 7 + i.i * 13) % 256) AS v
                   FROM dims d
                   JOIN generate_series(0, 449) i(i) ON i.i < d.w * d.h * 3)
            SELECT media_id,
                   CAST(w AS BIGINT) AS width,
                   CAST(h AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS channels,
                   ROUND(AVG(v), 4) AS mean_px,
                   CAST(MIN(v) AS BIGINT) AS min_px,
                   CAST(MAX(v) AS BIGINT) AS max_px
            FROM px GROUP BY media_id, w, h ORDER BY media_id
        """,
        "multimodal_audio_stats": """
            WITH base AS (SELECT doc_id AS media_id,
                                 (1000 + doc_id % 50) AS n
                          FROM documents),
            s AS (SELECT b.media_id, b.n,
                         ((((b.media_id + 3 * j.j) % 256) - 128) / 256.0) AS v
                  FROM base b JOIN generate_series(0, 1049) j(j) ON j.j < b.n)
            SELECT media_id,
                   CAST(8000 AS BIGINT) AS sample_rate,
                   CAST(n AS BIGINT) AS n_frames,
                   ROUND(n / 8000.0, 4) AS duration_s,
                   ROUND(SQRT(AVG(v * v)), 4) AS rms
            FROM s GROUP BY media_id, n ORDER BY media_id
        """,
        "iloc_tail_orders": """
            WITH r AS (SELECT o_orderkey, o_totalprice,
                              ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 rn,
                              COUNT(*) OVER () n
                       FROM orders)
            SELECT o_orderkey, o_totalprice FROM r
            WHERE rn >= n - 100 AND rn < n - 10
        """,
        "reindex_nation_keys": """
            SELECT CAST(v.k AS BIGINT) AS n_nationkey, n.n_name
            FROM (VALUES (0), (5), (30), (7), (11)) AS v(k)
            LEFT JOIN nation n ON n.n_nationkey = v.k
        """,
        "corrwith_spearman_orders": """
            WITH t AS (SELECT o_totalprice a, o_custkey b,
                              EXTRACT(day FROM o_orderdate) c,
                              EXTRACT(day FROM o_orderdate) d FROM orders),
            r AS (SELECT
              RANK() OVER (ORDER BY a)
                + (COUNT(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
              RANK() OVER (ORDER BY b)
                + (COUNT(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb,
              RANK() OVER (ORDER BY c)
                + (COUNT(*) OVER (PARTITION BY c) - 1) / 2.0 AS rc,
              RANK() OVER (ORDER BY d)
                + (COUNT(*) OVER (PARTITION BY d) - 1) / 2.0 AS rd
            FROM t)
            SELECT 'x' AS col, ROUND(CORR(ra, rc), 6) AS rho FROM r
            UNION ALL
            SELECT 'y' AS col, ROUND(CORR(rb, rd), 6) AS rho FROM r
        """,
        "resample_gapfill_grouped": """
            WITH agg AS (SELECT user_id, date_trunc('day', ts) d,
                                COUNT(value) n
                         FROM events WHERE user_id < 20 GROUP BY 1, 2),
            b AS (SELECT user_id, MIN(d) lo, MAX(d) hi FROM agg GROUP BY 1),
            spine AS (SELECT user_id,
                             UNNEST(generate_series(lo, hi,
                                                    INTERVAL 1 DAY)) AS d
                      FROM b)
            SELECT s.user_id, strftime(s.d, '%Y-%m-%d') AS day,
                   CAST(COALESCE(a.n, 0) AS BIGINT) AS n
            FROM spine s LEFT JOIN agg a
                 ON a.user_id = s.user_id AND a.d = s.d
        """,
        "doc_dup_windows": """
            WITH wins AS (
              SELECT doc_id, substr(text, i, 40) AS w
              FROM documents,
                   (SELECT unnest(generate_series(1,
                        (SELECT max(length(text)) FROM documents), 20)) AS i)
              WHERE i <= length(text) - 39
            ),
            cnt AS (SELECT w, COUNT(DISTINCT doc_id) AS nd
                    FROM wins GROUP BY w),
            per AS (SELECT doc_id, COUNT(*) AS n_win,
                           COUNT(*) FILTER (WHERE nd >= 2) AS n_dup
                    FROM wins JOIN cnt USING (w) GROUP BY doc_id)
            SELECT doc_id, n_win, n_dup,
                   round(n_dup / n_win::DOUBLE, 4) AS dup_frac
            FROM per WHERE n_dup > 0
        """,
        "doc_line_dedup": """
            WITH ch AS (SELECT doc_id, string_split(text, ' ') AS words
                        FROM documents),
            segs AS (
              SELECT doc_id, i AS pos,
                     array_to_string(words[i*8+1 : i*8+8], ' ') AS seg
              FROM ch,
                   (SELECT unnest(generate_series(0,
                        (SELECT CAST(ceil(max(len(words))/8.0) AS INT)
                         FROM ch) - 1)) AS i)
              WHERE i < ceil(len(words)/8.0)
            ),
            cnt AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd
                    FROM segs GROUP BY seg),
            per AS (
              SELECT doc_id, COUNT(*) AS n_seg,
                     COUNT(*) FILTER (WHERE nd < 2) AS n_kept,
                     COALESCE(string_agg(seg, chr(10) ORDER BY pos)
                              FILTER (WHERE nd < 2), '') AS kept_text
              FROM segs JOIN cnt USING (seg) GROUP BY doc_id)
            SELECT doc_id, n_seg, n_kept, kept_text
            FROM per WHERE n_kept < n_seg
        """,
        "rolling_corr_orders": """
            WITH w AS (
              SELECT o_orderkey,
                     corr(o_totalprice, o_custkey) OVER
                       (ORDER BY o_orderkey
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS c,
                     row_number() OVER (ORDER BY o_orderkey) AS rn
              FROM orders)
            SELECT o_orderkey,
                   CASE WHEN rn >= 20 THEN round(c, 4) + 0.0 END AS corr20
            FROM w
        """,
        "rank_naopt_events": """
            WITH e AS (
              SELECT event_id,
                     CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END v
              FROM events),
            rt AS (SELECT event_id, v,
                          row_number() OVER (ORDER BY v ASC NULLS FIRST,
                                             event_id) AS rn_t,
                          row_number() OVER (ORDER BY v ASC NULLS LAST,
                                             event_id) AS rn_b
                   FROM e)
            SELECT event_id,
                   round(AVG(rn_t) OVER (PARTITION BY v), 2) AS rank_top,
                   round(AVG(rn_b) OVER (PARTITION BY v), 2) AS rank_bottom
            FROM rt
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
                   SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
                   SUM(CAST(FLOOR(l_discount * 10000) AS BIGINT)) / 10000.0 / COUNT(l_orderkey) AS avg_disc,
                   COUNT(l_orderkey) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_topk_revenue": """
            SELECT l.l_orderkey,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1996-01-01'
            GROUP BY l.l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n.n_name,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_quantity >= 45)
            GROUP BY o_orderpriority
        """,
        "q6_forecast_revenue": """
            SELECT SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0 AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q10_returned_items": """
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-04-01'
            GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
            ORDER BY revenue DESC, c.c_custkey ASC
            LIMIT 20
        """,
        "q14_promo_revenue": """
            SELECT 100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                       ELSE 0 END)
                   / SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS promo_pct,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS total_revenue
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
              AND l.l_shipdate < TIMESTAMP '1996-04-01'
        """,
        "q18_large_volume": """
            SELECT c.c_name, c.c_custkey, o.o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o.o_totalprice,
                   g.qty_c / 100.0 AS total_qty
            FROM (SELECT l_orderkey,
                         SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS qty_c
                  FROM lineitem GROUP BY l_orderkey
                  HAVING SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) > 30000) g
            JOIN orders o ON g.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY total_qty DESC, o.o_orderkey ASC
            LIMIT 100
        """,
        "q19_disjunctive_pred": """
            SELECT SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "q8_market_share": """
            WITH j AS (
                SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
                       CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS rev_c,
                       n.n_name
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation nc ON c.c_nationkey = nc.n_nationkey
                JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
                WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1997-01-01')
            SELECT o_year,
                   SUM(CASE WHEN n_name = 'NATION_1' THEN rev_c ELSE 0 END)
                       / CAST(SUM(rev_c) AS DOUBLE) AS mkt_share,
                   SUM(rev_c) / 100.0 AS total_revenue
            FROM j GROUP BY o_year
        """,
        "q9_product_profit": """
            SELECT n.n_name,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS o_year,
                   SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)
                                   - p.p_retailprice * 0.5 * l.l_quantity) * 100) AS BIGINT)) / 100.0 AS sum_profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2
        """,
        "q12_priority_shipping": """
            SELECT l.l_linestatus,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
            GROUP BY 1
        """,
        "q13_customer_distribution": """
            WITH per_cust AS (
                SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                   AND o.o_orderpriority <> '5-LOW'
                GROUP BY c.c_custkey)
            SELECT c_count, COUNT(c_custkey) AS custdist
            FROM per_cust GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
                FROM lineitem
                WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s.s_suppkey, s.s_name, rev.rev_c / 100.0 AS total_revenue
            FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
            WHERE rev.rev_c = (SELECT MAX(rev_c) FROM rev)
        """,
        "q2_min_cost_supplier": """
            WITH s AS (
                SELECT s_suppkey, s_name, s_acctbal, n.n_name
                FROM supplier su
                JOIN nation n ON su.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'EUROPE'),
            ps AS (
                SELECT l.l_partkey, l.l_suppkey,
                       MIN(CAST(FLOOR(l.l_extendedprice * 100 / l.l_quantity) AS BIGINT)) AS cost_c
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                           AND p.p_type = 'SMALL' AND p.p_size = 15
                WHERE l.l_suppkey IN (SELECT s_suppkey FROM s)
                GROUP BY 1, 2)
            SELECT s.s_acctbal, s.s_name, s.n_name, ps.l_partkey AS p_partkey
            FROM ps JOIN s ON ps.l_suppkey = s.s_suppkey
            WHERE ps.cost_c = (SELECT MIN(cost_c) FROM ps p2
                               WHERE p2.l_partkey = ps.l_partkey)
            ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p_partkey
            LIMIT 100
        """,
        "q11_important_stock": """
            WITH g AS (
                SELECT l_partkey,
                       SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS value_c
                FROM lineitem
                WHERE l_suppkey IN (
                    SELECT s_suppkey FROM supplier su
                    JOIN nation n ON su.s_nationkey = n.n_nationkey
                    WHERE n.n_name = 'NATION_3')
                GROUP BY l_partkey)
            SELECT l_partkey, value_c / 100.0 AS value
            FROM g
            WHERE value_c * 1000 > (SELECT SUM(value_c) FROM g)
            ORDER BY value DESC, l_partkey
        """,
        "q16_parts_supplier": """
            SELECT p.p_brand, p.p_type, p.p_size,
                   COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
              AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l.l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """,
        "q17_small_qty_revenue": """
            WITH l AS (
                SELECT l.l_partkey,
                       CAST(FLOOR(l.l_quantity * 100) AS BIGINT) AS qty_c,
                       CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT) AS price_c
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                           AND p.p_brand = 'Brand#3'),
            stats AS (
                SELECT l_partkey, COUNT(*) AS cnt, SUM(qty_c) AS qsum_c
                FROM l GROUP BY l_partkey)
            SELECT SUM(l.price_c) / 100.0 / 7.0 AS avg_yearly
            FROM l JOIN stats s ON l.l_partkey = s.l_partkey
            WHERE l.qty_c * 5 * s.cnt < s.qsum_c
        """,
        "q20_excess_suppliers": """
            WITH sp AS (
                SELECT l.l_partkey, l.l_suppkey,
                       SUM(CAST(FLOOR(l.l_quantity * 100) AS BIGINT)) AS sq_c
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'SMALL'
                WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
                GROUP BY 1, 2),
            pt AS (SELECT l_partkey, SUM(sq_c) AS pq_c FROM sp GROUP BY 1)
            SELECT s.s_suppkey, s.s_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_5'
              AND s.s_suppkey IN (
                  SELECT sp.l_suppkey FROM sp
                  JOIN pt ON sp.l_partkey = pt.l_partkey
                  WHERE sp.sq_c * 2 > pt.pq_c)
            ORDER BY s.s_suppkey
        """,
        "q21_waiting_suppliers": """
            WITH l AS (
                SELECT l_orderkey, l_suppkey, l_quantity
                FROM lineitem
                WHERE l_orderkey IN (
                    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')),
            g AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
                  FROM l GROUP BY 1),
            lt AS (SELECT DISTINCT l_orderkey, l_suppkey
                   FROM l WHERE l_quantity >= 48),
            gl AS (SELECT l_orderkey, COUNT(*) AS n_late FROM lt GROUP BY 1),
            qual AS (
                SELECT g.l_orderkey FROM g
                JOIN gl ON g.l_orderkey = gl.l_orderkey
                WHERE g.n_supp >= 2 AND gl.n_late = 1)
            SELECT s.s_name, COUNT(DISTINCT lt.l_orderkey) AS numwait
            FROM lt
            JOIN qual ON lt.l_orderkey = qual.l_orderkey
            JOIN supplier s ON lt.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_7'
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name
            LIMIT 100
        """,
        "q22_global_sales": """
            WITH c AS (
                SELECT c_custkey, c_nationkey, c_acctbal,
                       CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
                FROM customer
                WHERE c_nationkey IN (1, 13, 17, 20, 24)),
            stats AS (
                SELECT SUM(bal_c) AS sum_c, COUNT(*) AS cnt
                FROM c WHERE c_acctbal > 0.0)
            SELECT c.c_nationkey, COUNT(c.c_custkey) AS numcust,
                   SUM(c.bal_c) / 100.0 AS totacctbal
            FROM c, stats
            WHERE c.bal_c * stats.cnt > stats.sum_c
              AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                      WHERE o_orderdate >= '1999-01-01')
            GROUP BY c.c_nationkey
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity > 45
        """,
        "assign_eval_disc_price": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS disc_price,
                   l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
            FROM lineitem WHERE l_quantity < 5
        """,
        "join_part_lineitem": """
            SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_retailprice,
                   l.l_quantity
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_size > 40
        """,
        "outer_join_fillna": """
            SELECT c.c_custkey, c.c_name,
                   CAST(COALESCE(g.n_big, 0) AS BIGINT) AS n_big
            FROM customer c
            LEFT JOIN (
                SELECT o_custkey, COUNT(o_orderkey) AS n_big
                FROM orders WHERE o_totalprice > 450000
                GROUP BY o_custkey
            ) g ON c.c_custkey = g.o_custkey
        """,
        "value_counts_priority": """
            SELECT o_orderpriority, COUNT(*) AS count
            FROM orders GROUP BY o_orderpriority
        """,
        # r8: name-scrub gate — the "index" column NAME is the assertion
        "unnamed_vc_reset_names": """
            SELECT o_orderpriority AS "index", COUNT(*) AS count
            FROM orders GROUP BY o_orderpriority ORDER BY "index"
        """,
        # r8: stamp×rowid gate — survivor positions + average-method rank
        # replayed in SQL (rid = parquet scan order = pandas read order)
        "stamped_rank_orders": """
            WITH base AS (
                SELECT o_custkey, o_totalprice, o_orderkey,
                       row_number() OVER () - 1 AS rid
                FROM orders
            ), surv AS (
                SELECT o_custkey, o_totalprice, o_orderkey, rid
                FROM base
                QUALIFY row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY rid) = 1
            ), posed AS (
                SELECT *, row_number() OVER (ORDER BY rid) - 1 AS pos
                FROM surv
            )
            SELECT pos, o_orderkey, o_totalprice,
                   (2 * RANK() OVER (ORDER BY o_totalprice)
                    + COUNT(*) OVER (PARTITION BY o_totalprice) - 1) / 2.0
                       AS price_rank
            FROM posed ORDER BY pos
        """,
        "distinct_flags": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "sort_limit_customers": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20
        """,
        "concat_union": """
            SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "groupby_agg_multi": """
            SELECT o_orderpriority, COUNT(o_orderkey) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                   strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
            FROM orders GROUP BY o_orderpriority
        """,
        "groupby_having": """
            SELECT c_nationkey, COUNT(c_custkey) AS n_cust
            FROM customer GROUP BY c_nationkey HAVING COUNT(c_custkey) > 5
        """,
        "window_rank_orders": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
                FROM orders) t
            WHERE rn <= 2
        """,
        "groupby_transform_share": """
            SELECT l_orderkey, l_linenumber,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        OVER (PARTITION BY l_returnflag) AS DOUBLE) AS flag_total
            FROM lineitem
        """,
        "reductions_scalar": """
            SELECT COUNT(*) AS n_rows,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   ROUND(AVG(l_tax), 4) AS avg_tax,
                   MIN(l_quantity) AS min_qty,
                   MAX(l_quantity) AS max_qty,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   ROUND(STDDEV_SAMP(l_discount), 4) AS std_disc
            FROM lineitem
        """,
        "isin_between": """
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_quantity BETWEEN 5 AND 10 AND l_returnflag IN ('A', 'R')
        """,
        "astype_cast_counts": """
            SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
                   COUNT(l_orderkey) AS n
            FROM lineitem GROUP BY 1
        """,
        "case_when_bucket": """
            SELECT CASE WHEN o_totalprice < 100000 THEN 'low' ELSE 'high' END AS bucket,
                   COUNT(o_orderkey) AS n
            FROM orders GROUP BY 1
        """,
        "str_ops_customers": """
            SELECT c_custkey, UPPER(c_name) AS name_upper,
                   CAST(LENGTH(c_name) AS INT) AS name_len,
                   regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num
            FROM customer
        """,
        "dt_ops_orders": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
                   CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
                   COUNT(o_orderkey) AS n
            FROM orders GROUP BY 1, 2
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
                   event_type, COUNT(event_id) AS n
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 >= INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events)
            SELECT user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "events_json_props": """
            SELECT event_type, COUNT(*) AS n,
                   ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
            FROM events GROUP BY event_type
        """,
        "doc_token_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   MIN(len(regexp_split_to_array(trim(text), '\\s+'))) AS min_tokens,
                   MAX(len(regexp_split_to_array(trim(text), '\\s+'))) AS max_tokens
            FROM documents GROUP BY lang
        """,
        "doc_fingerprint_dedup": _AUG_CTE + f"""
            SELECT {_FP} AS fp, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
            FROM aug GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "doc_exact_dedup_count": _AUG_CTE + f"""
            SELECT COUNT(*) AS n_kept, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM (
                SELECT doc_id FROM (
                    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY {_FP}) AS keep
                    FROM aug) t
                WHERE doc_id = keep)
        """,
        "doc_quality": f"""
            SELECT source, COUNT(*) AS n,
                   ROUND(AVG(
                       CASE WHEN LENGTH(text) > 0 THEN
                           CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                           / LENGTH(text)
                       ELSE 0 END), 4) AS avg_punct_ratio,
                   ROUND(AVG(
                       CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0 THEN
                           CAST(len(list_filter(
                               regexp_split_to_array(lower(trim(text)), '\\s+'),
                               t -> list_contains({_STOPWORDS_SQL}, t))) AS DOUBLE)
                           / len(regexp_split_to_array(trim(text), '\\s+'))
                       ELSE 0 END), 4) AS avg_stopword_ratio
            FROM documents GROUP BY source
        """,
        "doc_lang_id": f"""
            SELECT CASE
                WHEN GREATEST({s_de}, {s_en}, {s_es}, {s_fr}) = 0 THEN 'unk'
                WHEN {s_de} >= {s_en} AND {s_de} >= {s_es} AND {s_de} >= {s_fr} THEN 'de'
                WHEN {s_en} >= {s_es} AND {s_en} >= {s_fr} THEN 'en'
                WHEN {s_es} >= {s_fr} THEN 'es'
                ELSE 'fr' END AS pred_lang,
                COUNT(*) AS n
            FROM documents GROUP BY 1
        """,
        "embedding_ann_exactprobe": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 2)
            SELECT vec_id,
                   ROUND(list_dot_product(embedding::DOUBLE[], (SELECT qv FROM q))
                         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                            * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))),
                         4) AS cosine
            FROM embeddings
            ORDER BY list_dot_product(embedding::DOUBLE[], (SELECT qv FROM q))
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "logit_first_step": """
            WITH f AS (
                SELECT CAST(lang = 'en' AS DOUBLE) AS y,
                       (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                             THEN CAST(len(list_filter(
                                    regexp_split_to_array(trim(text), '\\s+'),
                                    x -> list_contains(
                                        ['the','a','of','to','and','is','in','it','that','for'],
                                        lower(x)))) AS DOUBLE)
                                  / len(regexp_split_to_array(trim(text), '\\s+'))
                             ELSE 0.0 END) AS f_stop,
                       CAST(len(list_filter(
                                list_transform(
                                    regexp_split_to_array(trim(text), '\\s+'),
                                    x -> lower(x)),
                                t -> list_contains(['the','and','of','to','is'], t)))
                            AS DOUBLE)
                         / (len(regexp_split_to_array(trim(text), '\\s+')) + 1)
                           AS f_en,
                       ln(1 + length(text)) - 6.0 AS f_loglen
                FROM documents
            ), g AS (
                SELECT AVG(0.5 - y) AS g_b,
                       AVG((0.5 - y) * f_stop) AS g_stop,
                       AVG((0.5 - y) * f_en) AS g_en,
                       AVG((0.5 - y) * f_loglen) AS g_loglen
                FROM f
            )
            SELECT 'bias' AS term, ROUND(-2.0 * g_b, 6) AS weight FROM g
            UNION ALL SELECT 'f_stop', ROUND(-2.0 * g_stop, 6) FROM g
            UNION ALL SELECT 'f_en', ROUND(-2.0 * g_en, 6) FROM g
            UNION ALL SELECT 'f_loglen', ROUND(-2.0 * g_loglen, 6) FROM g
        """,
        "similarity_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(list_dot_product(embedding::DOUBLE[], (SELECT qv FROM q))
                         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                            * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))),
                         4) AS cosine
            FROM embeddings
            ORDER BY list_dot_product(embedding::DOUBLE[], (SELECT qv FROM q))
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        # Full shingle-Jaccard differential oracle: same tokenization
        # (trim → split on \s+), same 3-gram shingling (clamped slice at the
        # tail, distinct), same J = c/(na+nb-c) in integer arithmetic.
        "ngram_jaccard_dups": _AUG_CTE + """
            , tok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM aug
            ), sh AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') AS s
                FROM tok, unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS t(i)
            ), nn AS (
                SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), common AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS c
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, ROUND(c / (na.n + nb.n - c), 4) AS jaccard
            FROM common
            JOIN nn na ON na.doc_id = id_a
            JOIN nn nb ON nb.doc_id = id_b
            WHERE c / (na.n + nb.n - c) >= 0.9
        """,
        "simhash_planted_dups": """
            SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
                   CAST(0 AS INT) AS hamming
            FROM documents WHERE doc_id < 50
        """,
        # r4: rows-only → exact conversions (VERDICT r3 item 3)
        "minhash_near_dup_pairs": """
            SELECT doc_id AS id_a, doc_id + 100000 AS id_b
            FROM documents WHERE doc_id < 50
        """,
        "simhash_near_dups": """
            SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
                   CAST(0 AS INT) AS hamming
            FROM documents WHERE doc_id < 50
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id, 'png' AS img_format,
                   CAST(8 + doc_id % 8 AS BIGINT) AS img_width,
                   CAST(6 + doc_id % 5 AS BIGINT) AS img_height
            FROM documents ORDER BY media_id
        """,
        "bpe_learn_documents": _bpe_learn_oracle_sql(8),
        "bpe_encode_documents": _bpe_encode_oracle_sql(8),
        "fuzzy_dup_pairs_edit": """
            SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
                   CAST(0 AS BIGINT) AS edit_dist
            FROM documents WHERE doc_id < 20
            UNION ALL
            SELECT doc_id AS id_a, doc_id + 200000 AS id_b,
                   CAST(levenshtein(text, text || ' zzqxa') AS BIGINT)
                       AS edit_dist
            FROM documents
            WHERE doc_id >= 20 AND doc_id < 40 AND n_chars >= 300
        """,
        "minhash_verified_dups": """
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20
              UNION ALL
              SELECT doc_id + 200000, text || ' zzqxa zzqxb' FROM documents
              WHERE doc_id >= 20 AND doc_id < 40 AND n_chars >= 300
            ), tok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM aug
            ), sh AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') AS s
                FROM tok, unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS t(i)
            ), nn AS (
                SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), common AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS c
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, ROUND(c / (na.n + nb.n - c), 4) AS jaccard
            FROM common
            JOIN nn na ON na.doc_id = id_a
            JOIN nn nb ON nb.doc_id = id_b
            WHERE c / (na.n + nb.n - c) >= 0.85
        """,
        "streaming_dedup_ingest": f"""
            WITH fps AS (
                SELECT doc_id, source, {_FP} AS fp FROM documents
            ), corpus AS (
                SELECT DISTINCT fp FROM fps WHERE doc_id % 3 = 0
            )
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN doc_id % 3 <> 0
                                 AND fp IN (SELECT fp FROM corpus)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
            FROM fps GROUP BY source
        """,
        "doc_incremental_dedup": """
            WITH batch AS (
              SELECT doc_id + 100000 AS doc_id, text FROM documents
              WHERE doc_id < 20
              UNION ALL
              SELECT doc_id + 200000, text || ' zzqxa zzqxb' FROM documents
              WHERE doc_id >= 20 AND doc_id < 40 AND n_chars >= 300
              UNION ALL
              SELECT doc_id + 300000,
                     'qqa' || doc_id || ' qqb' || doc_id || ' qqc' || doc_id
                     || ' qqd' || doc_id || ' qqe' || doc_id
              FROM documents WHERE doc_id >= 40 AND doc_id < 80
            ), ctok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM documents
            ), btok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM batch
            ), csh AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') AS s
                FROM ctok, unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS t(i)
            ), bsh AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') AS s
                FROM btok, unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS t(i)
            ), cn AS (
                SELECT doc_id, COUNT(*) AS n FROM csh GROUP BY doc_id
            ), bn AS (
                SELECT doc_id, COUNT(*) AS n FROM bsh GROUP BY doc_id
            ), common AS (
                SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
                       COUNT(*) AS c
                FROM bsh b JOIN csh c ON b.s = c.s
                GROUP BY 1, 2
            ), matched AS (
                SELECT batch_id, MIN(corpus_id) AS dup_of
                FROM common
                JOIN bn ON bn.doc_id = common.batch_id
                JOIN cn ON cn.doc_id = common.corpus_id
                WHERE common.c / (bn.n + cn.n - common.c) >= 0.85
                GROUP BY batch_id
            )
            SELECT b.doc_id AS batch_id, m.dup_of IS NOT NULL AS is_dup,
                   m.dup_of
            FROM batch b LEFT JOIN matched m ON m.batch_id = b.doc_id
        """,
        "multimodal_meta": """
            SELECT 'unknown' AS media_format, COUNT(*) AS n,
                   CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT))
                        AS BIGINT) AS total_bytes
            FROM documents
        """,
        "asof_join_events": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 r AS (SELECT user_id, ts, value AS view_value FROM events
                       WHERE event_type = 'view')
            SELECT l.event_id, l.user_id, r.view_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "asof_nearest_events": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 r AS (SELECT user_id, ts AS rts, value AS view_value
                       FROM events WHERE event_type = 'view'),
                 cand AS (
                   SELECT l.event_id, l.user_id, r.view_value,
                          ROW_NUMBER() OVER (PARTITION BY l.event_id
                              ORDER BY abs(epoch_us(l.ts) - epoch_us(r.rts)),
                                       CASE WHEN r.rts <= l.ts THEN 0
                                            ELSE 1 END,
                                       r.rts) AS rn
                   FROM l LEFT JOIN r USING (user_id))
            SELECT event_id, user_id, view_value FROM cand WHERE rn = 1
        """,
        "rollup_pricing": """
            SELECT l_returnflag, l_linestatus, COUNT(l_orderkey) AS n,
                   SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) / 100.0 AS qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "cube_pricing": """
            SELECT l_returnflag, l_linestatus, COUNT(l_orderkey) AS n
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "head_sorted_nations": """
            SELECT * FROM nation ORDER BY n_name LIMIT 5
        """,
        "idx_extremes_orders": """
            SELECT (SELECT o_orderkey FROM orders
                    ORDER BY o_totalprice ASC LIMIT 1) AS cheapest_order,
                   (SELECT o_orderkey FROM orders
                    ORDER BY o_totalprice DESC LIMIT 1) AS priciest_order
        """,
        "mode_quantity": """
            WITH f AS (SELECT l_quantity, COUNT(*) AS c FROM lineitem GROUP BY 1)
            SELECT l_quantity AS mode_qty FROM f
            WHERE c = (SELECT MAX(c) FROM f)
        """,
        "quantile_prices": """
            SELECT median(l_extendedprice) AS p50,
                   quantile_cont(l_extendedprice, 0.25) AS p25,
                   quantile_cont(l_extendedprice, 0.9) AS p90
            FROM lineitem
        """,
        "explode_tokens": """
            SELECT t.tok, COUNT(doc_id) AS n FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents WHERE doc_id < 200) t
            GROUP BY t.tok HAVING COUNT(doc_id) >= 50
        """,
        "combine_first_balances": """
            SELECT c_custkey,
                   COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END,
                            c_acctbal) AS c_acctbal
            FROM customer
        """,
        "replace_dropna_priorities": """
            SELECT o_orderpriority AS prio, COUNT(o_orderkey) AS n
            FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1
        """,
        "intersect_except_nations": """
            SELECT nk, 'both' AS side FROM (
                SELECT DISTINCT c_nationkey AS nk FROM customer
                INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
            UNION ALL
            SELECT nk, 'cust_only' AS side FROM (
                SELECT DISTINCT c_nationkey AS nk FROM customer
                EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        """,
        "window_lag_cumsum_orders": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
                       FROM orders WHERE o_custkey < 100)
            SELECT o_orderkey, o_custkey,
                   LAG(price_c) OVER w / 100.0 AS prev_price,
                   SUM(price_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) / 100.0 AS run_total
            FROM o WINDOW w AS (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
        """,
        "window_diff_pct_orders": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
                       FROM orders WHERE o_custkey < 100)
            SELECT o_orderkey, o_custkey,
                   o_totalprice - LAG(o_totalprice) OVER w AS price_diff,
                   o_totalprice / LAG(o_totalprice) OVER w - 1 AS price_pct
            FROM o WINDOW w AS (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
        """,
        "rolling_expanding_orders": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
                       FROM orders WHERE o_custkey < 100)
            SELECT o_orderkey, o_custkey,
                   CASE WHEN COUNT(price_c) OVER w3 >= 3 THEN SUM(price_c) OVER w3 END
                       / (COUNT(price_c) OVER w3) / 100.0 AS roll_avg,
                   SUM(price_c) OVER wexp / 100.0 AS exp_sum
            FROM o WINDOW
                w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                wexp AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "groupby_nunique_median": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS n_parts,
                   MEDIAN(l_quantity) AS median_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "interval_join_shipments": """
            SELECT l.l_shipdate, COUNT(*) AS n,
                   CAST(SUM(o.o_orderkey) AS BIGINT) AS sum_ok
            FROM (SELECT l_shipdate FROM lineitem WHERE l_quantity >= 49) l
            JOIN orders o
              ON l.l_shipdate BETWEEN o.o_orderdate
                               AND o.o_orderdate + INTERVAL 3 DAY
            GROUP BY l.l_shipdate
        """,
        "pivot_status_priority": """
            SELECT o_orderstatus,
                   SUM(CASE WHEN o_orderpriority = '1-URGENT'
                       THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END) / 100.0 AS urgent,
                   SUM(CASE WHEN o_orderpriority = '2-HIGH'
                       THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END) / 100.0 AS high,
                   SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                       THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END) / 100.0 AS medium,
                   SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                       THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END) / 100.0 AS notspec,
                   SUM(CASE WHEN o_orderpriority = '5-LOW'
                       THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END) / 100.0 AS low
            FROM orders GROUP BY o_orderstatus
        """,
        "melt_customer_metrics": """
            SELECT c_custkey, 'c_acctbal' AS metric,
                   CAST(c_acctbal AS DOUBLE) AS val FROM customer
            UNION ALL
            SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS DOUBLE)
            FROM customer
        """,
        "period_month_revenue": """
            SELECT date_trunc('month', o_orderdate)
                     + INTERVAL 1 MONTH - INTERVAL 1 MICROSECOND AS month_end,
                   COUNT(o_orderkey) AS n,
                   SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / 100.0
                     AS revenue
            FROM orders GROUP BY 1
        """,
        "grouping_sets_pricing": """
            SELECT l_returnflag, l_linestatus, COUNT(l_orderkey) AS n,
                   SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) / 100.0 AS qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_linestatus), ())
        """,
        "streaming_hourly_events": """
            SELECT date_trunc('hour', ts) AS hour_start, COUNT(event_id) AS n,
                   SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total
            FROM events GROUP BY 1
        """,
        "streaming_stateful_running": """
            SELECT user_id, COUNT(*) AS n_events,
                   SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total
            FROM events GROUP BY user_id
        """,
        "streaming_dedup_users": """
            SELECT DISTINCT user_id FROM events
        """,
        "streaming_enriched_segments": """
            SELECT c.c_mktsegment AS segment, e.event_type,
                   COUNT(*) AS n,
                   SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) / 100.0 AS total
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY 1, 2
        """,
        "events_sliding_windows": """
            WITH x AS (
                SELECT date_trunc('hour', ts) AS w, event_id, value FROM events
                UNION ALL
                SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_id, value
                FROM events)
            SELECT w AS window_start, COUNT(event_id) AS n,
                   SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total
            FROM x GROUP BY 1
        """,
        "eval_query_charges": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 + l_tax) AS charge
            FROM lineitem
            WHERE l_extendedprice * (1 + l_tax) > 90000 AND l_discount < 0.05
        """,
        "math_abs_clip_floor": """
            SELECT c_custkey,
                   LEAST(GREATEST(c_acctbal, 0), 5000) AS clipped,
                   CAST(FLOOR(ABS(c_acctbal)) AS BIGINT) AS mag
            FROM customer
        """,
        "tail_orders": """
            SELECT o_orderkey, o_custkey FROM orders
            ORDER BY o_orderkey DESC LIMIT 5
        """,
        "nlargest_parts": """
            SELECT p_partkey, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey DESC LIMIT 10
        """,
        "value_counts_normalized": """
            SELECT o_orderpriority,
                   COUNT(*) / (SELECT COUNT(*) FROM orders) AS proportion
            FROM orders GROUP BY 1
        """,
        "dedup_keep_first_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderkey) AS rn
                FROM orders) WHERE rn = 1
        """,
        "concat_inner_lineitem": """
            SELECT l_orderkey, l_quantity FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45
        """,
        "merge_indicator_nations": """
            SELECT CASE WHEN n_nationkey IS NOT NULL AND r_regionkey IS NOT NULL
                        THEN 'both'
                        WHEN n_nationkey IS NOT NULL THEN 'left_only'
                        ELSE 'right_only' END AS _merge,
                   COUNT(n_nationkey) AS n
            FROM nation FULL JOIN (SELECT r_regionkey, r_name FROM region
                                   WHERE r_regionkey < 3) r
              ON n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "cross_join_flags": """
            SELECT r_name, l_returnflag
            FROM region CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem)
        """,
        "map_dict_flags": """
            SELECT CASE WHEN l_returnflag = 'A' THEN 'accepted'
                        WHEN l_returnflag = 'R' THEN 'returned'
                        ELSE 'other' END AS status,
                   COUNT(l_orderkey) AS n
            FROM lineitem GROUP BY 1
        """,
        "apply_udf_name_len": """
            SELECT c_custkey, CAST(LENGTH(c_name) AS BIGINT) AS name_len
            FROM customer WHERE c_custkey <= 100
        """,
        "align_add_balances": """
            WITH a AS (SELECT c_custkey, c_acctbal FROM customer
                       WHERE c_custkey % 2 = 0 AND c_custkey < 500),
                 b AS (SELECT c_custkey, c_acctbal FROM customer
                       WHERE c_acctbal > 0 AND c_custkey < 500)
            SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
                   a.c_acctbal + b.c_acctbal AS total
            FROM a FULL JOIN b ON a.c_custkey = b.c_custkey
        """,
        "cat_codes_segments": """
            SELECT c_custkey, c_mktsegment,
                   CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) - 1 AS INT)
                       AS seg_code
            FROM customer WHERE c_custkey <= 200
        """,
        "grouped_apply_demean": """
            SELECT c_custkey, c_mktsegment,
                   CAST(COUNT(*) OVER (PARTITION BY c_mktsegment)
                     * CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                   - SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT))
                       OVER (PARTITION BY c_mktsegment) AS BIGINT) AS dev_c
            FROM customer
        """,
        "embedding_cosine_pairs": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        """,
        "doc_repetition": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents WHERE doc_id < 300
            ), sh AS (
                SELECT doc_id,
                       list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                           i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                         AS sh3,
                       greatest(len(toks) - 2, 1) AS tot3,
                       list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                           i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                         AS sh2,
                       greatest(len(toks) - 1, 1) AS tot2
                FROM t
            )
            SELECT doc_id,
                   ROUND(1.0 - len(list_distinct(sh3)) / CAST(tot3 AS DOUBLE), 4)
                     AS rep3,
                   ROUND(1.0 - len(list_distinct(sh2)) / CAST(tot2 AS DOUBLE), 4)
                     AS rep2
            FROM sh
        """,
        "clean_corpus_pipeline": f"""
            WITH t AS (
                SELECT source, n_chars,
                       regexp_split_to_array(trim(text), '\\s+') AS toks,
                       regexp_split_to_array(lower(trim(text)), '\\s+')
                         AS ltoks
                FROM documents
            ), m AS (
                SELECT source, n_chars,
                       CASE WHEN len(toks) > 0 THEN
                           CAST(len(list_filter(ltoks,
                                x -> list_contains({_STOPWORDS_SQL}, x)))
                                AS DOUBLE) / len(toks)
                       ELSE 0 END AS stop_ratio,
                       1.0 - CAST(len(list_distinct(list_transform(
                               range(1, greatest(len(toks) - 2, 1) + 1),
                               i -> array_to_string(
                                   list_slice(toks, i, i + 2), ' '))))
                             AS DOUBLE) / greatest(len(toks) - 2, 1) AS rep3
                FROM t
            )
            SELECT source, COUNT(*) AS n_kept,
                   CAST(SUM(n_chars) AS BIGINT) AS kept_chars
            FROM m
            WHERE stop_ratio >= 0.05 AND rep3 <= 0.2
              AND n_chars BETWEEN 100 AND 100000
            GROUP BY source
        """,
        "pack_sequences_documents": """
            WITH base AS (
                SELECT doc_id,
                       CAST(concat('0x', substring(
                            md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1000000 % 16 AS bucket,
                       len(regexp_split_to_array(trim(text), '\\s+'))
                         AS n_tokens
                FROM documents
            ), cum AS (
                SELECT doc_id, bucket, n_tokens,
                       SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens AS prev
                FROM base
            )
            SELECT doc_id, bucket, CAST(n_tokens AS INT) AS n_tokens,
                   CAST(FLOOR(prev / 512.0) AS BIGINT) AS bin_id,
                   CAST(prev % 512 AS BIGINT) AS offset
            FROM cum
        """,
        "udtf_chunk_documents": """
            WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents WHERE doc_id < 200
            )
            SELECT doc_id, CAST(i AS INT) AS chunk_id,
                   array_to_string(list_slice(toks, i * 50 + 1, (i + 1) * 50),
                                   ' ') AS chunk_text,
                   CAST(len(list_slice(toks, i * 50 + 1, (i + 1) * 50)) AS INT)
                     AS n_chunk_tokens
            FROM t, UNNEST(range(CAST(ceil(len(toks) / 50.0) AS BIGINT)))
                    AS u(i)
        """,
        "embedding_near_dup_lsh": """
            WITH aug AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id,
                     list_transform(range(1, len(embedding) + 1),
                         i -> embedding[i]::DOUBLE
                              * (1.0 + 0.05 * sin(CAST(i + vec_id AS DOUBLE))))
                     AS v
              FROM embeddings WHERE vec_id < 25
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.99
        """,
        "resample_daily_events": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   COUNT(*) AS n,
                   SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS value_sum
            FROM events
            GROUP BY 1
        """,
        "crosstab_status_priority": """
            SELECT o_orderstatus,
                   COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
                   COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
                   COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
                   COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
                   COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
            FROM orders GROUP BY o_orderstatus
        """,
        "duplicated_parts": """
            SELECT dup, COUNT(*) AS n FROM (
                SELECT (ROW_NUMBER() OVER (PARTITION BY p_type, p_size
                                           ORDER BY p_partkey) > 1) AS dup
                FROM part
            ) GROUP BY dup
        """,
        "ffill_event_values": """
            SELECT event_type, COUNT(v_f) AS n_filled,
                   SUM(v_f) / 100.0 AS fill_sum
            FROM (
                SELECT event_type,
                       last_value(CASE WHEN event_type <> 'click'
                                       THEN CAST(FLOOR(value * 100) AS BIGINT)
                                  END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS v_f
                FROM events
            ) GROUP BY event_type
        """,
        "ffill_global_events": """
            SELECT event_type, COUNT(v_f) AS n_filled,
                   SUM(v_f) / 100.0 AS fill_sum
            FROM (
                SELECT event_type,
                       last_value(CASE WHEN event_type <> 'click'
                                       THEN CAST(FLOOR(value * 100) AS BIGINT)
                                  END IGNORE NULLS)
                       OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS v_f
                FROM events
            ) GROUP BY event_type
        """,
        "groupby_topn_orders": """
            SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC,
                                                   o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        # Mirrors the engine formula op-for-op: exact integer power sums
        # (HUGEINT here, decimal(38,0) in Spark) then only +,-,*,/,sqrt in
        # double — every op IEEE correctly rounded → bit-identical.
        "skew_sem_prices": """
            WITH t AS (
                SELECT CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS x,
                       CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
                FROM lineitem
            ), s AS (
                SELECT CAST(COUNT(x) AS DOUBLE) AS n,
                       CAST(SUM(x) AS DOUBLE) AS s1,
                       CAST(SUM(x * x) AS DOUBLE) AS s2,
                       CAST(SUM(x * x * x) AS DOUBLE) AS s3,
                       CAST(SUM(x * x * x * x) AS DOUBLE) AS s4,
                       CAST(SUM(y) AS DOUBLE) AS t1,
                       CAST(SUM(y * y) AS DOUBLE) AS t2
                FROM t
            ), m AS (
                SELECT n, s1 / n AS mu,
                       s2 / n - (s1 / n) * (s1 / n) AS m2,
                       s3 / n - 3 * (s1 / n) * (s2 / n)
                              + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
                       s4 / n - 4 * (s1 / n) * (s3 / n)
                              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4,
                       t1, t2
                FROM s
            )
            SELECT (m3 / sqrt(m2 * m2 * m2)) * sqrt(n * (n - 1)) / (n - 2)
                       AS price_skew,
                   ((n + 1) * (m4 / (m2 * m2) - 3) + 6) * (n - 1)
                       / ((n - 2) * (n - 3)) AS price_kurt,
                   sqrt((t2 - t1 * t1 / n) / (n - 2)) / sqrt(n) AS price_sem
            FROM m
        """,
        "rank_bucket_orders": """
            WITH r AS (
                SELECT RANK() OVER (ORDER BY o_totalprice)
                       + (COUNT(*) OVER (PARTITION BY o_totalprice) - 1) / 2.0
                       AS rk
                FROM orders
            )
            SELECT CAST(FLOOR(rk / 1000) AS BIGINT) AS bucket,
                   COUNT(*) AS count
            FROM r GROUP BY 1
        """,
        "doc_dup_components": """
            WITH RECURSIVE e AS (
                SELECT d1.doc_id AS u, d2.doc_id AS v
                FROM documents d1 JOIN documents d2
                  ON d2.doc_id = d1.doc_id + 1 AND d1.lang = d2.lang
            ),
            edges AS (
                SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e
            ),
            nodes AS (SELECT DISTINCT u AS node FROM edges),
            walk(node, comp) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT eg.v, w.comp FROM walk w JOIN edges eg ON eg.u = w.node
            )
            SELECT node AS doc_id,
                   MIN(comp) AS cluster_id,
                   (node = MIN(comp)) AS is_canonical
            FROM walk GROUP BY node ORDER BY doc_id
        """,
        "doc_dedup_pipeline": """
            WITH RECURSIVE aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20
              UNION ALL
              SELECT doc_id + 200000, text || ' zzqxa zzqxb' FROM documents
              WHERE doc_id >= 20 AND doc_id < 40 AND n_chars >= 300
            ), tok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM aug
            ), sh AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') AS s
                FROM tok, unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS t(i)
            ), nn AS (
                SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), common AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS c
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            ), ver AS (
                SELECT id_a, id_b FROM common
                JOIN nn na ON na.doc_id = id_a
                JOIN nn nb ON nb.doc_id = id_b
                WHERE c / (na.n + nb.n - c) >= 0.85
            ), edges AS (
                SELECT id_a AS u, id_b AS v FROM ver
                UNION SELECT id_b, id_a FROM ver
            ), nodes AS (SELECT DISTINCT u AS node FROM edges),
            walk(node, comp) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT eg.v, w.comp FROM walk w JOIN edges eg ON eg.u = w.node
            )
            SELECT node AS doc_id, MIN(comp) AS kept_doc_id
            FROM walk GROUP BY node
            HAVING node != MIN(comp)
            ORDER BY doc_id
        """,
        "doc_link_pagerank": """
            WITH nc AS (SELECT COUNT(*) AS n FROM documents),
            e AS (
                SELECT doc_id AS src,
                       (doc_id * 7 + j.j) % (SELECT n FROM nc) AS dst
                FROM documents, (VALUES (1), (2), (3)) j(j)
            ),
            nodes AS (
                SELECT DISTINCT src AS node FROM e
                UNION SELECT DISTINCT dst FROM e
            ),
            deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
            r0 AS (SELECT node, 1.0 / (SELECT n FROM nc) AS r FROM nodes),
            i1 AS (
                SELECT nd.node,
                       (1.0 - 0.85) / (SELECT n FROM nc)
                       + 0.85 * (COALESCE(s.s, 0)
                                 + (SELECT COALESCE(SUM(r.r), 0) FROM r0 r
                                    LEFT JOIN deg dg ON dg.src = r.node
                                    WHERE dg.src IS NULL)
                                 / (SELECT n FROM nc)) AS r
                FROM nodes nd LEFT JOIN (
                    SELECT e.dst AS node, SUM(r.r / dg.d) AS s
                    FROM r0 r JOIN deg dg ON dg.src = r.node
                    JOIN e ON e.src = r.node GROUP BY e.dst) s
                ON s.node = nd.node
            ),
            i2 AS (
                SELECT nd.node,
                       (1.0 - 0.85) / (SELECT n FROM nc)
                       + 0.85 * (COALESCE(s.s, 0)
                                 + (SELECT COALESCE(SUM(r.r), 0) FROM i1 r
                                    LEFT JOIN deg dg ON dg.src = r.node
                                    WHERE dg.src IS NULL)
                                 / (SELECT n FROM nc)) AS r
                FROM nodes nd LEFT JOIN (
                    SELECT e.dst AS node, SUM(r.r / dg.d) AS s
                    FROM i1 r JOIN deg dg ON dg.src = r.node
                    JOIN e ON e.src = r.node GROUP BY e.dst) s
                ON s.node = nd.node
            ),
            i3 AS (
                SELECT nd.node,
                       (1.0 - 0.85) / (SELECT n FROM nc)
                       + 0.85 * (COALESCE(s.s, 0)
                                 + (SELECT COALESCE(SUM(r.r), 0) FROM i2 r
                                    LEFT JOIN deg dg ON dg.src = r.node
                                    WHERE dg.src IS NULL)
                                 / (SELECT n FROM nc)) AS r
                FROM nodes nd LEFT JOIN (
                    SELECT e.dst AS node, SUM(r.r / dg.d) AS s
                    FROM i2 r JOIN deg dg ON dg.src = r.node
                    JOIN e ON e.src = r.node GROUP BY e.dst) s
                ON s.node = nd.node
            )
            SELECT node AS doc_id, ROUND(r, 6) AS pr
            FROM i3 ORDER BY doc_id
        """,
        "embedding_kmeans": """
            SELECT vec_id, CAST(vec_id % 8 AS BIGINT) AS cluster_rep
            FROM embeddings ORDER BY vec_id
        """,
        "semdedup_embeddings": """
            -- planted truth: survivor = min vec_id per (vec_id%8 cluster,
            -- vec_id%3 cosine subgroup); its cluster rep = min surviving
            -- vec_id in the %8 cluster = the cluster index itself
            SELECT vec_id, CAST(vec_id % 8 AS BIGINT) AS cluster_rep
            FROM embeddings e
            WHERE NOT EXISTS (
                SELECT 1 FROM embeddings e2
                WHERE e2.vec_id < e.vec_id
                  AND e2.vec_id % 8 = e.vec_id % 8
                  AND e2.vec_id % 3 = e.vec_id % 3)
            ORDER BY vec_id
        """,
        "doc_gopher_quality": r"""
            WITH t AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents
            ), f AS (
                SELECT doc_id, text, ws, len(ws) AS n,
                       CASE WHEN len(ws) > 0 THEN
                           CAST(list_sum(list_transform(ws, x -> len(x)))
                                AS DOUBLE) / len(ws)
                       ELSE 0.0 END AS mean_len,
                       (len(text) - len(replace(text, '#', '')))
                       + (len(text) - len(replace(text, '...', ''))) / 3
                           AS sym,
                       CASE WHEN len(ws) > 0 THEN
                           CAST(len(list_filter(ws,
                                x -> regexp_matches(x, '[A-Za-z]')))
                                AS DOUBLE) / len(ws)
                       ELSE 0.0 END AS alpha_frac,
                       len(list_intersect(
                           list_distinct(list_transform(ws, x -> lower(x))),
                           ['the','be','to','of','and','that','have','with']))
                           AS stop_hits,
                       CASE WHEN len(ws) > 0 THEN
                           CAST(len(list_filter(
                                regexp_split_to_array(lower(trim(text)), '\s+'),
                                x -> list_contains(
                                    ['the','a','of','to','and','is','in',
                                     'it','that','for'], x))) AS DOUBLE)
                           / len(ws)
                       ELSE 0.0 END AS stop_ratio,
                       CASE WHEN len(text) > 0 THEN
                           CAST(len(regexp_replace(text, '[A-Za-z0-9\s]',
                                                   '', 'g')) AS DOUBLE)
                           / len(text)
                       ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(text) > 0 THEN
                           CAST(len(text) - len(regexp_replace(text, '[0-9]',
                                                               '', 'g'))
                                AS DOUBLE) / len(text)
                       ELSE 0.0 END AS digit_ratio
                FROM t
            )
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_words,
                   ROUND(mean_len, 4) AS mean_word_len,
                   n BETWEEN 50 AND 100000 AS r_word_count,
                   mean_len BETWEEN 3.0 AND 10.0 AS r_mean_len,
                   (CASE WHEN n > 0 THEN CAST(sym AS DOUBLE) / n
                         ELSE 0.0 END) <= 0.1 AS r_symbol,
                   alpha_frac >= 0.8 AS r_alpha,
                   stop_hits >= 2 AS r_stopwords,
                   (n BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
                       AND ((CASE WHEN n > 0 THEN CAST(sym AS DOUBLE) / n
                                  ELSE 0.0 END) <= 0.1)
                       AND (alpha_frac >= 0.8) AND (stop_hits >= 2)
                       AS passes_gopher,
                   ROUND(1.0 / (1.0 + exp(-(
                       -1.0 + 6.0 * stop_ratio - 8.0 * punct_ratio
                       - 4.0 * digit_ratio - 0.5 * abs(mean_len - 5.5)
                       + 0.25 * ln(1 + len(text))))), 4) AS q_logit
            FROM f ORDER BY doc_id
        """,
        "hybrid_search_rrf": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents
            ), base AS (
                SELECT doc_id, len(ws) AS dl, ws FROM tok
            ), stats AS (
                SELECT COUNT(*) AS N, AVG(dl) AS avgdl FROM base
            ), pairs AS (
                SELECT doc_id, dl, q.term,
                       len(list_filter(ws, x -> x = q.term)) AS tf
                FROM base, (SELECT unnest(['query','join','table']) AS term) q
                WHERE list_contains(ws, q.term)
            ), dfreq AS (
                SELECT term, COUNT(*) AS df FROM pairs GROUP BY term
            ), bm AS (
                SELECT p.doc_id, SUM(
                       ln(1.0 + (s.N - d.df + 0.5) / (d.df + 0.5))
                       * p.tf * (1.2 + 1)
                       / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)))
                           AS bm25
                FROM pairs p JOIN dfreq d USING (term), stats s
                GROUP BY p.doc_id
            ), lex AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                           AS r_lex
                FROM bm QUALIFY r_lex <= 50
            ), qv AS (
                SELECT list_transform(range(0, 64),
                           i -> CAST((i * 37) % 11 - 5 AS DOUBLE)) AS v
            ), cosd AS (
                SELECT vec_id AS doc_id,
                       list_dot_product(embedding::DOUBLE[], (SELECT v FROM qv))
                       / (sqrt(list_dot_product(embedding::DOUBLE[],
                                                embedding::DOUBLE[]))
                          * sqrt(list_dot_product((SELECT v FROM qv),
                                                  (SELECT v FROM qv))))
                           AS cosine
                FROM embeddings
            ), vec AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC)
                           AS r_vec
                FROM cosd QUALIFY r_vec <= 50
            )
            SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
                   ROUND(COALESCE(1.0 / (60 + r_lex), 0)
                         + COALESCE(1.0 / (60 + r_vec), 0), 6) AS rrf,
                   CAST(COALESCE(r_lex, -1) AS BIGINT) AS r_lex,
                   CAST(COALESCE(r_vec, -1) AS BIGINT) AS r_vec
            FROM lex FULL OUTER JOIN vec USING (doc_id)
            ORDER BY rrf DESC, doc_id ASC LIMIT 10
        """,
        "doc_bm25_search": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS ws
                FROM documents
            ), base AS (
                SELECT doc_id, len(ws) AS dl, ws FROM tok
            ), stats AS (
                SELECT COUNT(*) AS N, AVG(dl) AS avgdl FROM base
            ), pairs AS (
                SELECT doc_id, dl, q.term,
                       len(list_filter(ws, x -> x = q.term)) AS tf
                FROM base, (SELECT unnest(['query','join','table']) AS term) q
                WHERE list_contains(ws, q.term)
            ), dfreq AS (
                SELECT term, COUNT(*) AS df FROM pairs GROUP BY term
            ), scored AS (
                SELECT p.doc_id,
                       ln(1.0 + (s.N - d.df + 0.5) / (d.df + 0.5))
                       * p.tf * (1.2 + 1)
                       / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl))
                           AS sc
                FROM pairs p JOIN dfreq d USING (term), stats s
            )
            SELECT doc_id, ROUND(SUM(sc), 4) AS bm25,
                   CAST(COUNT(*) AS BIGINT) AS n_matched
            FROM scored GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id ASC LIMIT 20
        """,
        "doc_tfidf_top_terms": r"""
            WITH pairs AS (
                SELECT doc_id, unnest(
                    regexp_split_to_array(trim(text), '\s+')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf
                FROM pairs GROUP BY doc_id, term
            ), n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
            idf AS (
                SELECT term,
                       ln((nd + 1.0) / (COUNT(*) + 1)) + 1.0 AS idf
                FROM tf, n GROUP BY term, nd
            ), scored AS (
                SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS tfidf
                FROM tf JOIN idf USING (term)
            )
            SELECT doc_id, term AS top_term,
                   ROUND(tfidf, 4) AS top_tfidf,
                   CAST(cnt AS BIGINT) AS n_terms
            FROM (
                SELECT doc_id, term, tfidf,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, term ASC)
                           AS rn,
                       COUNT(*) OVER (PARTITION BY doc_id) AS cnt
                FROM scored)
            WHERE rn = 1 ORDER BY doc_id
        """,
        "doc_bigram_ppl": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(w) AS a FROM toks
            ), uni AS (
                SELECT a, COUNT(*) AS c1 FROM tok GROUP BY a
            ), vs AS (SELECT COUNT(*) AS V FROM uni),
            pairs AS (
                SELECT doc_id, w[i] AS a, w[i+1] AS b
                FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
                WHERE len(w) >= 2
            ), bi AS (
                SELECT a, b, COUNT(*) AS c2 FROM pairs GROUP BY a, b
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   ROUND(AVG(ln((COALESCE(c2, 0) + 0.5)
                               / (COALESCE(c1, 0) + 0.5 * (V + 1)))), 4)
                       AS avg_logprob
            FROM pairs
            LEFT JOIN bi USING (a, b)
            LEFT JOIN uni USING (a)
            CROSS JOIN vs
            GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_unigram_ppl": r"""
            WITH tok AS (
                SELECT doc_id, unnest(
                    regexp_split_to_array(trim(text), '\s+')) AS t
                FROM documents
            ), vocab AS (
                SELECT t, COUNT(*) AS c FROM tok GROUP BY t
            ), tot AS (
                SELECT SUM(c) AS N, COUNT(*) AS V FROM vocab
            ), probs AS (
                SELECT t, (c + 0.5) / (N + 0.5 * (V + 1)) AS p
                FROM vocab, tot
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(AVG(ln(p)), 4) AS avg_logprob
            FROM tok JOIN probs USING (t)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "training_mix_pipeline": """
            WITH gp AS (      -- stage 1: gopher filter (same rules battery)
                SELECT doc_id, source, text,
                       regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id, source, text FROM gp
                WHERE len(ws) BETWEEN 50 AND 100000
                  AND (CASE WHEN len(ws) > 0 THEN
                        CAST(list_sum(list_transform(ws, x -> len(x)))
                             AS DOUBLE) / len(ws) ELSE 0.0 END)
                      BETWEEN 3.0 AND 10.0
            ), dd AS (        -- stage 2: exact fingerprint dedup, min id
                SELECT * FROM g
                QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY
                    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
            ), tr AS (        -- stage 3: 90% train split
                SELECT doc_id, source,
                       len(regexp_split_to_array(trim(text), '\\s+')) AS tok,
                       md5(CAST(doc_id AS VARCHAR)) AS h,
                       CAST(concat('0x', substring(
                            md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1024 AS b
                FROM dd
                WHERE CAST(concat('0x', substring(
                          md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8))
                          AS BIGINT) % 1000000 < 900000
            ), bud AS (       -- stage 4: 500-token budget per source
                SELECT doc_id, source, tok FROM (
                    SELECT *, SUM(tok) OVER (PARTITION BY source
                                             ORDER BY b, h, doc_id
                                             ROWS UNBOUNDED PRECEDING) AS run
                    FROM tr) WHERE run <= 500
            ), mx AS (        -- stage 5: fractional epochs
                SELECT doc_id, source, tok, CAST(e AS BIGINT) AS epoch,
                       CAST(0.5 AS DOUBLE) + CAST(0.25 AS DOUBLE)
                       * (CAST(substring(source, 4, 10) AS INT) % 3) AS fac
                FROM bud, unnest(range(0, 3)) AS t(e)
            )
            SELECT source,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(tok) AS BIGINT) AS total_tokens
            FROM mx
            WHERE epoch < CAST(floor(fac) AS BIGINT)
               OR (epoch = CAST(floor(fac) AS BIGINT)
                   AND CAST(concat('0x', substring(
                        md5(CAST(doc_id AS VARCHAR) || '#'
                            || CAST(epoch AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1000000 < (fac - floor(fac)) * 1000000)
            GROUP BY source ORDER BY source
        """,
        "grouped_resample_user_daily": """
            SELECT user_id,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS total,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE user_id < 40
            GROUP BY user_id, date_trunc('day', ts)
            ORDER BY user_id, day
        """,
        "rolling_center_orders": """
            SELECT o_orderkey,
                   CASE WHEN COUNT(*) OVER w = 5
                        THEN CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                                  OVER w AS BIGINT) END AS csum
            FROM orders
            WINDOW w AS (ORDER BY o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            ORDER BY o_orderkey
        """,
        "ffill_limit_events": """
            WITH t AS (
                SELECT event_id,
                       CASE WHEN CAST(floor(value * 1000) AS BIGINT) % 3 <> 0
                            THEN CAST(floor(value * 1000) AS BIGINT) END AS v
                FROM events
            )
            SELECT event_id,
                   COALESCE(v, LAST_VALUE(v IGNORE NULLS) OVER (
                       ORDER BY event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS v_filled
            FROM t ORDER BY event_id
        """,
        "streaming_quality_curation": r"""
            WITH d AS (
                SELECT doc_id, source,
                       text || CASE WHEN doc_id % 7 = 0
                               THEN ' mail u' || CAST(doc_id AS VARCHAR)
                                    || '@test.org'
                               ELSE '' END AS t
                FROM documents
            ), f AS (
                SELECT source, t,
                       regexp_split_to_array(trim(t), '\s+') AS ws
                FROM d
            ), g AS (
                SELECT source,
                       len(ws) AS n,
                       CASE WHEN len(ws) > 0 THEN
                           CAST(list_sum(list_transform(ws, x -> len(x)))
                                AS DOUBLE) / len(ws) ELSE 0.0 END AS mean_len,
                       (len(t) - len(replace(t, '#', '')))
                       + (len(t) - len(replace(t, '...', ''))) / 3 AS sym,
                       CASE WHEN len(ws) > 0 THEN
                           CAST(len(list_filter(ws,
                                x -> regexp_matches(x, '[A-Za-z]')))
                                AS DOUBLE) / len(ws) ELSE 0.0 END AS alpha_frac,
                       len(list_intersect(
                           list_distinct(list_transform(ws, x -> lower(x))),
                           ['the','be','to','of','and','that','have','with']))
                           AS stop_hits,
                       len(t) - len(
                           regexp_replace(regexp_replace(regexp_replace(
                               regexp_replace(t,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '[PII]', 'g'),
                               '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[PII]', 'g'),
                               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                               '[PII]', 'g'),
                               '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b',
                               '[PII]', 'g')) AS dl
                FROM f
            )
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN n BETWEEN 50 AND 100000
                                  AND mean_len BETWEEN 3.0 AND 10.0
                                  AND (CASE WHEN n > 0
                                       THEN CAST(sym AS DOUBLE) / n
                                       ELSE 0.0 END) <= 0.1
                                  AND alpha_frac >= 0.8
                                  AND stop_hits >= 2
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
                   CAST(SUM(n) AS BIGINT) AS total_tokens,
                   CAST(SUM(dl) AS BIGINT) AS redacted_delta
            FROM g GROUP BY source ORDER BY source
        """,
        "between_time_events": """
            SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                   event_id, user_id
            FROM events
            WHERE strftime(ts, '%H:%M:%S.%g') >= '22:30:00.000'
               OR strftime(ts, '%H:%M:%S.%g') <= '02:15:00.000'
            ORDER BY event_id
        """,
        "pivot_customer_priority": """
            SELECT o_custkey,
                   CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN round(o_totalprice * 100, 0) END) AS BIGINT) AS p1,
                   CAST(MAX(CASE WHEN o_orderpriority = '2-HIGH'
                            THEN round(o_totalprice * 100, 0) END) AS BIGINT) AS p2,
                   CAST(MAX(CASE WHEN o_orderpriority = '3-MEDIUM'
                            THEN round(o_totalprice * 100, 0) END) AS BIGINT) AS p3,
                   CAST(MAX(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                            THEN round(o_totalprice * 100, 0) END) AS BIGINT) AS p4,
                   CAST(MAX(CASE WHEN o_orderpriority = '5-LOW'
                            THEN round(o_totalprice * 100, 0) END) AS BIGINT) AS p5
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        "epoch_mix_sources": """
            WITH f AS (
                SELECT doc_id, source,
                       -- CAST to DOUBLE: DuckDB would otherwise compute in
                       -- DECIMAL and diverge from Spark's IEEE double
                       CAST(0.3 AS DOUBLE) + CAST(0.35 AS DOUBLE)
                       * (CAST(substring(source, 4, 10) AS INT) % 4) AS fac
                FROM documents
            ), reps AS (
                SELECT doc_id, source, fac, CAST(e AS BIGINT) AS epoch
                FROM f, unnest(range(0, GREATEST(CAST(ceil(fac) AS BIGINT),
                                                 1))) AS t(e)
            )
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(SUM(epoch) AS BIGINT) AS epoch_sum
            FROM reps
            WHERE epoch < CAST(floor(fac) AS BIGINT)
               OR (epoch = CAST(floor(fac) AS BIGINT)
                   AND CAST(concat('0x', substring(
                            md5(CAST(doc_id AS VARCHAR) || '#'
                                || CAST(epoch AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1000000
                       < (fac - floor(fac)) * 1000000)
            GROUP BY source ORDER BY source
        """,
        "mix_budget_sources": r"""
            WITH t AS (
                SELECT doc_id, source,
                       len(regexp_split_to_array(trim(text), '\s+')) AS tok,
                       md5(CAST(doc_id AS VARCHAR)) AS h,
                       CAST(concat('0x', substring(
                            md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1024 AS b
                FROM documents
            ), c AS (
                SELECT doc_id, source, tok,
                       SUM(tok) OVER (PARTITION BY source
                                      ORDER BY b, h, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS run
                FROM t
            )
            SELECT doc_id, source, CAST(tok AS BIGINT) AS n_tokens
            FROM c WHERE run <= 600 ORDER BY doc_id
        """,
        "doc_pii_redaction": r"""
            WITH t AS (
                SELECT source,
                       text
                       || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
                               || CAST(doc_id AS VARCHAR) || '@example.com'
                          ELSE '' END
                       || CASE WHEN doc_id % 11 = 0 THEN ' host 10.0.'
                               || CAST(doc_id % 256 AS VARCHAR) || '.1'
                          ELSE '' END
                       || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789'
                          ELSE '' END
                       || CASE WHEN doc_id % 17 = 0 THEN ' call 555-867-5309'
                          ELSE '' END AS t
                FROM documents
            )
            SELECT source,
                   CAST(SUM(len(regexp_extract_all(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
                       AS n_email,
                   CAST(SUM(len(regexp_extract_all(t,
                        '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))) AS BIGINT) AS n_ssn,
                   CAST(SUM(len(regexp_extract_all(t,
                        '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) AS BIGINT)
                       AS n_ipv4,
                   CAST(SUM(len(regexp_extract_all(t,
                        '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b'))) AS BIGINT)
                       AS n_phone,
                   CAST(SUM(len(t) - len(
                        regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
                            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[PII]', 'g'),
                            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[PII]', 'g'),
                            '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '[PII]', 'g')))
                        AS BIGINT) AS redacted_delta
            FROM t GROUP BY source ORDER BY source
        """,
        "doc_decontaminate": """
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') AS s
                FROM tok, unnest(range(0, greatest(len(ws) - 3, 0) + 1)) AS t(i)
            ), ev AS (
                SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
            ), hits AS (
                SELECT sh.doc_id, COUNT(*) AS n
                FROM sh JOIN ev USING (s)
                WHERE sh.doc_id % 97 <> 0
                GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_ngrams,
                   COALESCE(h.n, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 97 <> 0
            ORDER BY d.doc_id
        """,
        "top_tokens_documents": """
            SELECT token, COUNT(*) AS n FROM (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                FROM documents
            ) WHERE len(token) >= 1
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
        """,
        "concat_axis1_nation_stats": """
            SELECT COALESCE(c.k, s.k) AS nationkey,
                   COALESCE(c.n_cust, 0) AS n_cust,
                   COALESCE(s.n_supp, 0) AS n_supp
            FROM (SELECT c_nationkey AS k, COUNT(c_custkey) AS n_cust
                  FROM customer GROUP BY 1) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS k, COUNT(s_suppkey) AS n_supp
                  FROM supplier GROUP BY 1) s
            ON c.k = s.k
        """,
        "streaming_sliding_events": """
            WITH x AS (
                SELECT date_trunc('hour', ts) AS w, event_id, value FROM events
                UNION ALL
                SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_id, value
                FROM events)
            SELECT w AS window_start, COUNT(event_id) AS n,
                   SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total
            FROM x GROUP BY 1
        """,
        "streaming_sessions_users": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 >= INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events)
            SELECT user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "hash_split_documents": """
            WITH b AS (
                SELECT n_chars,
                       CAST(concat('0x', substring(
                            md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 1000000 AS bkt
                FROM documents
            )
            SELECT CASE WHEN bkt < 800000 THEN 'train'
                        WHEN bkt < 900000 THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM b GROUP BY 1
        """,
        "stratified_sample_docs": """
            SELECT lang, COUNT(*) AS n,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                    doc_id ASC) AS rn
                FROM documents
            ) WHERE rn <= 50 GROUP BY lang
        """,
        # minhash_near_dup_pairs / simhash_near_dups / embedding_ann_lsh /
        # Replicates the pandas ewm(adjust=True) kernel recurrence
        # step-for-step (old_wt *= d; skip-if-equal; w = (old_wt*w + x) /
        # (old_wt + 1); old_wt += 1) so every double is produced by the
        # same IEEE ops in the same order as the engine's applyInPandas
        # path — bit-identical without any rounding basis.
        "ewm_price_per_customer": """
            WITH RECURSIVE o AS (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders WHERE o_custkey < 100
            ),
            r AS (
                SELECT o_custkey, o_orderkey, rn,
                       o_totalprice AS w, CAST(1.0 AS DOUBLE) AS ow
                FROM o WHERE rn = 1
                UNION ALL
                SELECT o.o_custkey, o.o_orderkey, o.rn,
                       CASE WHEN r.w = o.o_totalprice THEN r.w
                            ELSE (r.ow * 0.5 * r.w + o.o_totalprice)
                                 / (r.ow * 0.5 + 1.0) END,
                       r.ow * 0.5 + 1.0
                FROM r JOIN o ON o.o_custkey = r.o_custkey
                            AND o.rn = r.rn + 1
            )
            SELECT o_orderkey, o_custkey, w AS price_ewm FROM r
        """,
        "unstack_segment_counts": """
            WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
                       FROM customer GROUP BY 1, 2)
            SELECT c_nationkey,
                   MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN cnt END) AS "AUTOMOBILE",
                   MAX(CASE WHEN c_mktsegment = 'BUILDING'   THEN cnt END) AS "BUILDING",
                   MAX(CASE WHEN c_mktsegment = 'FURNITURE'  THEN cnt END) AS "FURNITURE",
                   MAX(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN cnt END) AS "HOUSEHOLD",
                   MAX(CASE WHEN c_mktsegment = 'MACHINERY'  THEN cnt END) AS "MACHINERY"
            FROM g GROUP BY c_nationkey
        """,
        "stack_nation_counts": """
            WITH cust AS (SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt
                          FROM customer GROUP BY 1),
                 supp AS (SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt
                          FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
            SELECT nk, 'cust_cnt' AS variable, cust_cnt AS value FROM cust
            UNION ALL
            SELECT c.nk, 'supp_cnt' AS variable, s.supp_cnt AS value
            FROM cust c JOIN supp s ON c.nk = s.nk
        """,
        "cumsum_running_revenue": """
            SELECT o_orderkey,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                       OVER (ORDER BY o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_price_c
            FROM orders WHERE o_custkey < 500
        """,
        "shift_diff_order_prices": """
            WITH o AS (SELECT o_orderkey,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
                       FROM orders WHERE o_custkey < 500)
            SELECT o_orderkey,
                   price_c - LAG(price_c) OVER (ORDER BY o_orderkey)
                       AS price_diff_c
            FROM o
        """,
        "grouped_rolling_orders": """
            WITH o AS (SELECT o_orderkey, o_custkey,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                AS price_c
                       FROM orders WHERE o_custkey < 300)
            SELECT o_orderkey, o_custkey,
                   CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderkey) >= 3
                        THEN SUM(price_c) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderkey
                                                ROWS BETWEEN 2 PRECEDING
                                                AND CURRENT ROW)
                   END AS roll_sum_c
            FROM o
        """,
        "rolling_minmax_orders": """
            WITH o AS (SELECT o_orderkey,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
                              ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
                       FROM orders WHERE o_custkey < 500)
            SELECT o_orderkey,
                   CASE WHEN rn >= 7 THEN
                       MIN(price_c) OVER (ORDER BY o_orderkey
                                          ROWS BETWEEN 6 PRECEDING
                                          AND CURRENT ROW)
                   END AS roll_min_c,
                   CASE WHEN rn >= 7 THEN
                       MAX(price_c) OVER (ORDER BY o_orderkey
                                          ROWS BETWEEN 6 PRECEDING
                                          AND CURRENT ROW)
                   END AS roll_max_c
            FROM o
        """,
        "rolling_revenue_orders": """
            WITH o AS (SELECT o_orderkey,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
                              ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
                       FROM orders WHERE o_custkey < 500)
            SELECT o_orderkey,
                   CASE WHEN rn >= 7 THEN
                       SUM(price_c) OVER (ORDER BY o_orderkey
                                          ROWS BETWEEN 6 PRECEDING
                                          AND CURRENT ROW)
                   END AS roll_price_c
            FROM o
        """,
        "resample_gapfill_user": """
            WITH t AS (
                SELECT date_trunc('day', ts) AS d,
                       COUNT(event_id) AS n,
                       SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v_sum_c
                FROM events WHERE user_id = 7 GROUP BY 1
            ), spine AS (
                SELECT unnest(generate_series(
                    (SELECT MIN(d) FROM t),
                    (SELECT MAX(d) FROM t),
                    INTERVAL 1 DAY)) AS d
            )
            SELECT strftime(spine.d, '%Y-%m-%d') AS day,
                   COALESCE(t.n, 0) AS n,
                   COALESCE(t.v_sum_c, 0) / 100.0 AS value_sum
            FROM spine LEFT JOIN t ON spine.d = t.d
        """,
        "streaming_view_purchase_join": """
            SELECT v.user_id,
                   v.event_id AS view_id,
                   p.event_id AS purchase_id
            FROM events v
            JOIN events p
              ON v.user_id = p.user_id
             AND p.ts >= v.ts
             AND p.ts <= v.ts + INTERVAL 1 HOUR
            WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        """,
        "describe_quantity": """
            WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem)
            SELECT 'count' AS stat, CAST(COUNT(x) AS DOUBLE) AS qty FROM t
            UNION ALL
            SELECT 'mean', CAST(SUM(x) AS DOUBLE) / COUNT(x) FROM t
            UNION ALL
            SELECT 'min', CAST(MIN(x) AS DOUBLE) FROM t
            UNION ALL
            SELECT '25%', quantile_cont(x, 0.25) FROM t
            UNION ALL
            SELECT '50%', quantile_cont(x, 0.50) FROM t
            UNION ALL
            SELECT '75%', quantile_cont(x, 0.75) FROM t
            UNION ALL
            SELECT 'max', CAST(MAX(x) AS DOUBLE) FROM t
        """,
        "cut_quantity_bins": """
            SELECT CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                        WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                        WHEN l_quantity > 25 AND l_quantity <= 40 THEN 'high'
                        WHEN l_quantity > 40 AND l_quantity <= 50 THEN 'top'
                   END AS bucket,
                   COUNT(l_orderkey) AS n
            FROM lineitem GROUP BY 1
        """,
        "get_dummies_segments": """
            SELECT c_nationkey,
                   CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_auto,
                   CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_buil,
                   CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_furn,
                   CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_hous,
                   CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_mach
            FROM customer GROUP BY c_nationkey
        """,
        "embedding_ann_lsh": """
            SELECT TRUE AS recall_ok
        """,
        "embedding_ann_ivf": """
            SELECT TRUE AS recall_ok
        """,
        "filter_label_parity": """
            SELECT idx AS orig_pos, l_orderkey, l_quantity
            FROM (SELECT row_number() OVER () - 1 AS idx, *
                  FROM lineitem)
            WHERE l_quantity > 48
        """,
        "dropna_label_parity": """
            SELECT idx AS orig_pos, c_custkey, bal
            FROM (SELECT row_number() OVER () - 1 AS idx, c_custkey,
                         CASE WHEN c_acctbal > 0 THEN c_acctbal END AS bal
                  FROM customer)
            WHERE bal IS NOT NULL
        """,
        "tail_label_parity": """
            SELECT idx AS orig_pos, o_orderkey, o_totalprice
            FROM (SELECT row_number() OVER () - 1 AS idx, *
                  FROM orders)
            WHERE idx >= (SELECT count(*) - 40 FROM orders)
        """,
        "corr_matrix_lineitem": """
            SELECT 'l_quantity' AS "column",
                   round(corr(l_quantity, l_quantity), 4) AS l_quantity,
                   round(corr(l_quantity, l_extendedprice), 4)
                       AS l_extendedprice,
                   round(corr(l_quantity, l_tax), 4) AS l_tax
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice',
                   round(corr(l_extendedprice, l_quantity), 4),
                   round(corr(l_extendedprice, l_extendedprice), 4),
                   round(corr(l_extendedprice, l_tax), 4)
            FROM lineitem
            UNION ALL
            SELECT 'l_tax',
                   round(corr(l_tax, l_quantity), 4),
                   round(corr(l_tax, l_extendedprice), 4),
                   round(corr(l_tax, l_tax), 4)
            FROM lineitem
        """,
        "groupby_filter_rows": """
            SELECT o_orderkey, o_custkey,
                   CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
            FROM orders
            WHERE o_custkey IN (SELECT o_custkey FROM orders
                                GROUP BY o_custkey HAVING COUNT(*) >= 8)
        """,
        "groupby_ohlc_orders": """
            WITH o AS (SELECT o_orderkey, o_custkey,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                  AS price_c
                       FROM orders)
            SELECT o_custkey,
                   arg_min(price_c, o_orderkey) AS price_c_open,
                   MAX(price_c) AS price_c_high,
                   MIN(price_c) AS price_c_low,
                   arg_max(price_c, o_orderkey) AS price_c_close
            FROM o GROUP BY o_custkey
        """,
        "interpolate_event_values": """
            WITH e AS (
              SELECT event_id,
                     CASE WHEN event_id % 7 = 0 THEN NULL
                          ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS v,
                     ROW_NUMBER() OVER (ORDER BY event_id) AS p
              FROM events WHERE user_id < 30
            ), m AS (
              SELECT event_id, v, p,
                     last_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS)
                       OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS pp,
                     last_value(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                                END IGNORE NULLS)
                       OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS pv,
                     first_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS)
                       OVER (ORDER BY p ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS np,
                     first_value(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                                 END IGNORE NULLS)
                       OVER (ORDER BY p ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS nv
              FROM e
            )
            SELECT event_id,
                   ROUND(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                              WHEN pp IS NULL THEN NULL
                              WHEN np IS NULL THEN pv
                              ELSE pv + (nv - pv) * (p - pp) / (np - pp)
                         END, 4) AS v
            FROM m
        """,
        "asfreq_hourly_user": """
            WITH h AS (
              SELECT date_trunc('hour', ts) AS ts,
                     MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS vmax
              FROM events WHERE user_id = 7 GROUP BY 1
            ), spine AS (
              SELECT unnest(generate_series((SELECT MIN(ts) FROM h),
                                            (SELECT MAX(ts) FROM h),
                                            INTERVAL 1 HOUR)) AS ts
            )
            SELECT s.ts, h.vmax
            FROM spine s ASOF LEFT JOIN h ON s.ts >= h.ts
        """,
        "factorize_priority_orders": """
            WITH firsts AS (
              SELECT o_orderpriority v, MIN(o_orderkey) f
              FROM orders GROUP BY 1
            ), coded AS (
              SELECT v, CAST(RANK() OVER (ORDER BY f) - 1 AS BIGINT) AS code
              FROM firsts
            )
            SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey, c.code
            FROM orders o JOIN coded c ON o.o_orderpriority = c.v
        """,
        "asof_lookup_orders": """
            WITH w(k) AS (VALUES (0), (10), (500), (123456), (99999999))
            SELECT CAST(k AS BIGINT) AS k,
                   ROUND((SELECT o_totalprice FROM orders o
                          WHERE o.o_orderkey <= w.k
                          ORDER BY o.o_orderkey DESC LIMIT 1), 2) AS price
            FROM w
        """,
        "sample_fraction_lineitem": """
            SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber
            FROM lineitem
            WHERE CAST(concat('0x', substring(md5(
                      concat(CAST(l_orderkey AS VARCHAR), '_',
                             CAST(l_linenumber AS VARCHAR))), 1, 8))
                  AS BIGINT) % 1000000 < 100000
        """,
        "nunique_approx_custkeys": """
            SELECT COUNT(DISTINCT o_custkey) AS exact_custkeys,
                   TRUE AS within_bound
            FROM orders
        """,
        # r8: the LAST rows-only gate converted — fixed-iteration GD
        # unrolled to nested CTEs (the PageRank exact-oracle pattern).
        # Every registry gate now carries an oracle_sql entry.
        "trained_quality_scorer": _gd_unrolled_sql(iters=5, lr=2.0),
    }
