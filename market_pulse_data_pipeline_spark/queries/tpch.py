"""TPC-H-shaped analytical queries — the engine's headline scan/join/agg
workload for bench.py. Same decimal-exact-sum discipline as everywhere
else so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.queries.common import (
    register,
    round_avg,
    round_sum,
    sql_round_avg,
    sql_round_sum,
    t,
)

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_round_sum('l_quantity', 6, 2)} AS sum_qty,
           {sql_round_sum('l_extendedprice', 6, 2)} AS sum_base_price,
           {sql_round_sum(_REVENUE, 6, 2)} AS sum_disc_price,
           {sql_round_sum(f'{_REVENUE} * (1 + l_tax)', 6, 2)} AS sum_charge,
           {sql_round_avg('l_quantity', 6, 4)} AS avg_qty,
           {sql_round_avg('l_extendedprice', 6, 4)} AS avg_price,
           {sql_round_avg('l_discount', 6, 6)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="full-scan groupBy-agg with derived expressions (TPC-H Q1 shape)",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_sum(F.col("l_quantity"), 6, 2).alias("sum_qty"),
            round_sum(F.col("l_extendedprice"), 6, 2).alias("sum_base_price"),
            round_sum(revenue, 6, 2).alias("sum_disc_price"),
            round_sum(revenue * (1 + F.col("l_tax")), 6, 2).alias("sum_charge"),
            round_avg(F.col("l_quantity"), 6, 4).alias("avg_qty"),
            round_avg(F.col("l_extendedprice"), 6, 4).alias("avg_price"),
            round_avg(F.col("l_discount"), 6, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {sql_round_sum(_REVENUE, 6, 2)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    bench=True,
    doc="3-way join + agg + deterministic top-k (TPC-H Q3 shape); customer "
    "side broadcast",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round_sum(revenue, 6, 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    bench=True,
    doc="correlated EXISTS → left-semi join + agg (TPC-H Q4 shape)",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {sql_round_sum('l_extendedprice * l_discount', 6, 2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    doc="selective filter + global sum (TPC-H Q6 shape) — every predicate "
    "pushed to the parquet scan",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_sum(F.col("l_extendedprice") * F.col("l_discount"), 6, 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    bench=True,
    doc="join + conditional counts (TPC-H Q12 shape)",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           {sql_round_sum(_REVENUE, 6, 2)} AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    bench=True,
    doc="4-way join + group + deterministic top-k of lossy customers "
    "(TPC-H Q10 shape)",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round_sum(revenue, 6, 2).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    f"""
    SELECT CAST(ROUND(
             100.00 * SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST({_REVENUE} AS DECIMAL(20,6)) ELSE 0 END)
             / SUM(CAST({_REVENUE} AS DECIMAL(20,6))), 6) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="broadcast join + conditional-sum ratio (TPC-H Q14 shape); exact "
    "decimal sums, one final double division",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = t(spark, sf_dir, "part")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(20,6)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.00 * F.sum(promo) / F.sum(revenue), 6)
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q5_local_supplier",
    f"""
    SELECT n_name, {sql_round_sum(_REVENUE, 6, 2)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    bench=True,
    doc="6-way star join + agg (TPC-H Q5 shape); dims broadcast, fact never "
    "shuffled before the group-by",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(round_sum(revenue, 6, 2).alias("revenue"))
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    bench=True,
    doc="left outer join + two-level count distribution (TPC-H Q13 shape): "
    "orders per customer including zero-order customers, then how many "
    "customers have each count. The outer join keeps customers with no "
    "(qualifying) orders; COUNT(o_orderkey) counts non-nulls. The "
    "comment-based exclusion of the original is stood in by an "
    "orderpriority predicate (fixture has no o_comment).",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="distinct-aggregate + NOT IN exclusion subquery (TPC-H Q16 shape): "
    "distinct suppliers per (brand, type, size) over the lineitem "
    "part-supplier relation (fixture has no partsupp), excluding "
    "suppliers flagged by the subquery (negative acctbal stands in for "
    "the original's complaint-comment filter). NOT IN over a non-null "
    "key plans as a left-anti join on the small broadcast side.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    li = t(spark, sf_dir, "lineitem")
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q22_dormant_rich_customers",
    f"""
    WITH thr AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS s, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_round_sum('c_acctbal', 6, 2)} AS totacctbal
    FROM customer, thr
    WHERE CAST(c_acctbal AS DECIMAL(20,6)) * cnt > s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
    doc="anti-join + scalar aggregate subquery (TPC-H Q22 shape): "
    "customers with above-average positive balance and no recent (1998+) "
    "orders, grouped by nation (fixture has no phone prefix). The boundary "
    "predicate is evaluated as c_acctbal * cnt > sum on exact decimals "
    "— algebraically identical to c_acctbal > avg but immune to "
    "engine-specific float summation order at the comparison boundary. "
    "The 1-row aggregate is broadcast; the anti-join is the plan's only "
    "shuffle on customer.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-01-01"
    )
    dec = F.col("c_acctbal").cast("decimal(20,6)")
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(dec).alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    dormant = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        dormant.crossJoin(F.broadcast(thr))
        .filter(dec * F.col("cnt") > F.col("s"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_sum(F.col("c_acctbal"), 6, 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_round_sum('volume', 6, 2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {_REVENUE} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="bidirectional two-nation trade volume by year (TPC-H Q7 shape): "
    "disjunctive join predicate over two nation aliases + year "
    "extraction + group. Dims broadcast; lineitem is never shuffled "
    "before the final aggregation.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    pair = (
        (F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2")
    ) | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(round_sum(volume, 6, 2).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           CAST(ROUND(
             SUM(CASE WHEN supp_nation = 'NATION_1'
                 THEN CAST({_REVENUE} AS DECIMAL(20,6)) ELSE 0 END)
             / SUM(CAST({_REVENUE} AS DECIMAL(20,6))), 6) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice, l_discount, n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
    doc="national market share inside a regional market (TPC-H Q8 "
    "shape): 8-way star join, conditional decimal sums, one final "
    "double division per year. All dims broadcast.",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev_d = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    nation_rev = F.when(F.col("n1.n_name") == "NATION_1", rev_d).otherwise(
        F.lit(0).cast("decimal(20,6)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .join(F.broadcast(region), F.col("n2.n_regionkey") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.sum(nation_rev) / F.sum(rev_d), 6)
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="large-volume-order customers (TPC-H Q18 shape): IN over a "
    "grouped HAVING subquery (semi join against the qualifying order "
    "keys) + 3-way join + deterministic top-k. The HAVING threshold is "
    "evaluated on exact decimal sums so the qualifying set is identical "
    "across engines regardless of float summation order.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    qty_d = F.col("l_quantity").cast("decimal(20,6)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_d).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(qty_d).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT {sql_round_sum(_REVENUE, 6, 2)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="disjunctive multi-clause join filter (TPC-H Q19 shape): three "
    "OR'd predicate groups spanning both join sides. Catalyst projects "
    "the disjunction onto EACH side and pushes both projections into "
    "the parquet scans (verified: the lineitem scan carries the OR of "
    "quantity ranges, the part scan the OR of brand+size groups), so "
    "only rows satisfying some clause per side ever reach the join.",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qty = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(round_sum(revenue, 6, 2).alias("revenue"))
    )
