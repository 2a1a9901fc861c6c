"""TPC-H-flavored query suite, adapted to the driver's corpus.

The reference embeds TPC-H Q1-Q22 verbatim (`src/server/http/tpch.rs:18-711`).
The driver's testdata is TPC-H-*ish*: no ``partsupp`` table, and several
columns are absent (l_commitdate/l_receiptdate/l_shipmode, o_shippriority,
c_phone, ...). Each query below keeps the *operator shape* of its TPC-H
namesake — the join graph, subquery pattern, aggregation style — re-cut to
the available columns. Queries whose defining table is missing (Q2, Q11,
Q16, Q20 need partsupp) are replaced by nearby shapes or dropped; the rest
map 1:1.

Implementation style is DataFrame-first (Catalyst picks broadcast vs
sort-merge joins, pushes predicates into the parquet scan, decorrelates
nothing because we pre-join aggregates explicitly where the reference
relies on engine decorrelation — same plan Catalyst would produce).

Scale notes (100 TB thinking), which apply corpus-wide:
- dimension tables (region/nation/supplier/part/customer) are broadcast —
  either by Catalyst's threshold or an explicit ``F.broadcast``;
- fact-fact joins (orders x lineitem) shuffle on the join key only after
  filters have been pushed below the join;
- aggregates are declared once; Spark runs partial (map-side) + final
  hash aggregation automatically;
- every double aggregate is rounded in BOTH the Spark build and the
  DuckDB oracle so cross-engine float summation order can't flip a hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import query


def TS(s: str) -> Column:
    return F.lit(s).cast("timestamp")


def R2(c: Column) -> Column:
    return F.round(c, 2)


def R4(c: Column) -> Column:
    """Round to 4 decimals with a +1e-9 nudge, mirrored in every oracle.

    Averages of 2-decimal money over small counts land *exactly* on
    4-decimal half boundaries (e.g. 357.13/8 = 44.64125); Spark
    (BigDecimal HALF_UP on the shortest repr) and DuckDB (libm on the
    raw double) can resolve the half differently. The nudge moves exact
    halves decisively above the boundary in both engines; non-boundary
    values (≥5e-7 away on the data's rational grid) are unaffected.
    """
    return F.round(c + 1e-9, 4)


def _revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q1 — pricing summary report (scan → filter → project → agg → sort)
# Reference: src/server/http/tpch.rs:18-39
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity) + 1e-9, 4)                                        AS avg_qty,
               round(avg(l_extendedprice) + 1e-9, 4)                                   AS avg_price,
               round(avg(l_discount) + 1e-9, 4)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "aggregate"),
    doc="TPC-H Q1: full-scan hash aggregate with 8 aggregates over 2 group keys.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= TS("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            R2(F.sum("l_quantity")).alias("sum_qty"),
            R2(F.sum("l_extendedprice")).alias("sum_base_price"),
            R2(F.sum(_revenue())).alias("sum_disc_price"),
            R2(F.sum(_revenue() * (1 + F.col("l_tax")))).alias("sum_charge"),
            R4(F.avg("l_quantity")).alias("avg_qty"),
            R4(F.avg("l_extendedprice")).alias("avg_price"),
            R4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar MIN subquery). tpch.rs:41-85
# needs partsupp; the adaptation keeps the defining shape — for each group,
# the row whose value equals a correlated aggregate minimum.
# --------------------------------------------------------------------------
@query(
    "q02_min_cost_supplier",
    oracle="""
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal, n_name
        FROM supplier s JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
    """,
    tags=("tpch", "correlated-subquery"),
    doc="TPC-H Q2 shape (no partsupp): per-nation minimum via correlated "
    "scalar subquery -> pre-aggregated self-join.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    supp = t["supplier"]
    mins = supp.groupBy(F.col("s_nationkey").alias("mn_key")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        supp.join(F.broadcast(mins), (supp.s_nationkey == F.col("mn_key")) & (supp.s_acctbal == F.col("min_bal")))
        .join(F.broadcast(t["nation"]), supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority (3-way join, top-k).  tpch.rs:87-110; o_shippriority
# absent from corpus, dropped from the select list.
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
    doc="TPC-H Q3: customer⋈orders⋈lineitem with date band, top-10 by revenue.",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < TS("1998-03-15"))
    li = t["lineitem"].filter(F.col("l_shipdate") > TS("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(R2(F.sum(_revenue())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi join). tpch.rs:112-135.
# Corpus lacks l_commitdate/l_receiptdate; the EXISTS predicate becomes
# "some line shipped more than 30 days after the order date".
# --------------------------------------------------------------------------
@query(
    "q04_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi-join"),
    doc="TPC-H Q4: EXISTS correlated subquery → left-semi join, count by priority.",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1996-07-01"))
    )
    li = t["lineitem"]
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join through region). tpch.rs:137-163.
# --------------------------------------------------------------------------
@query(
    "q05_local_supplier",
    oracle="""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q5: six-table star join restricted by region, revenue per nation.",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1997-01-01"))
    )
    li = t["lineitem"]
    supp = t["supplier"]
    cust = t["customer"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(R2(F.sum(_revenue())).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-filter-agg). tpch.rs:165-178.
# --------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "filter"),
    doc="TPC-H Q6: selective filter (pushed to parquet) + single global agg.",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= TS("1996-01-01"))
        & (F.col("l_shipdate") < TS("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(R2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations. tpch.rs:180-214.
# --------------------------------------------------------------------------
@query(
    "q07_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q7: bilateral trade volume, double nation join + year bucket.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(TS("1996-01-01"), TS("1997-12-31"))
    )
    joined = (
        li.join(t["orders"], li.l_orderkey == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(R2(F.sum("volume")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share (8-way join, conditional agg ratio).
# tpch.rs:216-258; p_type filter adapted to corpus single-word types.
# --------------------------------------------------------------------------
@query(
    "q08_market_share",
    oracle="""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                     / sum(volume) + 1e-9, 4) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
              AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
    """,
    tags=("tpch", "join", "case-when"),
    doc="TPC-H Q8: market-share ratio via CASE WHEN over an 8-table join.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "AMERICA")
    n1 = t["nation"].join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("n1_key")
    )
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    part = t["part"].filter(F.col("p_type") == "ECONOMY")
    li = t["lineitem"]
    joined = (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(t["orders"], li.l_orderkey == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "inner")
        .join(F.broadcast(t["supplier"]), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _revenue()
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            R4(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 — product type profit (adapted: corpus has no partsupp, so profit =
# discounted revenue; keeps the LIKE filter + 5-way join + (nation, year)
# rollup shape of tpch.rs:260-300).
# --------------------------------------------------------------------------
@query(
    "q09_product_profit",
    oracle="""
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS amount
            FROM part, supplier, lineitem, orders, nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "like"),
    doc="TPC-H Q9 (no-partsupp adaptation): LIKE-filtered parts, profit by nation/year.",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_name").like("%red%"))
    li = t["lineitem"]
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(t["orders"], li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            _revenue().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(R2(F.sum("amount")).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned item reporting (top-20 customers by lost revenue).
# tpch.rs:302-337; c_address/c_phone/c_comment absent → dropped.
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
    doc="TPC-H Q10: returned-items revenue per customer, top-20.",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= TS("1996-10-01")) & (F.col("o_orderdate") < TS("1997-01-01"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t["customer"], orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(R2(F.sum(_revenue())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification (HAVING vs global scalar subquery).
# tpch.rs:339-355 needs partsupp; value = extendedprice*quantity here.
# --------------------------------------------------------------------------
@query(
    "q11_important_stock",
    oracle="""
        SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
        FROM lineitem
        GROUP BY l_partkey
        HAVING sum(l_extendedprice * l_quantity) >
               (SELECT 1.5 * sum(l_extendedprice * l_quantity)
                           / count(DISTINCT l_partkey) FROM lineitem)
    """,
    tags=("tpch", "having", "scalar-subquery"),
    doc="TPC-H Q11 shape: parts whose inventory value exceeds 1.5x the "
    "average part value (HAVING against a scalar subquery; the multiplier "
    "is scale-free so the result is non-empty at every SF).",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("raw_value"))
    total = li.agg((1.5 * F.sum(val) / F.countDistinct("l_partkey")).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("l_partkey", R2(F.col("raw_value")).alias("value"))
    )


# --------------------------------------------------------------------------
# Q12 — shipping-delay analysis (adapted: corpus lacks l_shipmode, the
# grouping becomes o_orderpriority and "late" = shipped >60d after order;
# keeps Q12's join + conditional-count shape, tpch.rs:357-385).
# --------------------------------------------------------------------------
@query(
    "q12_late_shipments",
    oracle="""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
               count(*) AS total_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "case-when"),
    doc="TPC-H Q12 adaptation: conditional counts of late lineitems by priority.",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1997-01-01"))
    )
    li = t["lineitem"]
    late = F.when(
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"), 1
    ).otherwise(0)
    return (
        orders.join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(late).alias("late_count"), F.count(F.lit(1)).alias("total_count"))
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join with extra join
# predicate, two-level aggregation). tpch.rs:387-410; o_comment absent →
# the exclusion predicate becomes o_orderstatus <> 'P'.
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderstatus <> 'P'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    tags=("tpch", "outer-join"),
    doc="TPC-H Q13: left-outer join + double aggregation histogram.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    orders = t["orders"]
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus != "P")
    return (
        cust.join(orders, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q14 — promotion effect (join + CASE ratio). tpch.rs:412-431.
# --------------------------------------------------------------------------
@query(
    "q14_promo_effect",
    oracle="""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("tpch", "case-when"),
    doc="TPC-H Q14: promo revenue share for one month.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= TS("1996-09-01")) & (F.col("l_shipdate") < TS("1996-10-01"))
    )
    rev = _revenue()
    return (
        li.join(F.broadcast(t["part"]), li.l_partkey == F.col("p_partkey"))
        .agg(
            R4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (view/CTE + scalar max subquery). tpch.rs:429-462
# (the reference creates and drops view revenue0; we use a CTE-shaped
# DataFrame reused for both the per-supplier revenue and its max).
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
        WITH revenue0 AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue0
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    tags=("tpch", "subquery", "view"),
    doc="TPC-H Q15: revenue view + scalar max subquery to find the top supplier.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= TS("1996-01-01")) & (F.col("l_shipdate") < TS("1996-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(R2(F.sum(_revenue())).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_rev)
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship (NOT IN subquery + multi-key DISTINCT
# count). tpch.rs:464-496 uses partsupp; lineitem stands in as the
# part-supplier relation.
# --------------------------------------------------------------------------
@query(
    "q16_parts_supplier",
    oracle="""
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "anti-join", "distinct"),
    doc="TPC-H Q16 shape: NOT IN exclusion subquery + DISTINCT supplier "
    "count per (brand, type, size).",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    li = t["lineitem"].join(
        F.broadcast(bad_supp), F.col("l_suppkey") == F.col("bad_key"), "left_anti"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated scalar agg subquery →
# pre-aggregated join, the plan Catalyst's decorrelation produces anyway).
# tpch.rs:498-516; brand/container filter adapted to corpus columns.
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity",
    oracle="""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#1'
          AND p_size < 15
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey)
    """,
    tags=("tpch", "correlated-subquery"),
    doc="TPC-H Q17: correlated avg subquery — small orders below 20% of part average.",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    part = t["part"].filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15))
    # Decorrelated form: per-part avg over the full lineitem, joined back.
    part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(part_avg, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(R2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (IN over HAVING subquery). tpch.rs:518-560.
# --------------------------------------------------------------------------
@query(
    "q18_large_volume",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    tags=("tpch", "semi-join", "having"),
    doc="TPC-H Q18: orders whose total quantity exceeds 300 (IN + HAVING).",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(t["orders"], li.l_orderkey == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(R2(F.sum("l_quantity")).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate).
# tpch.rs:562-597; shipmode/shipinstruct absent → brand/size/qty bands only.
# --------------------------------------------------------------------------
@query(
    "q19_discounted_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40))
    """,
    tags=("tpch", "filter"),
    doc="TPC-H Q19: OR-of-ANDs join predicate over brand/size/quantity bands.",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    part = t["part"]
    joined = li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(cond).agg(R2(F.sum(_revenue())).alias("revenue"))


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN chains + HAVING).
# tpch.rs:651-671 shape without partsupp: suppliers who moved serious
# volume of red parts in 1997.
# --------------------------------------------------------------------------
@query(
    "q20_potential_promotion",
    oracle="""
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 100)
    """,
    tags=("tpch", "semi-join", "having"),
    doc="TPC-H Q20 shape: nested IN chains (supplier <- lineitem <- part) "
    "with a HAVING volume threshold.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    red_parts = t["part"].filter(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("rp_key")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= TS("1997-01-01")) & (F.col("l_shipdate") < TS("1998-01-01"))
    )
    movers = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("rp_key"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select(F.col("l_suppkey").alias("mover_key"))
    )
    return (
        t["supplier"]
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("mover_key"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS with
# inequality correlation). tpch.rs:599-649; commit/receipt dates absent →
# "waiting" = shipped >45d after order date and latest among the order's
# multi-supplier lines.
# --------------------------------------------------------------------------
@query(
    "q21_suppliers_waiting",
    oracle="""
        SELECT s_name, n_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
          AND s_nationkey = n_nationkey
        GROUP BY s_name, n_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    tags=("tpch", "semi-join", "anti-join"),
    doc="TPC-H Q21: EXISTS/NOT EXISTS pair → left-semi + left-anti joins.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = (
        l1.join(orders, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l1.l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY"))
    )
    with_other = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    latest = with_other.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        latest.join(F.broadcast(t["supplier"]), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar avg subquery + NOT EXISTS
# anti-join). tpch.rs:651-711; c_phone absent → group by nation key.
# --------------------------------------------------------------------------
@query(
    "q22_global_sales",
    oracle="""
        SELECT c_nationkey AS nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY c_nationkey
    """,
    tags=("tpch", "anti-join", "scalar-subquery"),
    doc="TPC-H Q22: above-average-balance customers dormant since 1998, by nation.",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    recent = t["orders"].filter(F.col("o_orderdate") >= TS("1998-01-01"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("numcust"), R2(F.sum("c_acctbal")).alias("totacctbal"))
    )
