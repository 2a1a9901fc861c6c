"""Engine-parity analytics beyond the TPC-H shapes.

Covers the SURVEY.md §2 inventory rows the reference engine supports but
its embedded TPC-H corpus never exercises: window functions (§2.5), set
operations (§2.7), grouping sets / rollup (§2.4), inline VALUES tables
(§2.1 MemTable / CREATE TABLE AS VALUES), URL-table sugar (§2.1
``enable_url_table``, ``src/db.rs`` / ``local.rs:101``), DISTINCT
aggregates, and pivot-style conditional aggregation.

Window/rollup queries are written in SQL on registered views — the SQL
surface is itself part of the parity contract (the reference is
SQL-first); Catalyst compiles them to the same plans as the DataFrame
API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables, register_views, table_path
from ..registry import query


# --------------------------------------------------------------------------
# Window functions — ranking
# --------------------------------------------------------------------------
@query(
    "window_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) ranked
        WHERE rn <= 3
    """,
    tags=("window", "topk"),
    doc="Top-3 orders per customer via row_number — the canonical top-k-per-group.",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_dense",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal, rnk, drnk
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   rank()       OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal) DESC, c_custkey) AS rnk,
                   dense_rank() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal) DESC, c_custkey) AS drnk
            FROM customer
        ) r WHERE rnk <= 5
    """,
    tags=("window",),
    doc="rank/dense_rank per nation over rounded balances (exercises rank semantics with ties).",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(F.round("c_acctbal").desc(), F.asc("c_custkey"))
    return (
        cust.withColumn("rnk", F.rank().over(w).cast("long"))
        .withColumn("drnk", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk", "drnk")
    )


# --------------------------------------------------------------------------
# Window functions — frames (running / moving aggregates)
# --------------------------------------------------------------------------
@query(
    "window_running_total",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_extendedprice) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
               round(avg(l_extendedprice) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS moving_avg
        FROM lineitem
        WHERE l_suppkey <= 5
    """,
    tags=("window", "frame"),
    doc="Cumulative and 4-row moving aggregates over an explicit ROWS frame.",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") <= 5)
    order = [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = W.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_extendedprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_rev"),
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-3, W.currentRow)) + 1e-9, 4).alias(
            "moving_avg"
        ),
    )


@query(
    "window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey,
               datediff('day', lag(o_orderdate) OVER w, o_orderdate)  AS days_since_prev,
               datediff('day', o_orderdate, lead(o_orderdate) OVER w) AS days_until_next
        FROM orders
        WHERE o_custkey <= 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
    doc="lag/lead navigation: gaps between consecutive orders per customer.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"].filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
        F.datediff(nxt, F.col("o_orderdate")).cast("long").alias("days_until_next"),
    )


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------
@query(
    "setop_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
    doc="INTERSECT: nations that have both customers and suppliers.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@query(
    "setop_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
    doc="EXCEPT: nations with customers but no suppliers.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@query(
    "setop_union_all",
    oracle="""
        SELECT party, nationkey, count(*) AS n FROM (
            SELECT 'customer' AS party, c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT 'supplier' AS party, s_nationkey AS nationkey FROM supplier
        ) u
        GROUP BY party, nationkey
    """,
    tags=("setop",),
    doc="UNION ALL of tagged relations + re-aggregation.",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.lit("customer").alias("party"), F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.lit("supplier").alias("party"), F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("party", "nationkey").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube (§2.4)
# --------------------------------------------------------------------------
@query(
    "rollup_revenue",
    oracle="""
        SELECT r_name, n_name,
               round(sum(s_acctbal), 2) AS total_bal,
               count(*) AS n_suppliers,
               CAST(grouping(r_name) AS INTEGER) AS g_region,
               CAST(grouping(n_name) AS INTEGER) AS g_nation
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("rollup",),
    doc="ROLLUP hierarchy region→nation with GROUPING indicators.",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name, n_name,
               round(sum(s_acctbal), 2) AS total_bal,
               count(*) AS n_suppliers,
               CAST(grouping(r_name) AS INT) AS g_region,
               CAST(grouping(n_name) AS INT) AS g_nation
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        """
    )


@query(
    "grouping_sets_orders",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("rollup",),
    doc="Explicit GROUPING SETS with a grand-total set.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "cube_lineitem",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("rollup",),
    doc="CUBE over the Q1 grouping keys (all 2^2 grouping sets).",
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# Inline VALUES (§2.1 MemTable / CREATE TABLE AS VALUES) and URL table
# --------------------------------------------------------------------------
@query(
    "values_inline",
    oracle="""
        SELECT t.id, t.name, n AS doubled FROM (VALUES (1, 'a', 2), (2, 'b', 4), (3, 'c', 6)) t(id, name, n)
    """,
    tags=("values",),
    doc="Inline VALUES relation (reference: CREATE TABLE ... AS VALUES, cli_cases/basic.rs:245-262).",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        "SELECT id, name, doubled FROM VALUES (1, 'a', 2), (2, 'b', 4), (3, 'c', 6) AS t(id, name, doubled)"
    )


@query(
    "url_table_scan",
    oracle="""
        SELECT count(*) AS n_rows, round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem
    """,
    tags=("url-table",),
    doc="Query a file path directly — Spark's `parquet.`path`` sugar, matching the "
    "reference's enable_url_table SELECT ... FROM 'file' (local.rs:101).",
)
def url_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = table_path(sf_dir, "lineitem")
    return spark.sql(
        f"SELECT count(*) AS n_rows, round(sum(l_extendedprice), 2) AS total_price "
        f"FROM parquet.`{path}`"
    )


# --------------------------------------------------------------------------
# DISTINCT aggregates + conditional aggregation (pivot-style)
# --------------------------------------------------------------------------
@query(
    "distinct_aggregates",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey)  AS n_parts,
               count(DISTINCT l_suppkey)  AS n_supps,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("aggregate", "distinct"),
    doc="Multiple COUNT(DISTINCT) in one aggregate (expand-based plan).",
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_total,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_total,
               round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS partial_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("pivot",),
    doc="Pivot via DataFrame .pivot() with explicit value list (conditional-agg plan).",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("open_total"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("finished_total"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("partial_total"),
    )


# --------------------------------------------------------------------------
# Cross join (CrossJoinExec parity, stats.rs:699) kept deliberately tiny.
# --------------------------------------------------------------------------
@query(
    "cross_join_regions",
    oracle="""
        SELECT a.r_name AS from_region, b.r_name AS to_region
        FROM region a, region b
        WHERE a.r_regionkey <> b.r_regionkey
    """,
    tags=("join", "cross"),
    doc="Cartesian product of a small dim with itself (CrossJoinExec shape).",
)
def cross_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_tables(spark, sf_dir)["region"]
    a = r.select(F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("ak") != F.col("bk")).select("from_region", "to_region")
