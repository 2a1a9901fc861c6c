"""Engine-parity analytics beyond the TPC-H shapes.

Covers the SURVEY.md §2 inventory rows the reference engine supports
but its embedded TPC-H corpus never exercises: set operations (§2.7),
grouping sets / rollup / cube (§2.4), DISTINCT aggregates, pivot +
unpivot round trip, and cross join. Window functions live in
``windows_ext.py``; inline VALUES and URL-table sugar are folded into
``view_lifecycle`` (lifecycle.py).

Round-2 verdict directive #1: the driver correctness-checks only the
alphabetically-first 50 registered queries, so each family here is ONE
consolidated oracle-checked query (set operations tagged and unioned,
the three grouping shapes coerced to a common schema) instead of one
query per variant — zero dark §2 surface.

Grouping/rollup queries are written in SQL on registered views — the
SQL surface is itself part of the parity contract (the reference is
SQL-first); Catalyst compiles them to the same plans as the DataFrame
API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables, register_views
from ..registry import query


# --------------------------------------------------------------------------
# Set operations (§2.7) — INTERSECT / EXCEPT / UNION ALL in one tagged query
# --------------------------------------------------------------------------
@query(
    "setop_suite",
    oracle="""
        SELECT 'intersect' AS op, nationkey, CAST(NULL AS BIGINT) AS n
        FROM (SELECT c_nationkey AS nationkey FROM customer
              INTERSECT
              SELECT s_nationkey FROM supplier) i
        UNION ALL
        SELECT 'except' AS op, nationkey, CAST(NULL AS BIGINT) AS n
        FROM (SELECT c_nationkey AS nationkey FROM customer
              EXCEPT
              SELECT s_nationkey FROM supplier) e
        UNION ALL
        SELECT 'all_' || party AS op, nationkey, count(*) AS n
        FROM (SELECT 'customer' AS party, c_nationkey AS nationkey FROM customer
              UNION ALL
              SELECT 'supplier' AS party, s_nationkey AS nationkey FROM supplier) u
        GROUP BY party, nationkey
    """,
    tags=("setop",),
    doc="All three set operations in one tagged relation: INTERSECT (nations "
    "with both parties), EXCEPT (customers-only nations), and UNION ALL of "
    "tagged relations re-aggregated. Consolidates setop_intersect/"
    "setop_except/setop_union_all under one driver-checked query.",
)
def setop_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    null_n = F.lit(None).cast("long").alias("n")
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey", null_n)
    # subtract() is EXCEPT DISTINCT (exceptAll().distinct() is NOT — bag semantics).
    exc = c.subtract(s).select(F.lit("except").alias("op"), "nationkey", null_n)
    tagged = t["customer"].select(
        F.lit("customer").alias("party"), F.col("c_nationkey").alias("nationkey")
    ).unionAll(
        t["supplier"].select(F.lit("supplier").alias("party"), F.col("s_nationkey").alias("nationkey"))
    )
    ua = (
        tagged.groupBy("party", "nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat(F.lit("all_"), F.col("party")).alias("op"), "nationkey", "n")
    )
    return inter.unionByName(exc).unionByName(ua)


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube (§2.4) — one query, three grouping shapes
# --------------------------------------------------------------------------
@query(
    "grouping_sets_suite",
    oracle="""
        SELECT 'rollup_supplier' AS branch, r_name AS key1, n_name AS key2,
               count(*) AS n, round(sum(s_acctbal), 2) AS total,
               CAST(grouping(r_name) AS INTEGER) AS g1,
               CAST(grouping(n_name) AS INTEGER) AS g2
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        UNION ALL
        SELECT 'cube_lineitem' AS branch, l_returnflag AS key1, l_linestatus AS key2,
               count(*) AS n, round(sum(l_quantity), 2) AS total,
               CAST(grouping(l_returnflag) AS INTEGER) AS g1,
               CAST(grouping(l_linestatus) AS INTEGER) AS g2
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'gsets_orders' AS branch, o_orderstatus AS key1, o_orderpriority AS key2,
               count(*) AS n, round(sum(o_totalprice), 2) AS total,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g1,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g2
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("rollup", "cube", "grouping-sets"),
    doc="ROLLUP (region→nation hierarchy), CUBE (all 2^2 sets over the Q1 "
    "keys), and explicit GROUPING SETS with a grand total — three branches "
    "coerced to one (branch, key1, key2, n, total, g1, g2) schema so the "
    "whole §2.4 multi-grouping family is driver-checked by one query.",
)
def grouping_sets_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'rollup_supplier' AS branch, r_name AS key1, n_name AS key2,
               count(*) AS n, round(sum(s_acctbal), 2) AS total,
               CAST(grouping(r_name) AS INT) AS g1,
               CAST(grouping(n_name) AS INT) AS g2
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        UNION ALL
        SELECT 'cube_lineitem', l_returnflag, l_linestatus,
               count(*), round(sum(l_quantity), 2),
               CAST(grouping(l_returnflag) AS INT),
               CAST(grouping(l_linestatus) AS INT)
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'gsets_orders', o_orderstatus, o_orderpriority,
               count(*), round(sum(o_totalprice), 2),
               CAST(grouping(o_orderstatus) AS INT),
               CAST(grouping(o_orderpriority) AS INT)
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# DISTINCT aggregates
# --------------------------------------------------------------------------
@query(
    "distinct_aggregates",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey)  AS n_parts,
               count(DISTINCT l_suppkey)  AS n_supps,
               count(*) AS n_rows,
               median(l_quantity) AS exact_p50_qty,
               true AS approx_orders_ok,
               true AS approx_p50_ok
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("aggregate", "distinct", "approx"),
    doc="Multiple COUNT(DISTINCT) in one aggregate (expand-based plan), plus "
    "the approximate-aggregate surface at the same l_returnflag grain: an "
    "exact percentile (on integer-valued l_quantity — interpolated "
    "midpoints are exact in IEEE-754, so engines agree bit-for-bit) and "
    "the HLL++/percentile_approx sketches. Sketch outputs are "
    "implementation-specific, so their oracle contract is the tolerance "
    "bound itself (approx within 5% of exact -> literal true); raw sketch "
    "values are additionally asserted in tests/test_approx.py.",
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 (guide §2): this previously joined in approx_aggregates_raw,
    # whose `distinct` sub-aggregate recomputed countDistinct(l_orderkey)
    # over a fifth full lineitem scan — but `base` already computes the
    # identical value as n_orders, so the tolerance flags compare
    # against it directly (one Expand-based aggregate pass instead of
    # two; approx_aggregates_raw itself is unchanged for its other
    # consumers). Same aggregates, same rounding, identical results.
    from ..operators.percentiles import percentile_exact_refine

    li = load_tables(spark, sf_dir)["lineitem"]
    base = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # exact_p50 / the sketch pair keep approx_aggregates_raw's split
    # rationale verbatim: COUNT(DISTINCT) plans via Expand, typed-buffer
    # aggregates sharing that Aggregate would degrade to a
    # sort-aggregate over the expanded rows (see lifecycle.py).
    pctl = percentile_exact_refine(
        li, ["l_returnflag"], "l_extendedprice", 0.5, "exact_p50"
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact_p50_qty"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
    )
    return (
        base.join(pctl, "l_returnflag")
        .join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "n_orders",
            "n_parts",
            "n_supps",
            "n_rows",
            "exact_p50_qty",
            (
                F.abs(F.col("approx_orders") - F.col("n_orders"))
                <= F.greatest(0.05 * F.col("n_orders"), F.lit(2.0))
            ).alias("approx_orders_ok"),
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= 0.05 * F.col("exact_p50")
            ).alias("approx_p50_ok"),
        )
    )


# --------------------------------------------------------------------------
# Pivot -> unpivot round trip (conditional aggregation + stack())
# --------------------------------------------------------------------------
@query(
    "pivot_unpivot_status",
    oracle="""
        WITH p AS (
            SELECT o_orderpriority,
                   round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_total,
                   round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_total,
                   round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS partial_total
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, 'O' AS status, open_total     AS total FROM p
        UNION ALL
        SELECT o_orderpriority, 'F' AS status, finished_total AS total FROM p
        UNION ALL
        SELECT o_orderpriority, 'P' AS status, partial_total  AS total FROM p
    """,
    tags=("pivot", "unpivot"),
    doc="Pivot via DataFrame .pivot() with explicit value list, then unpivot "
    "the wide result back to (priority, status, total) rows via stack() — "
    "one query covering both §2.4 reshaping operators.",
)
def pivot_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0.0)).alias("open_total"),
            F.coalesce(F.col("F"), F.lit(0.0)).alias("finished_total"),
            F.coalesce(F.col("P"), F.lit(0.0)).alias("partial_total"),
        )
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'O', open_total, 'F', finished_total, 'P', partial_total) AS (status, total)",
    )


# --------------------------------------------------------------------------
# Cross join (CrossJoinExec parity, stats.rs:699) kept deliberately tiny.
# --------------------------------------------------------------------------
@query(
    "cross_join_regions",
    oracle="""
        SELECT 'cross' AS variant, a.r_name AS from_region,
               b.r_name AS to_region, NULL::BIGINT AS nation_key
        FROM region a, region b
        WHERE a.r_regionkey <> b.r_regionkey
        UNION ALL
        SELECT 'lateral' AS variant, r.r_name AS from_region,
               t.n_name AS to_region, t.nk AS nation_key
        FROM region r, LATERAL (
            SELECT n_name, n_nationkey AS nk FROM nation n
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey LIMIT 2
        ) t
    """,
    tags=("join", "cross", "lateral"),
    doc="Small-dim join suite, variant-tagged: 'cross' = cartesian product "
    "of a dim with itself (CrossJoinExec shape); 'lateral' = correlated "
    "LATERAL subquery with per-row ORDER BY ... LIMIT (top-2 nations per "
    "region) — the §2.2 lateral-join surface, written as SQL on BOTH "
    "engines (Spark 4 LateralJoin / DuckDB LATERAL). Deterministic: the "
    "inner ordering is on the unique nation key.",
)
def cross_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_views(spark, sf_dir)
    r = t["region"]
    a = r.select(F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region"))
    cross = (
        a.crossJoin(b)
        .filter(F.col("ak") != F.col("bk"))
        .select(
            F.lit("cross").alias("variant"),
            "from_region",
            "to_region",
            F.lit(None).cast("long").alias("nation_key"),
        )
    )
    lateral = spark.sql(
        """
        SELECT 'lateral' AS variant, r.r_name AS from_region,
               t.n_name AS to_region, t.nk AS nation_key
        FROM region r, LATERAL (
            SELECT n_name, n_nationkey AS nk FROM nation n
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey LIMIT 2
        ) t
        """
    )
    return cross.unionByName(lateral)
