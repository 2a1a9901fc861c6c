"""Extended window/analytic coverage (SURVEY §2.5 full set) and unpivot.

percent_rank/cume_dist/ntile divide identical integers in both engines
(IEEE division of equal operands is bit-deterministic), so no rounding
is needed — unlike the summed aggregates elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import query


@query(
    "window_analytic_set",
    oracle="""
        SELECT c_nationkey, c_custkey,
               ntile(4)       OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist()    OVER w AS cum_dist,
               first_value(c_custkey) OVER w AS richest_cust,
               nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey
                                             ORDER BY c_acctbal DESC, c_custkey
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND UNBOUNDED FOLLOWING) AS second_cust
        FROM customer
        WHERE c_nationkey <= 5
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "analytic"),
    doc="ntile / percent_rank / cume_dist / first_value / nth_value over one "
    "ordered partition (full analytic-function sweep).",
)
def window_analytic_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir)["customer"].filter(F.col("c_nationkey") <= 5)
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_cust"),
    )


@query(
    "unpivot_order_status",
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
    doc="Round trip pivot -> unpivot via stack(): wide conditional aggregates "
    "melted back to (priority, status, total) rows.",
)
def unpivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    wide = orders.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0)), 2).alias("open_total"),
        F.round(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)), 2).alias("finished_total"),
        F.round(F.sum(F.when(F.col("o_orderstatus") == "P", F.col("o_totalprice")).otherwise(0.0)), 2).alias("partial_total"),
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'O', open_total, 'F', finished_total, 'P', partial_total) AS (status, total)",
    )
