"""Consolidated window/analytic coverage (SURVEY §2.5 full set).

Two queries cover the whole §2.5 inventory so every function family
fits inside the driver's 50-query correctness cap (round-2 verdict
directive #1):

- ``window_rank_suite`` — every ranking/analytic function
  (row_number / rank / dense_rank / ntile / percent_rank / cume_dist /
  first_value / nth_value) including the top-k-per-group shape and
  rank-with-ties semantics.
- ``window_frames_nav`` — explicit ROWS frames (running total, moving
  average) plus lag/lead navigation.

percent_rank/cume_dist/ntile divide identical integers in both
engines (IEEE division of equal operands is bit-deterministic), so no
rounding is needed — unlike the summed aggregates elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import query


@query(
    "window_rank_suite",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk,
               quartile, pct_rank, cum_dist, richest_cust, second_cust
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number()   OVER w AS rn,
                   rank()         OVER t AS rnk,
                   dense_rank()   OVER t AS drnk,
                   ntile(4)       OVER w AS quartile,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist()    OVER w AS cum_dist,
                   first_value(c_custkey) OVER w AS richest_cust,
                   nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey
                                                 ORDER BY c_acctbal DESC, c_custkey
                                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                                          AND UNBOUNDED FOLLOWING) AS second_cust
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
                   t AS (PARTITION BY c_nationkey ORDER BY round(c_acctbal) DESC)
        ) r WHERE rn <= 5
    """,
    tags=("window", "rank", "analytic", "topk"),
    doc="Full ranking/analytic sweep in one query: top-5-per-nation via "
    "row_number (the top-k-per-group shape), rank/dense_rank over rounded "
    "balances (tie semantics), ntile/percent_rank/cume_dist/first_value/"
    "nth_value over the ordered partition.",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    # Tie window: rank/dense_rank need genuine ties, so no unique tiebreak —
    # the rank VALUE is still deterministic for every row.
    t = W.partitionBy("c_nationkey").orderBy(F.round("c_acctbal").desc())
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(t).cast("long").alias("rnk"),
            F.dense_rank().over(t).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cum_dist"),
            F.first("c_custkey").over(w).alias("richest_cust"),
            F.nth_value("c_custkey", 2).over(wfull).alias("second_cust"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_frames_nav",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_extendedprice) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
               round(avg(l_extendedprice) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS moving_avg,
               datediff('day', lag(l_shipdate)  OVER w, l_shipdate) AS days_since_prev,
               datediff('day', l_shipdate, lead(l_shipdate) OVER w) AS days_until_next
        FROM lineitem
        WHERE l_suppkey <= 5
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
    tags=("window", "frame", "navigation"),
    doc="ROWS-frame aggregates (cumulative sum, 4-row moving average) plus "
    "lag/lead navigation gaps, one ordered partition per supplier.",
)
def window_frames_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") <= 5)
    order = [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = W.partitionBy("l_suppkey").orderBy(*order)
    prev = F.lag("l_shipdate").over(w)
    nxt = F.lead("l_shipdate").over(w)
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
        F.datediff(F.col("l_shipdate"), prev).cast("long").alias("days_since_prev"),
        F.datediff(nxt, F.col("l_shipdate")).cast("long").alias("days_until_next"),
    )
