"""Extended-join queries: as-of join (oracle-checked against DuckDB's
native ASOF JOIN) and salted skew handling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import joins as J
from ..registry import query


@query(
    "asof_join_purchase_view",
    oracle="""
        SELECT p.event_id AS purchase_id, p.user_id,
               epoch_us(p.ts) - epoch_us(v.ts) AS us_since_view
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    tags=("join", "asof"),
    doc="Backward as-of join: each purchase matched to the same user's most "
    "recent prior view (union+window formulation, one shuffle; oracle is "
    "DuckDB's native ASOF JOIN).",
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id"), F.col("ts")
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined = J.asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts", right_cols=[]
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.col("ts_right").cast("timestamp"))).alias("us_since_view"),
    )


@query(
    "salted_aggregate_skew",
    oracle="""
        SELECT event_type, sum(value) IS NOT NULL AS has_sum,
               round(sum(value), 2) AS sum_value, count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("aggregate", "skew"),
    doc="Two-stage salted aggregation over a low-cardinality (maximally "
    "skewed) key — result must equal the direct groupBy.",
)
def salted_aggregate_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    out = J.salted_aggregate(ev, "event_type", {"value": "sum", "event_id": "count"}, 8)
    return out.select(
        "event_type",
        F.col("sum_value").isNotNull().alias("has_sum"),
        F.round("sum_value", 2).alias("sum_value"),
        F.col("count_event_id").alias("n"),
    )
