"""Event-stream analytics over the ``events`` table (batch form).

The reference has no streaming surface (SURVEY.md §2.9) — the driver's
``events`` table extends the corpus with stream-shaped data. These
queries express the standard streaming analytics (tumbling windows,
sessionization, JSON payload extraction) as batch window/agg plans;
``datafusion_dft_spark.streaming`` holds the Structured Streaming
variants of the same computations.

Scale notes: the tumbling-window aggregate is a single shuffle on
(window, event_type) with map-side partial aggregation; sessionization
shuffles once on user_id and then runs two narrow window passes inside
each partition — both patterns hold at 100 TB as long as no single user
dominates (AQE skew handling covers moderate skew).

Timestamps are compared as epoch microseconds (``unix_micros`` /
DuckDB ``epoch_us``) so both engines do exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import query

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query(
    "events_tumbling_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               round(sum(value), 2) AS total_value,
               round(avg(value) + 1e-9, 4) AS avg_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("events", "window-agg"),
    doc="Tumbling 1-hour window aggregation by event type (batch form of a streaming windowed agg).",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value") + 1e-9, 4).alias("avg_value"),
        )
    )


@query(
    "events_sessionization",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
               round(sum(value), 2) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    tags=("events", "sessionization"),
    doc="Gap-based sessionization (30-min inactivity): lag → new-session flag → "
    "running-sum session ids → per-session aggregates.",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(prev_us.isNull() | ((us - prev_us) > SESSION_GAP_US), 1).otherwise(0),
    )
    # Same (ts, event_id) total order as the flag window — ts alone is
    # ambiguous when a user has two events in the same microsecond.
    wcum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(wcum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))).alias("duration_us"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@query(
    "events_json_props",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) + 1e-9, 4) AS avg_k
        FROM events
        GROUP BY event_type
    """,
    tags=("events", "json"),
    doc="JSON payload extraction (reference functions-json parity: json_get → "
    "get_json_object) aggregated per event type.",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k) + 1e-9, 4).alias("avg_k"),
    )


@query(
    "events_user_funnel",
    oracle="""
        SELECT n_signups, n_views, n_clicks, n_purchases, count(*) AS n_users FROM (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signups,
                   CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
                   CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
            FROM events GROUP BY user_id
        ) per_user
        GROUP BY n_signups, n_views, n_clicks, n_purchases
    """,
    tags=("events", "funnel"),
    doc="Per-user event-type counts re-aggregated into a funnel histogram.",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))

    per_user = ev.groupBy("user_id").agg(
        cnt("signup").alias("n_signups"),
        cnt("view").alias("n_views"),
        cnt("click").alias("n_clicks"),
        cnt("purchase").alias("n_purchases"),
    )
    return per_user.groupBy("n_signups", "n_views", "n_clicks", "n_purchases").agg(
        F.count(F.lit(1)).alias("n_users")
    )
