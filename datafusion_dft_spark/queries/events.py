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
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signups,
                   CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
                   CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                   min(CASE WHEN event_type = 'signup'   THEN epoch_us(ts) END) AS t_signup,
                   min(CASE WHEN event_type = 'view'     THEN epoch_us(ts) END) AS t_view,
                   min(CASE WHEN event_type = 'click'    THEN epoch_us(ts) END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
            FROM events GROUP BY user_id
        ), stages AS (
            SELECT CAST(t_signup IS NOT NULL AS BIGINT) AS s1,
                   CAST(t_signup IS NOT NULL AND t_view IS NOT NULL
                        AND t_signup <= t_view AS BIGINT) AS s2,
                   CAST(t_signup IS NOT NULL AND t_view IS NOT NULL
                        AND t_click IS NOT NULL AND t_signup <= t_view
                        AND t_view <= t_click AS BIGINT) AS s3,
                   CAST(t_signup IS NOT NULL AND t_view IS NOT NULL
                        AND t_click IS NOT NULL AND t_purchase IS NOT NULL
                        AND t_signup <= t_view AND t_view <= t_click
                        AND t_click <= t_purchase AS BIGINT) AS s4
            FROM per_user
        ), nulls AS (
            SELECT NULL::BIGINT AS n_signups, NULL::BIGINT AS n_views,
                   NULL::BIGINT AS n_clicks, NULL::BIGINT AS n_purchases,
                   NULL::DATE AS cohort_day, NULL::BIGINT AS day_offset,
                   NULL::VARCHAR AS stage
        )
        SELECT 'hist' AS variant, n_signups, n_views, n_clicks, n_purchases,
               NULL::DATE AS cohort_day, NULL::BIGINT AS day_offset,
               NULL::VARCHAR AS stage, count(*) AS n_users
        FROM per_user
        GROUP BY n_signups, n_views, n_clicks, n_purchases
        UNION ALL
        SELECT 'seq' AS variant, nulls.* EXCLUDE (stage), st.stage, st.n_users
        FROM (
            -- CAST: DuckDB sum(BIGINT) is HUGEINT, which would poison
            -- the whole union's n_users to int128 vs Spark's long.
            SELECT '1_signup' AS stage, CAST(sum(s1) AS BIGINT) AS n_users FROM stages
            UNION ALL SELECT '2_view', CAST(sum(s2) AS BIGINT) FROM stages
            UNION ALL SELECT '3_click', CAST(sum(s3) AS BIGINT) FROM stages
            UNION ALL SELECT '4_purchase', CAST(sum(s4) AS BIGINT) FROM stages
        ) st CROSS JOIN nulls
        UNION ALL
        SELECT 'hh' AS variant, nulls.* EXCLUDE (stage),
               hh.event_type AS stage, hh.n AS n_users
        FROM (SELECT event_type, count(*) AS n FROM events
              GROUP BY event_type) hh
        CROSS JOIN nulls
        UNION ALL
        SELECT 'cohort' AS variant, nulls.n_signups, nulls.n_views,
               nulls.n_clicks, nulls.n_purchases,
               c.cohort_day, c.day_offset, nulls.stage, c.n_users
        FROM (
            SELECT cohort_day, CAST(d - cohort_day AS BIGINT) AS day_offset,
                   count(*) AS n_users
            FROM (
                SELECT user_id, d,
                       min(d) OVER (PARTITION BY user_id) AS cohort_day
                FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
            )
            GROUP BY cohort_day, day_offset
        ) c CROSS JOIN nulls
    """,
    tags=("events", "funnel", "cohort", "retention"),
    doc="Product-analytics suite in one tagged relation (driver 50-cap "
    "fold). 'hist': per-user event-type counts re-aggregated into a "
    "funnel histogram. 'seq': the ORDERED funnel — users whose FIRST "
    "signup precedes their first view precedes their first click "
    "precedes their first purchase, counted per prefix stage (first-"
    "touch timestamps compared as epoch micros — integer-exact on both "
    "engines); the per-user first-touch relation rides the SAME "
    "groupBy(user_id) pass as the histogram, so the ordered funnel "
    "costs zero extra shuffles. 'hh': the Misra-Gries heavy-hitters "
    "operator (operators/frequent.py) run in its EXACT regime — k=64 "
    "above the column's distinct count means counters never decrement, "
    "so the one-pass mapInArrow sketch + item-keyed merge must equal a "
    "plain GROUP BY by theorem, making the sketch plumbing itself "
    "driver-hash-checked (the approximate regime is property-tested). "
    "'cohort': classic retention triangle — "
    "first-activity-day cohorts x day offset, counted on the DISTINCT "
    "(user, day) relation (map-side-combined aggregate far smaller than "
    "the event stream; one user_id shuffle for the min-day window, one "
    "tiny (cohort, offset) shuffle). At 100 TB every arm aggregates "
    "before it joins/shuffles — no event-grain join anywhere.",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))

    def first_t(t: str):
        return F.min(F.when(F.col("event_type") == t, F.unix_micros("ts")))

    per_user = ev.groupBy("user_id").agg(
        cnt("signup").alias("n_signups"),
        cnt("view").alias("n_views"),
        cnt("click").alias("n_clicks"),
        cnt("purchase").alias("n_purchases"),
        first_t("signup").alias("t_signup"),
        first_t("view").alias("t_view"),
        first_t("click").alias("t_click"),
        first_t("purchase").alias("t_purchase"),
    )
    null_cnt = [
        F.lit(None).cast("long").alias(c)
        for c in ("n_signups", "n_views", "n_clicks", "n_purchases")
    ]
    null_cohort = [
        F.lit(None).cast("date").alias("cohort_day"),
        F.lit(None).cast("long").alias("day_offset"),
    ]
    null_stage = F.lit(None).cast("string").alias("stage")

    hist = (
        per_user.groupBy("n_signups", "n_views", "n_clicks", "n_purchases")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.lit("hist").alias("variant"),
            "n_signups", "n_views", "n_clicks", "n_purchases",
            *null_cohort, null_stage, "n_users",
        )
    )

    # Ordered funnel: prefix conditions on first-touch times. NULL-safe
    # via explicit isNotNull (a NULL comparison would make the CAST
    # NULL, not false).
    s = F.col("t_signup").isNotNull()
    sv = s & F.col("t_view").isNotNull() & (F.col("t_signup") <= F.col("t_view"))
    svc = sv & F.col("t_click").isNotNull() & (F.col("t_view") <= F.col("t_click"))
    svcp = (
        svc
        & F.col("t_purchase").isNotNull()
        & (F.col("t_click") <= F.col("t_purchase"))
    )
    totals = per_user.agg(
        F.sum(s.cast("long")).alias("1_signup"),
        F.sum(sv.cast("long")).alias("2_view"),
        F.sum(svc.cast("long")).alias("3_click"),
        F.sum(svcp.cast("long")).alias("4_purchase"),
    )
    seq = totals.select(
        F.lit("seq").alias("variant"),
        *null_cnt,
        *null_cohort,
        F.expr(
            "stack(4, '1_signup', `1_signup`, '2_view', `2_view`, "
            "'3_click', `3_click`, '4_purchase', `4_purchase`) AS (stage, n_users)"
        ),
    )

    # Heavy-hitter arm: with k (64) above the column's distinct count
    # the Misra-Gries counters never decrement, so the sketch is EXACT
    # and deterministic by theorem — which makes the mapInArrow +
    # item-keyed-merge plumbing itself driver-hash-checkable against a
    # plain GROUP BY (the approximate regime stays property-tested in
    # tests/test_frequent.py).
    from ..operators.frequent import frequent_items

    hh = frequent_items(ev, "event_type", k=64, top=64).select(
        F.lit("hh").alias("variant"),
        *null_cnt,
        *null_cohort,
        F.col("item").alias("stage"),
        F.col("est_count").alias("n_users"),
    )

    # Cohort retention on the distinct (user, day) relation.
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    coh = ud.withColumn(
        "cohort_day", F.min("d").over(W.partitionBy("user_id"))
    ).withColumn("day_offset", F.datediff("d", "cohort_day").cast("long"))
    cohort = (
        coh.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.lit("cohort").alias("variant"),
            *null_cnt,
            "cohort_day", "day_offset", null_stage, "n_users",
        )
    )
    return hist.unionByName(seq).unionByName(hh).unionByName(cohort)
