"""Extended-join queries: as-of join (oracle-checked against DuckDB's
native ASOF JOIN) and salted skew handling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import joins as J
from ..registry import query


# Range-join arm parameters: "incident windows" open at high-value
# error events and span the next 30 minutes; the arm counts ALL events
# (any user) landing inside each window, per event type. Band width =
# window length, so every interval explodes across at most 2 bands.
_RANGE_WINDOW_US = 30 * 60 * 1_000_000
_RANGE_VALUE_MIN = 9.0


@query(
    "asof_join_purchase_view",
    oracle=f"""
        SELECT 'asof' AS variant, p.event_id AS id, p.user_id,
               epoch_us(p.ts) - epoch_us(v.ts) AS us_since_view,
               NULL::VARCHAR AS event_type, NULL::BIGINT AS n_events
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        UNION ALL
        SELECT 'range' AS variant, w.event_id AS id, NULL::BIGINT AS user_id,
               NULL::BIGINT AS us_since_view, e.event_type,
               count(*) AS n_events
        FROM (SELECT event_id, epoch_us(ts) AS ws,
                     epoch_us(ts) + {_RANGE_WINDOW_US} AS we
              FROM events
              WHERE event_type = 'error' AND value > {_RANGE_VALUE_MIN}) w
        JOIN events e ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) <= w.we
        GROUP BY w.event_id, e.event_type
    """,
    tags=("join", "asof", "range"),
    doc="Time-join suite, variant-tagged (50-cap fold). 'asof': backward "
    "as-of join — each purchase matched to the same user's most recent "
    "prior view (union+window formulation, one shuffle; oracle is "
    "DuckDB's native ASOF JOIN). 'range': INTERVAL JOIN via "
    "operators/joins.py::banded_range_join — events counted into "
    "30-minute incident windows opened by high-value error events, with "
    "NO equi key: the banding rewrite (points carry their band, "
    "intervals explode across <= 2 bands, residual BETWEEN filter) "
    "turns what Spark would plan as a broadcast-nested-loop into an "
    "ordinary shuffled equi-join (plan-gated: no cartesian/BNLJ), while "
    "DuckDB's oracle runs its native IEJoin on the plain BETWEEN "
    "predicate.",
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
    nulls_asof = [
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("n_events"),
    ]
    asof = joined.select(
        F.lit("asof").alias("variant"),
        F.col("event_id").alias("id"),
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_right").cast("timestamp"))
        ).alias("us_since_view"),
        *nulls_asof,
    )

    windows = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > _RANGE_VALUE_MIN)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.lit(_RANGE_WINDOW_US)
        ).alias("w_end"),
    )
    points = ev.select(F.col("ts").alias("e_ts"), F.col("event_type"))
    pairs = J.banded_range_join(
        points, windows, "e_ts", "w_start", "w_end", band_micros=_RANGE_WINDOW_US
    )
    rng = (
        pairs.groupBy("window_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("range").alias("variant"),
            F.col("window_id").alias("id"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("long").alias("us_since_view"),
            "event_type",
            "n_events",
        )
    )
    return asof.unionByName(rng)


@query(
    "salted_aggregate_skew",
    oracle="""
        SELECT 'agg' AS variant, event_type AS key,
               round(sum(value), 2) AS val, count(*) AS n
        FROM events
        GROUP BY event_type
        UNION ALL
        SELECT 'skew' AS variant, metric AS key, val, NULL::BIGINT AS n
        FROM (
            SELECT round(CAST(count(*) AS DOUBLE) + 1e-9, 4) AS n_keys,
                   round(CAST(max(cnt) AS DOUBLE) + 1e-9, 4) AS max_count,
                   round(avg(cnt) + 1e-9, 4) AS mean_count,
                   round(quantile_cont(cnt, 0.99) + 1e-9, 4) AS p99_count,
                   round(max(cnt) / avg(cnt) + 1e-9, 4) AS max_over_mean,
                   CAST(ceil(max(cnt) / avg(cnt)) AS DOUBLE) AS suggested_salt
            FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
        ) s
        UNPIVOT (val FOR metric IN (n_keys, max_count, mean_count,
                                    p99_count, max_over_mean, suggested_salt))
    """,
    tags=("aggregate", "skew", "diagnostics"),
    doc="Skew handling as a pair, variant-tagged: 'agg' = two-stage SALTED "
    "aggregation over a low-cardinality (maximally skewed) key — result "
    "must equal the direct groupBy; 'skew' = the PRE-FLIGHT SKEW REPORT "
    "(operators/joins.py::skew_report) on events.user_id: per-key counts "
    "summarized to n_keys / max / mean / exact-p99 / max-over-mean and "
    "suggested_salt = ceil(max/mean) — the diagnostic a 100 TB plan "
    "review runs before choosing the salt factor the 'agg' variant "
    "consumes. One count aggregate + a one-row summary; the exact "
    "percentile runs on integer counts (IEEE-exact interpolation, the "
    "repo's oracle-checked-quantile convention).",
)
def salted_aggregate_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    out = J.salted_aggregate(ev, "event_type", {"value": "sum", "event_id": "count"}, 8)
    agg = out.select(
        F.lit("agg").alias("variant"),
        F.col("event_type").alias("key"),
        F.round("sum_value", 2).alias("val"),
        F.col("count_event_id").alias("n"),
    )
    skew = J.skew_report(ev, "user_id").select(
        F.lit("skew").alias("variant"),
        F.col("metric").alias("key"),
        "val",
        F.lit(None).cast("long").alias("n"),
    )
    return agg.unionAll(skew)
