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
