"""Streaming events analytics: the stream result must equal the batch result."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    windowed_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(windowed_counts(stream), "stream_hourly")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM stream_hourly").collect()
    }
    ev = load_tables(spark, sf_dir)["events"]
    want = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert got == want


def test_session_windows_run(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(session_windows(stream), "stream_sessions")
    rows = spark.sql("SELECT * FROM stream_sessions").collect()
    assert rows, "session windows produced no rows"
    assert all(r.session_end >= r.session_start and r.n_events > 0 for r in rows)
