"""Approximate aggregates must track their exact counterparts."""

from __future__ import annotations

from datafusion_dft_spark.queries.lifecycle import approx_aggregates_raw
from datafusion_dft_spark.registry import all_queries


def test_approx_within_tolerance(spark, sf_dir):
    rows = approx_aggregates_raw(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_orders - r.exact_orders) <= max(0.05 * r.exact_orders, 2), r
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * r.exact_p50, r


def test_registered_query_flags_true(spark, sf_dir):
    """The oracle-checked query encodes the tolerance as literal booleans."""
    rows = all_queries()["distinct_aggregates"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_orders_ok and r.approx_p50_ok, r


def test_approx_top_k_builtin_matches_exact(spark, sf_dir):
    """Spark 4.1's approx_top_k surface: on a 5-value column the sketch
    is effectively exact — items and counts must match the exact
    groupBy (the engine-parity complement of the distributed
    Misra–Gries operator in operators/frequent.py)."""
    from pyspark.sql import functions as F

    from datafusion_dft_spark.catalog import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    [row] = ev.selectExpr("approx_top_k(event_type, 3) AS tk").collect()
    got = {r["item"]: r["count"] for r in row["tk"]}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top3 = dict(sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    assert got == top3
