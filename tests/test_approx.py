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
