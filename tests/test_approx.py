"""Approximate aggregates must track their exact counterparts."""

from __future__ import annotations

from datafusion_dft_spark.registry import all_queries


def test_approx_within_tolerance(spark, sf_dir):
    rows = all_queries()["approx_aggregates"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_orders - r.exact_orders) <= max(0.05 * r.exact_orders, 2), r
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * r.exact_p50, r
