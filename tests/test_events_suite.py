"""Ordered-funnel and cohort-retention semantics (events_user_funnel).

The sf0.001 differential in tests/test_differential.py certifies the
suite against DuckDB; these tests pin the EDGE semantics on hand-built
events where the expected values are computed by eye: a user whose
first view precedes their first signup must NOT count at the '2_view'
stage, and cohort day offsets anchor at each user's own first day.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datafusion_dft_spark.queries.events import events_user_funnel


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return T0 + dt.timedelta(days=day, hours=hour)


@pytest.fixture(scope="module")
def suite_rows(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("events_suite")
    rows = [
        # user 1: perfect order signup(d0) -> view(d0) -> click(d1) -> purchase(d2)
        (_ts(0, 1), 1, "signup"),
        (_ts(0, 2), 1, "view"),
        (_ts(1, 1), 1, "click"),
        (_ts(2, 1), 1, "purchase"),
        # user 2: view BEFORE signup -> fails the '2_view' prefix
        (_ts(0, 1), 2, "view"),
        (_ts(0, 2), 2, "signup"),
        (_ts(0, 3), 2, "click"),
        # user 3: signup only, active again on day 3 (errors count as activity)
        (_ts(1, 1), 3, "signup"),
        (_ts(4, 1), 3, "error"),
        # user 4: never signs up
        (_ts(0, 1), 4, "view"),
    ]
    sf_dir = _write_events(spark, tmp, rows)
    df = events_user_funnel(spark, sf_dir)
    return df.collect()


def test_ordered_funnel_prefix_counts(suite_rows):
    seq = {r["stage"]: r["n_users"] for r in suite_rows if r["variant"] == "seq"}
    # users 1,2,3 signed up; only user 1 has signup<=view<=click<=purchase.
    assert seq == {"1_signup": 3, "2_view": 1, "3_click": 1, "4_purchase": 1}


def test_cohort_retention_offsets(suite_rows):
    coh = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in suite_rows
        if r["variant"] == "cohort"
    }
    d = dt.date
    # cohort 2024-01-01: users 1,2,4 on day 0; user 1 on offsets 1 and 2.
    # cohort 2024-01-02: user 3 on day 0 and offset 3 (error = activity).
    assert coh == {
        (d(2024, 1, 1), 0): 3,
        (d(2024, 1, 1), 1): 1,
        (d(2024, 1, 1), 2): 1,
        (d(2024, 1, 2), 0): 1,
        (d(2024, 1, 2), 3): 1,
    }


def test_histogram_arm_unchanged(suite_rows):
    hist = [r for r in suite_rows if r["variant"] == "hist"]
    # 4 distinct per-user count signatures -> 4 histogram rows of 1 user.
    assert len(hist) == 4
    assert all(r["n_users"] == 1 for r in hist)
    assert all(r["stage"] is None and r["cohort_day"] is None for r in hist)
