"""Snapshot diff (operators/snapshot.py) — incremental-update audit."""

from __future__ import annotations

import pytest

from datafusion_dft_spark.operators.snapshot import snapshot_diff


@pytest.fixture(scope="module")
def diff_rows(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta EDITED"), (4, "delta")], "doc_id long, text string"
    )
    return snapshot_diff(old, new, "doc_id", "text").collect()


def test_statuses(diff_rows):
    got = {r["doc_id"]: r["status"] for r in diff_rows}
    # 1 is unchanged -> dropped (churn-bounded output)
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_fingerprints_present_per_side(diff_rows):
    by_id = {r["doc_id"]: r for r in diff_rows}
    assert by_id[4]["old_fp"] is None and by_id[4]["new_fp"] is not None
    assert by_id[3]["new_fp"] is None and by_id[3]["old_fp"] is not None
    assert by_id[2]["old_fp"] != by_id[2]["new_fp"]


def test_plan_is_equi_join(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = (
        snapshot_diff(old, new, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
