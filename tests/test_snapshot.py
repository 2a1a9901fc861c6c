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


def test_null_content_classifies_by_presence(spark):
    """md5(NULL content) is NULL — classification must ride presence
    flags, not fingerprint NULL-ness (r11 ADVICE): NULL↔NULL content
    is unchanged (drops), NULL↔text is changed, and a NULL-content row
    on one side only is a genuine add/remove."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "gamma"), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, "beta"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", "text").collect()
    }
    assert got == {2: "changed", 3: "changed", 4: "added", 5: "removed"}


def test_duckdb_differential_on_planted_fixture(spark, tmp_path):
    """Standalone differential (VERDICT r11 task #8): the md5
    projections + presence-flag classification replay verbatim in
    DuckDB on a planted add/remove/change/NULL fixture."""
    import duckdb

    old_rows = [
        (1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta"), (6, None),
    ]
    new_rows = [
        (1, "alpha"), (2, "beta v2"), (4, None), (5, "epsilon"), (6, None),
    ]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    old_p, new_p = str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet")
    old.write.parquet(old_p)
    new.write.parquet(new_p)

    got = {
        (r["doc_id"], r["status"], r["old_fp"], r["new_fp"])
        for r in snapshot_diff(
            spark.read.parquet(old_p), spark.read.parquet(new_p),
            "doc_id", "text",
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT doc_id, status, old_fp, new_fp FROM (
                SELECT doc_id, a.old_fp, b.new_fp,
                       CASE WHEN a.in_old IS NULL THEN 'added'
                            WHEN b.in_new IS NULL THEN 'removed'
                            WHEN a.old_fp IS DISTINCT FROM b.new_fp
                                 THEN 'changed' END AS status
                FROM (SELECT doc_id, TRUE AS in_old, md5(text) AS old_fp
                      FROM '{old_p}/*.parquet') a
                FULL OUTER JOIN
                     (SELECT doc_id, TRUE AS in_new, md5(text) AS new_fp
                      FROM '{new_p}/*.parquet') b USING (doc_id)
            ) WHERE status IS NOT NULL
            """
        ).fetchall()
    }
    assert got == want
    assert {(k, s) for k, s, *_ in got} == {
        (2, "changed"), (3, "removed"), (4, "changed"), (5, "added")
    }


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
