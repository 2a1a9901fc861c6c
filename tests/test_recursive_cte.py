"""WITH RECURSIVE surface (folded into view_lifecycle).

Spark 4.1 ships recursive CTEs (SPARK-24497); the sf0.001 differential
certifies the folded arms against DuckDB. These tests pin the shapes in
isolation: the hierarchy walk computes textbook depths on a hand-built
complete binary tree, and the month ladder produces exactly the closed
span — so a regression in either arm localizes here before the
consolidated hash flags it.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tree_view(spark):
    spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    ).createOrReplaceTempView("rc_docs")
    yield "rc_docs"
    spark.catalog.dropTempView("rc_docs")


def test_tree_walk_depths(spark, tree_view):
    rows = spark.sql(
        """
        WITH RECURSIVE tree(id, depth) AS (
            SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
            UNION ALL
            SELECT c.doc_id, t.depth + 1
            FROM tree t JOIN rc_docs c ON c.doc_id DIV 2 = t.id
        )
        SELECT id, depth FROM tree
        """
    ).collect()
    got = {r["id"]: r["depth"] for r in rows}
    # Complete binary tree: node n sits at depth floor(log2(n)) + 1.
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 3, 7: 3}


def test_month_ladder_span(spark):
    [row] = spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1992-01-01' AS m
            UNION ALL
            SELECT add_months(m, 1) FROM months WHERE m < DATE '1998-12-01'
        )
        SELECT count(*) AS n, min(m) AS lo, max(m) AS hi FROM months
        """
    ).collect()
    assert row["n"] == 84  # 7 years x 12 months, inclusive anchor
    assert str(row["lo"]) == "1992-01-01" and str(row["hi"]) == "1998-12-01"


def test_recursion_limit_guard(spark):
    # An unbounded recursion must hit Spark's level limit, not hang —
    # the config that bounds the view_lifecycle arms if data goes weird.
    with pytest.raises(Exception, match="(?i)recursion|limit|exceed"):
        spark.sql(
            """
            WITH RECURSIVE r(n) AS (
                SELECT 1 UNION ALL SELECT n + 1 FROM r
            )
            SELECT count(*) FROM r
            """
        ).collect()
