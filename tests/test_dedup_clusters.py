"""Connected-components clustering over near-dup pairs.

Differential oracle: DuckDB transitive closure via WITH RECURSIVE —
component = min reachable id. Plus a synthetic chain proving the
transitivity that per-pair keep/drop decisions get wrong.
"""

from __future__ import annotations

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import dedup as dd

CLOSURE_SQL = """
WITH RECURSIVE
edges AS (
    SELECT doc1 AS src, doc2 AS dst FROM pairs
    UNION
    SELECT doc2, doc1 FROM pairs
),
reach(node, r) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
)
SELECT node AS member, min(r) AS component FROM reach GROUP BY node
"""


def test_chain_is_one_component(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "doc1 long, doc2 long")
    got = {(r.member, r.component) for r in dd.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_components_match_duckdb_closure(spark, sf_dir, duckcon):
    docs = load_tables(spark, sf_dir)["documents"]
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", k=5, threshold=0.7)
    rows = [(r.doc1, r.doc2) for r in pairs.collect()]
    if not rows:
        import pytest

        pytest.skip("no near-dup pairs at this SF")
    duckcon.sql("CREATE OR REPLACE TABLE pairs(doc1 BIGINT, doc2 BIGINT)")
    duckcon.executemany("INSERT INTO pairs VALUES (?, ?)", rows)
    want = {(m, c) for m, c in duckcon.sql(CLOSURE_SQL).fetchall()}
    got = {
        (r.member, r.component)
        for r in dd.connected_components(
            spark.createDataFrame(rows, "doc1 long, doc2 long")
        ).collect()
    }
    assert got == want


def test_cluster_keep_semantics(spark):
    """Keep one representative per component; every other member drops."""
    pairs = spark.createDataFrame([(5, 9), (9, 7), (20, 21)], "doc1 long, doc2 long")
    keep = {(r.member, r.keep) for r in dd.cluster_representatives(pairs).collect()}
    assert keep == {(5, 5), (9, 5), (7, 5), (20, 20), (21, 20)}


def test_long_chain_exercises_checkpoint_rounds(spark):
    """A diameter-15 path graph needs >5 propagation rounds, so the
    periodic localCheckpoint branch (lineage truncation) runs; every
    node must still resolve to component 0."""
    from datafusion_dft_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc1 long, doc2 long"
    )
    labels = {r.member: r.component for r in connected_components(pairs).collect()}
    assert labels == {i: 0 for i in range(16)}
