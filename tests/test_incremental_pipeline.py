"""End-to-end incremental-update pipeline: snapshot diff drives the
incremental dedup probe.

The r11 integration story: a corpus update lands (snapshot B), the
churn-bounded ``snapshot_diff`` names what changed, and ONLY the
added/changed rows probe the standing corpus via the incremental LSH
path — never a full corpus self-join. The test certifies the
composition end to end: the incremental probe over the diff-selected
batch finds exactly the full recompute's duplicate pairs restricted to
rows the update touched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
)
from datafusion_dft_spark.operators.snapshot import snapshot_diff


@pytest.fixture(scope="module")
def snapshots(spark, sf_dir):
    a = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    # Update: drop every 11th doc, near-duplicate every 13th doc as a
    # NEW row (append two words — high Jaccard against its source), add
    # one exact copy of doc 5 under a fresh id.
    dup_src = a.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail")).alias("text"),
    )
    copy5 = a.filter(F.col("doc_id") == 5).select(
        F.lit(2_000_005).cast("long").alias("doc_id"), "text"
    )
    b = (
        a.filter(F.col("doc_id") % 11 != 0)
        .unionByName(dup_src)
        .unionByName(copy5)
    )
    return a, b


def test_diff_drives_incremental_probe(spark, snapshots):
    a, b = snapshots
    diff = snapshot_diff(a, b, "doc_id", "text")
    touched = diff.filter(F.col("status").isin("added", "changed")).select("doc_id")
    batch = b.join(touched, "doc_id", "leftsemi")
    standing = b.join(touched, "doc_id", "left_anti")

    got = {
        (r["doc1"], r["doc2"])
        for r in minhash_lsh_pairs_incremental(
            batch, standing, "doc_id", "text", k=5, threshold=0.7
        ).collect()
    }

    # Ground truth: full self-join over the WHOLE updated corpus,
    # restricted to pairs touching an added/changed row.
    full = {
        (r["doc1"], r["doc2"])
        for r in minhash_lsh_pairs(b, "doc_id", "text", k=5, threshold=0.7).collect()
    }
    batch_ids = {r["doc_id"] for r in touched.collect()}
    want = {p for p in full if p[0] in batch_ids or p[1] in batch_ids}
    assert got == want
    # Non-vacuous: the planted exact copy must surface.
    assert any(2_000_005 in p for p in got), got


def test_diff_bounds_the_batch(spark, snapshots):
    a, b = snapshots
    diff = snapshot_diff(a, b, "doc_id", "text")
    counts = {r["status"]: r["n"] for r in diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_b = b.count()
    # The probe batch is the churn, not the corpus.
    assert counts.get("added", 0) + counts.get("changed", 0) < 0.2 * n_b
    assert counts.get("removed", 0) > 0
