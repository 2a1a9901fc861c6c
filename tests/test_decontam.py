"""Differential + behavioral tests for benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators.decontam import (
    contamination_hits,
    decontam_oracle_cte,
    decontaminate,
)
from datafusion_dft_spark.operators.sampling import _M, deterministic_sample, hash_bucket

_EVAL_FRACTION = 0.05


def _split(docs):
    ev = deterministic_sample(docs, "doc_id", _EVAL_FRACTION)
    tr = docs.filter(hash_bucket("doc_id") >= int(_EVAL_FRACTION * _M))
    return tr, ev


def test_hits_match_duckdb(spark, duckcon, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    train, ev = _split(docs)
    got = {
        (r.doc_id, r.contam_hits)
        for r in contamination_hits(train, ev, n=8).collect()
    }
    cut = int(_EVAL_FRACTION * _M)
    bucket = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % " + str(_M)
    sql = f"""
        WITH eval_docs AS (SELECT * FROM documents WHERE {bucket} < {cut}),
        train_docs AS (SELECT * FROM documents WHERE {bucket} >= {cut}),
        {decontam_oracle_cte(8)}
        SELECT doc_id, contam_hits FROM contam
    """
    want = set(map(tuple, duckcon.sql(sql).fetchall()))
    assert got == want
    assert got, "fixture corpus should contain real contamination (dup clusters)"


def test_decontaminate_removes_flagged_only(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    train, ev = _split(docs)
    flagged = {r.doc_id for r in contamination_hits(train, ev, n=8).collect()}
    kept = {r.doc_id for r in decontaminate(train, ev, n=8).collect()}
    all_train = {r.doc_id for r in train.select("doc_id").collect()}
    assert kept == all_train - flagged


def test_min_hits_threshold(spark):
    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # full 8-gram copy + extra words: many shared grams
            (1, "x alpha beta gamma delta epsilon zeta eta theta y"),
            # no overlap
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.contam_hits for r in contamination_hits(train, ev, n=8).collect()}
    assert 1 in hits and 2 not in hits
    # a threshold above the observed hits keeps the doc
    kept = {r.doc_id for r in decontaminate(train, ev, n=8, min_hits=hits[1] + 1).collect()}
    assert kept == {1, 2}
    kept2 = {r.doc_id for r in decontaminate(train, ev, n=8, min_hits=1).collect()}
    assert kept2 == {2}


def test_short_doc_whole_text_gram(spark):
    """Docs shorter than n words collide via their whole text."""
    ev = spark.createDataFrame([(0, "tiny eval doc")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "tiny eval doc"), (2, "different tiny doc")], "doc_id long, text string"
    )
    hits = {r.doc_id for r in contamination_hits(train, ev, n=8).collect()}
    assert hits == {1}


def test_probe_join_is_broadcast(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    train, ev = _split(docs)
    plan = contamination_hits(train, ev, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
