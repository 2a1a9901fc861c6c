"""Unigram log-probability scoring: DuckDB differential + signal sanity."""

from __future__ import annotations

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import text as tx

ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), model AS (
    SELECT word, count(*) AS cnt FROM toks GROUP BY word
), total AS (SELECT count(*)::DOUBLE AS n FROM toks)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(avg(-ln(m.cnt / total.n)) + 1e-9, 4) AS avg_neg_logprob
FROM toks t JOIN model m USING (word), total
GROUP BY t.doc_id
"""


def test_scores_match_duckdb(spark, sf_dir, duckcon):
    docs = load_tables(spark, sf_dir)["documents"]
    got = {
        r.doc_id: (r.n_tokens, r.avg_neg_logprob)
        for r in tx.unigram_logprob_scores(docs).collect()
    }
    want = {d: (n, s) for d, n, s in duckcon.sql(ORACLE).fetchall()}
    assert set(got) == set(want)
    mismatched = {d for d in got if got[d] != want[d]}
    assert not mismatched, {d: (got[d], want[d]) for d in sorted(mismatched)[:3]}


def test_rare_token_doc_scores_higher(spark, sf_dir):
    """A doc of corpus-unique gibberish must out-score every real doc —
    the filtering signal the operator exists for."""
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_dir)["documents"]
    weird = spark.createDataFrame(
        [(999999, "zqxj wvkp qqqz mxvw zzzv")], "doc_id long, text string"
    )
    aug = docs.select("doc_id", "text").unionByName(weird)
    scores = tx.unigram_logprob_scores(aug)
    top = scores.orderBy(F.desc("avg_neg_logprob")).first()
    assert top.doc_id == 999999
