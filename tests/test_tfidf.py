"""TF-IDF keyword extraction (operators/retrieval.py::tfidf_top_terms).

Hand-computed values on a tiny corpus, deterministic tie-breaking, and
the DuckDB replay of the same corpus — the sf0.01 differential rides
``text_quality_langid`` in tests/test_differential.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from datafusion_dft_spark.operators.retrieval import (
    tfidf_oracle_sql,
    tfidf_top_terms,
)

DOCS = [
    # 'rare' appears in one doc only -> max idf; 'common' in all four.
    (0, "common common rare"),
    (1, "common alpha alpha"),
    (2, "common beta"),
    (3, "common common common common"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _expected():
    n = len(DOCS)
    tf = {}  # (doc, term) -> count
    dfreq = {}
    for i, text in DOCS:
        seen = set()
        for w in text.split(" "):
            tf[(i, w)] = tf.get((i, w), 0) + 1
            if w not in seen:
                seen.add(w)
                dfreq[w] = dfreq.get(w, 0) + 1
    best = {}
    for (i, w), c in tf.items():
        s = c * (math.log((1.0 + n) / (1.0 + dfreq[w])) + 1.0)
        k = (-s, w)
        if i not in best or k < best[i]:
            best[i] = k
    return {i: (w, round(-ns + 1e-9, 4)) for i, (ns, w) in best.items()}


def test_hand_corpus_top_terms(docs_df):
    got = {
        r["doc_id"]: (r["top_tfidf_term"], r["top_tfidf_score"])
        for r in tfidf_top_terms(docs_df).collect()
    }
    exp = _expected()
    assert got.keys() == exp.keys()
    for i in exp:
        assert got[i][0] == exp[i][0], (i, got[i], exp[i])
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-9)


def test_rare_term_beats_frequent_common(docs_df):
    got = {r["doc_id"]: r["top_tfidf_term"] for r in tfidf_top_terms(docs_df).collect()}
    # doc 0: tf(common)=2 but idf(common)=ln(5/5)+1=1 -> score 2;
    # tf(rare)=1, idf=ln(5/2)+1 ~ 1.916 -> 'common' still wins on tf.
    assert got[0] == "common"
    # doc 1: alpha tf=2 idf~1.916 beats common tf=1 idf=1.
    assert got[1] == "alpha"


def test_tie_breaks_lexicographically(spark):
    # 'aa' and 'bb' both tf=1, df=1 -> identical scores; 'aa' must win.
    df = spark.createDataFrame([(0, "aa bb"), (1, "zz")], ["doc_id", "text"])
    rows = {r["doc_id"]: r["top_tfidf_term"] for r in tfidf_top_terms(df).collect()}
    assert rows[0] == "aa"
    assert rows[1] == "zz"


def test_duckdb_replay_matches(docs_df):
    spark_rows = {
        r["doc_id"]: (r["top_tfidf_term"], r["top_tfidf_score"])
        for r in tfidf_top_terms(docs_df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") v(doc_id, text)"
    )
    duck_rows = {
        r[0]: (r[1], r[2]) for r in con.sql(tfidf_oracle_sql()).fetchall()
    }
    assert spark_rows.keys() == duck_rows.keys()
    for k in duck_rows:
        assert spark_rows[k][0] == duck_rows[k][0]
        assert spark_rows[k][1] == pytest.approx(duck_rows[k][1], abs=1e-9)


def test_no_global_window_sort(docs_df):
    # The argmax is a min(struct) aggregate: the plan must contain no
    # Window operator (a per-doc row_number would sort every partition).
    plan = tfidf_top_terms(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
