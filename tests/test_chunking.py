"""Sliding-window document chunking vs a DuckDB window replay.

`chunk_documents` (operators/text.py) is the RAG / context-window
grain: windows of ``chunk_words`` advancing by ``chunk_words -
overlap_words`` within each document. The registry row
(text_token_fingerprints) hash-checks the closed-form aggregates
(chunk counts, clamped word totals); this module checks the FULL
chunk text against DuckDB slicing the same word arrays independently,
plus the reconstruction property that makes chunking lossless.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import text as tx

CW, OV = 64, 16
STRIDE = CW - OV


def test_chunk_text_matches_duckdb(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_words)
        for r in tx.chunk_documents(
            docs.select("doc_id", "text"), chunk_words=CW, overlap_words=OV
        ).collect()
    )
    want = sorted(
        duckdb.connect()
        .execute(
            f"""
        SELECT doc_id, i AS chunk_idx,
               array_to_string(w[i*{STRIDE} + 1 : i*{STRIDE} + {CW}], ' ')
                   AS chunk_text,
               len(w[i*{STRIDE} + 1 : i*{STRIDE} + {CW}]) AS n_chunk_words
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM read_parquet('{sf_dir}/documents.parquet')),
             LATERAL (SELECT unnest(range(0,
                 1 + CASE WHEN len(w) > {CW}
                          THEN CAST(ceil((len(w) - {CW}) / {STRIDE}.0) AS INT)
                          ELSE 0 END)) AS i) t
        """
        )
        .fetchall()
    )
    assert len(got) == len(want) and got == want
    # windows beyond the first must exist for the comparison to bite
    assert any(idx > 0 for _, idx, _, _ in got)


def test_chunking_reconstructs_document(spark, sf_dir):
    """Losslessness: the first `stride` words of every non-final chunk
    plus the whole final chunk concatenate back to the document."""
    docs = load_tables(spark, sf_dir)["documents"].limit(50)
    chunks = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in tx.chunk_documents(
            docs.select("doc_id", "text"), chunk_words=CW, overlap_words=OV
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        ks = sorted(i for (d, i) in chunks if d == row.doc_id)
        assert ks == list(range(len(ks)))
        words: list[str] = []
        for i in ks:
            cw = chunks[(row.doc_id, i)].split(" ")
            words.extend(cw[:STRIDE] if i < ks[-1] else cw)
        assert " ".join(words) == row.text


def test_chunking_edges(spark):
    """1-word docs, exact-boundary docs, and the overlap identity
    sum(n_chunk_words) = n + OV*(k-1)."""
    rows = [
        (0, "x"),
        (1, " ".join(f"w{i}" for i in range(CW))),          # exactly one window
        (2, " ".join(f"w{i}" for i in range(CW + 1))),      # one word over
        (3, " ".join(f"w{i}" for i in range(CW + STRIDE))),  # exact 2nd boundary
        (4, " ".join(f"w{i}" for i in range(300))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.chunk_documents(df, chunk_words=CW, overlap_words=OV)
    agg = {
        r.doc_id: (r.k, r.tot)
        for r in out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("n_chunk_words").alias("tot"))
        .collect()
    }
    for doc_id, text in rows:
        n = len(text.split(" "))
        k = 1 + max(0, -(-(n - CW) // STRIDE)) if n > CW else 1
        assert agg[doc_id] == (k, n + OV * (k - 1)), (doc_id, agg[doc_id], k, n)

    with pytest.raises(ValueError):
        tx.chunk_documents(df, chunk_words=8, overlap_words=8)
