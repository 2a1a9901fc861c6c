"""Differential check of distributed BPE ENCODING against DuckDB.

``tests/test_bpe.py`` property-tests training (incremental index vs a
naive recount); this module upgrades ENCODING — the corpus-scale half —
to a two-engine differential: ``apply_bpe`` under a FIXED pinned merge
table must produce the same per-document ``n_bpe_tokens`` as a DuckDB
recursive CTE that replays the greedy lowest-rank-first algorithm from
the merge list expressed as DATA (a list literal; ``list_position``
gives the 1-based rank, ``list_min`` over present ranks picks the best
pair, first index on ties — exactly ``encode_word``'s loop). Neither
engine shares a line of encoding code with the other.

The merge table is pinned (learned once from the sf0.001 corpus and
hardcoded) so the differential isolates ENCODING: a training change
can't silently mask an encoding bug, and the DuckDB side needs no
training replay.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import bpe

# The pinned merge table lives with the operator (shared by the
# driver-checked bpe_* columns of text_token_fingerprints).
PINNED_MERGES = bpe.PINNED_MERGES


def _oracle_sql(parquet_path: str) -> str:
    mlist = "[" + ",".join(
        "'" + (a + " " + b).replace("'", "''") + "'" for a, b in PINNED_MERGES
    ) + "]"
    return f"""
WITH RECURSIVE
wordlist AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS word,
         unnest(range(1, len(string_split(lower(text), ' ')) + 1)) AS widx
  FROM read_parquet('{parquet_path}')
),
enc AS (
  -- init: chars + end-of-word marker on the last char
  SELECT doc_id, widx,
    list_append(
      list_transform(range(1, length(word)), i -> word[i]),
      word[length(word)] || '{bpe.END}') AS syms,
    0 AS it
  FROM wordlist WHERE word <> ''
  UNION ALL
  -- step: merge the FIRST occurrence of the best-ranked adjacent pair
  SELECT doc_id, widx,
    list_concat(list_concat(
        syms[1:best_i-1],
        [syms[best_i] || syms[best_i+1]]),
        syms[best_i+2:]) AS syms,
    it + 1
  FROM (
    SELECT doc_id, widx, syms, it,
           list_position(ranks, list_min(list_filter(ranks, r -> r > 0))) AS best_i
    FROM (
      SELECT doc_id, widx, syms, it,
        list_transform(range(1, len(syms)),
                       i -> list_position({mlist}, syms[i] || ' ' || syms[i+1])) AS ranks
      FROM enc)
    WHERE len(list_filter(ranks, r -> r > 0)) > 0)
),
final AS (SELECT doc_id, widx, arg_max(syms, it) AS syms FROM enc GROUP BY 1, 2)
SELECT doc_id, sum(len(syms))::BIGINT AS n_bpe_tokens FROM final GROUP BY doc_id
"""


def test_apply_bpe_token_counts_match_duckdb(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.apply_bpe(docs, PINNED_MERGES).collect()
    }
    want = dict(
        duckdb.connect()
        .execute(_oracle_sql(f"{sf_dir}/documents.parquet"))
        .fetchall()
    )
    # every non-empty document scores in both engines; empty documents
    # (no words) carry 0 tokens in Spark and are absent from the
    # oracle's word stream
    assert set(want) <= set(got)
    for d in got:
        assert got[d] == want.get(d, 0), (d, got[d], want.get(d, 0))
    assert sum(want.values()) > 0


def test_encode_word_agrees_with_duckdb_on_adversarial_words(spark):
    """Single-word differential on shapes that stress the greedy loop:
    rank ties, overlapping candidate pairs, repeated letters, 1-char
    words, words fully consumed into one token."""
    words = [
        "scan", "column", "window", "order", "sort", "parquet",
        "aaaa", "arar", "toto", "a", "x", "inin", "colucolu", "ascan",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT row_number() OVER () - 1 AS doc_id, "
        "w AS text FROM (SELECT unnest(?) AS w)", [words]
    )
    sql = _oracle_sql("IGNORED").replace(
        "read_parquet('IGNORED')", "t"
    )
    want = dict(con.execute(sql).fetchall())
    ranks = {p: i for i, p in enumerate(PINNED_MERGES)}
    for i, w in enumerate(words):
        assert len(bpe.encode_word(w, ranks)) == want[i], (w, bpe.encode_word(w, ranks))
