"""Misra–Gries heavy hitters (operators/frequent.py).

Arrival-order-dependent sketch → property-tested against exact counts
(the BPE pattern), never value-hash-oracled: the GUARANTEES are what
must hold, not specific counter values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dft_spark.operators.frequent import _mg_batch, frequent_items


def _zipf_rows(n=20000, n_items=500):
    # deterministic zipf-ish: item j appears ~ n/(j+1) times
    rows = []
    j = 0
    while len(rows) < n:
        for rep in range(max(n // ((j + 1) * 20), 1)):
            rows.append((f"item{j:04d}",))
            if len(rows) >= n:
                break
        j = (j + 1) % n_items
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "term string").repartition(8)
    exact = {r["term"]: r["n"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    return df, exact, len(rows)


def test_superset_guarantee(corpus):
    df, exact, n = corpus
    k = 50
    got = {r["item"]: r["est_count"] for r in frequent_items(df, "term", k=k, top=10_000).collect()}
    must_have = {t for t, f in exact.items() if f > n / k}
    assert must_have, "test corpus must contain heavy hitters"
    missing = must_have - set(got)
    assert not missing, missing


def test_estimate_bounds(corpus):
    df, exact, n = corpus
    k = 50
    got = {r["item"]: r["est_count"] for r in frequent_items(df, "term", k=k, top=10_000).collect()}
    for item, est in got.items():
        f = exact.get(item, 0)
        assert est <= f, (item, est, f)
        assert est >= f - n / k, (item, est, f, n / k)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "term string"
    )
    got = {r["item"]: r["est_count"] for r in frequent_items(df, "term", k=10).collect()}
    assert None not in got and "a" in got


def test_output_cap_and_order(corpus):
    df, _, _ = corpus
    rows = frequent_items(df, "term", k=50, top=5).collect()
    assert len(rows) == 5
    ests = [r["est_count"] for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_validation(corpus):
    df, _, _ = corpus
    with pytest.raises(ValueError, match="k must be"):
        frequent_items(df, "term", k=0)


def test_mg_batch_textbook():
    # k=2 over aabbbc: 'c' kills one of each survivor; b survives with
    # lb 2, a decrements to 1.
    assert _mg_batch(list("aabbbc"), 2) == {"a": 1, "b": 2}
    # every item distinct, k=1: the stream self-cancels down to the tail
    assert _mg_batch(list("abc"), 1) == {"c": 1}
