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


def test_batch_summary_dominates_scalar_mg():
    """The vectorized residual summary (exact counts offset by the
    (k+1)-th largest) is the error-optimal MG summary: on randomized
    batches every scalar-MG survivor survives with an estimate at
    least as tight, all estimates stay within [f - n/k, f], and ≤ k
    items are emitted (derandomized: fixed seed)."""
    import random
    from collections import Counter

    import numpy as np

    from datafusion_dft_spark.operators.frequent import _batch_summary

    rng = random.Random(1202)
    for trial in range(20):
        n_items = rng.randint(1, 40)
        items = [f"i{rng.randint(0, n_items)}" for _ in range(rng.randint(1, 600))]
        k = rng.randint(1, 12)
        exact = Counter(items)
        vals = list(exact)
        counts = np.array([exact[v] for v in vals], dtype=np.int64)
        mask, t = _batch_summary(counts, k)
        est = {v: int(c - t) for v, c, m in zip(vals, counts, mask) if m}
        n = len(items)
        assert len(est) <= k, (trial, est)
        for v, e in est.items():
            assert 0 < e <= exact[v], (trial, v, e, exact[v])
            assert e >= exact[v] - n / k - 1e-9, (trial, v, e)
        # uniform error is ≤ n/(k+1) — a strictly tighter contract than
        # the streaming loop's n/k — so every item above n/(k+1) survives
        assert t <= n / (k + 1) + 1e-9, (trial, t, n, k)
        for v, f in exact.items():
            if f > t:
                assert v in est, (trial, v, f, t)
        # the scalar loop is a valid MG summary of the same batch: its
        # survivors obey the same bound family (cross-check the reference)
        scalar = _mg_batch(items, k)
        for v, lb in scalar.items():
            assert 0 < lb <= exact[v] and lb >= exact[v] - n / k, (trial, v, lb)
        if len(exact) <= k:
            assert t == 0 and est == dict(exact), trial  # exact regime


def test_sketch_emits_at_most_k_rows_per_batch(spark):
    """The mapInArrow stage's output is bounded by k per batch — the
    property that keeps the only shuffle sketch-sized."""
    from datafusion_dft_spark.operators.frequent import _sketch_fn

    import pyarrow as pa

    batch = pa.record_batch(
        {"term": pa.array([f"t{i % 37}" for i in range(1000)] + [None] * 5)}
    )
    out = list(_sketch_fn("term", 5)([batch]))
    assert sum(b.num_rows for b in out) <= 5
    assert all(b.schema.names == ["item", "lb"] for b in out)


def test_mg_batch_textbook():
    # k=2 over aabbbc: 'c' kills one of each survivor; b survives with
    # lb 2, a decrements to 1.
    assert _mg_batch(list("aabbbc"), 2) == {"a": 1, "b": 2}
    # every item distinct, k=1: the stream self-cancels down to the tail
    assert _mg_batch(list("abc"), 1) == {"c": 1}
