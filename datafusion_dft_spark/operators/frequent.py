"""Distributed frequent-items (heavy hitters) via Misra–Gries.

The missing member of the approximate-aggregate family next to HLL++
(approx_count_distinct) and KLL-ish quantiles (percentile_approx):
"which items exceed an x% frequency share" over a corpus too large to
count exactly per item — hot URLs/domains before dedup, runaway
boilerplate n-grams, skewed join keys.

Algorithm (Misra & Gries 1982; the summary Space-Saving refines): keep
k counters; an unmatched item either claims a free counter or
decrements all k. Each batch's surviving counters are LOWER BOUNDS
with per-batch error ≤ n_batch/k, and the guarantee composes across
batches by averaging: any item with global frequency > n/k must beat
n_b/k in at least one batch, so it SURVIVES into the merged candidate
set, and the summed bounds satisfy f − n/k ≤ estimate ≤ f
(property-tested in tests/test_frequent.py — the sketch itself is
arrival-order dependent, so like BPE it is pytest-verified rather
than value-hash-oracled).

Scale shape: ONE ``mapInArrow`` pass runs MG per Arrow batch (k
counters in a dict — O(1) amortized per item), emitting ≤ k rows per
batch regardless of batch size; the merge is an ordinary
map-side-combining sum over those sketch rows (≤ k × #batches rows,
item-keyed — the only shuffle) followed by a top-k
TakeOrderedAndProject. The raw stream is never shuffled.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_batch(items, k: int) -> dict:
    counters: dict = {}
    for it in items:
        if it is None:
            continue
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def _sketch_fn(item_col: str, k: int):
    import pyarrow as pa

    schema = pa.schema(
        [pa.field("item", pa.string()), pa.field("lb", pa.int64())]
    )

    def sketch(batches):
        for batch in batches:
            col = batch.column(item_col).to_pylist()
            counters = _mg_batch(col, k)
            if counters:
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(
                        {"item": list(counters), "lb": list(counters.values())}
                    ),
                    schema=schema,
                )

    return sketch


def frequent_items(
    df: DataFrame, item_col: str, k: int = 100, top: int | None = None
) -> DataFrame:
    """``(item, est_count)`` candidates containing EVERY item whose true
    frequency exceeds n/k, with f − n/k ≤ est_count ≤ f. ``top`` caps
    the output (ordered by est_count DESC, item ASC); default k rows.
    NULL items are ignored (they are not a frequency class)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    items = df.select(F.col(item_col).cast("string").alias(item_col))
    sketch = items.mapInArrow(
        _sketch_fn(item_col, k), schema="item string, lb long"
    )
    merged = sketch.groupBy("item").agg(F.sum("lb").alias("est_count"))
    return merged.orderBy(F.col("est_count").desc(), F.col("item").asc()).limit(
        top if top is not None else k
    )
