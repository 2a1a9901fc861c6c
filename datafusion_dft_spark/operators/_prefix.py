"""Shared two-pass-prefix machinery for the ordering operators.

``pack_sequences`` (ordered prefix SUM over token counts) and
``deterministic_shuffle`` (ordered prefix COUNT = distributed rank)
decompose the same way: order-aligned buckets, one guarded per-bucket
aggregation to the driver, an exclusive prefix over the bucket totals
riding the final plan as a literal map. This module holds the shared
pass so the duplicate/NULL-key guard and the prefix arithmetic cannot
drift between the two operators.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_prefix(
    df: DataFrame,
    bucket: Column,
    key: Column,
    key_name: str,
    op_name: str,
    value: Column | None = None,
) -> tuple[Column | None, int]:
    """Guarded per-bucket totals → (exclusive-prefix literal map, grand total).

    One aggregation over ``bucket`` computes row count, distinct-key
    count, and (optionally) ``sum(value)``. Duplicate or NULL keys
    raise — a duplicate key always shares its bucket, so per-bucket
    count-vs-distinct sees every collision, and NULL keys surface as
    ``count_distinct`` undercount (or a NULL bucket). The prefix is
    over ``value`` sums when given, else row counts. Returns
    ``(None, 0)`` on empty input.
    """
    aggs = [F.count(F.lit(1)).alias("n"), F.count_distinct(key).alias("d")]
    if value is not None:
        aggs.append(F.sum(value).alias("t"))
    rows = df.groupBy(bucket.alias("b")).agg(*aggs).collect()
    bad = [
        "NULL" if r["b"] is None else int(r["b"])
        for r in rows
        if r["n"] != r["d"]
    ]
    if bad:
        raise ValueError(
            f"{op_name} requires unique, non-NULL {key_name!r} values; "
            f"duplicate/NULL values found in bucket(s) {bad[:5]}"
        )
    totals = {
        int(r["b"]): int(r["t"] if value is not None else r["n"]) for r in rows
    }
    prefix: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    if not prefix:
        return None, 0
    pmap = F.create_map(
        *chain.from_iterable((F.lit(b), F.lit(off)) for b, off in prefix.items())
    )
    return pmap, acc
