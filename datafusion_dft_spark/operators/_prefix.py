"""Shared two-pass-prefix machinery for the ordering operators.

``pack_sequences`` (ordered prefix SUM over token counts) and
``deterministic_shuffle`` (ordered prefix COUNT = distributed rank)
decompose the same way: order-aligned buckets, one guarded per-bucket
aggregation to the driver, an exclusive prefix over the bucket totals
riding the final plan as a literal. This module holds the shared pass
so the duplicate/NULL-key guard and the prefix arithmetic cannot
drift between the two operators.

Plan-size note: the offsets ride as ONE dense ``array<long>`` literal
(index = bucket id) looked up with ``element_at`` — a single Literal
node wrapping ArrayData, so the executed plan stays O(1) expression
nodes even at 65k buckets. The earlier ``create_map`` formulation was
an N-ary expression (2·N child Literal nodes: 131k at
``bucket_hex=4``) — plan/codegen bloat exactly at large-cluster bucket
settings, and a join would add an exchange the single-shuffle contract
forbids.
"""

from __future__ import annotations

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
    """Guarded per-bucket totals → (exclusive-prefix lookup column, grand total).

    One aggregation over ``bucket`` computes row count, distinct-key
    count, and (optionally) ``sum(value)``. Duplicate or NULL keys
    raise — a duplicate key always shares its bucket, so per-bucket
    count-vs-distinct sees every collision, and NULL keys surface as
    ``count_distinct`` undercount (or a NULL bucket). The prefix is
    over ``value`` sums when given, else row counts.

    Bucket ids must be non-negative integers (both callers construct
    them that way). The first element of the returned tuple is the
    dense offsets ``array<long>`` literal Column (index = bucket id,
    1-based for ``element_at``); empty buckets hold their running
    prefix so the lookup is total. Callers index it with
    ``element_at(offsets, <materialized bucket column> + 1)`` so the
    bucket expression is evaluated once per row. Returns ``(None, 0)``
    on empty input.
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
    if not totals:
        return None, 0
    if min(totals) < 0:
        raise ValueError(
            f"{op_name} internal error: negative bucket id {min(totals)}"
        )
    # Dense exclusive prefix, index == bucket id; gaps (empty buckets)
    # carry the running prefix so element_at never misses.
    dense: list[int] = []
    acc = 0
    for b in range(max(totals) + 1):
        dense.append(acc)
        acc += totals.get(b, 0)
    return F.lit(dense), acc
