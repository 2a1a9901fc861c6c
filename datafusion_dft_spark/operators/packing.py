"""Sequence packing for LLM training pipelines (concatenate-and-chunk).

The canonical final stage of a training-data pipeline concatenates the
token streams of all documents in a deterministic order and slices the
stream into fixed-length training sequences (GPT-style "pack and
chunk"). The distributed primitive underneath is an ORDERED PREFIX SUM
of per-document token counts: once every document knows its global
token offset, its chunk span is pure integer arithmetic
(``chunk = offset // seq_len``).

A naive Spark formulation — ``sum().over(Window.orderBy(id))`` with no
partition key — collapses the whole corpus into ONE task and cannot
scale. This module implements the classic two-pass distributed prefix
sum instead:

1. Split the id domain into ``n_buckets`` contiguous, order-aligned
   ranges whose boundaries are the ids' APPROXIMATE QUANTILES
   (``percentile_approx`` riding the same tiny first-pass job that
   validates the ids) — so buckets are COUNT-BALANCED for any id
   distribution: dense, gappy snowflakes, timestamp-clustered.
   Fixed-width ``(id - lo) div width`` slicing (the earlier
   formulation) collapses under clustered ids: most rows land in a
   few buckets and each bucket's window sort is single-task — a
   straggler/spill cliff at 100 TB.
2. One tiny aggregation computes per-bucket token totals
   (``n_buckets`` rows to the driver); an exclusive prefix sum over
   those totals gives each bucket's starting offset.
3. The final plan is one shuffle (window partitioned by bucket,
   ordered by id) computing the within-bucket cumulative sum, plus a
   dense bucket-offsets array literal — no join, no global sort,
   O(1) plan nodes at any bucket count (``operators/_prefix.py``).

The OUTPUT is invariant to the bucket boundaries: per-bucket totals +
within-bucket cumsum reproduce the single-stream prefix sum exactly
for ANY monotone bucketing, so the approximate quantiles affect only
load balance, never results (bucket-count/partitioning invariance is
property-tested).

At 100 TB: one full shuffle on the bucket key (inherent — an ordered
cumsum must co-locate each ordered range once), driver state bounded
by ``n_buckets`` (size it ~= cluster parallelism). Bucket sizes stay
within ~(1 + 1/16) of ideal regardless of id clustering (the
``percentile_approx`` accuracy is sized to n_buckets). All offset
arithmetic is integer-exact, so any SQL engine reproduces the offsets
verbatim (differential oracle in
``queries/text.py::text_token_fingerprints``; exact ground truth in
``tests/test_packing.py``).

Reference has no packing operator — this is beyond-reference surface
for the training-pipeline mandate (same category as the dedup/ANN
family).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._prefix import bucket_prefix


def _searchsorted(idc: Column, blist: list[int]) -> Column:
    """#{b in blist : b <= id} — the bucket index for sorted boundaries.

    Single ``aggregate`` fold over ONE array literal for small
    boundary sets; above 128 boundaries, a two-level chunked fold
    (O(sqrt n) comparisons per row, O(sqrt n) plan nodes) so per-row
    cost stays ~512 comparisons even at 65k buckets. Array literals
    are single plan nodes wrapping ArrayData — no expression bloat.
    """
    if not blist:
        return F.lit(0)

    def count_le(arr: Column) -> Column:
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(idc >= b, 1).otherwise(0),
        )

    if len(blist) <= 128:
        return count_le(F.lit(blist))
    c = max(1, math.isqrt(len(blist)))
    chunks = [blist[i : i + c] for i in range(0, len(blist), c)]
    # seg = which chunk holds the crossing point: all earlier chunks'
    # boundaries are <= id, all later chunks' are > id.
    seg = count_le(F.lit([ch[0] for ch in chunks[1:]]))
    sub = F.element_at(F.array(*[F.lit(ch) for ch in chunks]), seg + F.lit(1))
    return seg * F.lit(c) + count_le(sub)


def _id_stats(
    df: DataFrame, idc: Column, n_buckets: int
) -> tuple[int, int, list[int]]:
    """(row count, non-NULL id count, sorted quantile boundaries) — one job.

    Boundaries are the ids' approximate ``1/n .. (n-1)/n`` quantiles
    with accuracy sized so bucket-size error stays ~<= 1/16 of the
    ideal bucket (rank error <= rows/accuracy <= bucket/16).
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [F.count(F.lit(1)).alias("n"), F.count(idc).alias("k")]
    if probs:
        accuracy = max(10000, 16 * n_buckets)
        aggs.append(F.percentile_approx(idc, probs, F.lit(accuracy)).alias("q"))
    head = df.agg(*aggs).first()
    if head is None or head["n"] == 0:
        return 0, 0, []
    blist = sorted({int(v) for v in head["q"]}) if probs and head["q"] else []
    return int(head["n"]), int(head["k"]), blist


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens: Column | str,
    seq_len: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each row its global token offset and training-chunk span.

    Rows are conceptually concatenated in ascending ``id_col`` order
    (ties impossible: ids must be unique) and the stream chopped into
    ``seq_len``-token chunks. Adds three columns:

    - ``global_offset``: tokens preceding this row in the stream,
    - ``chunk_first`` / ``chunk_last``: first/last chunk index this
      row's tokens land in (a long document spans several chunks; an
      empty one sits entirely in ``chunk_first``).

    ``tokens`` is a column (or column name) holding the row's
    non-negative token count. Eagerly runs two small jobs (id
    validation + quantile boundaries in one; guarded per-bucket totals
    in the other); the returned plan then executes with a single data
    shuffle. Offsets are deterministic for a given dataset regardless
    of input partitioning AND of the approximate bucket boundaries —
    boundaries steer load balance only (see module docstring).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    tok = F.col(tokens) if isinstance(tokens, str) else tokens
    tok = tok.cast("long")
    idc = F.col(id_col).cast("long")

    # First pass: row/id counts (the all-NULL and some-NULL guards)
    # plus the quantile boundaries, ONE job.
    n_rows, n_ids, blist = _id_stats(df, idc, n_buckets)
    if n_rows == 0:
        # empty input: same schema, zero rows
        return (
            df.withColumn("global_offset", F.lit(0).cast("long"))
            .withColumn("chunk_first", F.lit(0).cast("long"))
            .withColumn("chunk_last", F.lit(0).cast("long"))
        )
    if n_ids != n_rows:
        # covers the all-NULL-ids input that would otherwise slip
        # through as "empty" and silently get global_offset=0
        raise ValueError(
            f"pack_sequences requires unique, non-NULL {id_col!r} values; "
            f"{n_rows - n_ids} NULL id(s) found"
        )
    bucket = _searchsorted(idc, blist)

    # Duplicate ids would silently corrupt offsets (the cumsum window's
    # frame treats tied ids as peers, so both rows absorb both token
    # counts) — the shared prefix pass guards inside the totals job we
    # already run (see operators/_prefix.py).
    parr, _ = bucket_prefix(df, bucket, idc, id_col, "pack_sequences", value=tok)

    w = Window.partitionBy("_pack_bucket").orderBy(idc)
    out = (
        df.withColumn("_pack_bucket", bucket)
        .withColumn("_pack_tok", tok)
        .withColumn(
            "global_offset",
            (
                F.element_at(parr, F.col("_pack_bucket") + F.lit(1))
                + F.sum("_pack_tok").over(w)
                - F.col("_pack_tok")
            ).cast("long"),
        )
        # integral `div`, not double division: chunk ids stay exact for
        # corpora past 2^53 total tokens
        .withColumn("chunk_first", F.expr(f"global_offset div {seq_len}L"))
        .withColumn(
            "chunk_last",
            F.expr(
                f"(global_offset + greatest(_pack_tok, 1L) - 1L) div {seq_len}L"
            ),
        )
        .drop("_pack_bucket", "_pack_tok")
    )
    return out


def packing_summary(packed: DataFrame, *group_cols: str) -> DataFrame:
    """Aggregate packing quality per group: straddle count + chunk reach.

    ``n_straddles`` counts documents whose token span crosses at least
    one chunk boundary (they get split across training sequences —
    the metric packing policies minimize); ``max_chunk`` is the highest
    chunk index the group reaches. Pure integer arithmetic over
    ``pack_sequences`` output, so SQL oracles reproduce it exactly.
    """
    return packed.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum(
            F.when(F.col("chunk_last") != F.col("chunk_first"), 1).otherwise(0)
        ).alias("n_straddles"),
        F.max("chunk_last").alias("max_chunk"),
    )
