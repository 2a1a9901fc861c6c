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
   ranges (pure arithmetic on the id — no sampling, so the bucketing
   is deterministic and reproducible across engines and runs, unlike
   ``repartitionByRange``'s sampled boundaries).
2. One tiny aggregation computes per-bucket token totals
   (``n_buckets`` rows to the driver); an exclusive prefix sum over
   those totals gives each bucket's starting offset.
3. The final plan is one shuffle (window partitioned by bucket,
   ordered by id) computing the within-bucket cumulative sum, plus a
   literal bucket→offset map — no join, no global sort.

At 100 TB: one full shuffle on the bucket key (inherent — an ordered
cumsum must co-locate each ordered range once), driver state bounded
by ``n_buckets`` (size it ~= cluster parallelism). Skew mirrors id
clustering; ordered prefix sums cannot be salted, so pick ids that are
near-uniform (e.g. ingest-assigned monotonic ids) or raise
``n_buckets``. All arithmetic is integer-exact, so any SQL engine
reproduces the offsets verbatim (differential oracle in
``queries/text.py::text_token_fingerprints``; exact ground truth in
``tests/test_packing.py``).

Reference has no packing operator — this is beyond-reference surface
for the training-pipeline mandate (same category as the dedup/ANN
family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._prefix import bucket_prefix


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
    non-negative token count. Eagerly runs two small jobs (id span +
    per-bucket totals); the returned plan then executes with a single
    data shuffle. Deterministic for a given dataset regardless of
    input partitioning — bucket boundaries are arithmetic on the id,
    never sampled.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    tok = F.col(tokens) if isinstance(tokens, str) else tokens
    tok = tok.cast("long")
    idc = F.col(id_col).cast("long")

    span = df.agg(F.min(idc).alias("lo"), F.max(idc).alias("hi")).first()
    if span is None or span["lo"] is None:
        # empty input: same schema, zero rows
        return (
            df.withColumn("global_offset", F.lit(0).cast("long"))
            .withColumn("chunk_first", F.lit(0).cast("long"))
            .withColumn("chunk_last", F.lit(0).cast("long"))
        )
    lo, hi = int(span["lo"]), int(span["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))  # ceil div
    # `div` (Spark's integral division) keeps the arithmetic exact for
    # the full int64 domain — a double-division + cast would silently
    # truncate wrong above 2^53.
    bucket = F.expr(
        f"(cast({id_col} as bigint) - {lo}L) div {width}L"
    )

    # Duplicate ids would silently corrupt offsets (the cumsum window's
    # RANGE frame treats tied ids as peers, so both rows absorb both
    # token counts) — the shared prefix pass guards inside the totals
    # job we already run (see operators/_prefix.py).
    pmap, _ = bucket_prefix(
        df, bucket, idc, id_col, "pack_sequences", value=tok
    )

    w = Window.partitionBy("_pack_bucket").orderBy(idc)
    out = (
        df.withColumn("_pack_bucket", bucket)
        .withColumn("_pack_tok", tok)
        .withColumn(
            "global_offset",
            (
                F.element_at(pmap, F.col("_pack_bucket"))
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
