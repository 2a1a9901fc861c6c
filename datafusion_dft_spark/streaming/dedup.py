"""Streaming ingestion dedup: a Structured Streaming corpus builder.

Beyond-reference (the reference has no streaming surface — SURVEY §2.9)
but THE production shape for a 100 TB training-data pipeline:
documents arrive continuously, and each micro-batch must be deduped
against everything already accepted before it lands in the corpus.
This composes the existing batch-vs-corpus incremental MinHash
operator (``operators/dedup.py::minhash_lsh_pairs_incremental`` — one
corpus scan, no corpus self-join, banded batch probe) with
``foreachBatch``:

    batch ──► pairs vs corpus ──► drop corpus-duplicated docs
          ──► pairs within batch ──► keep one representative per
              duplicate cluster (min id, via connected_components)
          ──► survivors APPEND to the corpus directory

Scale notes (the reason this is foreachBatch and not a stateful op):
the accumulated corpus is parquet on shared storage, not Spark state —
state stores cap at executor memory × retention, a corpus does not.
Each micro-batch pays one corpus scan; at a daily cadence that is the
same cost profile as the batch incremental job, with streaming's
scheduling for free. Survivors write to a per-batch subdirectory
(``batch-<id>/``) with overwrite, so foreachBatch's at-least-once
replay is IDEMPOTENT — a replayed batch rewrites its own directory
instead of double-appending.

Dedup policy (greedy, documented): (1) a batch doc that near-dups ANY
corpus doc is dropped; (2) the remaining batch docs form duplicate
clusters over their batch-internal pairs, and the minimum id of each
cluster survives. Matching uses the SAME banding/threshold as the
batch operators, so stream-built and batch-built corpora agree
(asserted in tests/test_streaming_dedup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
)


def _read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    """The accumulated corpus (batch-*/ parquet), or None when empty."""
    if not os.path.isdir(corpus_dir):
        return None
    subdirs = [
        os.path.join(corpus_dir, d)
        for d in sorted(os.listdir(corpus_dir))
        if d.startswith("batch-")
        and os.path.isdir(os.path.join(corpus_dir, d))
        and any(f.endswith(".parquet") for f in os.listdir(os.path.join(corpus_dir, d)))
    ]
    if not subdirs:
        return None
    return spark.read.parquet(*subdirs)


def dedup_batch_against_corpus(
    batch_df: DataFrame,
    corpus_df: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    k: int = 5,
    **lsh_kwargs,
) -> DataFrame:
    """Survivors of one ingestion batch under the greedy policy above.

    Pure batch logic (no streaming dependency) so the semantics are
    testable and reusable from a plain backfill driver too.
    ``corpus_df`` should be MATERIALIZED storage (a parquet read, as the
    streaming sink guarantees) — chaining one call's lazy output in as
    the next call's corpus compounds the LSH + iterative
    connected-components plans into a tree that can OOM the planner.
    ``lsh_kwargs`` forwards to both LSH passes; the incremental-only
    knobs (``check_id_overlap``, ``broadcast``) go to the corpus pass.
    """
    incr_only = {
        key: lsh_kwargs.pop(key)
        for key in ("check_id_overlap", "broadcast")
        if key in lsh_kwargs
    }
    batch_df = batch_df.select(id_col, text_col)
    if corpus_df is not None:
        vs_corpus = minhash_lsh_pairs_incremental(
            batch_df,
            corpus_df.select(id_col, text_col),
            id_col,
            text_col,
            k=k,
            threshold=threshold,
            **incr_only,
            **lsh_kwargs,
        )
        batch_ids = batch_df.select(F.col(id_col).alias("__bid")).distinct()
        # batch endpoint of every corpus-touching pair: doc1 when doc1 is
        # the batch side and doc2 is corpus, else doc2 (covers
        # corpus-batch and batch-batch pairs alike — for batch-batch the
        # min-id doc1 is retained by policy anyway)
        p = (
            vs_corpus.join(
                batch_ids.withColumnRenamed("__bid", "doc1").withColumn(
                    "__b1", F.lit(True)
                ),
                "doc1",
                "left",
            )
            .join(
                batch_ids.withColumnRenamed("__bid", "doc2").withColumn(
                    "__b2", F.lit(True)
                ),
                "doc2",
                "left",
            )
        )
        drop_ids = p.select(
            F.when(
                F.col("__b1").isNotNull() & F.col("__b2").isNull(), F.col("doc1")
            )
            .otherwise(F.col("doc2"))
            .alias(id_col)
        ).distinct()
        remaining = batch_df.join(drop_ids, id_col, "left_anti")
    else:
        remaining = batch_df
    # within what's left: one representative (min id) per duplicate cluster
    internal = minhash_lsh_pairs(
        remaining, id_col, text_col, k=k, threshold=threshold, **lsh_kwargs
    )
    comps = connected_components(internal)  # (member, component=min id)
    non_reps = comps.filter(F.col("member") != F.col("component")).select(
        F.col("member").alias(id_col)
    )
    return remaining.join(non_reps, id_col, "left_anti")


def export_training_corpus(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    id_col: str,
    text_col: str,
    *,
    seed: int = 0,
    shard_rows: int = 10000,
) -> dict:
    """Close the epoch: deduped stream corpus → shuffled training shards.

    Reads everything ``streaming_dedup_sink`` accepted, counts tokens,
    and exports via ``operators/ordering.py::write_training_shards`` —
    the deterministic seeded order, so the training run replays
    identically from any engine and resumes at shard boundaries.
    Returns ``{"n_docs", "n_shards", "total_tokens"}``.
    """
    from ..operators.ordering import write_training_shards
    from ..operators.text import token_count

    corpus = _read_corpus(spark, corpus_dir)
    if corpus is None:
        return {"n_docs": 0, "n_shards": 0, "total_tokens": 0}
    toked = corpus.withColumn("n_tokens", token_count(text_col))
    n_shards = write_training_shards(
        toked, out_dir, id_col, seed=seed, shard_rows=shard_rows
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    return {
        "n_docs": int(stats["n"]),
        "n_shards": n_shards,
        "total_tokens": int(stats["t"] or 0),
    }


def streaming_dedup_sink(
    stream_df: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    k: int = 5,
    **lsh_kwargs,
):
    """``writeStream`` query: dedup each micro-batch, append survivors.

    Returns the DataStreamWriter (caller ``.start()``s it — tests use
    ``.trigger(availableNow=True)`` for run-to-completion semantics).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        corpus = _read_corpus(spark, corpus_dir)
        survivors = dedup_batch_against_corpus(
            batch_df,
            corpus,
            id_col,
            text_col,
            threshold=threshold,
            k=k,
            # a replayed/streamed batch never shares ids with the corpus
            # by construction (checkpointed offsets); skip the eager
            # overlap-guard job per micro-batch
            check_id_overlap=False,
            **lsh_kwargs,
        )
        out = os.path.join(corpus_dir, f"batch-{batch_id}")
        survivors.write.mode("overwrite").parquet(out)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
