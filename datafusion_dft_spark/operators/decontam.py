"""Benchmark decontamination: drop training docs overlapping an eval set.

The standard pre-training hygiene stage (GPT-3 App. C / Dolma-style
n-gram collision): a training document is *contaminated* if it shares
at least ``min_hits`` distinct n-word grams with any document in the
held-out evaluation/benchmark corpus. Implemented Spark-first:

- Gram extraction reuses :func:`operators.dedup.shingle_array`
  (distinct k-word shingles, same slice semantics the DuckDB oracles
  already mirror), exploded per document — a narrow op, no shuffle.
- The eval side collapses to its DISTINCT gram set. Benchmark corpora
  are small by construction (thousands of docs vs billions of training
  docs), so the gram set is broadcast and the probe join runs
  shuffle-free inside the training scan; the only exchange in the
  whole operator is the per-doc hit-count aggregation. For an
  unusually large eval corpus, drop the hint and AQE falls back to a
  shuffle join keyed on the gram.
- Everything derives from words and md5-free string equality, so
  DuckDB replays the operator exactly (tests/test_decontam.py and the
  ``pipeline_clean_corpus`` oracle).

At 100 TB: one training-corpus scan, one broadcast, one narrow
aggregation on doc_id — the same cost envelope as a filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_array


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id_col, contam_hits): distinct shared n-grams per training doc.

    Only docs with >= 1 hit appear. Docs shorter than ``n`` words
    contribute their whole text as a single gram (shingle_array's
    clamp), so exact short-document copies still collide.
    """
    from ..session import default_parallelism

    # Single-row-group test parquet scans as 1-2 tasks, serializing the
    # gram explode + probe join; repartition up to the core count when
    # the source is under-split (same guard as the similarity
    # operators — a real corpus arrives in thousands of splits and
    # skips this narrow-input-only exchange).
    cpus = default_parallelism()
    if train.rdd.getNumPartitions() < cpus // 2:
        train = train.repartition(cpus)
    tg = train.select(
        F.col(id_col), F.explode(shingle_array(text_col, n)).alias("gram")
    )
    eg = eval_df.select(F.explode(shingle_array(text_col, n)).alias("gram")).distinct()
    return (
        tg.join(F.broadcast(eg), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contam_hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Training rows with contaminated documents removed.

    ``min_hits`` > 1 tolerates incidental single-gram collisions
    (boilerplate, common idioms) the way production filters do.
    """
    flagged = contamination_hits(train, eval_df, id_col, text_col, n).filter(
        F.col("contam_hits") >= min_hits
    )
    # No broadcast hint here: the flagged set scales with the TRAINING
    # corpus and its contamination rate, not with the small eval corpus
    # — at 100 TB it can be hundreds of millions of ids. AQE promotes
    # the anti-join to broadcast at runtime when the set turns out
    # small; hinting would pin a driver-side collect of an unbounded
    # relation.
    return train.join(flagged.select(id_col), id_col, "left_anti")


def decontam_oracle_cte(n: int = 8, eval_cte: str = "eval_docs", train_cte: str = "train_docs") -> str:
    """DuckDB CTE computing (doc_id, contam_hits) — the differential twin.

    Mirrors shingle_array exactly: 1-based list slice of ``n`` words
    (``words[i:i+n-1]`` is inclusive in DuckDB), gram count clamped to
    >= 1 so short docs emit their whole text, list_distinct before the
    join, strictly-positive hit counts only.
    """
    return f"""
        eval_grams AS (
            SELECT DISTINCT unnest(list_distinct(
                       [array_to_string(words[i:i+{n - 1}], ' ')
                        for i in range(1, greatest(len(words) - {n - 2}, 2))])) AS gram
            FROM (SELECT string_split(text, ' ') AS words FROM {eval_cte}) t
        ), train_grams AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       [array_to_string(words[i:i+{n - 1}], ' ')
                        for i in range(1, greatest(len(words) - {n - 2}, 2))])) AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {train_cte}) t
        ), contam AS (
            SELECT tg.doc_id, count(*) AS contam_hits
            FROM train_grams tg JOIN eval_grams eg USING (gram)
            GROUP BY tg.doc_id
        )
    """
