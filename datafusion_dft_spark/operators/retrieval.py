"""Lexical retrieval scoring: BM25 over the documents corpus.

Beyond-reference training-data operator: production pipelines score
documents against fixed query sets for targeted corpus construction
(domain boosting, eval-adjacent harvesting) and for retrieval-quality
filtering. BM25 (Robertson/Spärck Jones; the +1 idf variant Lucene
ships) is the standard lexical scorer.

Scale shape: everything stays in whole-stage codegen. Per-document
term frequencies are ARRAY FOLDS over the row's own word split (no
explode, no shuffle — the query has a handful of terms); the corpus
statistics (N, avgdl, per-term document frequencies) are ONE
map-side-combining aggregate producing a single row, broadcast back.
Total cost at 100 TB: two corpus scans (stats + scoring) and zero
data shuffles. md5-free and engine-portable: the whole formula
replays in DuckDB (bm25_oracle_sql), so the operator is
differentially oracle-checked like the sketch pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words


def _tf(text_col: str, term: str) -> Column:
    """Term frequency as a per-row array fold (no explode)."""
    return F.size(F.filter(words(text_col), lambda w: w == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``docs`` + a ``bm25_score`` column: relevance against ONE query.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the
    non-negative Lucene variant of the Robertson idf. Term order in
    the sum is the caller's ``terms`` order on BOTH engines, so the
    float summation is reproducible. Rounded to 4 dp (+1e-9 nudge,
    the repo's differential convention).
    """
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg(F.size(words(text_col)).cast("double")).alias("_avgdl"),
        *[
            F.sum((_tf(text_col, t) > 0).cast("long")).cast("double").alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    dl = F.size(words(text_col)).cast("double")
    parts = []
    for i, t in enumerate(terms):
        tf = _tf(text_col, t).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        parts.append(
            idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / F.col("_avgdl")))
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return (
        docs.crossJoin(F.broadcast(stats))
        .withColumn("bm25_score", F.round(score + 1e-9, 4))
        .drop("_n_docs", "_avgdl", *[f"_df_{i}" for i in range(len(terms))])
    )


def bm25_oracle_sql(
    terms: tuple[str, ...],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB CTE replaying bm25_scores exactly: ``(id_col, bm25_score)``.

    Generated from the SAME constants so the two sides cannot drift.
    """
    df_cols = ",\n               ".join(
        f"CAST(sum(CASE WHEN len(list_filter(string_split({text_col}, ' '), "
        f"x -> x = '{t}')) > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i, t in enumerate(terms)
    )
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(string_split({text_col}, ' '), x -> x = '{t}')) "
        f"AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(
        f"ln(1.0 + (s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5)) * d.tf_{i} "
        f"* ({k1} + 1.0) / (d.tf_{i} + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl))"
        for i in range(len(terms))
    )
    return f"""
        SELECT d.{id_col}, round({score} + 1e-9, 4) AS bm25_score
        FROM (
            SELECT {id_col},
               CAST(len(string_split({text_col}, ' ')) AS DOUBLE) AS dl,
               {tf_cols}
            FROM {table}
        ) d
        CROSS JOIN (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               avg(CAST(len(string_split({text_col}, ' ')) AS DOUBLE)) AS avgdl,
               {df_cols}
            FROM {table}
        ) s
    """
