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


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: ``(id_col,
    top_tfidf_term, top_tfidf_score)`` — the highest-scoring term of
    each document under the corpus's own smoothed idf.

    score(d, t) = tf(d, t) · (ln((1 + N) / (1 + df(t))) + 1) — the
    sklearn ``smooth_idf`` convention, chosen because every factor is
    an exact integer ratio fed to one ``ln``, so any engine recomputes
    it bit-identically from its own counts (differentially checked in
    ``text_quality_langid``). Keyword extraction is the standard
    cheap topic signal a training-data pipeline attaches before domain
    routing / mixture construction.

    Shape at scale (reference has no TF-IDF; beyond-ref like BM25):
    one word explode → per-(doc, term) count with map-side combine
    (the only corpus-scale shuffle) → document-frequency relation
    derived from those SAME distinct (doc, term) rows (vocabulary-
    bounded — a relation, never driver state), broadcast under the
    shared ``_MODEL_BROADCAST_MAX_ROWS`` budget so the corpus-scale tf
    stream is not reshuffled → the corpus size rides ONE broadcast
    row. The per-document argmax is an ORDER-FREE ``min(struct)``
    aggregate (min over (−score, term) ≡ score DESC, term ASC — ties
    broken lexicographically), never a global window sort: the final
    groupBy(doc) map-side-combines to one row per document.
    """
    from .text import _MODEL_BROADCAST_MAX_ROWS, words  # shared budget

    toks = docs.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_vocab = int(
        toks.agg(F.approx_count_distinct("term").alias("n")).first()["n"]
    )
    dfj = F.broadcast(dfreq) if n_vocab <= _MODEL_BROADCAST_MAX_ROWS else dfreq
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    score = F.col("_tf").cast("double") * (
        F.log((F.lit(1.0) + F.col("_n_docs")) / (F.lit(1.0) + F.col("_df").cast("double")))
        + F.lit(1.0)
    )
    best = (
        tf.join(dfj, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.struct((-score).alias("_ns"), F.col("term").alias("_t")).alias("_key"),
        )
        .groupBy(id_col)
        .agg(F.min("_key").alias("_best"))
    )
    return best.select(
        F.col(id_col),
        F.col("_best._t").alias("top_tfidf_term"),
        F.round(-F.col("_best._ns") + 1e-9, 4).alias("top_tfidf_score"),
    )


def tfidf_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB CTE replaying tfidf_top_terms exactly:
    ``(id_col, top_tfidf_term, top_tfidf_score)``."""
    return f"""
        SELECT {id_col}, term AS top_tfidf_term,
               round(score + 1e-9, 4) AS top_tfidf_score
        FROM (
            SELECT {id_col}, term,
                   tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0) AS score,
                   row_number() OVER (
                       PARTITION BY {id_col}
                       ORDER BY tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0) DESC,
                                term ASC) AS rn
            FROM (
                SELECT {id_col}, term, CAST(count(*) AS DOUBLE) AS tf
                FROM (SELECT {id_col},
                             unnest(string_split({text_col}, ' ')) AS term
                      FROM {table})
                GROUP BY {id_col}, term
            ) tf
            JOIN (
                SELECT term, CAST(count(DISTINCT {id_col}) AS DOUBLE) AS df
                FROM (SELECT {id_col},
                             unnest(string_split({text_col}, ' ')) AS term
                      FROM {table})
                GROUP BY term
            ) d USING (term)
            CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM {table})
        ) WHERE rn = 1
    """
