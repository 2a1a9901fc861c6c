"""Text-analysis queries over the ``documents`` table.

Beyond-reference pipeline operators (BASELINE.json north star): token
counting, quality scoring, language-ID heuristic, content
fingerprinting. Every query has a DuckDB oracle computing the *same
formula*, so the differential check validates semantics, not just
plumbing. All Spark-side expressions are built-ins (no Python UDFs) —
see operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import text as tx
from ..registry import query

_STOPLIST_SQL = "['the', 'a', 'of', 'to', 'and']"


@query(
    "text_token_stats",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               round(avg(len(string_split(text, ' '))) + 1e-9, 4) AS avg_tokens,
               CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_lex_tokens
        FROM documents
        GROUP BY lang, source
    """,
    tags=("text", "tokens"),
    doc="Token counting (whitespace + lexer-regex) aggregated by lang/source.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count("text")).alias("total_tokens"),
        F.round(F.avg(tx.token_count("text")) + 1e-9, 4).alias("avg_tokens"),
        F.sum(tx.regex_token_count("text")).alias("total_lex_tokens"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
        SELECT doc_id, n_words, stop_count,
               round(nospace_len / CAST(n_words AS DOUBLE) + 1e-9, 4) AS avg_word_len,
               round(stop_count / CAST(n_words AS DOUBLE) + 1e-9, 4) AS stop_ratio,
               round(least(n_words / 100.0, 1.0) * 0.5
                     + (stop_count / CAST(n_words AS DOUBLE)) * 0.5 + 1e-9, 4) AS quality_score
        FROM (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   length(replace(text, ' ', '')) AS nospace_len,
                   len(list_filter(string_split(text, ' '),
                                   w -> list_contains({_STOPLIST_SQL}, w))) AS stop_count
            FROM documents
        ) f
    """,
    tags=("text", "quality"),
    doc="Per-document quality features: word count, avg word length, stopword "
    "ratio, composite score (length credit + function-word density).",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    n = tx.token_count("text")
    stop = tx.stopword_count("text")
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        stop.alias("stop_count"),
        F.round(tx.nospace_len("text") / n.cast("double") + 1e-9, 4).alias("avg_word_len"),
        F.round(stop / n.cast("double") + 1e-9, 4).alias("stop_ratio"),
        tx.quality_score("text").alias("quality_score"),
    )


@query(
    "text_langid",
    oracle="""
        SELECT lang, pred_lang, count(*) AS n_docs FROM (
            SELECT lang,
                   CASE WHEN c_en = g AND g > 0 THEN 'en'
                        WHEN c_de = g AND g > 0 THEN 'de'
                        WHEN c_fr = g AND g > 0 THEN 'fr'
                        WHEN c_es = g AND g > 0 THEN 'es'
                        ELSE 'unknown' END AS pred_lang
            FROM (
                SELECT lang,
                       len(list_filter(string_split(text, ' '), w -> list_contains(['the','a','and'], w))) AS c_en,
                       len(list_filter(string_split(text, ' '), w -> list_contains(['der','die','und'], w))) AS c_de,
                       len(list_filter(string_split(text, ' '), w -> list_contains(['le','la','et'], w)))   AS c_fr,
                       len(list_filter(string_split(text, ' '), w -> list_contains(['el','la','y'], w)))    AS c_es,
                       greatest(
                           len(list_filter(string_split(text, ' '), w -> list_contains(['the','a','and'], w))),
                           len(list_filter(string_split(text, ' '), w -> list_contains(['der','die','und'], w))),
                           len(list_filter(string_split(text, ' '), w -> list_contains(['le','la','et'], w))),
                           len(list_filter(string_split(text, ' '), w -> list_contains(['el','la','y'], w)))
                       ) AS g
                FROM documents
            ) c
        ) p
        GROUP BY lang, pred_lang
    """,
    tags=("text", "langid"),
    doc="Marker-word language-ID heuristic (argmax with fixed tie order) vs the "
    "labeled lang column, as a confusion-style histogram.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("lang", tx.predict_lang("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_fingerprints",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               count(DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_unique,
               min(md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS min_fp
        FROM documents
        GROUP BY source
    """,
    tags=("text", "fingerprint"),
    doc="Normalized-content md5 fingerprints: distinct-content counts per source.",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    # Two-level aggregate instead of COUNT(DISTINCT expr): the Expand-based
    # distinct plan re-evaluates the regexp+md5 expression per expanded row
    # (measured ~7x slower), and a pre-projection gets collapsed back into
    # it. Grouping by (source, fp) first computes the fingerprint exactly
    # once per row and is the same shape that scales (partial agg on both
    # levels, no Expand).
    per_fp = docs.groupBy("source", tx.fingerprint("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_fp.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        F.min("fp").alias("min_fp"),
    )
