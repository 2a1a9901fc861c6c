"""Deterministic-sampling queries over the ``documents`` table.

Registry surface for operators/sampling.py: content-hash sampling is a
training-mix primitive (auditable, repartition-stable, incremental-
append-stable), and its md5 predicate replays exactly in DuckDB, so
the whole operator is oracle-checked like the sketch pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import sampling as sp
from ..operators import text as tx
from ..operators.ordering import deterministic_shuffle
from ..registry import query

_FRACTION = 0.2
# Seed for the reproducible-global-shuffle variant ('shuf').
_SHUFFLE_SEED = 7
# Per-language training-mix fractions: keep all German, half English,
# drop everything else (absent strata drop — explicit beats implicit
# when the output feeds a training mix).
_STRATA = {"en": 0.5, "de": 1.0}
# Quality-stratified ('curriculum') variant: keep documents at or above
# this per-language quality-score quantile (top quartile).
_QUALITY_QUANTILE = 0.75
# Target-share mixture variant ('mixw'): explicit DoReMi-style domain
# weights over three sources; every other source drops.
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
# Weighted-sample variant ('wsamp'): Efraimidis–Spirakis race keyed on
# n_chars (longer documents more likely), fixed draw size and seed.
_WSAMP_N = 100
_WSAMP_SEED = 3
# DuckDB replay of operators/text.py::quality_score — keep in sync with
# the stopword list there.
_STOPLIST_SQL = "['the', 'a', 'of', 'to', 'and']"


@query(
    "sampling_suite",
    oracle=f"""
        SELECT 'det' AS variant, doc_id, lang, NULL::BIGINT AS shuffle_pos
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {sp._M} < {int(_FRACTION * sp._M)}
        UNION ALL
        SELECT 'strat' AS variant, doc_id, lang, NULL::BIGINT AS shuffle_pos
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {sp._M} < CASE lang WHEN 'en' THEN {int(0.5 * sp._M)}
                                    WHEN 'de' THEN {int(1.0 * sp._M)}
                                    ELSE 0 END
        UNION ALL
        SELECT 'mix' AS variant, d.doc_id, d.lang, NULL::BIGINT AS shuffle_pos
        FROM documents d
        JOIN (
            SELECT lang,
                   CAST(floor({sp._M} * sqrt(CAST(min(n) OVER () AS DOUBLE) / n))
                        AS BIGINT) AS t
            FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
        ) th USING (lang)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {sp._M} < th.t
        UNION ALL
        SELECT 'shuf' AS variant, doc_id, lang,
               CAST(row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '#{_SHUFFLE_SEED}'),
                            doc_id) - 1 AS BIGINT) AS shuffle_pos
        FROM documents
        UNION ALL
        SELECT 'qual' AS variant, doc_id, lang, NULL::BIGINT AS shuffle_pos
        FROM (
            SELECT doc_id, lang,
                   round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.5
                         + len(list_filter(string_split(text, ' '),
                               w -> list_contains({_STOPLIST_SQL}, w)))
                           / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.5
                         + 1e-9, 4) AS q
            FROM documents
        ) d
        JOIN (
            SELECT lang, quantile_cont(q, {_QUALITY_QUANTILE}) AS t
            FROM (
                SELECT lang,
                       round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.5
                             + len(list_filter(string_split(text, ' '),
                                   w -> list_contains({_STOPLIST_SQL}, w)))
                               / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.5
                             + 1e-9, 4) AS q
                FROM documents
            ) GROUP BY lang
        ) th USING (lang)
        WHERE d.q >= th.t
        UNION ALL
        SELECT 'mixw' AS variant, m.doc_id, m.lang, NULL::BIGINT AS shuffle_pos
        FROM ({sp.mixture_oracle_sql("doc_id", "source", _MIX_WEIGHTS)}) m
        UNION ALL
        SELECT 'wsamp' AS variant, w.doc_id, w.lang, NULL::BIGINT AS shuffle_pos
        FROM ({sp.weighted_oracle_sql(
            "doc_id", "n_chars", _WSAMP_N, _WSAMP_SEED,
            table="(SELECT * FROM documents WHERE doc_id IS NOT NULL"
            " AND n_chars IS NOT NULL AND n_chars > 0)",
        )}) w
    """,
    tags=("sampling", "pipeline"),
    doc="Deterministic content-hash sampling (md5(key) mod M < p*M): a flat "
    "20% sample, a stratified per-language training mix, and the "
    "inverse-frequency temperature mix (each language keeps "
    "sqrt(n_min/n_s) — the standard rebalancing that stops dominant "
    "languages drowning rare ones; thresholds are floor(M*sqrt(n_min/n)) "
    "with IEEE-exact sqrt, so DuckDB re-derives them bit-identically from "
    "its own counts). Membership is stable under repartitioning, re-runs, "
    "and corpus growth — unlike seed-based df.sample — and every sampling "
    "variant stays a scan-level predicate (zero exchanges, asserted in "
    "tests/test_sampling.py; the mix pre-runs one #strata-row count "
    "aggregation). The fourth variant is the REPRODUCIBLE GLOBAL SHUFFLE "
    "(training order): every row's 0-based position in the seeded "
    "content-hash order, computed as a two-pass distributed rank (256 "
    "order-aligned md5 buckets, prefix counts to the driver, one "
    "shuffle — never a single-task global row_number; "
    "operators/ordering.py), differentially checked against the plain "
    "SQL row_number definition. The fifth variant is QUALITY-STRATIFIED "
    "(curriculum) sampling: keep rows at/above the per-language 0.75 "
    "quality-score quantile (operators/sampling.py::"
    "quality_stratified_sample — one exact-percentile agg per stratum "
    "broadcast back, ties included so the subset is deterministic). "
    "The sixth variant is TARGET-SHARE MIXTURE construction (mixture_"
    "sample): explicit DoReMi-style domain weights — the largest "
    "achievable output N = min(n_s/w_s) is capped by the scarcest "
    "stratum relative to its target, which survives whole while every "
    "other stratum down-samples to w_s*N/n_s; thresholds are pure IEEE "
    "divide/multiply/min/floor on exact counts, so DuckDB re-derives "
    "them bit-identically. The seventh variant is WEIGHTED sampling "
    "without replacement (weighted_sample — Efraimidis–Spirakis on "
    "content hashes: race key -ln(u)/w with u a deterministic md5 "
    "uniform, n smallest win via TakeOrderedAndProject, 12-dp-rounded "
    "race keys + key tie-break so libm ulp differences cannot flip the "
    "cut). operators/sampling.py.",
)
def sampling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    nopos = F.lit(None).cast("long").alias("shuffle_pos")
    det = sp.deterministic_sample(docs, "doc_id", _FRACTION).select(
        F.lit("det").alias("variant"), "doc_id", "lang", nopos
    )
    strat = sp.stratified_sample(docs, "doc_id", "lang", _STRATA).select(
        F.lit("strat").alias("variant"), "doc_id", "lang", nopos
    )
    mix = sp.inverse_frequency_sample(docs, "doc_id", "lang").select(
        F.lit("mix").alias("variant"), "doc_id", "lang", nopos
    )
    shuf = deterministic_shuffle(docs, "doc_id", seed=_SHUFFLE_SEED).select(
        F.lit("shuf").alias("variant"), "doc_id", "lang", "shuffle_pos"
    )
    qual = sp.quality_stratified_sample(
        docs, "doc_id", "lang", tx.quality_score("text"), quantile=_QUALITY_QUANTILE
    ).select(F.lit("qual").alias("variant"), "doc_id", "lang", nopos)
    # absent='drop': a partition-pruned / adversarial corpus missing a
    # weighted source degrades to a partial mix (oracle-identical — its
    # count join simply has no rows for that source), never a failure.
    mixw = sp.mixture_sample(
        docs, "doc_id", "source", _MIX_WEIGHTS, absent="drop"
    ).select(F.lit("mixw").alias("variant"), "doc_id", "lang", nopos)
    # Weight/key hygiene applied identically in the oracle: NULL keys
    # would tie-break differently across engines (Spark sorts NULLs
    # first, DuckDB last) and non-positive weights have no sampling
    # meaning (the bare operator raises on them — loud by default).
    wdocs = docs.filter(
        F.col("doc_id").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") > 0)
    )
    wsamp = sp.weighted_sample(wdocs, "doc_id", "n_chars", _WSAMP_N, _WSAMP_SEED).select(
        F.lit("wsamp").alias("variant"), "doc_id", "lang", nopos
    )
    return (
        det.unionAll(strat)
        .unionAll(mix)
        .unionAll(shuf)
        .unionAll(qual)
        .unionAll(mixw)
        .unionAll(wsamp)
    )
