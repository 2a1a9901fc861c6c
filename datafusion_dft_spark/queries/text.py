"""Text-analysis queries over the ``documents`` table.

Beyond-reference pipeline operators (BASELINE.json north star): token
counting, quality scoring, language-ID heuristic, content
fingerprinting. Consolidated to TWO oracle-checked queries (round-2
verdict directive #1 — fit the driver's 50-query cap with zero dark
rows): a per-document feature query (quality + language-ID) and a
grouped corpus-statistics query (token counts + fingerprints). Every
query has a DuckDB oracle computing the *same formula*, so the
differential check validates semantics, not just plumbing. All
Spark-side expressions are built-ins (no Python UDFs) — see
operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import bpe as bp
from ..operators import packing as pk
from ..operators import retrieval as rt
from ..operators import text as tx
from ..registry import query

# Training-sequence length for the packing summary columns of
# text_token_fingerprints (tokens per chunk).
_PACK_SEQ_LEN = 256

# Vocabulary-building summary columns of text_token_fingerprints: the
# corpus-wide top-k bigrams (operators/text.py::top_ngrams). k is small
# because the whole top-k rides the hash as one formatted string; the
# min_count prune is the load-bearing scale lever (docstring there).
_VOCAB_TOP_K = 8
_VOCAB_MIN_COUNT = 2

# Sliding-window chunking summary columns of text_token_fingerprints
# (operators/text.py::chunk_documents — the RAG/context-window grain).
# The Spark side counts the operator's ACTUAL exploded chunk rows and
# sums their word counts; the oracle replays both in closed form
# (k = 1 + ceil(max(n - CW, 0)/stride); sum(words) = n + OV*(k-1)), so
# the hash certifies the window-count and clamped-slice arithmetic.
_CHUNK_WORDS = 64
_CHUNK_OVERLAP = 16

_STOPLIST_SQL = "['the', 'a', 'of', 'to', 'and']"

# Fixed query for the BM25 relevance column of text_quality_langid
# (operators/retrieval.py). Corpus-common terms on purpose: df/N near
# 1 keeps idf small but nonzero, and tf/length-normalization variation
# across documents is what the differential hash then certifies.
_BM25_TERMS = ("hash", "join", "stream")

# BPE-encode differential columns of text_token_fingerprints (r13
# verdict task #5): a fixed deterministic sample (doc_id divisible by
# _BPE_SAMPLE_MOD, non-blank text) encodes under the operator's PINNED
# merge table (operators/bpe.py) on the Spark side while the oracle
# replays the greedy lowest-rank-first loop as a DuckDB recursive CTE
# with the merge list expressed as DATA (list_position = 1-based rank,
# list_min over present ranks picks the best pair, first index on ties
# — exactly encode_word's loop; neither engine shares encoding code).
# Per-doc token counts fold into one md5('doc:n|...') hash so the
# driver value hash certifies every sampled document's encoding. The
# SAMPLE is the scale lever: the recursive CTE re-materializes each
# word's symbol list per merge step, so bounding the sampled doc count
# keeps the oracle near-linear at any SF.
_BPE_SAMPLE_MOD = 17
_BPE_MLIST = "[" + ",".join(
    "'" + (a + " " + b).replace("'", "''") + "'" for a, b in bp.PINNED_MERGES
) + "]"


@query(
    "text_quality_langid",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ), model AS (
            SELECT word, count(*) AS cnt FROM toks GROUP BY word
        ), total AS (SELECT count(*)::DOUBLE AS n FROM toks),
        uni AS (
            SELECT t.doc_id,
                   round(avg(-ln(m.cnt / total.n)) + 1e-9, 4) AS avg_neg_logprob
            FROM toks t JOIN model m USING (word), total
            GROUP BY t.doc_id
        ), sh AS (
            SELECT doc_id,
                   unnest(list_distinct([array_to_string(words[i:i+4], ' ')
                                         for i in range(1, greatest(len(words) - 3, 2))])) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
        ), sk AS (
            SELECT doc_id, array_to_string(list_sort(list(md5(s)))[1:5], '|') AS sketch
            FROM sh GROUP BY doc_id
        ), rep AS (
            -- Gopher/C4 repetition filters on the same word split.
            SELECT doc_id,
                   round(1.0 - len(list_distinct(w)) / len(w)::DOUBLE + 1e-9, 4) AS dup_word_frac,
                   round(CASE WHEN len(w) < 3 THEN 0.0
                              ELSE 1.0 - len(list_distinct([array_to_string(w[i:i+2], ' ')
                                                            for i in range(1, len(w) - 1)]))
                                    / (len(w) - 2)::DOUBLE END + 1e-9, 4) AS dup_3gram_frac
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) rw
        ), g2 AS (
            SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) s2,
                 LATERAL (SELECT unnest(range(1, len(w))) AS i) ix
        ), topg AS (
            SELECT doc_id, max(c) / sum(c)::DOUBLE AS r
            FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g) gc
            GROUP BY doc_id
        ), bm AS ({rt.bm25_oracle_sql(_BM25_TERMS)}
        ), bg AS (
            SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram, w[i] AS w1
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) sbg,
                 LATERAL (SELECT unnest(range(1, len(w))) AS i) ixbg
        ), bgc2 AS (SELECT gram, count(*) AS c2 FROM bg GROUP BY gram),
        bgc1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
        bscore AS (
            SELECT doc_id,
                   round(avg(-ln(bgc2.c2 / CAST(bgc1.c1 AS DOUBLE))) + 1e-9, 4)
                       AS avg_neg_logprob2
            FROM bg JOIN bgc2 USING (gram) JOIN bgc1 USING (w1)
            GROUP BY doc_id
        ), tfidf AS ({rt.tfidf_oracle_sql()}
        )
        SELECT f.*, uni.avg_neg_logprob, sk.sketch,
               rep.dup_word_frac, rep.dup_3gram_frac,
               round(coalesce(topg.r, 0.0) + 1e-9, 4) AS top_2gram_frac,
               bm.bm25_score, bscore.avg_neg_logprob2,
               tfidf.top_tfidf_term, tfidf.top_tfidf_score
        FROM (
        SELECT doc_id, lang, pred_lang, n_words, stop_count,
               round(nospace_len / CAST(n_words AS DOUBLE) + 1e-9, 4) AS avg_word_len,
               round(stop_count / CAST(n_words AS DOUBLE) + 1e-9, 4) AS stop_ratio,
               round(least(n_words / 100.0, 1.0) * 0.5
                     + (stop_count / CAST(n_words AS DOUBLE)) * 0.5 + 1e-9, 4) AS quality_score
        FROM (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_words,
                   length(replace(text, ' ', '')) AS nospace_len,
                   len(list_filter(string_split(text, ' '),
                                   w -> list_contains({_STOPLIST_SQL}, w))) AS stop_count,
                   CASE WHEN c_en = g AND g > 0 THEN 'en'
                        WHEN c_de = g AND g > 0 THEN 'de'
                        WHEN c_fr = g AND g > 0 THEN 'fr'
                        WHEN c_es = g AND g > 0 THEN 'es'
                        ELSE 'unknown' END AS pred_lang
            FROM (
                SELECT doc_id, lang, text,
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
        ) f0
        ) f
        JOIN uni USING (doc_id)
        JOIN sk USING (doc_id)
        JOIN rep USING (doc_id)
        LEFT JOIN topg USING (doc_id)
        JOIN bm USING (doc_id)
        JOIN bscore USING (doc_id)
        JOIN tfidf USING (doc_id)
    """,
    tags=("text", "quality", "langid", "language-model", "sketch", "retrieval"),
    doc="The per-document feature relation: quality features (word count, avg "
    "word length, stopword ratio, composite score), marker-word language-ID "
    "prediction (argmax with fixed tie order) next to the labeled lang "
    "column, unigram-LM pseudo-perplexity (avg_neg_logprob — corpus model "
    "as a relation, one shuffle join on word; the cheap pre-model quality "
    "filter), CONDITIONAL BIGRAM surprisal (avg_neg_logprob2 — "
    "p(w2|w1)=c(w1 w2)/c(w1 ·), the order-sensitive signal unigram "
    "surprisal can't see; one explode + two model aggs), BM25 relevance "
    "against a fixed query (operators/retrieval.py — per-doc array-fold "
    "term frequencies, ONE broadcast corpus-stats row, zero shuffles; the "
    "targeted-corpus-construction scorer), Gopher/C4-style repetition "
    "filters (dup-word fraction, dup-3-gram fraction, top-2-gram fraction "
    "— shuffle-free array folds; the top-gram mode is a max-run-length "
    "aggregate over the sorted gram array), TF-IDF keyword extraction "
    "(top_tfidf_term/score — sklearn smooth_idf convention, one (doc, "
    "term) shuffle with map-side combine, vocabulary-bounded df relation "
    "broadcast under budget, order-free min(struct) argmax instead of a "
    "global window sort; the cheap topic signal ahead of domain routing), "
    "and the engine-portable min-k md5 shingle sketch. One doc_id-grain "
    "query consolidating the text-analysis surface under the driver's "
    "50-query cap (operators/text.py, operators/retrieval.py, "
    "operators/dedup.py).",
)
def text_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_tables(spark, sf_dir)["documents"]
    n = tx.token_count("text")
    stop = tx.stopword_count("text")
    feats = docs.select(
        "doc_id",
        "lang",
        tx.predict_lang("text").alias("pred_lang"),
        n.alias("n_words"),
        stop.alias("stop_count"),
        F.round(tx.nospace_len("text") / n.cast("double") + 1e-9, 4).alias("avg_word_len"),
        F.round(stop / n.cast("double") + 1e-9, 4).alias("stop_ratio"),
        tx.quality_score("text").alias("quality_score"),
        # Gopher/C4-style repetition filters — pure array expressions on
        # the same word split, zero extra shuffles.
        tx.dup_word_frac("text").alias("dup_word_frac"),
        tx.dup_ngram_frac("text", 3).alias("dup_3gram_frac"),
        tx.top_ngram_frac("text", 2).alias("top_2gram_frac"),
    )
    uni = tx.unigram_logprob_scores(docs).select("doc_id", "avg_neg_logprob")
    sketch = (
        dd.word_shingles(docs, "doc_id", "text", k=5)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.slice(F.sort_array(F.collect_list(F.md5("shingle"))), 1, 5), "|"
            ).alias("sketch")
        )
    )
    # BM25 relevance against the fixed query (operators/retrieval.py —
    # per-doc array-fold tfs, one broadcast stats row, zero shuffles)
    # and conditional bigram surprisal (the order-sensitive LM-lite
    # signal; corpus bigram model as a relation).
    bm = rt.bm25_scores(docs, _BM25_TERMS).select("doc_id", "bm25_score")
    bg = tx.bigram_logprob_scores(docs).select("doc_id", "avg_neg_logprob2")
    # TF-IDF keyword extraction (operators/retrieval.py::tfidf_top_terms
    # — one (doc, term) shuffle, vocabulary-bounded df relation broadcast
    # under budget, order-free min(struct) argmax).
    tfv = rt.tfidf_top_terms(docs)
    return (
        feats.join(uni, "doc_id")
        .join(sketch, "doc_id")
        .join(bm, "doc_id")
        .join(bg, "doc_id")
        .join(tfv, "doc_id")
    )


# Deterministic PII-bearing seed docs (the corpus itself contains no
# PII): both engines union the SAME rows under a dedicated group so the
# census/redaction columns are non-vacuous. The oracle VALUES are
# generated from this list, so the two sides cannot drift. NEGATIVE ids
# are provably outside every generator's doc_id domain (0..N-1), so the
# union can never collide with a real doc at any scale factor — a
# positive constant (the old 9000000 block) would duplicate generated
# ids at sf >= 180 and trip pack_sequences' uniqueness guard.
PII_SEED_ROWS = [
    (-9000001, "reach me at alice@example.com or 192.168.0.1 thanks", "xx", "seeded_pii"),
    (-9000002, "call +1 (555) 010-4477 or mail bob.smith+spam@mail.example.org now", "xx", "seeded_pii"),
    (-9000003, "no pii here just plain words", "xx", "seeded_pii"),
    (-9000004, "ips 10.0.0.7 and 172.16.254.3 email c@d.io", "xx", "seeded_pii"),
    (-9000005, "phones 555 010 9999 and 555-010-9998", "xx", "seeded_pii"),
]
_PII_SEED_VALUES = ", ".join(
    f"({i}, '{t}', '{lg}', '{s}')" for i, t, lg, s in PII_SEED_ROWS
)


@query(
    "text_token_fingerprints",
    oracle=f"""
        WITH RECURSIVE docs AS (
            SELECT doc_id, text, lang, source FROM documents
            UNION ALL
            SELECT * FROM (VALUES {_PII_SEED_VALUES}) v(doc_id, text, lang, source)
        ), bpe_words AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word,
                   unnest(range(1, len(string_split(lower(text), ' ')) + 1)) AS widx
            FROM docs
            WHERE doc_id % {_BPE_SAMPLE_MOD} = 0
              AND text IS NOT NULL AND trim(text) <> ''
        ), bpe_enc AS (
            -- init: chars + end-of-word marker on the last char
            SELECT doc_id, widx,
                   list_append(
                       list_transform(range(1, length(word)), i -> word[i]),
                       word[length(word)] || '</w>') AS syms,
                   0 AS it
            FROM bpe_words WHERE word <> ''
            UNION ALL
            -- step: merge the FIRST occurrence of the best-ranked pair
            SELECT doc_id, widx,
                   list_concat(list_concat(
                       syms[1:best_i-1],
                       [syms[best_i] || syms[best_i+1]]),
                       syms[best_i+2:]) AS syms,
                   it + 1
            FROM (
                SELECT doc_id, widx, syms, it,
                       list_position(ranks,
                           list_min(list_filter(ranks, r -> r > 0))) AS best_i
                FROM (
                    SELECT doc_id, widx, syms, it,
                           list_transform(range(1, len(syms)),
                               i -> list_position({_BPE_MLIST},
                                                  syms[i] || ' ' || syms[i+1])) AS ranks
                    FROM bpe_enc)
                WHERE len(list_filter(ranks, r -> r > 0)) > 0)
        ), bpe_counts AS (
            SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS n
            FROM (SELECT doc_id, widx, arg_max(syms, it) AS syms
                  FROM bpe_enc GROUP BY 1, 2)
            GROUP BY doc_id
        ), bsum AS (
            SELECT count(*) AS bpe_sample_docs,
                   CAST(coalesce(sum(n), 0) AS BIGINT) AS bpe_sample_tokens,
                   md5(coalesce(string_agg(doc_id || ':' || n, '|' ORDER BY doc_id),
                                '')) AS bpe_tokens_hash
            FROM bpe_counts
        ), vocab AS (
            SELECT gram, count(*) AS cnt
            FROM (
                SELECT array_to_string(w[i:i+1], ' ') AS gram
                FROM (SELECT string_split(text, ' ') AS w FROM docs) s,
                     LATERAL (SELECT unnest(range(1, len(w))) AS i) ix
            ) g
            GROUP BY gram HAVING count(*) >= {_VOCAB_MIN_COUNT}
            ORDER BY cnt DESC, gram LIMIT {_VOCAB_TOP_K}
        ), vsum AS (
            SELECT coalesce(string_agg(gram || ':' || cnt || ':' || rnk, '|' ORDER BY rnk), '')
                       AS vocab_top_grams,
                   CAST(coalesce(sum(cnt), 0) AS BIGINT) AS vocab_top_total
            FROM (SELECT gram, cnt,
                         row_number() OVER (ORDER BY cnt DESC, gram) AS rnk
                  FROM vocab) r
        ), qscores AS (
            SELECT lang, source,
                   round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.5
                         + len(list_filter(string_split(text, ' '),
                               w -> list_contains({_STOPLIST_SQL}, w)))
                           / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.5
                         + 1e-9, 4) AS q
            FROM docs
        ), grp_q AS (
            SELECT lang, source,
                   quantile_cont(q, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS gq
            FROM qscores GROUP BY lang, source
        ), glob_q AS (
            SELECT quantile_cont(q, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bq
            FROM qscores
        ), drift AS (
            SELECT lang AS dlang, source AS dsource,
                   round(list_max([abs(gq[i] - bq[i]) for i in range(1, 10)])
                         + 1e-9, 4) AS quality_drift
            FROM grp_q CROSS JOIN glob_q
        )
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               round(sum(len(string_split(text, ' '))) / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS avg_tokens,
               CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_lex_tokens,
               count(DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_unique,
               min(md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS min_fp,
               CAST(sum(len(regexp_extract_all(text, '{tx.PII_EMAIL}'))) AS BIGINT) AS pii_emails,
               CAST(sum(len(regexp_extract_all(text, '{tx.PII_PHONE}'))) AS BIGINT) AS pii_phones,
               CAST(sum(len(regexp_extract_all(text, '{tx.PII_IPV4}'))) AS BIGINT) AS pii_ips,
               CAST(sum(CASE WHEN regexp_replace(regexp_replace(regexp_replace(text,
                             '{tx.PII_EMAIL}', '[PII]', 'g'),
                             '{tx.PII_IPV4}', '[PII]', 'g'),
                             '{tx.PII_PHONE}', '[PII]', 'g') <> text
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
               any_value(p.n_straddles) AS n_straddles,
               any_value(p.max_chunk) AS max_chunk,
               any_value(c.n_chunks) AS n_chunks,
               any_value(c.total_chunk_words) AS total_chunk_words,
               any_value(vsum.vocab_top_grams) AS vocab_top_grams,
               any_value(vsum.vocab_top_total) AS vocab_top_total,
               any_value(drift.quality_drift) AS quality_drift,
               any_value(bsum.bpe_sample_docs) AS bpe_sample_docs,
               any_value(bsum.bpe_sample_tokens) AS bpe_sample_tokens,
               any_value(bsum.bpe_tokens_hash) AS bpe_tokens_hash
        FROM docs
        CROSS JOIN vsum
        CROSS JOIN bsum
        JOIN drift ON drift.dlang = docs.lang AND drift.dsource = docs.source
        JOIN (
            -- sliding-window chunking in closed form: the Spark side
            -- counts chunk_documents' actual exploded windows; here
            -- k = 1 + ceil(max(n - CW, 0)/stride) and the clamped-slice
            -- word total collapses to n + OV*(k-1) (each overlap
            -- double-counted once)
            SELECT lang AS clang, source AS csource,
                   CAST(sum(k) AS BIGINT) AS n_chunks,
                   CAST(sum(n + {_CHUNK_OVERLAP} * (k - 1)) AS BIGINT)
                       AS total_chunk_words
            FROM (
                SELECT lang, source, n,
                       1 + CASE WHEN n > {_CHUNK_WORDS}
                                THEN CAST(ceil((n - {_CHUNK_WORDS})
                                     / {_CHUNK_WORDS - _CHUNK_OVERLAP}.0)
                                     AS BIGINT)
                                ELSE 0 END AS k
                FROM (SELECT lang, source,
                             len(string_split(text, ' ')) AS n FROM docs)
            ) GROUP BY lang, source
        ) c ON c.clang = docs.lang AND c.csource = docs.source
        JOIN (
            SELECT lang AS plang, source AS psource,
                   CAST(sum(CASE WHEN (off + greatest(tok, 1) - 1) // {_PACK_SEQ_LEN}
                            <> off // {_PACK_SEQ_LEN} THEN 1 ELSE 0 END) AS BIGINT) AS n_straddles,
                   CAST(max((off + greatest(tok, 1) - 1) // {_PACK_SEQ_LEN}) AS BIGINT) AS max_chunk
            FROM (
                SELECT lang, source,
                       sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                           - tok AS off,
                       tok
                FROM (SELECT doc_id, lang, source,
                             len(string_split(text, ' ')) AS tok FROM docs)
            ) GROUP BY lang, source
        ) p ON p.plang = docs.lang AND p.psource = docs.source
        GROUP BY lang, source
    """,
    tags=("text", "tokens", "fingerprint", "pii", "packing", "vocabulary",
          "chunking", "bpe"),
    doc="Corpus statistics by lang/source: token counting (whitespace + "
    "lexer-regex), normalized-content md5 fingerprint distinct counts, "
    "the PII census + redaction change-detection (email/IPv4/phone regex "
    "family from operators/text.py, Java-regex ∩ RE2 subset so DuckDB "
    "replays it verbatim) over five seeded PII-bearing docs in their own "
    "(lang, source) group — the corpus itself contains none, which would "
    "leave the columns vacuously zero — and SEQUENCE-PACKING summary "
    "columns (n_straddles/max_chunk): operators/packing.py assigns every "
    "doc its global token offset via the two-pass bucketed distributed "
    "prefix sum (one data shuffle, driver state = n_buckets rows, never "
    "a single-partition global window), the oracle recomputes the same "
    "offsets with a plain SQL cumulative window — integer-exact, so the "
    "distributed decomposition is verified against the single-stream "
    "definition. Since r11 also SLIDING-WINDOW CHUNKING summary columns "
    "(n_chunks/total_chunk_words): operators/text.py::chunk_documents — "
    "the RAG/context-window grain, 64-word windows at 16-word overlap, "
    "zero shuffles — counted from the operator's actual exploded "
    "windows on the Spark side while the oracle holds the closed form "
    "(k = 1 + ceil(max(n-64,0)/48); word total = n + 16(k-1)), so the "
    "hash certifies the window-count and clamped-slice arithmetic; "
    "full chunk-text differential + losslessness in "
    "tests/test_chunking.py. Since r14 also BPE-ENCODE columns "
    "(bpe_sample_docs/bpe_sample_tokens/bpe_tokens_hash): a fixed "
    "doc_id-stride sample encodes through operators/bpe.py::apply_bpe "
    "under the PINNED merge table while the oracle replays the greedy "
    "loop as a recursive CTE (merge list as data) — the per-doc counts "
    "fold into one order-pinned md5, upgrading the tokenizer surface "
    "from pytest-only (tests/test_bpe_differential.py) to "
    "driver-checked.",
)
def text_token_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text", "lang", "source"
    )
    # The synthetic corpus contains no PII, which would leave the census/
    # redaction columns vacuously zero; both engines therefore seed the
    # same five deterministic PII-bearing docs under a dedicated
    # (lang='xx', source='seeded_pii') group, so the check proves the
    # regex census and the redaction change-detection actually fire —
    # the dedup_embedding_cosine planted-fixture pattern applied to PII.
    seeds = spark.createDataFrame(PII_SEED_ROWS, "doc_id long, text string, lang string, source string")
    docs = docs.unionByName(seeds)
    pii = tx.pii_counts("text")
    # Two-level aggregate instead of COUNT(DISTINCT expr): the Expand-based
    # distinct plan re-evaluates the regexp+md5 expression per expanded row
    # (measured ~7x slower), and a pre-projection gets collapsed back into
    # it. Grouping by (lang, source, fp) first computes each expensive
    # expression exactly once per row; both levels keep partial aggregation
    # (no Expand) — the shape that scales.
    per_fp = docs.groupBy("lang", "source", tx.fingerprint("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(tx.token_count("text")).alias("tok"),
        F.sum(tx.regex_token_count("text")).alias("lex"),
        F.sum(pii["n_emails"]).alias("pe"),
        F.sum(pii["n_phones"]).alias("pp"),
        F.sum(pii["n_ips"]).alias("pi"),
        F.sum(
            F.when(tx.redact_pii("text") != F.col("text"), 1).otherwise(0)
        ).alias("red"),
    )
    stats = per_fp.groupBy("lang", "source").agg(
        F.sum("n").alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        F.round(F.sum("tok") / F.sum("n").cast("double") + 1e-9, 4).alias("avg_tokens"),
        F.sum("lex").alias("total_lex_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        F.min("fp").alias("min_fp"),
        F.sum("pe").alias("pii_emails"),
        F.sum("pp").alias("pii_phones"),
        F.sum("pi").alias("pii_ips"),
        F.sum("red").alias("n_docs_redacted"),
    )
    # Sequence-packing summary at the same grain: the distributed
    # bucketed prefix sum assigns global token offsets; per group we
    # report how many docs straddle a training-chunk boundary and the
    # highest chunk the group reaches. The (lang, source)-grain join is
    # tiny (broadcast).
    packed = pk.pack_sequences(
        docs.withColumn("_tok", tx.token_count("text")),
        "doc_id",
        "_tok",
        _PACK_SEQ_LEN,
    )
    # Vocabulary building folded in at the corpus grain: the top-k
    # bigrams (gram:count:rank, rank-ordered) ride every output row as
    # one formatted string, so the driver's value hash covers the
    # operator's gram identities, counts, AND tie-broken ranking. The
    # summary is a one-row aggregate over the k surviving grams.
    vocab = tx.top_ngrams(docs, "text", n=2, k=_VOCAB_TOP_K, min_count=_VOCAB_MIN_COUNT)
    vsum = vocab.agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "gram", "count"))),
                lambda s: F.concat_ws(":", s["gram"], s["count"], s["rank"]),
            ),
            "|",
        ).alias("vocab_top_grams"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("vocab_top_total"),
    )
    # Sliding-window chunking summary at the same grain, computed from
    # the operator's exploded output (not a closed-form reimplementation
    # — the oracle side holds the closed form, so the differential
    # certifies chunk_documents' window arithmetic end to end).
    chunks = tx.chunk_documents(
        docs, chunk_words=_CHUNK_WORDS, overlap_words=_CHUNK_OVERLAP
    )
    chagg = chunks.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_words").cast("long").alias("total_chunk_words"),
    )
    # Quality-distribution drift per (lang, source): discrete-KS
    # distance between the group's quality-score deciles and the
    # corpus-global ones (operators/percentiles.py::group_drift — the
    # pipeline-monitoring primitive; exact percentiles on 4-dp scores
    # keep the interpolation engine-exact).
    from ..operators.percentiles import group_drift

    drift = group_drift(docs, ["lang", "source"], tx.quality_score("text")).select(
        "lang", "source", F.col("drift").alias("quality_drift")
    )
    # BPE-encode differential at the corpus grain (like vocab): the
    # deterministic sample encodes through the operator's real
    # Arrow-batched stage under the PINNED merges; the per-doc counts
    # fold into one order-pinned md5 so the driver hash certifies each
    # sampled document's encoding against the oracle's recursive-CTE
    # replay. ensure_min_parallelism: the sampled scan is one task on
    # the single-row-group test parquet, and single-task Python stages
    # take this container's per-vCPU degradation at full blast radius.
    from ..session import ensure_min_parallelism

    sampled = docs.filter(
        (F.col("doc_id") % _BPE_SAMPLE_MOD == 0)
        & F.col("text").isNotNull()
        & (F.trim(F.col("text")) != "")
    ).select("doc_id", "text")
    enc = bp.apply_bpe(ensure_min_parallelism(sampled), bp.PINNED_MERGES)
    bsum = enc.agg(
        F.count(F.lit(1)).alias("bpe_sample_docs"),
        F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).cast("long").alias(
            "bpe_sample_tokens"
        ),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "n_bpe_tokens"))
                    ),
                    lambda s: F.concat_ws(":", s["doc_id"], s["n_bpe_tokens"]),
                ),
                "|",
            )
        ).alias("bpe_tokens_hash"),
    )
    # explicit broadcast: both sides are post-aggregate plans whose size
    # Catalyst can't estimate (the seed union hides the parquet stats),
    # and the summary side is provably tiny (#lang × #source rows)
    return (
        stats.join(
            F.broadcast(pk.packing_summary(packed, "lang", "source")),
            ["lang", "source"],
        )
        .join(F.broadcast(chagg), ["lang", "source"])
        .join(F.broadcast(drift), ["lang", "source"])
        .crossJoin(F.broadcast(vsum))
        .crossJoin(F.broadcast(bsum))
    )
