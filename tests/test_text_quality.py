"""Unigram log-probability scoring: DuckDB differential + signal sanity."""

from __future__ import annotations

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import text as tx

ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), model AS (
    SELECT word, count(*) AS cnt FROM toks GROUP BY word
), total AS (SELECT count(*)::DOUBLE AS n FROM toks)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(avg(-ln(m.cnt / total.n)) + 1e-9, 4) AS avg_neg_logprob
FROM toks t JOIN model m USING (word), total
GROUP BY t.doc_id
"""


def test_scores_match_duckdb(spark, sf_dir, duckcon):
    docs = load_tables(spark, sf_dir)["documents"]
    got = {
        r.doc_id: (r.n_tokens, r.avg_neg_logprob)
        for r in tx.unigram_logprob_scores(docs).collect()
    }
    want = {d: (n, s) for d, n, s in duckcon.sql(ORACLE).fetchall()}
    assert set(got) == set(want)
    mismatched = {d for d in got if got[d] != want[d]}
    assert not mismatched, {d: (got[d], want[d]) for d in sorted(mismatched)[:3]}


def test_rare_token_doc_scores_higher(spark, sf_dir):
    """A doc of corpus-unique gibberish must out-score every real doc —
    the filtering signal the operator exists for."""
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_dir)["documents"]
    weird = spark.createDataFrame(
        [(999999, "zqxj wvkp qqqz mxvw zzzv")], "doc_id long, text string"
    )
    aug = docs.select("doc_id", "text").unionByName(weird)
    scores = tx.unigram_logprob_scores(aug)
    top = scores.orderBy(F.desc("avg_neg_logprob")).first()
    assert top.doc_id == 999999


def test_repetition_filters_hand_computed(spark):
    """Gopher/C4 repetition stats on hand-computable documents."""
    from pyspark.sql import functions as F

    rows = [
        # 6 words, 3 distinct -> dup_word 0.5; 2-grams: "a b","b a","a b",
        # "b c","c c" -> top 2/5 = 0.4; 3-grams: 4 total, all distinct -> 0.0
        (1, "a b a b c c"),
        # all same word: dup_word 1 - 1/4 = 0.75; 2-grams "x x" x3 -> 1.0;
        # 3-grams "x x x" x2 -> dup 0.5
        (2, "x x x x"),
        # single word: no 2-grams/3-grams -> 0.0, dup_word 0.0
        (3, "solo"),
        (4, "p q"),  # one 2-gram -> top 1.0; no 3-grams -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.dw, r.d3, r.t2)
        for r in df.select(
            "doc_id",
            tx.dup_word_frac("text").alias("dw"),
            tx.dup_ngram_frac("text", 3).alias("d3"),
            tx.top_ngram_frac("text", 2).alias("t2"),
        ).collect()
    }
    assert got[1] == (0.5, 0.0, 0.4)
    assert got[2] == (0.75, 0.5, 1.0)
    assert got[3] == (0.0, 0.0, 0.0)
    assert got[4] == (0.0, 0.0, 1.0)


def test_repetition_filters_are_shuffle_free(spark):
    """The per-doc repetition stats must not add exchanges: one
    projection over the scan."""
    from datafusion_dft_spark.plans import explain as ex

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string").select(
        "doc_id",
        tx.dup_word_frac("text").alias("dw"),
        tx.dup_ngram_frac("text", 3).alias("d3"),
        tx.top_ngram_frac("text", 2).alias("t2"),
    )
    assert ex.exchange_count(df) == 0, ex.simple_plan(df)


# --------------------------------------------------------------------------
# Property fuzz: repetition filters vs a direct Python reference.
# --------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _rep_ref(text: str, n: int) -> tuple[float, float, float]:
    """Reference semantics: dup_word_frac, dup_ngram_frac(n), top_2gram_frac."""
    w = text.split(" ")
    dup_w = 1.0 - len(set(w)) / len(w)
    grams_n = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)] if len(w) >= n else []
    dup_n = (1.0 - len(set(grams_n)) / len(grams_n)) if grams_n else 0.0
    g2 = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)] if len(w) >= 2 else []
    top2 = (max(g2.count(g) for g in set(g2)) / len(g2)) if g2 else 0.0

    def r4(x: float) -> float:
        import math

        return math.floor((x + 1e-9) * 10000 + 0.5) / 10000  # HALF_UP like Spark

    return (r4(dup_w), r4(dup_n), r4(top2))


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "x"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_fuzz_repetition_filters(spark, docs):
    """Random small-alphabet word lists (duplicates guaranteed) must match
    the direct Python formulation — including empty docs (split('') ==
    ['']) and docs shorter than the gram width."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.dw, r.d3, r.t2)
        for r in df.select(
            "doc_id",
            tx.dup_word_frac("text").alias("dw"),
            tx.dup_ngram_frac("text", 3).alias("d3"),
            tx.top_ngram_frac("text", 2).alias("t2"),
        ).collect()
    }
    want = {i: _rep_ref(t, 3) for i, t in rows}
    assert got == want


def test_repetition_filters_consecutive_spaces(spark):
    """split('a  b') yields an empty-string word; gram joins must agree
    with the Python reference on that shape too."""
    rows = [(1, "a  b"), (2, "  "), (3, "a  a  a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.dw, r.d3, r.t2)
        for r in df.select(
            "doc_id",
            tx.dup_word_frac("text").alias("dw"),
            tx.dup_ngram_frac("text", 3).alias("d3"),
            tx.top_ngram_frac("text", 2).alias("t2"),
        ).collect()
    }
    want = {i: _rep_ref(t, 3) for i, t in rows}
    assert got == want


def test_top_ngrams_matches_duckdb(spark, sf_dir, duckcon):
    """Vocabulary building: top-k frequent unigrams and bigrams match
    DuckDB's exhaustive count with identical (count desc, gram) ties."""
    from datafusion_dft_spark.catalog import load_tables
    from datafusion_dft_spark.operators.text import top_ngrams

    docs = load_tables(spark, sf_dir)["documents"]
    for n, join_expr in ((1, "w"), (2, "w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i)")):
        got = [
            (r.gram, r["count"], r.rank)
            for r in top_ngrams(docs, "text", n=n, k=20).orderBy("rank").collect()
        ]
        want = [
            (g, int(c), int(rk))
            for g, c, rk in duckcon.sql(
                f"""
                WITH words AS (
                    SELECT doc_id, i, words[i] AS w
                    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
                         unnest(range(1, len(words) + 1)) AS t(i)
                ), grams AS (
                    SELECT {join_expr} AS gram FROM words
                ), counts AS (
                    SELECT gram, count(*) AS c FROM grams
                    WHERE gram IS NOT NULL GROUP BY gram
                )
                SELECT gram, c, row_number() OVER (ORDER BY c DESC, gram) AS rk
                FROM counts ORDER BY c DESC, gram LIMIT 20
                """
            ).fetchall()
        ]
        assert got == want, f"n={n}"


def test_top_ngrams_min_count_prunes(spark):
    from datafusion_dft_spark.operators.text import top_ngrams

    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    got = {r.gram: r["count"] for r in top_ngrams(df, "text", n=1, k=10, min_count=2).collect()}
    assert got == {"a": 3, "b": 2}


def test_bm25_hand_computed(spark):
    """BM25 against a 3-doc corpus, checked against the formula computed
    with plain Python floats (same IEEE ops)."""
    import math

    from datafusion_dft_spark.operators.retrieval import bm25_scores

    rows = [(1, "x x y z"), (2, "x q q q"), (3, "q q q q q q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25_score for r in bm25_scores(df, ("x", "y")).collect()}

    n, avgdl = 3.0, (4 + 4 + 6) / 3.0
    k1, b = 1.2, 0.75

    def score(tfs, dl):
        s = 0.0
        for t, df_t in (("x", 2.0), ("y", 1.0)):
            tf = float(tfs.get(t, 0))
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return round(s + 1e-9, 4)

    want = {
        1: score({"x": 2, "y": 1}, 4.0),
        2: score({"x": 1}, 4.0),
        3: score({}, 6.0),
    }
    assert got == want
    assert got[3] == 0.0  # no query terms -> zero relevance
    assert got[1] > got[2]  # more matching mass ranks higher


def test_bm25_matches_duckdb(spark, sf_dir, duckcon):
    """The operator and its generated oracle agree on the real corpus."""
    from datafusion_dft_spark.catalog import load_tables
    from datafusion_dft_spark.operators.retrieval import (
        bm25_oracle_sql,
        bm25_scores,
    )

    terms = ("hash", "join", "stream")
    docs = load_tables(spark, sf_dir)["documents"]
    got = {
        r.doc_id: r.bm25_score
        for r in bm25_scores(docs, terms).select("doc_id", "bm25_score").collect()
    }
    want = {int(i): float(s) for i, s in duckcon.sql(bm25_oracle_sql(terms)).fetchall()}
    assert got == want


def test_bigram_logprob_hand_computed(spark):
    """p(w2|w1) = c(w1 w2)/c(w1 .) with context counts over positions
    1..n-1; per-context probabilities sum to 1."""
    import math

    from datafusion_dft_spark.operators.text import bigram_logprob_scores

    # corpus bigrams: "a b" x2, "b a" x1, "a c" x1 ; contexts: a x3, b x1
    rows = [(1, "a b a c"), (2, "a b"), (3, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.avg_neg_logprob2 for r in bigram_logprob_scores(df).collect()
    }
    p_ab = 2 / 3  # c("a b")=2, c(a as context)=3
    p_ba = 1 / 1
    p_ac = 1 / 3
    want1 = round((-math.log(p_ab) - math.log(p_ba) - math.log(p_ac)) / 3 + 1e-9, 4)
    want2 = round(-math.log(p_ab) + 1e-9, 4)
    assert got == {1: want1, 2: want2}  # doc 3: no bigrams -> absent
    # scrambled common words score HIGHER surprisal than a repeated
    # frequent transition: the order-sensitivity the unigram model lacks
    assert got[1] > got[2]


def test_bm25_edge_cases(spark):
    """Terms absent from the corpus contribute idf*0 = 0; a doc with
    zero query terms scores exactly 0.0; empty input yields no rows."""
    from datafusion_dft_spark.operators.retrieval import bm25_scores

    df = spark.createDataFrame([(1, "p q r s")], "doc_id long, text string")
    got = bm25_scores(df, ("zz", "yy")).collect()
    assert [r.bm25_score for r in got] == [0.0]
    empty = df.filter("doc_id < 0")
    assert bm25_scores(empty, ("p",)).count() == 0


def test_quality_stratified_ties_included(spark):
    """All-equal scores within a stratum: threshold == the score, so
    EVERY row survives (>= semantics) — deterministic under re-runs."""
    from pyspark.sql import functions as F

    from datafusion_dft_spark.operators.sampling import quality_stratified_sample

    rows = [(i, "en") for i in range(6)] + [(10 + i, "de") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = quality_stratified_sample(
        df, "doc_id", "lang", F.lit(0.5), quantile=0.75
    )
    assert out.count() == 9  # ties at the threshold are kept, all strata
