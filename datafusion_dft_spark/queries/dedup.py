"""Deduplication queries over the ``documents`` table.

The exact methods (hash-group, n-gram Jaccard) carry full DuckDB
oracles, and so does MinHash-LSH: its md5-based permutations (min over
salted md5 hex strings) are engine-portable, so DuckDB replays the
whole sketch pipeline. SimHash remains rows-only (its weighted bit
mixing needs xxhash64) — tests/test_dedup.py validates it against the
oracle-checked exact Jaccard pairs instead (recall on the injected
near-duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import dedup as dd
from ..operators import joins as jn
from ..registry import query

# Seeded "dirty catalog" for the fuzzy entity-resolution arm of
# dedup_exact (operators/joins.py::fuzzy_best_match): the part names
# are clean by construction, so — exactly like the PII seeds in
# queries/text.py — both engines union the SAME literal typo'd rows
# and the oracle VALUES are generated from this list. ASCII only:
# Spark's levenshtein counts codepoints, DuckDB's counts bytes.
# 'hot rid' matches TWO distinct names ('hot rod' d=1, 'hot ring'
# d=2) to exercise the min(distance, key) tie-break and the
# all-candidates count; 'knurled flange' matches nothing (NULL row).
FUZZY_SEED_NAMES = (
    "smal ring",
    "red widgit",
    "blu bolt",
    "hot gearr",
    "cold platte",
    "large anvill",
    "old rodd",
    "hot rid",
    "knurled flange",
)
_FUZZY_SEED_VALUES = ", ".join(f"('{n}')" for n in FUZZY_SEED_NAMES)
_FUZZY_MAX_D = 2
_FUZZY_LEN_BAND = 2

# Snapshot-diff arm (operators/snapshot.py): snapshot B is DERIVED from
# documents identically on both engines — drop doc_id % 11 == 0
# (removed), append ' edited' where doc_id % 7 == 0 (changed), and
# union these literal new rows (added; negative ids outside every
# generator domain, distinct from the -9000001.. PII block).
DIFF_SEED_ROWS = [
    (-7000001, "brand new doc alpha"),
    (-7000002, "brand new doc beta"),
    (-7000003, "brand new doc gamma"),
]
_DIFF_SEED_VALUES = ", ".join(f"({i}, '{t}')" for i, t in DIFF_SEED_ROWS)


@query(
    "dedup_exact",
    oracle=f"""
        SELECT 'doc' AS variant, content_hash, keep_id, n_copies FROM (
            SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        ) d
        UNION ALL
        SELECT 'para' AS variant, content_hash, keep_id, n_copies FROM (
            SELECT md5(array_to_string(words[(blk * 10 + 1):(blk * 10 + 10)], ' '))
                       AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM (
                SELECT doc_id, words,
                       unnest(range(CAST(ceil(len(words) / 10.0) AS BIGINT))) AS blk
                FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
            )
            GROUP BY 1
        ) p
        UNION ALL
        SELECT 'span' AS variant, content_hash, keep_id, n_copies FROM (
            SELECT md5(array_to_string(words[i:i+19], ' ')) AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w,
                 LATERAL (SELECT unnest(range(1, greatest(len(words) - 18, 1))) AS i) ix
            GROUP BY 1 HAVING count(*) >= 2
        ) s
        UNION ALL
        SELECT 'fuzzy' AS variant, s.name AS content_hash, b.keep_id,
               coalesce(a.n_copies, 0) AS n_copies
        FROM (VALUES {_FUZZY_SEED_VALUES}) s(name)
        LEFT JOIN (
            SELECT name, count(*) AS n_copies,
                   min(levenshtein(name, p_name)) AS best_d
            FROM (VALUES {_FUZZY_SEED_VALUES}) q(name)
            JOIN part ON substr(name, 1, 1) = substr(p_name, 1, 1)
                     AND abs(length(name) - length(p_name)) <= {_FUZZY_LEN_BAND}
                     AND levenshtein(name, p_name) <= {_FUZZY_MAX_D}
            GROUP BY name
        ) a ON s.name = a.name
        LEFT JOIN (
            SELECT name, min(p_partkey) AS keep_id
            FROM (
                SELECT name, p_partkey, levenshtein(name, p_name) AS d,
                       min(levenshtein(name, p_name))
                           OVER (PARTITION BY name) AS bd
                FROM (VALUES {_FUZZY_SEED_VALUES}) q(name)
                JOIN part ON substr(name, 1, 1) = substr(p_name, 1, 1)
                         AND abs(length(name) - length(p_name)) <= {_FUZZY_LEN_BAND}
                         AND levenshtein(name, p_name) <= {_FUZZY_MAX_D}
            ) c WHERE d = bd
            GROUP BY name
        ) b ON s.name = b.name
        UNION ALL
        SELECT 'diff_' || status AS variant,
               coalesce(new_fp, old_fp) AS content_hash,
               doc_id AS keep_id,
               CAST(CASE WHEN status = 'changed' THEN 2 ELSE 1 END AS BIGINT)
                   AS n_copies
        FROM (
            SELECT doc_id, a.old_fp, b.new_fp,
                   CASE WHEN a.old_fp IS NULL THEN 'added'
                        WHEN b.new_fp IS NULL THEN 'removed'
                        WHEN a.old_fp <> b.new_fp THEN 'changed' END AS status
            FROM (SELECT doc_id, md5(text) AS old_fp FROM documents) a
            FULL OUTER JOIN (
                SELECT doc_id, md5(text) AS new_fp FROM (
                    SELECT doc_id,
                           CASE WHEN doc_id % 7 = 0 THEN text || ' edited'
                                ELSE text END AS text
                    FROM documents WHERE doc_id % 11 <> 0
                    UNION ALL
                    SELECT * FROM (VALUES {_DIFF_SEED_VALUES}) v(doc_id, text)
                )
            ) b USING (doc_id)
        ) d WHERE status IS NOT NULL
    """,
    tags=("dedup",),
    doc="Exact dedup at THREE granularities, variant-tagged: 'doc' = one "
    "representative (min doc_id) per distinct content hash; 'para' = the "
    "C4/CCNet sub-document trick — each distinct 10-word paragraph block "
    "gets a (hash, keep_id=min owner, n_copies) decision row, so "
    "boilerplate repeated ACROSS documents (invisible to doc-level dedup) "
    "is droppable per-paragraph; 'span' = SLIDING 20-word windows at "
    "every alignment (the hash-grain approximation of Lee et al. 2022's "
    "suffix-array substring dedup), emitting only corpus-duplicated "
    "spans — catches shifted copies fixed blocks miss. Each grain is one "
    "explode + one map-side-combining hash agg, one shuffle, no joins "
    "(operators/dedup.py::paragraph_duplicates / span_duplicates). "
    "'fuzzy' = blocked EDIT-DISTANCE entity resolution "
    "(operators/joins.py::fuzzy_best_match): a seeded typo'd catalog "
    "resolves against real part names — first-char + length-band "
    "blocking bounds comparisons, the tiny dirty side broadcasts (one "
    "corpus scan, zero shuffles), best match is an order-free "
    "min(distance, key) struct aggregate, unmatched rows survive with "
    "NULL keep_id; levenshtein parity holds on ASCII (Spark counts "
    "codepoints, DuckDB bytes). 'diff_added/removed/changed' = SNAPSHOT "
    "DIFF (operators/snapshot.py): the incremental-corpus-update audit "
    "— both snapshots project to (key, md5 fingerprint), one "
    "co-partitioned full-outer join classifies every key, unchanged "
    "rows drop so output is churn-bounded; snapshot B is derived from "
    "documents identically on both engines (drop %11, edit %7, union "
    "literal adds).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    doc = dd.exact_duplicates(docs, "doc_id", "text").select(
        F.lit("doc").alias("variant"), "content_hash", "keep_id", "n_copies"
    )
    para = dd.paragraph_duplicates(docs, "doc_id", "text", block_words=10).select(
        F.lit("para").alias("variant"), "content_hash", "keep_id", "n_copies"
    )
    span = dd.span_duplicates(docs, "doc_id", "text", span_words=20).select(
        F.lit("span").alias("variant"), "content_hash", "keep_id", "n_copies"
    )
    seeds = spark.createDataFrame(
        [(n,) for n in FUZZY_SEED_NAMES], "name string"
    )
    fuzzy = jn.fuzzy_best_match(
        seeds, t["part"], "name", "p_partkey", "p_name",
        max_distance=_FUZZY_MAX_D, len_band=_FUZZY_LEN_BAND,
    ).select(
        F.lit("fuzzy").alias("variant"),
        F.col("name").alias("content_hash"),
        "keep_id",
        "n_copies",
    )
    from ..operators.snapshot import snapshot_diff

    a = docs.select("doc_id", "text")
    new_rows = spark.createDataFrame(DIFF_SEED_ROWS, "doc_id long, text string")
    b = (
        docs.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" edited"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(new_rows)
    )
    diff = snapshot_diff(a, b, "doc_id", "text").select(
        F.concat(F.lit("diff_"), F.col("status")).alias("variant"),
        F.coalesce(F.col("new_fp"), F.col("old_fp")).alias("content_hash"),
        F.col("doc_id").alias("keep_id"),
        F.when(F.col("status") == "changed", 2).otherwise(1).cast("long").alias("n_copies"),
    )
    return doc.unionAll(para).unionAll(span).unionAll(fuzzy).unionAll(diff)


@query(
    "dedup_ngram_jaccard",
    oracle="""
        WITH sh AS (
            SELECT doc_id,
                   unnest(list_distinct([array_to_string(words[i:i+4], ' ')
                                         for i in range(1, greatest(len(words) - 3, 2))])) AS shingle
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
        ), cnt AS (
            SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc1, doc2,
               round(n_inter / CAST(c1.n_sh + c2.n_sh - n_inter AS DOUBLE) + 1e-9, 4) AS jaccard,
               round(n_inter / CAST(c1.n_sh AS DOUBLE) + 1e-9, 4) AS containment1,
               round(n_inter / CAST(c2.n_sh AS DOUBLE) + 1e-9, 4) AS containment2
        FROM inter
        JOIN cnt c1 ON doc1 = c1.doc_id
        JOIN cnt c2 ON doc2 = c2.doc_id
        WHERE n_inter / CAST(c1.n_sh + c2.n_sh - n_inter AS DOUBLE) + 1e-9 >= 0.8
    """,
    tags=("dedup", "jaccard", "containment"),
    doc="Exact 5-word-shingle Jaccard >= 0.8 near-duplicate pairs via "
    "inverted-index join (ground truth for the sketch methods), plus "
    "Broder's asymmetric CONTAINMENT pair (|A∩B|/|A|, |A∩B|/|B|) — the "
    "quote/subset-detection signal Jaccard hides; free once both set "
    "sizes are joined in.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return dd.jaccard_pairs(docs, "doc_id", "text", k=5, threshold=0.8)


# MinHash-LSH candidate pairs, replayed entirely in DuckDB (shared by
# the pair query and the clustering query built on top of it).
MINHASH_PAIRS_ORACLE = f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest(list_distinct([array_to_string(words[i:i+4], ' ')
                                         for i in range(1, greatest(len(words) - 3, 2))])) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
        ), hv AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh
        ), sig AS (
            SELECT doc_id, i,
                   min((pa[i+1] * h + pb[i+1]) % {dd.MINHASH_P}) AS v
            FROM hv CROSS JOIN (
                SELECT i, {list(dd.MINHASH_A)} AS pa, {list(dd.MINHASH_B)} AS pb
                FROM range(64) r(i)
            ) p
            GROUP BY doc_id, i
        ), sigarr AS (
            SELECT doc_id, list(v ORDER BY i) AS sig FROM sig GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, b,
                   md5(array_to_string(list_transform(sig[b*4+1 : b*4+4],
                                                      x -> CAST(x AS VARCHAR)), '|')) AS bh
            FROM sigarr CROSS JOIN range(16) rb(b)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh
                                       AND a.doc_id < b.doc_id
        )
        SELECT doc1, doc2,
               round(len(list_filter(range(1, 65), i -> s1.sig[i] = s2.sig[i])) / 64.0
                     + 1e-9, 4) AS est_jaccard
        FROM cand
        JOIN sigarr s1 ON doc1 = s1.doc_id
        JOIN sigarr s2 ON doc2 = s2.doc_id
        WHERE len(list_filter(range(1, 65), i -> s1.sig[i] = s2.sig[i])) / 64.0 + 1e-9 >= 0.7
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
        WITH pairs AS ({MINHASH_PAIRS_ORACLE}),
        batch AS (
            SELECT doc_id FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
        )
        SELECT 'full' AS method, doc1, doc2, est_jaccard FROM pairs
        UNION ALL
        SELECT 'incremental' AS method, doc1, doc2, est_jaccard FROM pairs
        WHERE doc1 IN (SELECT doc_id FROM batch)
           OR doc2 IN (SELECT doc_id FROM batch)
    """,
    tags=("dedup", "minhash", "lsh"),
    doc="MinHash (64 perms) + LSH (16 bands x 4): candidate near-dup pairs with "
    "signature-estimated Jaccard >= 0.7, BOTH formulations method-tagged in "
    "one query (the dedup_embedding_cosine consolidation pattern — registry "
    "stays at 50): 'full' = the banded self-join over the whole corpus; "
    "'incremental' = the production daily-increment shape "
    "(minhash_lsh_pairs_incremental — an md5-stride ~19% batch probes the "
    "remaining corpus plus itself, corpus scanned once, never self-joined; "
    "plan-gated in tests/test_plans.py). The DuckDB oracle recomputes the "
    "increment split INDEPENDENTLY (same md5-stride predicate over "
    "documents, then restricts its own full pair replay to batch-touching "
    "pairs) — it never sees the Spark banding, so a shared-banding bug "
    "cannot cancel out the way it could in the pytest equivalence property. "
    "One md5 per shingle + universal-hash integer permutations make every "
    "stage engine-portable — the doc_min_k_sketch pattern applied to "
    "MinHash.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import track_cache

    docs = load_tables(spark, sf_dir)["documents"]
    # ONE cached signature relation feeds the full self-join AND both
    # sides of the incremental arm (r14, guide §4): previously each arm
    # built (and cached) its own signatures, running the shingle→md5→
    # minhash pandas-UDF pipeline ~2x over the corpus per execution.
    # Stride-filtering the shared relation commutes with the per-row
    # signature math, so results are identical; the cache is rebuilt
    # every run (the bench clears it) and registered for release at
    # server request boundaries.
    sig = track_cache(
        dd.minhash_signatures(docs, "doc_id", "text", k=5).cache()
    )
    full = dd.minhash_lsh_pairs(docs, "doc_id", "text", k=5, threshold=0.7, sig=sig)
    stride = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    is_batch = stride.isin("0", "1", "2")
    # check_id_overlap=False: the split partitions one relation, so
    # disjointness holds structurally — no eager guard job needed.
    inc = dd.minhash_lsh_pairs_incremental(
        docs.filter(is_batch),
        docs.filter(~is_batch),
        "doc_id",
        "text",
        k=5,
        threshold=0.7,
        check_id_overlap=False,
        new_sig=sig.filter(is_batch),
        corpus_sig=sig.filter(~is_batch),
        # broadcast=True pinned: the daily-increment plan shape, and it
        # skips the auto rule's eager batch+corpus counts. (The auto
        # rule would shuffle here — a ~19% stride batch fails
        # batch × parallelism ≤ corpus at any SF — but pinning keeps
        # this row exercising the broadcast probe the gate asserts;
        # the shuffled path gets its own differential via
        # test_incremental_over_budget_batch_shuffles.)
        broadcast=True,
    )
    return full.select(
        F.lit("full").alias("method"), "doc1", "doc2", "est_jaccard"
    ).unionByName(
        inc.select(F.lit("incremental").alias("method"), "doc1", "doc2", "est_jaccard")
    )


@query(
    "dedup_simhash",
    oracle="""
        WITH wc AS (
            SELECT doc_id, word, count(*)::BIGINT AS cnt
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents) w
            GROUP BY doc_id, word
        ), bits AS (
            -- bit b of the 64-bit word hash = bit (b%4) of hex nibble
            -- 16 - b//4 of md5(word): identical to Spark's
            -- shiftleft(conv(hex[1:8]),32) | conv(hex[9:16]) assembly.
            SELECT doc_id, b,
                   CASE WHEN sum(cnt * (2 * ((('0x' || substr(md5(word), 16 - b // 4, 1))::INT
                                              >> (b % 4)) & 1) - 1)) > 0
                        THEN 1 ELSE 0 END AS bit
            FROM wc CROSS JOIN range(64) r(b)
            GROUP BY doc_id, b
        ), chunks AS (
            SELECT doc_id, b // 8 AS chunk, sum(bit << (b % 8))::BIGINT AS chunkval
            FROM bits GROUP BY doc_id, b // 8
        ), fp AS (
            -- fingerprint packed as two 32-bit halves (a single
            -- 64-bit pack overflows signed BIGINT at chunk 7): the
            -- Hamming verify is then two xor/bit_count lookups per
            -- candidate instead of an 8-row-per-pair chunk join.
            SELECT doc_id,
                   sum(CASE WHEN chunk < 4 THEN chunkval << (8 * chunk)
                            ELSE 0 END)::BIGINT AS lo,
                   sum(CASE WHEN chunk >= 4 THEN chunkval << (8 * (chunk - 4))
                            ELSE 0 END)::BIGINT AS hi
            FROM chunks GROUP BY doc_id
        ), bands AS (
            -- 28 chunk-PAIR bands (16-bit keys), mirroring the Spark
            -- side's Manku r=2 banding: <=6 differing bits touch at
            -- most 6 of 8 chunks, so >=2 whole chunks agree and the
            -- pair shares at least one band. Candidate-linear where
            -- the old single-8-bit-chunk bands (256 values) flooded
            -- quadratically on large corpora (sf1: >2400s vs ~13s).
            SELECT x.doc_id, x.chunk AS c1, y.chunk AS c2,
                   x.chunkval AS v1, y.chunkval AS v2
            FROM chunks x JOIN chunks y
              ON x.doc_id = y.doc_id AND x.chunk < y.chunk
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM bands a JOIN bands b USING (c1, c2, v1, v2)
            WHERE a.doc_id < b.doc_id
        ), ham AS (
            SELECT c.doc1, c.doc2,
                   CAST(bit_count(xor(f1.lo, f2.lo))
                        + bit_count(xor(f1.hi, f2.hi)) AS BIGINT) AS hamming
            FROM cand c
            JOIN fp f1 ON f1.doc_id = c.doc1
            JOIN fp f2 ON f2.doc_id = c.doc2
        )
        SELECT doc1, doc2, hamming FROM ham WHERE hamming <= 6
    """,
    tags=("dedup", "simhash"),
    doc="64-bit SimHash fingerprints; Hamming<=6 pairs via chunk-PAIR "
    "pigeonhole bands (28 bands x 16-bit keys, Manku WWW'07 — exact: <=6 "
    "differing bits leave >=2 of 8 chunks agreeing; single 8-bit chunks "
    "flood at >10k docs). Since round 14 the oracle replays the SAME "
    "chunk-pair banding (previously single 8-bit chunks — quadratic at "
    "sf1) and verifies Hamming via bit_count(xor) on 8-bit chunk values, "
    "so both sides are candidate-linear. Word-hash bits come from md5 "
    "hex, so the full sketch is differentially verified against DuckDB "
    "per-bit — the doc_min_k_sketch pattern applied to SimHash.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return dd.simhash_pairs(docs, "doc_id", "text", max_hamming=6)


@query(
    "dedup_clusters",
    oracle=f"""
        WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
        edges AS (
            SELECT doc1 AS src, doc2 AS dst FROM pairs
            UNION
            SELECT doc2 AS src, doc1 AS dst FROM pairs
        ),
        walk(member, node) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM edges) n
            UNION
            SELECT w.member, e.dst FROM walk w JOIN edges e ON w.node = e.src
        ),
        comp AS (
            SELECT member, min(node) AS component FROM walk GROUP BY member
        ),
        q AS (
            SELECT doc_id,
                   round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.5
                         + len(list_filter(string_split(text, ' '),
                                           w -> list_contains(['the','a','of','to','and'], w)))
                           / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.5
                         + 1e-9, 4) AS quality
            FROM documents
        )
        SELECT c.member, c.component,
               first_value(c.member) OVER (
                   PARTITION BY c.component
                   ORDER BY q.quality DESC, c.member ASC
               ) AS rep_doc
        FROM comp c JOIN q ON q.doc_id = c.member
    """,
    tags=("dedup", "clustering"),
    # bench=False: the fixpoint loop materializes per-round caches, so a
    # steady-state re-collect would measure either a cache hit or (after
    # clearCache) an exponentially re-expanded join lineage — neither is
    # a meaningful per-query number. Cold cost is the loop itself.
    bench=False,
    doc="Connected-components clustering of the MinHash-LSH near-dup pair "
    "graph (min-label propagation, one shuffle join per round, no driver "
    "graph state — operators/dedup.py:connected_components), plus the "
    "production keep-one step: rep_doc = the highest-quality member of "
    "each component (text.quality_score, ties to the lowest doc_id), so "
    "downstream dedup is `keep rows WHERE member = rep_doc`. The quality "
    "join is member-sized (dup docs only, far smaller than the corpus) "
    "and the per-component window partitions by component id — both "
    "scale with the duplicate set, not the corpus. Oracle: DuckDB "
    "recursive reachability closure + the same quality formula and "
    "window over the engine-portable candidate pairs.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import text as tx

    docs = load_tables(spark, sf_dir)["documents"]
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", k=5, threshold=0.7)
    comp = dd.connected_components(pairs)
    quality = docs.select(
        F.col("doc_id").alias("member"), tx.quality_score("text").alias("__q")
    )
    w = Window.partitionBy("component").orderBy(F.col("__q").desc(), F.col("member").asc())
    return (
        comp.join(quality, "member")
        .select("member", "component", F.first("member").over(w).alias("rep_doc"))
    )
