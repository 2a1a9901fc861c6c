"""Sequence packing: exact differential vs DuckDB + invariance properties.

pack_sequences is an ordered distributed prefix sum; its contract is
that the assigned offsets equal the single-stream cumulative sum no
matter how the input is partitioned or how many prefix buckets the
two-pass decomposition uses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import text as tx
from datafusion_dft_spark.operators.packing import pack_sequences, packing_summary

SEQ_LEN = 256


def _spark_offsets(spark, sf_dir, *, n_buckets=64, repartition=None):
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    if repartition is not None:
        docs = docs.repartition(repartition)
    packed = pack_sequences(
        docs.withColumn("tok", tx.token_count("text")),
        "doc_id",
        "tok",
        SEQ_LEN,
        n_buckets=n_buckets,
    )
    return {
        r.doc_id: (r.global_offset, r.chunk_first, r.chunk_last)
        for r in packed.select(
            "doc_id", "global_offset", "chunk_first", "chunk_last"
        ).collect()
    }


def _oracle_offsets(duckcon):
    rows = duckcon.sql(
        f"""
        SELECT doc_id,
               sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok AS off,
               tok
        FROM (SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents)
        """
    ).fetchall()
    out = {}
    for doc_id, off, tok in rows:
        off, tok = int(off), int(tok)
        out[doc_id] = (
            off,
            off // SEQ_LEN,
            (off + max(tok, 1) - 1) // SEQ_LEN,
        )
    return out


def test_pack_matches_duckdb_cumsum(spark, sf_dir, duckcon):
    assert _spark_offsets(spark, sf_dir) == _oracle_offsets(duckcon)


def test_pack_invariant_to_partitioning_and_buckets(spark, sf_dir):
    """The two-pass decomposition is an implementation detail: any
    bucket count and any input partitioning must give the same stream."""
    base = _spark_offsets(spark, sf_dir)
    assert _spark_offsets(spark, sf_dir, n_buckets=3) == base
    assert _spark_offsets(spark, sf_dir, n_buckets=1) == base
    assert _spark_offsets(spark, sf_dir, repartition=7) == base


def test_pack_small_exact(spark):
    """Hand-computed stream: doc spanning chunks, exact-fit boundary,
    zero-token doc."""
    rows = [(1, 10), (2, 0), (3, 6), (4, 20), (5, 4)]
    df = spark.createDataFrame(rows, "id long, tok long")
    got = {
        r.id: (r.global_offset, r.chunk_first, r.chunk_last)
        for r in pack_sequences(df, "id", "tok", 8, n_buckets=2).collect()
    }
    # stream: [0,10) [10,10) [10,16) [16,36) [36,40), chunks of 8
    assert got == {
        1: (0, 0, 1),  # 0..9 straddles chunk 0|1
        2: (10, 1, 1),  # empty doc sits at its offset's chunk
        3: (10, 1, 1),  # 10..15 inside chunk 1
        4: (16, 2, 4),  # 16..35 exact-fit start, spans 2..4
        5: (36, 4, 4),
    }


def test_pack_empty_and_validation(spark):
    df = spark.createDataFrame([], "id long, tok long")
    assert pack_sequences(df, "id", "tok", 8).count() == 0
    with pytest.raises(ValueError):
        pack_sequences(df, "id", "tok", 0)
    with pytest.raises(ValueError):
        pack_sequences(df, "id", "tok", 8, n_buckets=0)


def test_pack_single_data_shuffle(spark, sf_dir):
    """The output plan holds ONE exchange (the bucket window) — the
    prefix map rides as a literal, never a join."""
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "text")
        .withColumn("tok", tx.token_count("text"))
    )
    packed = pack_sequences(docs, "doc_id", "tok", SEQ_LEN)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_packing_summary(spark, sf_dir, duckcon):
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "lang", "text")
        .withColumn("tok", tx.token_count("text"))
    )
    packed = pack_sequences(docs, "doc_id", "tok", SEQ_LEN)
    got = {
        r.lang: (r.n_straddles, r.max_chunk)
        for r in packing_summary(packed, "lang").collect()
    }
    want = {
        lang: (int(ns), int(mc))
        for lang, ns, mc in duckcon.sql(
            f"""
            WITH p AS (
                SELECT lang,
                       sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok AS off,
                       tok
                FROM (SELECT doc_id, lang, len(string_split(text, ' ')) AS tok
                      FROM documents)
            )
            SELECT lang,
                   sum(CASE WHEN (off + greatest(tok, 1) - 1) // {SEQ_LEN}
                            <> off // {SEQ_LEN} THEN 1 ELSE 0 END),
                   max((off + greatest(tok, 1) - 1) // {SEQ_LEN})
            FROM p GROUP BY lang
            """
        ).fetchall()
    }
    assert got == want


def test_pack_property_random_streams(spark):
    """Property: for arbitrary (id, tok) sets — sparse ids, zero-token
    docs, any bucket count — offsets equal the pure-Python cumsum over
    id order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.dictionaries(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=0, max_value=50),
            min_size=1,
            max_size=40,
        ),
        n_buckets=st.integers(min_value=1, max_value=9),
        seq_len=st.integers(min_value=1, max_value=17),
    )
    def check(rows, n_buckets, seq_len):
        df = spark.createDataFrame(sorted(rows.items()), "id long, tok long")
        got = {
            r.id: (r.global_offset, r.chunk_first, r.chunk_last)
            for r in pack_sequences(
                df.repartition(3), "id", "tok", seq_len, n_buckets=n_buckets
            ).collect()
        }
        want, off = {}, 0
        for i in sorted(rows):
            tok = rows[i]
            want[i] = (off, off // seq_len, (off + max(tok, 1) - 1) // seq_len)
            off += tok
        assert got == want

    check()


def test_pack_rejects_duplicate_and_null_ids(spark):
    dup = spark.createDataFrame([(1, 5), (1, 7), (2, 3)], "id long, tok long")
    with pytest.raises(ValueError, match="unique, non-NULL"):
        pack_sequences(dup, "id", "tok", 8)
    withnull = spark.createDataFrame([(None, 5), (2, 3)], "id long, tok long")
    with pytest.raises(ValueError, match="unique, non-NULL"):
        pack_sequences(withnull, "id", "tok", 8)


def test_pack_rejects_all_null_ids(spark):
    """A non-empty input whose ids are ALL NULL must raise, not silently
    take the empty-input branch and hand every row global_offset=0."""
    allnull = spark.createDataFrame(
        [(None, 5), (None, 3)], "id long, tok long"
    )
    with pytest.raises(ValueError, match="unique, non-NULL"):
        pack_sequences(allnull, "id", "tok", 8)


def _clustered_ids():
    """Timestamp-prefixed snowflake shape: three tight id clusters
    separated by huge gaps — fixed-width range slicing would dump
    ~everything into 3 buckets."""
    ids = (
        [1_700_000_000_000_000 + i for i in range(400)]
        + [1_755_000_000_000_000 + 7 * i for i in range(400)]
        + [1_799_999_000_000_000 + 3 * i for i in range(400)]
    )
    return [(i, (i % 37) + 1) for i in ids]


def test_pack_clustered_ids_balanced_buckets(spark):
    """Quantile-derived boundaries keep buckets count-balanced for
    clustered/gappy id distributions, and offsets stay exact."""
    from datafusion_dft_spark.operators.packing import _id_stats, _searchsorted

    rows = _clustered_ids()
    df = spark.createDataFrame(rows, "id long, tok long")
    n_buckets = 16
    idc = F.col("id").cast("long")
    n, k, blist = _id_stats(df, idc, n_buckets)
    assert n == k == len(rows)
    counts = [
        r["c"]
        for r in df.groupBy(_searchsorted(idc, blist).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    # every bucket within 2x of ideal (fixed-width slicing would put
    # ~400 rows in each of 3 buckets and 0 in the other 13)
    assert len(counts) >= n_buckets - 1
    assert max(counts) <= 2 * (len(rows) / n_buckets)
    # and the packed offsets still equal the single-stream cumsum
    got = {
        r.id: r.global_offset
        for r in pack_sequences(df, "id", "tok", 128, n_buckets=n_buckets)
        .select("id", "global_offset")
        .collect()
    }
    off, want = 0, {}
    for i, tok in sorted(rows):
        want[i] = off
        off += tok
    assert got == want


def test_searchsorted_two_level_matches_linear(spark):
    """Above 128 boundaries the chunked two-level fold kicks in; it
    must agree with the plain definition #{b : b <= id}."""
    from datafusion_dft_spark.operators.packing import _searchsorted

    blist = sorted({(i * 37) % 4096 for i in range(1, 400)})
    assert len(blist) > 128
    probe = list(range(-5, 4200, 13))
    df = spark.createDataFrame([(p,) for p in probe], "id long")
    got = {
        r.id: r.b
        for r in df.select(
            "id", _searchsorted(F.col("id"), blist).alias("b")
        ).collect()
    }
    import bisect

    for p in probe:
        assert got[p] == bisect.bisect_right(blist, p), p
