"""Deterministic shuffle: exact differential vs DuckDB + properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators.ordering import (
    deterministic_shuffle,
    shuffle_oracle_sql,
)


def _positions(spark, sf_dir, seed=0, repartition=None):
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    if repartition is not None:
        docs = docs.repartition(repartition)
    return {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(docs, "doc_id", seed=seed).collect()
    }


def test_shuffle_matches_duckdb(spark, sf_dir, duckcon):
    got = _positions(spark, sf_dir, seed=42)
    want = {
        r[0]: r[1]
        for r in duckcon.sql(
            "SELECT doc_id, shuffle_pos FROM ("
            + shuffle_oracle_sql("doc_id", 42)
            + ")"
        ).fetchall()
    }
    assert got == want


def test_shuffle_is_permutation_and_partition_invariant(spark, sf_dir):
    base = _positions(spark, sf_dir)
    n = len(base)
    assert sorted(base.values()) == list(range(n))  # bijection onto 0..n-1
    assert _positions(spark, sf_dir, repartition=7) == base  # reproducible


def test_shuffle_seed_changes_order(spark, sf_dir):
    a = _positions(spark, sf_dir, seed=0)
    b = _positions(spark, sf_dir, seed=1)
    assert a != b
    assert sorted(a.values()) == sorted(b.values())  # same position set


def test_shuffle_single_data_shuffle(spark, sf_dir):
    """One exchange (the 256-bucket window), no join: the prefix map
    rides as a literal."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    out = deterministic_shuffle(docs, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_shuffle_empty(spark):
    empty = spark.createDataFrame([], "doc_id long")
    assert deterministic_shuffle(empty, "doc_id").count() == 0


def test_training_shards_roundtrip(spark, sf_dir, tmp_path):
    """Shards replay the exact seeded order; every shard is full-sized
    except the last; reads are plain partition-pruned parquet."""
    from datafusion_dft_spark.operators.ordering import write_training_shards

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang")
    out = str(tmp_path / "shards")
    n_shards = write_training_shards(docs, out, "doc_id", seed=3, shard_rows=64)
    n = docs.count()
    assert n_shards == -(-n // 64)

    back = spark.read.parquet(out)
    assert back.count() == n
    # per-shard: correct size and the exact positions of its window
    sizes = {r.shard: r["count"] for r in back.groupBy("shard").count().collect()}
    for k in range(n_shards):
        assert sizes[k] == (64 if k < n_shards - 1 else n - 64 * (n_shards - 1))
    # order replay equals a fresh shuffle of the same seed
    want = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(docs, "doc_id", seed=3).collect()
    }
    got = {r.doc_id: r.shuffle_pos for r in back.collect()}
    assert got == want


def test_shuffle_rejects_duplicate_and_null_keys(spark):
    import pytest

    dup = spark.createDataFrame([(1,), (1,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="unique, non-NULL"):
        deterministic_shuffle(dup, "doc_id")
    withnull = spark.createDataFrame([(None,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="unique, non-NULL"):
        deterministic_shuffle(withnull, "doc_id")


def test_export_clean_corpus_end_to_end(spark, sf_dir):
    """Full pipeline to disk: the exported shard set IS the cleaned
    corpus (decontam + quality + near-dup) in the seeded train order."""
    import tempfile

    from datafusion_dft_spark.queries.pipeline import (
        clean_corpus_docs,
        export_clean_corpus,
    )

    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/shards"
        n_shards = export_clean_corpus(
            spark, sf_dir, out, seed=5, shard_rows=100
        )
        back = spark.read.parquet(out)
        kept_ids = {
            r.doc_id for r in clean_corpus_docs(spark, sf_dir).select("doc_id").collect()
        }
        got_ids = {r.doc_id for r in back.select("doc_id").collect()}
        assert got_ids == kept_ids
        assert n_shards == -(-len(kept_ids) // 100)
        want = {
            r.doc_id: r.shuffle_pos
            for r in deterministic_shuffle(
                clean_corpus_docs(spark, sf_dir).select("doc_id"), "doc_id", seed=5
            ).collect()
        }
        got = {r.doc_id: r.shuffle_pos for r in back.collect()}
        assert got == want


def test_shards_replay_in_duckdb(spark, sf_dir, tmp_path, duckcon):
    """Cross-engine replay: DuckDB reads the hive shard directories and
    reproduces the exact training order from (shard, shuffle_pos) — the
    portability claim behind write_training_shards."""
    from datafusion_dft_spark.operators.ordering import write_training_shards

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", seed=9, shard_rows=128)

    replay = [
        r[0]
        for r in duckcon.sql(
            f"""
            SELECT doc_id
            FROM read_parquet('{out}/*/*.parquet', hive_partitioning=1)
            ORDER BY shard, shuffle_pos
            """
        ).fetchall()
    ]
    want = [
        r[0]
        for r in duckcon.sql(
            "SELECT doc_id FROM documents ORDER BY md5(CAST(doc_id AS VARCHAR) || '#9'), doc_id"
        ).fetchall()
    ]
    assert replay == want


def test_shuffle_bucket_hex_invariant(spark, sf_dir):
    """Positions are bucket-count-invariant: 16, 256, and 4096 buckets
    produce the identical permutation (the decomposition is an
    implementation detail, like pack_sequences' n_buckets)."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    base = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(docs, "doc_id", seed=4, bucket_hex=2).collect()
    }
    for h in (1, 3):
        got = {
            r.doc_id: r.shuffle_pos
            for r in deterministic_shuffle(
                docs, "doc_id", seed=4, bucket_hex=h
            ).collect()
        }
        assert got == base, f"bucket_hex={h}"
