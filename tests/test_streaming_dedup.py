"""Streaming ingestion dedup (streaming/dedup.py).

A file-source stream of document batches runs through
``streaming_dedup_sink``; each micro-batch dedupes against the
already-accepted corpus (incremental MinHash — no corpus self-join)
plus itself (connected components, min-id representative). The
stream-built corpus must equal the batch operator's answer on the
same data — the stream==batch contract every streaming test in this
repo holds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_dft_spark.streaming.dedup import (
    dedup_batch_against_corpus,
    streaming_dedup_sink,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("body", T.StringType()),
    ]
)

# >=5-word docs (k=5 word shingles). A/B near-identical, C distinct,
# D identical to A (cross-batch dup), E near-dup of C (cross-batch),
# F/G identical within one batch, H distinct.
_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun"
)
DOCS = {
    1: _BASE,
    2: _BASE + " today",  # near-dup of 1
    3: "completely different content about distributed query engines "
    "and columnar execution with vectorized operators at scale",
    4: _BASE,  # exact dup of 1, lands in batch 2
    5: "completely different content about distributed query engines "
    "and columnar execution with vectorized operators at scale now",  # ~3
    6: "an entirely unrelated document describing roaring bitmaps "
    "deletion vectors and transaction log replay semantics",
    7: "an entirely unrelated document describing roaring bitmaps "
    "deletion vectors and transaction log replay semantics",  # dup of 6, same batch
    8: "yet another unique document on broadcast joins shuffle "
    "partitions and adaptive query execution behavior tuning",
}
BATCH1 = [1, 2, 3]
BATCH2 = [4, 5, 6, 7, 8]


def _write_batch(spark, d: str, ids: list[int], name: str) -> None:
    rows = [(i, DOCS[i]) for i in ids]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").json(
        os.path.join(d, name)
    )


def _run_available(spark, in_dir: str, corpus: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .json(in_dir)
    )
    q = (
        streaming_dedup_sink(stream, corpus, ckpt, "doc_id", "body")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def _corpus_ids(spark, corpus: str) -> list[int]:
    return sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(corpus, "batch-*")).collect()
    )


def test_stream_builds_deduped_corpus(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, ckpt)
    # batch 1: 2 near-dups 1 (min id wins), 3 unique
    assert _corpus_ids(spark, corpus) == [1, 3]

    _write_batch(spark, in_dir, BATCH2, "b2")
    _run_available(spark, in_dir, corpus, ckpt)
    # batch 2: 4 dups corpus(1), 5 near-dups corpus(3), 7 dups 6 in-batch
    assert _corpus_ids(spark, corpus) == [1, 3, 6, 8]


def test_stream_equals_batch_operator(spark, tmp_path):
    """The two-stage stream result equals running the pure batch policy
    sequentially on the same batches. The corpus is MATERIALIZED between
    stages (as the sink does with parquet) — feeding stage 1's lazy
    dedup plan in as stage 2's corpus would compound the LSH + iterative
    connected-components plans into one giant tree."""
    b1 = spark.createDataFrame([(i, DOCS[i]) for i in BATCH1], SCHEMA)
    b2 = spark.createDataFrame([(i, DOCS[i]) for i in BATCH2], SCHEMA)
    s1 = dedup_batch_against_corpus(b1, None, "doc_id", "body")
    p1 = str(tmp_path / "s1")
    s1.write.parquet(p1)
    corpus1 = spark.read.parquet(p1)
    s2 = dedup_batch_against_corpus(b2, corpus1, "doc_id", "body")
    got = sorted(r.doc_id for r in corpus1.union(s2).collect())
    assert got == [1, 3, 6, 8]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once; a replay overwrites its own
    batch-<id> directory instead of double-appending. Simulated by
    wiping the checkpoint (forces batch-id 0 to rerun)."""
    import shutil

    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, ckpt)
    first = _corpus_ids(spark, corpus)
    shutil.rmtree(ckpt)  # replay everything as batch 0 again
    _run_available(spark, in_dir, corpus, ckpt)
    assert _corpus_ids(spark, corpus) == first == [1, 3]


def test_empty_batch_noop(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, str(tmp_path / "c1"))
    # nothing new to read -> no new batch dir, corpus unchanged
    before = _corpus_ids(spark, corpus)
    _run_available(spark, in_dir, corpus, str(tmp_path / "c1"))
    assert _corpus_ids(spark, corpus) == before


def test_greedy_policy_documented_shape(spark):
    """Cluster {A,B,C} where only B touches the corpus: A survives as
    the min-id representative of the remaining {A,C} cluster only if
    A~C pair exists; here A~B~C but A!~C, so after B drops, A and C
    both survive — the documented greedy (non-transitive-to-corpus)
    policy."""
    corpus_doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = "one two three four five six seven eight nine ten eleven twelve"
    b_mid = "one two three four five six seven alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame([(100, corpus_doc)], SCHEMA)
    batch = spark.createDataFrame([(1, a), (2, b_mid)], SCHEMA)
    out = dedup_batch_against_corpus(
        batch, corpus, "doc_id", "body", threshold=0.5
    )
    got = sorted(r.doc_id for r in out.collect())
    # b_mid shares half its shingles with the corpus doc -> dropped iff
    # est jaccard >= 0.5; a is unrelated -> always survives
    assert 1 in got


def test_export_training_corpus(spark, tmp_path):
    """Epoch close: the stream-built corpus exports as deterministic
    shuffled shards whose replay order equals a fresh shuffle of the
    same corpus; empty corpus is a zero-stat noop."""
    from datafusion_dft_spark.operators.ordering import deterministic_shuffle
    from datafusion_dft_spark.streaming.dedup import export_training_corpus

    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    shards = str(tmp_path / "shards")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, ckpt)
    _write_batch(spark, in_dir, BATCH2, "b2")
    _run_available(spark, in_dir, corpus, ckpt)

    stats = export_training_corpus(
        spark, corpus, shards, "doc_id", "body", seed=11, shard_rows=3
    )
    assert stats["n_docs"] == 4  # the deduped corpus [1, 3, 6, 8]
    assert stats["n_shards"] == 2
    assert stats["total_tokens"] > 0

    back = spark.read.parquet(shards)
    assert sorted(r.doc_id for r in back.collect()) == [1, 3, 6, 8]
    want = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(
            spark.read.parquet(os.path.join(corpus, "batch-*")).select("doc_id"),
            "doc_id",
            seed=11,
        ).collect()
    }
    got = {r.doc_id: r.shuffle_pos for r in back.collect()}
    assert got == want

    empty = export_training_corpus(
        spark, str(tmp_path / "nope"), str(tmp_path / "s2"), "doc_id", "body"
    )
    assert empty == {"n_docs": 0, "n_shards": 0, "total_tokens": 0}


def test_signature_table_persisted_and_probed(spark, tmp_path):
    """The sink writes sigs/batch-<id>/ + _PARAMS.json beside the docs,
    the persisted signatures equal a fresh text recompute, and the
    probe path (corpus_sig) yields the same survivors as the text
    path — the 'per-batch cost must not recompute the corpus' design."""
    import json

    from datafusion_dft_spark.operators.dedup import minhash_signatures
    from datafusion_dft_spark.streaming.dedup import (
        _read_corpus_sigs,
        _sig_params_path,
    )

    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, ckpt)
    _write_batch(spark, in_dir, BATCH2, "b2")
    _run_available(spark, in_dir, corpus, ckpt)

    with open(_sig_params_path(corpus)) as f:
        params = json.load(f)
    assert params == {"k": 5, "num_perm": 64, "method": "md5"}
    sigs = _read_corpus_sigs(spark, corpus, params)
    got = {r.doc_id: list(r.sig) for r in sigs.collect()}
    docs = spark.read.parquet(os.path.join(corpus, "batch-*"))
    want = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures(docs, "doc_id", "body", k=5).collect()
    }
    assert got == want  # signatures cover exactly the accepted docs

    # probing the persisted signatures == probing recomputed text
    b2 = spark.createDataFrame([(i, DOCS[i]) for i in BATCH2], SCHEMA)
    corpus1 = spark.read.parquet(os.path.join(corpus, "batch-0"))
    sig1 = sigs.join(corpus1.select("doc_id"), "doc_id")
    via_sig = sorted(
        r.doc_id
        for r in dedup_batch_against_corpus(
            b2, None, "doc_id", "body", corpus_sig=sig1, check_id_overlap=False
        ).collect()
    )
    via_text = sorted(
        r.doc_id
        for r in dedup_batch_against_corpus(
            b2, corpus1, "doc_id", "body"
        ).collect()
    )
    assert via_sig == via_text == [6, 8]


def test_signature_params_mismatch_raises(spark, tmp_path):
    from datafusion_dft_spark.streaming.dedup import _read_corpus_sigs

    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="signature params"):
        _read_corpus_sigs(
            spark, corpus, {"k": 9, "num_perm": 64, "method": "md5"}
        )


def test_signature_table_self_heals(spark, tmp_path):
    """A corpus built without signatures (older sink layout, or a wiped
    sigs/ dir) is backfilled from text once, then the stream continues
    with identical semantics."""
    import shutil

    in_dir = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, BATCH1, "b1")
    _run_available(spark, in_dir, corpus, ckpt)
    shutil.rmtree(os.path.join(corpus, "sigs"))  # simulate legacy layout
    _write_batch(spark, in_dir, BATCH2, "b2")
    _run_available(spark, in_dir, corpus, ckpt)
    assert _corpus_ids(spark, corpus) == [1, 3, 6, 8]
    sig_batches = sorted(os.listdir(os.path.join(corpus, "sigs")))
    assert "batch-0" in sig_batches and "batch-1" in sig_batches
