#!/usr/bin/env python
"""Scale rehearsal for the streaming-dedup signature table.

Seeds a LARGE corpus (80% of the generated docs, one bulk ingest),
then replays N epochs of small fixed-size batches through the sink's
EXACT per-batch code path (``streaming/dedup.py::ingest_batch``) and,
as the control, through the legacy formulation that recomputes corpus
MinHash signatures from text every batch. The large-corpus/small-batch
shape isolates the term under test: the control pays an O(corpus)
shingle→md5→minhash recompute per epoch, the signature-table path
pays batch work + a compact columnar scan. The receipt: mean per-epoch
time ratio (text_recompute / sig_path) ≫ 1, and the sig path shows no
upward trend as the corpus keeps growing.

Both paths are asserted to accept the SAME survivor ids per epoch —
a perf rehearsal that silently changed semantics would be worthless.

Usage: python tools/rehearsal_stream_sigs.py [SF] [EPOCHS] [OUT_JSON]
Defaults: 2 8 BENCH_STREAM_SIGS.json (corpora under /tmp).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_STREAM_SIGS.json"

    from datafusion_dft_spark.session import get_spark
    from datafusion_dft_spark.streaming.dedup import (
        _read_corpus,
        dedup_batch_against_corpus,
        ingest_batch,
    )
    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    spark = get_spark(app_name="rehearsal-stream-sigs")
    src = f"/tmp/stream_sigs_docs_sf{sf:g}.parquet"
    if not os.path.exists(src):
        gen_tables(spark, scale_factor=sf)["documents"].select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)
    n = docs.count()
    seed_rows = int(n * 0.8)
    per_batch = (n - seed_rows) // epochs

    sig_root = "/tmp/stream_sigs_corpus_sig"
    txt_root = "/tmp/stream_sigs_corpus_txt"
    for d in (sig_root, txt_root):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)

    # Seed both corpora identically through the sink path (a reserved
    # batch id): the seed's own dedup cost is NOT part of the measurement.
    seed = docs.filter(F.col("doc_id") < seed_rows)
    ingest_batch(seed, 999999, sig_root, "doc_id", "text")
    landed = spark.read.parquet(os.path.join(sig_root, "batch-999999"))
    landed.write.mode("overwrite").parquet(os.path.join(txt_root, "batch-999999"))

    sig_times: list[float] = []
    txt_times: list[float] = []
    corpus_sizes: list[int] = []
    for e in range(epochs):
        lo = seed_rows + e * per_batch
        hi = seed_rows + (e + 1) * per_batch
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))

        corpus_before = _read_corpus(spark, sig_root)
        corpus_sizes.append(corpus_before.count() if corpus_before is not None else 0)

        # signature-table path: the sink's own per-batch function
        t0 = time.perf_counter()
        ingest_batch(batch, e, sig_root, "doc_id", "text")
        sig_times.append(round(time.perf_counter() - t0, 3))

        # control: legacy text-recompute path (corpus signatures rebuilt
        # from text every epoch), same greedy policy + writes
        t0 = time.perf_counter()
        corpus_txt = _read_corpus(spark, txt_root)
        survivors = dedup_batch_against_corpus(
            batch, corpus_txt, "doc_id", "text", check_id_overlap=False
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(txt_root, f"batch-{e}")
        )
        txt_times.append(round(time.perf_counter() - t0, 3))

        # semantics guard: both corpora hold identical ids after each epoch
        a = sorted(
            r.doc_id
            for r in spark.read.parquet(os.path.join(sig_root, f"batch-{e}"))
            .select("doc_id")
            .collect()
        )
        b = sorted(
            r.doc_id
            for r in spark.read.parquet(os.path.join(txt_root, f"batch-{e}"))
            .select("doc_id")
            .collect()
        )
        assert a == b, f"epoch {e}: sig path {len(a)} ids != text path {len(b)}"
        print(
            f"epoch {e}: corpus={corpus_sizes[-1]} sig={sig_times[-1]}s "
            f"text={txt_times[-1]}s",
            file=sys.stderr,
        )

    # trend summary: last-3-epoch mean over first-3-epoch mean (>=2 epochs
    # of corpus behind each) — the flatness metric
    def trend(ts: list[float]) -> float:
        head = ts[1:4] or ts[:1]
        tail = ts[-3:]
        return round((sum(tail) / len(tail)) / max(sum(head) / len(head), 1e-9), 2)

    mean_sig = sum(sig_times) / len(sig_times)
    mean_txt = sum(txt_times) / len(txt_times)
    artifact = {
        "protocol": (
            "large seeded corpus + small fixed-size batches; sig path = "
            "streaming/dedup.py::ingest_batch (persisted signature table); "
            "control = corpus signatures recomputed from text per batch; "
            "survivor ids asserted identical per epoch"
        ),
        "sf": sf,
        "seed_rows": seed_rows,
        "rows_per_batch": per_batch,
        "epochs": epochs,
        "corpus_rows_before_epoch": corpus_sizes,
        "sig_path_sec": sig_times,
        "text_recompute_sec": txt_times,
        "mean_sig_path_sec": round(mean_sig, 3),
        "mean_text_recompute_sec": round(mean_txt, 3),
        "text_over_sig_mean_ratio": round(mean_txt / max(mean_sig, 1e-9), 2),
        "sig_path_tail_over_head": trend(sig_times),
        "text_recompute_tail_over_head": trend(txt_times),
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
