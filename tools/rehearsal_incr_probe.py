#!/usr/bin/env python
"""Broadcast-vs-shuffled probe rehearsal for incremental MinHash dedup.

The r9 size guard (operators/dedup.py::_INCR_BROADCAST_MAX_BATCH,
default 100k rows) switches `minhash_lsh_pairs_incremental` from
broadcasting the banded batch (daily-increment plan: one corpus pass,
zero corpus shuffle) to a shuffled band equi-join (backfill plan) —
but until round 10 the fallback was plan-gate-tested at toy scale
only. This harness measures BOTH pinned strategies at several batch
sizes against a large fixed corpus, sink-side (pair aggregate, no
driver collect), to place the crossover and confirm the 100k default
sits near it.

The corpus signatures are persisted ONCE (via the new `corpus_sig`
path — the same table the streaming sink maintains), so every timed
run isolates the probe strategy instead of re-paying the corpus
signature build.

Usage: python tools/rehearsal_incr_probe.py [SF] [OUT_JSON]
Defaults: 10 BENCH_INCR_PROBE.json (corpus under /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BATCH_SIZES = [25_000, 50_000, 100_000, 150_000]
CORPUS_ROWS = 350_000


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_INCR_PROBE.json"

    from datafusion_dft_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        minhash_signatures,
    )
    from datafusion_dft_spark.session import get_spark
    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    spark = get_spark(app_name="rehearsal-incr-probe")
    src = f"/tmp/incr_probe_docs_sf{sf:g}.parquet"
    if not os.path.exists(src):
        gen_tables(spark, scale_factor=sf)["documents"].select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)
    n = docs.count()
    assert n >= CORPUS_ROWS + max(BATCH_SIZES), f"need sf with >= 500k docs, got {n}"

    sig_path = f"/tmp/incr_probe_corpus_sigs_sf{sf:g}.parquet"
    if not os.path.exists(sig_path):
        minhash_signatures(
            docs.filter(F.col("doc_id") < CORPUS_ROWS), "doc_id", "text"
        ).write.mode("overwrite").parquet(sig_path)

    results = []
    for bs in BATCH_SIZES:
        batch = docs.filter(
            (F.col("doc_id") >= CORPUS_ROWS) & (F.col("doc_id") < CORPUS_ROWS + bs)
        )
        # Plant ~2% near-dups of CORPUS docs into the batch (append one
        # word — high shingle overlap) so the rerank/pair path actually
        # materializes rows; synthetic docs otherwise never collide
        # across the corpus/batch split and the rehearsal would time an
        # empty rerank.
        planted = (
            docs.filter(F.col("doc_id") < int(bs * 0.02))
            .select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" planted")).alias("text"),
            )
        )
        batch = batch.unionByName(planted)
        row = {"batch_rows": bs}
        for label, pin in (("broadcast", True), ("shuffled", False)):
            times = []
            pairs = None
            for _ in range(3):
                spark.catalog.clearCache()
                corpus_sig = spark.read.parquet(sig_path)
                t0 = time.perf_counter()
                out = minhash_lsh_pairs_incremental(
                    batch,
                    None,
                    "doc_id",
                    "text",
                    corpus_sig=corpus_sig,
                    check_id_overlap=False,
                    broadcast=pin,
                ).agg(
                    F.count(F.lit(1)).alias("n_pairs"),
                    F.sum("est_jaccard").alias("sum_j"),
                )
                got = out.collect()[0]
                times.append(round(time.perf_counter() - t0, 3))
                pairs = int(got["n_pairs"])
            times.sort()
            row[label] = {
                "cold_sec": times[-1],
                "steady_sec": times[len(times) // 2 - 1] if len(times) > 1 else times[0],
                "median_sec": times[1],
                "n_pairs": pairs,
            }
        row["shuffled_over_broadcast"] = round(
            row["shuffled"]["median_sec"] / max(row["broadcast"]["median_sec"], 1e-9), 2
        )
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    artifact = {
        "protocol": (
            "fixed 350k-doc corpus with PERSISTED signatures (corpus_sig "
            "path); batch probes pinned to each strategy; sink-side pair "
            "aggregate; 3 runs, median reported"
        ),
        "sf": sf,
        "corpus_rows": CORPUS_ROWS,
        "default_budget_rows": 100_000,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
