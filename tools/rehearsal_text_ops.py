#!/usr/bin/env python
"""Scale rehearsal for the round-10 text/retrieval operators.

Times BM25 scoring, conditional-bigram LM scoring, span-grain
substring dedup, skew_report, and quality-stratified sampling
SINK-SIDE (single-row aggregate materialization — no driver collect of
the data) at two corpus sizes and reports steady-state growth ratios.
All five are one-or-two-aggregation plans whose work is linear in
rows (bigram LM adds two model joins bounded by the observed bigram
vocabulary), so the receipt to look for is ratio ≲ row growth.

Usage: python tools/rehearsal_text_ops.py [SF_SMALL] [SF_BIG] [OUT_JSON]
Defaults: 1 10 BENCH_TEXT_OPS_SCALE.json (corpora under /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _gen_documents(spark, sf: float, out_dir: str) -> str:
    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(path):
        gen_tables(spark, scale_factor=sf)["documents"].write.mode(
            "overwrite"
        ).parquet(path)
    return out_dir


def _time(fn, runs: int = 5, spark=None) -> dict:
    """bench.py's per-sample discipline: an explicit GC before each
    timed run moves ContextCleaner debt (shuffle files, broadcast
    blocks from PRIOR ops in the same session) outside the timing
    window — without it a sporadic full GC lands inside one op's
    steady runs and poisons its ratio (round 10's span_dedup 13.3x
    and this tool's first bigram 8.4s readings were exactly that)."""
    cold = None
    samples = []
    for i in range(runs):
        if spark is not None:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i == 0:
            cold = dt
        else:
            samples.append(dt)
    samples.sort()
    return {
        "cold_sec": round(cold, 3),
        "steady_sec": round(samples[(len(samples) - 1) // 2] if samples else cold, 3),
    }


OPS = ["bm25", "bigram_lm", "span_dedup", "skew_report", "quality_sample"]


def main() -> int:
    sf_small = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_big = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_TEXT_OPS_SCALE.json"

    from datafusion_dft_spark.operators import text as tx
    from datafusion_dft_spark.operators.dedup import span_duplicates
    from datafusion_dft_spark.operators.joins import skew_report
    from datafusion_dft_spark.operators.retrieval import bm25_scores
    from datafusion_dft_spark.operators.sampling import quality_stratified_sample
    from datafusion_dft_spark.session import get_spark

    from bench import classify_band, control_canary_sec

    spark = get_spark(app_name="rehearsal-text-ops")
    # first invocation discarded: fresh-session JIT reads the canary high
    control_canary_sec(spark, "/root/testdata/sf0.1")
    canary_pre = control_canary_sec(spark, "/root/testdata/sf0.1")
    results: dict[str, dict] = {}
    for sf in (sf_small, sf_big):
        sf_dir = _gen_documents(spark, sf, f"/tmp/textops_sf{sf:g}")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "lang", "text"
        )
        n = docs.count()

        def run_bm25():
            bm25_scores(docs, ("hash", "join", "stream")).agg(
                F.sum("bm25_score"), F.count(F.lit(1))
            ).collect()

        def run_bigram():
            tx.bigram_logprob_scores(docs).agg(
                F.sum("avg_neg_logprob2"), F.count(F.lit(1))
            ).collect()

        def run_span():
            span_duplicates(docs, "doc_id", "text", span_words=20).agg(
                F.sum("n_copies"), F.count(F.lit(1))
            ).collect()

        def run_skew():
            skew_report(docs, "lang").agg(F.sum("val")).collect()

        def run_qual():
            quality_stratified_sample(
                docs, "doc_id", "lang", tx.quality_score("text")
            ).agg(F.count(F.lit(1)), F.sum("doc_id")).collect()

        runs = {
            "bm25": run_bm25,
            "bigram_lm": run_bigram,
            "span_dedup": run_span,
            "skew_report": run_skew,
            "quality_sample": run_qual,
        }
        results[f"sf{sf:g}"] = {"rows": n}
        for op in OPS:
            results[f"sf{sf:g}"][op] = _time(runs[op], spark=spark)

    small, big = results[f"sf{sf_small:g}"], results[f"sf{sf_big:g}"]
    growth = big["rows"] / small["rows"]
    ratios = {
        op: round(big[op]["steady_sec"] / max(small[op]["steady_sec"], 1e-9), 2)
        for op in OPS
    }
    canary_post = control_canary_sec(spark, "/root/testdata/sf0.1")
    artifact = {
        "protocol": "sink-side (single-row aggregate; no driver collect of data)",
        "row_growth": round(growth, 2),
        "steady_growth_ratios": ratios,
        "control_sec_pre": canary_pre,
        "control_sec_post": canary_post,
        **classify_band(canary_pre, canary_post),
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
