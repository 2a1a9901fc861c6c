#!/usr/bin/env python
"""Scale rehearsal for distributed BPE ENCODING (operators/bpe.py).

Training has the loud vocab guard; encoding is the corpus-scale half —
one Arrow-batched pandas stage whose per-batch Python word loop (with
the Zipf word cache) is exactly the kind of cost that needs a measured
curve, not an argument. This rehearsal learns ONE merge list at the
small scale (the merge table is an input to encoding, so it is held
FIXED across scales), then times ``apply_bpe`` SINK-SIDE (single-row
aggregate of ``n_bpe_tokens`` — no driver collect of token arrays) at
both corpus sizes and reports steady-state growth and tokens/sec.
Linear = growth ratio ≈ row growth; the word cache should hold
tokens/sec roughly FLAT as the corpus grows (the distinct-word table
grows ~Heaps' law, so cache hit rate rises with scale).

Receipts are canary-stamped (bench.py's frozen control workload on the
sf0.1 lineitem, BASELINE.md quiet band 0.024-0.030 s) so a contended
window is visible in the artifact instead of poisoning the ratios.

Usage: python tools/rehearsal_bpe.py [SF_SMALL] [SF_BIG] [OUT_JSON]
Defaults: 1 10 BENCH_BPE_SCALE.json (corpora under /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_MERGES = 200
CANARY_SF_DIR = "/root/testdata/sf0.1"


def _gen_documents(spark, sf: float, out_dir: str) -> str:
    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(path):
        gen_tables(spark, scale_factor=sf)["documents"].write.mode(
            "overwrite"
        ).parquet(path)
    return path


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


def main() -> int:
    sf_small = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_big = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_BPE_SCALE.json"

    from bench import classify_band, control_canary_sec
    from datafusion_dft_spark.operators.bpe import apply_bpe, learn_bpe
    from datafusion_dft_spark.session import get_spark

    spark = get_spark(app_name="rehearsal-bpe")
    # first invocation discarded: a FRESH session reads the canary ~1.7x
    # high until the JIT warms (bench.py warms q01 + the UDF workers
    # before ITS pre-canary; rehearsals have no such preamble)
    control_canary_sec(spark, CANARY_SF_DIR)
    canary_pre = control_canary_sec(spark, CANARY_SF_DIR)

    small_path = _gen_documents(spark, sf_small, f"/tmp/bpe_sf{sf_small:g}")
    merges = learn_bpe(
        spark.read.parquet(small_path).select("text"), n_merges=N_MERGES
    )

    results: dict[str, dict] = {}
    for sf in (sf_small, sf_big):
        path = _gen_documents(spark, sf, f"/tmp/bpe_sf{sf:g}")
        docs = spark.read.parquet(path).select("doc_id", "text")
        n = docs.count()
        token_total = {}

        def run_encode():
            row = (
                apply_bpe(docs, merges)
                .agg(F.sum("n_bpe_tokens").alias("toks"), F.count(F.lit(1)))
                .collect()[0]
            )
            token_total["toks"] = int(row["toks"])

        timing = _time(run_encode, spark=spark)
        results[f"sf{sf:g}"] = {
            "rows": n,
            "total_bpe_tokens": token_total["toks"],
            **timing,
            "steady_tokens_per_sec": int(
                token_total["toks"] / max(timing["steady_sec"], 1e-9)
            ),
        }

    canary_post = control_canary_sec(spark, CANARY_SF_DIR)
    small, big = results[f"sf{sf_small:g}"], results[f"sf{sf_big:g}"]
    artifact = {
        "protocol": (
            "sink-side (single-row n_bpe_tokens aggregate; no driver collect "
            "of token arrays); ONE merge list learned at the small scale and "
            "held fixed across scales"
        ),
        "n_merges": N_MERGES,
        "row_growth": round(big["rows"] / small["rows"], 2),
        "steady_growth_ratio": round(
            big["steady_sec"] / max(small["steady_sec"], 1e-9), 2
        ),
        "tokens_per_sec_ratio": round(
            big["steady_tokens_per_sec"] / max(small["steady_tokens_per_sec"], 1), 2
        ),
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
