#!/usr/bin/env python
"""Scale rehearsal for SemDeDup semantic dedup (round 10).

Times ``semantic_dup_pairs`` SINK-SIDE (single-row aggregate
materialization — no driver collect of the pair data) at two corpus
sizes, in BOTH configurations the SCALE.md entry documents:

- **fixed K** (n_clusters held at 16): cells grow with the corpus, the
  in-cell O(cell^2) verify dominates, total work is O(n^2/K) — the
  receipt to look for is ~quadratic growth (10x rows -> ~100x FLOPs),
  i.e. what happens when the operator is mis-configured at scale.
- **scaled K** (n_clusters grown with the corpus, cells held at the
  sf-small size): the production setting — the receipt to look for is
  growth ≈ row growth (linear).
- **incremental, fixed 1k batch** (``semantic_dup_pairs_incremental``
  with scaled K): the daily-increment shape — per-batch growth is
  bounded by the corpus-side assignment scan (which the
  persisted-(id, cell) pattern removes in production), far below row
  growth.

Usage: python tools/rehearsal_semantic.py [SF_SMALL] [SF_BIG] [OUT_JSON]
Defaults: 1 10 BENCH_SEMANTIC_SCALE.json (corpora under /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _gen_embeddings(spark, sf: float, out_dir: str) -> str:
    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    path = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(path):
        gen_tables(spark, scale_factor=sf)["embeddings"].write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _time(fn, runs: int = 3) -> dict:
    cold = None
    samples = []
    for i in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i == 0:
            cold = dt
        else:
            samples.append(dt)
    samples.sort()
    # lower median — the repo-wide bench convention (bench.py)
    steady = samples[(len(samples) - 1) // 2] if samples else cold
    return {"cold_sec": round(cold, 3), "steady_sec": round(steady, 3)}


def main() -> int:
    sf_small = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_big = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SEMANTIC_SCALE.json"
    base_k = 16

    from datafusion_dft_spark.operators.similarity import (
        semantic_dup_pairs,
        semantic_dup_pairs_incremental,
    )
    from datafusion_dft_spark.session import get_spark

    spark = get_spark(app_name="rehearsal-semantic")
    results: dict[str, dict] = {}
    for sf in (sf_small, sf_big):
        path = _gen_embeddings(spark, sf, f"/tmp/semantic_sf{sf:g}")
        emb = spark.read.parquet(path)
        n = emb.count()
        scaled_k = max(base_k, int(base_k * sf / sf_small))

        def run(k):
            semantic_dup_pairs(
                emb, threshold=0.9, n_clusters=k, dim=64, nrows=n
            ).agg(F.count(F.lit(1)), F.sum("id1")).collect()

        fixed = {"k": base_k, **_time(lambda: run(base_k))}
        # at the small SF the two configs coincide — reuse the timing
        # instead of re-measuring the identical run
        scaled = (
            dict(fixed)
            if scaled_k == base_k
            else {"k": scaled_k, **_time(lambda: run(scaled_k))}
        )

        # daily-increment shape: a FIXED 1k-row batch against the
        # growing corpus, scaled K. Growth here is bounded by the
        # corpus-side assignment scan (the persisted-(id,cell) pattern
        # removes it in production); the in-cell verify itself is
        # batch-proportional.
        batch = emb.filter(F.col("vec_id") < 1000)
        rest = emb.filter(F.col("vec_id") >= 1000)

        def run_inc():
            semantic_dup_pairs_incremental(
                batch, rest, threshold=0.9, n_clusters=scaled_k, dim=64,
                corpus_nrows=n - 1000,
                check_id_overlap=False,  # the vec_id split is disjoint
            ).agg(F.count(F.lit(1)), F.sum("id1")).collect()

        results[f"sf{sf:g}"] = {
            "rows": n,
            "fixed_k": fixed,
            "scaled_k": scaled,
            "incremental_1k_batch": {"k": scaled_k, **_time(run_inc)},
        }

    small, big = results[f"sf{sf_small:g}"], results[f"sf{sf_big:g}"]
    growth = big["rows"] / small["rows"]
    artifact = {
        "protocol": "sink-side (single-row aggregate; no driver collect of data)",
        "row_growth": round(growth, 2),
        "steady_growth_ratios": {
            cfg: round(
                big[cfg]["steady_sec"] / max(small[cfg]["steady_sec"], 1e-9), 2
            )
            for cfg in ("fixed_k", "scaled_k", "incremental_1k_batch")
        },
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
