#!/usr/bin/env python
"""Measure the unbounded embedding-dedup planes/candidate-mass trade.

SCALE.md states the unbounded (100 TB) formulation's scaling rule:
candidate mass falls EXPONENTIALLY in planes while the signature pass
grows linearly, so planes grow with log(n) as corpora grow. This tool
turns that from a stated rule into a measured one on the adversarial
rehearsal corpora (embedding clusters at intra-cosine ~0.89 — the LSH
worst case, maximum mid-similarity collision mass).

For each planes setting it reports:
- raw banded candidate mass Σ C(b,2) over (table, bucket) groups (the
  quantity that explodes — measured by aggregation, the pairs are
  never expanded for this count)
- wall time + output rows of the full unbounded query
- recall vs the bounded formulation's exact-verified output at the
  default 12 planes (every emitted pair is exact-verified in both, so
  precision is 1.0 by construction; planes only move candidate recall)

Usage: python tools/planes_scaling.py SF_DIR OUT_JSON [PLANES...]
Default planes sweep: 12 14 16.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    planes_sweep = [int(p) for p in sys.argv[3:]] or [12, 14, 16]

    from pyspark.sql import functions as F

    from datafusion_dft_spark.catalog import load_tables
    from datafusion_dft_spark.operators import similarity as sim
    from datafusion_dft_spark.session import get_spark, tune_runtime_conf

    spark = get_spark(app_name="planes-scaling")
    tune_runtime_conf(spark, sf_dir)

    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", sim.as_double("embedding").alias("embedding"))
    nrows = e.count()
    dim = 64

    # Reference pair set: the bounded formulation at default parameters
    # (exact-verified output; recall denominator).
    t0 = time.perf_counter()
    ref_pairs = {
        (r.id1, r.id2)
        for r in sim.cosine_dup_pairs(
            e, threshold=0.95, dim=dim, nrows=nrows, strategy="bounded"
        ).collect()
    }
    ref_sec = round(time.perf_counter() - t0, 3)

    results = {}
    for n_planes in planes_sweep:
        raw = e.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
        sigs = sim.signatures(F.col("v"), dim, n_planes, 24)
        banded = raw.select("vid", F.posexplode(sigs).alias("table", "bucket"))
        mass_row = (
            banded.groupBy("table", "bucket")
            .agg(F.count("*").alias("b"))
            .agg(
                F.sum(F.expr("b * (b - 1) / 2")).alias("mass"),
                F.max("b").alias("max_bucket"),
            )
            .collect()[0]
        )
        t0 = time.perf_counter()
        got = sim.cosine_dup_pairs(
            e,
            threshold=0.95,
            dim=dim,
            nrows=nrows,
            strategy="unbounded",
            n_planes=n_planes,
        ).collect()
        wall = round(time.perf_counter() - t0, 3)
        got_pairs = {(r.id1, r.id2) for r in got}
        recall = len(got_pairs & ref_pairs) / len(ref_pairs) if ref_pairs else 1.0
        results[str(n_planes)] = {
            "raw_candidate_mass": int(mass_row.mass or 0),
            "max_bucket": int(mass_row.max_bucket or 0),
            "unbounded_wall_sec": wall,
            "pairs": len(got_pairs),
            "recall_vs_bounded": round(recall, 6),
        }
        print(f"planes={n_planes}: mass={results[str(n_planes)]['raw_candidate_mass']:,} "
              f"max_bucket={results[str(n_planes)]['max_bucket']:,} wall={wall}s "
              f"pairs={len(got_pairs):,} recall={recall:.4f}", flush=True)

    artifact = {
        "sf_dir": sf_dir,
        "nrows": nrows,
        "n_tables": 24,
        "threshold": 0.95,
        "bounded_reference": {"pairs": len(ref_pairs), "wall_sec": ref_sec},
        "planes": results,
        "note": (
            "adversarial corpus (intra-cluster cosine ~0.89, LSH worst case); "
            "raw_candidate_mass = sum of C(b,2) over (table,bucket) groups before "
            "distinct — the quantity the unbounded formulation shuffles. Both "
            "formulations exact-verify candidates, so precision is 1.0 and "
            "planes only move candidate recall."
        ),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
