#!/usr/bin/env python
"""Scale rehearsal for the ordering operators (packing / shuffle / shards).

Generates documents-only corpora at two scale factors with
``tools/tpch_gen.py`` (10× row growth by default), times each operator
SINK-SIDE (aggregate materialization or a real parquet write — never a
driver collect, per the r9 rehearsal protocol), and reports the growth
ratio. Both operators are two-pass prefix decompositions whose only
data movement is one shuffle, so work should grow ~linearly with rows:
the receipt to look for is ratio ≲ row growth.

Usage: python tools/rehearsal_packing.py [SF_SMALL] [SF_BIG] [OUT_JSON]
Defaults: 1 10 BENCH_PACKING_SCALE.json (corpora under /tmp).
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
    return {
        "cold_sec": round(cold, 3),
        "steady_sec": round(samples[len(samples) // 2] if samples else cold, 3),
    }


def main() -> int:
    sf_small = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_big = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_PACKING_SCALE.json"

    from datafusion_dft_spark.operators import text as tx
    from datafusion_dft_spark.operators.ordering import (
        deterministic_shuffle,
        write_training_shards,
    )
    from datafusion_dft_spark.operators.packing import pack_sequences
    from datafusion_dft_spark.session import get_spark

    spark = get_spark(app_name="rehearsal-packing")
    results: dict[str, dict] = {}
    for sf in (sf_small, sf_big):
        sf_dir = _gen_documents(spark, sf, f"/tmp/packing_sf{sf:g}")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        n = docs.count()
        toked = docs.withColumn("tok", tx.token_count("text")).drop("text")

        def run_pack():
            # sink-side: fold the packed columns into one aggregate row
            pack_sequences(toked, "doc_id", "tok", 2048).agg(
                F.sum("global_offset"), F.max("chunk_last")
            ).collect()

        def run_shuffle():
            deterministic_shuffle(toked, "doc_id", seed=3).agg(
                F.sum("shuffle_pos")
            ).collect()

        def run_shards():
            write_training_shards(
                toked, f"/tmp/packing_shards_sf{sf:g}", "doc_id", seed=3,
                shard_rows=max(n // 64, 1),
            )

        results[f"sf{sf:g}"] = {
            "rows": n,
            "pack_sequences": _time(run_pack),
            "deterministic_shuffle": _time(run_shuffle),
            "write_training_shards": _time(run_shards, runs=2),
        }

    small, big = results[f"sf{sf_small:g}"], results[f"sf{sf_big:g}"]
    growth = big["rows"] / small["rows"]
    ratios = {
        op: round(big[op]["steady_sec"] / max(small[op]["steady_sec"], 1e-9), 2)
        for op in ("pack_sequences", "deterministic_shuffle", "write_training_shards")
    }
    artifact = {
        "protocol": "sink-side (aggregate or parquet write; no driver collect)",
        "row_growth": round(growth, 2),
        "steady_growth_ratios": ratios,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
