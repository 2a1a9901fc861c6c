#!/usr/bin/env python
"""Scale rehearsal for the round-11 operators.

Times TF-IDF keyword extraction, the banded range join, cohort
retention, fuzzy entity resolution, target-share mixture sampling and
the distributed PCA fit SINK-SIDE at two corpus sizes and reports
steady-state growth ratios. Every op is designed linear in its input
(range join: in its OUTPUT — the interval set is held ~constant so
pair count tracks event density; the receipt reports pairs alongside
time), so the number to look for is ratio ≲ row/output growth.

Usage: python tools/rehearsal_r11_ops.py [SF_SMALL] [SF_BIG] [OUT_JSON]
Defaults: 1 10 BENCH_R11_OPS.json (corpora under /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

_WINDOW_US = 30 * 60 * 1_000_000
_N_WINDOWS = 500  # held ~constant across sf: pair count then tracks density


def _gen(spark, sf: float, out_dir: str) -> dict:
    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    os.makedirs(out_dir, exist_ok=True)
    need = ("documents", "events", "part", "embeddings")
    if not all(os.path.exists(os.path.join(out_dir, f"{t}.parquet")) for t in need):
        tables = gen_tables(spark, scale_factor=sf)
        for t in need:
            tables[t].write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )
    return {
        t: spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")) for t in need
    }


def _time(fn, runs: int = 5, spark=None) -> dict:
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


OPS = ["tfidf", "range_join", "cohort", "fuzzy", "mixture", "pca_fit"]


def main() -> int:
    sf_small = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_big = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_R11_OPS.json"

    from datafusion_dft_spark.operators import pca as pc
    from datafusion_dft_spark.operators.joins import banded_range_join, fuzzy_best_match
    from datafusion_dft_spark.operators.retrieval import tfidf_top_terms
    from datafusion_dft_spark.operators.sampling import mixture_sample
    from datafusion_dft_spark.queries.dedup import FUZZY_SEED_NAMES
    from datafusion_dft_spark.session import get_spark

    from bench import classify_band, control_canary_sec

    spark = get_spark(app_name="rehearsal-r11-ops")
    control_canary_sec(spark, "/root/testdata/sf0.1")  # JIT warmup, discarded
    canary_pre = control_canary_sec(spark, "/root/testdata/sf0.1")
    results: dict[str, dict] = {}
    for sf in (sf_small, sf_big):
        t = _gen(spark, sf, f"/tmp/r11ops_sf{sf:g}")
        docs = t["documents"].select("doc_id", "lang", "source", "text")
        ev = t["events"]
        n_rows = {
            "documents": docs.count(),
            "events": ev.count(),
            "part": t["part"].count(),
            "embeddings": t["embeddings"].count(),
        }
        n_events = n_rows["events"]
        every = max(n_events // _N_WINDOWS, 1)
        windows = ev.filter(
            (F.col("event_type") == "error") & (F.col("event_id") % every == 0)
        ).select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            F.timestamp_micros(F.unix_micros("ts") + _WINDOW_US).alias("w_end"),
        )
        points = ev.select(F.col("ts").alias("e_ts"), "event_type")
        n_pairs = banded_range_join(
            points, windows, "e_ts", "w_start", "w_end", _WINDOW_US
        ).count()
        seeds = spark.createDataFrame([(n,) for n in FUZZY_SEED_NAMES], "name string")

        def run_tfidf():
            tfidf_top_terms(docs).agg(
                F.sum("top_tfidf_score"), F.count(F.lit(1))
            ).collect()

        def run_range():
            banded_range_join(
                points, windows, "e_ts", "w_start", "w_end", _WINDOW_US
            ).groupBy("window_id", "event_type").agg(
                F.count(F.lit(1)).alias("n")
            ).agg(F.sum("n"), F.count(F.lit(1))).collect()

        def run_cohort():
            ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
            coh = ud.withColumn(
                "cohort_day", F.min("d").over(W.partitionBy("user_id"))
            ).withColumn("day_offset", F.datediff("d", "cohort_day").cast("long"))
            coh.groupBy("cohort_day", "day_offset").agg(
                F.count(F.lit(1)).alias("n_users")
            ).agg(F.sum("n_users"), F.count(F.lit(1))).collect()

        def run_fuzzy():
            fuzzy_best_match(seeds, t["part"], "name", "p_partkey", "p_name").agg(
                F.sum("n_copies"), F.count(F.lit(1))
            ).collect()

        def run_mixture():
            mixture_sample(
                docs, "doc_id", "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}
            ).agg(F.count(F.lit(1)), F.sum("doc_id")).collect()

        def run_pca():
            pc.pca_fit(t["embeddings"], "embedding", label_col="label", k=8)

        runs = {
            "tfidf": run_tfidf,
            "range_join": run_range,
            "cohort": run_cohort,
            "fuzzy": run_fuzzy,
            "mixture": run_mixture,
            "pca_fit": run_pca,
        }
        results[f"sf{sf:g}"] = {"rows": n_rows, "range_pairs": n_pairs}
        for op in OPS:
            results[f"sf{sf:g}"][op] = _time(runs[op], spark=spark)

    small, big = results[f"sf{sf_small:g}"], results[f"sf{sf_big:g}"]
    ratios = {
        op: round(big[op]["steady_sec"] / max(small[op]["steady_sec"], 1e-9), 2)
        for op in OPS
    }
    growth = {
        tab: round(big["rows"][tab] / small["rows"][tab], 2) for tab in big["rows"]
    }
    growth["range_pairs"] = round(big["range_pairs"] / max(small["range_pairs"], 1), 2)
    canary_post = control_canary_sec(spark, "/root/testdata/sf0.1")
    artifact = {
        "protocol": "sink-side (single-row aggregate; no driver collect of data)",
        "row_growth": growth,
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
