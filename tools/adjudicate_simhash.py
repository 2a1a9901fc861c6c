#!/usr/bin/env python
"""Adjudicate dedup_simhash's bench reading (r11 verdict task #1).

The r11 driver artifact read dedup_simhash at 1.84 s median (ALL its
steady samples 1.61-2.06 s) while the builder's same-code
canary-stamped run read 0.384 s — a 4.8x spread the ~2x host-band
shift cannot explain. Hypothesis: the cached-lineage bimodality
diagnosed for pipeline_clean_corpus (SCALE.md, commit 7c73136) —
steady samples are fast only while Spark's shuffle-file reuse
(skipped stages) survives between re-executions of the SAME DataFrame;
when the ContextCleaner's async deletions land between samples (the
bench's own per-sample System.gc() plus session-wide pressure), every
sample pays the full fingerprint+banding recompute.

This tool measures the two modes EXPLICITLY, in one session, with
canary stamps (same-session evidence per BASELINE.md governance):

- REUSE mode: bench protocol verbatim — build once, re-execute the
  same DataFrame N times (clearCache + GC between samples).
- NO-REUSE mode: rebuild the DataFrame fresh before every sample
  (fresh RDD lineage cannot reference the previous run's shuffle
  files — recompute is structurally guaranteed).
- Count executed-vs-skipped stages per sample via the status tracker,
  so the mode attribution is a receipt, not an inference.

window_rank_suite rides along (same protocol, both modes) to
re-adjudicate its 5.0x PROXY flag: its DuckDB oracle is timed in the
same session so the ratio carries its own canary.

Writes BENCH_SIMHASH_ADJUDICATION.json and prints the JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_ADJ_RUNS", "6"))


def stage_counts(spark, t0_job: int) -> dict:
    """(executed, skipped) task counts across jobs since t0_job."""
    st = spark.sparkContext.statusTracker()
    executed = skipped = 0
    for jid in st.getJobIdsForGroup(None):
        if jid < t0_job:
            continue
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is None:
                continue
            if si.numTasks > 0 and si.numCompletedTasks == 0 and si.numActiveTasks == 0:
                skipped += 1
            else:
                executed += 1
    return {"stages_seen": executed + skipped, "stages_executed": executed}


def next_job_id(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return (max(ids) + 1) if ids else 0


def sample_query(spark, build, runs: int, fresh_each: bool):
    from bench import make_materializer

    df = build()
    run = make_materializer("adj", df)  # cold; also decides arrow-vs-collect
    # Record WHICH delivery path the cold probe chose so fresh mode can
    # rebind the SAME method on each rebuilt plan (r12 ADVICE: always
    # rebinding toArrow would time a different materialization path for
    # any query whose materializer is collect, skewing the
    # reuse-vs-fresh comparison). Calling make_materializer per rebuild
    # would be wrong the other way: its probe EXECUTES the fresh plan
    # once, and the timed run would then reuse the probe's shuffle
    # files — structurally re-creating reuse mode inside fresh mode.
    method = "collect" if run == df.collect else "toArrow"
    samples, stages = [], []
    for _ in range(runs):
        if fresh_each:
            df = build()
            run = getattr(df, method)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        j0 = next_job_id(spark)
        t0 = time.perf_counter()
        run()
        samples.append(round(time.perf_counter() - t0, 4))
        stages.append(stage_counts(spark, j0))
    return samples, stages


def main() -> int:
    from datafusion_dft_spark.registry import all_queries
    from datafusion_dft_spark.session import get_spark, tune_runtime_conf
    from bench import classify_band, control_canary_sec

    spark = get_spark(app_name="simhash-adjudication")
    tune_runtime_conf(spark, SF_DIR)
    specs = all_queries()

    # Warm codegen + python workers (bench protocol).
    specs["q01_pricing_summary"].build(spark, SF_DIR).collect()
    control_canary_sec(spark, SF_DIR)  # discard fresh-session JIT read
    canary_pre = control_canary_sec(spark, SF_DIR)

    out: dict = {"sf_dir": SF_DIR, "runs": RUNS}
    for name in ("dedup_simhash", "window_rank_suite", "pipeline_clean_corpus"):
        spec = specs[name]
        build = lambda s=spec: s.build(spark, SF_DIR)
        reuse_s, reuse_st = sample_query(spark, build, RUNS, fresh_each=False)
        fresh_s, fresh_st = sample_query(spark, build, RUNS, fresh_each=True)
        out[name] = {
            "reuse_samples": reuse_s,
            "reuse_median": round(statistics.median(reuse_s), 4),
            "reuse_stages_executed": [s["stages_executed"] for s in reuse_st],
            "fresh_samples": fresh_s,
            "fresh_median": round(statistics.median(fresh_s), 4),
            "fresh_stages_executed": [s["stages_executed"] for s in fresh_st],
        }

    # DuckDB side of window_rank_suite, same host minute, for the
    # PROXY flag re-adjudication.
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "nation", "region", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    wr = specs["window_rank_suite"]
    con.sql(wr.oracle).fetchall()  # warm
    d_samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        con.sql(wr.oracle).fetchall()
        d_samples.append(round(time.perf_counter() - t0, 4))
    out["window_rank_suite"]["duckdb_samples"] = d_samples
    out["window_rank_suite"]["duckdb_median"] = round(statistics.median(d_samples), 4)

    canary_post = control_canary_sec(spark, SF_DIR)
    out["control_sec_pre"] = canary_pre
    out["control_sec_post"] = canary_post
    out.update(classify_band(canary_pre, canary_post))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_SIMHASH_ADJUDICATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
