#!/usr/bin/env python
"""Adjudicate window_rank_suite's standing >2x PROXY flag (r13 verdict
task #4) by FLOOR DECOMPOSITION — the asof_join_purchase_view pattern.

The row's history: 1.9x at the r10 quiet band (under the bar), 2.4x in
the r12 same-minute re-adjudication, 3-5x in contended chunks. The r14
sessions never saw the quiet band return (canary floor ~0.044 vs the
pinned 0.024-0.030, minute-scale swings to 0.28 with loadavg ~0 — the
degraded-vCPU pathology), so instead of waiting for a lucky <=2x read,
this tool measures WHERE the Spark seconds go, in one session, with
canary stamps:

- ``scan_agg``: customer scan + the same hashpartition(c_nationkey)
  exchange + a trivial 25-row aggregate, Arrow-materialized — the
  fixed scan/shuffle/job floor every grouped job on this table pays,
  zero window machinery.
- ``single_window``: row_number() over the suite's main window + the
  rn<=5 filter — adds the in-partition sort and ONE window function.
- ``full_suite``: the registered query — 8 analytic functions over 3
  window definitions (two sort orders), same 125-row output.

DuckDB mirrors each component in the same process. If scan_agg alone
is a large multiple of DuckDB's ENTIRE suite runtime, the >2x ratio is
the per-job floor on a 125-row output — amortized at scale — and not
the window plan (which `single_window -> full_suite` prices directly:
7 more analytic functions + one extra sort order).

Every side measures after CONVERGED warm-up (bench.control_canary_sec
r14 finding: C2 keeps tiering small plans for tens of executions) and
reports the median of RUNS samples under the bench clearCache+GC
protocol. Writes BENCH_WINDOW_RANK_ADJUDICATION.json and prints the
JSON line.
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


def timed_median(spark, run, runs: int = RUNS) -> float:
    """Converged warm-up, then median of ``runs`` samples (bench
    protocol: clearCache + explicit GC outside every timed window)."""
    best = float("inf")
    since_best = 0
    for _ in range(12):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run()
        cur = time.perf_counter() - t0
        if cur < best:
            best, since_best = cur, 0
        else:
            since_best += 1
            if since_best >= 2:
                break
    samples = []
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def duck_median(con, sql: str, runs: int = RUNS) -> float:
    best = float("inf")
    since_best = 0
    for _ in range(12):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        cur = time.perf_counter() - t0
        if cur < best:
            best, since_best = cur, 0
        else:
            since_best += 1
            if since_best >= 2:
                break
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def main() -> int:
    import duckdb
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bench import classify_band, control_canary_sec, make_materializer
    from datafusion_dft_spark.catalog import load_tables
    from datafusion_dft_spark.registry import all_queries
    from datafusion_dft_spark.session import get_spark, tune_runtime_conf

    spark = get_spark(app_name="adjudicate-window-rank")
    tune_runtime_conf(spark, SF_DIR)

    suite_spec = all_queries()["window_rank_suite"]
    suite_df = suite_spec.build(spark, SF_DIR)
    suite_df.collect()  # session warm-up (codegen paths, workers)

    control_canary_sec(spark, SF_DIR)  # discard fresh-session read
    canary_pre = control_canary_sec(spark, SF_DIR)

    cust = load_tables(spark, SF_DIR)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    scan_agg_df = cust.groupBy("c_nationkey").agg(
        F.max("c_acctbal").alias("max_bal"), F.count(F.lit(1)).alias("n")
    )
    single_window_df = (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        ).filter(F.col("rn") <= 5)
    )

    out: dict = {"sf_dir": SF_DIR, "runs": RUNS, "spark": {}, "duckdb": {}}
    for key, df in (
        ("scan_agg", scan_agg_df),
        ("single_window", single_window_df),
        ("full_suite", suite_df),
    ):
        out["spark"][key] = timed_median(spark, make_materializer(key, df))

    con = duckdb.connect()
    cust_path = os.path.join(SF_DIR, "customer.parquet")
    con.sql(f"CREATE OR REPLACE VIEW customer AS SELECT * FROM '{cust_path}'")
    duck_sqls = {
        "scan_agg": (
            "SELECT c_nationkey, max(c_acctbal) AS max_bal, count(*) AS n"
            " FROM customer GROUP BY c_nationkey"
        ),
        "single_window": (
            "SELECT * FROM (SELECT c_nationkey, c_custkey, c_acctbal,"
            " row_number() OVER (PARTITION BY c_nationkey"
            " ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer)"
            " WHERE rn <= 5"
        ),
        "full_suite": suite_spec.oracle,
    }
    for key, sql in duck_sqls.items():
        out["duckdb"][key] = duck_median(con, sql)

    canary_post = control_canary_sec(spark, SF_DIR)
    out["control_sec_pre"] = canary_pre
    out["control_sec_post"] = canary_post
    out.update(classify_band(canary_pre, canary_post))
    out["ratios"] = {
        k: round(out["spark"][k] / out["duckdb"][k], 2) for k in out["spark"]
    }
    out["floor_share_of_suite"] = round(
        out["spark"]["scan_agg"] / out["spark"]["full_suite"], 2
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_WINDOW_RANK_ADJUDICATION.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
