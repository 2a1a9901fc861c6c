"""Per-phase benchmark harness.

Reference: dft's ``--bench`` / ``--analyze`` modes time parse /
logical-plan / physical-plan / execute per iteration and report
min/max/mean/median per phase plus row-count consistency
(crates/datafusion-app/src/local.rs:366-555,
local_benchmarks.rs:112-186). Spark doesn't expose logical-vs-physical
planning boundaries as cleanly; the mapping here (documented deviation,
SURVEY.md §7 "hard parts"):

- ``plan``    — ``spark.sql(...)``: parsing + analysis
- ``physical``— forcing ``queryExecution.executedPlan``: optimization +
                physical planning (+ AQE prep)
- ``execute`` — running the plan to completion (count-free noop write)
- ``total``   — sum of the above
"""

from __future__ import annotations

import csv
import statistics
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

PHASES = ("plan", "physical", "execute", "total")


@dataclass
class BenchResult:
    query: str
    runs: int
    concurrency_mode: str
    phase_times: dict[str, list[float]] = field(default_factory=dict)
    row_counts: list[int] = field(default_factory=list)

    def summary(self) -> dict[str, dict[str, float]]:
        out: dict[str, dict[str, float]] = {}
        total_mean = statistics.mean(self.phase_times["total"]) if self.phase_times else 0.0
        for phase in PHASES:
            ts = self.phase_times.get(phase, [])
            if not ts:
                continue
            mean = statistics.mean(ts)
            out[phase] = {
                "min": min(ts),
                "max": max(ts),
                "mean": mean,
                "median": statistics.median(ts),
                "pct_of_total": (100.0 * mean / total_mean) if total_mean else 0.0,
            }
        return out

    @property
    def rows_consistent(self) -> bool:
        return len(set(self.row_counts)) <= 1


def run_bench(
    spark: SparkSession,
    sql: str,
    iterations: int = 10,
    run_before: str | None = None,
) -> BenchResult:
    """Serial benchmark of one SQL statement (reference default: 10 runs).

    The execute phase runs the FULL plan to a noop sink — timing
    ``count()`` would let Catalyst prune every projection and understate
    queries whose cost is in the select list. The row count for the
    result-validation column is taken once, untimed.
    """
    res = BenchResult(query=sql, runs=iterations, concurrency_mode="serial")
    res.phase_times = {p: [] for p in PHASES}
    if run_before:
        spark.sql(run_before).write.format("noop").mode("overwrite").save()
    res.row_counts = [spark.sql(sql).count()]  # validation only, untimed
    for _ in range(iterations):
        t0 = time.perf_counter()
        df = spark.sql(sql)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # force physical planning
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        res.phase_times["plan"].append(t1 - t0)
        res.phase_times["physical"].append(t2 - t1)
        res.phase_times["execute"].append(t3 - t2)
        res.phase_times["total"].append(t3 - t0)
    return res


def run_bench_concurrent(
    spark: SparkSession,
    sql: str,
    iterations: int = 10,
    run_before: str | None = None,
) -> BenchResult:
    """Concurrent benchmark: min(iterations, cpus) queries in flight.

    Reference: ``--bench --concurrent`` runs iterations with parallelism
    min(iterations, num_cpus) (local.rs:422-426). Spark's scheduler
    multiplexes the concurrent jobs across executor threads (FAIR/FIFO
    pools) — exactly the contention profile a multi-user deployment sees.
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    workers = min(iterations, _os.cpu_count() or 4)
    res = BenchResult(query=sql, runs=iterations, concurrency_mode=f"concurrent[{workers}]")
    res.phase_times = {p: [] for p in PHASES}
    if run_before:
        spark.sql(run_before).write.format("noop").mode("overwrite").save()

    res.row_counts = [spark.sql(sql).count()]  # validation only, untimed

    def one(_: int) -> tuple[float, float, float]:
        t0 = time.perf_counter()
        df = spark.sql(sql)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        return (t1 - t0, t2 - t1, t3 - t2)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for plan_t, phys_t, exec_t in pool.map(one, range(iterations)):
            res.phase_times["plan"].append(plan_t)
            res.phase_times["physical"].append(phys_t)
            res.phase_times["execute"].append(exec_t)
            res.phase_times["total"].append(plan_t + phys_t + exec_t)
    return res


def save_csv(results: list[BenchResult], path: str, append: bool = False) -> None:
    """CSV export mirroring local_benchmarks.rs:145-166's column layout."""
    header = ["query", "runs", "concurrency_mode"]
    for phase in PHASES:
        for stat in ("min", "max", "mean", "median", "pct_of_total"):
            header.append(f"{phase}_{stat}")
    mode = "a" if append else "w"
    with open(path, mode, newline="") as f:
        w = csv.writer(f)
        if not append:
            w.writerow(header)
        for r in results:
            s = r.summary()
            row: list = [r.query.replace("\n", " ").strip(), r.runs, r.concurrency_mode]
            for phase in PHASES:
                st = s.get(phase, {})
                row.extend(
                    round(st.get(k, 0.0), 6)
                    for k in ("min", "max", "mean", "median", "pct_of_total")
                )
            w.writerow(row)


def format_report(res: BenchResult) -> str:
    lines = [
        f"Benchmark: {res.query.strip()[:80]}",
        f"runs={res.runs} mode={res.concurrency_mode} rows_consistent={res.rows_consistent}",
        f"{'phase':<10}{'min':>10}{'max':>10}{'mean':>10}{'median':>10}{'%total':>9}",
    ]
    for phase, st in res.summary().items():
        lines.append(
            f"{phase:<10}{st['min']*1e3:>9.2f}m{st['max']*1e3:>9.2f}m"
            f"{st['mean']*1e3:>9.2f}m{st['median']*1e3:>9.2f}m{st['pct_of_total']:>8.1f}%"
        )
    return "\n".join(lines)


def analyze(spark: SparkSession, sql: str) -> dict[str, object]:
    """--analyze mode: one run + plan summary (stats.rs analog)."""
    t0 = time.perf_counter()
    df = spark.sql(sql)
    t1 = time.perf_counter()
    physical = df._jdf.queryExecution().executedPlan().toString()
    t2 = time.perf_counter()
    n = df.count()
    t3 = time.perf_counter()
    return {
        "rows": n,
        "plan_sec": t1 - t0,
        "physical_sec": t2 - t1,
        "execute_sec": t3 - t2,
        "physical_plan": physical,
        "explain_formatted": df._sc is not None
        and df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ),
    }
