#!/usr/bin/env python
"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR.

Reference analog: dft's ``--bench`` mode
(crates/datafusion-app/src/local.rs:366-504) which times each query over
N iterations. Here: one warm-up of the session, then each registered
query executed to completion against a ``noop`` sink (full plan runs,
nothing collected to the driver). Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from datafusion_dft_spark.registry import all_queries
    from datafusion_dft_spark.session import get_spark

    spark = get_spark(app_name="datafusion-dft-spark-bench")
    specs = {n: s for n, s in all_queries().items() if s.bench}

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # query, not session startup.
    warm = specs.get("q01_pricing_summary") or next(iter(specs.values()))
    warm.build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two runs per query, report the min: single-shot numbers in a shared
    # JVM swing +-25% from GC/JIT; the min is the stable signal.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    times: dict[str, float] = {}
    for name, spec in specs.items():
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 4)
        except Exception as e:  # a failing query shouldn't kill the whole bench
            times[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
        finally:
            # Sketch operators cache intermediates (shingles, signatures);
            # dropping them between queries keeps executor memory flat so
            # later queries aren't taxed by earlier queries' blocks.
            spark.catalog.clearCache()

    total = round(sum(v for v in times.values() if v >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
