#!/usr/bin/env python
"""Decompose dedup_simhash's steady cost at sf0.1 (round-14 probe).

Stages timed independently (median of N, clearCache+GC between runs,
canary-bracketed like opt_measure.py):

- jvm_hash:   the per-word JVM pipeline alone (md5 + conv hex->long),
              forced via sum(xxhash64(hs)) so nothing is pruned and no
              Python stage exists.
- jvm_md5:    md5 + substring only (the variant's JVM half), forced via
              sum(length(concat_ws("", transform(md5 -> substr 16)))).
- fingerprint: the full simhash() fingerprint (JVM hash + pandas UDF).
- full:       the declared query (fingerprint + banding + verify),
              bench Arrow materialization.

Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(xs):
    return sorted(xs)[(len(xs) - 1) // 2]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from bench import control_canary_sec, classify_band, make_materializer
    from datafusion_dft_spark.registry import all_queries
    from datafusion_dft_spark.session import (
        get_spark,
        tune_runtime_conf,
        default_parallelism,
        ensure_min_parallelism,
    )
    from datafusion_dft_spark.catalog import load_tables
    from datafusion_dft_spark.operators import dedup as dd

    spark = get_spark(app_name="probe-simhash-decomp")
    tune_runtime_conf(spark, sf)
    specs = all_queries()
    specs["q01_pricing_summary"].build(spark, sf).collect()

    @F.pandas_udf("long")
    def _warm_udf(s: pd.Series) -> pd.Series:
        return s

    (
        spark.range(default_parallelism() * 4)
        .repartition(default_parallelism())
        .select(_warm_udf("id"))
        .collect()
    )

    docs = load_tables(spark, sf)["documents"]
    src = ensure_min_parallelism(docs.filter(F.col("text").isNotNull()))

    words = F.split(F.col("text"), " ")
    ms = F.transform(words, lambda w: F.md5(w))
    hs_long = F.transform(
        ms,
        lambda m: F.shiftleft(
            F.conv(F.substring(m, 1, 8), 16, 10).cast("long"), 32
        ).bitwiseOR(F.conv(F.substring(m, 9, 8), 16, 10).cast("long")),
    )
    hs_hex = F.concat_ws("", F.transform(ms, lambda m: F.substring(m, 1, 16)))

    # Build every DataFrame ONCE (bench plan-once/execute-n parity):
    # rebuilding inside the timed lambda re-pays Catalyst analysis/
    # optimization per sample, which the §1.4 receipts showed dwarfs
    # execution for nested plans.
    jvm_hash_df = src.select(F.xxhash64(hs_long).alias("x")).agg(F.bit_xor("x"))
    jvm_md5_df = src.select(F.length(hs_hex).alias("x")).agg(F.sum("x"))
    fp_df = dd.simhash(docs, "doc_id", "text")
    cases = {
        "jvm_hash": jvm_hash_df.collect,
        "jvm_md5": jvm_md5_df.collect,
        "fingerprint": fp_df.toArrow,
    }

    full_df = specs["dedup_simhash"].build(spark, sf)
    full_run = make_materializer("dedup_simhash", full_df)
    cases["full"] = full_run

    pre = control_canary_sec(spark, sf)
    out = {}
    for name, fn in cases.items():
        spark.sparkContext.setJobDescription(f"probe:{name}")
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        out[name] = {
            "med": round(median(samples), 4),
            "min": round(min(samples), 4),
        }
        spark.sparkContext.setJobDescription(None)
    post = control_canary_sec(spark, sf)
    out["band"] = classify_band(pre, post)
    out["control_pre"], out["control_post"] = pre, post
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
