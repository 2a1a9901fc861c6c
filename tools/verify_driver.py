#!/usr/bin/env python
"""Driver-contract simulation: runs __spark_entry__ the way the external
verification driver does (plain un-configured SparkSession, queries vs
oracle_sql through DuckDB at sf0.01 with order-insensitive value hashes).

Usage: python tools/verify_driver.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(
            "NULL" if r[i] is None else f"{r[i]:.6g}" if isinstance(r[i], float) else str(r[i])
            for i in order
        )
        for r in rows
    )
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} with oracle")
    fails = []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        ores = con.sql(oracles[name])
        orows = [tuple(r) for r in ores.fetchall()]
        ok = (
            sorted(sdf.columns) == sorted(ores.columns)
            and len(srows) == len(orows)
            and value_hash(sdf.columns, srows) == value_hash(ores.columns, orows)
        )
        if not ok:
            fails.append(name)
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
