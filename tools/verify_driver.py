#!/usr/bin/env python
"""Driver-contract simulation: runs __spark_entry__ the way the external
verification driver does (plain un-configured SparkSession, queries vs
oracle_sql through DuckDB at sf0.01 with order-insensitive value hashes).

Usage: python tools/verify_driver.py [sf_dir] [query_name ...]
(naming queries restricts the run to them — full sweep otherwise)
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


def type_family(t: str) -> str:
    """Canonical dtype family for cross-engine schema comparison.

    The external driver compares typed values (Arrow-level), so a DuckDB
    HUGEINT next to a Spark BIGINT hash-mismatches even when every value
    is equal (round-1 failure mode). str(value)-based hashing can't see
    that; comparing type families restores the sensitivity. int128 is
    deliberately NOT folded into int.
    """
    t = t.lower()
    if "hugeint" in t or "int128" in t:
        return "int128"
    if "decimal" in t:
        return "decimal"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte") or t.startswith(("int", "uint", "ubigint", "usmallint", "utinyint")):
        return "int"
    if t in ("float", "double", "real") or t.startswith("float"):
        return "float"
    if "timestamp" in t:
        return "timestamp"
    if t == "date":
        return "date"
    if t in ("varchar", "string", "text"):
        return "str"
    if t in ("blob", "binary", "bytea"):
        return "binary"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith(("array", "list")) or "[]" in t:
        return "list"
    return t


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
    args = sys.argv[1:]
    sf = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args)
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
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        qs = {n: f for n, f in qs.items() if n in only}
    print(f"{len(qs)} queries, {sum(1 for n in qs if n in oracles)} with oracle")
    fails = []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        ores = con.sql(oracles[name])
        orows = [tuple(r) for r in ores.fetchall()]
        stypes = {c: type_family(t) for c, t in sdf.dtypes}
        otypes = {c: type_family(str(t)) for c, t in zip(ores.columns, ores.types)}
        type_diff = {
            c: (stypes.get(c), otypes.get(c))
            for c in set(stypes) | set(otypes)
            if stypes.get(c) != otypes.get(c)
        }
        ok = (
            sorted(sdf.columns) == sorted(ores.columns)
            and not type_diff
            and len(srows) == len(orows)
            and value_hash(sdf.columns, srows) == value_hash(ores.columns, orows)
        )
        if not ok:
            fails.append(name)
        note = f" TYPE {type_diff}" if type_diff else ""
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows){note}")
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
