#!/usr/bin/env python
"""Full-registry differential sweep at sf1 (r12 verdict task #7).

The correctness gate runs at sf0.01 and the round-12 builder re-ran the
full 50-query differential at sf0.1; this tool adds the third decade:
every registry query vs its DuckDB oracle on a generated sf1 corpus
(``tools/tpch_gen.py 1 /tmp/sf1`` — the ADVERSARIAL corpus: planted
duplicates, near-threshold embedding clusters, SimHash-colliding
vocabulary), so the sweep ladder is sf0.01 → sf0.1 → sf1.

Chunked-by-design: each invocation runs the named queries (or every
registry query when none are named) and MERGES its rows into
``CORRECTNESS_SF1_SWEEP.json``, so the full sweep can be assembled
across several sub-10-minute sessions. Each invocation stamps its own
host-noise canary (the FROZEN sf0.1 workload — the band is pinned to
that data) into the per-session log; the artifact is self-describing
per BASELINE.md bench governance.

Oracle protection: DuckDB runs each oracle under a watchdog
(``SWEEP_ORACLE_TIMEOUT`` seconds, default 540) — the exhaustive
ground-truth reformulations are quadratic by design and an sf1 blowup
records as ``oracle_timeout`` instead of hanging the sweep; the
Spark-side row still records rows/time so the engine-side evidence is
kept.

Usage: python tools/sweep_sf1.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from verify_driver import TABLES, type_family, value_hash  # noqa: E402

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "CORRECTNESS_SF1_SWEEP.json",
)
ORACLE_TIMEOUT = float(os.environ.get("SWEEP_ORACLE_TIMEOUT", "540"))


def load_artifact(path: str) -> dict:
    """Load the merge artifact, falling back to the default shape.

    Shape guard (r13 ADVICE): a parseable but hand-edited / older-format
    file missing the merge keys would KeyError at the update/append
    below and lose the just-measured chunk.
    """
    art: dict = {"queries": {}, "sessions": []}
    if os.path.exists(path):
        try:
            with open(path) as f:
                loaded = json.load(f)
        except (OSError, ValueError):
            return art
        if isinstance(loaded, dict) and isinstance(loaded.get("queries"), dict) \
                and isinstance(loaded.get("sessions"), list):
            return loaded
    return art


def main() -> int:
    args = sys.argv[1:]
    sf = args.pop(0) if args and os.path.isdir(args[0]) else "/tmp/sf1"
    only = set(args)

    from datafusion_dft_spark.session import get_spark, tune_runtime_conf
    from bench import classify_band, control_canary_sec

    spark = get_spark(app_name="sf1-sweep")
    tune_runtime_conf(spark, sf)

    import __spark_entry__ as mod

    qs, oracles = mod.queries(), mod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        qs = {n: f for n, f in qs.items() if n in only}

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    canary_pre = control_canary_sec(spark, "/root/testdata/sf0.1")
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        row: dict = {"err": None}
        try:
            t0 = time.perf_counter()
            sdf = fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(srows)
            row["spark_sec"] = round(time.perf_counter() - t0, 2)
        except Exception as e:
            row["err"] = f"spark: {type(e).__name__}: {e}"[:400]
            results[name] = row
            print(f"  {name}: SPARK ERROR {row['err'][:120]}")
            continue
        if name not in oracles:
            row["oracle"] = "rows-only"
            results[name] = row
            print(f"  {name}: rows-only, {len(srows)} rows ({row['spark_sec']}s)")
            continue
        t0 = time.perf_counter()
        # Gate the interrupt on `running`: a Timer that fires in the
        # gap between fetchall returning and timer.cancel() would
        # otherwise leave a pending interrupt on the shared connection
        # that aborts the NEXT oracle at ~0s (r13 ADVICE).
        running = threading.Event()
        running.set()

        def _interrupt() -> None:
            if running.is_set():
                con.interrupt()

        timer = threading.Timer(ORACLE_TIMEOUT, _interrupt)
        timer.start()
        try:
            ores = con.sql(oracles[name])
            orows = [tuple(r) for r in ores.fetchall()]
            ocols, otypes_raw = list(ores.columns), [str(t) for t in ores.types]
        except Exception as e:
            row["err"] = (
                "oracle_timeout"
                if "interrupt" in type(e).__name__.lower()
                else f"oracle: {type(e).__name__}: {e}"[:400]
            )
            row["oracle_sec"] = round(time.perf_counter() - t0, 2)
            results[name] = row
            print(f"  {name}: {row['err']} after {row['oracle_sec']}s "
                  f"(spark side: {len(srows)} rows, {row['spark_sec']}s)")
            continue
        finally:
            running.clear()
            timer.cancel()
        row["oracle_sec"] = round(time.perf_counter() - t0, 2)
        row["oracle_rows"] = len(orows)
        stypes = {c: type_family(t) for c, t in sdf.dtypes}
        otypes = {c: type_family(t) for c, t in zip(ocols, otypes_raw)}
        type_diff = {
            c: (stypes.get(c), otypes.get(c))
            for c in set(stypes) | set(otypes)
            if stypes.get(c) != otypes.get(c)
        }
        row["rows_match"] = len(srows) == len(orows)
        row["schema_match"] = sorted(sdf.columns) == sorted(ocols) and not type_diff
        row["hash_match"] = value_hash(sdf.columns, srows) == value_hash(ocols, orows)
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        results[name] = row
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows, "
              f"spark {row['spark_sec']}s, oracle {row['oracle_sec']}s)")
    canary_post = control_canary_sec(spark, "/root/testdata/sf0.1")

    art = load_artifact(ARTIFACT)
    art.setdefault("sf_dir", sf)
    art["queries"].update(results)
    session = {
        "ran": sorted(results),
        "control_sec_pre": canary_pre,
        "control_sec_post": canary_post,
        **classify_band(canary_pre, canary_post),
    }
    art["sessions"].append(session)
    done = art["queries"]
    art["n_pass"] = sum(
        1 for r in done.values()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    )
    art["n_rows_only"] = sum(1 for r in done.values() if r.get("oracle") == "rows-only")
    art["n_err"] = sum(1 for r in done.values() if r.get("err"))
    art["n_total"] = len(done)
    with open(ARTIFACT, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(json.dumps({k: art[k] for k in ("n_pass", "n_rows_only", "n_err", "n_total")}
                     | {"band": session["band"]}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
