"""Differential harness: every QuerySpec with an oracle must match DuckDB.

Mirrors the driver's correctness gate (row count + schema names +
order-insensitive value comparison), so a query that passes here passes
CORRECTNESS_r{N}.json. Floats compare with a small relative tolerance —
the registered queries already round their double aggregates, so any
larger divergence is a real bug, not float noise.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from datafusion_dft_spark.registry import all_queries

SPECS = list(all_queries().values())
ORACLE_SPECS = [s for s in SPECS if s.oracle]
ROWS_ONLY_SPECS = [s for s in SPECS if not s.oracle]


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (dt.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon_cell(v.item())
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _sort_key(row):
    return tuple("\x00" if c is None else str(c) for c in row)


def _normalize(cols, rows):
    """Sort columns by name (driver behavior), then rows canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [cols[i] for i in order], out


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_matches_duckdb_oracle(spark, duckcon, sf_dir, spec):
    sdf = spec.build(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    ora = duckcon.sql(spec.oracle)
    o_cols = list(ora.columns)
    o_rows = [tuple(r) for r in ora.fetchall()]

    assert sorted(s_cols) == sorted(o_cols), f"column mismatch: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} duckdb={len(o_rows)}"

    _, s_norm = _normalize(s_cols, s_rows)
    _, o_norm = _normalize(o_cols, o_rows)
    mismatches = []
    for i, (sr, orow) in enumerate(zip(s_norm, o_norm)):
        if not all(_cells_equal(a, b) for a, b in zip(sr, orow)):
            mismatches.append((i, sr, orow))
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (first {len(mismatches)}): {mismatches}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_runs(spark, sf_dir, spec):
    sdf = spec.build(spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.columns) > 0
