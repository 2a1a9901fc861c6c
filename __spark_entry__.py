"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``datafusion_dft_spark.registry``: every implemented
operator from SURVEY.md §2 registers a QuerySpec (Spark builder +
DuckDB oracle SQL) there; this module just exposes the registry in the
driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file from any cwd — make the package
# resolvable from the file's own location.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from datafusion_dft_spark.registry import all_queries
from datafusion_dft_spark.session import ensure_runtime_conf

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "q01_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    ensure_runtime_conf(spark)
    spec = all_queries()[_FLAGSHIP]
    return spec.build(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            return spec.build(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle}
