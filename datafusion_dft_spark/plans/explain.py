"""Physical-plan introspection helpers.

Reference analog: dft's ``stats.rs`` walks the executed plan to
classify operators and harvest metrics (stats.rs:677-736). Here the
formatted explain string is the substrate; tests assert the plan
*shape* (broadcasts chosen, filters pushed into the parquet scan,
columns pruned, codegen active) so a regression in plan quality fails
CI, not just a benchmark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Explain string after execution — AQE's finalized plan with
    whole-stage-codegen ids rendered as ``*(n)`` prefixes."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    return qe.explainString(mode)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in (p := formatted_plan(df)) or "BroadcastNestedLoopJoin" in p


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a scan (empty ones excluded)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))]


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    return [
        [c.split(":")[0].strip() for c in schema.split(",") if c.strip()]
        for schema in read_schemas(df)
    ]


def has_partial_aggregation(df: DataFrame) -> bool:
    """Partial (map-side) + final HashAggregate pairs present."""
    return formatted_plan(df).count("HashAggregate") >= 2


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (lower = fewer full-data shuffles)."""
    return len(re.findall(r"\bExchange\b|\bAQEShuffleRead\b", simple_plan(df)))


_PY_EVAL_NODES = (
    "ArrowEvalPython|BatchEvalPython|MapInArrow|PythonMapInArrow|MapInPandas|"
    "FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|AggregateInPandas"
)


def python_eval_node_ids(df: DataFrame) -> set[int]:
    """Distinct operator ids of Python-eval nodes in the formatted plan.

    The formatted explain re-prints a cached/reused subtree at EVERY
    consumer (an InMemoryRelation's child plan appears once per
    InMemoryTableScan), so the raw PRINT count of Python nodes
    overstates execution; operator ids are assigned per physical
    instance, so counting DISTINCT ids counts distinct Python stages
    (r14 VERDICT item 6)."""
    plan = formatted_plan(df)
    return {
        int(m.group(2))
        for m in re.finditer(rf"({_PY_EVAL_NODES})\s*\((\d+)\)", plan)
    }
