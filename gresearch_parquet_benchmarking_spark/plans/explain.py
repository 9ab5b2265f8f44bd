"""Plan-inspection helpers: the 100-TB design review, automated.

The reference's optimizations are storage-layout tricks applied by hand
(SURVEY.md §4); in Spark they are Catalyst behaviors that can silently
regress (a filter that stops pushing down, a dim join that stops
broadcasting). These helpers read the physical plan so tests can pin
the behaviors the engine's scale posture depends on.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — column-pruning evidence."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the physical plan (AQE may collapse at runtime)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (`*(n)` markers, simple mode).
    Under AQE run an action first so the final plan is inspected."""
    ids = re.findall(r"\*\((\d+)\)", simple_plan(df))
    return len(set(ids))
