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


def _java_identity(node) -> tuple[str, int]:
    """JVM (class name, identityHashCode) for a py4j plan-node proxy.
    NOT node.id(): QueryStageExec overrides id with a per-query stage
    counter, so ids collide across an outer plan and a cached
    relation's inner plan — the collision silently pruned entire
    cached subtrees from the walk (r7 lesson, pinned by
    test_executed_shuffle_bytes). identityHashCode alone is a 32-bit
    hash two live objects can share; pairing it with the class name
    makes an accidental collision (and the silent subtree prune it
    would cause) effectively impossible (r7 advice)."""
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm  # type: ignore[attr-defined]
    return (
        node.getClass().getName(),
        jvm.java.lang.System.identityHashCode(node),
    )


def _walk_executed(node, seen: set):
    """Depth-first walk over an executed physical plan, following plain
    children plus AQE containers (AdaptiveSparkPlanExec.executedPlan,
    QueryStageExec.plan) and InMemoryTableScan's cached build plan (a
    persist boundary otherwise hides every shuffle below it). Dedups by
    JVM object identity, so a subtree shared by several consumers (a
    reused exchange, a cached relation scanned twice) counts its
    shuffles exactly once."""
    nid = _java_identity(node)
    if nid in seen:
        return
    seen.add(nid)
    yield node
    kids = node.children()
    for i in range(kids.size()):
        yield from _walk_executed(kids.apply(i), seen)
    for attr in ("executedPlan", "plan"):
        if hasattr(node, attr):
            try:
                yield from _walk_executed(getattr(node, attr)(), seen)
            except Exception:  # noqa: BLE001 — not every node has the accessor
                pass
    if hasattr(node, "relation"):
        try:
            yield from _walk_executed(node.relation().cachedPlan(), seen)
        except Exception:  # noqa: BLE001 — only InMemoryTableScan has this shape
            pass


def _walk_outside_caches(node, seen: set):
    """Like _walk_executed, but does NOT descend into
    InMemoryTableScan's cached build plan — yields only the nodes that
    execute OUTSIDE every persist boundary."""
    nid = _java_identity(node)
    if nid in seen:
        return
    seen.add(nid)
    yield node
    kids = node.children()
    for i in range(kids.size()):
        yield from _walk_outside_caches(kids.apply(i), seen)
    for attr in ("executedPlan", "plan"):
        if hasattr(node, attr):
            try:
                yield from _walk_outside_caches(getattr(node, attr)(), seen)
            except Exception:  # noqa: BLE001 — not every node has the accessor
                pass


def expr_nodes_outside_caches(df: DataFrame, needle: str) -> list[str]:
    """One-line descriptions of executed-plan nodes OUTSIDE any cached
    build whose expression text mentions ``needle``. Lets a test pin
    that an expensive expression stayed behind its persist boundary —
    a Catalyst projection collapse that re-inlines it (the winnowing
    56-s lesson) shows up here as the expression in a downstream
    Project. Call after an action so AQE final stages are walked."""
    hits = []
    for node in _walk_outside_caches(
        df._jdf.queryExecution().executedPlan(), set()
    ):
        try:
            # wide field bound: a truncated Project (simpleString(200))
            # can cut off before the needle appears — exactly the
            # wide-projection regression this gate exists to catch —
            # letting the persist-boundary test pass silently
            # (ADVICE r11)
            desc = node.simpleString(1_000_000)
        except Exception:  # noqa: BLE001 — fall back to the node name
            desc = node.nodeName()
        if needle in desc:
            hits.append(desc)
    return hits


def executed_shuffle_bytes(df: DataFrame) -> int:
    """Total `shuffleBytesWritten` across every DISTINCT exchange in the
    final (post-AQE) executed plan. Call AFTER an action (collect) —
    metrics are populated at runtime. ReusedExchange nodes are skipped:
    they share the origin exchange's metric objects and the physical
    shuffle happened once."""
    total = 0
    for node in _walk_executed(df._jdf.queryExecution().executedPlan(), set()):
        if "ReusedExchange" in node.getClass().getSimpleName():
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleBytesWritten":
                total += kv._2().value()
    return total
