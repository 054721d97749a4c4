"""Physical-plan inspection helpers — the engine's scale-audit surface.

Used by tests to assert the 100 TB posture holds structurally:
filters pushed to the parquet scan, dims broadcast, expressions inside
whole-stage codegen (SURVEY.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string instead of stdout."""
    sc = df.sparkSession.sparkContext
    mode_obj = sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(mode_obj)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists from every scan node in the plan."""
    text = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def executed_plan_str(df: DataFrame) -> str:
    """Execute the frame and return the final (post-AQE) physical plan —
    the only place codegen stages and runtime join selections are
    visible when adaptive execution is on."""
    # a noop write would execute a *different* QueryExecution; collect
    # drives this frame's own, flipping AQE to isFinalPlan=true
    df.collect()  # scale-ok: bench/explain helper, not a query path
    return df._jdf.queryExecution().executedPlan().toString()


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"\*\(\d+\)", executed_plan_str(df)))


def _subtree_has_limit(node) -> bool:
    stack = [node]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit"):
            return True
        children = n.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False


def global_windows(df: DataFrame) -> list[tuple[str, bool]]:
    """Every Window node in the optimized logical plan whose
    partitionSpec is EMPTY — the shape Spark executes as an exchange
    to ONE partition plus a full sort there — as (node description,
    input_is_limit_bounded).

    A global window is only scale-safe when its input subtree contains
    a Limit (a rank-the-top-K over a TakeOrderedAndProject result);
    anything else is a data-sized single-partition sort that never
    finishes at 100 TB. Lineage cut by localCheckpoint is invisible
    here (LogicalRDD leaf) — frames built eagerly inside an operator
    must keep their own plan audits."""
    plan = df._jdf.queryExecution().optimizedPlan()
    found = []
    stack = [plan]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() in ("Window", "WindowGroupLimit")
            and node.partitionSpec().isEmpty()
        ):
            found.append((node.simpleString(120), _subtree_has_limit(node)))
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return found
