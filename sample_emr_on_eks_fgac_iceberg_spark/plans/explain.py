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
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"\*\(\d+\)", executed_plan_str(df)))
