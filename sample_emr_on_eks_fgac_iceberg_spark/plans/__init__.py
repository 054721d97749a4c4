from sample_emr_on_eks_fgac_iceberg_spark.plans.explain import (
    executed_plan_str,
    explain_str,
    global_windows,
    pushed_filters,
    uses_broadcast_join,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan_str",
    "explain_str",
    "global_windows",
    "pushed_filters",
    "uses_broadcast_join",
    "wholestage_codegen_spans",
]
