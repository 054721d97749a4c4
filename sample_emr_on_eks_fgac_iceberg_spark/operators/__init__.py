"""Operator surface (SURVEY.md §2). Each module registers query
callables `(spark, sf_dir) -> DataFrame` plus a matching DuckDB oracle
SQL string (where SQL-expressible) into QUERIES / ORACLE."""

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import ORACLE, QUERIES

# importing the modules populates the registries
from sample_emr_on_eks_fgac_iceberg_spark.operators import (  # noqa: E402,F401
    relational,
    temporal,
    fgac_queries,
    text,
    udfs,
    dedup,
    similarity,
    multimodal,
    curation,
    incremental,
    graph,
    spj,
    sql_surface,
    nonparam,
)
from sample_emr_on_eks_fgac_iceberg_spark.streaming import events as _streaming_events  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE"]
