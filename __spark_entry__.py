"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the engine's operator surface (SURVEY.md §2)
for the DuckDB-oracle correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's FGAC-filtered claims⋈patients join
    (consumer_emr_on_eks_setup.sh:412) run through the engine's policy
    layer, preceded by a pricing-summary scan over the sf0.001 lake to
    exercise the parquet path."""
    QUERIES["q1_pricing_summary"](spark, SF_SMOKE_DIR).collect()
    return QUERIES["fgac_claims_join"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    missing here (approx sketches, streaming-stateful) get the driver's
    rows-only check."""
    return dict(ORACLE)
