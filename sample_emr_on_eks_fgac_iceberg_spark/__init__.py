"""PySpark-native analytics engine with the capabilities of
aws-samples/sample-emr-on-eks-fgac-iceberg.

The reference (see /root/reference, SURVEY.md) composes an Iceberg data
lake on S3/Glue, Lake Formation fine-grained access control (row filter
+ column mask), and PySpark jobs on EMR-on-EKS. This package provides
the same query and data-processing capabilities as a self-contained
PySpark library:

- ``session``   — SparkSession factory (AQE, vectorized parquet, Iceberg
                  confs when the runtime jar is on the classpath).
- ``sources``   — partitioned-table warehouse (DDL/DML) + the driver's
                  TPC-H-ish parquet tables.
- ``policy``    — the FGAC layer: grants, data-cells filters, plan-time
                  authorization, secured per-principal sessions.
- ``engine``    — ties warehouse + policy together (`FgacEngine`).
- ``healthcare``— the reference's exact two-table fixture, recreated via
                  the engine's own DDL (golden-test corpus).
- ``operators`` — the relational / dedup / similarity / text-analysis
                  operator surface (SURVEY.md §2).
- ``streaming`` — Structured Streaming operators over the events table.
"""

import os as _os
import sys as _sys

# Spark Python workers unpickle pandas-UDF functions BY MODULE
# REFERENCE (cloudpickle pickles importable-module functions by name),
# so the worker processes must be able to import this package. The
# driver process may have found it via a sys.path insert (the driver
# contract does exactly that) — which workers do NOT inherit. Export
# the package root on PYTHONPATH at import time: the worker daemon
# spawns lazily at the first Python-UDF execution, which is always
# after this import, so the env propagates even to pre-existing
# sessions. Without this, applyInPandas/mapInPandas operators raise
# ModuleNotFoundError whenever the entry script runs from another cwd.
_pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _pkg_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_root + (_os.pathsep + _pp if _pp else "")
    )
if _pkg_root not in _sys.path:
    _sys.path.insert(0, _pkg_root)

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.policy import (
    AccessDeniedException,
    DataCellsFilter,
    PolicyStore,
)
from sample_emr_on_eks_fgac_iceberg_spark.session import build_session

__all__ = [
    "AccessDeniedException",
    "DataCellsFilter",
    "FgacEngine",
    "PolicyStore",
    "build_session",
]

__version__ = "0.1.0"
