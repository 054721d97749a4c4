"""Incremental (CDC-style) reads through the warehouse's snapshot log,
exposed as a driver-checkable query.

The reference's storage layer is Iceberg, whose headline consumer
pattern beyond plain scans is the *incremental append scan*: read only
the rows added between two snapshots, never rescanning the table
(producer_account_setup/logs/producer_cleanup_logs.txt:33-51 shows the
snapshot/manifest tree this walks). `Warehouse.read_changes` implements
that primitive; this module drives it end-to-end — CREATE TABLE, two
INSERT batches (two snapshots), then an incremental read from the
first snapshot — so the correctness artifact records the snapshot
semantics, not just the unit tests.

The fixture is deterministic (fixed rows, fixed batch split), so the
oracle is a plain VALUES table of the second batch.

100 TB posture: read_changes opens only the data files added by the
snapshots in (from, to] — cost scales with the delta, not the table.
This is the batch half of the streaming-tail pattern tested in
tests/test_streaming.py (foreachBatch + last_committed_batch fencing).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register

_BATCH1 = [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)]
_BATCH2 = [(4, "delta", 40), (5, "epsilon", 50)]

_TABLE = "cdc_orders_lite"
_SCHEMA = "id BIGINT, label STRING, qty BIGINT"

# One warehouse per SparkSession, built lazily (same pattern as
# fgac_queries._engine_for): setup is provisioning, the registered
# query measures/checks only the incremental read itself.
_STATE: dict[str, tuple] = {}


def _warehouse_for(spark: SparkSession):
    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse

    key = spark.sparkContext.applicationId
    if key not in _STATE:
        wh = Warehouse(spark, tempfile.mkdtemp(prefix="cdc_wh_"))
        wh.create_table(_TABLE, _SCHEMA)
        wh.insert_values(_TABLE, _BATCH1)
        snap1 = wh.current_snapshot_id(_TABLE)
        wh.insert_values(_TABLE, _BATCH2)
        _STATE[key] = (wh, snap1)
    return _STATE[key]


@register(
    "cdc_incremental_append",
    oracle="""
    SELECT CAST(id AS BIGINT) AS id, label, CAST(qty AS BIGINT) AS qty
    FROM (VALUES (4, 'delta', 40), (5, 'epsilon', 50)) t(id, label, qty)
    """,
)
def cdc_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan: exactly the second batch's rows — the
    file-delta between snapshot 1 and the current snapshot."""
    wh, snap1 = _warehouse_for(spark)
    return wh.read_changes(_TABLE, from_snapshot_id=snap1)
