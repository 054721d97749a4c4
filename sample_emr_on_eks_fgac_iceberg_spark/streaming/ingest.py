"""Exactly-once streaming ingestion into the governed warehouse.

The production landing pattern for the reference's architecture: a
Structured Streaming query whose sink is an engine-managed (Iceberg-
semantics) table, so the stream lands in a partitioned, snapshot-
versioned, FGAC-governed table that SecureSessions can immediately
query and incremental consumers can tail via ``read_changes``.

Exactly-once: Spark's foreachBatch is at-least-once under failure —
the same (epoch) batch can be redelivered after a restart. The sink
keys each commit with ``txn=(source_id, batch_id)``; the warehouse
skips any batch at or below the source's committed watermark
(``Warehouse.last_committed_batch``), which is Iceberg's / Delta's
txn-id idempotence pattern, so replayed micro-batches commit no
duplicate rows. Commit planning is metadata-only; the data path is the
ordinary partition-fan-out append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


def warehouse_sink(wh: Warehouse, table: str, source_id: str):
    """A foreachBatch callable committing each micro-batch into
    ``table`` idempotently. Reusable directly:

        stream.writeStream.foreachBatch(warehouse_sink(wh, "t", "job1"))
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Warehouse commits are keyed on the caller-scoped source_id, so
        # several independent streams can land in one table without
        # fencing each other.
        Warehouse(batch_df.sparkSession, wh.root).insert_into(
            table, batch_df, txn=(source_id, batch_id)
        )

    return sink


def stream_into_warehouse(
    stream: DataFrame,
    wh: Warehouse,
    table: str,
    source_id: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and for availableNow drain) a streaming write into a
    warehouse table. Returns the StreamingQuery."""
    writer = (
        stream.writeStream.foreachBatch(warehouse_sink(wh, table, source_id))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
