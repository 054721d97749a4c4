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


def upsert_sink(
    wh: Warehouse,
    table: str,
    source_id: str,
    on: str,
    keys: list[str],
    order_by: str | None = None,
):
    """A foreachBatch callable applying each micro-batch as an
    idempotent UPSERT (CDC apply): MERGE INTO with update-all-columns
    on match and insert-by-name otherwise, fenced by
    ``txn=(source_id, batch_id)`` so a replayed batch is a no-op. With
    the table's ``write.merge.mode=merge-on-read`` each batch costs one
    positional delete file + one appended data file — the streaming
    upsert shape that keeps up at changelog rates (CoW would rewrite
    every file containing a matched key, every batch).

    A micro-batch may carry several versions of one key (the merge
    cardinality rule rejects that). With ``order_by`` (a version /
    event-time column that totally orders rows within a key) the sink
    deterministically applies the LAST version per key — the CDC
    last-writer-wins contract. WITHOUT ``order_by`` the batch is
    reduced with ``dropDuplicates(keys)``, which keeps an ARBITRARY
    row per key — only safe when the upstream guarantees at most one
    version per key per batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if order_by is not None:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
            b = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            b = batch_df.dropDuplicates(keys)
        Warehouse(batch_df.sparkSession, wh.root).merge_into(
            table,
            b,
            on,
            matched_update={c: f"s.{c}" for c in b.columns},
            not_matched_insert=True,
            txn=(source_id, batch_id),
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


class ChangelogRewriteError(RuntimeError):
    """The polled snapshot range contains a rewrite commit (overwrite /
    update / merge) whose added files may hold rows an appends-only
    tail would otherwise never emit. Carries the offending
    ``(snapshot_id, operation)`` pairs as ``.snapshots``."""

    def __init__(self, table: str, snapshots: list[tuple[int, str]]):
        self.snapshots = snapshots
        ops = ", ".join(f"{sid}:{op}" for sid, op in snapshots)
        super().__init__(
            f"Changelog range on '{table}' contains rewrite commits "
            f"[{ops}] — an appends-only tail cannot represent them. "
            "Reprocess the table, or construct ChangelogTail("
            "on_rewrite='skip') to acknowledge past them explicitly."
        )


class ChangelogTail:
    """Incremental consumer of a warehouse table's snapshot log — the
    read side of the CDC loop (`read_changes` is the primitive; this
    adds the durable consumer checkpoint).

    Each `poll()` returns the rows APPENDED strictly after the
    consumer's last acknowledged snapshot, up to the current head, and
    `ack()` advances the checkpoint — the classic at-least-once tail
    with consumer-managed offsets (Iceberg's incremental read +
    Kafka-style offset commit). A crashed consumer re-created with the
    same checkpoint path resumes from its last ack, never reprocessing
    acknowledged snapshots and never skipping unacknowledged ones.

    Appends-only contract (Iceberg incremental-append-scan semantics):
    the delta contains rows from ``append`` (and WAP ``publish``)
    commits. Commits that add no new logical rows — compaction
    (``replace``), ``truncate``, ``rollback``, copy-on-write
    ``delete`` — are skipped silently: their added files only carry
    rows an earlier append already emitted. Commits that CAN introduce
    rows an appends-only tail would lose — ``overwrite``, ``update``,
    ``merge`` — make ``poll()`` raise :class:`ChangelogRewriteError`
    by default (mirroring Iceberg, which fails incremental scans over
    overwrite snapshots); pass ``on_rewrite='skip'`` to acknowledge
    past them knowingly.

    100 TB posture: cost per poll is the file delta between two
    snapshots (manifest-planned, no table rescan), and the checkpoint
    is one integer — nothing scales with table size.
    """

    # added files carry only rows already emitted by an earlier append
    _NO_NEW_ROWS = {"append", "publish", "replace", "truncate", "rollback", "delete"}

    def __init__(
        self,
        wh: Warehouse,
        table: str,
        checkpoint_path: str,
        on_rewrite: str = "error",
        mode: str = "append",
    ):
        import json
        import os

        if on_rewrite not in ("error", "skip"):
            raise ValueError("on_rewrite must be 'error' or 'skip'")
        if mode not in ("append", "cdc"):
            raise ValueError("mode must be 'append' or 'cdc'")
        self.wh = wh
        self.table = table
        self.checkpoint_path = checkpoint_path
        self.on_rewrite = on_rewrite
        # mode='cdc': poll() returns the row-accurate changelog frame
        # (_change_type insert/delete) via read_changes(mode='cdc') —
        # rewrite commits are fully representable, so poll never raises
        # ChangelogRewriteError in this mode
        self.mode = mode
        self._json = json
        self._os = os
        self._pending: int | None = None

    def _committed(self) -> int | None:
        if not self._os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path) as f:
            return self._json.load(f)["snapshot_id"]

    def poll(self) -> tuple[DataFrame, int | None]:
        """(delta frame, head snapshot id to ack). The frame is empty
        and head is None when there is nothing new."""
        head = self.wh.current_snapshot_id(self.table)
        last = self._committed()
        if head is None or head == last:
            meta = self.wh._resolve_dml_target(self.table)
            empty_schema = (
                self.wh._cdc_schema(meta)
                if self.mode == "cdc"
                else self.wh.schema_of(self.table)
            )
            return (self.wh.spark.createDataFrame([], empty_schema), None)
        if self.on_rewrite == "error" and self.mode != "cdc":
            rewrites = [
                (s["snapshot_id"], s["operation"])
                for s in self.wh.snapshots(self.table)
                if (last or 0) < s["snapshot_id"] <= head
                and not s.get("staged")
                and s["operation"] not in self._NO_NEW_ROWS
            ]
            if rewrites:
                raise ChangelogRewriteError(self.table, rewrites)
        df = self.wh.read_changes(
            self.table, from_snapshot_id=last, to_snapshot_id=head, mode=self.mode
        )
        self._pending = head
        return df, head

    def ack(self, snapshot_id: int) -> None:
        """Durably advance the checkpoint to ``snapshot_id``. Call
        after the polled delta has been fully processed."""
        tmp = f"{self.checkpoint_path}.tmp"
        with open(tmp, "w") as f:
            self._json.dump({"snapshot_id": snapshot_id}, f)
        self._os.replace(tmp, self.checkpoint_path)  # atomic
        self._pending = None


def apply_changelog(wh, table: str, changes: DataFrame, keys: list[str], txn=None):
    """Apply a ``read_changes(mode='cdc')`` frame to a replica table —
    the full replication loop (upsert producer → changelog consumer →
    replica): reduce the frame to the LAST change per key (ordinal
    order; within an update's delete+insert pair the insert is the
    post-image), then ONE multi-clause MERGE applies it — matched
    deletes drop, matched inserts update, unmatched inserts insert.

    Pass ``txn=(source_id, batch_id)`` to make the apply idempotent
    under at-least-once delivery (a replayed poll is a no-op commit).

    100 TB posture: one window over the change delta (not the table)
    plus one MERGE; with the replica in merge-on-read mode each apply
    costs a positional delete file + an append, nothing rewritten."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    meta_cols = {"_change_type", "_change_ordinal", "_commit_snapshot_id"}
    data_cols = [c for c in changes.columns if c not in meta_cols]
    # POST-image-wins priority, not lexicographic order: a
    # compute_updates frame carries update_before/update_after, and
    # 'update_before' sorts ABOVE 'update_after' lexicographically —
    # the pre-image would win and the replica would regress to stale
    # values (ADVICE r9). Priority also normalizes the clauses below:
    # update_after applies as an update, update_before is inert.
    post_image = F.col("_change_type").isin("insert", "update_after")
    w = Window.partitionBy(*keys).orderBy(
        F.col("_change_ordinal").desc(),
        F.when(post_image, F.lit(1)).otherwise(F.lit(0)).desc(),
    )
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # a pre-image can only win the window if its update_after twin
        # is missing (a malformed slice); applying it would regress the
        # replica — drop it as inert rather than guess
        .filter(F.col("_change_type") != F.lit("update_before"))
    )
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return wh.merge_into(
        table,
        last,
        on,
        matched_clauses=[
            {"action": "delete", "condition": "s._change_type = 'delete'"},
            {
                "action": "update",
                "set": {c: f"s.{c}" for c in data_cols},
                "condition": None,
            },
        ],
        not_matched_clauses=[
            {
                "condition": "s._change_type IN ('insert', 'update_after')",
                "values": {c: f"s.{c}" for c in data_cols},
            }
        ],
        not_matched_insert=None,
        txn=txn,
    )


def maintain_rollup(
    wh,
    rollup_table: str,
    changes: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    txn=None,
):
    """Fold one ``read_changes(mode='cdc')`` frame into a STORED
    rollup table — streaming incremental materialized-view
    maintenance (the continuous counterpart of the
    ``cdc_incremental_agg_maintenance`` query; pair with
    :class:`ChangelogTail(mode='cdc')` for the tail-ack loop).

    Contract: the rollup table's schema is ``group_keys + n_rows
    BIGINT + sum_<col> BIGINT per sum column``, initialized from a
    base-snapshot aggregate (or empty for a fresh source). Each frame
    reduces to one signed delta row per touched group (insert /
    update_after rows count +1/+value, delete / update_before −1/−v),
    then ONE multi-clause MERGE applies it: a group whose count hits
    zero is deleted, an existing group is adjusted, a new group
    inserts. Pass ``txn=(source_id, batch_id)`` so a replayed poll is
    a no-op commit (exactly-once under at-least-once delivery).

    100 TB posture: the aggregation runs over the change DELTA
    (manifest-planned files, map-side partial sums), the MERGE touches
    only rollup files containing affected groups — refresh cost scales
    with the commit's changes, never the source table or the full
    rollup."""
    from pyspark.sql import functions as F

    sign = F.when(
        F.col("_change_type").isin("insert", "update_after"), F.lit(1)
    ).otherwise(F.lit(-1))
    aggs = [F.sum(sign).cast("bigint").alias("d_rows")] + [
        F.sum(sign * F.col(c)).cast("bigint").alias(f"d_{c}") for c in sum_cols
    ]
    nonzero = F.col("d_rows") != 0
    for c in sum_cols:
        nonzero = nonzero | (F.col(f"d_{c}") != 0)
    delta = changes.groupBy(*group_keys).agg(*aggs).filter(nonzero)
    on = " AND ".join(f"t.{k} = s.{k}" for k in group_keys)
    update_set = {"n_rows": "t.n_rows + s.d_rows"}
    insert_vals = {k: f"s.{k}" for k in group_keys}
    insert_vals["n_rows"] = "s.d_rows"
    for c in sum_cols:
        update_set[f"sum_{c}"] = f"t.sum_{c} + s.d_{c}"
        insert_vals[f"sum_{c}"] = f"s.d_{c}"
    return wh.merge_into(
        rollup_table,
        delta,
        on,
        matched_clauses=[
            {"action": "delete", "condition": "t.n_rows + s.d_rows = 0"},
            {"action": "update", "set": update_set, "condition": None},
        ],
        not_matched_clauses=[
            {"condition": "s.d_rows > 0", "values": insert_vals}
        ],
        not_matched_insert=None,
        txn=txn,
    )
