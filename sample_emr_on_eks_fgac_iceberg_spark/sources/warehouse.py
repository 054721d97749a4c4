"""Engine-managed table warehouse: DDL + DML over identity-partitioned
columnar tables.

Implements the reference's storage surface (SURVEY.md §2 D1/D2/M1, §1.3):

- ``CREATE TABLE … PARTITIONED BY (col)``
  (producer_account_setup/producer_iceberg_datalake_setup.sh:116-131,
  169-187) → ``Warehouse.create_table`` with identity partitioning,
- ``INSERT INTO … VALUES`` (:143-157, 197-209) → ``insert_values`` /
  ``insert_into`` (appends a new snapshot),
- ``DROP TABLE`` (producer_clean_up.sh:92-103) → ``drop_table``,
- physical layout: parquet data files under ``<col>=<value>/``
  directories, exactly the layout the reference's cleanup log shows for
  its Iceberg tables (producer_cleanup_logs.txt:31-53), plus a
  versioned JSON metadata file standing in for Iceberg's metadata tree.

When an iceberg-spark runtime jar is on the classpath the same API is
served by Iceberg DDL through ``spark.sql`` (session.py wires the
catalog); this pure-parquet implementation keeps identical logical
semantics — schema-on-write, identity partition pruning, snapshot-ish
append versioning — with zero extra dependencies.

Scale notes: writes fan out per-partition (Spark's dynamic partition
write), reads prune partitions via directory layout + parquet footer
stats; nothing here collects to the driver.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TableNotFoundError(Exception):
    pass


class SchemaMismatchError(Exception):
    pass


class SnapshotNotFoundError(Exception):
    pass


@dataclass
class TableMeta:
    name: str
    schema_json: str
    partition_by: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)
    snapshots: list[dict] = field(default_factory=list)
    link_to: str | None = None  # M2: resource link → target table name

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


class Warehouse:
    """A directory of identity-partitioned parquet tables with schema-on-
    write enforcement and append snapshots."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(self._meta_dir, exist_ok=True)

    # ------------------------------------------------------------- paths
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "_metadata")

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._meta_dir, f"{name}.json")

    def data_dir(self, name: str) -> str:
        return os.path.join(self.root, name, "data")

    # ---------------------------------------------------------- metadata
    def _write_meta(self, meta: TableMeta) -> None:
        with open(self._meta_path(meta.name), "w") as f:
            json.dump(
                {
                    "name": meta.name,
                    "schema_json": meta.schema_json,
                    "partition_by": meta.partition_by,
                    "properties": meta.properties,
                    "snapshots": meta.snapshots,
                    "link_to": meta.link_to,
                },
                f,
                indent=2,
            )

    def _read_meta(self, name: str) -> TableMeta:
        path = self._meta_path(name)
        if not os.path.exists(path):
            raise TableNotFoundError(f"Table '{name}' does not exist")
        with open(path) as f:
            raw = json.load(f)
        return TableMeta(**raw)

    def table_exists(self, name: str) -> bool:
        return os.path.exists(self._meta_path(name))

    def list_tables(self) -> list[str]:
        return sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(self._meta_dir)
            if f.endswith(".json")
        )

    # --------------------------------------------------------------- DDL
    def create_table(
        self,
        name: str,
        schema: T.StructType | str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> TableMeta:
        """D1: CREATE TABLE … PARTITIONED BY (col)."""
        if self.table_exists(name):
            raise ValueError(f"Table '{name}' already exists")
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        partition_by = list(partition_by or [])
        names = [f.name for f in schema.fields]
        for col in partition_by:
            if col not in names:
                raise ValueError(f"Partition column '{col}' not in schema")
        meta = TableMeta(
            name=name,
            schema_json=json.dumps(schema.jsonValue()),
            partition_by=partition_by,
            properties=dict(properties or {"table_type": "PARQUET"}),
        )
        os.makedirs(self.data_dir(name), exist_ok=True)
        self._write_meta(meta)
        return meta

    def create_resource_link(self, link_name: str, target: str) -> TableMeta:
        """M2: resource link — a catalog alias resolving to another
        table, the in-process analog of the reference's cross-account
        Glue resource links ``rl_patients``/``rl_claims``
        (consumer_account_setup/consumer_emr_on_eks_setup.sh:261-287).
        Grants and DataCellsFilters bind to the *link name*, exactly as
        Lake Formation policies bind to the consumer's link."""
        if self.table_exists(link_name):
            raise ValueError(f"Table '{link_name}' already exists")
        target_meta = self._read_meta(target)  # target must exist
        meta = TableMeta(
            name=link_name,
            schema_json=target_meta.schema_json,
            partition_by=list(target_meta.partition_by),
            properties={"table_type": "RESOURCE_LINK"},
            link_to=target,
        )
        self._write_meta(meta)
        return meta

    def drop_table(self, name: str) -> None:
        """M1: DROP TABLE — removes data files and metadata."""
        meta_path = self._meta_path(name)
        if not os.path.exists(meta_path):
            raise TableNotFoundError(f"Table '{name}' does not exist")
        os.remove(meta_path)
        shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    # ---------------------------------------------------------- snapshots
    def _data_files(self, name: str) -> set[str]:
        """Relative paths of every parquet data file currently on disk."""
        data = self.data_dir(name)
        return {
            os.path.relpath(os.path.join(dirpath, fn), data)
            for dirpath, _, fns in os.walk(data)
            for fn in fns
            if fn.endswith(".parquet")
        }

    def snapshots(self, name: str) -> list[dict]:
        """Snapshot log, oldest first — the engine's analog of Iceberg's
        metadata tree (reference cleanup log shows snap-*.avro manifests,
        producer_account_setup/logs/producer_cleanup_logs.txt:33-51).
        Each entry: snapshot_id, timestamp_ms, operation, added_files,
        sequence_number."""
        return list(self._read_meta(name).snapshots)

    def current_snapshot_id(self, name: str) -> int | None:
        snaps = self._read_meta(name).snapshots
        return snaps[-1]["snapshot_id"] if snaps else None

    def _commit_snapshot(self, meta: TableMeta, operation: str, added: set[str]) -> None:
        """Optimistic commit: re-read the on-disk metadata so a
        concurrent committer's snapshots are not clobbered, then append
        ours with the next sequence number (Iceberg's
        commit-by-swapping-metadata, linearized per table)."""
        if os.path.exists(self._meta_path(meta.name)):
            meta = self._read_meta(meta.name)
        seq = meta.snapshots[-1]["sequence_number"] + 1 if meta.snapshots else 1
        meta.snapshots.append(
            {
                "snapshot_id": seq,
                "sequence_number": seq,
                "timestamp_ms": int(time.time() * 1000),
                "operation": operation,
                "added_files": sorted(added),
            }
        )
        self._write_meta(meta)

    # --------------------------------------------------------------- DML
    def insert_into(self, name: str, df: DataFrame) -> None:
        """D2: INSERT INTO — schema-on-write append, partition fan-out.
        Every append commits a new snapshot whose manifest lists the
        files it added, enabling read-at-snapshot / time travel."""
        meta = self._read_meta(name)
        schema = meta.schema
        missing = [f.name for f in schema.fields if f.name not in df.columns]
        if missing:
            raise SchemaMismatchError(f"Insert into '{name}' missing columns {missing}")
        # enforce declared types (schema-on-write), preserve column order
        aligned = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        before = self._data_files(name)
        writer = aligned.write.mode("append")
        if meta.partition_by:
            writer = writer.partitionBy(*meta.partition_by)
        writer.parquet(self.data_dir(name))
        self._commit_snapshot(meta, "append", self._data_files(name) - before)

    def insert_values(self, name: str, rows: list[tuple]) -> None:
        """D2 literal form: INSERT INTO t VALUES (…), (…)."""
        meta = self._read_meta(name)
        df = self.spark.createDataFrame(rows, schema=meta.schema)
        self.insert_into(name, df)

    # -------------------------------------------------------------- scan
    def read_table(
        self,
        name: str,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
    ) -> DataFrame:
        """S1: cataloged scan. Partition columns come back from the
        directory layout (basePath keeps them in the schema); declared
        types are re-asserted so DATE/DECIMAL survive the round-trip.

        ``snapshot_id`` reads the table as of that snapshot (the union
        of every manifest up to and including it — appends are
        cumulative), mirroring Iceberg's ``VERSION AS OF``;
        ``as_of_timestamp_ms`` picks the last snapshot committed at or
        before that time (``TIMESTAMP AS OF``)."""
        meta = self._read_meta(name)
        if meta.link_to is not None:
            return self.read_table(
                meta.link_to,
                snapshot_id=snapshot_id,
                as_of_timestamp_ms=as_of_timestamp_ms,
            )
        if snapshot_id is not None and as_of_timestamp_ms is not None:
            raise ValueError("pass snapshot_id or as_of_timestamp_ms, not both")
        data = self.data_dir(name)
        if as_of_timestamp_ms is not None:
            eligible = [
                s["snapshot_id"]
                for s in meta.snapshots
                if s["timestamp_ms"] <= as_of_timestamp_ms
            ]
            if not eligible:
                return self.spark.createDataFrame([], meta.schema)
            snapshot_id = eligible[-1]
        if snapshot_id is not None:
            known = {s["snapshot_id"] for s in meta.snapshots}
            if snapshot_id not in known:
                raise SnapshotNotFoundError(
                    f"Table '{name}' has no snapshot {snapshot_id} (known: {sorted(known)})"
                )
            files = [
                os.path.join(data, f)
                for s in meta.snapshots
                if s["snapshot_id"] <= snapshot_id
                for f in s["added_files"]
            ]
            if not files:
                return self.spark.createDataFrame([], meta.schema)
            df = self.spark.read.option("basePath", data).parquet(*files)
        else:
            has_files = any(
                fn.endswith(".parquet") for _, _, fns in os.walk(data) for fn in fns
            )
            if not has_files:
                return self.spark.createDataFrame([], meta.schema)
            df = self.spark.read.option("basePath", data).parquet(data)
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in meta.schema.fields]
        )

    def schema_of(self, name: str) -> T.StructType:
        return self._read_meta(name).schema

    def partition_spec(self, name: str) -> list[str]:
        return self._read_meta(name).partition_by
