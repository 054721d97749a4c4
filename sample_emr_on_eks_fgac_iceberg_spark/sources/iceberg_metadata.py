"""Spec-shaped Iceberg v2 ``metadata.json`` mirror (SURVEY.md §2 E2).

The engine's commit path keeps its own manifest log (warehouse.py
``TableMeta`` — the semantic source of truth this sandbox can test).
This module closes the on-disk interop waiver (COVERAGE.md): every
metadata write emits a table-metadata file chain shaped per the
Apache Iceberg table-spec v2 — ``<table>/metadata/vN.metadata.json``
plus the ``version-hint.text`` a HadoopCatalog reader uses to find the
current version — so a future jar-equipped deployment can adopt the
warehouse layout. Snapshot ids, sequence numbers and timestamps match
the engine's history one-for-one, and since round 7 each commit also
writes REAL avro manifest lists / manifests at the recorded paths
(sources/iceberg_manifests.py, via the pure-Python spec-conformant
writer in sources/avro_io.py — cross-validated against the official
Apache Avro Java reader on Spark's classpath).

Reference parity: the file tree mirrors what the reference's cleanup
logs show for its Athena-created Iceberg tables
(producer_account_setup/logs/producer_cleanup_logs.txt:33-51 —
``metadata/00000-….metadata.json`` + ``snap-*.avro`` under the table
location).
"""

from __future__ import annotations

import json
import os
import time
import uuid as _uuid

# Spark simpleString / StructType-JSON primitive → Iceberg type name
_PRIMITIVES = {
    "long": "long",
    "bigint": "long",
    "integer": "int",
    "int": "int",
    "short": "int",
    "byte": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",  # Spark TIMESTAMP has session-tz semantics
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


class _IdAlloc:
    def __init__(self) -> None:
        self.last = 0

    def next(self) -> int:
        self.last += 1
        return self.last


def _iceberg_type(t, ids: _IdAlloc):
    """Spark StructType-JSON type node → Iceberg schema type node with
    freshly-allocated field ids (DFS order, top-level first)."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if t.startswith("decimal"):
            return t  # decimal(p,s) spells identically
        if t.startswith("varchar") or t.startswith("char"):
            return "string"
        return "string"  # conservative fallback keeps the chain valid
    kind = t.get("type")
    if kind == "struct":
        return {
            "type": "struct",
            "fields": [_schema_field(f, ids) for f in t.get("fields", [])],
        }
    if kind == "array":
        eid = ids.next()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(t["elementType"], ids),
            "element-required": not t.get("containsNull", True),
        }
    if kind == "map":
        kid, vid = ids.next(), ids.next()
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(t["keyType"], ids),
            "value-id": vid,
            "value": _iceberg_type(t["valueType"], ids),
            "value-required": not t.get("valueContainsNull", True),
        }
    if kind == "udt":
        return "binary"
    raise ValueError(f"unmappable Spark type node: {t!r}")


def _schema_field(f: dict, ids: _IdAlloc) -> dict:
    fid = ids.next()
    return {
        "id": fid,
        "name": f["name"],
        "required": not f.get("nullable", True),
        "type": _iceberg_type(f["type"], ids),
    }


_TRANSFORM_NAMES = {
    "identity": "identity",
    "year": "year",
    "month": "month",
    "day": "day",
    "hour": "hour",
}

# engine snapshot operation → the spec's summary-operation enum
_OPERATIONS = {
    "append": "append",
    "publish": "append",
    "overwrite": "overwrite",
    "delete": "delete",
    "replace": "replace",
    "rewrite": "replace",
    "compact": "replace",
    "expire": "replace",
}


def field_name_history(renames, fields) -> list[tuple[int, list[str]]]:
    """[(field id, [oldest name, …, current name])] for top-level
    fields, reconstructed from the engine's rename log — the input to
    the spec's name mapping, and to any path that must resolve a name
    recorded BEFORE later renames (e.g. equality-delete key columns)."""
    hist = {f["name"]: [f["name"]] for f in fields}
    for old, new in reversed(renames or []):
        for names in hist.values():
            if names[0] == new:
                names.insert(0, old)
    return [(f["id"], hist[f["name"]]) for f in fields]


def build_table_metadata(meta, table_root: str) -> dict:
    """The Iceberg v2 table-metadata document for one engine
    ``TableMeta`` state. Pure function of (meta, location) so tests can
    validate the field set without touching disk."""
    schema_fields = json.loads(meta.schema_json).get("fields", [])
    ids = _IdAlloc()
    fields = [_schema_field(f, ids) for f in schema_fields]
    by_name = {f["name"]: f["id"] for f in fields}

    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
        parse_partition_spec,
    )

    pfid = 999
    spec_fields = []
    for pf in parse_partition_spec(meta.partition_by):
        pfid += 1
        if pf.kind in _TRANSFORM_NAMES:
            transform = _TRANSFORM_NAMES[pf.kind]
        elif pf.kind == "bucket":
            transform = f"bucket[{pf.param}]"
        elif pf.kind == "truncate":
            transform = f"truncate[{pf.param}]"
        else:  # pragma: no cover — parse_partition_spec rejects others
            transform = "void"
        spec_fields.append(
            {
                "source-id": by_name.get(pf.source, -1),
                "field-id": pfid,
                "name": pf.name,
                "transform": transform,
            }
        )

    snapshots = []
    snapshot_log = []
    for s in meta.snapshots:
        sid = s["snapshot_id"]
        summary = {
            "operation": _OPERATIONS.get(s.get("operation"), "overwrite"),
            "engine-operation": str(s.get("operation")),
            "added-data-files": str(len(s.get("added_files", []))),
            "removed-data-files": str(len(s.get("removed_files", []))),
            "added-records": str(s.get("added_records", 0)),
        }
        # partition summaries (spec: changed-partition-count plus
        # `partitions.<dir>` record counts, the fields a planner uses
        # to size a partition without opening manifests). The changed
        # set derives from the directory-encoded file paths every
        # snapshot already stores; per-partition added-record counts
        # come from the commit-time footer pass (snapshots written
        # before that key was recorded just omit them).
        changed = {
            os.path.dirname(f)
            for f in list(s.get("added_files", []))
            + list(s.get("removed_files", []))
        }
        if changed:
            summary["changed-partition-count"] = str(len(changed))
        for part, n in sorted(
            (s.get("partition_added_records") or {}).items()
        ):
            if part:
                summary[f"partitions.{part}"] = f"added-records={n}"
        entry = {
            "snapshot-id": sid,
            "sequence-number": s["sequence_number"],
            "timestamp-ms": s["timestamp_ms"],
            "schema-id": 0,
            # written for the current snapshot on every commit by
            # sources/iceberg_manifests.py (reference layout:
            # snap-<id>-….avro, producer_cleanup_logs.txt:36)
            "manifest-list": os.path.join(
                table_root, "metadata", f"snap-{sid}.avro"
            ),
            "summary": summary,
        }
        snapshots.append(entry)
        if not s.get("staged"):
            snapshot_log.append(
                {"timestamp-ms": s["timestamp_ms"], "snapshot-id": sid}
            )

    # schema.name-mapping.default (spec: "Name Mapping Serialization")
    # — the PUBLIC mechanism for resolving files that carry no parquet
    # field ids: every historical name of a field maps to its field id,
    # so files written before a RENAME COLUMN still resolve. The engine
    # writes parquet by column name, which is exactly the case name
    # mapping exists for.
    name_mapping = None
    if getattr(meta, "renames", None):
        name_mapping = [
            {"field-id": fid, "names": names}
            for fid, names in field_name_history(meta.renames, fields)
        ]

    current = snapshot_log[-1]["snapshot-id"] if snapshot_log else -1
    last_ms = (
        meta.snapshots[-1]["timestamp_ms"]
        if meta.snapshots
        else int(time.time() * 1000)
    )
    refs = {
        name: {
            "snapshot-id": r["snapshot_id"],
            "type": str(r.get("type", "tag")).lower(),
        }
        for name, r in (meta.refs or {}).items()
    }
    if current != -1:
        refs.setdefault("main", {"snapshot-id": current, "type": "branch"})

    return {
        "format-version": 2,
        "table-uuid": meta.uuid or str(_uuid.uuid4()),
        "location": table_root,
        "last-sequence-number": (
            meta.snapshots[-1]["sequence_number"] if meta.snapshots else 0
        ),
        "last-updated-ms": last_ms,
        "last-column-id": ids.last,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": pfid,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            **meta.properties,
            **(
                {
                    "schema.name-mapping.default": json.dumps(
                        name_mapping, separators=(",", ":")
                    )
                }
                if name_mapping
                else {}
            ),
        },
        "current-snapshot-id": current,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [],  # filled by emit_metadata from the chain
        "refs": refs,
    }


def emit_metadata(meta, table_root: str) -> str | None:
    """Write the next ``vN.metadata.json`` for this table state and
    update ``version-hint.text``. Returns the file path (None for
    resource links — they are catalog entries with no location).
    Failures never propagate: the mirror is an interop artifact, not
    the engine's commit path."""
    if meta.link_to is not None:
        return None
    try:
        # real avro manifest list + manifest(s) for the current
        # snapshot — the path build_table_metadata records in each
        # snapshot's manifest-list field (sources/iceberg_manifests.py).
        # Isolated failure domain: a manifest conversion problem must
        # degrade to "chain without manifests", never take down the
        # metadata.json write with it.
        try:
            from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_manifests import (
                emit_manifests,
            )

            emit_manifests(meta, table_root)
        except Exception as exc:
            # degrade to "chain without manifests", but never silently:
            # a persistent emission bug would otherwise surface only as
            # a bare FileNotFoundError in the spec-route reader
            import warnings

            warnings.warn(
                f"iceberg manifest emission failed for table "
                f"'{getattr(meta, 'name', '?')}' at {table_root}: {exc!r}; "
                f"metadata.json snapshot entries will reference missing "
                f"snap-*.avro files",
                RuntimeWarning,
                stacklevel=2,
            )
        mdir = os.path.join(table_root, "metadata")
        os.makedirs(mdir, exist_ok=True)
        hint = os.path.join(mdir, "version-hint.text")
        prev_version = 0
        metadata_log: list[dict] = []
        if os.path.exists(hint):
            with open(hint) as f:
                prev_version = int(f.read().strip() or 0)
            prev_file = os.path.join(mdir, f"v{prev_version}.metadata.json")
            if os.path.exists(prev_file):
                with open(prev_file) as f:
                    prev_doc = json.load(f)
                # normalize carried entries to the CURRENT metadata dir:
                # rename_table moves the whole table directory, so
                # as-written absolute paths go stale the moment the
                # location changes (round-5 review finding)
                metadata_log = [
                    {
                        "timestamp-ms": e.get("timestamp-ms"),
                        "metadata-file": os.path.join(
                            mdir, os.path.basename(e.get("metadata-file", ""))
                        ),
                    }
                    for e in prev_doc.get("metadata-log", [])
                ]
                metadata_log.append(
                    {
                        "timestamp-ms": prev_doc.get("last-updated-ms"),
                        "metadata-file": prev_file,
                    }
                )
                # the spec's write.metadata.previous-versions-max
                # (default 100): without the cap a long-lived table's
                # every commit rewrites an ever-growing log — quadratic
                # metadata bytes over the table's life
                max_prev = int(
                    meta.properties.get(
                        "write.metadata.previous-versions-max", "100"
                    )
                )
                metadata_log = metadata_log[-max_prev:]
        version = prev_version + 1
        doc = build_table_metadata(meta, table_root)
        doc["metadata-log"] = metadata_log
        path = os.path.join(mdir, f"v{version}.metadata.json")
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        with open(hint, "w") as f:
            f.write(str(version))
        return path
    except Exception:  # pragma: no cover — best-effort mirror
        return None
