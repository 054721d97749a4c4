"""Iceberg v2 manifest-list / manifest emission (closes the last E2
waiver: reference tables ship ``snap-*.avro`` and ``*-m0.avro`` beside
``metadata.json`` — producer_account_setup/logs/
producer_cleanup_logs.txt:33-51).

Every metadata write now also emits, for the CURRENT snapshot:

- ``<table>/metadata/<sid>-m0.avro`` — a data manifest holding the
  complete live data-file set as of that snapshot (entries for files
  added by the snapshot carry status ADDED, carried files EXISTING),
  each with its adding snapshot id / data sequence number and typed
  partition tuple;
- ``<table>/metadata/<sid>-m1.avro`` — an equality-deletes manifest,
  when live delete files exist;
- ``<table>/metadata/snap-<sid>.avro`` — the manifest list referencing
  them, which is exactly the path ``metadata.json``'s snapshot entry
  already records.

Schemas follow the Iceberg table-spec v2 field set with the spec's
field ids attached (``field-id``); files are written by the pure-
Python Avro writer in sources/avro_io.py and are readable by the
official Apache Avro Java reader (cross-validated in
tests/test_iceberg_manifests.py via the avro-1.12.x jar on Spark's
classpath). Writing the full live set per commit is the "rewrite
manifests every commit" strategy — spec-valid and simplest; a
production writer carries unchanged manifest files forward instead
(noted here so the tradeoff is explicit).

Partition values in manifests use the SPEC's transform result types
(day → days since epoch, month → months since 1970-01, hour → hours
since epoch, year → years since 1970), converted from this engine's
human-readable directory encoding.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from urllib.parse import unquote

from sample_emr_on_eks_fgac_iceberg_spark.sources.avro_io import (
    write_container,
)

_EPOCH_D = dt.date(1970, 1, 1)
_EPOCH_TS = dt.datetime(1970, 1, 1)

_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


def _f(fid: int, name: str, ftype, optional: bool = False) -> dict:
    out = {"name": name, "type": ftype, "field-id": fid}
    if optional:
        out["type"] = ["null", ftype]
        out["default"] = None
    return out


_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        _f(509, "contains_null", "boolean"),
        _f(518, "contains_nan", "boolean", optional=True),
        _f(510, "lower_bound", "bytes", optional=True),
        _f(511, "upper_bound", "bytes", optional=True),
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _f(500, "manifest_path", "string"),
        _f(501, "manifest_length", "long"),
        _f(502, "partition_spec_id", "int"),
        _f(517, "content", "int"),
        _f(515, "sequence_number", "long"),
        _f(516, "min_sequence_number", "long"),
        _f(503, "added_snapshot_id", "long"),
        _f(504, "added_files_count", "int"),
        _f(505, "existing_files_count", "int"),
        _f(506, "deleted_files_count", "int"),
        _f(512, "added_rows_count", "long"),
        _f(513, "existing_rows_count", "long"),
        _f(514, "deleted_rows_count", "long"),
        _f(507, "partitions", {"type": "array", "items": _FIELD_SUMMARY}, optional=True),
        _f(519, "key_metadata", "bytes", optional=True),
    ],
}


def _partition_avro_field(pf, src_type: str, fid: int) -> tuple[dict, object]:
    """(avro field, converter) for one partition field: the avro type
    is the SPEC's transform result type; the converter maps this
    engine's directory string to the typed value."""

    def days(v):
        return (dt.date.fromisoformat(v) - _EPOCH_D).days

    def micros(v):
        return int(
            (dt.datetime.fromisoformat(v.replace("T", " ")) - _EPOCH_TS)
            / dt.timedelta(microseconds=1)
        )

    if pf.kind == "identity":
        base = src_type.split("(")[0]
        if base in ("int", "integer", "smallint", "tinyint"):
            return _f(fid, pf.name, "int", optional=True), int
        if base == "bigint":
            return _f(fid, pf.name, "long", optional=True), int
        if base == "date":
            return (
                _f(fid, pf.name, {"type": "int", "logicalType": "date"}, optional=True),
                days,
            )
        if base in ("timestamp", "timestamp_ntz"):
            return (
                _f(
                    fid,
                    pf.name,
                    {"type": "long", "logicalType": "timestamp-micros"},
                    optional=True,
                ),
                micros,
            )
        if base == "boolean":
            return _f(fid, pf.name, "boolean", optional=True), lambda v: v == "true"
        if base == "decimal":
            p, s = src_type.split("(")[1].rstrip(")").split(",")

            def dec(v, _s=int(s)):
                unscaled = int(round(float(v) * 10**_s))
                length = max(1, (unscaled.bit_length() + 8) // 8)
                return unscaled.to_bytes(length, "big", signed=True)

            return (
                _f(
                    fid,
                    pf.name,
                    {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": int(p),
                        "scale": int(s),
                    },
                    optional=True,
                ),
                dec,
            )
        return _f(fid, pf.name, "string", optional=True), str
    if pf.kind == "year":
        return _f(fid, pf.name, "int", optional=True), lambda v: int(v) - 1970
    if pf.kind == "month":
        def months(v):
            y, m = v.split("-")
            return (int(y) - 1970) * 12 + int(m) - 1

        return _f(fid, pf.name, "int", optional=True), months
    if pf.kind == "day":
        return (
            _f(fid, pf.name, {"type": "int", "logicalType": "date"}, optional=True),
            days,
        )
    if pf.kind == "hour":
        def hours(v):
            d, h = v.rsplit("-", 1)
            return ((dt.date.fromisoformat(d) - _EPOCH_D).days * 24) + int(h)

        return _f(fid, pf.name, "int", optional=True), hours
    if pf.kind == "bucket":
        return _f(fid, pf.name, "int", optional=True), int
    # truncate: result type = source type
    base = src_type.split("(")[0]
    if base in ("int", "integer", "bigint", "smallint", "tinyint"):
        conv = int
        ftype = "long" if base == "bigint" else "int"
    else:
        conv, ftype = str, "string"
    return _f(fid, pf.name, ftype, optional=True), conv


def _kv_map(name: str, key_id: int, val_id: int, val_type) -> dict:
    """Iceberg's avro encoding for int-keyed maps: an array of
    key/value records with ``logicalType: map`` (avro's native map
    type only allows string keys)."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": val_type, "field-id": val_id},
            ],
        },
    }


def _entry_schema(partition_fields: list[dict], deletes: bool) -> dict:
    data_file_fields = [
        _f(134, "content", "int"),
        _f(100, "file_path", "string"),
        _f(101, "file_format", "string"),
        _f(
            102,
            "partition",
            {"type": "record", "name": "r102", "fields": partition_fields},
        ),
        _f(103, "record_count", "long"),
        _f(104, "file_size_in_bytes", "long"),
        # per-column stats (footer-derived): counts + single-value-
        # serialized bounds keyed by schema field id — what lets a
        # planner prune data files without opening them
        _f(109, "value_counts", _kv_map("k119_v120", 119, 120, "long"), optional=True),
        _f(110, "null_value_counts", _kv_map("k121_v122", 121, 122, "long"), optional=True),
        _f(125, "lower_bounds", _kv_map("k126_v127", 126, 127, "bytes"), optional=True),
        _f(128, "upper_bounds", _kv_map("k129_v130", 129, 130, "bytes"), optional=True),
    ]
    if deletes:
        data_file_fields.append(
            _f(
                135,
                "equality_ids",
                {"type": "array", "items": "int", "element-id": 136},
                optional=True,
            )
        )
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            _f(0, "status", "int"),
            _f(1, "snapshot_id", "long", optional=True),
            _f(3, "sequence_number", "long", optional=True),
            _f(4, "file_sequence_number", "long", optional=True),
            _f(
                2,
                "data_file",
                {"type": "record", "name": "r2", "fields": data_file_fields},
            ),
        ],
    }


def _partition_values(rel_path: str) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for seg in os.path.dirname(rel_path).split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            out[k] = None if v == _NULL_DIR else unquote(v)
    return out


def _pq():
    import pyarrow.parquet as pq

    return pq


def _file_stats(path: str) -> tuple[int, int]:
    return _pq().ParquetFile(path).metadata.num_rows, os.path.getsize(path)


# spark simpleString base type -> single-value serialization kind
_STAT_KINDS = {
    "int": "int",
    "integer": "int",
    "smallint": "int",
    "tinyint": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "boolean": "bool",
}


def single_value(kind: str, v) -> bytes | None:
    """Iceberg single-value binary serialization for column bounds."""
    import struct as _s

    if v is None:
        return None
    if kind == "int":
        return _s.pack("<i", int(v))
    if kind == "long":
        return _s.pack("<q", int(v))
    if kind == "float":
        return _s.pack("<f", float(v))
    if kind == "double":
        return _s.pack("<d", float(v))
    if kind == "string":
        return v if isinstance(v, bytes) else str(v).encode("utf-8")
    if kind == "date":
        return _s.pack("<i", (v - _EPOCH_D).days)
    if kind == "ts":
        if v.tzinfo is not None:
            return _s.pack("<q", int(v.timestamp() * 1_000_000))
        return _s.pack(
            "<q", int((v - _EPOCH_TS) / dt.timedelta(microseconds=1))
        )
    if kind == "bool":
        return b"\x01" if v else b"\x00"
    return None


def single_value_parse(kind: str, raw: bytes):
    """Inverse of `single_value` (the spec-route reader's side)."""
    import struct as _s

    if raw is None:
        return None
    if kind == "int":
        return _s.unpack("<i", raw)[0]
    if kind == "long":
        return _s.unpack("<q", raw)[0]
    if kind == "float":
        return _s.unpack("<f", raw)[0]
    if kind == "double":
        return _s.unpack("<d", raw)[0]
    if kind == "string":
        return raw.decode("utf-8")
    if kind == "date":
        return _EPOCH_D + dt.timedelta(days=_s.unpack("<i", raw)[0])
    if kind == "ts":
        return _EPOCH_TS + dt.timedelta(microseconds=_s.unpack("<q", raw)[0])
    if kind == "bool":
        return raw == b"\x01"
    return None


def _column_stats(md, stat_fields: list[tuple[int, str, str]]):
    """Footer-derived per-column stats for one data file (``md`` is
    the already-open parquet FileMetaData — one footer read serves
    both the row count and the stats):
    (value_counts, null_value_counts, lower_bounds, upper_bounds) as
    Iceberg key/value lists keyed by schema field id. Bounds aggregate
    min/max across row groups; columns whose type has no single-value
    kind (or whose footers carry no stats) simply omit entries —
    spec-legal, a planner treats missing bounds as unprunable."""
    per_col: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            st = col.statistics
            acc = per_col.setdefault(
                name, {"values": 0, "nulls": 0, "min": None, "max": None, "ok": True}
            )
            acc["values"] += col.num_values  # parquet counts nulls here too
            if st is None:
                acc["ok"] = False
                continue
            acc["nulls"] += st.null_count or 0
            try:  # pyarrow can't extract stats for every type (decimal)
                if not st.has_min_max:
                    raise ValueError("no min/max")
                mn, mx = st.min, st.max
            except Exception:
                acc["ok"] = False
                continue
            acc["min"] = mn if acc["min"] is None else min(acc["min"], mn)
            acc["max"] = mx if acc["max"] is None else max(acc["max"], mx)
    vc, nc, lo, hi = [], [], [], []
    for fid, name, base in stat_fields:
        acc = per_col.get(name)
        if acc is None:
            continue
        vc.append({"key": fid, "value": int(acc["values"])})
        nc.append({"key": fid, "value": int(acc["nulls"])})
        kind = _STAT_KINDS.get(base)
        if kind and acc["ok"] and acc["min"] is not None:
            lo_b = single_value(kind, acc["min"])
            hi_b = single_value(kind, acc["max"])
            if lo_b is not None and hi_b is not None:
                lo.append({"key": fid, "value": lo_b})
                hi.append({"key": fid, "value": hi_b})
    return vc, nc, lo, hi


def _bound_bytes(ftype, v) -> bytes | None:
    """Iceberg single-value binary serialization for partition bounds:
    int/date 4-byte LE, long/timestamp 8-byte LE, string UTF-8,
    boolean one byte. Decimal (variable-length big-endian) bounds are
    omitted — null bounds are spec-legal and never wrong, while
    lexicographic min/max over mixed-length two's-complement bytes is."""
    import struct as _struct

    t = ftype if isinstance(ftype, str) else ftype.get("type")
    if t == "int":
        return _struct.pack("<i", v)
    if t == "long":
        return _struct.pack("<q", v)
    if t == "string":
        return v.encode("utf-8")
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    return None


def _field_summaries(pfields: list[dict], entries: list[dict]) -> list[dict] | None:
    """Per-partition-field lower/upper bounds + null flags over a
    manifest's entries (the spec's field_summary list, what lets a
    planner prune whole manifests without opening them)."""
    if not entries:
        return None
    out = []
    for fld in pfields:
        name = fld["name"]
        ftype = fld["type"][1]  # unwrap the ["null", X] union
        vals = [e["data_file"]["partition"][name] for e in entries]
        nonnull = [v for v in vals if v is not None]
        lo = min(nonnull) if nonnull else None
        hi = max(nonnull) if nonnull else None
        out.append(
            {
                "contains_null": len(nonnull) < len(vals),
                "contains_nan": None,
                "lower_bound": None if lo is None else _bound_bytes(ftype, lo),
                "upper_bound": None if hi is None else _bound_bytes(ftype, hi),
            }
        )
    return out


def emit_manifests(meta, table_root: str) -> str | None:
    """Write the current snapshot's manifest(s) + manifest list; return
    the manifest-list path (None when there is no snapshot yet).
    Idempotent and deterministic for a given table state."""
    if not meta.snapshots:
        return None
    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
        parse_partition_spec,
    )

    current = meta.snapshots[-1]
    sid = int(current["snapshot_id"])
    seq = int(current["sequence_number"])
    mdir = os.path.join(table_root, "metadata")
    os.makedirs(mdir, exist_ok=True)

    # schema-derived partition avro fields + converters (field ids
    # continue after the data columns, matching iceberg_metadata's
    # 1000-based partition-field ids)
    schema_fields = json.loads(meta.schema_json).get("fields", [])
    src_types = {
        f["name"]: (f["type"] if isinstance(f["type"], str) else "complex")
        for f in schema_fields
    }
    pfields, convs = [], {}
    for i, pf in enumerate(parse_partition_spec(meta.partition_by)):
        fld, conv = _partition_avro_field(pf, src_types.get(pf.source, "string"), 1000 + i)
        pfields.append(fld)
        convs[pf.name] = conv

    # replay the snapshot log: live file -> (adding snapshot, data seq).
    # A re-add (rollback) keeps the file's ORIGINAL data sequence —
    # Iceberg's per-entry data_sequence_number rule, and the property
    # that makes older equality deletes still apply to the file; the
    # engine's _file_seqs implements the same rule, including the
    # pre-collapse sequences an expire_snapshots base manifest records
    # in ``file_seqs``. Adds are applied BEFORE removes within a
    # snapshot, matching Warehouse._live_files by construction, so a
    # snapshot listing the same file in both sets is dead in both
    # replays.
    added_by: dict[str, tuple[int, int]] = {}
    first_seq: dict[str, int] = {}
    for s in meta.snapshots:
        if s.get("staged") and s["snapshot_id"] != sid:
            continue
        if s["snapshot_id"] > sid:
            break
        for f, fseq in s.get("file_seqs", {}).items():
            first_seq.setdefault(f, int(fseq))
        for f in s.get("added_files", ()):
            fseq = first_seq.setdefault(f, int(s["sequence_number"]))
            added_by[f] = (int(s["snapshot_id"]), fseq)
        for f in s.get("removed_files", ()):  # CoW rewrite drops the old file
            added_by.pop(f, None)

    def typed_partition(rel: str) -> dict:
        vals = _partition_values(rel)
        out = {}
        for fld in pfields:
            name = fld["name"]
            raw = vals.get(name)
            out[name] = None if raw is None else convs[name](raw)
        return out

    # real Iceberg schema + partition-spec JSON for the manifest
    # headers (same builder the metadata.json chain uses, so field ids
    # agree). Stats and equality_ids are keyed by the DFS-allocated
    # field ids from THIS document — nested types (array element ids,
    # map key/value ids, struct children) interleave with top-level
    # ids, so enumerate() position is wrong the moment a complex
    # column precedes a primitive one.
    from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_metadata import (
        build_table_metadata,
        field_name_history,
    )

    doc = build_table_metadata(meta, table_root)
    fid_by_name = {f["name"]: f["id"] for f in doc["schemas"][0]["fields"]}
    # historical names (pre-rename) also resolve — equality-delete key
    # columns are recorded in snapshots with their names AT DELETE TIME
    alias_fid = dict(fid_by_name)
    for fid, names in field_name_history(
        getattr(meta, "renames", None), doc["schemas"][0]["fields"]
    ):
        for nm in names:
            alias_fid.setdefault(nm, fid)

    data_dir = os.path.join(table_root, "data")
    stat_fields = [
        (fid_by_name[f["name"]], f["name"], str(f["type"]).split("(")[0])
        for f in schema_fields
        if isinstance(f["type"], str) and f["name"] in fid_by_name
    ]
    entries = []
    min_seq = seq
    counts = {1: [0, 0], 0: [0, 0]}  # status -> [files, rows]
    for rel in sorted(added_by):
        add_sid, add_seq = added_by[rel]
        full = os.path.join(data_dir, rel)
        if not os.path.exists(full):  # expired/vacuumed under old snapshot
            continue
        md = _pq().ParquetFile(full).metadata
        nrows, nbytes = md.num_rows, os.path.getsize(full)
        vc, nc, lo, hi = _column_stats(md, stat_fields)
        status = 1 if add_sid == sid else 0  # ADDED vs EXISTING
        counts[status][0] += 1
        counts[status][1] += nrows
        min_seq = min(min_seq, add_seq)
        entries.append(
            {
                "status": status,
                "snapshot_id": add_sid,
                "sequence_number": add_seq,
                "file_sequence_number": add_seq,
                "data_file": {
                    "content": 0,
                    "file_path": full,
                    "file_format": "PARQUET",
                    "partition": typed_partition(rel),
                    "record_count": nrows,
                    "file_size_in_bytes": nbytes,
                    "value_counts": vc or None,
                    "null_value_counts": nc or None,
                    "lower_bounds": lo or None,
                    "upper_bounds": hi or None,
                },
            }
        )

    common_meta = {
        "schema": json.dumps(doc["schemas"][0], separators=(",", ":")).encode(),
        "schema-id": b"0",
        "partition-spec": json.dumps(
            doc["partition-specs"][0]["fields"], separators=(",", ":")
        ).encode(),
        "partition-spec-id": b"0",
        "format-version": b"2",
    }
    m0 = os.path.join(mdir, f"{sid}-m0.avro")
    write_container(
        m0,
        _entry_schema(pfields, deletes=False),
        entries,
        metadata={**common_meta, "content": b"data"},
    )
    manifests = [
        {
            "manifest_path": m0,
            "manifest_length": os.path.getsize(m0),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": min_seq,
            "added_snapshot_id": sid,
            "added_files_count": counts[1][0],
            "existing_files_count": counts[0][0],
            "deleted_files_count": 0,
            "added_rows_count": counts[1][1],
            "existing_rows_count": counts[0][1],
            "deleted_rows_count": 0,
            "partitions": _field_summaries(pfields, entries),
            "key_metadata": None,
        }
    ]

    # live equality-delete files -> a deletes manifest (content = 1);
    # same first-commit-sequence rule as data files (the engine's
    # _live_delete_files, incl. collapsed ``delete_file_seqs``)
    del_by: dict[str, tuple[int, int, list[str]]] = {}
    dfirst: dict[str, int] = {}
    for s in meta.snapshots:
        if s.get("staged") and s["snapshot_id"] != sid:
            continue
        if s["snapshot_id"] > sid:
            break
        for f, fseq in s.get("delete_file_seqs", {}).items():
            dfirst.setdefault(f, int(fseq))
        for f in s.get("added_delete_files", ()):
            fseq = dfirst.setdefault(f, int(s["sequence_number"]))
            del_by[f] = (
                int(s["snapshot_id"]),
                fseq,
                list(s.get("equality_ids") or ()),
            )
        for f in s.get("removed_delete_files", ()):
            del_by.pop(f, None)
    if del_by:
        ddir = os.path.join(table_root, "deletes")
        dentries = []
        dmin = seq
        dcounts = {1: [0, 0], 0: [0, 0]}
        field_ids = alias_fid  # DFS allocation + historical aliases
        for rel in sorted(del_by):
            add_sid, add_seq, eq_cols = del_by[rel]
            full = os.path.join(ddir, rel)
            if not os.path.exists(full):
                continue
            nrows, nbytes = _file_stats(full)
            status = 1 if add_sid == sid else 0
            dcounts[status][0] += 1
            dcounts[status][1] += nrows
            dmin = min(dmin, add_seq)
            dentries.append(
                {
                    "status": status,
                    "snapshot_id": add_sid,
                    "sequence_number": add_seq,
                    "file_sequence_number": add_seq,
                    "data_file": {
                        "content": 2,  # equality deletes
                        "file_path": full,
                        "file_format": "PARQUET",
                        "partition": {f["name"]: None for f in pfields},
                        "record_count": nrows,
                        "file_size_in_bytes": nbytes,
                        "value_counts": None,
                        "null_value_counts": None,
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "equality_ids": [
                            field_ids[c] for c in eq_cols if c in field_ids
                        ]
                        or None,
                    },
                }
            )
        if dentries:
            m1 = os.path.join(mdir, f"{sid}-m1.avro")
            write_container(
                m1,
                _entry_schema(pfields, deletes=True),
                dentries,
                metadata={**common_meta, "content": b"deletes"},
            )
            manifests.append(
                {
                    "manifest_path": m1,
                    "manifest_length": os.path.getsize(m1),
                    "partition_spec_id": 0,
                    "content": 1,
                    "sequence_number": seq,
                    "min_sequence_number": dmin,
                    "added_snapshot_id": sid,
                    "added_files_count": dcounts[1][0],
                    "existing_files_count": dcounts[0][0],
                    "deleted_files_count": 0,
                    "added_rows_count": dcounts[1][1],
                    "existing_rows_count": dcounts[0][1],
                    "deleted_rows_count": 0,
                    "partitions": None,
                    "key_metadata": None,
                }
            )

    snap_path = os.path.join(mdir, f"snap-{sid}.avro")
    parent = (
        str(meta.snapshots[-2]["snapshot_id"]).encode()
        if len(meta.snapshots) > 1
        else b"null"
    )
    write_container(
        snap_path,
        MANIFEST_FILE_SCHEMA,
        manifests,
        metadata={
            "format-version": b"2",
            "snapshot-id": str(sid).encode(),
            "parent-snapshot-id": parent,
            "sequence-number": str(seq).encode(),
        },
    )
    return snap_path
