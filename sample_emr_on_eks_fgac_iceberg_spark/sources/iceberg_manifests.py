"""Iceberg v2 manifest-list / manifest emission (closes the last E2
waiver: reference tables ship ``snap-*.avro`` and ``*-m0.avro`` beside
``metadata.json`` — producer_account_setup/logs/
producer_cleanup_logs.txt:33-51).

Every metadata write emits, for the CURRENT snapshot (and for any
historical snapshot whose list is missing):

- ``<table>/metadata/<sid>-m0-<digest>.avro`` — a data manifest with
  ONLY the files the snapshot adds (status ADDED); prior manifests are
  carried forward UNCHANGED in the manifest list — Iceberg's
  carry-forward commit strategy, O(delta) metadata work per commit;
- ``<table>/metadata/<sid>-rwK-<digest>.avro`` — a rewrite of a prior
  manifest whose live set the snapshot shrinks (surviving entries keep
  their original snapshot id / data sequence, status EXISTING);
- ``<table>/metadata/<sid>-m1/-rwdK-<digest>.avro`` — the same for
  equality-delete manifests;
- ``<table>/metadata/<sid>-c0/-cd0-<digest>.avro`` — a compaction of
  the whole chain once it exceeds ``commit.manifest.min-count-to-
  merge`` (default 8), bounding reader fan-out;
- ``<table>/metadata/snap-<sid>.avro`` — the manifest list, which is
  exactly the path ``metadata.json``'s snapshot entry records.

Manifest names digest their logical content (entry set + schema +
partition spec + table root), making the files immutable: re-emission
skips anything already on disk byte-for-byte, and schema evolution or
a table move changes the digest, regenerating the chain. Carried
entries are recovered by decoding the small source manifests — a
commit never re-reads data-file footers for files it didn't write.

Schemas follow the Iceberg table-spec v2 field set with the spec's
field ids attached (``field-id``); files are written by the pure-
Python Avro writer in sources/avro_io.py and are readable by the
official Apache Avro Java reader (cross-validated in
tests/test_iceberg_manifests.py via the avro-1.12.x jar on Spark's
classpath).

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


# ---------------------------------------------------------------------------
# Carry-forward emission (round 8)
#
# Manifests are IMMUTABLE once written: each file's name carries a
# digest of its logical content (entry set + schema + partition spec +
# table root), so a commit writes only
#   - one NEW delta manifest for the files it adds,
#   - a REWRITE of any prior manifest whose live set it shrinks
#     (entries carried with status EXISTING and their original
#     snapshot/sequence), and
#   - the snapshot's manifest list (snap-<sid>.avro) referencing the
#     carried manifests unchanged
# — O(delta) metadata work per commit instead of O(live files). When
# the chain exceeds commit.manifest.min-count-to-merge (default 8) it
# compacts into one manifest, bounding reader fan-out (amortized
# O(live/N) like production Iceberg writers). Schema evolution or a
# table move changes the digest inputs, regenerating the chain from
# parquet footers; everything else carries entries forward by decoding
# the (small) source manifests, never re-reading data-file footers.
# ---------------------------------------------------------------------------

from hashlib import md5 as _md5


def _digest(table_root: str, sig: str, content: int, entries) -> str:
    payload = repr((table_root, sig, content, sorted(entries)))
    return _md5(payload.encode()).hexdigest()[:10]


def _advance(chain, adds, removed, sid, seq, delta_tag, rw_tag, content):
    """One snapshot's effect on a manifest chain: drop removed entries
    (rewriting touched manifests), append a delta manifest for adds.
    Entries are (rel, status, snapshot_id, sequence, eq_cols|None)."""
    out = []
    rw = 0
    for m in chain:
        if removed:
            live = [e for e in m["entries"] if e[0] not in removed]
        else:
            live = m["entries"]
        if len(live) == len(m["entries"]):
            out.append(m)
        elif live:
            rw += 1
            out.append(
                {
                    "tag": f"{sid}-{rw_tag}{rw}",
                    "content": content,
                    "entries": [(e[0], 0, e[2], e[3], e[4]) for e in live],
                    "writer_sid": sid,
                    "writer_seq": seq,
                }
            )
        # fully-emptied manifests drop out of the list entirely
    if adds:
        out.append(
            {
                "tag": f"{sid}-{delta_tag}",
                "content": content,
                "entries": list(adds),
                "writer_sid": sid,
                "writer_seq": seq,
            }
        )
    return out


def _compact(chain, sid, seq, tag, content):
    """Merge a long chain into one manifest; entries added by the
    compacting snapshot keep ADDED status, carried ones EXISTING."""
    entries = []
    for m in chain:
        for rel, _status, esid, eseq, eq in m["entries"]:
            entries.append((rel, 1 if esid == sid else 0, esid, eseq, eq))
    return [
        {
            "tag": f"{sid}-{tag}",
            "content": content,
            "entries": entries,
            "writer_sid": sid,
            "writer_seq": seq,
        }
    ]


def emit_manifests(meta, table_root: str) -> str | None:
    """Write the current snapshot's manifest list plus any manifest
    files it references that are not already on disk (and any MISSING
    historical manifest lists, so time travel over the spec route
    heals after e.g. a table move). Returns the current manifest-list
    path (None when there is no snapshot yet). Deterministic: manifest
    names digest their logical content, so re-emission never rewrites
    an existing file."""
    if not meta.snapshots:
        return None
    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
        parse_partition_spec,
    )
    from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_metadata import (
        build_table_metadata,
        field_name_history,
    )

    current = meta.snapshots[-1]
    cur_sid = int(current["snapshot_id"])
    mdir = os.path.join(table_root, "metadata")
    os.makedirs(mdir, exist_ok=True)
    data_dir = os.path.join(table_root, "data")
    ddir = os.path.join(table_root, "deletes")

    doc = build_table_metadata(meta, table_root)
    top_fields = doc["schemas"][0]["fields"]
    fid_by_name = {f["name"]: f["id"] for f in top_fields}
    alias_fid = dict(fid_by_name)
    for fid, names in field_name_history(getattr(meta, "renames", None), top_fields):
        for nm in names:
            alias_fid.setdefault(nm, fid)

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
    stat_fields = [
        (fid_by_name[f["name"]], f["name"], str(f["type"]).split("(")[0])
        for f in schema_fields
        if isinstance(f["type"], str) and f["name"] in fid_by_name
    ]

    schema_json_c = json.dumps(doc["schemas"][0], separators=(",", ":"))
    spec_json_c = json.dumps(
        doc["partition-specs"][0]["fields"], separators=(",", ":")
    )
    sig = schema_json_c + "|" + spec_json_c
    common_meta = {
        "schema": schema_json_c.encode(),
        "schema-id": b"0",
        "partition-spec": spec_json_c.encode(),
        "partition-spec-id": b"0",
        "format-version": b"2",
    }

    def typed_partition(rel: str) -> dict:
        vals = _partition_values(rel)
        out = {}
        for fld in pfields:
            name = fld["name"]
            raw = vals.get(name)
            out[name] = None if raw is None else convs[name](raw)
        return out

    # ---------------- logical replay: chain state per snapshot
    merge_min = int(
        meta.properties.get("commit.manifest.min-count-to-merge", "8")
    )
    first_seq: dict[str, int] = {}
    dfirst: dict[str, int] = {}
    data_chain: list[dict] = []
    del_chain: list[dict] = []
    states = []  # (snapshot, data_chain, del_chain)
    for s in meta.snapshots:
        if s.get("staged") and s["snapshot_id"] != cur_sid:
            continue
        if s["snapshot_id"] > cur_sid:
            break
        sid_s = int(s["snapshot_id"])
        seq_s = int(s["sequence_number"])
        for f, fs in s.get("file_seqs", {}).items():
            first_seq.setdefault(f, int(fs))
        for f, fs in s.get("delete_file_seqs", {}).items():
            dfirst.setdefault(f, int(fs))
        removed = set(s.get("removed_files", ()))
        adds = [
            (f, 1, sid_s, first_seq.setdefault(f, seq_s), None)
            for f in sorted(s.get("added_files", ()))
            if f not in removed
        ]
        data_chain = _advance(
            data_chain, adds, removed, sid_s, seq_s, "m0", "rw", 0
        )
        dremoved = set(s.get("removed_delete_files", ()))
        eq_cols = tuple(s.get("equality_ids") or ())
        dadds = [
            (f, 1, sid_s, dfirst.setdefault(f, seq_s), eq_cols)
            for f in sorted(s.get("added_delete_files", ()))
            if f not in dremoved
        ]
        del_chain = _advance(
            del_chain, dadds, dremoved, sid_s, seq_s, "m1", "rwd", 1
        )
        if s.get("operation") == "rewrite-manifests":
            # CALL system.rewrite_manifests: an explicit metadata-only
            # compaction snapshot forces the whole chain into one
            # manifest per content kind regardless of the auto-merge
            # threshold (every carried entry keeps its original
            # snapshot/sequence with EXISTING status — no entry was
            # added by the compacting snapshot itself)
            if len(data_chain) > 1:
                data_chain = _compact(data_chain, sid_s, seq_s, "c0", 0)
            if len(del_chain) > 1:
                del_chain = _compact(del_chain, sid_s, seq_s, "cd0", 1)
        else:
            if len(data_chain) > merge_min:
                data_chain = _compact(data_chain, sid_s, seq_s, "c0", 0)
            if len(del_chain) > merge_min:
                del_chain = _compact(del_chain, sid_s, seq_s, "cd0", 1)
        states.append((s, data_chain, del_chain))

    # ---------------- physical emission
    # entry cache: content -> rel -> full avro data_file entry, seeded
    # lazily by decoding existing manifests (never a data-file footer
    # unless the entry appears nowhere on disk yet)
    entry_cache: dict[int, dict[str, dict]] = {0: {}, 1: {}}
    decoded: set[str] = set()
    known_names: list[str] = []  # manifest names seen during replay

    def _rel_of(file_path: str, content: int) -> str:
        marker = f"{os.sep}data{os.sep}" if content == 0 else f"{os.sep}deletes{os.sep}"
        _, _, rel = file_path.rpartition(marker)
        return rel

    def _harvest(name: str, content: int) -> None:
        path = os.path.join(mdir, name)
        if name in decoded or not os.path.exists(path):
            return
        decoded.add(name)
        try:
            _, _, recs = read_container(path)
        except Exception:
            return
        for r in recs:
            dfile = r.get("data_file") or {}
            rel = _rel_of(dfile.get("file_path", ""), content)
            if rel:
                entry_cache[content].setdefault(rel, dfile)

    def _build_data_file(rel: str, content: int) -> dict | None:
        if content == 0:
            full = os.path.join(data_dir, rel)
            if not os.path.exists(full):
                return None
            md = _pq().ParquetFile(full).metadata
            vc, nc, lo, hi = _column_stats(md, stat_fields)
            return {
                "content": 0,
                "file_path": full,
                "file_format": "PARQUET",
                "partition": typed_partition(rel),
                "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(full),
                "value_counts": vc or None,
                "null_value_counts": nc or None,
                "lower_bounds": lo or None,
                "upper_bounds": hi or None,
            }
        full = os.path.join(ddir, rel)
        if not os.path.exists(full):
            return None
        nrows, nbytes = _file_stats(full)
        # kind by schema: the spec's positional delete files carry
        # exactly (file_path, pos) — content=1; anything else is an
        # equality delete file — content=2
        cols = set(_pq().read_schema(full).names)
        return {
            "content": 1 if cols == {"file_path", "pos"} else 2,
            "file_path": full,
            "file_format": "PARQUET",
            "partition": {f["name"]: None for f in pfields},
            "record_count": nrows,
            "file_size_in_bytes": nbytes,
            "value_counts": None,
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
        }

    def _entry_for(rel, status, esid, eseq, eq, content) -> dict | None:
        dfile = entry_cache[content].get(rel)
        if dfile is None:
            for name in known_names:
                _harvest(name, content)
                if rel in entry_cache[content]:
                    dfile = entry_cache[content][rel]
                    break
        if dfile is None:
            dfile = _build_data_file(rel, content)
            if dfile is None:
                return None  # vacuumed under an old snapshot
            entry_cache[content][rel] = dfile
        dfile = dict(dfile)
        # normalize to the CURRENT table root (rename_table moves the
        # directory; digests make stale-rooted manifests regenerate,
        # and carried entries must follow)
        base = data_dir if content == 0 else ddir
        dfile["file_path"] = os.path.join(base, rel)
        if content == 1:
            dfile["equality_ids"] = [
                alias_fid[c] for c in (eq or ()) if c in alias_fid
            ] or dfile.get("equality_ids")
        return {
            "status": status,
            "snapshot_id": esid,
            "sequence_number": eseq,
            "file_sequence_number": eseq,
            "data_file": dfile,
        }

    def _write_manifest(m: dict, name: str) -> dict | None:
        """Write one manifest file (if missing) and return its
        manifest-list descriptor; None when every entry's backing file
        has been vacuumed."""
        path = os.path.join(mdir, name)
        avro_entries = []
        counts = {1: [0, 0], 0: [0, 0]}
        min_seq = m["writer_seq"]
        for rel, status, esid, eseq, eq in m["entries"]:
            e = _entry_for(rel, status, esid, eseq, eq, m["content"])
            if e is None:
                continue
            counts[status][0] += 1
            counts[status][1] += int(e["data_file"]["record_count"])
            min_seq = min(min_seq, eseq)
            avro_entries.append(e)
        if not avro_entries:
            return None
        if not os.path.exists(path):
            write_container(
                path,
                _entry_schema(pfields, deletes=(m["content"] == 1)),
                avro_entries,
                metadata={
                    **common_meta,
                    "content": b"data" if m["content"] == 0 else b"deletes",
                },
            )
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "content": m["content"],
            "sequence_number": m["writer_seq"],
            "min_sequence_number": min_seq,
            "added_snapshot_id": m["writer_sid"],
            "added_files_count": counts[1][0],
            "existing_files_count": counts[0][0],
            "deleted_files_count": 0,
            "added_rows_count": counts[1][1],
            "existing_rows_count": counts[0][1],
            "deleted_rows_count": 0,
            "partitions": (
                _field_summaries(pfields, avro_entries)
                if m["content"] == 0
                else None
            ),
            "key_metadata": None,
        }

    desc_cache: dict[str, dict] = {}

    def _seed_descriptors(snap_path: str) -> None:
        """Reuse descriptors from an existing manifest list — carried
        manifests are immutable, so their manifest_file rows are too."""
        if not os.path.exists(snap_path):
            return
        try:
            _, _, recs = read_container(snap_path)
        except Exception:
            return
        for r in recs:
            desc_cache.setdefault(os.path.basename(r["manifest_path"]), r)

    snap_path_out = None
    prev_sid = None
    for s, dchain, delchain in states:
        sid_s = int(s["snapshot_id"])
        for m in dchain + delchain:
            name = (
                f"{m['tag']}-"
                f"{_digest(table_root, sig, m['content'], m['entries'])}.avro"
            )
            m["name"] = name
            if name not in known_names:
                known_names.append(name)
        snap_path = os.path.join(mdir, f"snap-{sid_s}.avro")
        is_current = sid_s == cur_sid
        if s.get("staged") and not is_current:
            prev_sid = sid_s
            continue
        if os.path.exists(snap_path) and not is_current:
            prev_sid = sid_s
            continue
        if prev_sid is not None:
            _seed_descriptors(os.path.join(mdir, f"snap-{prev_sid}.avro"))
        manifests = []
        for m in dchain + delchain:
            desc = desc_cache.get(m["name"])
            if desc is None or not os.path.exists(
                os.path.join(mdir, m["name"])
            ):
                desc = _write_manifest(m, m["name"])
                if desc is not None:
                    desc_cache[m["name"]] = desc
            if desc is not None:
                manifests.append(desc)
        parent = b"null" if prev_sid is None else str(prev_sid).encode()
        write_container(
            snap_path,
            MANIFEST_FILE_SCHEMA,
            manifests,
            metadata={
                "format-version": b"2",
                "snapshot-id": str(sid_s).encode(),
                "parent-snapshot-id": parent,
                "sequence-number": str(int(s["sequence_number"])).encode(),
            },
        )
        if is_current:
            snap_path_out = snap_path
        prev_sid = sid_s
    return snap_path_out
