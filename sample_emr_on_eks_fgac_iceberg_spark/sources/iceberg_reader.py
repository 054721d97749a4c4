"""Spec-route Iceberg table reader — scans a warehouse table using
ONLY the interop artifacts (version-hint.text → vN.metadata.json →
snap-*.avro manifest list → *-m0/m1.avro manifests → parquet), never
the engine's private JSON manifest log. This is the read path an
external Iceberg implementation would take over this warehouse's
on-disk layout, implemented in-repo as the proof that the emitted
chain (sources/iceberg_metadata.py + iceberg_manifests.py) is
self-sufficient: tests assert result-equality against the engine's
own scan, including time travel and merge-on-read equality deletes
with the spec's sequence-number rule (a delete at sequence D applies
only to data files whose data sequence is < D).

Limitations, stated: only flat schemas (the warehouse's surface) and
data manifests grouped by entry sequence number (one parquet read per
distinct data sequence). Column RENAMES are resolved through the
spec's ``schema.name-mapping.default`` table property (emitted in
metadata.json by sources/iceberg_metadata.py) — the PUBLIC mechanism
for files written without parquet field ids, applied to data files
AND equality-delete files; if a delete file's columns still don't
match (no mapping entry), they resolve positionally via
``equality_ids`` order (the engine writes delete files as
``select(*keys)`` in that order). Positional delete files (content=1,
round 8) apply via an anti-join on the (data-relative file path, row
ordinal) identity — the row ordinal comes from the parquet reader's
``_metadata.row_index``, captured before any projection — under the
spec's sequence rule for positional deletes (del_seq >= data_seq,
where equality uses strict >).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.sources.avro_io import (
    read_container,
)

# Iceberg schema type -> Spark SQL type (flat primitives; decimal(p,s)
# spells identically in both)
_TYPES = {
    "long": "bigint",
    "int": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
    "binary": "binary",
}


def _spark_type(iceberg_type: str) -> str:
    if iceberg_type.startswith("decimal"):
        return iceberg_type
    return _TYPES.get(iceberg_type, "string")


def current_metadata(table_root: str) -> dict:
    mdir = os.path.join(table_root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(mdir, f"v{v}.metadata.json")) as f:
        return json.load(f)


# iceberg type -> single-value serialization kind (bounds decode)
_KINDS = {
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "ts",
    "timestamptz": "ts",
    "boolean": "bool",
}


def _excluded(op: str, lit, lo, hi) -> bool:
    """Can a file with column range [lo, hi] be skipped for (op, lit)?"""
    if op == "=":
        return lit < lo or lit > hi
    if op == ">":
        return hi <= lit
    if op == ">=":
        return hi < lit
    if op == "<":
        return lo >= lit
    if op == "<=":
        return lo > lit
    return False


_EPOCH_D = _dt.date(1970, 1, 1)


def _transformed_literal(transform: str, lit):
    """The spec transform applied to a query literal (date/datetime),
    in the same units the manifest partition tuple stores."""
    d = lit.date() if isinstance(lit, _dt.datetime) else lit
    if not isinstance(d, _dt.date):
        return None
    if transform == "day":
        return (d - _EPOCH_D).days
    if transform == "month":
        return (d.year - 1970) * 12 + d.month - 1
    if transform == "year":
        return d.year - 1970
    if transform == "hour" and isinstance(lit, _dt.datetime):
        return (d - _EPOCH_D).days * 24 + lit.hour
    return None


def _excluded_transformed(op: str, tlit: int, pv: int) -> bool:
    """Conservative exclusion under an order-preserving but LOSSY
    transform: equality on the transformed value can't separate rows
    inside the same bucket, so strict ops only exclude strictly-other
    buckets (t(x) > t(lit) ⟹ x > lit by monotonicity, but t(x) =
    t(lit) decides nothing)."""
    if op == "=":
        return pv != tlit
    if op in (">", ">="):
        return pv < tlit
    if op in ("<", "<="):
        return pv > tlit
    return False


def _prune(
    entry_data_file: dict, filters, name2id, id2kind, part_specs, bucket_lits
) -> bool:
    """True when the manifest's column bounds OR the file's partition
    tuple prove no row can match. Partition columns never appear
    inside the data files (hive layout), so their pruning can only
    come from the partition tuple — the point of hidden partitioning;
    time transforms (day/month/year/hour) prune conservatively via
    the transformed literal."""
    from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_manifests import (
        single_value_parse,
    )

    part = entry_data_file.get("partition") or {}
    lowers = {kv["key"]: kv["value"] for kv in entry_data_file.get("lower_bounds") or ()}
    uppers = {kv["key"]: kv["value"] for kv in entry_data_file.get("upper_bounds") or ()}
    for col, op, lit in filters:
        for pname, transform in part_specs.get(col, ()):
            pv = part.get(pname)
            if pv is None:
                continue
            if transform == "identity":
                # only directly-comparable identity values (string/
                # int/long/bool); logical-typed ints stay unpruned
                if isinstance(pv, type(lit)) and _excluded(op, lit, pv, pv):
                    return True
            elif transform in ("day", "month", "year", "hour"):
                tlit = _transformed_literal(transform, lit)
                if tlit is not None and _excluded_transformed(op, tlit, pv):
                    return True
            elif transform.startswith("bucket[") and op == "=":
                # bucket is not order-preserving: only equality prunes,
                # via the precomputed literal bucket (same murmur hash
                # the write path used)
                blit = bucket_lits.get((col, lit))
                if blit is not None and pv != blit:
                    return True
            elif transform.startswith("truncate["):
                # order-preserving like the time transforms: ints floor
                # to a multiple of W, strings to a W-char prefix
                w = int(transform[len("truncate[") : -1])
                if isinstance(lit, int) and isinstance(pv, int):
                    tlit = lit - lit % w
                elif isinstance(lit, str) and isinstance(pv, str):
                    tlit = lit[:w]
                else:
                    continue
                if _excluded_transformed(op, tlit, pv):
                    return True
        fid = name2id.get(col)
        kind = id2kind.get(fid)
        if fid is None or kind is None or fid not in lowers or fid not in uppers:
            continue  # no bounds -> unprunable on this predicate
        lo = single_value_parse(kind, lowers[fid])
        hi = single_value_parse(kind, uppers[fid])
        if _excluded(op, lit, lo, hi):
            return True
    return False


def read_iceberg_table(
    spark: SparkSession,
    table_root: str,
    snapshot_id: int | None = None,
    filters: list[tuple] | None = None,
    ref: str | None = None,
) -> DataFrame:
    """The table as of ``snapshot_id`` / named ``ref`` (branch or tag
    from metadata.json's refs map; default: current snapshot), planned
    purely from the spec chain. ``filters`` — [(col, op, literal)]
    with op in {=, <, <=, >, >=} — prunes data files at the MANIFEST
    level via the recorded column bounds before any parquet footer is
    touched, then re-applies the predicates row-level (the bounds are
    a superset guarantee, not row truth)."""
    doc = current_metadata(table_root)
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or ref, not both")
        entry = doc.get("refs", {}).get(ref)
        if entry is None:
            raise ValueError(f"unknown ref '{ref}'")
        snapshot_id = entry["snapshot-id"]
    sid = snapshot_id if snapshot_id is not None else doc["current-snapshot-id"]
    if sid == -1:
        raise ValueError("table has no snapshots")
    snap = next(s for s in doc["snapshots"] if s["snapshot-id"] == sid)
    _, _, manifests = read_container(snap["manifest-list"])

    fields = doc["schemas"][doc["current-schema-id"]]["fields"]
    id2name = {f["id"]: f["name"] for f in fields}
    name2id = {f["name"]: f["id"] for f in fields}
    # schema.name-mapping.default: historical name -> field id, the
    # spec's resolution path for files written without parquet field
    # ids (this engine writes parquet by name). A name that is also a
    # CURRENT schema name never remaps — current names win.
    alias2id: dict[str, int] = {}
    for entry in json.loads(
        doc.get("properties", {}).get("schema.name-mapping.default", "[]")
    ):
        for alias in entry.get("names", ()):
            if alias not in name2id:
                alias2id[alias] = entry["field-id"]

    def _apply_name_mapping(df: DataFrame) -> DataFrame:
        for c in df.columns:
            fid = alias2id.get(c)
            cur = id2name.get(fid) if fid is not None else None
            if cur and cur != c and cur not in df.columns:
                df = df.withColumnRenamed(c, cur)
        return df
    id2kind = {
        f["id"]: _KINDS.get(f["type"])
        for f in fields
        if isinstance(f["type"], str)
    }
    cols = [(f["name"], _spark_type(f["type"])) for f in fields if isinstance(f["type"], str)]
    # partition fields by source column: [(partition name, transform)]
    pspec = doc["partition-specs"][doc["default-spec-id"]]["fields"]
    part_specs: dict[str, list[tuple[str, str]]] = {}
    for f in pspec:
        src = id2name.get(f["source-id"])
        if src is not None:
            part_specs.setdefault(src, []).append((f["name"], f["transform"]))
    # precompute literal buckets for equality filters on bucket-
    # partitioned columns — pure Python, the SPEC's bucket function
    # (murmur3_x86_32 seed 0), which is exactly what any external
    # Iceberg reader would compute over this layout
    from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_bucket import (
        bucket_literal,
    )

    bucket_lits: dict[tuple, int] = {}
    for col, op, lit in filters or ():
        if op != "=":
            continue
        for pname, transform in part_specs.get(col, ()):
            if transform.startswith("bucket["):
                n = int(transform[len("bucket[") : -1])
                bucket_lits[(col, lit)] = bucket_literal(lit, n)

    data_by_seq: dict[int, list[str]] = {}
    deletes: list[tuple[int, str, tuple[str, ...]]] = []
    pos_deletes: list[tuple[int, str]] = []
    for mf in manifests:
        _, _, entries = read_container(mf["manifest_path"])
        for e in entries:
            dfile = e["data_file"]
            seq = int(e["sequence_number"] or 0)
            if mf["content"] == 0:
                if filters and _prune(
                    dfile, filters, name2id, id2kind, part_specs, bucket_lits
                ):
                    continue
                data_by_seq.setdefault(seq, []).append(dfile["file_path"])
            elif dfile.get("content") == 1:
                # positional deletes: (file_path, pos) tuples
                pos_deletes.append((seq, dfile["file_path"]))
            else:
                keys = tuple(
                    id2name[i] for i in (dfile.get("equality_ids") or ())
                )
                deletes.append((seq, dfile["file_path"], keys))

    base = os.path.join(table_root, "data")
    parts = []
    for seq, paths in sorted(data_by_seq.items()):
        df = spark.read.option("basePath", base).parquet(*sorted(paths))
        if pos_deletes:
            # row identity for positional deletes, captured BEFORE any
            # projection so the ordinal is the file's, not the plan's
            df = df.withColumn("__pf", F.col("_metadata.file_path")).withColumn(
                "__pos", F.col("_metadata.row_index")
            )
        df = _apply_name_mapping(df).withColumn("__seq", F.lit(seq))
        parts.append(df)
    if not parts:
        # declared-typed empty frame
        schema = ", ".join(f"`{n}` {t}" for n, t in cols)
        return spark.createDataFrame([], schema)
    out = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )
    # re-assert declared types (dates/decimals survive the round-trip;
    # transform-derived directory columns like ts_day fall away here)
    extra = ["__seq"] + (["__pf", "__pos"] if pos_deletes else [])
    out = out.select(
        *[F.col(n).cast(t).alias(n) for n, t in cols], *extra
    )

    # positional deletes first (they key on the physical row identity,
    # which the equality anti-join below does not disturb): anti-join
    # on the data-relative path + row ordinal, sequence guard
    # del_seq >= data_seq (the spec applies a positional delete to
    # files of the same commit or earlier — >= where equality uses >)
    if pos_deletes:
        rel = lambda c: F.substring_index(c, "/data/", -1)  # noqa: E731
        dparts = [
            spark.read.parquet(path).select(
                rel(F.col("file_path")).alias("__d_rel"),
                F.col("pos").alias("__d_pos"),
                F.lit(int(seq)).alias("__del_seq"),
            )
            for seq, path in sorted(pos_deletes)
        ]
        dels = reduce(lambda a, b: a.unionByName(b), dparts)
        cond = (
            (rel(F.col("__pf")) == F.col("__d_rel"))
            & (F.col("__pos") == F.col("__d_pos"))
            & (F.col("__del_seq") >= F.col("__seq"))
        )
        out = out.join(F.broadcast(dels), cond, "left_anti").drop(
            "__pf", "__pos"
        )

    # equality deletes: anti-join per distinct key tuple with the
    # sequence guard (delete seq > data seq); key frames are small and
    # broadcast
    by_keys: dict[tuple[str, ...], list[tuple[int, str]]] = {}
    for seq, path, keys in deletes:
        if keys:
            by_keys.setdefault(keys, []).append((seq, path))
    for keys, files in by_keys.items():
        kparts = []
        for seq, path in sorted(files):
            raw = _apply_name_mapping(spark.read.parquet(path))
            if list(raw.columns) != list(keys):
                # rename committed after the delete was written: the
                # writer emits key columns in equality_ids order, so
                # position i carries the column whose CURRENT name is
                # keys[i] (see module docstring)
                if len(raw.columns) != len(keys):
                    raise ValueError(
                        f"equality delete file {path}: {len(raw.columns)} "
                        f"columns vs {len(keys)} equality_ids"
                    )
                raw = raw.toDF(*keys)
            kparts.append(
                raw.select(*keys).withColumn("__del_seq", F.lit(int(seq)))
            )
        dels = reduce(lambda a, b: a.unionByName(b), kparts)
        t = out.alias("__tgt")
        d = dels.alias("__dels")
        cond = F.col("__dels.__del_seq") > F.col("__tgt.__seq")
        for k in keys:
            cond = cond & F.col(f"__tgt.{k}").eqNullSafe(F.col(f"__dels.{k}"))
        out = t.join(F.broadcast(d), cond, "left_anti")
    out = out.drop("__seq")
    for col, op, lit in filters or ():
        out = out.filter(_predicate(col, op, lit))
    return out


def _predicate(col: str, op: str, lit):
    c = F.col(col)
    return {
        "=": c == F.lit(lit),
        "<": c < F.lit(lit),
        "<=": c <= F.lit(lit),
        ">": c > F.lit(lit),
        ">=": c >= F.lit(lit),
    }[op]
