"""Spec-shape validation of the Iceberg v2 metadata mirror
(sources/iceberg_metadata.py): every metadata write emits the next
``vN.metadata.json`` whose snapshot ids / sequence numbers / timestamps
match the engine's own history, with the v2 required field set present
and typed. Reference layout parity:
producer_account_setup/logs/producer_cleanup_logs.txt:33-51."""

from __future__ import annotations

import json
import os

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse

# Iceberg table-spec v2 required top-level fields
V2_REQUIRED = {
    "format-version": int,
    "table-uuid": str,
    "location": str,
    "last-sequence-number": int,
    "last-updated-ms": int,
    "last-column-id": int,
    "current-schema-id": int,
    "schemas": list,
    "default-spec-id": int,
    "partition-specs": list,
    "last-partition-id": int,
    "default-sort-order-id": int,
    "sort-orders": list,
    "properties": dict,
    "current-snapshot-id": int,
    "snapshots": list,
    "snapshot-log": list,
    "metadata-log": list,
    "refs": dict,
}


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _read_current(wh: Warehouse, name: str) -> tuple[dict, str, int]:
    mdir = os.path.join(wh.root, name, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = int(f.read())
    path = os.path.join(mdir, f"v{v}.metadata.json")
    with open(path) as f:
        return json.load(f), path, v


def test_v2_field_set_and_schema_ids(wh):
    wh.create_table(
        "t",
        "k int, v string, amt decimal(10,2), ts timestamp, tags array<string>",
        partition_by=["days(ts)", "bucket(4, k)"],
        properties={"table_type": "ICEBERG"},
    )
    doc, _, v = _read_current(wh, "t")
    assert v == 1
    for key, typ in V2_REQUIRED.items():
        assert key in doc, f"missing v2 field {key}"
        assert isinstance(doc[key], typ), (key, type(doc[key]))
    assert doc["format-version"] == 2
    # schema: unique positive field ids; last-column-id is the max id
    schema = doc["schemas"][doc["current-schema-id"]]
    ids = [f["id"] for f in schema["fields"]]
    assert ids == sorted(ids) and len(set(ids)) == len(ids) and min(ids) >= 1
    assert doc["last-column-id"] >= max(ids)  # nested ids may go higher
    names = [f["name"] for f in schema["fields"]]
    assert names == ["k", "v", "amt", "ts", "tags"]
    types = {f["name"]: f["type"] for f in schema["fields"]}
    assert types["k"] == "int" and types["v"] == "string"
    assert types["amt"] == "decimal(10,2)"
    assert types["ts"] == "timestamptz"
    assert types["tags"]["type"] == "list" and types["tags"]["element"] == "string"
    # partition spec: hidden transforms spelled per the spec, source-id
    # pointing at the schema field, field-ids from 1000
    spec = doc["partition-specs"][doc["default-spec-id"]]
    by_name = {f["name"]: f["id"] for f in schema["fields"]}
    assert [pf["transform"] for pf in spec["fields"]] == ["day", "bucket[4]"]
    assert [pf["source-id"] for pf in spec["fields"]] == [by_name["ts"], by_name["k"]]
    assert [pf["field-id"] for pf in spec["fields"]] == [1000, 1001]
    assert doc["last-partition-id"] == 1001
    # empty table: no snapshots yet
    assert doc["current-snapshot-id"] == -1 and doc["snapshots"] == []
    assert doc["properties"]["table_type"] == "ICEBERG"


def test_chain_matches_engine_history(wh):
    wh.create_table("h", "k int, v string")
    wh.insert_values("h", [(1, "a"), (2, "b")])
    wh.insert_values("h", [(3, "c")])
    wh.delete_from("h", "k = 1")
    doc, path, v = _read_current(wh, "h")

    snaps = wh.snapshots("h")
    assert len(doc["snapshots"]) == len(snaps)
    for got, eng in zip(doc["snapshots"], snaps):
        assert got["snapshot-id"] == eng["snapshot_id"]
        assert got["sequence-number"] == eng["sequence_number"]
        assert got["timestamp-ms"] == eng["timestamp_ms"]
        assert got["summary"]["operation"] in (
            "append", "overwrite", "delete", "replace",
        )
        assert got["manifest-list"].endswith(
            f"snap-{eng['snapshot_id']}.avro"
        )
    assert doc["current-snapshot-id"] == wh.current_snapshot_id("h")
    assert doc["last-sequence-number"] == snaps[-1]["sequence_number"]
    assert doc["refs"]["main"] == {
        "snapshot-id": wh.current_snapshot_id("h"),
        "type": "branch",
    }
    # snapshot-log ordered by time and ending at current
    log = doc["snapshot-log"]
    assert [e["snapshot-id"] for e in log][-1] == doc["current-snapshot-id"]
    assert all(
        a["timestamp-ms"] <= b["timestamp-ms"] for a, b in zip(log, log[1:])
    )
    # metadata-log chains every previous version, oldest first
    mlog = doc["metadata-log"]
    assert len(mlog) == v - 1
    for i, e in enumerate(mlog, start=1):
        assert e["metadata-file"].endswith(f"v{i}.metadata.json")
        assert os.path.exists(e["metadata-file"])
    # version-hint points at the newest file
    assert path.endswith(f"v{v}.metadata.json")


def test_uuid_stable_across_commits_and_rename(wh):
    wh.create_table("u", "k int")
    doc1, _, _ = _read_current(wh, "u")
    wh.insert_values("u", [(1,)])
    doc2, _, _ = _read_current(wh, "u")
    assert doc2["table-uuid"] == doc1["table-uuid"]
    wh.rename_table("u", "u2")
    doc3, _, v3 = _read_current(wh, "u2")
    assert doc3["table-uuid"] == doc1["table-uuid"]
    assert v3 == 3  # the chain moved with the table and kept growing
    # carried metadata-log entries are normalized to the NEW location
    # (absolute paths written pre-rename would 404 for a chain reader)
    for e in doc3["metadata-log"]:
        assert os.path.exists(e["metadata-file"]), e
        assert os.path.join("u2", "metadata") in e["metadata-file"]
    # tags/branches surface as refs
    wh.create_tag("u2", "first", wh.current_snapshot_id("u2"))
    doc4, _, _ = _read_current(wh, "u2")
    assert doc4["refs"]["first"]["snapshot-id"] == wh.current_snapshot_id("u2")


def test_resource_links_emit_no_chain(wh):
    wh.create_table("base", "k int")
    wh.create_resource_link("lnk", "base")
    assert not os.path.exists(os.path.join(wh.root, "lnk", "metadata"))
    # writing through the link grows the TARGET's chain
    _, _, v_before = _read_current(wh, "base")
    wh.insert_values("lnk", [(1,)])
    _, _, v_after = _read_current(wh, "base")
    assert v_after == v_before + 1


def test_chain_reflects_type_widening(wh):
    wh.create_table("tw", "k int, v string")
    wh.insert_values("tw", [(1, "a")])
    wh.alter_column_type("tw", "k", "bigint")
    doc, _, _ = _read_current(wh, "tw")
    schema = doc["schemas"][doc["current-schema-id"]]
    types = {f["name"]: f["type"] for f in schema["fields"]}
    assert types["k"] == "long"  # Iceberg spelling of the widened type


def test_metadata_log_entries_table(spark, tmp_path):
    from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine

    e = FgacEngine(spark, str(tmp_path / "wh"))
    e.sql("CREATE TABLE mle (k INT)")
    e.sql("INSERT INTO mle VALUES (1)")
    e.sql("INSERT INTO mle VALUES (2)")
    rows = e.sql(
        "SELECT file, latest_snapshot_id FROM mle.metadata_log_entries "
        "ORDER BY timestamp_ms, file"
    ).collect()
    assert len(rows) == 3  # create + 2 inserts
    assert rows[0].file.endswith("v1.metadata.json")
    assert rows[0].latest_snapshot_id == -1  # pre-first-insert
    assert rows[-1].latest_snapshot_id == e.warehouse.current_snapshot_id("mle")


def test_metadata_log_capped_at_previous_versions_max(wh):
    wh.create_table(
        "cap", "k int",
        properties={"write.metadata.previous-versions-max": "5"},
    )
    for i in range(12):
        wh.insert_values("cap", [(i,)])
    doc, _, v = _read_current(wh, "cap")
    assert v == 13  # create + 12 inserts
    mlog = doc["metadata-log"]
    assert len(mlog) == 5  # capped, newest previous versions kept
    assert mlog[-1]["metadata-file"].endswith(f"v{v - 1}.metadata.json")


def test_partition_summaries_match_partitions_df(wh):
    """VERDICT r6 task 4: each snapshot summary carries the spec's
    changed-partition-count plus `partitions.<dir>` added-record
    counts, and their per-partition totals agree with the engine's own
    partitions_df (footer-derived truth)."""
    wh.create_table("ps", "k int, state string", partition_by=["state"])
    wh.insert_values("ps", [(1, "TX"), (2, "TX"), (3, "NY")])
    wh.insert_values("ps", [(4, "TX"), (5, "CA")])
    doc, _, _ = _read_current(wh, "ps")

    s1, s2 = doc["snapshots"]
    assert s1["summary"]["changed-partition-count"] == "2"  # TX, NY
    assert s2["summary"]["changed-partition-count"] == "2"  # TX, CA

    totals: dict[str, int] = {}
    for s in doc["snapshots"]:
        for key, val in s["summary"].items():
            if key.startswith("partitions."):
                part = key[len("partitions."):]
                assert val.startswith("added-records=")
                totals[part] = totals.get(part, 0) + int(
                    val.split("=", 1)[1]
                )
    engine = {
        r["partition"]: r["record_count"]
        for r in wh.partitions_df("ps").collect()
    }
    assert totals == engine == {
        "state=TX": 3,
        "state=NY": 1,
        "state=CA": 1,
    }


def test_unpartitioned_changed_partition_count_is_one(wh):
    wh.create_table("up", "k int")
    wh.insert_values("up", [(1,), (2,)])
    doc, _, _ = _read_current(wh, "up")
    s = doc["snapshots"][-1]
    # unpartitioned files live in the data-dir root: one "" partition
    assert s["summary"]["changed-partition-count"] == "1"
    assert not any(k.startswith("partitions.") for k in s["summary"])
