"""Avro manifest emission (sources/avro_io.py + iceberg_manifests.py):
the files that close the E2 waiver. Validated two ways — round-trip
through the engine's own reader, and decode by the OFFICIAL Apache
Avro Java reader (avro-1.12.x on Spark's classpath), which proves the
container format and binary encoding are spec-conformant rather than
merely self-consistent. Reference layout parity:
producer_account_setup/logs/producer_cleanup_logs.txt:33-51
(snap-*.avro + *-m0.avro under <table>/metadata)."""

from __future__ import annotations

import json
import os

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.avro_io import (
    read_container,
    write_container,
)
from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _java_read(spark, path: str) -> list[dict]:
    """Decode an avro container with the official Java reader."""
    jvm = spark.sparkContext._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while reader.hasNext():
        out.append(json.loads(str(reader.next())))
    reader.close()
    return out


def _data_entries(wh, table: str, sid) -> list[dict]:
    """All data-manifest entries for a snapshot, resolved through its
    manifest list (carry-forward names are content-digested, so tests
    must route through snap-<sid>.avro like a real reader)."""
    mdir = os.path.join(wh.root, table, "metadata")
    _, _, manifests = read_container(os.path.join(mdir, f"snap-{sid}.avro"))
    out = []
    for mf in manifests:
        if mf["content"] == 0:
            _, _, es = read_container(mf["manifest_path"])
            out.extend(es)
    return out


def test_avro_roundtrip_all_types(tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {"name": "b", "type": "bytes"},
            {"name": "bo", "type": "boolean"},
            {
                "name": "sub",
                "type": {
                    "type": "record",
                    "name": "sub",
                    "fields": [{"name": "x", "type": "float"}],
                },
            },
        ],
    }
    recs = [
        {
            "l": -(2**62),
            "s": "héllo",
            "arr": [0, -1, 2**31 - 1],
            "m": {"k": 2.5},
            "b": b"\x00\xff",
            "bo": True,
            "sub": {"x": 1.5},
        },
        {"l": 0, "s": None, "arr": [], "m": {}, "b": b"", "bo": False, "sub": {"x": -0.5}},
    ]
    p = str(tmp_path / "t.avro")
    write_container(p, schema, recs)
    got_schema, meta, got = read_container(p)
    assert got == recs
    assert meta["avro.codec"] == b"null"
    assert got_schema["name"] == "t"


def test_avro_readable_by_official_java_reader(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
        ],
    }
    recs = [{"a": -42, "b": "x", "c": [1, 2, 3]}, {"a": 7, "b": None, "c": []}]
    p = str(tmp_path / "t.avro")
    write_container(p, schema, recs)
    assert _java_read(spark, p) == recs


def test_manifest_chain_for_partitioned_table(wh, spark):
    wh.create_table("mt", "k int, state string", partition_by=["state"])
    wh.insert_values("mt", [(1, "TX"), (2, "NY")])
    wh.insert_values("mt", [(3, "TX")])
    sid = wh.current_snapshot_id("mt")
    mdir = os.path.join(wh.root, "mt", "metadata")

    # the metadata.json snapshot entry's manifest-list path exists
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = int(f.read())
    doc = json.load(open(os.path.join(mdir, f"v{v}.metadata.json")))
    mlist_path = doc["snapshots"][-1]["manifest-list"]
    assert os.path.exists(mlist_path), mlist_path

    # manifest list: spec field set, counts match, paths resolve.
    # Carry-forward: snapshot 1's manifest is referenced UNCHANGED and
    # snapshot 2 contributes only its own delta manifest
    _, mmeta, manifests = read_container(mlist_path)
    assert mmeta["format-version"] == b"2"
    assert len(manifests) == 2
    carried, delta = manifests
    first_sid = wh._read_meta("mt").snapshots[0]["snapshot_id"]
    assert carried["added_snapshot_id"] == first_sid
    assert delta["added_snapshot_id"] == sid
    assert all(m["content"] == 0 for m in manifests)
    assert delta["added_files_count"] >= 1 and delta["existing_files_count"] == 0
    for mf in manifests:
        assert os.path.exists(mf["manifest_path"])
        assert mf["manifest_length"] == os.path.getsize(mf["manifest_path"])

    # manifest entries across the chain: full live set, typed
    # partitions, real footers
    _, emeta, _ = read_container(delta["manifest_path"])
    assert emeta["content"] == b"data"
    # header carries the REAL Iceberg schema + spec (ids match the
    # metadata.json chain)
    hschema = json.loads(emeta["schema"])
    assert [f["name"] for f in hschema["fields"]] == ["k", "state"]
    hspec = json.loads(emeta["partition-spec"])
    assert hspec[0]["transform"] == "identity" and hspec[0]["field-id"] == 1000
    live = {os.path.join(wh.root, "mt", "data", f) for f in wh._live_files(wh._read_meta("mt"))}
    entries = _data_entries(wh, "mt", sid)
    assert {e["data_file"]["file_path"] for e in entries} == live
    assert {e["data_file"]["partition"]["state"] for e in entries} == {"TX", "NY"}
    assert sum(e["data_file"]["record_count"] for e in entries) == 3
    added = [e for e in entries if e["status"] == 1 and e["snapshot_id"] == sid]
    assert added  # the delta's entries are ADDED by this snapshot
    assert sum(
        m["added_rows_count"] + m["existing_rows_count"] for m in manifests
    ) == 3

    # the official Java avro reader agrees on the whole chain
    assert len(_java_read(spark, mlist_path)) == 2
    jpaths = set()
    for mf in manifests:
        jpaths |= {
            e["data_file"]["file_path"]
            for e in _java_read(spark, mf["manifest_path"])
        }
    assert jpaths == live


def test_manifest_partition_value_typing(wh):
    wh.create_table(
        "tt",
        "k int, d date, ts timestamp",
        partition_by=["days(ts)", "bucket(4, k)"],
    )
    wh.sql(
        "INSERT INTO tt VALUES (1, DATE '2021-03-05', TIMESTAMP '2021-03-05 10:00:00')"
    ) if hasattr(wh, "sql") else wh.insert_values(
        "tt", [(1, __import__("datetime").date(2021, 3, 5), __import__("datetime").datetime(2021, 3, 5, 10, 0, 0))]
    )
    sid = wh.current_snapshot_id("tt")
    entries = _data_entries(wh, "tt", sid)
    part = entries[0]["data_file"]["partition"]
    # day transform: days since epoch (spec typing, not the dir string)
    assert part["ts_day"] == (
        __import__("datetime").date(2021, 3, 5)
        - __import__("datetime").date(1970, 1, 1)
    ).days
    assert isinstance(part["k_bucket"], int) and 0 <= part["k_bucket"] < 4


def test_manifest_partition_field_summaries(wh):
    import struct

    wh.create_table("fs", "k int, state string", partition_by=["state"])
    wh.insert_values("fs", [(1, "TX"), (2, "NY"), (3, "CA")])
    sid = wh.current_snapshot_id("fs")
    mdir = os.path.join(wh.root, "fs", "metadata")
    _, _, manifests = read_container(os.path.join(mdir, f"snap-{sid}.avro"))
    summ = manifests[0]["partitions"]
    assert summ is not None and len(summ) == 1
    s = summ[0]
    assert s["contains_null"] is False
    # string bounds: UTF-8 single-value serialization, min/max by value
    assert s["lower_bound"] == b"CA" and s["upper_bound"] == b"TX"

    wh.create_table("fi", "k int, v string", partition_by=["bucket(8, k)"])
    wh.insert_values("fi", [(i, "x") for i in range(20)])
    sid = wh.current_snapshot_id("fi")
    mdir = os.path.join(wh.root, "fi", "metadata")
    _, _, manifests = read_container(os.path.join(mdir, f"snap-{sid}.avro"))
    s = manifests[0]["partitions"][0]
    lo = struct.unpack("<i", s["lower_bound"])[0]
    hi = struct.unpack("<i", s["upper_bound"])[0]
    assert 0 <= lo <= hi < 8  # int bounds: 4-byte little-endian


def test_scan_plannable_from_manifests_alone(wh):
    """The avro chain must be self-sufficient: reconstructing the live
    file set for ANY snapshot purely from its manifest-list/manifest
    files (no engine JSON) matches the engine's own _live_files — the
    property an external Iceberg reader depends on."""
    wh.create_table("sp", "k int, state string", partition_by=["state"])
    wh.insert_values("sp", [(1, "TX"), (2, "NY")])
    wh.insert_values("sp", [(3, "TX")])
    wh.delete_from("sp", "k = 2")  # CoW: rewrites/drops the NY file
    meta = wh._read_meta("sp")
    mdir = os.path.join(wh.root, "sp", "metadata")
    for s in meta.snapshots:
        sid = s["snapshot_id"]
        snap = os.path.join(mdir, f"snap-{sid}.avro")
        assert os.path.exists(snap), f"snapshot {sid} has no manifest list"
        _, _, manifests = read_container(snap)
        from_avro = set()
        for mf in manifests:
            if mf["content"] != 0:
                continue
            _, _, entries = read_container(mf["manifest_path"])
            from_avro |= {e["data_file"]["file_path"] for e in entries}
        engine_live = {
            os.path.join(wh.root, "sp", "data", f)
            for f in wh._live_files(meta, sid)
        }
        assert from_avro == engine_live, f"snapshot {sid} diverges"


def test_delete_manifest_emitted_for_equality_deletes(wh):
    wh.create_table("dm", "k int, v string")
    wh.set_identifier_fields("dm", ["k"])
    wh.set_delete_mode("dm", "merge-on-read")
    wh.insert_values("dm", [(1, "a"), (2, "b")])
    wh.delete_from("dm", "k = 1")
    sid = wh.current_snapshot_id("dm")
    mdir = os.path.join(wh.root, "dm", "metadata")
    _, _, manifests = read_container(os.path.join(mdir, f"snap-{sid}.avro"))
    contents = {m["content"] for m in manifests}
    assert contents == {0, 1}
    dmf = next(m for m in manifests if m["content"] == 1)
    _, dmeta, dentries = read_container(dmf["manifest_path"])
    assert dmeta["content"] == b"deletes"
    assert all(e["data_file"]["content"] == 2 for e in dentries)
    assert all(e["data_file"]["equality_ids"] for e in dentries)


# ---------------------------------------------------------------------------
# Spec-route reader: scans planned ONLY from the avro chain must equal
# the engine's own scans (sources/iceberg_reader.py)
# ---------------------------------------------------------------------------
from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_reader import (  # noqa: E402
    read_iceberg_table,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_spec_reader_matches_engine_scan(wh, spark):
    from decimal import Decimal

    wh.create_table("sr", "k int, state string, amt decimal(10,2)", partition_by=["state"])
    wh.insert_values("sr", [(1, "TX", Decimal("10.50")), (2, "NY", Decimal("20.25"))])
    wh.insert_values("sr", [(3, "TX", Decimal("30.00"))])
    root = os.path.join(wh.root, "sr")
    got = read_iceberg_table(spark, root)
    cols = ["k", "state", "amt"]
    assert _rows(got.select(*cols), cols) == _rows(wh.read_table("sr").select(*cols), cols)
    assert dict(got.dtypes)["amt"] == "decimal(10,2)"


def test_spec_reader_time_travel(wh, spark):
    wh.create_table("st", "k int, v string")
    wh.insert_values("st", [(1, "a")])
    first = wh.current_snapshot_id("st")
    wh.insert_values("st", [(2, "b")])
    wh.delete_from("st", "k = 1")
    root = os.path.join(wh.root, "st")
    cols = ["k", "v"]
    for sid in (first, wh.current_snapshot_id("st")):
        got = read_iceberg_table(spark, root, snapshot_id=sid)
        want = wh.read_table("st", snapshot_id=sid)
        assert _rows(got, cols) == _rows(want, cols), f"snapshot {sid}"


def test_spec_reader_applies_equality_deletes(wh, spark):
    wh.create_table("se", "k int, v string")
    wh.set_identifier_fields("se", ["k"])
    wh.set_delete_mode("se", "merge-on-read")
    wh.insert_values("se", [(1, "a"), (2, "b"), (3, "c")])
    wh.delete_from("se", "k = 2")
    # re-insert the deleted key AFTER the delete: the sequence rule
    # must keep the new row (delete applies only to older data)
    wh.insert_values("se", [(2, "b2")])
    root = os.path.join(wh.root, "se")
    cols = ["k", "v"]
    got = _rows(read_iceberg_table(spark, root), cols)
    assert got == _rows(wh.read_table("se"), cols)
    assert (2, "b2") in got and (2, "b") not in got


def test_manifest_column_stats_recorded(wh):
    import struct

    wh.create_table("cs", "k int, v string")
    wh.insert_values("cs", [(1, "aa"), (5, "zz"), (None, "mm")])
    sid = wh.current_snapshot_id("cs")
    entries = _data_entries(wh, "cs", sid)
    # the insert fans rows over several files; aggregate the per-file
    # stats (field ids: k=1, v=2, flat-schema DFS order)
    vc = nulls = 0
    k_lo, k_hi, v_lo, v_hi = [], [], [], []
    for e in entries:
        df = e["data_file"]
        for kv in df["value_counts"] or ():
            if kv["key"] == 1:
                vc += kv["value"]
        for kv in df["null_value_counts"] or ():
            if kv["key"] == 1:
                nulls += kv["value"]
        for kv in df["lower_bounds"] or ():
            (k_lo if kv["key"] == 1 else v_lo).append(kv["value"])
        for kv in df["upper_bounds"] or ():
            (k_hi if kv["key"] == 1 else v_hi).append(kv["value"])
    assert vc == 3 and nulls == 1
    assert min(struct.unpack("<i", b)[0] for b in k_lo) == 1
    assert max(struct.unpack("<i", b)[0] for b in k_hi) == 5
    assert min(v_lo) == b"aa" and max(v_hi) == b"zz"


def test_spec_reader_prunes_files_by_bounds(wh, spark):
    wh.create_table("pr", "k int, v string")
    wh.insert_values("pr", [(i, f"a{i}") for i in range(1, 11)])
    wh.insert_values("pr", [(i, f"b{i}") for i in range(11, 21)])
    wh.insert_values("pr", [(i, f"c{i}") for i in range(21, 31)])
    root = os.path.join(wh.root, "pr")

    full = read_iceberg_table(spark, root)
    n_all = len(full.inputFiles())
    pruned = read_iceberg_table(spark, root, filters=[("k", ">", 25)])
    n_pruned = len(pruned.inputFiles())
    assert n_pruned < n_all, (n_pruned, n_all)
    # and the result is still row-exact vs the engine
    cols = ["k", "v"]
    want = _rows(wh.read_table("pr").filter("k > 25"), cols)
    assert _rows(pruned, cols) == want
    # equality predicate on the string column prunes to one file's worth
    one = read_iceberg_table(spark, root, filters=[("v", "=", "b15")])
    assert len(one.inputFiles()) < n_all
    assert _rows(one, cols) == [(15, "b15")]


# ---------------------------------------------------------------------------
# Property test: random records survive write -> (python read, java read)
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_REC = st.fixed_dictionaries(
    {
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "s": st.one_of(st.none(), st.text(max_size=40)),
        "b": st.binary(max_size=24),
        "bo": st.booleans(),
        "arr": st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=6
        ),
        "m": st.dictionaries(
            st.text(min_size=1, max_size=8), st.integers(-(2**40), 2**40), max_size=4
        ),
    }
)

_PROP_SCHEMA = {
    "type": "record",
    "name": "p",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "bytes"},
        {"name": "bo", "type": "boolean"},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(recs=st.lists(_REC, max_size=8))
def test_avro_property_roundtrip(tmp_path, recs):
    p = str(tmp_path / "prop.avro")
    write_container(p, _PROP_SCHEMA, recs)
    _, _, got = read_container(p)
    assert got == recs


def test_avro_property_java_parity(spark, tmp_path):
    # one adversarial fixed sample through the OFFICIAL reader (the
    # hypothesis sweep above covers the python round-trip; java decode
    # of every varint/union/map shape is asserted here)
    recs = [
        {
            "l": -(2**63),
            "i": 2**31 - 1,
            "s": None,
            "b": b"\x00\x80\xff",
            "bo": True,
            "arr": [0, -1, 2**31 - 1, -(2**31)],
            "m": {"k1": 2**40, "k2": -(2**40)},
        },
        {"l": 2**63 - 1, "i": -(2**31), "s": "π∂é", "b": b"", "bo": False, "arr": [], "m": {}},
    ]
    p = str(tmp_path / "jp.avro")
    write_container(p, _PROP_SCHEMA, recs)
    got = _java_read(spark, p)
    # java renders bytes as JSON strings with escapes; compare the
    # structural fields exactly and byte fields by length via python read
    _, _, pyread = read_container(p)
    assert pyread == recs
    assert [g["l"] for g in got] == [r["l"] for r in recs]
    assert [g["i"] for g in got] == [r["i"] for r in recs]
    assert [g["arr"] for g in got] == [r["arr"] for r in recs]
    assert [g["m"] for g in got] == [r["m"] for r in recs]
    assert got[0]["s"] is None and got[1]["s"] == "π∂é"


def test_spec_reader_reads_named_refs(wh, spark):
    wh.create_table("rf", "k int, v string")
    wh.insert_values("rf", [(1, "a")])
    wh.create_tag("rf", "v1")
    wh.insert_values("rf", [(2, "b")])
    root = os.path.join(wh.root, "rf")
    cols = ["k", "v"]
    assert _rows(read_iceberg_table(spark, root, ref="v1"), cols) == [(1, "a")]
    assert _rows(read_iceberg_table(spark, root), cols) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="unknown ref"):
        read_iceberg_table(spark, root, ref="nope")


def test_spec_reader_prunes_by_identity_partition(wh, spark):
    wh.create_table("pp", "k int, state string", partition_by=["state"])
    wh.insert_values("pp", [(1, "TX"), (2, "NY"), (3, "CA"), (4, "TX")])
    root = os.path.join(wh.root, "pp")
    full = read_iceberg_table(spark, root)
    pruned = read_iceberg_table(spark, root, filters=[("state", "=", "TX")])
    # partition columns live only in the directory layout (no column
    # stats) — pruning here can come only from the partition tuple
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    cols = ["k", "state"]
    assert _rows(pruned, cols) == [(1, "TX"), (4, "TX")]


def test_spec_reader_prunes_by_day_transform(wh, spark):
    import datetime as dt

    wh.create_table("pd", "k int, ts timestamp", partition_by=["days(ts)"])
    wh.insert_values(
        "pd",
        [
            (1, dt.datetime(2021, 3, 1, 8, 0)),
            (2, dt.datetime(2021, 3, 2, 9, 0)),
            (3, dt.datetime(2021, 3, 3, 10, 0)),
        ],
    )
    root = os.path.join(wh.root, "pd")
    full = read_iceberg_table(spark, root)
    lit = dt.datetime(2021, 3, 2, 12, 0)
    pruned = read_iceberg_table(spark, root, filters=[("ts", ">", lit)])
    # day(2021-03-01) < day(lit): that file must be gone; day == day(lit)
    # must be KEPT (rows later the same day could match, none do here)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(r["k"] for r in pruned.collect()) == [3]
    eq = read_iceberg_table(
        spark, root, filters=[("ts", "=", dt.datetime(2021, 3, 2, 9, 0))]
    )
    assert len(eq.inputFiles()) == 1
    assert [r["k"] for r in eq.collect()] == [2]


def test_spec_reader_prunes_by_bucket_transform(wh, spark):
    wh.create_table("pb", "k int, v string", partition_by=["bucket(8, k)"])
    wh.insert_values("pb", [(i, f"x{i}") for i in range(40)])
    root = os.path.join(wh.root, "pb")
    full = read_iceberg_table(spark, root)
    pruned = read_iceberg_table(spark, root, filters=[("k", "=", 17)])
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _rows(pruned, ["k", "v"]) == [(17, "x17")]
    # non-equality ops must NOT prune on a bucket transform
    ge = read_iceberg_table(spark, root, filters=[("k", ">=", 0)])
    assert _rows(ge, ["k", "v"]) == _rows(full, ["k", "v"])


def test_spec_reader_prunes_by_truncate_transform(wh, spark):
    wh.create_table("pt", "k int, v string", partition_by=["truncate(10, k)"])
    wh.insert_values("pt", [(i, f"x{i}") for i in range(0, 35)])
    root = os.path.join(wh.root, "pt")
    full = read_iceberg_table(spark, root)
    pruned = read_iceberg_table(spark, root, filters=[("k", ">", 24)])
    # buckets 0-9 and 10-19 excluded; 20-29 kept (contains 25-29)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(r["k"] for r in pruned.collect()) == list(range(25, 35))


def test_manifest_sequences_survive_rollback(wh):
    """Re-added files (rollback after truncate) must keep their
    ORIGINAL data sequence in manifest entries — Iceberg's per-entry
    data_sequence_number rule, and what keeps older equality deletes
    applicable; mirrors the engine's _file_seqs."""
    wh.create_table("rs", "k int")
    wh.insert_values("rs", [(1,)])  # seq 1: file A
    s1 = wh.current_snapshot_id("rs")
    wh.truncate_table("rs")  # seq 2: removes A
    wh.rollback_to_snapshot("rs", s1)  # seq 3: re-adds A
    sid = wh.current_snapshot_id("rs")
    entries = _data_entries(wh, "rs", sid)
    assert entries
    engine_seqs = wh._file_seqs(wh._read_meta("rs"))
    for e in entries:
        assert e["sequence_number"] == 1  # original, not the rollback's 3
        rel = os.path.relpath(
            e["data_file"]["file_path"], os.path.join(wh.root, "rs", "data")
        )
        assert engine_seqs[rel] == e["sequence_number"]


def test_stats_field_ids_respect_nested_id_allocation(wh):
    """Field ids in metadata.json are allocated in DFS order, so a
    complex column's NESTED ids (array element, map key/value) sit
    between top-level ids. Manifest stats and equality_ids must key by
    those real ids, not by top-level position — with 'a array<int>,
    b int, c int' the ids are a=1 (element=2), b=3, c=4, and a stats
    entry recorded under key 2 for b would make an external planner
    prune the wrong files."""
    wh.create_table("nst", "a array<int>, b int, c int")
    wh.insert_values("nst", [([1, 2], 10, 100), ([3], 20, 200)])
    sid = wh.current_snapshot_id("nst")
    root = os.path.join(wh.root, "nst")
    with open(os.path.join(root, "metadata", "version-hint.text")) as f:
        v = f.read().strip()
    with open(os.path.join(root, "metadata", f"v{v}.metadata.json")) as f:
        doc = json.load(f)
    ids = {f["name"]: f["id"] for f in doc["schemas"][0]["fields"]}
    assert ids == {"a": 1, "b": 3, "c": 4}  # element-id 2 consumed by a
    entries = _data_entries(wh, "nst", sid)
    keys = set()
    for e in entries:
        for kv in e["data_file"]["value_counts"] or ():
            keys.add(kv["key"])
    assert keys == {3, 4}, keys  # b and c only, under their DFS ids

    # equality_ids on a MoR delete resolve through the same map
    wh.set_identifier_fields("nst", ["b"])
    wh.set_delete_mode("nst", "merge-on-read")
    wh.delete_from("nst", "b = 10")
    sid2 = wh.current_snapshot_id("nst")
    _, _, manifests = read_container(
        os.path.join(root, "metadata", f"snap-{sid2}.avro")
    )
    dmf = next(m for m in manifests if m["content"] == 1)
    _, _, dentries = read_container(dmf["manifest_path"])
    assert all(e["data_file"]["equality_ids"] == [3] for e in dentries)


def test_spec_reader_resolves_rename_after_mor_delete(wh, spark):
    """RENAME COLUMN committed after an equality delete: the delete
    parquet keeps the OLD physical name, but the spec-route reader
    resolves it positionally through equality_ids (the writer emits
    key columns in equality_ids order), so the interop scan equals the
    engine scan — no engine-private rename log needed."""
    wh.create_table("rn", "k int, v string")
    wh.set_identifier_fields("rn", ["k"])
    wh.set_delete_mode("rn", "merge-on-read")
    wh.insert_values("rn", [(1, "a"), (2, "b"), (3, "c")])
    wh.delete_from("rn", "k = 2")
    wh.rename_column("rn", "k", "key_id")
    root = os.path.join(wh.root, "rn")
    cols = ["key_id", "v"]
    got = _rows(read_iceberg_table(spark, root), cols)
    assert got == _rows(wh.read_table("rn"), cols)
    assert got == [(1, "a"), (3, "c")]
    # and a delete issued AFTER the rename (new physical name) still
    # composes with the pre-rename delete file
    wh.delete_from("rn", "key_id = 3")
    got2 = _rows(read_iceberg_table(spark, root), cols)
    assert got2 == _rows(wh.read_table("rn"), cols) == [(1, "a")]


def test_spec_reader_applies_positional_deletes(wh, spark):
    """Positional delete files (content=1, written by MoR DELETE on a
    table WITHOUT identifier fields) must apply through the spec route
    exactly as through the engine: manifest entries carry content=1
    and no equality_ids, and the (file_path, pos) tuples anti-join
    under the del_seq >= data_seq rule."""
    wh.create_table("pd", "k int, v string")
    wh.set_delete_mode("pd", "merge-on-read")  # no identifiers -> positional
    wh.insert_values("pd", [(i, f"x{i}") for i in range(8)])
    wh.delete_from("pd", "k % 3 = 0")
    wh.insert_values("pd", [(0, "new0")])  # later file: same pos ordinals, immune
    sid = wh.current_snapshot_id("pd")
    mdir = os.path.join(wh.root, "pd", "metadata")
    _, _, manifests = read_container(os.path.join(mdir, f"snap-{sid}.avro"))
    dmf = next(m for m in manifests if m["content"] == 1)
    _, _, dentries = read_container(dmf["manifest_path"])
    assert all(e["data_file"]["content"] == 1 for e in dentries)
    assert all(e["data_file"].get("equality_ids") is None for e in dentries)
    root = os.path.join(wh.root, "pd")
    cols = ["k", "v"]
    got = _rows(read_iceberg_table(spark, root), cols)
    assert got == _rows(wh.read_table("pd"), cols)
    assert (0, "new0") in got and (0, "x0") not in got and (3, "x3") not in got


# ---------------------------------------------------------------------------
# Carry-forward emission (round 8): O(delta) metadata work per commit
# ---------------------------------------------------------------------------


def _snap_manifests(wh, table, sid):
    mdir = os.path.join(wh.root, table, "metadata")
    _, _, manifests = read_container(os.path.join(mdir, f"snap-{sid}.avro"))
    return manifests


def test_unchanged_manifest_carried_byte_identical(wh):
    """A commit that does not touch a prior manifest's files must
    reference that manifest file UNCHANGED — same path in the new
    manifest list, not rewritten, byte-identical."""
    wh.create_table("cf", "k int, v string")
    wh.insert_values("cf", [(1, "a")])
    s1 = wh.current_snapshot_id("cf")
    m1 = _snap_manifests(wh, "cf", s1)
    assert len(m1) == 1
    p1 = m1[0]["manifest_path"]
    bytes1 = open(p1, "rb").read()
    stat1 = os.stat(p1)

    wh.insert_values("cf", [(2, "b")])
    s2 = wh.current_snapshot_id("cf")
    m2 = _snap_manifests(wh, "cf", s2)
    assert len(m2) == 2
    carried = next(m for m in m2 if m["manifest_path"] == p1)
    assert carried["added_snapshot_id"] == s1
    assert open(p1, "rb").read() == bytes1
    st = os.stat(p1)
    assert (st.st_mtime_ns, st.st_ino) == (stat1.st_mtime_ns, stat1.st_ino)
    # and a third commit still carries BOTH prior manifests unchanged
    wh.insert_values("cf", [(3, "c")])
    s3 = wh.current_snapshot_id("cf")
    m3 = _snap_manifests(wh, "cf", s3)
    assert len(m3) == 3
    assert {m["manifest_path"] for m in m2} < {m["manifest_path"] for m in m3}


def test_delete_rewrites_only_touched_manifest(wh):
    """A CoW delete that hits one snapshot's files rewrites ONLY the
    manifest holding them; the other carries forward untouched, and
    surviving entries keep their original snapshot id and sequence."""
    wh.create_table("rwm", "k int, state string", partition_by=["state"])
    wh.insert_values("rwm", [(1, "TX"), (2, "NY")])
    s1 = wh.current_snapshot_id("rwm")
    wh.insert_values("rwm", [(3, "CA")])
    s2 = wh.current_snapshot_id("rwm")
    paths2 = {m["manifest_path"]: m for m in _snap_manifests(wh, "rwm", s2)}
    ca_path = next(
        p for p, m in paths2.items() if m["added_snapshot_id"] == s2
    )
    wh.delete_from("rwm", "state = 'NY'")  # rewrites only snapshot-1 files
    s3 = wh.current_snapshot_id("rwm")
    m3 = {m["manifest_path"]: m for m in _snap_manifests(wh, "rwm", s3)}
    assert ca_path in m3  # untouched manifest carried verbatim
    # the snapshot-1 manifest was replaced (its NY file died and the
    # delete's CoW rewrite added a new TX file under s3)
    assert all(
        p == ca_path or p not in paths2 for p in m3
    ), (sorted(paths2), sorted(m3))
    meta = wh._read_meta("rwm")
    seqs = wh._file_seqs(meta)
    for p, mf in m3.items():
        _, _, entries = read_container(p)
        for e in entries:
            rel = os.path.relpath(
                e["data_file"]["file_path"], os.path.join(wh.root, "rwm", "data")
            )
            assert e["sequence_number"] == seqs[rel]
    # engine live set == chain live set
    live = {
        os.path.join(wh.root, "rwm", "data", f)
        for f in wh._live_files(meta)
    }
    got = set()
    for p in m3:
        _, _, entries = read_container(p)
        got |= {e["data_file"]["file_path"] for e in entries}
    assert got == live


def test_manifest_chain_compacts_at_threshold(wh, spark):
    """Beyond commit.manifest.min-count-to-merge the chain compacts to
    one manifest, bounding reader fan-out; parity with the engine scan
    holds throughout."""
    from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    wh.create_table("cp", "k int, v string")
    with wh._table_lock("cp"):
        meta = wh._read_meta("cp")
        meta.properties["commit.manifest.min-count-to-merge"] = "3"
        wh._write_meta(meta)
    for i in range(6):
        wh.insert_values("cp", [(i, f"x{i}")])
    sid = wh.current_snapshot_id("cp")
    manifests = _snap_manifests(wh, "cp", sid)
    assert len(manifests) <= 3 + 1, [m["manifest_path"] for m in manifests]
    root = os.path.join(wh.root, "cp")
    got = _rows(read_iceberg_table(spark, root), ["k", "v"])
    assert got == _rows(wh.read_table("cp"), ["k", "v"])
    assert got == [(i, f"x{i}") for i in range(6)]


def test_missing_historical_manifest_list_heals(wh):
    """Deleting a historical snap-*.avro and committing again
    regenerates it (time travel over the spec route self-heals)."""
    wh.create_table("hl", "k int")
    wh.insert_values("hl", [(1,)])
    s1 = wh.current_snapshot_id("hl")
    mdir = os.path.join(wh.root, "hl", "metadata")
    snap1 = os.path.join(mdir, f"snap-{s1}.avro")
    os.remove(snap1)
    wh.insert_values("hl", [(2,)])
    assert os.path.exists(snap1)
    _, _, manifests = read_container(snap1)
    total = 0
    for mf in manifests:
        _, _, entries = read_container(mf["manifest_path"])
        total += sum(e["data_file"]["record_count"] for e in entries)
    assert total == 1  # snapshot 1 sees only its own row
