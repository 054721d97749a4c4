"""Spec-conformant bucket[N] transform (sources/iceberg_bucket.py):
the engine's bucket placement, its own pruning, the manifest partition
tuples, and the spec-route reader must all compute the bucket an
EXTERNAL Iceberg implementation would — murmur3_x86_32 seed 0 over the
table-spec Appendix B byte layouts, (hash & Int.MAX) % N. Anchored to
the spec's published test vectors, so agreement is with the public
standard, not merely self-consistency."""

from __future__ import annotations

import datetime as dt
import decimal
import os

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_bucket import (
    _spec_bytes,
    bucket_expr,
    bucket_literal,
    murmur3_x86_32,
)
from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


# Iceberg table-spec Appendix B ("Bucket transform details") vectors
SPEC_VECTORS = [
    (34, 2017239379),  # int and long widen to the same 8-byte layout
    ("iceberg", 1210000089),
    (dt.date(2017, 11, 16), -653330422),
    (dt.datetime(2017, 11, 16, 22, 31, 8), -2047944441),  # micros, UTC
    (decimal.Decimal("14.20"), -500754589),
    (b"\x00\x01\x02\x03", -188683207),
]


def test_murmur_matches_published_spec_vectors():
    for v, want in SPEC_VECTORS:
        assert murmur3_x86_32(_spec_bytes(v)) == want, v


def test_bucket_literal_basics():
    # bucket = (hash & Integer.MAX_VALUE) % N, nulls stay null
    assert bucket_literal(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_literal("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert bucket_literal(None, 16) is None
    # negative hashes mask to non-negative buckets
    assert 0 <= bucket_literal(dt.date(2017, 11, 16), 7) < 7


def test_bucket_expr_agrees_with_literal(spark):
    """The write-path pandas UDF (vectorized int path + per-value
    paths) must equal the pure-Python literal function for every
    supported source type."""
    import pyspark.sql.functions as F

    rows = [
        (i, v, s, d, ts)
        for i, (v, s, d, ts) in enumerate(
            [
                (34, "iceberg", dt.date(2017, 11, 16), dt.datetime(2017, 11, 16, 22, 31, 8)),
                (-7, "", dt.date(1969, 12, 31), dt.datetime(1970, 1, 1)),
                (2**40, "héllo wörld", dt.date(2030, 6, 1), dt.datetime(1999, 12, 31, 23, 59, 59)),
                (None, None, None, None),
            ]
        )
    ]
    df = spark.createDataFrame(
        rows, "id int, k bigint, s string, d date, ts timestamp"
    )
    got = df.select(
        "id",
        bucket_expr("k", 16, "bigint").alias("bk"),
        bucket_expr("s", 8, "string").alias("bs"),
        bucket_expr("d", 5, "date").alias("bd"),
        bucket_expr("ts", 11, "timestamp").alias("bt"),
    ).collect()
    for r, (_, k, s, d, ts) in zip(sorted(got, key=lambda r: r.id), rows):
        assert r.bk == bucket_literal(k, 16)
        assert r.bs == bucket_literal(s, 8)
        assert r.bd == bucket_literal(d, 5)
        assert r.bt == bucket_literal(ts, 11)


def test_engine_bucket_layout_is_spec_conformant(wh):
    """Directory encoding AND manifest partition tuples carry the spec
    bucket value — the exact number an external reader derives from
    metadata.json's bucket[N] declaration."""
    from sample_emr_on_eks_fgac_iceberg_spark.sources.avro_io import read_container

    wh.create_table("bt", "k int, v string", partition_by=["bucket(4, k)"])
    wh.insert_values("bt", [(i, f"x{i}") for i in range(20)])
    data_dir = os.path.join(wh.root, "bt", "data")
    dirs = {d for d in os.listdir(data_dir) if d.startswith("k_bucket=")}
    # every row landed in its spec bucket: scan back and check
    rows = wh.read_table("bt").collect()
    assert len(rows) == 20
    scan = wh.read_table("bt")
    # engine pruning agrees with placement for every key
    for k in (0, 7, 13, 19):
        got = [r.v for r in wh.read_table("bt").filter(f"k = {k}").collect()]
        assert got == [f"x{k}"]
    # manifest partition tuple = spec bucket
    sid = wh.current_snapshot_id("bt")
    _, _, manifests = read_container(
        os.path.join(wh.root, "bt", "metadata", f"snap-{sid}.avro")
    )
    entries = []
    for mf in manifests:
        if mf["content"] == 0:
            entries.extend(read_container(mf["manifest_path"])[2])
    import pyarrow.parquet as pq

    for e in entries:
        t = pq.read_table(e["data_file"]["file_path"], columns=["k"])
        for k in t.column("k").to_pylist():
            assert e["data_file"]["partition"]["k_bucket"] == bucket_literal(k, 4)
    assert dirs  # layout actually bucketed


def test_spec_reader_prunes_with_spec_bucket(wh, spark):
    from sample_emr_on_eks_fgac_iceberg_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    wh.create_table("sb", "k bigint, v string", partition_by=["bucket(8, k)"])
    wh.insert_values("sb", [(i, f"x{i}") for i in range(30)])
    root = os.path.join(wh.root, "sb")
    full = read_iceberg_table(spark, root)
    pruned = read_iceberg_table(spark, root, filters=[("k", "=", 17)])
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert [(r.k, r.v) for r in pruned.collect()] == [(17, "x17")]


def test_string_and_date_bucket_partitioning_round_trip(wh):
    wh.create_table(
        "sd", "name string, d date, v int", partition_by=["bucket(3, name)"]
    )
    wh.insert_values(
        "sd",
        [("alpha", dt.date(2024, 1, 1), 1), ("beta", dt.date(2024, 2, 2), 2), (None, None, 3)],
    )
    got = {(r.name, r.v) for r in wh.read_table("sd").collect()}
    assert got == {("alpha", 1), ("beta", 2), (None, 3)}
    # equality pruning on a string bucket key
    assert [r.v for r in wh.read_table("sd").filter("name = 'beta'").collect()] == [2]


def test_decimal_minimal_twos_complement_bytes():
    """ADVICE r8: unscaled values equal to -2^(8k-1) must encode in
    the MINIMAL signed length (-128 → 0x80, one byte, not 0xFF80) or
    the hash diverges from external spec readers."""
    cases = {
        "0": b"\x00",
        "127": b"\x7f",
        "128": b"\x00\x80",
        "-128": b"\x80",
        "-129": b"\xff\x7f",
        "-1": b"\xff",
        "-32768": b"\x80\x00",
        "-3.2768": b"\x80\x00",  # unscaled -32768 at scale 4
    }
    for s, want in cases.items():
        assert _spec_bytes(decimal.Decimal(s)) == want, s


def test_tz_aware_timestamp_hashes_like_naive_utc():
    """ADVICE r8: tz-aware datetimes must convert to micros exactly
    (integer floor-div), not via float seconds — and agree with the
    naive-UTC path for the same instant."""
    naive = dt.datetime(2017, 11, 16, 22, 31, 8, 123457)
    aware = naive.replace(tzinfo=dt.timezone.utc)
    assert _spec_bytes(aware) == _spec_bytes(naive)
    # modern epoch where float seconds lose sub-micro precision
    t = dt.datetime(2026, 8, 15, 12, 0, 0, 1, tzinfo=dt.timezone.utc)
    micros = (
        t - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    ) // dt.timedelta(microseconds=1)
    import struct

    assert _spec_bytes(t) == struct.pack("<q", micros)
