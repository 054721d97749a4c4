"""Hidden partitioning (Iceberg partition transforms) + manifest-time
scan planning.

The reference's tables are Iceberg, whose signature storage feature is
that partitioning is a TRANSFORM of a source column — day(ts),
bucket(N, col), truncate(W, col) — maintained by the engine and
invisible to queries: predicates on the source column prune partitions
without the query mentioning the layout
(producer_iceberg_datalake_setup.sh:116-131 uses identity specs; the
format contract covers transforms).

Scale contract under test: file pruning happens at the manifest level
(zero data I/O — the planner looks only at directory-encoded partition
values), and the residual row-level filter keeps results exact.
"""

import datetime

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
    PartitionField,
    Warehouse,
    parse_partition_spec,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _files(df):
    return set(df.inputFiles())


def test_spec_parser():
    assert parse_partition_spec(["city"]) == [
        PartitionField("identity", "city", None, "city")
    ]
    assert parse_partition_spec(["day(ts)", "bucket(8, k)", "truncate(4, name)"]) == [
        PartitionField("day", "ts", None, "ts_day"),
        PartitionField("bucket", "k", 8, "k_bucket"),
        PartitionField("truncate", "name", 4, "name_trunc"),
    ]
    # plural spellings (Iceberg accepts days()/hours())
    assert parse_partition_spec(["days(ts)"])[0].name == "ts_day"


def test_day_transform_layout_and_roundtrip(wh):
    import os

    wh.create_table("t", "k int, ts timestamp", partition_by=["day(ts)"])
    wh.insert_values(
        "t",
        [
            (1, datetime.datetime(2024, 1, 5, 10)),
            (2, datetime.datetime(2024, 1, 5, 23)),
            (3, datetime.datetime(2024, 2, 1, 0)),
        ],
    )
    # directory layout shows the derived column
    dirs = set(os.listdir(wh.data_dir("t")))
    assert "ts_day=2024-01-05" in dirs and "ts_day=2024-02-01" in dirs
    out = wh.read_table("t")
    # the derived column never leaks into the logical schema
    assert out.columns == ["k", "ts"]
    assert _rows(out.select("k")) == [(1,), (2,), (3,)]


def test_day_transform_prunes_files(wh):
    wh.create_table("t", "k int, ts timestamp", partition_by=["day(ts)"])
    rows = [
        (i, datetime.datetime(2024, 1, d, 12)) for i, d in enumerate([1, 1, 2, 3, 4])
    ]
    wh.insert_values("t", rows)
    full = wh.read_table("t")
    pruned = wh.read_table(
        "t", filters=[("ts", ">=", datetime.datetime(2024, 1, 3, 0))]
    )
    assert len(_files(pruned)) < len(_files(full))
    # exact result (residual applies row-level)
    assert _rows(pruned.select("k")) == [(3,), (4,)]


def test_hour_boundary_is_conservative_but_exact(wh):
    wh.create_table("t", "k int, ts timestamp", partition_by=["hour(ts)"])
    wh.insert_values(
        "t",
        [
            (1, datetime.datetime(2024, 1, 1, 10, 15)),
            (2, datetime.datetime(2024, 1, 1, 10, 45)),
            (3, datetime.datetime(2024, 1, 1, 11, 5)),
        ],
    )
    # filter cuts inside hour 10: the 10:00 partition must be kept
    # (conservative) and the residual drops 10:15
    out = wh.read_table(
        "t", filters=[("ts", ">", datetime.datetime(2024, 1, 1, 10, 30))]
    )
    assert _rows(out.select("k")) == [(2,), (3,)]


def test_bucket_transform_prunes_to_one_bucket(wh):
    wh.create_table("t", "k int, v string", partition_by=["bucket(4, k)"])
    wh.insert_values("t", [(i, f"v{i}") for i in range(20)])
    full = wh.read_table("t")
    pruned = wh.read_table("t", filters=[("k", "=", 7)])
    assert _rows(pruned) == [(7, "v7")]
    assert len(_files(pruned)) < len(_files(full))
    # range predicates can't prune buckets (no order) but stay exact
    assert len(_rows(wh.read_table("t", filters=[("k", ">=", 18)]))) == 2


def test_truncate_string_prefix_pruning(wh):
    wh.create_table("t", "name string, n int", partition_by=["truncate(3, name)"])
    wh.insert_values(
        "t", [("alpha", 1), ("alps", 2), ("beta", 3), ("betty", 4), ("gamma", 5)]
    )
    pruned = wh.read_table("t", filters=[("name", "=", "beta")])
    assert _rows(pruned) == [("beta", 3)]
    assert len(_files(pruned)) < len(_files(wh.read_table("t")))
    # prefix range: truncate is order-preserving
    rng = wh.read_table("t", filters=[("name", ">=", "bet")])
    assert _rows(rng.select("n")) == [(3,), (4,), (5,)]


def test_truncate_int_floors_to_multiple(wh):
    wh.create_table("t", "k int", partition_by=["truncate(10, k)"])
    wh.insert_values("t", [(3,), (9,), (13,), (27,)])
    import os

    dirs = set(os.listdir(wh.data_dir("t")))
    assert "k_trunc=0" in dirs and "k_trunc=10" in dirs and "k_trunc=20" in dirs
    out = wh.read_table("t", filters=[("k", ">", 10)])
    assert _rows(out) == [(13,), (27,)]


def test_null_source_lands_in_null_partition_and_prunes(wh):
    wh.create_table("t", "k int, ts timestamp", partition_by=["day(ts)"])
    wh.insert_values("t", [(1, datetime.datetime(2024, 1, 1)), (2, None)])
    assert len(_rows(wh.read_table("t"))) == 2
    out = wh.read_table("t", filters=[("ts", ">=", datetime.datetime(2020, 1, 1))])
    # NULL ts can never match a comparison: its file is pruned
    assert _rows(out.select("k")) == [(1,)]


def test_partition_evolution_identity_to_transform(wh):
    wh.create_table("t", "k int, ts timestamp, city string", partition_by=["city"])
    wh.insert_values("t", [(1, datetime.datetime(2024, 1, 1), "Austin")])
    wh.alter_partition_spec("t", ["day(ts)"])
    wh.insert_values("t", [(2, datetime.datetime(2024, 2, 2), "Dallas")])
    # mixed layouts read together
    assert len(_rows(wh.read_table("t"))) == 2
    # a ts filter prunes only files whose spec has the day field; the
    # identity-era file is kept conservatively and filtered row-level
    out = wh.read_table("t", filters=[("ts", ">=", datetime.datetime(2024, 2, 1))])
    assert _rows(out.select("k")) == [(2,)]
    # a city filter still prunes the identity-era file set
    out2 = wh.read_table("t", filters=[("city", "=", "Austin")])
    assert _rows(out2.select("k")) == [(1,)]


def test_transforms_compose_with_mor_deletes(wh):
    wh.create_table("t", "k int, ts timestamp", partition_by=["day(ts)"])
    wh.set_identifier_fields("t", ["k"])
    wh.set_delete_mode("t", "merge-on-read")
    wh.insert_values(
        "t",
        [(1, datetime.datetime(2024, 1, 1)), (2, datetime.datetime(2024, 1, 2))],
    )
    wh.delete_from("t", "k = 1")
    out = wh.read_table("t", filters=[("ts", ">=", datetime.datetime(2024, 1, 1))])
    assert _rows(out.select("k")) == [(2,)]


def test_guards(wh):
    with pytest.raises(ValueError, match="not in schema"):
        wh.create_table("t", "k int", partition_by=["day(ts)"])
    wh.create_table("t", "k int, ts timestamp", partition_by=["day(ts)"])
    with pytest.raises(ValueError, match="partition column"):
        wh.drop_column("t", "ts")
    with pytest.raises(ValueError, match="partition column"):
        wh.rename_column("t", "ts", "ts2")


def test_sql_create_with_transforms(spark, tmp_path):
    from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend

    wh = Warehouse(spark, str(tmp_path / "wh"))
    fe = SqlFrontend(spark, wh)
    fe.execute(
        "CREATE TABLE ev (k INT, ts TIMESTAMP, name STRING) "
        "PARTITIONED BY (day(ts), bucket(4, k))"
    )
    assert wh.partition_spec("ev") == ["day(ts)", "bucket(4, k)"]
    fe.execute("INSERT INTO ev VALUES (1, TIMESTAMP '2024-01-05 10:00:00', 'a')")
    import os

    assert any(
        d.startswith("ts_day=2024-01-05") for d in os.listdir(wh.data_dir("ev"))
    )
    assert _rows(fe.execute("SELECT k, name FROM ev")) == [(1, "a")]
    fe.execute("ALTER TABLE ev PARTITIONED BY (truncate(2, name))")
    assert wh.partition_spec("ev") == ["truncate(2, name)"]


def test_compaction_preserves_transform_layout(wh):
    wh.create_table("t", "k int, ts timestamp", partition_by=["day(ts)"])
    for i in range(3):
        wh.insert_values("t", [(i, datetime.datetime(2024, 1, 1 + i % 2))])
    wh.compact_table("t")
    out = wh.read_table(
        "t", filters=[("ts", "=", datetime.datetime(2024, 1, 2))]
    )
    assert _rows(out.select("k")) == [(1,)]
    assert len(_rows(wh.read_table("t"))) == 3
