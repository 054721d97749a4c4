"""INSERT OVERWRITE (dynamic partition overwrite) and TRUNCATE TABLE:
Iceberg's replace-not-append write modes. Dynamic overwrite replaces
only the partitions present in the incoming frame (untouched
partitions share files with the previous snapshot); static replaces
the table; truncate is a metadata-only commit with history preserved."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse
from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend


@pytest.fixture()
def fe(spark, tmp_path):
    return SqlFrontend(spark, Warehouse(spark, str(tmp_path / "wh")))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dynamic_overwrite_replaces_only_written_partitions(fe):
    fe.execute("CREATE TABLE t (k INT, city STRING) PARTITIONED BY (city)")
    fe.execute("INSERT INTO t VALUES (1, 'Austin'), (2, 'Dallas')")
    austin_files = {
        f
        for f in fe.warehouse._live_files(fe.warehouse._read_meta("t"))
        if "city=Austin" in f
    }
    out = fe.execute("INSERT OVERWRITE t VALUES (10, 'Austin'), (11, 'Austin')")
    stats = out.collect()[0]
    assert stats["replaced_files"] == len(austin_files)
    # Austin replaced, Dallas untouched
    assert _rows(fe.execute("SELECT * FROM t")) == [
        (2, "Dallas"),
        (10, "Austin"),
        (11, "Austin"),
    ]
    # previous snapshot still reads the pre-overwrite table
    snaps = fe.warehouse.snapshots("t")
    assert snaps[-1]["operation"] == "overwrite"
    prev = snaps[-2]["snapshot_id"]
    assert _rows(fe.warehouse.read_table("t", snapshot_id=prev)) == [
        (1, "Austin"),
        (2, "Dallas"),
    ]


def test_static_overwrite_replaces_all(fe):
    fe.execute("CREATE TABLE t (k INT, city STRING) PARTITIONED BY (city)")
    fe.execute("INSERT INTO t VALUES (1, 'Austin'), (2, 'Dallas')")
    df = fe.spark.createDataFrame([(9, "Houston")], fe.warehouse.schema_of("t"))
    stats = fe.warehouse.insert_overwrite("t", df, dynamic=False)
    assert stats["replaced_files"] == 2
    assert _rows(fe.execute("SELECT * FROM t")) == [(9, "Houston")]


def test_overwrite_unpartitioned_replaces_everything(fe):
    fe.execute("CREATE TABLE t (k INT)")
    fe.execute("INSERT INTO t VALUES (1), (2)")
    fe.execute("INSERT OVERWRITE t VALUES (3)")
    assert _rows(fe.execute("SELECT * FROM t")) == [(3,)]


def test_overwrite_from_select(fe):
    fe.execute("CREATE TABLE src (k INT, city STRING)")
    fe.execute("INSERT INTO src VALUES (7, 'Austin')")
    fe.execute("CREATE TABLE t (k INT, city STRING) PARTITIONED BY (city)")
    fe.execute("INSERT INTO t VALUES (1, 'Austin'), (2, 'Dallas')")
    fe.execute("INSERT OVERWRITE t SELECT k, city FROM src")
    assert _rows(fe.execute("SELECT * FROM t")) == [(2, "Dallas"), (7, "Austin")]


def test_truncate_is_metadata_only_with_history(fe):
    fe.execute("CREATE TABLE t (k INT)")
    fe.execute("INSERT INTO t VALUES (1), (2)")
    prev = fe.warehouse.current_snapshot_id("t")
    n_files_on_disk = len(fe.warehouse._data_files("t"))
    fe.execute("TRUNCATE TABLE t")
    assert fe.execute("SELECT * FROM t").count() == 0
    # no data was deleted from disk — old snapshot still reads
    assert len(fe.warehouse._data_files("t")) == n_files_on_disk
    assert _rows(fe.warehouse.read_table("t", snapshot_id=prev)) == [(1,), (2,)]
    assert fe.warehouse.snapshots("t")[-1]["operation"] == "truncate"


def test_dynamic_overwrite_correct_across_partition_evolution(fe):
    """A legacy-layout file (written before the spec evolved) that
    straddles a replaced partition must be rewritten, not left as a
    stale duplicate — logical partition replacement, not directory
    matching."""
    fe.execute("CREATE TABLE t (k INT, city STRING)")  # unpartitioned
    fe.execute("INSERT INTO t VALUES (1, 'Austin'), (2, 'Dallas')")
    fe.warehouse.alter_partition_spec("t", ["city"])  # evolve
    df = fe.spark.createDataFrame([(10, "Austin")], fe.warehouse.schema_of("t"))
    fe.warehouse.insert_overwrite("t", df, dynamic=True)
    assert _rows(fe.execute("SELECT * FROM t")) == [(2, "Dallas"), (10, "Austin")]
    # history: the pre-overwrite state still reads intact
    snaps = fe.warehouse.snapshots("t")
    assert snaps[-1]["operation"] == "overwrite"
    assert _rows(fe.warehouse.read_table("t", snapshot_id=snaps[-2]["snapshot_id"])) == [
        (1, "Austin"),
        (2, "Dallas"),
    ]


def test_dynamic_overwrite_hidden_partition_transform(fe):
    """Dynamic overwrite with a transform spec (bucket) replaces the
    transform-value partitions of the incoming rows."""
    fe.execute("CREATE TABLE t (k INT, v STRING) PARTITIONED BY (bucket(2, k))")
    fe.execute("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    df = fe.spark.createDataFrame([(2, "B!")], fe.warehouse.schema_of("t"))
    fe.warehouse.insert_overwrite("t", df, dynamic=True)
    got = dict(_rows(fe.execute("SELECT * FROM t")))
    # rows in k=2's bucket are replaced by the single new row; the
    # other bucket's rows survive untouched
    assert got[2] == "B!"
    assert 2 in got and len(got) < 5
    all_rows = set(got.items())
    assert all_rows & {(1, "a"), (3, "c"), (4, "d")}  # other bucket intact
