"""Zero-copy onboarding: ``add_files`` registers existing parquet into
a table without rewriting bytes (hard links + one append snapshot);
``snapshot`` creates a table over a directory. Iceberg parity:
the same-named stored procedures."""

import os

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _write_src(spark, path, rows, schema, partition_by=None):
    df = spark.createDataFrame(rows, schema)
    w = df.coalesce(1).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(str(path))


@pytest.mark.slow
def test_add_files_registers_without_rewrite(wh, spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a"), (2, "b")], "k bigint, v string")
    wh.create_table("t", "k BIGINT, v STRING")
    wh.insert_values("t", [(9, "z")])
    stats = wh.add_files("t", str(src))
    assert stats == {"added_files": 1, "added_records": 2}
    assert sorted(r.k for r in wh.read_table("t").collect()) == [1, 2, 9]
    # zero-copy: imported file is a hard link to the source (same inode)
    data = wh.data_dir("t")
    imported = [
        f for f in os.listdir(data)
        if f.endswith(".parquet") and os.stat(os.path.join(data, f)).st_nlink > 1
    ]
    assert len(imported) == 1
    # one new snapshot, operation append, correct record count
    snap = wh.snapshots("t")[-1]
    assert snap["operation"] == "append" and snap["added_records"] == 2


def test_add_files_schema_fail_closed(wh, spark, tmp_path):
    wh.create_table("t", "k BIGINT, v STRING")
    extra = tmp_path / "extra"
    _write_src(spark, extra, [(1, "a", 1.5)], "k bigint, v string, w double")
    with pytest.raises(ValueError, match="not in"):
        wh.add_files("t", str(extra))
    bad = tmp_path / "bad"
    _write_src(spark, bad, [(1, 2.5)], "k bigint, v double")
    with pytest.raises(ValueError, match="incompatible"):
        wh.add_files("t", str(bad))


def test_add_files_widens_narrow_ints(wh, spark, tmp_path):
    """An int32 source column onboards into a BIGINT table column —
    the reader's merged-schema widening covers it."""
    src = tmp_path / "narrow"
    _write_src(spark, src, [(1, "a")], "k int, v string")
    wh.create_table("t", "k BIGINT, v STRING")
    wh.add_files("t", str(src))
    assert [r.k for r in wh.read_table("t").collect()] == [1]
    assert dict(wh.read_table("t").dtypes)["k"] == "bigint"


def test_add_files_preserves_partition_dirs(wh, spark, tmp_path):
    src = tmp_path / "part"
    _write_src(
        spark, src,
        [(1, "us"), (2, "eu")], "k bigint, region string",
        partition_by=["region"],
    )
    wh.create_table("t", "k BIGINT, region STRING", partition_by=["region"])
    wh.add_files("t", str(src))
    assert sorted(wh.show_partitions("t")) == ["region=eu", "region=us"]
    got = sorted((r.k, r.region) for r in wh.read_table("t").collect())
    assert got == [(1, "us"), (2, "eu")]


@pytest.mark.slow
def test_snapshot_table_and_sql_procedures(spark, tmp_path):
    from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine

    eng = FgacEngine(spark, str(tmp_path / "wh"))
    src = tmp_path / "lake"
    _write_src(spark, src, [(1, "a"), (2, "b")], "k bigint, v string")
    out = eng.sql(
        f"CALL system.snapshot(source_table => '{src}', table => 'snap')"
    ).collect()
    assert out[0].imported_records_count == 2
    assert sorted(r.k for r in eng.sql("SELECT * FROM snap").collect()) == [1, 2]
    # DML on the snapshot table rewrites only what it touches
    eng.sql("DELETE FROM snap WHERE k = 1")
    assert [r.k for r in eng.sql("SELECT * FROM snap").collect()] == [2]
    # add_files procedure onto an existing table
    src2 = tmp_path / "lake2"
    _write_src(spark, src2, [(3, "c")], "k bigint, v string")
    out2 = eng.sql(
        f"CALL system.add_files(table => 'snap', source_table => 'parquet.`{src2}`')"
    ).collect()
    assert out2[0].added_files_count == 1
    assert sorted(r.k for r in eng.sql("SELECT * FROM snap").collect()) == [2, 3]


def test_add_files_name_collision_uniquified(wh, spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a")], "k bigint, v string")
    wh.create_table("t", "k BIGINT, v STRING")
    wh.add_files("t", str(src))
    wh.add_files("t", str(src))  # same relpaths again
    assert sorted(r.k for r in wh.read_table("t").collect()) == [1, 1]


def test_add_files_skips_orphan_occupied_names(wh, spark, tmp_path):
    """ADVICE r9: an on-disk orphan (crashed write, no snapshot refs
    it) occupying the import name must be renamed AROUND, never
    silently overwritten."""
    import os

    src = str(tmp_path / "ext")
    spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    rel = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    wh.create_table("t", "k int, v string")
    orphan = os.path.join(wh.data_dir("t"), rel)
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"orphan-bytes")
    stats = wh.add_files("t", src)
    assert stats["added_files"] == 1
    with open(orphan, "rb") as f:
        assert f.read() == b"orphan-bytes", "orphan was overwritten"
    assert sorted(tuple(r) for r in wh.read_table("t").collect()) == [(1, "a")]
