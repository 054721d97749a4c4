"""The round-9 Iceberg metadata-table tier: ``t.entries`` (per-file
manifest transitions), ``t.all_files`` (every snapshot-reachable file
with liveness), and ``t.position_deletes`` (the live positional-delete
rows, read distributed). Iceberg parity: the same-named Spark metadata
tables the reference's runtime exposes
(consumer_emr_on_eks_setup.sh:440-449 ships the Iceberg Spark
extensions that provide them)."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _mor(wh, name="t"):
    wh.create_table(name, "k bigint, v string")
    with wh._table_lock(name):
        meta = wh._read_meta(name)
        meta.properties["write.delete.mode"] = "merge-on-read"
        wh._write_meta(meta)
    return name


def test_entries_tracks_added_and_deleted(wh):
    wh.create_table("t", "k bigint, v string")
    wh.insert_values("t", [(1, "a"), (2, "b")])
    wh.delete_from("t", "k = 1")  # CoW: removes the file, adds a rewrite
    e = wh.entries_df("t").collect()
    by_status = {}
    for r in e:
        by_status.setdefault((r.status, r.content), []).append(r.file_path)
    assert len(by_status[(1, "data")]) >= 2  # original + rewrite
    assert len(by_status[(2, "data")]) >= 1  # the removed original
    # statuses carry the committing snapshot
    sids = {r.snapshot_id for r in e}
    assert sids == {s["snapshot_id"] for s in wh.snapshots("t")}


def test_entries_labels_delete_file_kinds(wh):
    _mor(wh)
    wh.insert_values("t", [(1, "a"), (2, "b")])
    wh.delete_from("t", "k = 1")  # no identifier fields -> positional
    kinds = {r.content for r in wh.entries_df("t").collect() if r.status == 1}
    assert "position-deletes" in kinds
    wh.set_identifier_fields("t", ["k"])
    wh.delete_from("t", "k = 2")  # equality
    kinds = {r.content for r in wh.entries_df("t").collect()}
    assert "equality-deletes" in kinds


def test_all_files_liveness_after_cow_rewrite(wh):
    wh.create_table("t", "k bigint, v string")
    wh.insert_values("t", [(1, "a"), (2, "b")])
    wh.update_where("t", {"v": "'z'"}, "k = 1")  # CoW rewrite
    rows = wh.all_files_df("t").collect()
    data = [r for r in rows if r.content == "data"]
    assert any(not r.is_live for r in data)  # the pre-rewrite file
    assert any(r.is_live for r in data)
    # live data files cover exactly the current rows
    assert sum(r.record_count for r in data if r.is_live) == 2
    assert all(r.file_size_in_bytes > 0 for r in rows)


def test_position_deletes_rows_and_provenance(wh, spark):
    _mor(wh)
    wh.insert_values("t", [(1, "a"), (2, "b"), (3, "c")])
    wh.delete_from("t", "k >= 2")
    pd_rows = wh.position_deletes_df("t").collect()
    assert len(pd_rows) == 2
    assert all(r.delete_file_path and r.pos >= 0 for r in pd_rows)
    # the referenced data files are live data files of the table
    live = {r.file_path for r in wh.files_df("t").collect() if r.content == "data"}
    for r in pd_rows:
        assert any(r.file_path.endswith(f) for f in live)
    # empty for a table with no positional deletes
    wh.create_table("u", "k bigint")
    assert wh.position_deletes_df("u").count() == 0


def test_metadata_tables_via_sql(spark, tmp_path):
    from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine

    eng = FgacEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE inv (k BIGINT, v STRING)")
    eng.sql("INSERT INTO inv VALUES (1, 'a'), (2, 'b')")
    eng.sql("DELETE FROM inv WHERE k = 1")
    entries = eng.sql(
        "SELECT status, COUNT(*) AS n FROM inv.entries GROUP BY status ORDER BY status"
    ).collect()
    assert [r.status for r in entries] == [1, 2]
    allf = eng.sql(
        "SELECT COUNT(*) AS n FROM inv.all_files WHERE NOT is_live"
    ).collect()
    assert allf[0].n >= 1
    # position_deletes is empty on a CoW table but must resolve
    assert eng.sql("SELECT * FROM inv.position_deletes").count() == 0
