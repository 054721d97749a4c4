"""Write-side FGAC: Lake Formation's INSERT/DELETE/ALTER/DROP
permission types gate consumer DML. The reference's teams hold only
SELECT/DESCRIBE (producer_account_setup/
producer_iceberg_datalake_setup.sh:265-274), so their writes must deny
at plan time; a principal granted write permissions executes through
the trusted table-level path (LF write permissions have no cell-level
variant). Also covers the warehouse's incremental changelog read and
snapshot rollback."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.policy import (
    DELETE,
    DESCRIBE,
    DROP,
    INSERT,
    SELECT,
    AccessDeniedException,
)
from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import SnapshotNotFoundError


@pytest.fixture()
def engine(spark, tmp_path):
    e = FgacEngine(spark, str(tmp_path / "wh"))
    e.sql("CREATE TABLE inv (k INT, qty INT)")
    e.sql("INSERT INTO inv VALUES (1, 10), (2, 20)")
    e.policy.grant("reader", "inv", {SELECT, DESCRIBE})
    e.policy.grant("writer", "inv", {SELECT, DESCRIBE, INSERT, DELETE})
    return e


def test_read_only_principal_writes_deny(engine):
    sess = engine.session_for("reader")
    for stmt in (
        "INSERT INTO inv VALUES (3, 30)",
        "DELETE FROM inv WHERE k = 1",
        "UPDATE inv SET qty = 0 WHERE k = 1",
        "MERGE INTO inv t USING inv s ON t.k = s.k WHEN MATCHED THEN DELETE",
        "ALTER TABLE inv ADD COLUMNS (x INT)",
        "DROP TABLE inv",
    ):
        with pytest.raises(AccessDeniedException):
            sess.sql(stmt)
    # the denial is plan-time: nothing changed
    assert sess.sql("SELECT count(*) AS n FROM inv").collect()[0].n == 2


def test_create_table_always_denied_for_consumers(engine):
    with pytest.raises(AccessDeniedException, match="CREATE_TABLE"):
        engine.session_for("writer").sql("CREATE TABLE mine (k INT)")


def test_writer_principal_dml_executes(engine):
    sess = engine.session_for("writer")
    sess.sql("INSERT INTO inv VALUES (3, 30)")
    sess.sql("UPDATE inv SET qty = 99 WHERE k = 1")
    sess.sql("DELETE FROM inv WHERE k = 2")
    rows = sorted((r.k, r.qty) for r in sess.sql("SELECT * FROM inv").collect())
    assert rows == [(1, 99), (3, 30)]


def test_insert_only_principal_cannot_update(engine):
    engine.policy.grant("appender", "inv", {SELECT, INSERT})
    sess = engine.session_for("appender")
    sess.sql("INSERT INTO inv VALUES (4, 40)")
    with pytest.raises(AccessDeniedException):
        sess.sql("UPDATE inv SET qty = 0 WHERE k = 4")  # needs DELETE too
    with pytest.raises(AccessDeniedException):
        sess.sql("DELETE FROM inv WHERE k = 4")


def test_drop_requires_drop_permission(engine):
    engine.policy.grant("owner", "inv", {SELECT, DROP})
    engine.session_for("owner").sql("DROP TABLE inv")
    assert not engine.warehouse.table_exists("inv")


# ------------------------------------------- changelog + rollback (API)
def test_read_changes_between_snapshots(engine):
    wh = engine.warehouse
    engine.sql("INSERT INTO inv VALUES (3, 30), (4, 40)")  # snapshot 2
    engine.sql("INSERT INTO inv VALUES (5, 50)")            # snapshot 3
    delta = wh.read_changes("inv", from_snapshot_id=1, to_snapshot_id=3)
    assert sorted(r.k for r in delta.collect()) == [3, 4, 5]
    tail = wh.read_changes("inv", from_snapshot_id=2)
    assert sorted(r.k for r in tail.collect()) == [5]
    # a delete rewrite is not an append — the changelog stays append-only
    engine.sql("DELETE FROM inv WHERE k = 3")
    assert wh.read_changes("inv", from_snapshot_id=3).count() == 0
    with pytest.raises(SnapshotNotFoundError):
        wh.read_changes("inv", from_snapshot_id=99)


def test_rollback_to_snapshot(engine):
    wh = engine.warehouse
    engine.sql("DELETE FROM inv WHERE k = 1")
    assert wh.read_table("inv").count() == 1
    wh.rollback_to_snapshot("inv", 1)
    assert sorted(r.k for r in wh.read_table("inv").collect()) == [1, 2]
    # rollback is itself a snapshot — history is linear and auditable
    assert wh.snapshots("inv")[-1]["operation"] == "rollback"
    with pytest.raises(SnapshotNotFoundError):
        wh.rollback_to_snapshot("inv", 99)


# ------------------------------------------- FGAC over time travel
def test_time_travel_under_policy(spark, tmp_path):
    import datetime as dt

    from sample_emr_on_eks_fgac_iceberg_spark import healthcare

    e = FgacEngine(spark, str(tmp_path / "tt_wh"))
    healthcare.setup_healthcare(e)
    # producer appends two more patients after the teams were granted
    e.sql(
        "INSERT INTO patients VALUES "
        "(1013, 'fgac13 Tex', DATE'1991-01-01', 'M', 'Austin', 'Texas', "
        "'999-00-0001', TIMESTAMP'2025-03-28 10:00:00', TIMESTAMP'2025-03-28 10:00:00'), "
        "(1014, 'fgac14 Cal', DATE'1992-02-02', 'F', 'Fresno', 'California', "
        "'999-00-0002', TIMESTAMP'2025-03-28 10:00:00', TIMESTAMP'2025-03-28 10:00:00')"
    )
    sess = e.session_for("team1")
    # current read: 8 original TX/NY + the new TX row; CA row filtered
    assert sess.sql("SELECT count(*) AS n FROM patients").collect()[0].n == 9
    # historical read: the SAME policy applies to the old snapshot
    old = sess.sql("SELECT * FROM patients VERSION AS OF 1")
    assert old.count() == 8
    assert "ssn" not in old.columns  # column mask holds on history
    # time travel is not a bypass for an ungranted principal
    from sample_emr_on_eks_fgac_iceberg_spark.policy import AccessDeniedException

    with pytest.raises(AccessDeniedException):
        e.session_for("team2").sql("SELECT * FROM patients VERSION AS OF 1")


# ------------------------------- metadata under DESCRIBE + audit log
def test_consumer_metadata_tables_require_describe(engine):
    sess = engine.session_for("reader")  # has SELECT + DESCRIBE
    snaps = sess.sql("SELECT operation FROM inv.snapshots").collect()
    assert [s.operation for s in snaps] == ["append"]
    # files/partitions expose physical paths → not a consumer surface
    with pytest.raises(Exception):
        sess.sql("SELECT * FROM inv.files").collect()
    # a SELECT-only principal can't read metadata either
    engine.policy.grant("peeker", "inv", {SELECT})
    with pytest.raises(AccessDeniedException):
        engine.session_for("peeker").sql("SELECT * FROM inv.snapshots")


def test_audit_log_records_decisions(engine):
    engine.policy.audit_log.clear()
    sess = engine.session_for("reader")
    sess.sql("SELECT count(*) AS n FROM inv").collect()
    with pytest.raises(AccessDeniedException):
        sess.sql("DELETE FROM inv WHERE k = 1")
    log = engine.policy.audit_log
    assert ("reader", "inv", "SELECT", "granted") in log
    assert ("reader", "inv", "DELETE", "denied") in log


def test_maintenance_statements_denied_for_readonly_consumer(engine):
    """TRUNCATE / INSERT OVERWRITE / OPTIMIZE / ANALYZE / CALL deny at
    plan time for a SELECT/DESCRIBE-only principal — the round-3
    maintenance surface stays producer-side."""
    sess = engine.session_for("reader")
    for stmt in (
        "TRUNCATE TABLE inv",
        "INSERT OVERWRITE inv VALUES (1, 1)",
        "OPTIMIZE inv REWRITE DATA USING BIN_PACK",
        "ANALYZE TABLE inv COMPUTE STATISTICS",
        "CALL system.expire_snapshots('inv', 1)",
    ):
        with pytest.raises(AccessDeniedException):
            sess.sql(stmt)


def test_dml_source_tables_require_unfiltered_select(engine):
    """A write grant on one table must not become a read of another:
    MERGE USING / INSERT OVERWRITE SELECT sources execute on the
    trusted frontend, so each referenced source needs the principal's
    SELECT — and a data-cells-FILTERED select is refused (the trusted
    path cannot apply the filter)."""
    engine.sql("CREATE TABLE secret (k INT, qty INT)")
    engine.sql("INSERT INTO secret VALUES (9, 99)")
    sess = engine.session_for("writer")  # writer: perms on inv only

    for stmt in (
        "MERGE INTO inv AS t USING (SELECT k, qty FROM secret) AS s "
        "ON t.k = s.k WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (s.k, s.qty)",
        "INSERT OVERWRITE inv SELECT k, qty FROM secret",
    ):
        with pytest.raises(AccessDeniedException):
            sess.sql(stmt)
    # nothing leaked into inv
    assert sorted(tuple(r) for r in engine.warehouse.read_table("inv").collect()) == [
        (1, 10),
        (2, 20),
    ]

    # full-table SELECT on the source unlocks the same statement
    engine.policy.grant("writer", "secret", {SELECT})
    sess2 = engine.session_for("writer")
    sess2.sql(
        "MERGE INTO inv AS t USING (SELECT k, qty FROM secret) AS s "
        "ON t.k = s.k WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (s.k, s.qty)"
    )
    assert (9, 99) in {
        tuple(r) for r in engine.warehouse.read_table("inv").collect()
    }


def test_filtered_select_cannot_feed_dml(engine):
    from sample_emr_on_eks_fgac_iceberg_spark.policy import DataCellsFilter

    engine.sql("CREATE TABLE src2 (k INT, qty INT)")
    engine.sql("INSERT INTO src2 VALUES (5, 50), (6, 60)")
    engine.policy.create_data_cells_filter(
        DataCellsFilter(name="src2_half", table="src2", row_filter="k = 5")
    )
    engine.policy.grant("writer", "src2", {SELECT}, filter_name="src2_half")
    sess = engine.session_for("writer")
    # plain read IS allowed (and filtered) …
    assert [tuple(r) for r in sess.sql("SELECT * FROM src2").collect()] == [(5, 50)]
    # … but feeding a write statement with it is refused
    with pytest.raises(AccessDeniedException, match="unfiltered"):
        sess.sql("INSERT OVERWRITE inv SELECT k, qty FROM src2")


def test_filtered_principal_cannot_analyze_or_optimize(engine):
    """ANALYZE/OPTIMIZE return unfiltered-data-derived numbers; a
    data-cells-filtered principal is refused even when holding ALTER."""
    from sample_emr_on_eks_fgac_iceberg_spark.policy import ALTER, DataCellsFilter

    engine.policy.create_data_cells_filter(
        DataCellsFilter(name="inv_half", table="inv", row_filter="k = 1")
    )
    engine.policy.grant(
        "half-admin", "inv", {SELECT, ALTER}, filter_name="inv_half"
    )
    sess = engine.session_for("half-admin")
    with pytest.raises(AccessDeniedException, match="unfiltered"):
        sess.sql("ANALYZE TABLE inv COMPUTE STATISTICS")
    with pytest.raises(AccessDeniedException, match="unfiltered"):
        sess.sql("OPTIMIZE inv REWRITE DATA USING BIN_PACK")


def test_create_or_replace_table_denied_for_consumers(engine):
    """Round 5 added CREATE OR REPLACE on the producer surface; the
    consumer-side CREATE_TABLE denial must cover the new spelling (the
    plain `CREATE TABLE` regex silently missed it)."""
    with pytest.raises(AccessDeniedException, match="CREATE_TABLE"):
        engine.session_for("writer").sql("CREATE OR REPLACE TABLE mine (k INT)")
