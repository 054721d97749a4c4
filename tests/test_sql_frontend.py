"""SQL entry point (VERDICT item 6): the healthcare fixture reproduced
through `engine.sql(...)` only — CREATE TABLE … PARTITIONED BY, INSERT
INTO … VALUES, DROP TABLE, DESCRIBE — mirroring the reference's Athena
producer path (producer_iceberg_datalake_setup.sh:115-159), with the
golden flagship join still returning its 6 rows."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import (
    CLAIMS_ROWS,
    CLAIMS_SCHEMA,
    FLAGSHIP_JOIN_SQL,
    PATIENT_ALLOWED_COLUMNS,
    PATIENT_ROW_FILTER,
    PATIENTS_ROWS,
    PATIENTS_SCHEMA,
    TEAM1,
)
from sample_emr_on_eks_fgac_iceberg_spark.policy import DataCellsFilter


def _patients_values() -> str:
    return ",\n".join(
        f"({pid}, '{name}', DATE '{dob}', '{g}', '{city}', '{state}', '{ssn}', "
        f"TIMESTAMP '{c}', TIMESTAMP '{u}')"
        for pid, name, dob, g, city, state, ssn, c, u in PATIENTS_ROWS
    )


def _claims_values() -> str:
    return ",\n".join(
        f"('{cid}', {pid}, DATE '{cdate}', '{diag}', '{proc}', {amt}, "
        f"'{status}', '{prov}', TIMESTAMP '{c}', TIMESTAMP '{u}')"
        for cid, pid, cdate, diag, proc, amt, status, prov, c, u in CLAIMS_ROWS
    )


@pytest.fixture()
def engine(spark, tmp_path):
    return FgacEngine(spark, str(tmp_path / "wh"))


def _sql_only_fixture(engine):
    engine.sql(f"CREATE TABLE patients ({PATIENTS_SCHEMA}) PARTITIONED BY (city)")
    engine.sql(f"INSERT INTO patients VALUES {_patients_values()}")
    engine.sql(f"CREATE TABLE claims ({CLAIMS_SCHEMA}) PARTITIONED BY (status)")
    engine.sql(f"INSERT INTO claims VALUES {_claims_values()}")


def test_sql_only_fixture_flagship_join(engine):
    _sql_only_fixture(engine)
    engine.policy.create_data_cells_filter(
        DataCellsFilter(
            name="patients_column_row_filter",
            table="patients",
            allowed_columns=PATIENT_ALLOWED_COLUMNS,
            row_filter=PATIENT_ROW_FILTER,
        )
    )
    engine.policy.grant(TEAM1, "patients", filter_name="patients_column_row_filter")
    engine.policy.grant(TEAM1, "claims")
    rows = engine.session_for(TEAM1).sql(FLAGSHIP_JOIN_SQL).collect()
    assert [r.claim_id for r in rows] == [
        "CLM010", "CLM009", "CLM007", "CLM008", "CLM005", "CLM006",
    ]


def test_sql_select_over_warehouse(engine):
    _sql_only_fixture(engine)
    df = engine.sql("SELECT count(*) AS n FROM patients WHERE state = 'Texas'")
    assert df.collect()[0].n == 4


def test_sql_describe(engine):
    engine.sql("CREATE TABLE t (k INT, v STRING)")
    rows = engine.sql("DESCRIBE t").collect()
    assert [(r.col_name, r.data_type) for r in rows] == [("k", "int"), ("v", "string")]


def test_sql_drop_table(engine):
    engine.sql("CREATE TABLE t (k INT)")
    engine.sql("DROP TABLE t")
    assert not engine.warehouse.table_exists("t")
    engine.sql("DROP TABLE IF EXISTS t")  # no-op, no error
    with pytest.raises(Exception):
        engine.sql("DROP TABLE t")


def test_sql_create_duplicate_raises(engine):
    engine.sql("CREATE TABLE t (k INT)")
    with pytest.raises(ValueError):
        engine.sql("CREATE TABLE t (k INT)")
    engine.sql("CREATE TABLE IF NOT EXISTS t (k INT)")  # no-op


def test_sql_insert_width_mismatch_raises(engine):
    engine.sql("CREATE TABLE t (k INT, v STRING)")
    with pytest.raises(ValueError):
        engine.sql("INSERT INTO t VALUES (1)")


def test_sql_insert_with_column_list(engine):
    engine.sql("CREATE TABLE t (k INT, v STRING)")
    # round 4: partial column list NULL-fills the unlisted columns
    # (standard SQL INSERT semantics) instead of erroring
    engine.sql("INSERT INTO t (k) VALUES (1)")
    engine.sql("INSERT INTO t (v, k) VALUES ('a', 2)")
    assert sorted(
        (r.k, r.v) for r in engine.sql("SELECT * FROM t").collect()
    ) == [(1, None), (2, "a")]


def test_sql_partitioned_create_prunes(engine):
    engine.sql(
        "CREATE TABLE pt (k INT, city STRING) USING iceberg PARTITIONED BY (city)"
    )
    assert engine.warehouse.partition_spec("pt") == ["city"]
    engine.sql("INSERT INTO pt VALUES (1, 'Austin'), (2, 'Dallas')")
    assert engine.sql("SELECT k FROM pt WHERE city='Austin'").collect()[0].k == 1


def test_insert_into_select(engine):
    engine.sql("CREATE TABLE src_is (k BIGINT, v STRING)")
    engine.sql("INSERT INTO src_is VALUES (1, 'a'), (2, 'b')")
    engine.sql("CREATE TABLE dst_is (k BIGINT, v STRING)")
    engine.sql("INSERT INTO dst_is SELECT k, v FROM src_is WHERE k = 2")
    rows = sorted(tuple(r) for r in engine.sql("SELECT * FROM dst_is").collect())
    assert rows == [(2, "b")]


def test_show_grants(engine):
    engine.sql("CREATE TABLE g1 (k INT)")
    engine.sql("GRANT SELECT, DESCRIBE ON g1 TO team-a WITH GRANT OPTION")
    engine.sql("GRANT SELECT ON g1 TO team-b")
    rows = engine.sql("SHOW GRANTS ON g1").collect()
    got = {(r.principal, r.permissions, r.grant_option) for r in rows}
    assert ("team-a", "DESCRIBE, SELECT", True) in got
    assert ("team-b", "SELECT", False) in got
    all_rows = engine.sql("SHOW GRANTS").collect()
    assert len(all_rows) >= len(rows)


def test_database_lifecycle(engine):
    engine.sql("CREATE DATABASE healthcare_db")
    assert [r.database_name for r in engine.sql("SHOW DATABASES").collect()] == [
        "healthcare_db"
    ]
    engine.sql("CREATE DATABASE IF NOT EXISTS healthcare_db")  # idempotent form
    with pytest.raises(ValueError, match="already exists"):
        engine.sql("CREATE DATABASE healthcare_db")
    engine.sql("CREATE TABLE healthcare_db.pat (k INT)")
    engine.sql("INSERT INTO healthcare_db.pat VALUES (1)")
    assert [
        r.table_name
        for r in engine.sql("SHOW TABLES IN healthcare_db").collect()
    ] == ["healthcare_db.pat"]
    # Glue semantics: non-empty database needs CASCADE
    with pytest.raises(ValueError, match="CASCADE"):
        engine.sql("DROP DATABASE healthcare_db")
    engine.sql("DROP DATABASE healthcare_db CASCADE")
    assert engine.sql("SHOW DATABASES").count() == 0
    assert not engine.warehouse.table_exists("healthcare_db.pat")
    engine.sql("DROP DATABASE IF EXISTS healthcare_db")  # no error
    with pytest.raises(ValueError, match="does not exist"):
        engine.sql("DROP DATABASE healthcare_db")


def test_audit_log_queryable_as_sql(engine):
    from sample_emr_on_eks_fgac_iceberg_spark.policy import AccessDeniedException

    engine.sql("CREATE TABLE aud (k INT)")
    engine.policy.grant("alice", "aud")
    engine.session_for("alice").sql("SELECT * FROM aud")
    with pytest.raises(AccessDeniedException):
        engine.session_for("mallet").sql("SELECT * FROM aud")
    rows = engine.sql(
        "SELECT principal, decision, COUNT(*) AS n FROM system.audit_log "
        "GROUP BY principal, decision"
    ).collect()
    got = {(r.principal, r.decision) for r in rows}
    assert ("alice", "granted") in got and ("mallet", "denied") in got


def test_alter_table_rename_to_sql(engine):
    engine.sql("CREATE TABLE sqlrn (k INT)")
    engine.sql("INSERT INTO sqlrn VALUES (1), (2)")
    engine.sql("ALTER TABLE sqlrn RENAME TO sqlrn2")
    assert engine.sql("SELECT COUNT(*) AS n FROM sqlrn2").collect()[0].n == 2
    tables = {r.table_name for r in engine.sql("SHOW TABLES").collect()}
    assert "sqlrn2" in tables and "sqlrn" not in tables


def test_create_table_like(engine):
    engine.sql(
        "CREATE TABLE like_src (k INT, city STRING) PARTITIONED BY (city)"
    )
    engine.sql("INSERT INTO like_src VALUES (1, 'Austin')")
    engine.sql("CREATE TABLE like_dst LIKE like_src")
    # schema + partition spec copied, data NOT copied
    rows = engine.sql("DESCRIBE like_dst").collect()
    assert [(r.col_name, r.data_type) for r in rows] == [
        ("k", "int"),
        ("city", "string"),
    ]
    assert engine.sql("SELECT COUNT(*) AS n FROM like_dst").collect()[0].n == 0
    engine.sql("INSERT INTO like_dst VALUES (9, 'Reno')")
    assert engine.sql("SELECT COUNT(*) AS n FROM like_dst").collect()[0].n == 1
    # IF NOT EXISTS tolerates repeats; plain form errors
    engine.sql("CREATE TABLE IF NOT EXISTS like_dst LIKE like_src")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        engine.sql("CREATE TABLE like_dst LIKE like_src")


def test_show_partitions_and_tblproperties(engine):
    engine.sql(
        "CREATE TABLE spt (k INT, city STRING) PARTITIONED BY (city) "
        "TBLPROPERTIES ('write.delete.mode'='copy-on-write')"
    )
    engine.sql("INSERT INTO spt VALUES (1, 'Austin'), (2, 'Dallas'), (3, 'Austin')")
    parts = [r.partition for r in engine.sql("SHOW PARTITIONS spt").collect()]
    assert parts == ["city=Austin", "city=Dallas"]
    props = {r.key: r.value for r in engine.sql("SHOW TBLPROPERTIES spt").collect()}
    assert props.get("write.delete.mode") == "copy-on-write"
    one = engine.sql("SHOW TBLPROPERTIES spt ('write.delete.mode')").collect()
    assert len(one) == 1 and one[0].value == "copy-on-write"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not have property"):
        engine.sql("SHOW TBLPROPERTIES spt ('nope')")
    engine.sql("CREATE TABLE spt_flat (k INT)")
    with _pytest.raises(ValueError, match="not partitioned"):
        engine.sql("SHOW PARTITIONS spt_flat")


def test_create_or_replace_table(engine):
    engine.sql("CREATE TABLE corr (k INT)")
    engine.sql("INSERT INTO corr VALUES (1)")
    engine.sql("CREATE OR REPLACE TABLE corr (k INT, v STRING)")
    assert engine.sql("SELECT count(*) AS n FROM corr").collect()[0].n == 0
    cols = [f.name for f in engine.warehouse.schema_of("corr").fields]
    assert cols == ["k", "v"]
    # CTAS variant
    engine.sql("INSERT INTO corr VALUES (1, 'a'), (2, 'b')")
    engine.sql("CREATE OR REPLACE TABLE corr AS SELECT k FROM corr WHERE k = 2")
    rows = engine.sql("SELECT * FROM corr").collect()
    assert [r.k for r in rows] == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="IF NOT EXISTS"):
        engine.sql("CREATE OR REPLACE TABLE IF NOT EXISTS corr (k INT)")


# ---------------------------------------------- round-5 review fixes
def test_create_or_replace_never_drops_on_invalid_definition(engine):
    """A failed replacement must leave the old table untouched — the
    original ordering dropped first and validated after (review
    finding, verified live)."""
    engine.sql("CREATE TABLE keepme (k INT)")
    engine.sql("INSERT INTO keepme VALUES (1)")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        engine.sql(
            "CREATE OR REPLACE TABLE keepme (k INT) PARTITIONED BY (nosuch)"
        )
    with _pytest.raises(ValueError):
        engine.sql(
            "CREATE OR REPLACE TABLE keepme PARTITIONED BY (nosuch) "
            "AS SELECT k FROM keepme"
        )
    assert engine.sql("SELECT count(*) AS n FROM keepme").collect()[0].n == 1


def test_dml_subquery_rewrite_spares_string_literals(engine):
    """Dotted table names inside string LITERALS must survive the
    subquery view rewrite (review finding: 'qdb.s' in a comparison
    value was rewritten into a view name and matched nothing)."""
    engine.sql("CREATE DATABASE litdb")
    engine.sql("CREATE TABLE litdb.s (k INT)")
    engine.sql("INSERT INTO litdb.s VALUES (1)")
    engine.sql("CREATE TABLE lit_t (k INT, v STRING)")
    engine.sql("INSERT INTO lit_t VALUES (1, 'litdb.s'), (2, 'other')")
    engine.sql(
        "DELETE FROM lit_t WHERE v = 'litdb.s' "
        "AND k IN (SELECT k FROM litdb.s)"
    )
    rows = [(r.k, r.v) for r in engine.sql("SELECT * FROM lit_t").collect()]
    assert rows == [(2, "other")]


def test_show_partitions_reflects_current_snapshot(engine):
    """Copy-on-write keeps dead files for time travel; SHOW PARTITIONS
    must list only partitions with live rows (review finding)."""
    engine.sql("CREATE TABLE spp (k INT, city STRING) PARTITIONED BY (city)")
    engine.sql("INSERT INTO spp VALUES (1, 'Austin'), (2, 'Dallas')")
    engine.sql("DELETE FROM spp WHERE city = 'Dallas'")
    parts = [r.partition for r in engine.sql("SHOW PARTITIONS spp").collect()]
    assert parts == ["city=Austin"]


def test_cte_insert_ignores_insert_inside_comments(engine):
    """The top-level INSERT scanner must skip SQL comments (review
    finding: a comment mentioning INSERT INTO was lifted as the
    clause)."""
    engine.sql("CREATE TABLE cmt (k INT)")
    engine.sql(
        "WITH c AS (SELECT 5 AS k) /* note: INSERT INTO decoy */ "
        "INSERT INTO cmt SELECT * FROM c"
    )
    assert [r.k for r in engine.sql("SELECT * FROM cmt").collect()] == [5]


def test_dml_subquery_views_do_not_outlive_dropped_tables(engine):
    """A dropped table's leftover DML temp view must not serve stale
    data to a later subquery (review finding)."""
    engine.sql("CREATE TABLE dv_t (k INT)")
    engine.sql("INSERT INTO dv_t VALUES (1), (2)")
    engine.sql("CREATE TABLE dv_s (k INT)")
    engine.sql("INSERT INTO dv_s VALUES (1)")
    engine.sql("DELETE FROM dv_t WHERE k IN (SELECT k FROM dv_s)")  # registers views
    engine.sql("DROP TABLE dv_s")
    import pytest as _pytest

    with _pytest.raises(Exception, match="dv_s|not.*exist|NOT_FOUND"):
        engine.sql("DELETE FROM dv_t WHERE k IN (SELECT k FROM dv_s)")


# --------------------------------- branch/tag DDL (round 11)
def test_alter_table_tag_branch_ddl(spark, tmp_path):
    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
        SnapshotNotFoundError,
        Warehouse,
    )
    from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend

    wh = Warehouse(spark, str(tmp_path / "wh"))
    fe = SqlFrontend(spark, wh)
    fe.execute("CREATE TABLE t (k INT)")
    fe.execute("INSERT INTO t VALUES (1)")
    fe.execute("ALTER TABLE t CREATE TAG v1")
    fe.execute("INSERT INTO t VALUES (2)")
    fe.execute("ALTER TABLE t CREATE BRANCH dev AS OF VERSION 1")
    # tag pins snapshot 1; branch points at snapshot 1 explicitly
    assert sorted(
        r[0] for r in fe.execute("SELECT k FROM t VERSION AS OF 'v1'").collect()
    ) == [1]
    assert sorted(
        r[0] for r in fe.execute("SELECT k FROM t VERSION AS OF 'dev'").collect()
    ) == [1]
    # duplicate CREATE refuses; CREATE OR REPLACE upserts to head
    with pytest.raises(ValueError, match="already exists"):
        fe.execute("ALTER TABLE t CREATE TAG v1")
    fe.execute("ALTER TABLE t CREATE OR REPLACE TAG v1")
    assert sorted(
        r[0] for r in fe.execute("SELECT k FROM t VERSION AS OF 'v1'").collect()
    ) == [1, 2]
    # bare REPLACE requires existence and matching kind
    with pytest.raises(ValueError, match="Unknown ref"):
        fe.execute("ALTER TABLE t REPLACE BRANCH nope AS OF VERSION 1")
    with pytest.raises(ValueError, match="is a tag"):
        fe.execute("ALTER TABLE t REPLACE BRANCH v1 AS OF VERSION 1")
    # kind-checked drops; IF EXISTS swallows missing
    with pytest.raises(ValueError, match="is a branch"):
        fe.execute("ALTER TABLE t DROP TAG dev")
    fe.execute("ALTER TABLE t DROP BRANCH dev")
    with pytest.raises(ValueError, match="Unknown ref"):
        fe.execute("ALTER TABLE t DROP BRANCH dev")
    fe.execute("ALTER TABLE t DROP BRANCH IF EXISTS dev")
    with pytest.raises(SnapshotNotFoundError):
        fe.execute("SELECT k FROM t VERSION AS OF 'dev'").collect()


# --------------------------------- SQL-defined functions (round 11)
def test_create_sql_function_and_use(spark, tmp_path):
    """Spark 4 SQL scalar UDFs through the frontend: the definition
    survives the per-query scratch-session isolation (replayed DDL),
    resolves inside DML predicates on the primary session, and obeys
    CREATE/OR REPLACE/DROP [IF EXISTS] semantics."""
    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse
    from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend

    wh = Warehouse(spark, str(tmp_path / "wh"))
    fe = SqlFrontend(spark, wh)
    fe.execute("CREATE TABLE t (k INT, p DOUBLE, d DOUBLE)")
    fe.execute("INSERT INTO t VALUES (1, 100.0, 0.1), (2, 50.0, 0.5)")
    # persistent (non-TEMPORARY) CREATE FUNCTION refuses loudly instead
    # of silently downgrading to session scope (ADVICE r11)
    with pytest.raises(ValueError, match="TEMPORARY"):
        fe.execute(
            "CREATE FUNCTION net(p DOUBLE, d DOUBLE) RETURNS DOUBLE "
            "RETURN p * (1 - d)"
        )
    fe.execute(
        "CREATE TEMPORARY FUNCTION net(p DOUBLE, d DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1 - d)"
    )
    got = sorted(
        tuple(r) for r in fe.execute("SELECT k, net(p, d) AS n FROM t").collect()
    )
    assert got == [(1, 90.0), (2, 25.0)]
    # duplicate CREATE refuses; OR REPLACE redefines
    with pytest.raises(ValueError, match="already exists"):
        fe.execute(
            "CREATE TEMPORARY FUNCTION net(p DOUBLE) RETURNS DOUBLE RETURN p"
        )
    fe.execute(
        "CREATE OR REPLACE TEMPORARY FUNCTION net(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d) * 2"
    )
    got = sorted(
        r["n"] for r in fe.execute("SELECT net(p, d) AS n FROM t").collect()
    )
    assert got == [50.0, 180.0]
    # resolves inside a DML predicate (primary-session registration)
    fe.execute("DELETE FROM t WHERE net(p, d) > 100")
    assert sorted(r[0] for r in fe.execute("SELECT k FROM t").collect()) == [2]
    # drop semantics
    fe.execute("DROP FUNCTION net")
    with pytest.raises(ValueError, match="Unknown function"):
        fe.execute("DROP FUNCTION net")
    fe.execute("DROP FUNCTION IF EXISTS net")
