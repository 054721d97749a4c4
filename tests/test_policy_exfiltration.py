"""Adversarial write-path FGAC: the round-3 verdict's confirmed bypass
and its family. A principal holding only SELECT+INSERT on their own
scratch table must not be able to read any other table through a DML
source clause — not by name, not by file path, not by glob, not by a
foreign temp view. The reference's threat model (user code never
touches storage; the query-engine role does — consumer_account_setup/
consumer_emr_on_eks_setup.sh:18-19) makes every one of these a
plan-time AccessDeniedException.

Defense layers under test:
1. SecureSession._authorize_write_sources — plan-based relation
   authorization (Spark's own parser; unknown identifiers deny).
2. File-relation token / path-like identifier rejection.
3. SqlFrontend sessions run with spark.sql.runSQLOnFiles=false, so a
   path relation that somehow reached the trusted side cannot resolve.
"""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.policy import (
    DESCRIBE,
    INSERT,
    SELECT,
    AccessDeniedException,
)


@pytest.fixture()
def engine(spark, tmp_path):
    e = FgacEngine(spark, str(tmp_path / "wh"))
    # victim table: same shape the verdict's probe used (SSNs)
    e.sql("CREATE TABLE secrets (id INT, ssn STRING)")
    e.sql("INSERT INTO secrets VALUES (1, '123-45-6789'), (2, '987-65-4321')")
    # attacker-owned scratch table, schema-compatible with the victim
    e.sql("CREATE TABLE scratch (id INT, ssn STRING)")
    e.policy.grant("mallory", "scratch", {SELECT, DESCRIBE, INSERT})
    return e


def _scratch_rows(engine):
    return [tuple(r) for r in engine.warehouse.read_table("scratch").collect()]


def test_verdict_probe_glob_path_insert_denied(engine):
    """The exact round-3 probe: glob path as INSERT source."""
    sess = engine.session_for("mallory")
    data_dir = engine.warehouse.data_dir("secrets")
    glob = data_dir.replace("secrets", "secre*")
    with pytest.raises(AccessDeniedException):
        sess.sql(f"INSERT INTO scratch SELECT * FROM parquet.`{glob}`")
    assert _scratch_rows(engine) == []


def test_direct_path_insert_denied(engine):
    sess = engine.session_for("mallory")
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(AccessDeniedException):
        sess.sql(f"INSERT INTO scratch SELECT * FROM parquet.`{data_dir}`")
    assert _scratch_rows(engine) == []


@pytest.mark.parametrize("fmt", ["csv", "json", "text", "orc", "binaryFile"])
def test_other_format_spellings_denied(engine, fmt):
    sess = engine.session_for("mallory")
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(AccessDeniedException):
        sess.sql(f"INSERT INTO scratch SELECT * FROM {fmt}.`{data_dir}`")


def test_whitespace_dodge_denied(engine):
    """`parquet . `path`` with creative spacing parses identically."""
    sess = engine.session_for("mallory")
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(AccessDeniedException):
        sess.sql(f"INSERT INTO scratch SELECT * FROM parquet .\n`{data_dir}`")


def test_merge_using_path_denied(engine):
    sess = engine.session_for("mallory")
    engine.policy.grant(
        "mallory", "scratch", {SELECT, DESCRIBE, INSERT, "DELETE"}
    )
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(AccessDeniedException):
        sess.sql(
            f"MERGE INTO scratch t USING (SELECT * FROM parquet.`{data_dir}`) s "
            "ON t.id = s.id WHEN NOT MATCHED THEN INSERT (id, ssn) "
            "VALUES (s.id, s.ssn)"
        )


def test_insert_overwrite_from_path_denied(engine):
    sess = engine.session_for("mallory")
    engine.policy.grant(
        "mallory", "scratch", {SELECT, DESCRIBE, INSERT, "DELETE"}
    )
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(AccessDeniedException):
        sess.sql(f"INSERT OVERWRITE scratch SELECT * FROM parquet.`{data_dir}`")


def test_quoted_identifier_source_requires_grant(engine):
    """Backtick-quoting the victim table name is still the victim
    table — the parsed plan sees through the spelling."""
    sess = engine.session_for("mallory")
    with pytest.raises(AccessDeniedException):
        sess.sql("INSERT INTO scratch SELECT * FROM `secrets`")
    assert _scratch_rows(engine) == []


def test_foreign_temp_view_reference_denied(engine):
    """An identifier that is not a known warehouse table fails closed —
    including views the trusted frontend registered for its own use."""
    sess = engine.session_for("mallory")
    with pytest.raises(AccessDeniedException):
        sess.sql("INSERT INTO scratch SELECT * FROM __wh_secrets")


def test_values_union_tail_denied(engine):
    """VALUES tails are parsed as queries on the trusted side, so a
    UNION smuggled into one is a source clause like any other."""
    sess = engine.session_for("mallory")
    with pytest.raises(AccessDeniedException):
        sess.sql(
            "INSERT INTO scratch VALUES (0, 'x') "
            "UNION ALL SELECT id, ssn FROM secrets"
        )


def test_subquery_in_source_denied(engine):
    """Subqueries nested anywhere in the statement are authorized too."""
    sess = engine.session_for("mallory")
    with pytest.raises(AccessDeniedException):
        sess.sql(
            "INSERT INTO scratch SELECT id, "
            "(SELECT max(ssn) FROM secrets) AS ssn FROM scratch"
        )


def test_granted_source_still_works(engine):
    """The guard denies exfiltration, not legitimate DML: with SELECT
    on the source, the same statement executes."""
    engine.policy.grant("mallory", "secrets", {SELECT})
    sess = engine.session_for("mallory")
    sess.sql("INSERT INTO scratch SELECT * FROM secrets")
    assert sorted(_scratch_rows(engine)) == [
        (1, "123-45-6789"),
        (2, "987-65-4321"),
    ]


def test_frontend_sessions_refuse_sql_on_files(engine):
    """Layer 3: even the trusted frontend's sessions have SQL-on-files
    off — a path relation cannot resolve there at all."""
    from pyspark.sql.utils import AnalysisException

    engine.sql("SHOW TABLES")  # force frontend construction
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(AnalysisException):
        engine.sql(f"SELECT * FROM parquet.`{data_dir}`").collect()
    assert (
        engine._sql_frontend.spark.conf.get("spark.sql.runSQLOnFiles") == "false"
    )


def test_no_file_relation_in_delegated_plan(engine):
    """Plan-shape regression guard (verdict task 6): the analyzed plan
    of a legitimately delegated DML source must contain only the
    engine's registered warehouse views — no file relation resolved
    from statement text. Asserted on the frontend's own scratch
    session: a path relation raises instead of resolving to a scan."""
    engine.sql("SHOW TABLES")
    frontend = engine._sql_frontend
    data_dir = engine.warehouse.data_dir("secrets")
    with pytest.raises(Exception, match="not allowed|NOT_ALLOWED|not found|TABLE_OR_VIEW"):
        frontend._query(f"SELECT * FROM parquet.`{data_dir}`")
    # and a table-name source resolves through the registered view, not
    # a path relation parsed out of statement text
    df = frontend._query("SELECT * FROM secrets")
    plan = df._jdf.queryExecution().analyzed().toString().lower()
    assert "unresolvedrelation" not in plan and "parquet.`" not in plan


@pytest.mark.parametrize(
    "stmt",
    [
        "FROM secrets INSERT INTO scratch SELECT *",
        "WITH c AS (SELECT id, ssn FROM secrets) INSERT INTO scratch SELECT * FROM c",
        # CTE body reads secrets through a nested subquery
        "WITH c AS (SELECT 1 AS id, (SELECT first(ssn) FROM secrets) AS ssn) "
        "INSERT INTO scratch SELECT * FROM c",
        # CTE named after the victim table: Spark resolves the body's
        # self-reference against the OUTER scope (the real table), so
        # the shadowing name requires the grant — fail closed
        "WITH secrets AS (SELECT id, ssn FROM secrets) "
        "INSERT INTO scratch SELECT * FROM secrets",
    ],
)
def test_write_spellings_that_dodge_shape_regexes_denied(engine, stmt):
    """Round-4 hardening, narrowed in round 5: `WITH … INSERT` is now a
    SUPPORTED write for a write-granted principal, so the denial must
    come from source authorization (every relation in the parsed plan,
    including CTE bodies and their subqueries, needs unfiltered
    SELECT), not from a blanket plan-class refusal. Hive-style
    FROM…INSERT remains denied on the plan class."""
    sess = engine.session_for("mallory")
    with pytest.raises(AccessDeniedException):
        sess.sql(stmt)
    assert _scratch_rows(engine) == []


def test_cte_insert_without_table_reads_is_a_legitimate_write(engine):
    """The flip side of the denial cases above: a CTE-prefixed INSERT
    whose plan references no ungranted relation executes for a
    principal holding INSERT on the target — the round-4 blanket
    refusal is gone, the round-3 exfiltration guarantees stay."""
    sess = engine.session_for("mallory")
    sess.sql(
        "WITH c AS (SELECT 7 AS id, 'mine' AS ssn) "
        "INSERT INTO scratch SELECT * FROM c"
    )
    assert _scratch_rows(engine) == [(7, "mine")]


def test_spj_mirror_tables_not_readable_by_consumers(spark, tmp_path):
    """Round-12 probe: SPJ bucketed mirrors are PERMANENT tables in the
    shared session catalog — every session of the context can resolve
    them, and they hold UNFILTERED rows. A consumer SELECT naming a
    mirror (or any other non-temporary catalog table) must deny at
    plan time; a granted table keeps working; a typo'd name stays
    TABLE_OR_VIEW_NOT_FOUND, never a denial."""
    e = FgacEngine(spark, str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE vault (k BIGINT, ssn STRING) "
        "PARTITIONED BY (bucket(4, k))"
    )
    e.sql("INSERT INTO vault VALUES (1, 'SECRET-1'), (2, 'SECRET-2')")
    e.sql(
        "CREATE TABLE lookup (dk BIGINT, x STRING) "
        "PARTITIONED BY (bucket(4, dk))"
    )
    e.sql("INSERT INTO lookup VALUES (1, 'a')")
    # producer SQL join materializes both mirrors in the shared catalog
    assert e.sql("SELECT * FROM vault JOIN lookup ON k = dk").count() == 1
    mirrors = [
        t.name for t in spark.catalog.listTables() if t.name.startswith("__spj_")
    ]
    assert len(mirrors) >= 2
    e.policy.grant("mallory", "lookup", {SELECT, DESCRIBE})
    sess = e.session_for("mallory")
    for m in mirrors:
        with pytest.raises(AccessDeniedException):
            sess.sql(f"SELECT * FROM {m}")
        with pytest.raises(AccessDeniedException):
            sess.sql(f"SELECT count(*) FROM (SELECT * FROM {m})")
    # granted reads still work, and unknown names stay NOT_FOUND
    assert sess.sql("SELECT * FROM lookup").count() == 1
    with pytest.raises(Exception) as ei:
        sess.sql("SELECT * FROM lookupp").collect()
    assert "TABLE_OR_VIEW_NOT_FOUND" in str(ei.value) or "cannot be found" in str(
        ei.value
    )
    assert not isinstance(ei.value, AccessDeniedException)
    # a CTE may shadow a mirror's name (it is a local relation)
    got = sess.sql(
        f"WITH {mirrors[0]} AS (SELECT 1 AS one) SELECT * FROM {mirrors[0]}"
    ).collect()
    assert [tuple(r) for r in got] == [(1,)]
