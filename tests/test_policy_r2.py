"""Round-2 FGAC hardening (VERDICT items 4/5/10 + ADVICE): grant-option
delegation, live policy re-resolution on the SQL path, path-based-read
lockdown, SQL DESCRIBE under the column whitelist, and catalog-qualified
resource links."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import (
    QUALIFIED_RL_PATIENTS,
    TEAM1,
    TEAM2,
    setup_healthcare,
)
from sample_emr_on_eks_fgac_iceberg_spark.policy import AccessDeniedException


@pytest.fixture()
def engine(spark, tmp_path):
    eng = FgacEngine(spark, str(tmp_path / "wh"))
    setup_healthcare(eng)
    return eng


# ----------------------------------------------------- grant delegation
def test_grant_with_option_delegates(engine):
    engine.policy.grant("consumer_admin", "claims", grant_option=True)
    engine.policy.grant("team3", "claims", granted_by="consumer_admin")
    assert engine.session_for("team3").sql("SELECT * FROM claims").count() == 10


def test_grant_without_option_cannot_delegate(engine):
    engine.policy.grant("plain_user", "claims", grant_option=False)
    with pytest.raises(AccessDeniedException):
        engine.policy.grant("team3", "claims", granted_by="plain_user")


def test_unknown_grantor_cannot_delegate(engine):
    with pytest.raises(AccessDeniedException):
        engine.policy.grant("team3", "claims", granted_by="nobody")


def test_delegation_cannot_widen_permissions(engine):
    engine.policy.grant(
        "select_only_admin", "claims", permissions={"SELECT"}, grant_option=True
    )
    with pytest.raises(AccessDeniedException):
        engine.policy.grant(
            "team3", "claims", permissions={"SELECT", "DESCRIBE"},
            granted_by="select_only_admin",
        )


# ------------------------------------------- live policy re-resolution
def test_revoke_propagates_to_live_session_sql(engine):
    sess = engine.session_for(TEAM1)
    assert sess.sql("SELECT * FROM claims").count() == 10
    engine.policy.revoke(TEAM1, "claims")
    with pytest.raises(AccessDeniedException):
        sess.sql("SELECT * FROM claims").collect()


def test_filter_delete_fails_closed_not_keyerror(engine):
    sess = engine.session_for(TEAM1)
    assert sess.sql("SELECT * FROM patients").count() == 8
    engine.policy.delete_data_cells_filter("patients_column_row_filter")
    with pytest.raises(AccessDeniedException):
        sess.sql("SELECT * FROM patients").collect()
    # other tables in the same live session keep working
    assert sess.sql("SELECT * FROM claims").count() == 10


# ------------------------------------------------- path-based lockdown
def test_path_based_read_is_blocked(engine):
    sess = engine.session_for(TEAM1)
    path = engine.warehouse.data_dir("patients")
    with pytest.raises(Exception) as exc_info:
        sess.sql(f"SELECT ssn FROM parquet.`{path}`").collect()
    assert "ssn" not in str(type(exc_info.value))  # denial, never data


# ----------------------------------------------------- DESCRIBE via SQL
def test_describe_sql_honors_whitelist(engine):
    rows = engine.session_for(TEAM1).sql("DESCRIBE patients").collect()
    cols = [r.col_name for r in rows]
    assert "ssn" not in cols and "patient_name" in cols and len(cols) == 8


def test_describe_sql_denied_for_ungranted(engine):
    with pytest.raises(AccessDeniedException):
        engine.session_for(TEAM2).sql("DESCRIBE patients")


# ------------------------------------------- catalog-qualified links
def test_qualified_scan_team1(engine):
    sess = engine.session_for(TEAM1)
    df = sess.sql(f"SELECT * FROM {QUALIFIED_RL_PATIENTS}")
    rows = df.collect()
    assert len(rows) == 8 and "ssn" not in df.columns
    tx = sess.sql(
        f"SELECT patient_id FROM {QUALIFIED_RL_PATIENTS} WHERE state = 'Texas'"
    ).collect()
    assert sorted(r.patient_id for r in tx) == [1005, 1006, 1007, 1008]


def test_qualified_scan_denied_team2(engine):
    with pytest.raises(AccessDeniedException):
        engine.session_for(TEAM2).sql(
            f"SELECT * FROM {QUALIFIED_RL_PATIENTS}"
        ).collect()


def test_qualified_table_api_path(engine):
    df = engine.session_for(TEAM1).table(QUALIFIED_RL_PATIENTS)
    assert df.count() == 8 and "ssn" not in df.columns
