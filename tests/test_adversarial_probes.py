"""Adversarial FGAC battery — the attack vectors a hostile consumer
would try, kept as regression tests (each class of these found a real
hole in some earlier round: the glob-path DML source, the textual
known-tables scan, the trusted-frontend delegation)."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import TEAM1, setup_healthcare
from sample_emr_on_eks_fgac_iceberg_spark.policy import (
    INSERT,
    SELECT,
    AccessDeniedException,
)


@pytest.fixture()
def rig(spark, tmp_path):
    wh_dir = str(tmp_path / "wh")
    eng = FgacEngine(spark, wh_dir)
    setup_healthcare(eng)
    eng.sql("CREATE TABLE scratch (x STRING)")
    eng.policy.grant("mallory", "scratch", {SELECT, INSERT})
    return eng, eng.session_for("mallory"), wh_dir


DENIED_STATEMENTS = [
    pytest.param(
        "WITH x AS (SELECT patient_name FROM patients) "
        "INSERT INTO scratch SELECT * FROM x",
        id="cte-smuggled-insert",
    ),
    pytest.param(
        "INSERT INTO scratch VALUES ((SELECT ssn FROM patients LIMIT 1))",
        id="values-scalar-subquery",
    ),
    pytest.param(
        "MERGE INTO scratch USING (SELECT patient_name AS x FROM patients) s "
        "ON scratch.x = s.x WHEN NOT MATCHED THEN INSERT *",
        id="merge-using-ungranted",
    ),
    pytest.param("SELECT * FROM patients VERSION AS OF 1", id="time-travel"),
    pytest.param("SELECT * FROM patients.snapshots", id="metadata-table"),
    pytest.param("EXPLAIN SELECT * FROM patients", id="explain-ungranted"),
    pytest.param(
        "CREATE VIEW mv AS SELECT * FROM patients", id="view-over-ungranted"
    ),
    pytest.param(
        "INSERT OVERWRITE scratch SELECT patient_name FROM patients",
        id="overwrite-from-ungranted",
    ),
    pytest.param(
        "INSERT INTO scratch SELECT x FROM scratch "
        "UNION ALL SELECT patient_name FROM patients",
        id="union-smuggle",
    ),
    pytest.param(
        "INSERT/**/INTO scratch SELECT patient_name FROM patients",
        id="comment-obfuscated-keyword",
    ),
    pytest.param(
        "INSERT INTO scratch SELECT patient_name FROM `patients`",
        id="backtick-quoted-table",
    ),
]


@pytest.mark.parametrize("stmt", DENIED_STATEMENTS)
def test_exfiltration_vector_denied(rig, stmt):
    eng, mallory, wh_dir = rig
    with pytest.raises(AccessDeniedException):
        r = mallory.sql(stmt)
        if r is not None:
            r.collect()
    # nothing leaked into the scratch table either
    assert mallory.sql("SELECT * FROM scratch").count() == 0


def test_glob_path_source_denied(rig):
    eng, mallory, wh_dir = rig
    with pytest.raises(AccessDeniedException):
        mallory.sql(
            f"INSERT INTO scratch SELECT patient_name FROM parquet.`{wh_dir}/patient*/data`"
        )


def test_audit_log_not_reachable_from_consumer(rig):
    eng, mallory, _ = rig
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND"):
        mallory.sql("SELECT * FROM system.audit_log").collect()


def test_legitimate_scratch_use_still_works(rig):
    eng, mallory, _ = rig
    mallory.sql("INSERT INTO scratch VALUES ('x')")
    assert mallory.sql("SELECT * FROM scratch").count() == 1
    assert mallory.sql("EXPLAIN SELECT * FROM scratch").count() == 1


def test_another_principals_view_is_invokers_rights(rig):
    """A view team1 created over patients must deny mallory (invoker's
    rights: the READER's grants decide), not serve team1's rows."""
    eng, mallory, _ = rig
    eng.session_for(TEAM1).sql("CREATE VIEW tv AS SELECT patient_id FROM patients")
    with pytest.raises(AccessDeniedException):
        mallory.sql("SELECT * FROM tv").collect()
