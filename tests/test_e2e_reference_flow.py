"""End-to-end replay of the reference's consumer lifecycle (SURVEY §3):
the two EMR-on-EKS jobs exactly as consumer_emr_on_eks_setup.sh runs
them — team1's FGAC-filtered scans + the flagship join (sh:400-417),
then team2's positive claims read and negative patients read with the
job continuing through the denial (sh:472-494). One test per job so a
failure pinpoints the entry point, plus the producer-side setup story
(sh/producer_iceberg_datalake_setup.sh) asserted along the way."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import (
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


def test_job1_team1_flagship_flow(engine):
    """consumer_emr_on_eks_setup.sh:400-417 — E1 session, S1 patients
    scan (FGAC: 8 of 12 rows, ssn hidden), S2 claims scan, J1+P2+O1+L1
    flagship join with the reference's exact ordering."""
    sess = engine.session_for(TEAM1)

    df1 = sess.sql("SELECT * FROM patients")  # sh:407
    rows1 = df1.limit(21).collect()  # L1: df1.show(20)
    assert len(rows1) == 8
    assert "ssn" not in df1.columns and len(df1.columns) == 8
    assert {r.state for r in rows1} == {"Texas", "New York"}

    df2 = sess.sql(
        """
        SELECT p.state, c.claim_id, c.claim_date, p.patient_name,
               c.diagnosis_code, c.procedure_code, c.amount, c.status,
               c.provider_id
        FROM claims c JOIN patients p ON c.patient_id = p.patient_id
        ORDER BY p.state, c.claim_date
        """  # sh:412 (P2 projection, J1 join, O1 sort)
    )
    rows2 = df2.limit(21).collect()
    assert [r.claim_id for r in rows2] == [
        "CLM010", "CLM009",              # New York by claim_date
        "CLM007", "CLM008", "CLM005", "CLM006",  # Texas by claim_date
    ]
    assert df2.columns[0] == "state" and len(df2.columns) == 9
    # T3: DECIMAL(10,2) exactness through the policy path
    amounts = {r.claim_id: str(r.amount) for r in rows2}
    assert amounts["CLM006"] == "500.00" and amounts["CLM008"] == "50.00"
    sess.stop()  # E4


def test_job2_team2_negative_flow(engine):
    """consumer_emr_on_eks_setup.sh:472-494 — claims read succeeds,
    patients read raises AccessDeniedException, and the job CONTINUES
    (the reference catches the error and prints; it must not poison the
    session)."""
    sess = engine.session_for(TEAM2)

    claims = sess.sql("SELECT * FROM claims").limit(21).collect()  # sh:478
    assert len(claims) == 10

    denied = False
    try:
        sess.sql("SELECT * FROM patients").collect()  # sh:481
    except Exception as e:  # noqa: BLE001 — the reference string-matches
        denied = "AccessDeniedException" in str(e)
    assert denied

    # the session must remain usable after the denial (sh continues to
    # spark.stop() without re-creating the session)
    again = sess.sql(
        "SELECT COUNT(*) AS n FROM claims WHERE status = 'Approved'"
    ).collect()
    assert again[0].n == 6
    sess.stop()
