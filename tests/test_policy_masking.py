"""Column-level masking in the FGAC layer: value vending instead of
column hiding. Extends the reference's drop-only DataCellsFilter
(producer_iceberg_datalake_setup.sh:240-256) with `column_masks` —
the masked column keeps its name and type, the cleartext never leaves
the policy layer, and the mask composes with the row filter exactly
like the column whitelist does."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import TEAM1, setup_healthcare
from sample_emr_on_eks_fgac_iceberg_spark.policy import DataCellsFilter

AUDITOR = "auditor-team"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = FgacEngine(spark, str(tmp_path_factory.mktemp("warehouse")))
    setup_healthcare(eng)
    # auditors see all TX/NY patients with last-4 SSN vending
    eng.policy.create_data_cells_filter(
        DataCellsFilter(
            name="patients_masked_ssn",
            table="patients",
            row_filter="state in ('Texas', 'New York')",
            column_masks={"ssn": "concat('XXX-XX-', substr(ssn, 8, 4))"},
        )
    )
    eng.policy.grant(AUDITOR, "patients", filter_name="patients_masked_ssn")
    return eng


def test_masked_scan_vends_partial_values(engine):
    df = engine.session_for(AUDITOR).sql("SELECT patient_id, ssn FROM patients")
    rows = df.collect()
    assert len(rows) == 8  # row filter still composes
    assert all(r.ssn.startswith("XXX-XX-") and len(r.ssn) == 11 for r in rows)
    # last-4 is the real suffix, not a constant
    assert len({r.ssn for r in rows}) > 1


def test_masked_column_keeps_schema(engine):
    df = engine.session_for(AUDITOR).sql("SELECT * FROM patients")
    assert "ssn" in df.columns  # masked, not hidden
    assert dict(df.dtypes)["ssn"] == "string"


def test_mask_not_bypassable_via_expressions(engine):
    # any expression over ssn sees only masked values
    rows = engine.session_for(AUDITOR).sql(
        "SELECT substr(ssn, 1, 6) AS head FROM patients"
    ).collect()
    assert {r.head for r in rows} == {"XXX-XX"}


def test_team1_unaffected(engine):
    # the original drop-column filter still governs team1
    df = engine.session_for(TEAM1).sql("SELECT * FROM patients")
    assert "ssn" not in df.columns


def test_unknown_mask_column_rejected(engine):
    f = DataCellsFilter(
        name="bad_mask",
        table="patients",
        column_masks={"nope": "'x'"},
    )
    engine.policy.create_data_cells_filter(f)
    engine.policy.grant("other-team", "patients", filter_name="bad_mask")
    with pytest.raises(Exception, match="unknown columns"):
        engine.session_for("other-team").sql("SELECT * FROM patients").collect()
