"""The reference's exact two-table healthcare fixture, recreated through
the engine's own DDL/DML so policy tests run on engine-managed tables.

Data values are the reference's golden corpus (FIXTURES.md §A):
patients rows from producer_account_setup/
producer_iceberg_datalake_setup.sh:143-157, claims rows from :197-209,
DDL from :116-131 and :169-187, policy from :240-256, principal matrix
from consumer_account_setup/consumer_emr_on_eks_setup.sh:293-342.

Golden expectations (consumer_emr_on_eks_setup.sh:407-414, 478-488):
- team1 `SELECT * FROM patients` → 8 rows × 8 cols (no ssn, TX/NY only)
- team1 claims⋈patients join     → 6 rows (CLM005-CLM010)
- team2 `SELECT * FROM claims`   → 10 rows; patients → AccessDenied
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.policy import DataCellsFilter

PATIENTS_SCHEMA = (
    "patient_id BIGINT, patient_name STRING, date_of_birth DATE, "
    "gender STRING, city STRING, state STRING, ssn STRING, "
    "created_at TIMESTAMP, updated_at TIMESTAMP"
)

CLAIMS_SCHEMA = (
    "claim_id STRING, patient_id BIGINT, claim_date DATE, "
    "diagnosis_code STRING, procedure_code STRING, amount DECIMAL(10,2), "
    "status STRING, provider_id STRING, created_at TIMESTAMP, "
    "updated_at TIMESTAMP"
)


def _ts(h: int, m: int) -> dt.datetime:
    return dt.datetime(2025, 3, 28, h, m, 0)


# producer_iceberg_datalake_setup.sh:145-156 — 12 rows
PATIENTS_ROWS = [
    (1001, "fgac1 John", dt.date(1980, 5, 15), "M", "Los Angeles", "California", "123-45-6789", _ts(10, 0), _ts(10, 0)),
    (1002, "fgac2 Maria", dt.date(1992, 8, 22), "F", "San Francisco", "California", "234-56-7890", _ts(10, 5), _ts(10, 5)),
    (1003, "fgac3 David", dt.date(1975, 12, 1), "M", "San Diego", "California", "345-67-8901", _ts(10, 10), _ts(10, 10)),
    (1004, "fgac4 Sarah", dt.date(1988, 3, 30), "F", "Sacramento", "California", "456-78-9012", _ts(10, 15), _ts(10, 15)),
    (1005, "fgac5 Robert", dt.date(1995, 7, 7), "M", "Houston", "Texas", "567-89-0123", _ts(10, 20), _ts(10, 20)),
    (1006, "fgac6 Emily", dt.date(1982, 11, 18), "F", "Austin", "Texas", "678-90-1234", _ts(10, 25), _ts(10, 25)),
    (1007, "fgac7 Michael", dt.date(1979, 9, 25), "M", "Dallas", "Texas", "789-01-2345", _ts(10, 30), _ts(10, 30)),
    (1008, "fgac8 Lisa", dt.date(1990, 2, 14), "F", "San Antonio", "Texas", "890-12-3456", _ts(10, 35), _ts(10, 35)),
    (1009, "fgac9 James", dt.date(1987, 6, 3), "M", "New York City", "New York", "901-23-4567", _ts(10, 40), _ts(10, 40)),
    (1010, "fgac10 Amanda", dt.date(1993, 4, 11), "F", "Buffalo", "New York", "012-34-5678", _ts(10, 45), _ts(10, 45)),
    (1011, "fgac11 Kevin", dt.date(1985, 8, 19), "M", "Rochester", "New York", "123-45-6789", _ts(10, 50), _ts(10, 50)),
    (1012, "fgac12 Rachel", dt.date(1991, 12, 25), "F", "Albany", "New York", "234-56-7890", _ts(10, 55), _ts(10, 55)),
]

# producer_iceberg_datalake_setup.sh:199-208 — 10 rows
CLAIMS_ROWS = [
    ("CLM001", 1001, dt.date(2025, 3, 15), "J45.901", "99213", Decimal("150.00"), "Approved", "DR123", _ts(11, 0), _ts(11, 0)),
    ("CLM002", 1002, dt.date(2025, 3, 20), "M54.5", "97110", Decimal("200.00"), "Pending", "DR456", _ts(11, 5), _ts(11, 5)),
    ("CLM003", 1003, dt.date(2025, 3, 25), "I10", "99214", Decimal("175.00"), "Approved", "DR789", _ts(11, 10), _ts(11, 10)),
    ("CLM004", 1004, dt.date(2025, 3, 18), "E11.9", "82947", Decimal("80.00"), "Approved", "DR234", _ts(11, 15), _ts(11, 15)),
    ("CLM005", 1005, dt.date(2025, 3, 22), "J30.1", "95004", Decimal("300.00"), "Pending", "DR567", _ts(11, 20), _ts(11, 20)),
    ("CLM006", 1006, dt.date(2025, 3, 27), "K21.9", "43235", Decimal("500.00"), "Approved", "DR890", _ts(11, 25), _ts(11, 25)),
    ("CLM007", 1007, dt.date(2025, 3, 16), "M25.511", "73560", Decimal("125.00"), "Denied", "DR012", _ts(11, 30), _ts(11, 30)),
    ("CLM008", 1008, dt.date(2025, 3, 21), "N39.0", "81001", Decimal("50.00"), "Approved", "DR345", _ts(11, 35), _ts(11, 35)),
    ("CLM009", 1009, dt.date(2025, 3, 26), "L40.0", "96910", Decimal("250.00"), "Pending", "DR678", _ts(11, 40), _ts(11, 40)),
    ("CLM010", 1010, dt.date(2025, 3, 19), "F41.1", "90834", Decimal("180.00"), "Approved", "DR901", _ts(11, 45), _ts(11, 45)),
]

# producer_iceberg_datalake_setup.sh:243 — all columns except ssn
PATIENT_ALLOWED_COLUMNS = (
    "patient_id",
    "patient_name",
    "date_of_birth",
    "gender",
    "city",
    "state",
    "created_at",
    "updated_at",
)

# producer_iceberg_datalake_setup.sh:246-248
PATIENT_ROW_FILTER = "state in ('Texas', 'New York')"

TEAM1 = "team1"  # patients-via-filter + claims (consumer_emr_on_eks_setup.sh:323-342)
TEAM2 = "team2"  # claims only (consumer_emr_on_eks_setup.sh:293-321)

# The consumer job's 3-part name (consumer_emr_on_eks_setup.sh:407).
QUALIFIED_RL_PATIENTS = "dev.consumer_healthcare_db.rl_patients"


def setup_healthcare(engine: FgacEngine) -> None:
    """Producer-account setup: D1 + D2 + A1/A3 against the engine."""
    wh = engine.warehouse
    wh.create_table("patients", PATIENTS_SCHEMA, partition_by=["city"],
                    properties={"table_type": "ICEBERG"})
    wh.insert_values("patients", PATIENTS_ROWS)
    wh.create_table("claims", CLAIMS_SCHEMA, partition_by=["status"],
                    properties={"table_type": "ICEBERG"})
    wh.insert_values("claims", CLAIMS_ROWS)

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
    engine.policy.grant(TEAM2, "claims")

    # Consumer-account setup: M2 resource links — catalog aliases the
    # consumer queries instead of the producer tables
    # (consumer_emr_on_eks_setup.sh:261-287 creates rl_patients /
    # rl_claims; the jobs at :407/:478 read through them). The same
    # filter binds to the link, mirroring LF grants on the link name.
    wh.create_resource_link("rl_patients", "patients")
    wh.create_resource_link("rl_claims", "claims")
    engine.policy.create_data_cells_filter(
        DataCellsFilter(
            name="rl_patients_column_row_filter",
            table="rl_patients",
            allowed_columns=PATIENT_ALLOWED_COLUMNS,
            row_filter=PATIENT_ROW_FILTER,
        )
    )
    engine.policy.grant(TEAM1, "rl_patients", filter_name="rl_patients_column_row_filter")
    engine.policy.grant(TEAM1, "rl_claims")
    engine.policy.grant(TEAM2, "rl_claims")

    # Catalog-qualified link — the 3-part name the consumer job actually
    # queries (`dev.consumer_healthcare_db.rl_patients`,
    # consumer_emr_on_eks_setup.sh:407): same target, same filter,
    # granted to team1 only (team2 hits the denial path).
    wh.create_resource_link(QUALIFIED_RL_PATIENTS, "patients")
    engine.policy.create_data_cells_filter(
        DataCellsFilter(
            name="qualified_rl_patients_filter",
            table=QUALIFIED_RL_PATIENTS,
            allowed_columns=PATIENT_ALLOWED_COLUMNS,
            row_filter=PATIENT_ROW_FILTER,
        )
    )
    engine.policy.grant(TEAM1, QUALIFIED_RL_PATIENTS, filter_name="qualified_rl_patients_filter")


# The flagship join — consumer_emr_on_eks_setup.sh:412 (J1+P2+O1).
FLAGSHIP_JOIN_SQL = """
    SELECT p.state, c.claim_id, c.claim_date, p.patient_name,
           c.diagnosis_code, c.procedure_code, c.amount, c.status,
           c.provider_id
    FROM claims c
    JOIN patients p ON c.patient_id = p.patient_id
    ORDER BY p.state, c.claim_date
"""
