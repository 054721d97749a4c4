"""Property-based FGAC tests (hypothesis): for *arbitrary* data-cells
filters — any column whitelist, any IN-list row filter — the policy
layer's secured scan must equal the manual filter+project a reviewer
would write by hand, and the masked columns must be unreachable. The
reference exercises exactly one filter (SURVEY.md §2.A F1/F2); these
properties show the enforcement path is correct for the whole policy
family, not just that instance.
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import setup_healthcare
from sample_emr_on_eks_fgac_iceberg_spark.policy import DataCellsFilter

STATES = ["California", "Texas", "New York", "Illinois"]
# patient_id stays visible so rows can be compared by key
MASKABLE = ["ssn", "gender", "city", "date_of_birth", "patient_name"]
ALL_COLS = [
    "patient_id",
    "patient_name",
    "date_of_birth",
    "gender",
    "city",
    "state",
    "ssn",
    "created_at",
    "updated_at",
]

_seq = itertools.count()


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = FgacEngine(spark, str(tmp_path_factory.mktemp("prop_warehouse")))
    setup_healthcare(eng)
    return eng


@given(
    states=st.lists(
        st.sampled_from(STATES), min_size=1, max_size=3, unique=True
    ),
    hidden=st.lists(
        st.sampled_from(MASKABLE), min_size=0, max_size=3, unique=True
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_secured_scan_equals_manual_filter_project(engine, states, hidden):
    n = next(_seq)
    principal = f"prop_user_{n}"
    allowed = tuple(c for c in ALL_COLS if c not in hidden)
    in_list = ", ".join(f"'{s}'" for s in states)
    engine.policy.create_data_cells_filter(
        DataCellsFilter(
            name=f"prop_filter_{n}",
            table="patients",
            allowed_columns=allowed,
            row_filter=f"state in ({in_list})",
        )
    )
    engine.policy.grant(
        principal, "patients", filter_name=f"prop_filter_{n}"
    )

    got = engine.session_for(principal).table("patients")
    assert got.columns == list(allowed)
    expected = (
        engine.warehouse.read_table("patients")
        .filter(F.col("state").isin(*states))
        .select(*allowed)
    )
    key = lambda r: r["patient_id"]  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(
        expected.collect(), key=key
    )


@given(
    hidden=st.lists(
        st.sampled_from(MASKABLE), min_size=1, max_size=3, unique=True
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_masked_columns_unreachable_via_sql(engine, hidden):
    n = next(_seq)
    principal = f"prop_sql_user_{n}"
    allowed = tuple(c for c in ALL_COLS if c not in hidden)
    engine.policy.create_data_cells_filter(
        DataCellsFilter(
            name=f"prop_sql_filter_{n}",
            table="patients",
            allowed_columns=allowed,
            row_filter=None,
        )
    )
    engine.policy.grant(
        principal, "patients", filter_name=f"prop_sql_filter_{n}"
    )
    sess = engine.session_for(principal)
    # SELECT * never leaks a hidden column …
    star = sess.sql("SELECT * FROM patients")
    assert set(star.columns) == set(allowed)
    # … and naming one outright fails analysis (never returns data)
    for col in hidden:
        with pytest.raises(Exception, match="UNRESOLVED_COLUMN|cannot be resolved"):
            sess.sql(f"SELECT {col} FROM patients").collect()


@given(
    states=st.lists(
        st.sampled_from(STATES), min_size=1, max_size=3, unique=True
    ),
    masked=st.lists(
        st.sampled_from(["patient_name", "city", "gender"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_masked_scan_equals_manual_mask(engine, states, masked):
    """For arbitrary (row filter, mask set) combinations, the secured
    scan equals filter → mask-projection done by hand, and no masked
    column ever vends a cleartext value."""
    n = next(_seq)
    principal = f"prop_mask_user_{n}"
    in_list = ", ".join(f"'{s}'" for s in states)
    masks = {c: f"concat('masked:', substr(md5({c}), 1, 6))" for c in masked}
    engine.policy.create_data_cells_filter(
        DataCellsFilter(
            name=f"prop_mask_filter_{n}",
            table="patients",
            row_filter=f"state in ({in_list})",
            column_masks=masks,
        )
    )
    engine.policy.grant(principal, "patients", filter_name=f"prop_mask_filter_{n}")

    got = engine.session_for(principal).table("patients")
    assert got.columns == ALL_COLS  # masked, never hidden
    base = engine.warehouse.read_table("patients").filter(
        F.col("state").isin(*states)
    )
    expected = base.select(
        *[
            F.expr(masks[c]).alias(c) if c in masks else F.col(c)
            for c in ALL_COLS
        ]
    )
    key = lambda r: r["patient_id"]  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(expected.collect(), key=key)
    for c in masked:
        assert all(r[c].startswith("masked:") for r in got.collect())
