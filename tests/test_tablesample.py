"""TABLESAMPLE composition (VERDICT r13 missing #3): the SQL-standard
clause routes natively on BOTH surfaces, and on the consumer surface
sampling happens AFTER the row filter — a principal can never sample a
row its policy filters out."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.engine import FgacEngine
from sample_emr_on_eks_fgac_iceberg_spark.healthcare import (
    TEAM1,
    TEAM2,
    setup_healthcare,
)
from sample_emr_on_eks_fgac_iceberg_spark.policy import AccessDeniedException


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = FgacEngine(spark, str(tmp_path_factory.mktemp("ts_wh")))
    setup_healthcare(eng)
    return eng


# --------------------------------------------------- producer surface
def test_producer_percent_rate_bounds(engine):
    fe_total = engine.sql("SELECT COUNT(*) AS n FROM claims").collect()[0].n
    n = (
        engine.sql("SELECT COUNT(*) AS n FROM claims TABLESAMPLE (50 PERCENT)")
        .collect()[0]
        .n
    )
    assert 0 <= n <= fe_total


def test_producer_rows_form_exact(engine):
    n = (
        engine.sql("SELECT COUNT(*) AS n FROM claims TABLESAMPLE (3 ROWS)")
        .collect()[0]
        .n
    )
    assert n == 3


def test_producer_bucket_form_subset(engine):
    rows = engine.sql(
        "SELECT claim_id FROM claims TABLESAMPLE (BUCKET 1 OUT OF 2)"
    ).collect()
    all_ids = {
        r.claim_id for r in engine.sql("SELECT claim_id FROM claims").collect()
    }
    assert {r.claim_id for r in rows} <= all_ids


# --------------------------------------------------- consumer surface
def test_consumer_full_sample_equals_filtered_scan(engine):
    sess = engine.session_for(TEAM1)
    df = sess.sql("SELECT * FROM patients TABLESAMPLE (100 PERCENT)")
    rows = df.collect()
    # 100% sample of the FILTERED view: exactly the 8 policy rows,
    # ssn still absent — the sample operates above the policy wrap
    assert len(rows) == 8
    assert "ssn" not in df.columns
    assert {r.state for r in rows} == {"Texas", "New York"}


def test_consumer_sample_never_resurrects_filtered_rows(engine):
    sess = engine.session_for(TEAM1)
    visible = {
        r.patient_id for r in sess.sql("SELECT * FROM patients").collect()
    }
    # many draws: every sampled row must be inside the filtered set
    for seed in range(8):
        rows = sess.sql(
            "SELECT patient_id, state FROM patients "
            f"TABLESAMPLE (60 PERCENT) REPEATABLE ({seed})"
        ).collect()
        assert {r.patient_id for r in rows} <= visible
        assert all(r.state in ("Texas", "New York") for r in rows)


def test_consumer_rows_form_bounded_by_filter(engine):
    sess = engine.session_for(TEAM1)
    # asking for more rows than the policy admits returns only the
    # filtered cardinality — the sample cannot reach past the filter
    n = (
        sess.sql("SELECT COUNT(*) AS n FROM patients TABLESAMPLE (1000 ROWS)")
        .collect()[0]
        .n
    )
    assert n == 8


def test_consumer_bucket_form_subset_of_filtered(engine):
    sess = engine.session_for(TEAM1)
    visible = {
        r.patient_id for r in sess.sql("SELECT * FROM patients").collect()
    }
    rows = sess.sql(
        "SELECT patient_id FROM patients TABLESAMPLE (BUCKET 1 OUT OF 2)"
    ).collect()
    assert {r.patient_id for r in rows} <= visible


def test_consumer_denied_table_stays_denied_under_sample(engine):
    sess = engine.session_for(TEAM2)
    with pytest.raises(AccessDeniedException):
        sess.sql("SELECT * FROM patients TABLESAMPLE (10 PERCENT)").collect()


def test_consumer_ssn_unresolvable_under_sample(engine):
    sess = engine.session_for(TEAM1)
    with pytest.raises(Exception, match="(?i)ssn.*(cannot be resolved|not)"):
        sess.sql("SELECT ssn FROM patients TABLESAMPLE (100 PERCENT)").collect()
