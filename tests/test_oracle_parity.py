"""Local mirror of the driver's DuckDB-oracle gate (BASELINE.md):
run every registered query on Spark and its oracle SQL on DuckDB over
the same parquet files; compare row count, column names, and
order-insensitive values. Runs at sf0.001 for speed; the driver runs
the same contract at sf0.01."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pandas as pd
import pytest

from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "∅" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (int,)):
        return str(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(
        tuple(_norm(v) for v in row) for row in df.itertuples(index=False)
    )


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    got = QUERIES[name](spark, sf_dir).toPandas()
    # .arrow() keeps DATE as date32 → datetime.date objects (matching
    # Spark's toPandas); .df() would widen dates to datetime64.
    exp = oracle_con.sql(ORACLE[name]).arrow().to_pandas(date_as_object=True)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    cg, ce = canon(got), canon(exp)
    if cg != ce:
        diff = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
        detail = "\n".join(f"  spark={cg[i]}\n  duck ={ce[i]}" for i in diff)
        pytest.fail(f"{name}: value mismatch at sorted rows {diff}:\n{detail}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_no_oracle_query_runs(name, spark, sf_dir):
    # Rows-only check, mirroring the driver's weaker path.
    assert QUERIES[name](spark, sf_dir).count() >= 0
