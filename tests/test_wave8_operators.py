"""Structural invariants for the round-12 wave-8 operators (value
correctness rides the driver oracles; these pin the properties the
oracles can't express)."""

import duckdb

from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES

SF = "/root/testdata/sf0.001"


def test_spend_deciles_are_balanced_partition(spark):
    rows = QUERIES["customer_spend_deciles"](spark, SF).collect()
    by_d = {r["decile"]: r for r in rows}
    assert set(by_d) == set(range(10))
    n = sum(r["n_customers"] for r in rows)
    # positional rule: every decile holds floor(n/10) or ceil(n/10)
    assert all(
        r["n_customers"] in (n // 10, -(-n // 10)) for r in rows
    ), rows
    # deciles are value-ordered and non-overlapping
    for d in range(9):
        assert by_d[d]["max_cents"] <= by_d[d + 1]["min_cents"]
    con = duckdb.connect()
    [(n_cust, total)] = con.sql(
        "SELECT COUNT(*), SUM(CAST(round(o_totalprice*100) AS HUGEINT)) "
        f"FROM (SELECT o_custkey, SUM(o_totalprice) o_totalprice FROM "
        f"'{SF}/orders.parquet' GROUP BY o_custkey) t"
    ).fetchall()
    assert n == n_cust


def test_cohort_ltv_triangle_shape(spark):
    rows = QUERIES["customer_cohort_ltv"](spark, SF).collect()
    assert rows
    # age 0 exists for every cohort (the acquisition month itself) and
    # no age is negative
    cohorts = {r["cohort_month"] for r in rows}
    age0 = {r["cohort_month"] for r in rows if r["age_months"] == 0}
    assert age0 == cohorts
    assert all(r["age_months"] >= 0 for r in rows)
    # total revenue reconciles with the raw table
    con = duckdb.connect()
    [(total,)] = con.sql(
        "SELECT SUM(CAST(round(o_totalprice*100) AS HUGEINT)) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    assert sum(r["revenue_cents"] for r in rows) == total


def test_readability_centi_units_are_integral_presum(spark):
    df = QUERIES["text_readability_cli"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        # mean is exactly the integer sum re-divided — no float sums
        assert abs(r["mean_cli"] - r["sum_centi_cli"] / (100 * r["n_docs"])) == 0


def test_laspeyres_base_year_is_unity(spark):
    rows = QUERIES["lineitem_price_index_laspeyres"](spark, SF).collect()
    by_yr = {r["yr"]: r for r in rows}
    base = min(by_yr)
    # the base year prices its own basket: index exactly 10^6 ppm
    assert by_yr[base]["laspeyres_ppm"] == 1_000_000
    # every year shares the full base basket or a subset of it
    assert all(
        r["n_common_parts"] <= by_yr[base]["n_common_parts"] for r in rows
    )


def test_trimmed_mean_between_extremes(spark):
    [r] = QUERIES["orders_trimmed_mean_price"](spark, SF).collect()
    con = duckdb.connect()
    [(lo, hi, mean)] = con.sql(
        "SELECT MIN(o_totalprice), MAX(o_totalprice), AVG(o_totalprice) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    assert lo < r["trimmed_mean"] < hi
    # trims exactly floor(n/20) per tail
    assert r["n_kept"] == r["n_orders"] - 2 * (r["n_orders"] // 20)


def test_curation_funnel_is_monotone(spark):
    rows = sorted(
        QUERIES["corpus_curation_funnel"](spark, SF).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "all", "quality", "exact_dedup", "train_split", "decontaminated",
    ]
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    assert rows[-1]["n_docs"] > 0
