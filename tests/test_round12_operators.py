"""Round-12 operator semantics against brute-force references —
independent of the DuckDB oracles (which share the SQL formulation):
numpy / pure-Python recomputations on small planted inputs."""

import numpy as np
import pytest

from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


def test_autocorr_matches_numpy(spark, sf001):
    import duckdb

    got = QUERIES["orders_daily_autocorr_lag1"](spark, sf001).collect()[0]
    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT o_orderdate AS d,
                   SUM(CAST(round(o_totalprice*100) AS HUGEINT)) AS c
            FROM '{sf001}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    by_d = {d: int(c) for d, c in daily}
    import datetime as dt

    xs, ys = [], []
    for d, c in by_d.items():
        nxt = d + dt.timedelta(days=1)
        if nxt in by_d:
            xs.append(c)
            ys.append(by_d[nxt])
    r = np.corrcoef(np.array(xs, dtype=float), np.array(ys, dtype=float))[0, 1]
    assert got["n_pairs"] == len(xs)
    assert abs(got["corr_lag1"] - r) < 1e-9


def test_mad_outliers_match_numpy(spark, sf001):
    import duckdb

    got = QUERIES["supplier_acctbal_mad_outliers"](spark, sf001).collect()[0]
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT s_suppkey, CAST(round(s_acctbal*100) AS BIGINT)
            FROM '{sf001}/supplier.parquet'"""
    ).fetchall()
    # the operator's rule: discrete median at ceil(n/2) over (value, key)
    n = len(rows)
    pos = (n + 1) // 2
    med = sorted((c, k) for k, c in rows)[pos - 1][0]
    devs = sorted((abs(c - med), k) for k, c in rows)
    mad = devs[pos - 1][0]
    outliers = sum(1 for d, _ in devs if d * 10000 > 3 * 14826 * mad)
    assert got["median_cents"] == med
    assert got["mad_cents"] == mad
    assert got["n_outliers"] == outliers
    # sanity vs numpy's continuous median: within one discrete step
    arr = np.array([c for _, c in rows], dtype=float)
    assert abs(np.median(arr) - med) <= max(1.0, np.ptp(arr) / n * 4)


def test_chi2_matches_scipy_free_formula(spark, sf001):
    import duckdb

    got = QUERIES["part_brand_type_chi2"](spark, sf001).collect()[0]
    con = duckdb.connect()
    cells = con.sql(
        f"""SELECT p_brand, p_type, COUNT(*)
            FROM '{sf001}/part.parquet' GROUP BY 1, 2"""
    ).fetchall()
    brands = sorted({b for b, _, _ in cells})
    types = sorted({t for _, t, _ in cells})
    obs = {(b, t): c for b, t, c in cells}
    rt = {b: sum(c for (bb, _), c in obs.items() if bb == b) for b in brands}
    ct = {t: sum(c for (_, tt), c in obs.items() if tt == t) for t in types}
    n = sum(obs.values())
    chi2 = sum(
        (o - rt[b] * ct[t] / n) ** 2 / (rt[b] * ct[t] / n)
        for (b, t), o in obs.items()
    )
    assert got["n_brands"] == len(brands)
    assert got["n_types"] == len(types)
    assert got["dof"] == (len(brands) - 1) * (len(types) - 1)
    assert abs(got["chi2_ppm"] / 1e6 - chi2) < 1e-3
    # note: zero-observed cells contribute nothing in BOTH formulations
    # (the operator aggregates observed cells only) — the classic χ²
    # over the full cross-product differs when a (brand, type) pair
    # never occurs; this engine's definition is the observed-cell one.


def test_zipf_slope_matches_polyfit(spark, sf001):
    import duckdb

    got = QUERIES["text_zipf_slope"](spark, sf001).collect()[0]
    con = duckdb.connect()
    counts = con.sql(
        rf"""WITH words AS (
                 SELECT unnest(list_filter(
                     string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '')) AS w
                 FROM '{sf001}/documents.parquet')
             SELECT w, COUNT(*) AS n FROM words GROUP BY 1"""
    ).fetchall()
    ranked = sorted(counts, key=lambda r: (-r[1], r[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([n for _, n in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert got["vocab_size"] == len(ranked)
    assert abs(got["slope_ppm"] / 1e6 - slope) < 1e-4
    assert abs(got["intercept_ppm"] / 1e6 - intercept) < 1e-4
    assert slope < 0  # frequency falls with rank


def test_weekday_seasonality_total_is_order_count(spark, sf001):
    rows = QUERIES["orders_weekday_seasonality"](spark, sf001).collect()
    assert {r["dow"] for r in rows} <= set(range(1, 8))
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf001}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == n


def test_hapax_and_norm_histogram_invariants(spark, sf001):
    h = QUERIES["text_hapax_ratio_by_lang"](spark, sf001).collect()
    for r in h:
        assert 0 <= r["n_hapax"] <= r["vocab_size"]
        assert 0 <= r["hapax_ppm"] <= 1_000_000
        assert r["hapax_ppm"] == r["n_hapax"] * 1_000_000 // r["vocab_size"]
    g = QUERIES["embedding_norm_histogram"](spark, sf001).collect()
    for r in g:
        assert r["bucket"] * 1000 <= r["min_sq_milli"] <= r["max_sq_milli"]
        assert r["max_sq_milli"] < (r["bucket"] + 1) * 1000
    import duckdb

    nv = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf001}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n_vectors"] for r in g) == nv


def test_interpurchase_gaps_match_brute(spark, sf001):
    import duckdb
    from collections import defaultdict

    got = QUERIES["customer_interpurchase_gap_stats"](spark, sf001).collect()[0]
    rows = duckdb.sql(
        f"""SELECT o_custkey, o_orderkey, o_orderdate
            FROM '{sf001}/orders.parquet'"""
    ).fetchall()
    by_c = defaultdict(list)
    for ck, ok, d in rows:
        by_c[ck].append((d, ok))
    gaps = []
    for orders in by_c.values():
        orders.sort()
        for (d1, _), (d2, _) in zip(orders, orders[1:]):
            gaps.append((d2 - d1).days)
    assert got["n_gaps"] == len(gaps)
    assert got["min_gap_days"] == min(gaps)
    assert got["max_gap_days"] == max(gaps)
    assert got["avg_gap_ppm_days"] == sum(gaps) * 1_000_000 // len(gaps)
