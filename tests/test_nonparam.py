"""Brute-force verification of the distributed nonparametric stats
(operators/nonparam.py): the partition_rank_offsets prefix-sum
machinery must reproduce naive all-pairs / full-sort answers exactly."""

import duckdb
import numpy as np
import pytest

from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_mannwhitney_matches_brute_pair_count(spark, duck):
    a = [
        r[0]
        for r in duck.sql(
            "SELECT CAST(round(o_totalprice*100) AS BIGINT) FROM orders "
            "WHERE o_orderpriority = '1-URGENT'"
        ).fetchall()
    ]
    b = [
        r[0]
        for r in duck.sql(
            "SELECT CAST(round(o_totalprice*100) AS BIGINT) FROM orders "
            "WHERE o_orderpriority = '5-LOW'"
        ).fetchall()
    ]
    av, bv = np.array(a), np.array(b)
    # brute 2U = 2·#(a>b) + #(a=b) over all pairs
    u2 = int(2 * (av[:, None] > bv[None, :]).sum()
             + (av[:, None] == bv[None, :]).sum())
    from collections import Counter

    ties = Counter(a) + Counter(b)
    tie_term = sum(t**3 - t for t in ties.values())
    [row] = QUERIES["mannwhitney_u_priority"](spark, SF).collect()
    assert row["n_urgent"] == len(a)
    assert row["n_low"] == len(b)
    assert row["u2_urgent"] == u2
    assert row["tie_term"] == tie_term


def test_ks_matches_brute_ecdf(spark, duck):
    a = sorted(
        r[0]
        for r in duck.sql(
            "SELECT CAST(round(c_acctbal*100) AS BIGINT) FROM customer "
            "WHERE c_mktsegment = 'BUILDING'"
        ).fetchall()
    )
    b = sorted(
        r[0]
        for r in duck.sql(
            "SELECT CAST(round(c_acctbal*100) AS BIGINT) FROM customer "
            "WHERE c_mktsegment = 'MACHINERY'"
        ).fetchall()
    )
    na, nb = len(a), len(b)
    av, bv = np.array(a), np.array(b)
    grid = np.unique(np.concatenate([av, bv]))
    cuma = np.searchsorted(av, grid, side="right")
    cumb = np.searchsorted(bv, grid, side="right")
    d_num = int(np.abs(cuma.astype(object) * nb - cumb.astype(object) * na).max())
    [row] = QUERIES["ks_two_sample_segments"](spark, SF).collect()
    assert row["n_building"] == na
    assert row["n_machinery"] == nb
    assert row["d_numerator"] == d_num
    assert row["d_ppm"] == d_num * 1_000_000 // (na * nb)


def test_ols_trend_matches_numpy(spark, duck):
    rows = QUERIES["orders_yearly_trend_ols"](spark, SF).collect()
    assert rows, "expected at least one year"
    daily = duck.sql(
        "SELECT CAST(year(o_orderdate) AS BIGINT) yr, "
        "dayofyear(o_orderdate) x, "
        "SUM(CAST(round(o_totalprice*100) AS HUGEINT)) y "
        "FROM orders GROUP BY 1, 2"
    ).fetchall()
    by_year: dict = {}
    for yr, x, y in daily:
        by_year.setdefault(yr, []).append((int(x), int(y)))
    for r in rows:
        pts = by_year[r["yr"]]
        assert r["n_days"] == len(pts)
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope = np.polyfit(xs, ys, 1)[0]
        got = r["slope_ppm_cents_per_day"] / 1e6
        # exact integer ppm truncation vs float OLS: within one ppm
        assert abs(got - slope) <= abs(slope) * 1e-9 + 2e-6, (
            r["yr"],
            got,
            slope,
        )


def test_prefix_sum_window_is_pid_partitioned(spark):
    """The prefix-sum helper's window partitions by pid — K partitions,
    never a data-sized single-partition window (the registry-wide
    sweep in test_plans.py also covers this; here pinned to the
    helper so a refactor fails fast)."""
    from sample_emr_on_eks_fgac_iceberg_spark.plans import global_windows

    df = QUERIES["mannwhitney_u_priority"](spark, SF)
    assert not [d for d, bounded in global_windows(df) if not bounded]


def test_theilsen_matches_brute_median_of_slopes(spark, duck):
    daily = duck.sql(
        "SELECT CAST(year(o_orderdate) AS BIGINT) yr, "
        "dayofyear(o_orderdate) x, "
        "SUM(CAST(round(o_totalprice*100) AS HUGEINT)) y "
        "FROM orders GROUP BY 1, 2"
    ).fetchall()
    by_year: dict = {}
    for yr, x, y in daily:
        by_year.setdefault(yr, []).append((int(x), int(y)))

    def trunc_div(a: int, b: int) -> int:
        s = 1 if a >= 0 else -1
        return s * (abs(a) * 1_000_000 // b)

    rows = QUERIES["theilsen_yearly_trend"](spark, SF).collect()
    assert rows
    for r in rows:
        pts = sorted(by_year[r["yr"]])
        slopes = sorted(
            trunc_div(y2 - y1, x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        assert r["n_pairs"] == len(slopes)
        assert r["median_slope_ppm"] == slopes[(len(slopes) + 1) // 2 - 1]


def test_rolling_7d_users_matches_brute(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) FROM '{SF}/events.parquet'"
    ).fetchall()
    from collections import defaultdict

    by_day = defaultdict(set)
    for u, d in rows:
        by_day[d].add(u)
    import datetime

    got = {
        r["day"]: (r["dau_1d"], r["dau_7d"])
        for r in QUERIES["events_rolling_7d_users"](spark, SF).collect()
    }
    assert set(got) == set(by_day)
    for d, users in by_day.items():
        week = set()
        for k in range(7):
            week |= by_day.get(d - datetime.timedelta(days=k), set())
        assert got[d] == (len(users), len(week)), d


def test_spearman_matches_brute_average_ranks(spark, duck):
    xy = duck.sql(
        "SELECT CAST(round(c.c_acctbal*100) AS BIGINT) x, "
        "CAST(COALESCE(SUM(CAST(round(o.o_totalprice*100) AS HUGEINT)), 0) "
        "AS BIGINT) y "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey, c.c_acctbal"
    ).fetchall()
    import numpy as np

    def avg_ranks(vals):
        a = np.asarray(vals, dtype=np.int64)
        order = np.argsort(a, kind="stable")
        ranks = np.empty(len(a), dtype=float)
        sorted_a = a[order]
        i = 0
        while i < len(a):
            j = i
            while j < len(a) and sorted_a[j] == sorted_a[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2  # average of 1-based ranks
            i = j
        return ranks

    rx = avg_ranks([p[0] for p in xy])
    ry = avg_ranks([p[1] for p in xy])
    rho = np.corrcoef(rx, ry)[0, 1]
    [row] = QUERIES["customers_spearman_balance_spend"](spark, SF).collect()
    assert row["n_customers"] == len(xy)
    assert abs(row["spearman_rho"] - rho) < 1e-9, (row["spearman_rho"], rho)
