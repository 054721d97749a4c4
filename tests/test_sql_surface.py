"""SQL-surface parity — QUALIFY, ASOF JOIN, GROUP BY ALL through the
frontend (operators/sql_surface.py, sql_frontend.rewrite_qualify /
_rewrite_asof_joins, temporal.asof_join_frames)."""

import duckdb
import pytest

from sample_emr_on_eks_fgac_iceberg_spark.operators.temporal import (
    asof_join_frames,
)
from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse
from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import (
    SqlFrontend,
    parse_asof_condition,
    rewrite_qualify,
)


@pytest.fixture()
def fe(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sup = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 10, 6.0), (4, 20, 9.0), (5, 20, 1.0)],
        "s_suppkey int, s_nationkey int, s_acctbal double",
    )
    wh.create_table("sup", sup.schema)
    wh.insert_into("sup", sup)
    clicks = spark.createDataFrame(
        [(10, 100, 1), (10, 200, 2), (20, 150, 3)],
        "cu int, cts int, click_id int",
    )
    purch = spark.createDataFrame(
        [(10, 150, 11), (10, 200, 12), (20, 100, 13)],
        "pu int, pts int, purchase_id int",
    )
    wh.create_table("clicks", clicks.schema)
    wh.insert_into("clicks", clicks)
    wh.create_table("purch", purch.schema)
    wh.insert_into("purch", purch)
    return SqlFrontend(spark, wh)


# ------------------------------------------------------------- QUALIFY
def test_qualify_alias_predicate(fe):
    got = fe.execute(
        """
        SELECT s_nationkey, s_suppkey,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rk
        FROM sup QUALIFY rk <= 2 ORDER BY s_nationkey, rk
        """
    ).collect()
    assert [(r["s_nationkey"], r["s_suppkey"], r["rk"]) for r in got] == [
        (10, 2, 1),
        (10, 3, 2),
        (20, 4, 1),
        (20, 5, 2),
    ]


def test_qualify_window_sees_unprojected_columns(fe):
    # the QUALIFY window orders by s_acctbal, which the select list
    # does NOT project — DuckDB semantics (predicate sees all FROM
    # columns), delivered by injecting the predicate into the select
    # list; the helper column is dropped from the result
    got = fe.execute(
        """
        SELECT s_nationkey, s_suppkey FROM sup
        QUALIFY row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC, s_suppkey) = 1
        """
    )
    assert got.columns == ["s_nationkey", "s_suppkey"]
    assert sorted((r[0], r[1]) for r in got.collect()) == [(10, 2), (20, 4)]


def test_qualify_after_cte_where_and_limit(fe):
    got = fe.execute(
        """
        WITH big AS (SELECT * FROM sup WHERE s_acctbal > 1)
        SELECT s_nationkey, s_suppkey FROM big WHERE s_suppkey < 5
        QUALIFY row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC) = 1
        LIMIT 3
        """
    ).collect()
    assert sorted((r[0], r[1]) for r in got) == [(10, 2), (20, 4)]


def test_qualify_nested_raises():
    with pytest.raises(ValueError, match="top level"):
        rewrite_qualify(
            "SELECT * FROM (SELECT a FROM t QUALIFY row_number() "
            "OVER (ORDER BY a) = 1) x"
        )


def test_qualify_string_literal_not_a_clause():
    q = "SELECT 'no QUALIFY here' AS s FROM t"
    assert rewrite_qualify(q) == (q, False)


def test_qualify_adds_no_extra_exchange(fe, spark):
    # the rewrite must plan exactly like the hand-written window
    # filter: ONE hash partition for the window, nothing else
    df = fe.execute(
        """
        SELECT s_nationkey, s_suppkey FROM sup
        QUALIFY row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC, s_suppkey) = 1
        """
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------- ASOF
def test_asof_inner_backward(fe):
    got = fe.execute(
        """
        SELECT p.purchase_id, c.click_id FROM purch p ASOF JOIN clicks c
        ON p.pu = c.cu AND p.pts >= c.cts
        """
    ).collect()
    assert sorted((r[0], r[1]) for r in got) == [(11, 1), (12, 2)]


def test_asof_left_with_aggregate(fe):
    got = fe.execute(
        """
        SELECT p.purchase_id, c.click_id FROM purch p ASOF LEFT JOIN clicks c
        ON p.pu = c.cu AND p.pts >= c.cts ORDER BY purchase_id
        """
    ).collect()
    assert [(r[0], r[1]) for r in got] == [(11, 1), (12, 2), (13, None)]


def test_asof_strict_and_forward_match_duckdb(fe):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE clicks AS SELECT * FROM (VALUES (10,100,1),"
        "(10,200,2),(20,150,3)) t(cu,cts,click_id)"
    )
    con.execute(
        "CREATE TABLE purch AS SELECT * FROM (VALUES (10,150,11),"
        "(10,200,12),(20,100,13)) t(pu,pts,purchase_id)"
    )
    for cond in ("p.pts > c.cts", "p.pts <= c.cts", "p.pts < c.cts"):
        sql = (
            "SELECT p.purchase_id, c.click_id FROM purch p ASOF JOIN "
            f"clicks c ON p.pu = c.cu AND {cond}"
        )
        got = sorted((r[0], r[1]) for r in fe.execute(sql).collect())
        exp = sorted(con.execute(sql).fetchall())
        assert got == exp, (cond, got, exp)


def test_asof_reversed_operands_normalize(fe):
    # right.ts <= left.ts is the same backward as-of
    got = fe.execute(
        """
        SELECT p.purchase_id, c.click_id FROM purch p ASOF JOIN clicks c
        ON c.cu = p.pu AND c.cts <= p.pts
        """
    ).collect()
    assert sorted((r[0], r[1]) for r in got) == [(11, 1), (12, 2)]


def test_asof_requires_exactly_one_inequality():
    with pytest.raises(ValueError, match="exactly one inequality"):
        parse_asof_condition(
            "p.pu = c.cu AND p.pts >= c.cts AND p.pts <= c.cts2",
            {"p"},
            {"c"},
        )
    with pytest.raises(ValueError, match="requires one inequality"):
        parse_asof_condition("p.pu = c.cu", {"p"}, {"c"})


def test_asof_unknown_relation_raises(fe):
    with pytest.raises(ValueError, match="not a registered"):
        fe.execute(
            "SELECT 1 FROM nope n ASOF JOIN clicks c "
            "ON n.k = c.cu AND n.ts >= c.cts"
        )


def test_asof_frames_rejects_column_overlap(spark):
    a = spark.createDataFrame([(1, 2)], "k int, ts int")
    b = spark.createDataFrame([(1, 2)], "k int, ts int")
    with pytest.raises(ValueError, match="share column names"):
        asof_join_frames(a, b, [("k", "k")], "ts", "ts")


def test_asof_frames_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, i, i) for i in range(100)], "k int, ts int, lv int"
    )
    right = spark.createDataFrame(
        [(1, i * 2, i) for i in range(50)], "rk int, rts int, rv int"
    )
    j = asof_join_frames(left, right, [("k", "rk")], "ts", "rts")
    j.count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    # union + ONE hash partition on the key for the window — no join
    # exchange pair, no sort-merge
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_group_by_all_matches_explicit(spark, sf_dir):
    from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES

    got = QUERIES["group_by_all_revenue"](spark, sf_dir)
    exp = spark.sql(
        """
        SELECT year(o_orderdate) AS yr, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(38,0)))
                    AS BIGINT) AS revenue_cents
        FROM __gba_orders GROUP BY yr, o_orderstatus
        """
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )
