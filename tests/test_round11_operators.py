"""Round-11 wave-2 operators: skyline dominance edge cases, ABC
boundary exactness, Matryoshka recall sanity, coverage-curve bounds."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def skyline_dir(tmp_path_factory):
    """Orders fixture with every dominance edge case planted:
    duplicates of an identical (price, date) point (both survive),
    same price / later date (dominated), same date / lower price
    (dominated), and an incomparable diagonal chain (all survive)."""
    d = tmp_path_factory.mktemp("sky")
    rows = [
        # diagonal chain: price falls as date gets earlier → pairwise
        # incomparable, ALL on the skyline
        (1, 300.00, "1995-03-10"),
        (2, 200.00, "1995-02-10"),
        (3, 100.00, "1995-01-10"),
        # exact duplicate of orderkey 2's point: neither dominates —
        # both survive
        (4, 200.00, "1995-02-10"),
        # dominated: same price as 2, strictly later date
        (5, 200.00, "1995-02-20"),
        # dominated: same date as 2, strictly lower price
        (6, 150.00, "1995-02-10"),
        # dominated on both axes
        (7, 50.00, "1995-12-31"),
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t (o_orderkey BIGINT, o_totalprice DOUBLE, "
        "o_orderdate DATE)"
    )
    for k, p, dt in rows:
        con.execute("INSERT INTO t VALUES (?, ?, ?)", [k, p, dt])
    con.sql(f"COPY t TO '{d}/orders.parquet' (FORMAT PARQUET)")
    return str(d)


def test_skyline_planted_dominance(spark, skyline_dir):
    got = {r["o_orderkey"] for r in
           QUERIES["orders_skyline_dominators"](spark, skyline_dir).collect()}
    assert got == {1, 2, 3, 4}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{skyline_dir}/orders.parquet'"
    )
    exp = {r[0] for r in con.sql(ORACLE["orders_skyline_dominators"]).fetchall()}
    assert got == exp


def test_skyline_is_exactly_the_non_dominated_set(spark, sf_dir):
    """Independent NOT EXISTS dominance oracle (brute force) on the
    real sf0.001 orders — the window/prefix-min decomposition must
    reproduce the definitional skyline exactly."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    brute = con.sql(
        """
        WITH o2 AS (SELECT o_orderkey,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
                           o_orderdate AS d
                    FROM orders)
        SELECT a.o_orderkey FROM o2 a
        WHERE NOT EXISTS (
            SELECT 1 FROM o2 b
            WHERE b.pc >= a.pc AND b.d <= a.d
              AND (b.pc > a.pc OR b.d < a.d))
        """
    ).fetchall()
    got = {r["o_orderkey"] for r in
           QUERIES["orders_skyline_dominators"](spark, sf_dir).collect()}
    assert got == {r[0] for r in brute}


def test_abc_classes_partition_everything(spark, sf_dir):
    rows = {r["abc_class"]: r for r in
            QUERIES["parts_abc_classification"](spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r["revenue_cents"] for r in rows.values())
    # A covers at most 80% cumulatively but adding B crosses 95%'s floor
    assert rows["A"]["revenue_cents"] * 100 <= total * 80
    assert (rows["A"]["revenue_cents"] + rows["B"]["revenue_cents"]) * 100 \
        <= total * 95
    assert sum(r["n_parts"] for r in rows.values()) > 0
    ppm = sum(r["share_ppm"] for r in rows.values())
    assert 999997 <= ppm <= 1000000  # truncating div loses < 1 ppm/class


def test_abc_exact_80_boundary_is_class_a(spark, tmp_path):
    """cum·100 == total·80 exactly → still A (<=, not <): 5 parts of
    equal revenue — the 4th sits exactly at 80%."""
    import duckdb as dk

    d = tmp_path / "li"
    d.mkdir()
    con = dk.connect()
    con.sql(
        "CREATE TABLE t (l_partkey BIGINT, l_extendedprice DOUBLE)"
    )
    for pk in range(1, 6):
        con.execute("INSERT INTO t VALUES (?, 10.00)", [pk])
    con.sql(f"COPY t TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    rows = {r["abc_class"]: r for r in
            QUERIES["parts_abc_classification"](spark, str(d)).collect()}
    assert rows["A"]["n_parts"] == 4
    assert rows["C"]["n_parts"] == 1 and "B" not in rows


def test_matryoshka_full_dim_recall_is_unity(spark, sf_dir):
    rows = {r["dim_prefix"]: r for r in
            QUERIES["embedding_matryoshka_recall"](spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64]["recall_ppm"] == 1_000_000
    for p in (8, 16, 32):
        assert 0 < rows[p]["n_overlap"] <= rows[64]["n_overlap"]


def test_vocab_coverage_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        QUERIES["text_vocab_coverage_curve"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [10, 100, 1000]
    cov = [r["coverage_ppm"] for r in rows]
    assert cov == sorted(cov) and cov[-1] <= 1_000_000
    for r in rows:
        assert r["vocab_used"] <= r["k"]
        assert r["covered_tokens"] <= r["total_tokens"]


def test_benford_sums_and_expectations(spark, sf_dir):
    rows = QUERIES["orders_benford_digits"](spark, sf_dir).collect()
    assert {r["first_digit"] for r in rows} <= set(range(1, 10))
    assert sum(r["benford_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["abs_dev_ppm"] == abs(r["observed_ppm"] - r["benford_ppm"])
