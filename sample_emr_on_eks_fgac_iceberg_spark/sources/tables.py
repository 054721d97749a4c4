"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

The scan path is the engine's S1/S3 surface (SURVEY.md §2): a cataloged
columnar read with predicate pushdown, column pruning and (for the
warehouse's own tables) identity-partition pruning — the same physical
model as the reference's Iceberg-over-Parquet layout
(producer_account_setup/logs/producer_cleanup_logs.txt:31-53).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins at
# any scale factor (region/nation/supplier are bounded; part/customer
# are SF-proportional but tiny relative to the facts — at 100 TB these
# two would leave the list and rely on AQE's size-based selection).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which
    Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL).
    Read nanos as long (runtime-settable legacy conf — applied here so
    it also works under a caller-provided session) and convert to a
    microsecond timestamp JVM-side; integer DIV avoids the double-
    precision loss a `/1000` would give on epoch-nanos magnitudes."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view for the spark.sql() surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
