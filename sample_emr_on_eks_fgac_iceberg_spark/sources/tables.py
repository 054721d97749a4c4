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


def fan_out(df: DataFrame, spark: SparkSession, *cols: str) -> DataFrame:
    """Repartition a small-file scan to full core parallelism before
    CPU-heavy per-row work (shingling, vector math, regex scoring).

    Scan parallelism follows parquet splits; a table that arrives as one
    small file is one task, which serializes expression-heavy stages
    onto a single core (observed 10-30× slowdowns at sf0.1). One cheap
    shuffle of the narrow input buys 32-way execution. At 100 TB inputs
    are already many splits and this becomes a no-op-cost hash
    repartition that also pre-keys the downstream join/agg."""
    n = spark.sparkContext.defaultParallelism
    if cols:
        # keyed fan-out doubles as pre-keying for the downstream
        # join/agg — keep it unconditionally (at scale it replaces a
        # shuffle the consumer would do anyway)
        return df.repartition(n, *cols)
    if df.rdd.getNumPartitions() >= n:
        # already parallel enough — don't insert a shuffle a well-split
        # scan doesn't need
        return df
    return df.repartition(n)


def materialize_once(df: DataFrame) -> DataFrame:
    """Plan barrier for an expensive derived table that is re-used
    (e.g. both sides of a self-join): lazy localCheckpoint.

    Two problems it solves at once: (a) Catalyst pushes inferred
    predicates through projections by *substituting* the projection
    expressions, so a filter inferred from an explode re-evaluates the
    whole expensive expression chain per row — below the fan-out
    exchange, on one core; (b) a self-join evaluates the shared
    sub-plan once per side. The checkpoint cuts the lineage: the table
    is computed exactly once, at the parallelism it was built with,
    and every consumer reads the materialized partitions.

    localCheckpoint is executor-local (lost partitions recompute from
    nothing at executor failure) — the right trade locally; on a real
    cluster the equivalent durable move is writing the derived table
    to a temp location/table, which a 100 TB near-dup pipeline does
    anyway for its shingle index."""
    return df.localCheckpoint(eager=False)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which
    Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL).
    Read nanos as long (runtime-settable legacy conf — applied here so
    it also works under a caller-provided session) and convert to a
    microsecond timestamp JVM-side; integer DIV avoids the double-
    precision loss a `/1000` would give on epoch-nanos magnitudes."""
    from pyspark.sql import functions as F

    # build_session sets this conf up front; the runtime set here is a
    # guarded fallback for caller-provided sessions (e.g. the driver's
    # own SparkSession), skipped when already configured.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
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
