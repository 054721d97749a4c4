"""Salted two-phase aggregation: correctness vs the direct groupBy on
a deliberately skewed key distribution, and the structural property
that phase 1 spreads the hot key over many salt buckets."""

from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators.skew import (
    two_phase_salted_agg,
)


def _skewed(spark):
    # 90% of rows share key 0 (the hot tenant); the rest spread out
    return spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_salted_agg_matches_direct(spark):
    df = _skewed(spark)
    salted = two_phase_salted_agg(
        df,
        "k",
        {
            "total_v": (F.sum("v"), F.sum),
            "n_rows": (F.count(F.lit(1)), F.sum),
            "min_v": (F.min("v"), F.min),
            "max_v": (F.max("v"), F.max),
        },
        salt_buckets=16,
    )
    direct = df.groupBy("k").agg(
        F.sum("v").alias("total_v"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    key = lambda r: r["k"]
    assert sorted(salted.collect(), key=key) == sorted(direct.collect(), key=key)


def test_salt_spreads_hot_key(spark):
    df = _skewed(spark)
    salt = F.xxhash64(F.monotonically_increasing_id()) % 16
    buckets = (
        df.withColumn("__salt", salt)
        .filter(F.col("k") == 0)
        .select("__salt")
        .distinct()
        .count()
    )
    # the hot key's ~90k rows must occupy (nearly) all 16 salt buckets
    assert buckets >= 15
