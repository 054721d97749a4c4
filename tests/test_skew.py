"""Hotspot-avoidance utilities: salted two-phase aggregation
(correctness vs the direct groupBy on a deliberately skewed key, and
the structural property that phase 1 spreads the hot key over many
salt buckets) and distributed NTILE cut-points (bucket-for-bucket
equivalence with Spark's own single-partition NTILE window across
sizes, including n < buckets and n not divisible by buckets)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_emr_on_eks_fgac_iceberg_spark.operators.skew import (
    ntile_assign,
    ntile_cutpoints,
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


def _tiled(spark, n):
    # values deliberately heavy with ties (id % 7) so the unique-key
    # tie-break column carries the total order, exactly the RFM shape
    return spark.range(0, n).select(
        (F.col("id") % 7).alias("v"), F.col("id").alias("k")
    )


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 100, 1001])
@pytest.mark.parametrize("buckets", [2, 4])
def test_ntile_cutpoints_match_window_ntile(spark, n, buckets):
    df = _tiled(spark, n)
    cuts = ntile_cutpoints(df, ["v", "k"], buckets, n_parts=8)
    got = {
        (r["k"], r["b"])
        for r in df.withColumn("b", ntile_assign(cuts, ["v", "k"])).collect()
    }
    want = {
        (r["k"], r["b"])
        for r in df.withColumn(
            "b", F.ntile(buckets).over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert got == want


def test_ntile_cutpoints_empty_input(spark):
    df = _tiled(spark, 10).filter(F.lit(False))
    assert ntile_cutpoints(df, ["v", "k"], 4) == []


def test_ntile_cutpoints_driver_holds_only_scalars(spark):
    # the helper's two actions return n_parts counts + (buckets-1)
    # boundary rows — never the frame; assert the output size contract
    cuts = ntile_cutpoints(_tiled(spark, 10_000), ["v", "k"], 4, n_parts=16)
    assert len(cuts) == 3
    assert set(cuts[0].asDict()) >= {"v", "k"}


@pytest.mark.parametrize("sizes", [(1, 8, 100), (5, 5, 5), (97, 3, 1001)])
def test_ntile_cutpoints_multi_matches_window_per_dim(spark, sizes):
    from sample_emr_on_eks_fgac_iceberg_spark.operators.skew import (
        ntile_cutpoints_multi,
    )

    # three dimensions of DIFFERENT sizes stacked long-form — including
    # dims small enough to share a range partition, the case where a
    # dim's local base offset inside the partition matters
    frames = []
    for d, n in zip("abc", sizes):
        frames.append(
            spark.range(0, n).select(
                F.lit(d).alias("dim"),
                (F.col("id") % 5).alias("v"),
                F.col("id").alias("k"),
            )
        )
    stacked = frames[0].unionByName(frames[1]).unionByName(frames[2])
    cuts = ntile_cutpoints_multi(stacked, "dim", ["v", "k"], 4, n_parts=4)
    for d, n in zip("abc", sizes):
        df = spark.range(0, n).select(
            (F.col("id") % 5).alias("v"), F.col("id").alias("k")
        )
        got = {
            (r["k"], r["b"])
            for r in df.withColumn(
                "b", ntile_assign(cuts[d], ["v", "k"])
            ).collect()
        }
        want = {
            (r["k"], r["b"])
            for r in df.withColumn(
                "b", F.ntile(4).over(Window.orderBy("v", "k"))
            ).collect()
        }
        assert got == want, f"dim {d} (n={n})"
