"""Similarity search over the `embeddings` table (north-star surface,
SURVEY.md §2.B "Similarity search"): brute-force cosine top-k as the
exact baseline, all-pairs threshold join, and a random-hyperplane LSH
bucketed variant as the sub-linear scale path.

Determinism: embeddings are quantized to integer milli-units
(round(x*1000)) before the dot product, so the accumulation is exact
integer arithmetic — identical in Spark and DuckDB regardless of
summation order — and the final cosine is a deterministic double
expression over those integers. This costs < 0.1% relative error on
unit-scale float32 embeddings and buys bit-exact cross-engine scores.

100 TB posture: the exact top-k broadcasts the (small) query set and
streams the candidate side — one pass, no shuffle of the big side; the
LSH variant buckets candidates so each query only scans its bucket.
All vector math is JVM-side (`transform`/`zip_with`/`aggregate`), no
Python in the hot loop.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import fan_out, load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
PAIR_THRESHOLD = 0.75
DIM = 64


def _quantized(col) -> Column:
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _with_norm(df: DataFrame, prefix: str) -> DataFrame:
    v = _quantized(F.col("embedding"))
    return df.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        v.alias(f"{prefix}_v"),
    ).withColumn(f"{prefix}_norm", F.sqrt(_dot(F.col(f"{prefix}_v"), F.col(f"{prefix}_v")).cast("double")))


_ORACLE_QUANT = "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_ORACLE_NORMS = f"""
    qv AS (SELECT vec_id, {_ORACLE_QUANT} AS v FROM embeddings),
    norms AS (
        SELECT vec_id, v,
               sqrt(CAST(list_sum(list_transform(range(len(v)), i -> v[i+1]*v[i+1])) AS DOUBLE)) AS nrm
        FROM qv)
"""


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH {_ORACLE_NORMS},
    pairs AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(range(len(q.v)), i -> q.v[i+1]*c.v[i+1])) AS DOUBLE)
                   / (q.nrm * c.nrm) AS cosine
        FROM norms q JOIN norms c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
        SELECT q_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM pairs)
    SELECT q_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query vectors,
    stream every candidate once, rank per query."""
    e = load_table(spark, sf_dir, "embeddings")
    q = _with_norm(e.filter(F.col("vec_id") < N_QUERIES), "q")
    c = _with_norm(fan_out(e, spark, "vec_id"), "c")
    sim = _dot(F.col("q_v"), F.col("c_v")).cast("double") / (
        F.col("q_norm") * F.col("c_norm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            F.col("c_id").alias("neighbor_id"),
            sim.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "similarity_pairs_threshold",
    oracle=f"""
    WITH {_ORACLE_NORMS}
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           CAST(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1]*b.v[i+1])) AS DOUBLE)
               / (a.nrm * b.nrm) AS cosine
    FROM norms a JOIN norms b ON a.vec_id < b.vec_id
    WHERE CAST(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1]*b.v[i+1])) AS DOUBLE)
              / (a.nrm * b.nrm) >= {PAIR_THRESHOLD}
    """,
)
def similarity_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= τ (embedding near-dup detection), as a
    broadcast GEMM: the quantized matrix is broadcast once, and each
    Arrow batch of rows computes its cosine block against it with one
    numpy matrix multiply — replacing the nested-loop pair join whose
    per-pair interpreted dot product was ~40× slower.

    The broadcast is the *small side* of the similarity join (same
    memory contract as `F.broadcast`); the streamed side stays
    distributed and each task emits only its above-threshold pairs.
    At 100 TB the broadcast side becomes LSH buckets
    (`ann_lsh_bucketed`) or a block decomposition — this operator is
    the exact baseline.

    Exactness: quantized values are small integers, so every product
    and 64-term sum is < 2^53 and float64 GEMM is *exact*; norm, then
    one multiply and one divide, are the identical IEEE-754 op
    sequence DuckDB runs — bit-equal hashes.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    quant = e.select("vec_id", _quantized(F.col("embedding")).alias("v"))
    rows = quant.toPandas()
    ids = rows["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(rows["v"].tolist(), dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    b_side = spark.sparkContext.broadcast((ids, mat, norms))

    def gemm_pairs(batches):
        b_ids, b_mat, b_norms = b_side.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            ai, bj = np.nonzero(
                (cos >= PAIR_THRESHOLD) & (a_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {"a_id": a_ids[ai], "b_id": b_ids[bj], "cosine": cos[ai, bj]}
            )

    return fan_out(quant, spark, "vec_id").mapInPandas(
        gemm_pairs, "a_id long, b_id long, cosine double"
    )


def _hyperplanes(n_planes: int = 8, dim: int = DIM) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (seeded — deterministic across
    runs and engines; no runtime randomness in the plan)."""
    rng = random.Random(42)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


@register("ann_lsh_bucketed")  # approximate index → rows-only check
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH: bucket = sign bits of
    the dot product with 8 fixed hyperplanes; candidates join only
    within their bucket, then exact cosine ranks the bucket — the
    sub-linear ANN path (recall < 1.0 by construction, bounded by the
    bucket collision probability; add hyperplane tables to raise it)."""
    e = fan_out(load_table(spark, sf_dir, "embeddings"), spark, "vec_id")
    planes = _hyperplanes()
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        pl = F.array(*[F.lit(v) for v in plane])
        d = F.aggregate(
            F.zip_with(vec, pl, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(0)
    bucketed = e.select("vec_id", "embedding", bucket.alias("bucket"))
    ba = bucketed.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"), "bucket")
    bb = bucketed.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"), F.col("bucket").alias("bucket_b"))
    qa = _quantized(F.col("a_emb"))
    qb = _quantized(F.col("b_emb"))
    dot = F.aggregate(F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.zip_with(qa, qa, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x).cast("double"))
    nb = F.sqrt(F.aggregate(F.zip_with(qb, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x).cast("double"))
    pairs = (
        ba.join(bb, (F.col("bucket") == F.col("bucket_b")) & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id", "bucket", (dot.cast("double") / (na * nb)).alias("cosine"))
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cosine").desc(), F.col("b_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


N_CELLS = 16  # IVF coarse cells
N_PROBE = 4  # cells probed per query


@register("ann_ivf_topk")  # approximate index (trained quantizer) → rows-only
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: a seeded KMeans coarse quantizer
    partitions the vectors into cells; each query probes only its
    N_PROBE nearest cells and ranks candidates by exact cosine. This
    is the index-shaped scale path beside `ann_lsh_bucketed` — at
    100 TB the cell assignment is a one-off batch job, the inverted
    lists are bucketed tables, and a query touches ~N_PROBE/N_CELLS of
    the data. Recall vs the exact scan is asserted in
    tests/test_similarity_recall.py.
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = fan_out(load_table(spark, sf_dir, "embeddings"), spark, "vec_id")
    vecs = e.select(
        "vec_id",
        "embedding",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
    )
    km = KMeans(k=N_CELLS, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "cell")

    # queries probe their N_PROBE nearest centroids — tiny driver-side
    # math (the quantizer is N_CELLS x DIM, not data-sized)
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    q_rows = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    ).collect()
    probe_pairs = []
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:N_PROBE]:
            probe_pairs.append((r["vec_id"], int(cell)))
    probes = spark.createDataFrame(probe_pairs, "q_id long, cell int")

    q = _with_norm(e.filter(F.col("vec_id") < N_QUERIES), "q").join(
        F.broadcast(probes), "q_id"
    )
    c = _with_norm(assigned, "c").join(
        assigned.select(F.col("vec_id").alias("c_id"), F.col("cell").alias("c_cell")),
        "c_id",
    )
    sim = _dot(F.col("q_v"), F.col("c_v")).cast("double") / (
        F.col("q_norm") * F.col("c_norm")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        c.join(F.broadcast(q), (F.col("cell") == F.col("c_cell")) & (F.col("q_id") != F.col("c_id")))
        .select("q_id", F.col("c_id").alias("neighbor_id"), sim.alias("cosine"))
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
