"""Training-data curation operators over ``documents`` (north-star
surface, SURVEY.md §2.B): deterministic hash sampling, train/holdout
splitting, stratified per-source capping, and the composed curation
pipeline a 100 TB pretraining corpus goes through before tokenization.

Every operator is fully deterministic — sampling decisions are a pure
function of the row key via md5 (identical across engines), never an
RNG — so each query has an exact DuckDB oracle, and at scale the same
row always lands in the same split regardless of cluster size,
partitioning, or retries (the reproducibility property a training-data
pipeline must have).

100 TB posture: every operator is a narrow map + filter over the scan
(hash, compare, keep) with at most one window per stratum — no global
shuffle except the per-source window in the stratified cap, which
shuffles on the low-cardinality stratum key. Pure JVM expressions,
zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import fan_out, load_table

# Keep rows whose md5(doc_id) first byte is below the cutoff: 0x1a/0x100
# ≈ 10.2% — an exact, engine-independent "sample 10%".
_SAMPLE_CUTOFF = "1a"
# Holdout: first byte >= 0xf0 → 16/256 = 6.25%.
_HOLDOUT_FLOOR = "f0"
_STRATUM_CAP = 20


def _doc_hash(col):
    """Stable row hash shared verbatim with the DuckDB oracle."""
    return F.md5(F.col(col).cast("string"))


@register(
    "sample_hash_fraction",
    oracle=f"""
    SELECT doc_id, source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_SAMPLE_CUTOFF}'
    """,
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample keyed on md5(doc_id) — the
    reproducible alternative to rand(): the same rows are sampled on
    every engine, every run, every cluster size."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    bucket = F.substring(_doc_hash("doc_id"), 1, 2)
    return (
        d.select("doc_id", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < _SAMPLE_CUTOFF)
    )


@register(
    "split_train_holdout",
    oracle=f"""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{_HOLDOUT_FLOOR}'
                THEN 'holdout' ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-disjoint train/holdout split (6.25% holdout) with per-split
    volume accounting. Because membership is a function of doc_id, a
    document can never leak between splits across pipeline runs —
    contamination-safe by construction."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    split = F.when(
        F.substring(_doc_hash("doc_id"), 1, 2) >= _HOLDOUT_FLOOR, F.lit("holdout")
    ).otherwise(F.lit("train"))
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "sample_stratified_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    SELECT source,
           COUNT(*) AS n_kept,
           MIN(doc_id) AS min_doc_id,
           CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
    FROM ranked WHERE rk <= {_STRATUM_CAP}
    GROUP BY source
    """,
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap (data mixing): keep at most N docs per stratum,
    chosen by hash order so the cap is deterministic, not
    arrival-order-dependent. One shuffle on the stratum key; the window
    never sees more than one stratum per partition."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "source")
    w = Window.partitionBy("source").orderBy(_doc_hash("doc_id"), F.col("doc_id"))
    return (
        d.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRATUM_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
    )


@register(
    "curation_pipeline",
    oracle=rf"""
    WITH norm AS (
        SELECT doc_id, source, lang,
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm_text,
               n_chars
        FROM documents),
    scored AS (
        SELECT *,
               md5(norm_text) AS content_hash,
               len(string_split(norm_text, ' ')) AS n_words
        FROM norm),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY content_hash ORDER BY doc_id) AS dup_rank
            FROM scored)
        WHERE dup_rank = 1),
    filtered AS (
        SELECT * FROM deduped
        WHERE n_words BETWEEN 5 AND 10000
          AND n_chars >= 20
          AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'),
    final AS (SELECT source, lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_words) AS BIGINT) AS total_words
              FROM filtered GROUP BY source, lang)
    SELECT * FROM final
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-curation pass: normalize → exact-dedup (keep
    lowest doc_id per content hash) → length/volume filters →
    deterministic ~80% keep-sample → per-(source, lang) accounting.

    Plan shape at scale: one shuffle for the dedup window on
    content_hash, one for the final aggregate — everything else is a
    narrow map over the scan. The keep-sample runs BEFORE the heavy
    stages would tokenize, so downstream cost scales with the kept
    fraction."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    norm = d.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("norm_text"),
    )
    scored = norm.select(
        "*",
        F.md5("norm_text").alias("content_hash"),
        F.size(F.split("norm_text", " ")).alias("n_words"),
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = scored.withColumn("dup_rank", F.row_number().over(w)).filter(
        F.col("dup_rank") == 1
    )
    filtered = deduped.filter(
        F.col("n_words").between(5, 10000)
        & (F.col("n_chars") >= 20)
        & (F.substring(_doc_hash("doc_id"), 1, 2) < "cc")
    )
    return filtered.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
    )
