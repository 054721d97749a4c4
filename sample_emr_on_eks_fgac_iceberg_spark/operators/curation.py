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
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import (
    fan_out,
    load_table,
    materialize_once,
)

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

# ---------------------------------------------------------------------------
# Round-2 additions: repetition-based quality filtering (the Gopher
# rules), benchmark decontamination (the GPT-3 appendix-C n-gram
# overlap check), and fixed-budget sequence packing — the three passes
# between "curated corpus" and "tokenizer input" in a pretraining
# pipeline.
# ---------------------------------------------------------------------------

_NORM = r"\s+"
# Repetition thresholds (integer-exact compares, see below): flag when
# duplicate-word fraction > 0.60 or top-word fraction > 0.13.
_DUP_PCT = 60
_TOP_PCT = 13
# Decontamination: 4-word shingles; benchmark slice = md5 bucket >= 'e0'.
_GRAM_N = 4
_BENCH_FLOOR = "e0"
# Packing: per-sequence character budget.
_PACK_BUDGET = 2048


def _norm_words(col="text"):
    return F.split(F.regexp_replace(F.trim(F.lower(col)), _NORM, " "), " ")


@register(
    "quality_repetition_filter",
    oracle=rf"""
    WITH words AS (
        SELECT doc_id, source,
               unnest(string_split(
                   regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS w
        FROM documents),
    wc AS (SELECT doc_id, source, w, COUNT(*) AS c FROM words GROUP BY ALL),
    perdoc AS (
        SELECT doc_id, source, CAST(SUM(c) AS BIGINT) AS total_w,
               COUNT(*) AS distinct_w, CAST(MAX(c) AS BIGINT) AS top_w
        FROM wc GROUP BY doc_id, source)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN (total_w - distinct_w) * 100 > {_DUP_PCT} * total_w
                           OR top_w * 100 > {_TOP_PCT} * total_w
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(total_w) AS BIGINT) AS sum_total_w,
           CAST(SUM(distinct_w) AS BIGINT) AS sum_distinct_w
    FROM perdoc GROUP BY source
    """,
)
def quality_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1):
    flag documents whose duplicate-word fraction exceeds 0.60 or whose
    single most frequent word exceeds 0.13 of all tokens. Both
    thresholds are evaluated as pure integer cross-multiplications
    (``(total-distinct)*100 > 60*total``), so the Spark and DuckDB
    sides agree bit-for-bit with no float compare at the boundary.

    Plan shape: explode → two partial-aggregated shuffles keyed on
    (doc_id, word) then (doc_id) — both combine map-side, so the
    shuffled volume is per-doc vocabulary counts, not raw tokens. At
    100 TB the reduce keys are doc-unique and uniformly hash-spread;
    no key is hotter than one document's vocabulary."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    words = d.select("doc_id", "source", F.explode(_norm_words()).alias("w"))
    wc = words.groupBy("doc_id", "source", "w").agg(F.count(F.lit(1)).alias("c"))
    perdoc = wc.groupBy("doc_id", "source").agg(
        F.sum("c").alias("total_w"),
        F.count(F.lit(1)).alias("distinct_w"),
        F.max("c").alias("top_w"),
    )
    flagged = ((F.col("total_w") - F.col("distinct_w")) * 100 > _DUP_PCT * F.col("total_w")) | (
        F.col("top_w") * 100 > _TOP_PCT * F.col("total_w")
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(flagged, 1).otherwise(0)).alias("n_flagged"),
        F.sum("total_w").alias("sum_total_w"),
        F.sum("distinct_w").alias("sum_distinct_w"),
    )


@register(
    "decontaminate_ngrams",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(
                   regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS w,
               unnest(range(1, len(string_split(
                   regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) + 1)) AS pos,
               len(string_split(
                   regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS n_w
        FROM documents),
    sh AS (
        SELECT doc_id,
               string_agg(w, ' ') OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_GRAM_N - 1} FOLLOWING) AS gram,
               pos, n_w
        FROM toks),
    grams AS (SELECT doc_id, md5(gram) AS gh FROM sh WHERE pos <= n_w - {_GRAM_N - 1}),
    bench AS (SELECT DISTINCT gh FROM grams
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{_BENCH_FLOOR}'),
    contam AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bench b ON g.gh = b.gh
               WHERE substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 2) < '{_BENCH_FLOOR}')
    SELECT d.source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
    FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < '{_BENCH_FLOOR}'
    GROUP BY d.source
    """,
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by n-gram overlap (the GPT-3 paper's
    appendix-C procedure): a training document is contaminated when it
    shares any {4}-word shingle with the held-out benchmark slice
    (here the deterministic md5-bucket >= 0xe0 slice of the corpus).

    Plan shape at scale: the benchmark's distinct shingle-hash set is
    tiny relative to the corpus (eval sets are MBs, corpora are TBs),
    so it broadcasts; the corpus side is a narrow explode → broadcast
    semi-join — the 100 TB scan is never shuffled. Shingling is pure
    JVM (transform over an index sequence + slice + concat_ws)."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    bucket = F.substring(_doc_hash("doc_id"), 1, 2)
    words = _norm_words()
    grams = F.when(
        F.size(words) >= _GRAM_N,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(_GRAM_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, _GRAM_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # NOTE: the shingle explode feeds both the benchmark-slice distinct
    # and the training-side semi-join; a materialize_once barrier was
    # measured here and did NOT help (checkpointing the gram stream
    # costs what the duplicate derivation costs) — the two consumers
    # scan different bucket ranges, so the duplicated pipeline prunes
    # disjoint halves rather than doing the work twice.
    g = d.select(
        "doc_id", bucket.alias("bucket"), F.explode(grams).alias("gram")
    ).withColumn("gh", F.md5("gram"))
    bench = g.filter(F.col("bucket") >= _BENCH_FLOOR).select("gh").distinct()
    contam = (
        g.filter(F.col("bucket") < _BENCH_FLOOR)
        .join(F.broadcast(bench), "gh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_c", F.lit(1))
    )
    train = d.filter(bucket < _BENCH_FLOOR).select("doc_id", "source")
    return train.join(contam, "doc_id", "left").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.coalesce(F.col("is_c"), F.lit(0))).alias("n_contaminated"),
    )


@register(
    "pack_sequences",
    oracle=rf"""
    WITH ordered AS (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents),
    binned AS (
        SELECT source, doc_id, n_chars,
               (CAST(cum AS BIGINT) - n_chars) // {_PACK_BUDGET} AS bin
        FROM ordered)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT bin) AS n_bins,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM binned GROUP BY source
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget sequence packing: stream each source's documents in
    deterministic hash order and cut a new training sequence every
    {2048} cumulative characters (the running-sum formulation of
    greedy packing — a doc belongs to bin floor(prefix_sum/budget)).
    Deterministic by construction: bin assignment is a pure function
    of the (source, hash-order) prefix sums, independent of cluster
    size or partitioning.

    Plan shape: one shuffle on the low-cardinality source key for the
    running-sum window, then the final aggregate reuses the same
    partitioning. At 100 TB a single source is still one stratum —
    the production variant packs per (source, shard) where shard =
    pmod(hash(doc_id), k) to bound any one window's width; the
    packing guarantee is unchanged because prefix sums are computed
    within the shard."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "source")
    w = (
        Window.partitionBy("source")
        .orderBy(_doc_hash("doc_id"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        d.select("source", "doc_id", "n_chars")
        .withColumn("cum", F.sum("n_chars").over(w))
        .withColumn("bin", F.expr(f"(cum - n_chars) div {_PACK_BUDGET}"))
    )
    return binned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("bin").alias("n_bins"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "pack_sequences_sharded",
    oracle=rf"""
    WITH sharded AS (
        SELECT doc_id, source, n_chars,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM documents),
    ordered AS (
        SELECT source, shard, doc_id, n_chars,
               SUM(n_chars) OVER (PARTITION BY source, shard
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sharded),
    binned AS (
        SELECT source, shard, n_chars,
               (CAST(cum AS BIGINT) - n_chars) // {_PACK_BUDGET} AS bin
        FROM ordered)
    SELECT source, shard,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT bin) AS n_bins,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM binned GROUP BY source, shard
    """,
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of `pack_sequences`: packing runs per
    (source, shard) where shard = first md5 nibble of doc_id, so no
    window partition is ever wider than 1/16th of a source — the
    bounded-state form a real corpus needs (a single web-crawl source
    would otherwise be one window). The packing guarantee is unchanged:
    bin = floor(prefix_sum / budget) within the shard, a pure function
    of (source, shard, hash order). One shuffle on the compound key;
    the final aggregate reuses the same partitioning."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "source")
    sharded = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.substring(_doc_hash("doc_id"), 1, 1).alias("shard"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy(_doc_hash("doc_id"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        sharded.withColumn("cum", F.sum("n_chars").over(w))
        .withColumn("bin", F.expr(f"(cum - n_chars) div {_PACK_BUDGET}"))
    )
    return binned.groupBy("source", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("bin").alias("n_bins"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Round-3 additions: the export end of the pipeline — deterministic
# shard assignment for the tokenizer/trainer fan-in, and
# temperature-based language rebalancing (the multilingual mixing rule
# of Conneau & Lample 2019 §3.1 / the T5 mixture) with integer-exact
# quota arithmetic so the oracle matches bit-for-bit.
# ---------------------------------------------------------------------------

N_SHARDS = 16  # one hex nibble of md5 → 16 balanced shards
_LANG_BUDGET = 200  # documents kept across all languages


@register(
    "shard_export_manifest",
    oracle="""
    SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents GROUP BY shard_id
    """,
)
def shard_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for training-data export: shard =
    first md5 nibble of doc_id (16 shards), plus the per-shard manifest
    (row/byte accounting) a trainer consumes. Because the shard is a
    pure function of the row key, re-running the export after a
    failure, on a different cluster size, or engine produces byte-
    identical shards — the property that makes exports resumable.

    Plan shape at 100 TB: the real export is
    ``df.write.partitionBy("shard_id")`` riding this same expression —
    one hash shuffle on a uniformly distributed 16-value key (md5
    nibbles are uniform, so no shard skew), and the manifest here is
    the map-side-combined aggregate of that same shuffle."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    shard = F.substring(_doc_hash("doc_id"), 1, 1)
    return (
        d.select(shard.alias("shard_id"), "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "sample_language_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    weights AS (
        SELECT lang, c, CAST(FLOOR(SQRT(c)) AS BIGINT) AS w FROM counts),
    quotas AS (
        SELECT lang, c, w,
               CAST((w * {_LANG_BUDGET}) // (SELECT SUM(w) FROM weights)
                    AS BIGINT) AS quota
        FROM weights),
    ranked AS (
        SELECT d.lang, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
        FROM documents d)
    SELECT q.lang,
           q.c AS n_orig,
           q.quota,
           COUNT(r.doc_id) AS n_kept,
           CAST(COALESCE(SUM(r.n_chars), 0) AS BIGINT) AS kept_chars
    FROM quotas q LEFT JOIN ranked r ON r.lang = q.lang AND r.rk <= q.quota
    GROUP BY q.lang, q.c, q.quota
    """,
)
def sample_language_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (alpha = 0.5): each
    language's keep-quota is proportional to sqrt(count), so
    low-resource languages are up-weighted relative to their corpus
    share — the standard multilingual pretraining mixture. Selection
    within a language is md5-rank order, so the kept set is a
    deterministic function of the corpus, not of partitioning.

    Exactness: quota arithmetic never leaves integers —
    ``floor(sqrt(c))`` (sqrt is IEEE-correctly-rounded in both
    engines), an integer weight sum, and integer ``div`` — so quota
    boundaries cannot drift between engines. Plan shape: the per-lang
    counts/quotas frame is a few rows (broadcast); the corpus side is
    one window over the low-cardinality lang key — same shuffle the
    downstream per-lang packing reuses."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    weights = counts.withColumn("w", F.floor(F.sqrt("c")).cast("long"))
    # quotas feed both the output frame and the keep-filter: cut the
    # lineage so the per-lang count aggregate runs once, not per consumer
    quotas = materialize_once(
        weights.withColumn(
            "quota", F.expr(f"(w * {_LANG_BUDGET}) div (sum(w) over ())")
        ).select("lang", F.col("c").alias("n_orig"), "quota")
    )
    w_rank = Window.partitionBy("lang").orderBy(_doc_hash("doc_id"), F.col("doc_id"))
    ranked = d.select("lang", "doc_id", "n_chars").withColumn(
        "rk", F.row_number().over(w_rank)
    )
    kept = ranked.join(F.broadcast(quotas), "lang").filter(
        F.col("rk") <= F.col("quota")
    )
    return (
        quotas.join(
            kept.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_kept_inner"),
                F.sum("n_chars").alias("kept_chars_inner"),
            ),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_orig",
            "quota",
            F.coalesce("n_kept_inner", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars_inner", F.lit(0)).alias("kept_chars"),
        )
    )


_HIST_BUCKET_W = 32
_HIST_N_BUCKETS = 8


@register(
    "doc_length_histogram",
    oracle=f"""
    SELECT source,
           least(n_chars // {_HIST_BUCKET_W}, {_HIST_N_BUCKETS - 1}) AS bucket,
           least(n_chars // {_HIST_BUCKET_W}, {_HIST_N_BUCKETS - 1})
               * {_HIST_BUCKET_W} AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY 1, 2, 3
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length histogram (fixed-width buckets with a
    top catch-all) — the corpus-shape profile a curation run computes
    before choosing length cutoffs and packing targets.

    Plan shape at 100 TB: integer bucket arithmetic inside codegen and
    ONE hash aggregation with map-side partials; state is
    sources × buckets cells, independent of corpus size. The canonical
    'profile the lake' query — nothing else moves."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.col("n_chars") / _HIST_BUCKET_W), F.lit(_HIST_N_BUCKETS - 1)
    ).cast("long")
    return (
        d.select("source", "n_chars", bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "source",
            "bucket",
            (F.col("bucket") * _HIST_BUCKET_W).alias("bucket_lo"),
            "n_docs",
            "sum_chars",
            "min_chars",
            "max_chars",
        )
    )


@register(
    "pii_mask_customers",
    oracle=r"""
    SELECT c_custkey,
           md5(c_name) AS name_token,
           regexp_replace(c_name, '#[0-9]{6}', '#XXXXXX', 'g') AS name_masked,
           length(regexp_replace(c_name, '[^0-9]', '', 'g'))
               - length(regexp_replace(
                     regexp_replace(c_name, '#[0-9]{6}', '#XXXXXX', 'g'),
                     '[^0-9]', '', 'g')) AS n_digits_redacted,
           c_mktsegment
    FROM customer
    """,
)
def pii_mask_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrub pass a training-data pipeline runs
    before records leave the governed zone: the direct identifier is
    tokenized (md5 — joinable across tables, not reversible) and the
    quasi-identifier partially masked (the first 6 digits of the
    customer number X'd out by a deterministic regex, keeping a 3-digit
    tail for human spot-checks). The redaction count audits per row
    that the mask actually fired.

    Plan shape at 100 TB: a narrow per-row projection inside codegen —
    regex + hash, no shuffle, no UDF. Composes with the FGAC layer: the
    policy decides who sees raw bytes at all; this operator produces
    the shareable export."""
    c = fan_out(load_table(spark, sf_dir, "customer"), spark, "c_custkey")
    masked = F.regexp_replace(F.col("c_name"), r"#[0-9]{6}", "#XXXXXX")
    digits = lambda col: F.length(F.regexp_replace(col, "[^0-9]", ""))  # noqa: E731
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_token"),
        masked.alias("name_masked"),
        (digits(F.col("c_name")) - digits(masked)).alias("n_digits_redacted"),
        "c_mktsegment",
    )


_K_ANON = 5


@register(
    "k_anonymity_report",
    oracle=f"""
    WITH groups AS (
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS group_size
        FROM customer GROUP BY c_mktsegment, c_nationkey)
    SELECT c_mktsegment,
           COUNT(*) AS n_groups,
           MIN(group_size) AS min_k,
           CAST(SUM(CASE WHEN group_size < {_K_ANON} THEN group_size ELSE 0 END)
                AS BIGINT) AS rows_below_k,
           CAST(SUM(group_size) AS BIGINT) AS n_rows
    FROM groups GROUP BY c_mktsegment
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (market
    segment, nation): group sizes under k are re-identification risks
    that masking alone (`pii_mask_customers`) does not fix — the release
    decision needs this report first (suppress or generalize the
    offending groups). Emits per-segment group count, the worst k, and
    how many rows sit in sub-k groups.

    Plan shape at 100 TB: two stacked hash aggregations (quasi-ID
    group sizes, then per-segment rollup), both with map-side partials;
    state is bounded by quasi-identifier cardinality, not row count."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    below = F.when(F.col("group_size") < _K_ANON, F.col("group_size")).otherwise(0)
    return groups.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_k"),
        F.sum(below).cast("bigint").alias("rows_below_k"),
        F.sum("group_size").cast("bigint").alias("n_rows"),
    )


@register(
    "corpus_dataset_card",
    oracle=r"""
    WITH n AS (
        SELECT source, lang,
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(norm, ' '))) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT md5(norm)) AS BIGINT) AS n_distinct_texts,
           CAST(COUNT(*) - COUNT(DISTINCT md5(norm)) AS BIGINT) AS n_dup_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(len(norm)) AS BIGINT) AS min_chars,
           CAST(MAX(len(norm)) AS BIGINT) AS max_chars
    FROM n GROUP BY source
    """,
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card a training-data release ships: doc
    and token counts, exact-duplicate counts (docs minus distinct
    normalized-text hashes), language spread, and length extremes —
    the one-page summary reviewers and mixture planners read before
    any sampling weights are chosen. All counts are exact integers.

    Plan shape at 100 TB: a single groupBy(source) with two
    count-distincts — Catalyst plans those as expand + two-phase
    partial aggs, state bounded by sources × distinct hashes (the
    hash is 32 bytes, and distinct-per-source is the quantity being
    measured); everything else is map-side partial-aggregable. One
    pass over the corpus, no joins."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    n = d.select(
        "source",
        "lang",
        norm.alias("norm"),
    )
    return n.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("norm"), " "))).cast("bigint").alias("n_tokens"),
        F.countDistinct(F.md5("norm")).cast("bigint").alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("norm")))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.min(F.length("norm")).cast("bigint").alias("min_chars"),
        F.max(F.length("norm")).cast("bigint").alias("max_chars"),
    )


_WPS_K = 25  # weighted-priority sample size per language


@register(
    "sample_weighted_priority",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
                   // GREATEST(n_chars, 1) AS priority
        FROM documents),
    ranked AS (
        SELECT doc_id, lang, n_chars, priority,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY priority, doc_id) AS rk
        FROM keyed)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(priority AS BIGINT) AS priority, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_WPS_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling (Duffield/Lund/Thorup shape): each
    document draws a deterministic md5-uniform 56-bit key and its
    PRIORITY is key // weight — dividing by the weight makes heavy
    (long) documents proportionally likelier to take the smallest
    priorities, so the per-language top-{_WPS_K} is a
    probability-proportional-to-size sample that is REPRODUCIBLE
    across engines, runs, and cluster sizes (pure integer arithmetic;
    rand()-based weighted sampling is none of those).

    100 TB posture: one scan, no shuffle of document text — only
    (id, lang, weight, priority) tuples move; the per-language top-K
    is a partial WindowGroupLimit (≤K rows per task) before the
    exchange, the same bounded-shuffle shape as sketch_kmv_distinct."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14), 16, 10) "
            "AS BIGINT) div greatest(n_chars, CAST(1 AS BIGINT))"
        ).alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WPS_K)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("priority").cast("bigint").alias("priority"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# target corpus shares in parts-per-million, by language tier: a
# typical training-mix spec (upweight low-resource, cap the head)
_MIX_TARGET_PPM = {"en": 400_000, "de": 200_000, "fr": 200_000,
                   "es": 100_000, "it": 100_000}
_MIX_DEFAULT_PPM = 50_000


@register(
    "corpus_mix_rates",
    oracle=f"""
    WITH tok AS (
        SELECT lang,
               CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
                    AS BIGINT) AS lang_tokens
        FROM documents GROUP BY lang),
    tot AS (SELECT SUM(lang_tokens) AS total_tokens FROM tok),
    tgt AS (
        SELECT lang, lang_tokens,
               CASE lang
                   WHEN 'en' THEN 400000 WHEN 'de' THEN 200000
                   WHEN 'fr' THEN 200000 WHEN 'es' THEN 100000
                   WHEN 'it' THEN 100000 ELSE {_MIX_DEFAULT_PPM}
               END AS target_ppm
        FROM tok)
    SELECT t.lang, t.lang_tokens, t.target_ppm,
           CAST(LEAST(1000000,
                (t.target_ppm * tot.total_tokens) // GREATEST(t.lang_tokens, 1))
               AS BIGINT) AS rate_ppm,
           CAST(LEAST(1000000,
                (t.target_ppm * tot.total_tokens) // GREATEST(t.lang_tokens, 1))
                * t.lang_tokens // 1000000 AS BIGINT) AS expected_tokens
    FROM tgt t CROSS JOIN tot
    """,
)
def corpus_mix_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: given per-language token inventories and
    a target mix (ppm shares), compute the per-language SAMPLING RATE
    (capped at 1) that realizes the target against the total corpus,
    plus the expected token yield — the arithmetic behind
    `sample_language_temperature`'s downsampling and every data-mixture
    spec (upweight low-resource tiers, cap the head). Integer ppm
    end-to-end: rate = target_share × total // lang_tokens.

    100 TB posture: one corpus scan with map-side token-count
    partials down to |langs| rows; everything after is arithmetic on
    the inventory table with the 1-row total as a scalar broadcast —
    mix planning costs an aggregation, never a second corpus pass."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    tokens = (
        F.length("text")
        - F.length(F.regexp_replace("text", " ", ""))
        + 1
    ).cast("bigint")
    tok = d.groupBy("lang").agg(F.sum(tokens).alias("lang_tokens"))
    tot = tok.agg(F.sum("lang_tokens").alias("total_tokens"))
    target = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _MIX_TARGET_PPM.items()
        ],
        F.lit(_MIX_DEFAULT_PPM),
    )
    rate = F.expr(
        "least(CAST(1000000 AS BIGINT), "
        "(target_ppm * total_tokens) div greatest(lang_tokens, 1))"
    )
    return (
        tok.crossJoin(F.broadcast(tot))
        .withColumn("target_ppm", target.cast("bigint"))
        .withColumn("rate_ppm", rate.cast("bigint"))
        .select(
            "lang",
            F.col("lang_tokens").cast("bigint").alias("lang_tokens"),
            "target_ppm",
            "rate_ppm",
            F.expr("rate_ppm * lang_tokens div 1000000")
            .cast("bigint")
            .alias("expected_tokens"),
        )
    )


_FUNNEL_STOPS = "'the','a','an','and','of','to','is','in','it','that'"


@register(
    "corpus_curation_funnel",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x <> '') AS w,
               md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
        FROM documents),
    words AS (SELECT doc_id, unnest(w) AS word FROM toks),
    wc AS (SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY 1, 2),
    uni AS (SELECT doc_id, SUM(c) AS n_words, MAX(c) AS top_cnt,
                   SUM(CASE WHEN word IN ({_FUNNEL_STOPS})
                            THEN 1 ELSE 0 END) AS stop_hits
            FROM wc GROUP BY doc_id),
    base AS (SELECT t.doc_id, t.h, u.n_words, u.top_cnt, u.stop_hits
             FROM toks t JOIN uni u USING (doc_id)),
    q AS (SELECT * FROM base WHERE n_words BETWEEN 50 AND 100000
          AND stop_hits >= 2 AND 10 * top_cnt <= n_words),
    dd AS (SELECT q.* FROM q
           JOIN (SELECT h, MIN(doc_id) AS doc_id FROM q GROUP BY h) m
             ON q.h = m.h AND q.doc_id = m.doc_id),
    train AS (SELECT * FROM dd
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_BENCH_FLOOR}'),
    bench AS (SELECT DISTINCT h FROM base
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{_BENCH_FLOOR}'),
    clean AS (SELECT * FROM train WHERE h NOT IN (SELECT h FROM bench))
    SELECT 0 AS stage_idx, 'all' AS stage,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
           CAST((SELECT COALESCE(SUM(n_words), 0) FROM base) AS BIGINT)
               AS n_tokens
    UNION ALL SELECT 1, 'quality',
           CAST((SELECT COUNT(*) FROM q) AS BIGINT),
           CAST((SELECT COALESCE(SUM(n_words), 0) FROM q) AS BIGINT)
    UNION ALL SELECT 2, 'exact_dedup',
           CAST((SELECT COUNT(*) FROM dd) AS BIGINT),
           CAST((SELECT COALESCE(SUM(n_words), 0) FROM dd) AS BIGINT)
    UNION ALL SELECT 3, 'train_split',
           CAST((SELECT COUNT(*) FROM train) AS BIGINT),
           CAST((SELECT COALESCE(SUM(n_words), 0) FROM train) AS BIGINT)
    UNION ALL SELECT 4, 'decontaminated',
           CAST((SELECT COUNT(*) FROM clean) AS BIGINT),
           CAST((SELECT COALESCE(SUM(n_words), 0) FROM clean) AS BIGINT)
    """,
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation funnel in ONE report — how many
    documents (and whitespace tokens) survive each stage of a training-
    data pipeline: quality gate (three Gopher rules: length bounds,
    ≥2 distinct-hit stopwords, top-unigram share ≤ 1/10, all integer
    cross-multiplications) → exact dedup (min-doc_id canonical per
    normalized-text md5) → train/benchmark split (md5(doc_id) prefix,
    the decontaminate_ngrams convention) → document-level
    decontamination (drop training docs whose content hash appears in
    the benchmark split). The per-stage operators exist standalone
    (quality_gopher_rules, dedup_exact, decontaminate_ngrams); this is
    the composition a pipeline actually runs, with the attrition
    visible per stage.

    Plan shape at 100 TB: ONE tokenize pass feeds a (doc, word) hash
    agg → per-doc rollup; the stages are NESTED subsets (base ⊇
    quality ⊇ dedup ⊇ train ⊇ clean), so one h-keyed aggregate
    (canonical min-doc_id over quality rows + benchmark-membership
    flag, both in the SAME agg) joins back once, each row gets its
    deepest surviving stage as boolean flags, and the whole report is
    ONE 1-row aggregate unstacked to 5 rows (optimization r14 — the
    previous five count/sum agg pairs + two h-keyed joins cost ~10
    extra exchanges for the same nested-subset arithmetic)."""
    d = materialize_once(
        fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id").select(
            "doc_id",
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda x: x != "",
            ).alias("w"),
            F.md5(
                F.regexp_replace(
                    F.trim(F.lower(F.col("text"))), r"\s+", " "
                )
            ).alias("h"),
        )
    )
    words = d.select("doc_id", F.explode("w").alias("word"))
    wc = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    stops = [s.strip("'") for s in _FUNNEL_STOPS.split(",")]
    uni = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_cnt"),
        F.sum(
            F.when(F.col("word").isin(stops), 1).otherwise(0)
        ).alias("stop_hits"),
    )
    base = d.select("doc_id", "h").join(uni, "doc_id")
    split = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    b = materialize_once(
        base.withColumn(
            "q_ok",
            F.col("n_words").between(50, 100000)
            & (F.col("stop_hits") >= 2)
            & (F.lit(10) * F.col("top_cnt") <= F.col("n_words")),
        ).withColumn("in_train_split", split < _BENCH_FLOOR)
    )
    # canonical pick AND benchmark membership in ONE h-keyed agg:
    # min doc_id over quality survivors, plus 'any base row of this
    # hash falls in the benchmark split'
    h_info = b.groupBy("h").agg(
        F.min(F.when(F.col("q_ok"), F.col("doc_id"))).alias("min_q_id"),
        F.max(
            F.when(~F.col("in_train_split"), F.lit(1)).otherwise(F.lit(0))
        ).alias("in_bench"),
    )
    f = b.join(h_info, "h").select(
        "n_words",
        "q_ok",
        (F.col("q_ok") & (F.col("doc_id") == F.col("min_q_id"))).alias(
            "dd_ok"
        ),
        "in_train_split",
        "in_bench",
    )
    f = f.withColumn(
        "train_ok", F.col("dd_ok") & F.col("in_train_split")
    ).withColumn("clean_ok", F.col("train_ok") & (F.col("in_bench") == 0))

    def _pair(flag, tag: str):
        keep = F.when(F.col(flag), F.lit(1)).otherwise(F.lit(0))
        # coalesce BOTH sums: over an empty corpus SUM is NULL, while
        # the pre-r14 per-stage COUNT returned 0 — keep that contract
        # (ADVICE r14)
        return [
            F.coalesce(F.sum(keep), F.lit(0)).cast("bigint").alias(f"d_{tag}"),
            F.coalesce(
                F.sum(keep * F.col("n_words")), F.lit(0)
            )
            .cast("bigint")
            .alias(f"t_{tag}"),
        ]

    m = f.agg(
        F.coalesce(F.sum("n_words"), F.lit(0)).cast("bigint").alias("t_all"),
        *_pair("q_ok", "q"),
        *_pair("dd_ok", "dd"),
        *_pair("train_ok", "tr"),
        *_pair("clean_ok", "cl"),
    )
    n_all = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_all"))
    )
    return m.crossJoin(F.broadcast(n_all)).selectExpr(
        "stack(5, "
        "0, 'all', d_all, t_all, "
        "1, 'quality', d_q, t_q, "
        "2, 'exact_dedup', d_dd, t_dd, "
        "3, 'train_split', d_tr, t_tr, "
        "4, 'decontaminated', d_cl, t_cl) "
        "AS (stage_idx, stage, n_docs, n_tokens)"
    )


_L_DIV = 3


@register(
    "customers_l_diversity",
    oracle=f"""
    WITH bands AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                          / 200000.0) AS BIGINT) AS bal_band
        FROM customer),
    groups AS (
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS group_size,
               COUNT(DISTINCT bal_band) AS l
        FROM bands GROUP BY c_mktsegment, c_nationkey)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l < {_L_DIV} THEN 1 ELSE 0 END)
                AS BIGINT) AS groups_below_l,
           CAST(SUM(CASE WHEN l < {_L_DIV} THEN group_size ELSE 0 END)
                AS BIGINT) AS rows_in_low_l_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_rows
    FROM groups GROUP BY c_mktsegment
    """,
)
def customers_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the k-anonymity report's sibling
    (`k_anonymity_report` counts group SIZES; this counts DISTINCT
    SENSITIVE VALUES per quasi-identifier group). A group can satisfy
    k yet leak: if every member shares one account-balance band, the
    attacker learns the sensitive attribute without re-identification
    (Machanavajjhala et al., the published l-diversity criterion —
    PAPERS.md). Quasi-ID = (segment, nation); sensitive = $2,000
    balance band; per segment: worst l, groups below l=3, and the rows
    exposed in them. The band spells floor(cents / 200000.0) with ONE
    identical double division on both engines.

    Plan shape at 100 TB: two stacked hash aggregations — the
    (QI, band) distinct-count rides Spark's partial-distinct expand
    (state bounded by QI × band cardinality, not rows), the per-
    segment rollup is ≤|segments| rows. No joins, no windows."""
    c = load_table(spark, sf_dir, "customer")
    bands = c.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(
            F.round(F.col("c_acctbal") * 100).cast("bigint") / F.lit(200000.0)
        )
        .cast("bigint")
        .alias("bal_band"),
    )
    groups = bands.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct("bal_band").alias("l"),
    )
    low = F.col("l") < _L_DIV
    return groups.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum(F.when(low, 1).otherwise(0)).cast("bigint").alias(
            "groups_below_l"
        ),
        F.sum(F.when(low, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("rows_in_low_l_groups"),
        F.sum("group_size").cast("bigint").alias("n_rows"),
    )


_T_CLOSE_PPM = 200000  # t = 0.2 — the canonical worked-example threshold


@register(
    "customers_t_closeness",
    oracle=f"""
    WITH bands AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                          / 200000.0) AS BIGINT) AS bal_band
        FROM customer),
    tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   COUNT(DISTINCT bal_band) AS m FROM bands),
    bcnt AS (SELECT bal_band, CAST(COUNT(*) AS HUGEINT) AS corpus_cnt
             FROM bands GROUP BY bal_band),
    gsz AS (SELECT c_mktsegment, c_nationkey,
                   CAST(COUNT(*) AS HUGEINT) AS group_size
            FROM bands GROUP BY c_mktsegment, c_nationkey),
    gcnt AS (SELECT c_mktsegment, c_nationkey, bal_band,
                    CAST(COUNT(*) AS HUGEINT) AS cnt
             FROM bands GROUP BY c_mktsegment, c_nationkey, bal_band),
    grid AS (SELECT g.c_mktsegment, g.c_nationkey, g.group_size,
                    b.bal_band, b.corpus_cnt, COALESCE(gc.cnt, 0) AS cnt
             FROM gsz g CROSS JOIN bcnt b
             LEFT JOIN gcnt gc
               ON gc.c_mktsegment = g.c_mktsegment
              AND gc.c_nationkey = g.c_nationkey
              AND gc.bal_band = b.bal_band),
    pref AS (SELECT c_mktsegment, c_nationkey, group_size,
                    SUM(cnt * (SELECT n FROM tot)
                        - corpus_cnt * group_size)
                        OVER (PARTITION BY c_mktsegment, c_nationkey
                              ORDER BY bal_band
                              ROWS UNBOUNDED PRECEDING) AS p
             FROM grid),
    emd AS (SELECT c_mktsegment, c_nationkey, group_size,
                   SUM(ABS(p)) AS s
            FROM pref GROUP BY c_mktsegment, c_nationkey, group_size),
    scored AS (SELECT c_mktsegment, c_nationkey, group_size,
                      CASE WHEN (SELECT m FROM tot) > 1
                           THEN (1000000 * s) // (group_size
                                * (SELECT n FROM tot)
                                * ((SELECT m FROM tot) - 1))
                           ELSE 0 END AS emd_ppm
               FROM emd)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(emd_ppm) AS BIGINT) AS max_emd_ppm,
           CAST(SUM(CASE WHEN emd_ppm > {_T_CLOSE_PPM} THEN 1 ELSE 0 END)
                AS BIGINT) AS groups_above_t,
           CAST(SUM(CASE WHEN emd_ppm > {_T_CLOSE_PPM} THEN group_size
                         ELSE 0 END) AS BIGINT) AS rows_above_t,
           CAST(SUM(group_size) AS BIGINT) AS n_rows
    FROM scored GROUP BY c_mktsegment
    """,
)
def customers_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third leg of the privacy trio
    (k-anonymity → l-diversity → t-closeness, Li/Li/Venkatasubramanian
    2007): a group can satisfy both k and l yet still leak when its
    sensitive-value DISTRIBUTION skews far from the corpus's (all
    members in the two lowest balance bands reveals near-certain
    poverty). Distance is the ordered-attribute Earth Mover's Distance
    in its discrete prefix-sum form: EMD = Σ|Σ_{{b≤j}}(P_b − Q_b)| /
    (m−1) over the m ordered bands. Exact integers throughout — the
    per-band deviation is cnt·N − corpus_cnt·group_size over the
    common denominator group_size·N, so both engines fold identical
    bigints and the ppm score is one truncating division. Same QI
    (segment, nation) and sensitive band as `customers_l_diversity`.

    Plan shape at 100 TB: three hash aggregates collapse the fact
    table (corpus band counts — bounded, broadcast; QI group sizes;
    QI×band counts); the grid is QI-groups × m rows (m = band count,
    bounded), built by a broadcast cross of the band table; the prefix
    sum is a window PARTITIONED per QI group ordered by band (≤ m rows
    per partition, never data-sized); products ride DECIMAL(38,0)
    because cnt·N overflows int64 at corpus scale — on the bounded
    grid frame, not the fact table, so the off-codegen decimal cost is
    O(groups × m)."""
    c = load_table(spark, sf_dir, "customer")
    bands = c.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(
            F.round(F.col("c_acctbal") * 100).cast("bigint") / F.lit(200000.0)
        )
        .cast("bigint")
        .alias("bal_band"),
    )
    bands = materialize_once(bands)
    tot = bands.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.countDistinct("bal_band").cast("bigint").alias("m"),
    )
    bcnt = bands.groupBy("bal_band").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("corpus_cnt")
    )
    gsz = bands.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("group_size")
    )
    gcnt = bands.groupBy("c_mktsegment", "c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt")
    )
    grid = (
        gsz.crossJoin(F.broadcast(bcnt))
        .join(gcnt, ["c_mktsegment", "c_nationkey", "bal_band"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "group_size",
            "bal_band",
            "n",
            "m",
            (
                F.coalesce(F.col("cnt"), F.lit(0).cast("decimal(38,0)"))
                * F.col("n")
                - F.col("corpus_cnt") * F.col("group_size")
            ).alias("diff"),
        )
    )
    w = (
        Window.partitionBy("c_mktsegment", "c_nationkey")
        .orderBy("bal_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = grid.withColumn("p", F.sum("diff").over(w))
    emd = pref.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum(F.abs(F.col("p"))).alias("s"),
        F.first("group_size").alias("group_size"),
        F.first("n").alias("n"),
        F.first("m").alias("m"),
    )
    scored = emd.select(
        "c_mktsegment",
        "group_size",
        F.when(
            F.col("m") > 1,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * s) div "
                "(group_size * n * CAST(m - 1 AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("emd_ppm"),
    )
    loose = F.col("emd_ppm") > _T_CLOSE_PPM
    return scored.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.max("emd_ppm").cast("bigint").alias("max_emd_ppm"),
        F.sum(F.when(loose, 1).otherwise(0)).cast("bigint").alias(
            "groups_above_t"
        ),
        F.sum(F.when(loose, F.col("group_size")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_above_t"),
        F.sum("group_size").cast("bigint").alias("n_rows"),
    )
