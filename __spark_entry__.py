"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the engine's operator surface (SURVEY.md §2)
for the DuckDB-oracle correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"

# The driver's correctness gate evaluates a bounded prefix of queries()
# (50 in round 1).  Order the registry so that prefix covers every
# component family — FGAC flagships, temporal joins, UDF/UDAF surface,
# text / dedup / similarity / multimodal pipeline operators, streaming
# mirrors, and the relational queries that have not yet appeared in a
# CORRECTNESS artifact — before repeating relational queries already
# verified green in round 1.
_PRIORITY = [
    # FGAC flagships (reference consumer_emr_on_eks_setup.sh:407-418)
    "fgac_patients_scan",
    "fgac_claims_join",
    "fgac_catalog_qualified_scan",
    "fgac_corpus_stats",
    # round-4: consumer CREATE VIEW (invoker's rights) through the driver
    "fgac_view_scan",
    # temporal joins
    "asof_join_click_purchase",
    "range_join_purchase_followup",
    "window_range_30d_spend",
    # round-4 batch 3: event analytics (funnel / TWA / retention)
    "events_funnel_conversion",
    "events_time_weighted_value",
    "events_retention_cohorts",
    # UDF / UDAF / applyInPandas
    "udf_scalar_charge",
    "udaf_weighted_discount",
    "applyinpandas_minmax",
    # text analysis
    "text_token_counts",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprint",
    "text_rolling_hash",
    "text_vocab_topk",
    # round-4: per-language collocation mining + corpus-LM quality proxy
    "bigram_topk_per_lang",
    "quality_unigram_rarity",
    # round-4 batch 4: BPE merge-pair statistics (tokenizer training)
    "bpe_merge_candidates",
    # round-4 batch 5: count-min heavy hitters (md5 hashes, full oracle)
    "sketch_cms_heavy_hitters",
    # round-4 batch 2: winnowing sketch, trigram novelty, TF-IDF terms
    "winnowing_fingerprint",
    "doc_ngram_novelty",
    "tfidf_top_terms",
    # dedup
    "dedup_exact",
    "dedup_ngram_jaccard",
    # round-4: md5-deterministic MinHash-LSH — full oracle, unlike the
    # pyspark.ml hash-family variant (rows-only, recorded r3, parked
    # below the window)
    "dedup_minhash_det",
    "dedup_simhash_det",
    "dedup_embedding_cosine",
    # round-4 batch 2: transitive closure of the near-dup graph
    # (iterative hash-to-min CC, oracle = recursive CTE)
    "dedup_connected_components",
    # round-4 batch 4: per-component dedup savings (canonical survivors)
    "dedup_savings_report",
    # round-4 batch 5: triangle enumeration (tight duplicate cliques)
    "graph_triangle_count",
    # similarity search
    "ann_cosine_topk",
    "similarity_pairs_threshold",
    "ann_lsh_bucketed",
    # round-4: md5-hyperplane fixed-point LSH — full oracle
    "ann_lsh_det",
    # round-4: exact IVF/k-means training aggregation
    "embedding_centroids",
    # round-4 batch 2: k-NN majority-vote labeling (weak supervision)
    "knn_label_vote",
    # multimodal
    "multimodal_catalog",
    "multimodal_frame_sample",
    # round-4: genuine PCM decode (numpy frombuffer), oracle-checked
    "multimodal_audio_rms",
    # round-4: the one oracle-bearing query that had never been inside
    # a driver window (verdict r3 task 2) — pinned well inside it now
    "pack_sequences_sharded",
    # round-4 batch 2: corpus profiling + PII scrub
    "doc_length_histogram",
    "pii_mask_customers",
    # round-4 batch 4: k-anonymity audit beside the mask
    "k_anonymity_report",
    # round-4 batch 5: correlated LATERAL subquery (decorrelated top-K)
    "lateral_top_nations_per_region",
    # round-4 batch 5: the remaining join flavor (RIGHT OUTER)
    "join_right_segment_spend",
    # green/recorded in r3; parked just below the window so every
    # not-yet-driver-checked oracle query fits inside it
    "dedup_minhash_lsh",
    "dedup_simhash",
    "shard_export_manifest",
    "sample_language_temperature",
    "ann_ivf_topk",
    "cdc_incremental_append",
    "page_orders_offset",
    # rows-only featurizer stub: recorded in CORRECTNESS_r03; parked
    # just outside the ~50-query window so every not-yet-driver-checked
    # oracle query fits inside it
    "multimodal_features",
    # streaming (batch mirrors of the structured-streaming queries)
    "events_tumbling_hourly",
    "events_sliding_windows",
    "events_sessionization",
    "events_dedup_first",
    "events_enriched_segments",
    "events_running_user_totals",
    "events_session_window_native",
    # relational queries with no prior CORRECTNESS entry
    "percentile_order_prices",
    "stats_exact_corr",
    "map_ops_event_profile",
    "set_bag_ops_returnflag",
    "q21_waiting_suppliers",
    "window_distribution_ranks",
    "approx_percentile_prices",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    # training-data curation (deterministic hash sampling / splits)
    "sample_hash_fraction",
    "split_train_holdout",
    "sample_stratified_cap",
    "curation_pipeline",
    "quality_repetition_filter",
    "decontaminate_ngrams",
    "pack_sequences",
    # headline relational (green in round 1; keep representatives in-window)
    "q1_pricing_summary",
    "q9_product_profit",
    "grouping_sets_revenue",
]


def _ordered(reg: dict) -> dict:
    """Priority names first (those that exist), then the rest in
    registration order."""
    out = {n: reg[n] for n in _PRIORITY if n in reg}
    out.update((n, v) for n, v in reg.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's FGAC-filtered claims⋈patients join
    (consumer_emr_on_eks_setup.sh:412) run through the engine's policy
    layer, preceded by a pricing-summary scan over the sf0.001 lake to
    exercise the parquet path."""
    QUERIES["q1_pricing_summary"](spark, SF_SMOKE_DIR).collect()
    return QUERIES["fgac_claims_join"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    missing here (approx sketches, streaming-stateful) get the driver's
    rows-only check."""
    return _ordered(ORACLE)
