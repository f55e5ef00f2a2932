"""Query registry backing __spark_entry__.py — package facade.

The former 10k-line entry_queries.py monolith is split into
per-family modules (VERDICT r08 item 7). Importing this package
imports every family module (each @register call adds to the
shared REGISTRY in _core), then pins the public REGISTRY to the
canonical order: _VERIFY_FIRST (the driver-window priority list)
followed by _REST_ORDER (the original monolith registration
order, preserved byte-for-byte across the split).
"""

from __future__ import annotations

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import (  # noqa: F401
    FIXTURE_CHUNK_SIZE,
    Q,
    REGISTRY,
    _BPE_N,
    _DISC_REV,
    _INCR_BATCH_MOD,
    _SQL_CHUNKS,
    _SQL_EMB,
    _SQL_MINHASH_BANDS,
    _SQL_PREPROCESS,
    _SQL_QUALITY_CHAIN,
    _SQL_SHINGLES,
    _SQL_TOKENS,
    _docs,
    _emb,
    _events,
    _pipe,
    _sql_bpe_chain,
    _sql_hashed_features,
    _sql_kmeans_chain,
    _sql_logreg_chain,
    _sql_pq_chain,
    register,
)

# Family modules — import order is registration order within each
# family; the canonical cross-family order is pinned below.
from calculate_file_content_size_for_vector_db_spark.entry_queries import (  # noqa: E402,F401
    core,
    text,
    dedup,
    similarity,
    events,
    relational,
    analytics,
    multimodal,
    maintenance,
    curation,
    pipelines,
)



# ---------------------------------------------------------------------------
# Registry iteration order. The round-1 driver verified only the first
# 50 registered queries (CORRECTNESS_r01.json stops at entry 50), so
# registration order is also verification priority. Put the queries
# that have never received a driver row FIRST, then the already-proven
# surface in its original order — every query gets a green row across
# rounds even if the driver caps or timeboxes its sweep.
# ---------------------------------------------------------------------------

# Round-9 priority (the driver caps its per-round sweep at ~50 rows).
# VERDICT r08 item 1: registry growth is FROZEN this round (zero new
# registrations) and the entire window is spent on verification debt —
# first the 3 queries that have never received a driver row in any
# round, then all 49 rows whose latest driver row is r04 (four rounds
# stale). 3 + 49 = 52 against a 50-row cap, so two rows must sit at
# positions 51-52; we chose the two building-block rows whose
# semantics are exercised by in-window composites (`minhash_signature`
# feeds `dedup_minhash_lsh`, `duplicated_spans` feeds the span/line/
# paragraph dedup rewrites, all in-window or r07-green). Everything
# else queues behind — each is still re-verified at sf0.001 by every
# pytest run, and the full registry sf0.01 sweep is committed
# per-round as ORACLES_r{N}.json (tests/check_oracles.py), so window
# position is about the driver's independent signal, not the only
# verification.
_VERIFY_FIRST = [
    # --- 1. never driver-checked (registered r08, slipped the window) ---
    "dedup_canonical",  # normalize-then-hash dedup tier (wave 26)
    "embedding_pca_power",  # matrix-free power iteration, anisotropy QA (wave 27)
    "weighted_sample_es",  # deterministic A-ES weighted reservoir (wave 30)
    # --- 2. r04-stale: similarity family first (contains the one
    # perf-weak row, sim_nearest_neighbor — VERDICT r08 item 4) ---
    "sim_nearest_neighbor",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_ivf_assign",
    "sim_lsh_buckets",
    # --- 3. r04-stale: core dedup production family ---
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_simhash",
    "dedup_embedding",
    "simhash_pairs",
    # --- 4. r04-stale: events / streaming-batch faces ---
    "events_asof_join",
    "events_json",
    "events_lag_delta",
    "events_session",
    "events_sessionize_lag",
    "events_sliding",
    "events_topk_per_user",
    "events_tumbling",
    # --- 5. r04-stale: text analysis ---
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    # --- 6. r04-stale: multimodal plumbing ---
    "multimodal_frames",
    "multimodal_image_meta",
    # --- 7. r04-stale: TPC-H completion set ---
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # --- 8. r04-stale: relational misc (set ops, cube, pivot, semi/anti) ---
    "nation_set_ops",
    "doc_cube",
    "lang_pivot",
    "langs_per_source",
    "semi_join_customers",
    "anti_join_customers",
    # --- 9. the two documented slip candidates (positions 51-52):
    # building blocks subsumed by in-window composites ---
    "minhash_signature",  # subsumed by dedup_minhash_lsh (position 11)
    "duplicated_spans",  # subsumed by line/paragraph dedup rewrites (r07/r08 green)
]

# The original monolith registration order for everything beyond the
# verification window — preserved so the split is invisible to the
# driver sweep.
_REST_ORDER = [
    "per_file_metrics",
    "corpus_totals",
    "rollup_summary",
    "preprocess_text",
    "chunk_stats",
    "running_offset",
    "chunk_enumerate",
    "file_chunk_join",
    "sort_by_size",
    "extrapolate_estimate",
    "project_basename",
    "filter_extension",
    "format_summary",
    "record_to_json",
    "chunk_split",
    "chunk_split_overlap",
    "file_scan",
    "pdf_extract",
    "csv_sink",
    "text_lm_score",
    "source_reputation",
    "quality_calibrate",
    "mix_balanced_recipe",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_incremental",
    "dedup_bloom_prefilter",
    "dedup_bloom_append",
    "simhash_pairs_wide",
    "sim_ivf_centroids",
    "sim_topk_ivf_stored",
    "sim_ivf_append",
    "knn_graph_append",
    "ivf_staleness",
    "pq_codebooks",
    "pq_codes",
    "pq_topk",
    "dedup_semantic_pq",
    "sim_topk_ivfpq",
    "sim_topk_ivfpq_probe2",
    "sim_topk_binary",
    "pq_recall_at_10",
    "ivfpq_recall_at_10",
    "ivfpq_probe2_recall_at_10",
    "binary_recall_at_10",
    "lsh_recall_at_10",
    "lsh_multiprobe_recall_at_10",
    "ivf_recall_at_10",
    "ivf_probe2_recall_at_10",
    "ann_frontier",
    "knn_graph",
    "triplet_mining",
    "knn_pagerank",
    "orders_monthly_revenue",
    "customer_balance_ntile",
    "lineitem_percentiles",
    "distinct_customers_ordering",
    "approx_distinct_customers",
    "approx_distinct_error",
    "monthly_activity_full_outer",
    "approx_percentile_error",
    "part_unpivot",
    "salted_event_counts",
    "cdc_upsert",
    "corpus_snapshot_diff",
    "grouping_sets_lang_source",
    "events_json_struct",
    "fuzzy_source_match",
    "orders_moving_avg",
    "training_pipeline",
    "curation_pipeline",
    "tpch_q6",
    "late_shipment_orders",
    "above_avg_customers",
    "vocabulary",
    "tfidf_top_terms",
    "train_test_split",
    "events_props_map",
    "orders_window_stats",
    "lineitem_stats",
    "grouped_percentiles",
    "value_histogram",
    "richest_customer_per_nation",
    "zscore_by_lang",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_clusters_star",
    "dedup_incremental_bloom",
    "dedup_clusters_append",
    "tpch_q10",
    "tpch_q14",
    "tpch_q19",
    "events_multi_rollup",
    "tpch_q7",
    "tpch_q18",
    "dedup_span_rewrite",
    "schema_evolution_read",
    "winsorize_chars",
    "quality_quarantine",
    "orders_price_band_join",
    "event_type_islands",
    "funnel_conversion",
    "column_profile_orders",
    "bucketed_join_revenue",
    "multimodal_audio_windows",
    "multimodal_phash_dedup",
    "multimodal_resize",
    "rag_ingest",
    "events_interval_join",
    "sim_topk_lsh_multiprobe",
    "json_source",
    "partitioned_source_prune",
    "tpch_q4",
    "pii_redact",
    "gopher_quality",
    "pack_sequences",
    "pack_sequences_salted",
    "decontaminate",
    "doc_repetition",
    "stratified_sample",
    "embedding_quantize",
    "char_entropy",
    "scd2_user_state",
    "dedup_semantic_append",
    "scd2_temporal_join",
    "training_shard_order",
    "orc_source",
    "sim_topk_matryoshka",
    "matryoshka_recall_at_10",
    "knn_label_propagation",
    "heavy_hitters_cms",
    "mix_temperature_recipe",
    "text_readability",
    "bpe_top_pairs",
    "bpe_train_merges",
    "bpe_apply_tokens",
    "bpe_apply_oov",
    "bpe_vocab_coverage",
    "line_dedup_rewrite",
    "zorder_layout",
    "embedding_dim_stats",
    "dedup_containment",
    "text_bigram_lm",
    "label_centroid_quality",
    "events_anomaly",
    "key_skew_profile",
    "join_size_cms",
    "minhash_jaccard_estimate",
    "cohort_retention",
    "orders_rfm_segments",
    "sim_range_search",
    "sim_topk_int8",
    "int8_recall_at_10",
    "knn_clustering_coeff",
    "salted_join_events",
    "bm25_search",
    "bm25_search_stored",
    "event_transitions",
    "fk_integrity_check",
    "lang_confusion",
    "split_drift_ks",
    "orders_weekday_seasonality",
    "hybrid_search_rrf",
    "ivf_list_stats",
    "pq_reconstruction_error",
    "dsir_importance",
    "source_cap_sample",
    "dedup_rate_by_source",
    "quality_classifier_weights",
    "quality_classifier_score",
    "quality_classifier_score_sampled",
    "contamination_score",
    "leakage_safe_split",
    "ccnet_lm_buckets",
    "dedup_pair_quality",
    "repetition_filters",
    "compaction_plan",
    "lake_vacuum_plan",
    "zonemap_prune_stats",
    "retrieval_recall_families",
    "mix_token_budget",
    "bpe_fertility_by_lang",
    "serving_pipeline",
    "ingest_pipeline",
    "paragraph_dedup_rewrite",
    "sim_topk_graph",
    "graph_recall_at_10",
    "knn_graph_ivf",
    "graph_ivf_recall_at_10",
    "quality_classifier_score_stored",
    "bpe_apply_stored",
    "corpus_datacard",
    "drift_psi",
    "drift_psi_stored",
    "quantile_hist_merge",
    "corpus_datacard_merge",
    "hll_merge_sources",
    "hll_overlap_sources",
    "dedup_ngram_prefix",
    "sim_topk_graph_stored",
]

assert set(_VERIFY_FIRST) | set(_REST_ORDER) == set(REGISTRY), (
    sorted(set(REGISTRY) ^ (set(_VERIFY_FIRST) | set(_REST_ORDER)))
)
REGISTRY = {name: REGISTRY[name] for name in _VERIFY_FIRST + _REST_ORDER}
