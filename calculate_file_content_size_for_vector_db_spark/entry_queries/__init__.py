"""Query registry backing __spark_entry__.py — package facade.

The former 10k-line entry_queries.py monolith is split into
per-family modules (VERDICT r08 item 7). Importing this package
imports every family module (each @register call adds to the
shared REGISTRY in _core), then pins the public REGISTRY to the
canonical order: _VERIFY_FIRST (the driver-window priority list,
rebuilt per-round from the CORRECTNESS history — SURVEY §5.1)
followed by _REST_ORDER (every already-verified query, cohort order
preserved within rounds).
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

# Round-14 window. Steady-state policy (SURVEY.md §5.1, declared r10,
# rebuilt per-round by tools/verify_window.py from the committed
# CORRECTNESS_r*.json history): (1) queries never driver-checked --
# this round's registrations, budget <=10/round, prepended as they
# land -- then (2) the driver-checked cohorts, OLDEST latest-round
# first, whole cohorts only. Every r13 registration got a driver row
# in r13, so the r14 head is the 33-row r08 remainder (the rows the
# ~50-row r13 driver window could not reach) followed by the 50-row
# r09 cohort -- the two oldest cohorts in the registry.

# The round this window was built FOR: the lists below were rebuilt
# from the r01..r{N-1} CORRECTNESS history at the start of round N.
# tests/test_registry_inventory.py uses this to SKIP (not fail) the
# policy check once the driver drops CORRECTNESS_r{N}.json -- the
# skip message is the r{N+1} rebuild reminder (ADVICE r11 item 4).
_WINDOW_BUILT_FOR_ROUND = 14

_VERIFY_FIRST = [
    # --- 0. registered this round (never driver-checked) ---
    "ivf_filtered_recall_at_10",  # filtered IVF decay vs exact filtered truth (last matrix cell)
    "upsert_face_relabel",  # real writeStream upsert face == rebuild-on-current-corpus
    "sim_topk_pq_stored",  # parquet-backed ADC serve (codebooks+codes store round-trip)
    "sim_pq_upsert",  # PQ code-store upsert x2 == frozen-codebook re-encode of current corpus
    "sim_topk_pq_stored_filtered",  # filtered ADC serve from the parquet store
    "sim_pq_takedown_serve",  # purged code store + forgotten-query ghost check
    # --- r08 cohort (33 rows) ---
    "bpe_vocab_coverage",
    "line_dedup_rewrite",
    "join_size_cms",
    "bm25_search_stored",
    "quality_classifier_weights",
    "quality_classifier_score_sampled",
    "contamination_score",
    "ccnet_lm_buckets",
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
    # --- r09 cohort (50 rows) ---
    "dedup_canonical",
    "embedding_pca_power",
    "weighted_sample_es",
    "sim_nearest_neighbor",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_ivf_assign",
    "sim_lsh_buckets",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_simhash",
    "dedup_embedding",
    "simhash_pairs",
    "events_asof_join",
    "events_json",
    "events_lag_delta",
    "events_session",
    "events_sessionize_lag",
    "events_sliding",
    "events_topk_per_user",
    "events_tumbling",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    "multimodal_frames",
    "multimodal_image_meta",
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
    "nation_set_ops",
    "doc_cube",
    "lang_pivot",
    "langs_per_source",
    "semi_join_customers",
    "anti_join_customers",
]

_REST_ORDER = [
    # --- r10 cohort (50 rows) ---
    "ingest_serve_handoff",
    "composed_faces_ledger",
    "dedup_takedown_recluster",
    "ingest_replay_idempotent",
    "ingest_takedown_readmit",
    "sim_ivf_takedown_serve",
    "minhash_signature",
    "duplicated_spans",
    "text_lm_score",
    "source_reputation",
    "dedup_ngram_jaccard",
    "simhash_pairs_wide",
    "pq_topk",
    "dedup_semantic_pq",
    "sim_topk_ivfpq",
    "sim_topk_ivfpq_probe2",
    "sim_topk_binary",
    "orders_monthly_revenue",
    "customer_balance_ntile",
    "lineitem_percentiles",
    "distinct_customers_ordering",
    "approx_distinct_customers",
    "training_pipeline",
    "dedup_clusters",
    "dedup_survivors",
    "tpch_q10",
    "tpch_q14",
    "tpch_q19",
    "events_multi_rollup",
    "tpch_q7",
    "tpch_q18",
    "schema_evolution_read",
    "winsorize_chars",
    "quality_quarantine",
    "orders_price_band_join",
    "event_type_islands",
    "funnel_conversion",
    "column_profile_orders",
    "bucketed_join_revenue",
    "multimodal_audio_windows",
    "rag_ingest",
    "events_interval_join",
    "sim_topk_lsh_multiprobe",
    "json_source",
    "partitioned_source_prune",
    "pii_redact",
    "gopher_quality",
    "pack_sequences",
    "pack_sequences_salted",
    "decontaminate",
    # --- r11 cohort (50 rows) ---
    "sim_graph_takedown_serve",
    "bm25_takedown_search",
    "datacard_takedown_refold",
    "sim_graph_takedown_repair",
    "sim_topk_ivf_filtered",
    "doc_repetition",
    "stratified_sample",
    "embedding_quantize",
    "scd2_user_state",
    "pq_codebooks",
    "pq_codes",
    "sim_ivf_centroids",
    "dedup_ngram_jaccard_capped",
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
    "quality_calibrate",
    "mix_balanced_recipe",
    "dedup_incremental",
    "pq_recall_at_10",
    "ivfpq_recall_at_10",
    "ivfpq_probe2_recall_at_10",
    "binary_recall_at_10",
    "lsh_recall_at_10",
    "lsh_multiprobe_recall_at_10",
    "ivf_recall_at_10",
    "knn_graph",
    "triplet_mining",
    "knn_pagerank",
    "approx_distinct_error",
    "monthly_activity_full_outer",
    "approx_percentile_error",
    "curation_pipeline",
    "dedup_span_rewrite",
    # --- r12 cohort (50 rows) ---
    "sim_topk_graph_filtered",
    "sim_topk_sq8_filtered",
    "sim_ivf_upsert",
    "drift_takedown_refold",
    "sim_topk_maxsim",
    "graph_filtered_recall_at_10",
    "sim_topk_maxsim_ivf",
    "maxsim_ivf_recall_at_10",
    "sim_topk_ivf_stored_filtered",
    "sim_topk_pq_filtered",
    "multimodal_phash_dedup",
    "multimodal_resize",
    "sim_topk_matryoshka",
    "matryoshka_recall_at_10",
    "knn_label_propagation",
    "heavy_hitters_cms",
    "dedup_containment",
    "text_bigram_lm",
    "minhash_jaccard_estimate",
    "sim_topk_int8",
    "int8_recall_at_10",
    "bm25_search",
    "hybrid_search_rrf",
    "ann_frontier",
    "part_unpivot",
    "salted_event_counts",
    "cdc_upsert",
    "grouping_sets_lang_source",
    "events_json_struct",
    "fuzzy_source_match",
    "orders_moving_avg",
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
    "char_entropy",
    "training_shard_order",
    "orc_source",
    "mix_temperature_recipe",
    "text_readability",
    "bpe_top_pairs",
    # --- r13 cohort (50 rows) ---
    "sq8_filtered_recall_at_10",
    "pq_filtered_recall_at_10",
    "sim_topk_maxsim_filtered",
    "sim_maxsim_upsert_serve",
    "sim_maxsim_takedown_serve",
    "bm25_upsert_search",
    "dedup_upsert_relabel",
    "sim_graph_upsert_serve",
    "sim_topk_maxsim_ivf_filtered",
    "maxsim_filtered_recall_at_10",
    "zorder_layout",
    "embedding_dim_stats",
    "label_centroid_quality",
    "events_anomaly",
    "key_skew_profile",
    "cohort_retention",
    "orders_rfm_segments",
    "sim_range_search",
    "knn_clustering_coeff",
    "salted_join_events",
    "event_transitions",
    "fk_integrity_check",
    "lang_confusion",
    "split_drift_ks",
    "orders_weekday_seasonality",
    "ivf_list_stats",
    "pq_reconstruction_error",
    "dsir_importance",
    "source_cap_sample",
    "dedup_rate_by_source",
    "quality_classifier_score",
    "leakage_safe_split",
    "dedup_pair_quality",
    "dedup_bloom_prefilter",
    "dedup_bloom_append",
    "sim_topk_ivf_stored",
    "sim_ivf_append",
    "knn_graph_append",
    "ivf_staleness",
    "ivf_probe2_recall_at_10",
    "corpus_snapshot_diff",
    "dedup_clusters_star",
    "dedup_incremental_bloom",
    "dedup_clusters_append",
    "tpch_q4",
    "dedup_semantic_append",
    "scd2_temporal_join",
    "bpe_train_merges",
    "bpe_apply_tokens",
    "bpe_apply_oov",
]

# Unconditional (not `assert` — must survive `python -O`): a query
# registered in a family module but absent from the order lists would
# otherwise be silently dropped from the public REGISTRY below.
if set(_VERIFY_FIRST) | set(_REST_ORDER) != set(REGISTRY):
    raise RuntimeError(
        "entry_queries order lists out of sync with registry: "
        f"{sorted(set(REGISTRY) ^ (set(_VERIFY_FIRST) | set(_REST_ORDER)))}"
    )
if len(_VERIFY_FIRST) + len(_REST_ORDER) != len(REGISTRY):
    # Set equality alone would let a name duplicated within or across
    # the order lists pass silently (the dict comprehension dedups),
    # corrupting window positions without any error (ADVICE r10).
    raise RuntimeError(
        "duplicate name in entry_queries order lists: "
        f"{len(_VERIFY_FIRST)}+{len(_REST_ORDER)} != {len(REGISTRY)}"
    )
REGISTRY = {name: REGISTRY[name] for name in _VERIFY_FIRST + _REST_ORDER}
