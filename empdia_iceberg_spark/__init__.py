"""empdia_iceberg_spark — a brand-new PySpark-native analytics engine.

Reproduces, Spark-first, the query/data-processing capabilities of the
reference repo MorningKay/EmpDia-Iceberg (see SURVEY.md) and extends
them into a general data-lake engine. Implemented and oracle-checked:

- relational OLAP core (joins, aggs, windows, set ops, scalar fns)
- reference semantics (dialogue prep, reward pipeline, termination,
  GRPO normalization, classifier stub, collate, splits)
- Structured Streaming (tumbling/sliding/session windows, watermark
  late-drop, stateful conversation machine via applyInPandasWithState)
- LLM-pipeline operators (exact + MinHash-LSH + SimHash dedup, cosine
  kNN + LSH ANN, text stats/quality/lang-id/fingerprint, multimodal
  binary-payload plumbing with a documented decode stub)
- snapshot table management on parquet (create/append/MERGE/time
  travel/expire/compact — the Iceberg-semantics fallback; no
  iceberg-spark-runtime jar ships in this environment) and write sinks

Importing this package populates the query registry
(``empdia_iceberg_spark.registry``) used by ``__spark_entry__.py``.
"""

from empdia_iceberg_spark import registry  # noqa: F401
from empdia_iceberg_spark.session import get_spark  # noqa: F401

# Import operator modules for their @register side effects.
# Sweep ordering is handled by registry.promote(_SWEEP_PRIORITY) below —
# module import order no longer matters for driver evidence.
from empdia_iceberg_spark.operators import asof  # noqa: F401
from empdia_iceberg_spark.operators import layout  # noqa: F401
from empdia_iceberg_spark.operators import subqueries  # noqa: F401
from empdia_iceberg_spark.operators import mixture  # noqa: F401
from empdia_iceberg_spark.operators import bucketing  # noqa: F401
from empdia_iceberg_spark.operators import skyline  # noqa: F401
from empdia_iceberg_spark.operators import multimodal  # noqa: F401
from empdia_iceberg_spark.functions import classifier  # noqa: F401
from empdia_iceberg_spark.functions import udx  # noqa: F401
from empdia_iceberg_spark.functions import reward  # noqa: F401
from empdia_iceberg_spark.functions import termination  # noqa: F401
from empdia_iceberg_spark.functions import messages  # noqa: F401
from empdia_iceberg_spark.sources import sinks  # noqa: F401
from empdia_iceberg_spark.sources import pydatasource  # noqa: F401
from empdia_iceberg_spark.plans import prep  # noqa: F401
from empdia_iceberg_spark.plans import grpo  # noqa: F401
from empdia_iceberg_spark.plans import curation  # noqa: F401
from empdia_iceberg_spark.tables import manager  # noqa: F401
from empdia_iceberg_spark.tables import dml  # noqa: F401
from empdia_iceberg_spark.streaming import windows as stream_windows  # noqa: F401
from empdia_iceberg_spark.streaming import conversation  # noqa: F401
from empdia_iceberg_spark.streaming import ewma as stream_ewma  # noqa: F401
from empdia_iceberg_spark.operators import relational  # noqa: F401
from empdia_iceberg_spark.operators import windows  # noqa: F401
from empdia_iceberg_spark.operators import dedup  # noqa: F401
from empdia_iceberg_spark.operators import similarity  # noqa: F401
from empdia_iceberg_spark.operators import textstats  # noqa: F401
from empdia_iceberg_spark.operators import langmodel  # noqa: F401
from empdia_iceberg_spark.operators import mining  # noqa: F401
from empdia_iceberg_spark.operators import profiling  # noqa: F401
from empdia_iceberg_spark.operators import inference  # noqa: F401
from empdia_iceberg_spark.operators import dataprep  # noqa: F401
from empdia_iceberg_spark.operators import retrieval  # noqa: F401
from empdia_iceberg_spark.operators import timeseries  # noqa: F401

# ---------------------------------------------------------------- sweep order
# The driver's per-round CORRECTNESS sweep checks the FIRST 50 registered
# queries (exactly 50 since r2); the list rotates every round so no query
# goes too long without a driver row. Rotation policy (update each round):
#   1. queries whose implementation changed this round or last round's
#      overflow (every changed query must be swept the round it changes);
#   2. queries that have never had a driver row, kernels-first
#      (tools/next_sweep.py emits the order);
#   3. the stalest previously-green block as tail filler.
#
# ROUND 10 ARITHMETIC (VERDICT r9 asks #1 + #6): never-swept debt is
# ZERO (all 267 queries have driver rows through r9), so the window is
# (1) the answer paths this round's work touches — the r10 ADVICE fixes
# (fingerprint TTL cache on directory-index stat storms; env-tunable IVF
# reclamation grace -> knn_cosine_top5 / knn_cosine_ivf) and the queries
# whose plans/gates the r10 scaling studies may retune (near-dup verify
# gate -> doc_minhash_near_dup / doc_dedup_clusters; q1/q3 posture work;
# user_profile_similarity study; late-r10 review fixes changed
# delete_where's NULL-predicate semantics -> table_rollback_restore /
# table_incremental_diff / table_history_audit, and morton key_of ->
# table_zorder_layout) — then (2) the stalest green block, which is
# now the r2 cohort (last rows eight rounds ago). New surface
# registered this round (ask #6: table_update_dml / table_delete_dml /
# table_hilbert_layout) sits at the VERY FRONT of this list, per the
# same-round-driver-row rule. 3 new + 11 changed + 36 stalest = 50.
_SWEEP_PRIORITY = [
    "table_update_dml",  # NEW r10 (ask #6): SQL UPDATE via pruned COW
    "table_delete_dml",  # NEW r10 (ask #6): SQL DELETE via pruned COW
    "table_hilbert_layout",  # NEW r10 (ask #6): Hilbert twin of zorder
    "knn_cosine_top5",  # r10-planned-changed (last row r9)
    "knn_cosine_ivf",  # r10-planned-changed (last row r9)
    "doc_minhash_near_dup",  # r10-planned-changed (last row r9)
    "doc_dedup_clusters",  # r10-planned-changed (last row r9)
    "q1_pricing_agg",  # r10-planned-changed (last row r7)
    "q3_join3_topk",  # r10-planned-changed (last row r9)
    "user_profile_similarity",  # r10-planned-changed (last row r8)
    "table_zorder_layout",  # r10-changed: morton key_of now uses _curve_frame's columns
    "table_rollback_restore",  # r10-changed: delete_where NULL-predicate semantics
    "table_incremental_diff",  # r10-changed: delete_where NULL-predicate semantics
    "table_history_audit",  # r10-changed: delete_where NULL-predicate semantics
    "events_multi_grain_rollup",  # stalest green (r2)
    "salted_join_skewed",  # stalest green (r2)
    "unpivot_pricing_metrics",  # stalest green (r2)
    "doc_exact_dedup",  # stalest green (r2)
    "doc_dedup_survivors",  # stalest green (r2)
    "doc_text_stats",  # stalest green (r2)
    "doc_token_counts",  # stalest green (r2)
    "doc_lang_id_confusion",  # stalest green (r2)
    "doc_fingerprint",  # stalest green (r2)
    "doc_pii_scrub",  # stalest green (r2)
    "window_rank_topk_per_customer",  # stalest green (r2)
    "window_lag_lead_orders",  # stalest green (r2)
    "window_running_max_events",  # stalest green (r2)
    "window_trailing_frame_events",  # stalest green (r2)
    "window_ntile_quartiles",  # stalest green (r2)
    "window_first_last_order",  # stalest green (r2)
    "window_range_frame_value",  # stalest green (r2)
    "window_percent_rank_cume_dist",  # stalest green (r2)
    "embedding_avg_by_label",  # stalest green (r2)
    "range_join_events_1h",  # stalest green (r3)
    "bucketed_join_colocated",  # stalest green (r3)
    "skyline_orders_2d",  # stalest green (r3)
    "multimodal_metadata",  # stalest green (r3)
    "classifier_stub_layers",  # stalest green (r3)
    "classifier_label_canonicalization",  # stalest green (r3)
    "classifier_real_model",  # stalest green (r3)
    "generation_retry_stub",  # stalest green (r3)
    "collate_prompt_batches",  # stalest green (r3)
    "udtf_word_windows",  # stalest green (r3)
    "udaf_weighted_value",  # stalest green (r3)
    "reward_trajectory",  # stalest green (r3)
    "reward_per_turn_scores",  # stalest green (r3)
    "reward_fallback_mean",  # stalest green (r3)
    "reward_config_coalesce",  # stalest green (r3)
    "reward_trajectory_pandas",  # stalest green (r3)
    "termination_flags",  # stalest green (r3)
    "termination_first_stop",  # stalest green (r3)
    "trajectory_metrics",  # stalest green (r3)
    "messages_role_swap_pipeline",  # stalest green (r3)
    "sink_parquet_roundtrip",  # stalest green (r3)
    # -------- 50-slot window ends here (3 new + 7 changed + 40 stalest) ----
    "sink_json_roundtrip",  # r3
    "csv_roundtrip",  # r3
    "sink_partitioned_write",  # r3
    "dialogue_prep_verl_rows",  # r3
    "dialogue_prep_nested",  # r3
    "overlong_prompt_filter",  # r3
    "positional_split_70_30",  # r3
    "grpo_group_normalize",  # r3
    "grpo_pairwise_n2",  # r3
    "q5_region_revenue",  # r3
    "table_snapshot_lifecycle",  # r3
    "table_expire_compact",  # r3
    "stream_sliding_2h_1h",  # r3
    "stream_session_window",  # r3
    "stream_dedup_events",  # r3
    "stream_dedup_bounded_state",  # r3
    "multimodal_decode_features",  # r5
    "multimodal_feature_extract",  # r5
    "multimodal_frame_sample",  # r5
    "generation_retry_real",  # r5
    "doc_simhash_near_dup",  # r5
    "doc_span_dedup",  # r5
    "doc_fuzzy_pairs_blocked",  # r5
    "stats_exact_moments",  # r5
    "stratified_sample_counts",  # r5
    "events_anomaly_zscore",  # r5
    "events_twap_user",  # r5
    "parts_abc_pareto",  # r5
    "events_pit_dimension_join",  # r5
    "events_cohort_ltv",  # r5
    "events_time_to_convert",  # r5
    "stream_stream_left_join",  # r5
    "events_ewma16_user",  # r5
    "events_longest_streaks",  # r5
    "orders_open_peak_monthly",  # r5
    "knn_cosine_lsh",  # r5
    "semantic_prune_clusters",  # r5
    "part_pairs_cooccurrence",  # r5
    "events_type_transitions",  # r5
    "part_hierarchy_rollup",  # r5
    "part_association_rules",  # r5
    "benford_order_totals",  # r5
    "ols_quantity_price",  # r5
    "chi2_events_type_dow",  # r5
    "welch_t_acctbal_segments",  # r5
    "events_survival_km",  # r5
    "events_impute_value",  # r5
    "events_target_encode_loo",  # r5
    "spearman_qty_price",  # r6
    "table_mor_deletes",  # r6
    "table_changelog_emit",  # r6
    "cdc_log_compaction",  # r6
    "table_crypto_shred",  # r6
    "mv_incremental_refresh",  # r6
    "q2_min_cost_supplier",  # r6
    "q4_priority_exists",  # r6
    "q6_forecast_revenue",  # r6
    "q7_volume_shipping",  # r6
    "q8_market_share",  # r6
    "q9_profit_by_nation",  # r6
    "q10_returned_revenue",  # r6
    "q11_important_parts",  # r6
    "q12_late_priority_counts",  # r6
    "q13_custdist",  # r6
    "q14_promo_revenue",  # r6
    "q15_top_supplier",  # r6
    "q16_supplier_part_counts",  # r6
    "q17_small_qty_revenue",  # r6
    "q18_large_orders",  # r6
    "q19_disjunctive_revenue",  # r6
    "q20_dominant_suppliers",  # r6
    "q21_waiting_suppliers",  # r6
    "q22_idle_rich_customers",  # r6
    "lateral_top2_per_customer",  # r6
    "events_sessionize_8h",  # r6
    "daily_acf_value",  # r6
    "seasonal_strength_scan",  # r6
    "events_seasonal_residual_outliers",  # r6
    "events_linear_interpolate",  # r6
    "doc_bm25_search",  # r6
    "doc_phrase_search",  # r6
    "doc_rerank_crossencoder",  # r6
    "embedding_pq_codes",  # r6
    "embedding_pca_power",  # r6
    "user_reach_hll_rollup",  # r6
    "token_cms_estimates",  # r6
    "token_heavy_hitters",  # r6
    "table_merge_pruned",  # r7
    "table_merge_upsert",  # r7
    "mannwhitney_u_segments",  # r7
    "doc_lm_perplexity",  # r7
    "doc_decontaminate",  # r7
    "doc_ngram_jaccard_pairs",  # r7
    "doc_dup_ngram_fraction",  # r7
    "curation_pipeline",  # r7
    "curation_funnel_counts",  # r7
    "anova_acctbal_segments",  # r7
    "ks_acctbal_two_sample",  # r7
    "lineitem_corr_matrix",  # r7
    "events_mad_outliers",  # r7
    "stream_tumbling_hourly",  # r7
    "stream_watermark_late_drop",  # r7
    "table_concurrent_appends",  # r7
    "table_partition_evolution",  # r7
    "table_wap_publish",  # r7
    "table_branch_merge",  # r7
    "catalog_multi_table_txn",  # r7
    "table_schema_evolution",  # r7
    "stream_ewma16_state",  # r7
    "emb_cosine_near_dup",  # r7
    "supplier_part_matching",  # r7
    "graph_triangle_census",  # r7
    "events_markov_entropy_rate",  # r7
    "mi_events_type_hour",  # r7
    "doc_chunking",  # r7
    "doc_quality_filter",  # r7
    "doc_rrf_fusion",  # r7
    "events_funnel_conversion",  # r7
    "orders_shipping_busdays",  # r7
    "orders_diversified_topk",  # r7
    "weighted_quantiles_quantity",  # r7
    "orders_robust_means",  # r7
    "messages_last_by_role",  # r7
    "udtf_table_arg_digest",  # r7
    "kmv_distinct_orders",  # r7
    "kmv_set_overlap",  # r7
    "asof_join_last_error",  # r8
    "events_gap_fill_ffill",  # r8
    "events_cusum_drift",  # r8
    "events_max_drawdown_user",  # r8
    "forecast_backtest_snaive",  # r8
    "profile_orders_stats",  # r8
    "doc_weighted_sample",  # r8
    "doc_sample_per_lang",  # r8
    "stream_conversation_state",  # r8
    "table_bloom_point_lookup",  # r8
    "doc_tfidf_top_terms",  # r8
    "emb_decontaminate",  # r8
    "doc_repetition_stats",  # r8
    "doc_rake_keyphrases",  # r8
    "doc_oov_rate",  # r8
    "nb_lang_confusion",  # r8
    "classifier_agreement_kappa",  # r8
    "multimodal_audio_zcr",  # r8
    "binaryfile_ingest",  # r8
    "udtf_split_fixed_cols",  # r8
    "pyds_synthetic_rollup",  # r8
    "stream_topk_trending",  # r8
    "stream_stream_join_1h",  # r8
    "stream_static_enrich",  # r8
    "events_session_window_batch",  # r8
    "events_rolling_median_7d",  # r8
    "events_rolling_wau",  # r8
    "events_linear_attribution",  # r8
    "events_ohlc_hourly",  # r8
    "events_scd2_history",  # r8
    "events_weekly_retention",  # r8
    "mc_pi_estimate",  # r8
    "orders_var_cvar",  # r8
    "ab_sprt_trace",  # r8
    "ab_test_conversion",  # r8
    "ols_by_returnflag",  # r8
    "quantile_transform_acctbal",  # r8
    "revenue_concentration_hhi",  # r8
    "revenue_gini_customers",  # r8
    "corpus_zipf_slope",  # r8
    "revenue_price_volume_bridge",  # r8
    "revenue_recognition_schedule",  # r8
    "revenue_yoy_growth",  # r8
    "customer_segment_migration",  # r8
    "customer_rfm_segments",  # r8
    "orders_interpurchase_intervals",  # r9
    "orders_status_summary",  # r9
    "lineitem_fifo_allocation",  # r9
    "join_key_skew_stats",  # r9
    "duplicate_baskets",  # r9
    "graph_bfs_hops",  # r9
    "graph_kcore_sizes",  # r9
    "graph_degree_assortativity",  # r9
    "item_item_similar_parts",  # r9
    "seq2_event_patterns",  # r9
    "doc_fuzzy_clusters",  # r9
    "doc_greedy_coverage_select",  # r9
    "doc_pack_windows",  # r9
    "hash_split_assignments",  # r9
    "domain_mixture_weights",  # r9
    "embedding_quantize_int8",  # r9
    "variant_props_typed",  # r9
    "secure_masked_view",  # r9
    "observed_metrics_shipments",  # r9
    "dq_checks_orders",  # r9
    "json_ingest_corrupt_records",  # r9
    "xml_roundtrip",  # r9
    "orc_roundtrip",  # r9
    "stream_restart_recovery",  # r9
    "stream_continuous_aggregate",  # r9
    "pagerank_trading_graph",  # r9
    "semi_join_active_customers",  # r9
    "anti_join_inactive_customers",  # r9
    "set_ops_segments",  # r9
    "rollup_pricing",  # r9
    "cube_order_priority",  # r9
    "distinct_counts",  # r9
    "approx_distinct_counts",  # r9
    "topk_orders_global",  # r9
    "scalar_string_fns",  # r9
    "date_fns_orders",  # r9
    "json_extract_events",  # r9
    "orders_above_customer_avg",  # r9
    "events_hourly_rollup",  # r9
    "pivot_status_by_priority",  # r9
    "null_safe_join_acctbal",  # r9
    "map_functions_props",  # r9
    "grouping_sets_pricing",  # r9
    "percentile_order_values",  # r9
    "approx_percentile_sketch",  # r9
]

registry.promote(_SWEEP_PRIORITY)

__all__ = ["registry", "get_spark"]
__version__ = "0.1.0"
