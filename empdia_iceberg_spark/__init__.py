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
from empdia_iceberg_spark.sources import table_stream  # noqa: F401
from empdia_iceberg_spark.plans import prep  # noqa: F401
from empdia_iceberg_spark.plans import grpo  # noqa: F401
from empdia_iceberg_spark.plans import curation  # noqa: F401
from empdia_iceberg_spark.tables import manager  # noqa: F401
from empdia_iceberg_spark.tables import dml  # noqa: F401
from empdia_iceberg_spark.tables import ddl  # noqa: F401
from empdia_iceberg_spark.streaming import windows as stream_windows  # noqa: F401
from empdia_iceberg_spark.streaming import conversation  # noqa: F401
from empdia_iceberg_spark.streaming import ewma as stream_ewma  # noqa: F401
from empdia_iceberg_spark.streaming import cdc as stream_cdc  # noqa: F401
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
# ROUND 11 ARITHMETIC (VERDICT r10 asks #1): never-swept debt stays
# ZERO (all 270 queries have driver rows through r10), so the window is
# (1) the answer paths this round's work plans to touch — the SQL DML
# story gains MERGE INTO (manager._merge_impl generalizes to clause
# semantics -> table_merge_pruned / table_merge_upsert re-swept, and the
# COW DML queries ride the _dirs_matching micro-fix), the knn stack's
# fingerprint-TTL parse moves to import time (r10 ADVICE #4) and the
# recall-audit work touches the IVF/LSH paths, the layout queries route
# through the shared curve_envelopes report, doc_exact_dedup gets the
# cheap-key pre-group cut (ask #4), lsh_candidates gets the heavy-hitter
# bucket cap (r10 ADVICE #2) -> doc_minhash_near_dup/doc_dedup_clusters,
# and table_hilbert_layout's oracle mirror gains NULL propagation (r10
# ADVICE #3) — then (2) the stalest green block: the four r3-cohort
# names the r10 window annotation mis-included (r10 ADVICE #1), the
# rest of the r3 cohort, and the r5 cohort head. NEW queries registered
# this round (table_merge_dml, table_delete_mor_dml, table_insert_dml,
# knn recall audits, table_ddl_lifecycle, table_time_travel_sql,
# table_maintenance_sql, stream_cdc_apply, table_rename_column_sql,
# table_refs_sql, table_merge_sync_dml, table_statement_corners,
# table_metadata_tables_sql, stream_table_tail, pipeline_medallion,
# table_describe_sql)
# are inserted at the VERY FRONT as they land, displacing the bottom of
# the stalest block below the marker (same-round-driver-row rule).
# LATE-r11 widening: the DDL work made every snapshot-table read resolve
# against the COMMITTED schema instead of footer inference
# (manager._read_dirs explicit-schema reads — the Iceberg read model,
# required for metadata-only ADD COLUMN), which changes the read path of
# EVERY table_* / cdc_* / mv_* / catalog_* query — all 15 not already in
# the window move above the marker (changed-code-first rule), displacing
# stalest-green r3/r5 names below it; the second r11 session extended
# the same rule to the two STREAMING snapshot-table users
# (stream_continuous_aggregate, stream_restart_recovery), whose sink
# read path also resolves through _read_dirs.
_SWEEP_PRIORITY = [
    "table_describe_sql",  # NEW r11 late: DESCRIBE TABLE / SHOW TABLES
    "pipeline_medallion",  # NEW r11 late: bronze->silver tail+transform+MERGE
    "stream_table_tail",  # NEW r11 late: streaming SOURCE over snapshot tables
    "table_metadata_tables_sql",  # NEW r11 late: t.snapshots/t.refs/t.files reads
    "table_statement_corners",  # NEW r11 late: REPLACE/TRUNCATE/INSERT OVERWRITE
    "table_merge_sync_dml",  # NEW r11 late: WHEN NOT MATCHED BY SOURCE full-sync
    "table_refs_sql",  # NEW r11 late: branch/tag DDL + ref reads via VERSION AS OF
    "table_rename_column_sql",  # NEW r11 late: metadata-only RENAME via physical names
    "stream_cdc_apply",  # NEW r11 late: streaming CDC apply via MERGE foreachBatch
    "table_maintenance_sql",  # NEW r11 late: OPTIMIZE [ZORDER BY] / VACUUM statements
    "table_time_travel_sql",  # NEW r11 late: VERSION/TIMESTAMP AS OF read syntax
    "table_ddl_lifecycle",  # NEW r11 late: SQL DDL (CTAS + metadata-only ADD COLUMN)
    "table_merge_dml",  # NEW r11 (ask #2): SQL MERGE INTO via clause merge
    "table_delete_mor_dml",  # NEW r11 (ask #7): DML mor_key branch driver row
    "knn_ivf_recall_audit",  # NEW r11 (ask #6): IVF recall as hash-checked value
    "knn_lsh_recall_audit",  # NEW r11 (ask #6): LSH recall histogram (rows-only)
    "table_insert_dml",  # NEW r11: INSERT INTO completes the DML surface
    "table_update_dml",  # r11-planned-changed
    "table_delete_dml",  # r11-planned-changed
    "table_hilbert_layout",  # r11-planned-changed
    "table_zorder_layout",  # r11-changed: routed through curve_envelopes
    "table_merge_pruned",  # r11-planned-changed
    "table_merge_upsert",  # r11-planned-changed
    "knn_cosine_top5",  # r11-planned-changed
    "knn_cosine_ivf",  # r11-planned-changed
    "knn_cosine_lsh",  # r11-planned-changed
    "doc_exact_dedup",  # r11-planned-changed
    "doc_minhash_near_dup",  # r11-planned-changed
    "doc_dedup_clusters",  # r11-planned-changed
    "table_snapshot_lifecycle",  # r11-late-changed: explicit-schema reads
    "table_expire_compact",  # r11-late-changed: explicit-schema reads
    "table_schema_evolution",  # r11-late-changed: explicit-schema reads
    "table_rollback_restore",  # r11-late-changed: explicit-schema reads
    "table_incremental_diff",  # r11-late-changed: explicit-schema reads
    "table_partition_evolution",  # r11-late-changed: explicit-schema reads
    "table_wap_publish",  # r11-late-changed: explicit-schema reads
    "cdc_log_compaction",  # r11-late-changed: explicit-schema reads
    "table_crypto_shred",  # r11-late-changed: explicit-schema reads
    "mv_incremental_refresh",  # r11-late-changed: explicit-schema reads
    "table_branch_merge",  # r11-late-changed: explicit-schema reads
    "table_history_audit",  # r11-late-changed: explicit-schema reads
    "table_concurrent_appends",  # r11-late-changed: explicit-schema reads
    "table_mor_deletes",  # r11-late-changed: explicit-schema reads
    "table_bloom_point_lookup",  # r11-late-changed: explicit-schema reads
    "table_changelog_emit",  # r11-late-changed: explicit-schema reads
    "catalog_multi_table_txn",  # r11-late-changed: explicit-schema reads
    "stream_continuous_aggregate",  # r11-late-changed: snapshot-table sink read path
    "stream_restart_recovery",  # r11-late-changed: snapshot-table sink read path
    "termination_first_stop",  # stalest green (r3; outside the r10 window, r10 ADVICE #1)
    "trajectory_metrics",  # stalest green (r3; outside the r10 window, r10 ADVICE #1)
    # -------- 50-slot window ends here (17 new + 31 changed + 2 stalest) ----------
    "messages_role_swap_pipeline",  # stalest green (r3), displaced by r11 new
    "sink_parquet_roundtrip",  # stalest green (r3), displaced by r11 new
    "sink_json_roundtrip",  # stalest green (r3), displaced by r11 new
    "csv_roundtrip",  # stalest green (r3), displaced by r11 changed-code rule
    "sink_partitioned_write",  # stalest green (r3), displaced by r11 changed-code rule
    "dialogue_prep_verl_rows",  # stalest green (r3), displaced by r11 new
    "dialogue_prep_nested",  # stalest green (r3), displaced by r11 new
    "overlong_prompt_filter",  # stalest green (r3), displaced by r11 new
    "positional_split_70_30",  # stalest green (r3), displaced by r11 new
    "grpo_group_normalize",  # stalest green (r3), displaced by r11 new
    "grpo_pairwise_n2",  # stalest green (r3), displaced by r11 new
    "q5_region_revenue",  # stalest green (r3), displaced by r11 new
    "stream_sliding_2h_1h",  # stalest green (r3), displaced by r11 new
    "stream_session_window",  # stalest green (r3), displaced by r11-late changes
    "stream_dedup_events",  # stalest green (r3)
    "stream_dedup_bounded_state",  # stalest green (r3)
    "multimodal_decode_features",  # stalest green (r5)
    "multimodal_feature_extract",  # stalest green (r5)
    "multimodal_frame_sample",  # stalest green (r5)
    "generation_retry_real",  # stalest green (r5)
    "doc_simhash_near_dup",  # stalest green (r5)
    "doc_span_dedup",  # stalest green (r5)
    "doc_fuzzy_pairs_blocked",  # stalest green (r5)
    "stats_exact_moments",  # stalest green (r5)
    "stratified_sample_counts",  # stalest green (r5)
    "events_anomaly_zscore",  # stalest green (r5)
    "events_twap_user",  # stalest green (r5)
    "parts_abc_pareto",  # stalest green (r5)
    "events_pit_dimension_join",  # stalest green (r5)
    "events_cohort_ltv",  # stalest green (r5), displaced by r11 new
    "events_time_to_convert",  # stalest green (r5), displaced by r11 new
    "stream_stream_left_join",  # stalest green (r5), displaced by r11 new
    "events_ewma16_user",  # stalest green (r5), displaced by r11 new
    "orders_open_peak_monthly",  # stalest green (r5), displaced by r11 new
    "events_longest_streaks",  # stalest green (r5), displaced by r11 new
    "q1_pricing_agg",
    "q3_join3_topk",
    "user_profile_similarity",
    "events_multi_grain_rollup",
    "salted_join_skewed",
    "unpivot_pricing_metrics",
    "doc_dedup_survivors",
    "doc_text_stats",
    "doc_token_counts",
    "doc_lang_id_confusion",
    "doc_fingerprint",
    "doc_pii_scrub",
    "window_rank_topk_per_customer",
    "window_lag_lead_orders",
    "window_running_max_events",
    "window_trailing_frame_events",
    "window_ntile_quartiles",
    "window_first_last_order",
    "window_range_frame_value",
    "window_percent_rank_cume_dist",
    "embedding_avg_by_label",
    "range_join_events_1h",
    "bucketed_join_colocated",
    "skyline_orders_2d",
    "multimodal_metadata",
    "classifier_stub_layers",
    "classifier_label_canonicalization",
    "classifier_real_model",
    "generation_retry_stub",
    "collate_prompt_batches",
    "udtf_word_windows",
    "udaf_weighted_value",
    "reward_trajectory",
    "reward_per_turn_scores",
    "reward_fallback_mean",
    "reward_config_coalesce",
    "reward_trajectory_pandas",
    "termination_flags",
    "semantic_prune_clusters",
    "part_pairs_cooccurrence",
    "events_type_transitions",
    "part_hierarchy_rollup",
    "part_association_rules",
    "benford_order_totals",
    "ols_quantity_price",
    "chi2_events_type_dow",
    "welch_t_acctbal_segments",
    "events_survival_km",
    "events_impute_value",
    "events_target_encode_loo",
    "spearman_qty_price",
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation",
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_late_priority_counts",
    "q13_custdist",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "lateral_top2_per_customer",
    "events_sessionize_8h",
    "daily_acf_value",
    "seasonal_strength_scan",
    "events_seasonal_residual_outliers",
    "events_linear_interpolate",
    "doc_bm25_search",
    "doc_phrase_search",
    "doc_rerank_crossencoder",
    "embedding_pq_codes",
    "embedding_pca_power",
    "user_reach_hll_rollup",
    "token_cms_estimates",
    "token_heavy_hitters",
    "mannwhitney_u_segments",
    "doc_lm_perplexity",
    "doc_decontaminate",
    "doc_ngram_jaccard_pairs",
    "doc_dup_ngram_fraction",
    "curation_pipeline",
    "curation_funnel_counts",
    "anova_acctbal_segments",
    "ks_acctbal_two_sample",
    "lineitem_corr_matrix",
    "events_mad_outliers",
    "stream_tumbling_hourly",
    "stream_watermark_late_drop",
    "stream_ewma16_state",
    "emb_cosine_near_dup",
    "supplier_part_matching",
    "graph_triangle_census",
    "events_markov_entropy_rate",
    "mi_events_type_hour",
    "doc_chunking",
    "doc_quality_filter",
    "doc_rrf_fusion",
    "events_funnel_conversion",
    "orders_shipping_busdays",
    "orders_diversified_topk",
    "weighted_quantiles_quantity",
    "orders_robust_means",
    "messages_last_by_role",
    "udtf_table_arg_digest",
    "kmv_distinct_orders",
    "kmv_set_overlap",
    "asof_join_last_error",
    "events_gap_fill_ffill",
    "events_cusum_drift",
    "events_max_drawdown_user",
    "forecast_backtest_snaive",
    "profile_orders_stats",
    "doc_weighted_sample",
    "doc_sample_per_lang",
    "stream_conversation_state",
    "doc_tfidf_top_terms",
    "emb_decontaminate",
    "doc_repetition_stats",
    "doc_rake_keyphrases",
    "doc_oov_rate",
    "nb_lang_confusion",
    "classifier_agreement_kappa",
    "multimodal_audio_zcr",
    "binaryfile_ingest",
    "udtf_split_fixed_cols",
    "pyds_synthetic_rollup",
    "stream_topk_trending",
    "stream_stream_join_1h",
    "stream_static_enrich",
    "events_session_window_batch",
    "events_rolling_median_7d",
    "events_rolling_wau",
    "events_linear_attribution",
    "events_ohlc_hourly",
    "events_scd2_history",
    "events_weekly_retention",
    "mc_pi_estimate",
    "orders_var_cvar",
    "ab_sprt_trace",
    "ab_test_conversion",
    "ols_by_returnflag",
    "quantile_transform_acctbal",
    "revenue_concentration_hhi",
    "revenue_gini_customers",
    "corpus_zipf_slope",
    "revenue_price_volume_bridge",
    "revenue_recognition_schedule",
    "revenue_yoy_growth",
    "customer_segment_migration",
    "customer_rfm_segments",
    "orders_interpurchase_intervals",
    "orders_status_summary",
    "lineitem_fifo_allocation",
    "join_key_skew_stats",
    "duplicate_baskets",
    "graph_bfs_hops",
    "graph_kcore_sizes",
    "graph_degree_assortativity",
    "item_item_similar_parts",
    "seq2_event_patterns",
    "doc_fuzzy_clusters",
    "doc_greedy_coverage_select",
    "doc_pack_windows",
    "hash_split_assignments",
    "domain_mixture_weights",
    "embedding_quantize_int8",
    "variant_props_typed",
    "secure_masked_view",
    "observed_metrics_shipments",
    "dq_checks_orders",
    "json_ingest_corrupt_records",
    "xml_roundtrip",
    "orc_roundtrip",
    "pagerank_trading_graph",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "set_ops_segments",
    "rollup_pricing",
    "cube_order_priority",
    "distinct_counts",
    "approx_distinct_counts",
    "topk_orders_global",
    "scalar_string_fns",
    "date_fns_orders",
    "json_extract_events",
    "orders_above_customer_avg",
    "events_hourly_rollup",
    "pivot_status_by_priority",
    "null_safe_join_acctbal",
    "map_functions_props",
    "grouping_sets_pricing",
    "percentile_order_values",
    "approx_percentile_sketch",
]

registry.promote(_SWEEP_PRIORITY)

__all__ = ["registry", "get_spark"]
__version__ = "0.1.0"
