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
# The driver's per-round CORRECTNESS sweep checks the first ~50 registered
# queries; the list must rotate every round so no query goes too long
# without a driver row. Rotation policy (update the list each round):
#   1. queries whose implementation changed this round (every changed
#      query must be swept the round it changed);
#   2. queries that have never had a driver row, ordered by
#      divergence risk (pandas kernels > µs/decimal arithmetic >
#      plain exact-SQL shapes);
#   3. the stalest previously-green block.
# Round 6 list (VERDICT r5 ask #1 — front-load the never-swept debt):
# FIRST the queries whose code changed in r5/r6 (the pruned-MERGE +
# atomic-commit + bloom + expire table stack, the new
# table_merge_pruned proof query, and the bucketed Spearman rewrite);
# THEN the four all-zero driver modules — all 12 never-swept table ops,
# all 17 subquery/TPC-H shapes, all 5 timeseries, all 4 retrieval;
# THEN the remaining never-swept names ordered kernels-before-plain-SQL
# so a deeper sweep keeps retiring debt. Everything below position ~124
# already has a green driver row in r01–r05.
_SWEEP_PRIORITY = [
    # --- changed in r5/r6: MUST be swept this round (changed-code-first)
    "table_merge_pruned",  # new in r6 — proves the pruned-MERGE reuse path
    "table_merge_upsert",  # r5 rewrite: file-pruned MERGE w/ cached envelopes
    "spearman_qty_price",  # r6 rewrite: bucketed mid-ranks (no global window)
    "table_bloom_point_lookup",  # r5 staleness gate + r6 executor-side build
    "table_mor_deletes",  # r5: MOR-aware read_point + GC interplay
    "table_history_audit",  # r5: atomic hardlink commit lifecycle
    "table_concurrent_appends",  # r5: O_EXCL commit race semantics
    "table_branch_merge",  # r5: ref-aware expire_snapshots
    "table_changelog_emit",
    "catalog_multi_table_txn",
    "cdc_log_compaction",
    "table_crypto_shred",
    "mv_incremental_refresh",
    "table_incremental_diff",
    "table_rollback_restore",
    # --- never swept: all 17 subquery/TPC-H shapes (the most user-visible
    # query family; zero driver evidence through r5)
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
    # --- never swept: all 5 timeseries
    "daily_acf_value",
    "seasonal_strength_scan",
    "forecast_backtest_snaive",
    "events_seasonal_residual_outliers",  # r6: doc/code MAD-constant fix
    "events_linear_interpolate",
    # --- never swept: all 4 retrieval
    "doc_bm25_search",
    "doc_rrf_fusion",
    "doc_phrase_search",
    "doc_rerank_crossencoder",
    # --- never swept: highest-divergence-risk kernels next (pandas /
    # decimal / sketch arithmetic before plain SQL)
    "embedding_pq_codes",  # rows-only by design
    "embedding_pca_power",  # rows-only by design
    "user_reach_hll_rollup",  # rows-only by design
    "token_cms_estimates",
    "token_heavy_hitters",
    "kmv_distinct_orders",
    "kmv_set_overlap",
    "doc_tfidf_top_terms",
    "doc_decontaminate",
    "emb_decontaminate",
    "doc_repetition_stats",
    "doc_rake_keyphrases",
    "doc_oov_rate",
    "nb_lang_confusion",
    "classifier_agreement_kappa",
    "multimodal_audio_zcr",
    "binaryfile_ingest",
    "udtf_split_fixed_cols",
    "udtf_table_arg_digest",
    "pyds_synthetic_rollup",
    # ~50-query cap lands in this block; everything below keeps retiring
    # never-swept debt if the driver sweeps deeper, ordered
    # kernels-before-plain-SQL.
    "stream_topk_trending",
    "stream_stream_join_1h",
    "stream_static_enrich",
    "events_session_window_batch",
    "events_markov_entropy_rate",
    "events_max_drawdown_user",
    "events_rolling_median_7d",
    "events_rolling_wau",
    "events_linear_attribution",
    "events_ohlc_hourly",
    "events_scd2_history",
    "events_weekly_retention",
    "events_funnel_conversion",
    "mc_pi_estimate",
    "orders_var_cvar",
    "ab_sprt_trace",
    "ab_test_conversion",
    "anova_acctbal_segments",
    "ks_acctbal_two_sample",
    "ols_by_returnflag",
    "lineitem_corr_matrix",
    "mi_events_type_hour",
    "weighted_quantiles_quantity",
    "quantile_transform_acctbal",
    "orders_robust_means",
    "revenue_concentration_hhi",
    "revenue_gini_customers",
    "corpus_zipf_slope",
    "revenue_price_volume_bridge",
    "revenue_recognition_schedule",
    "revenue_yoy_growth",
    "customer_segment_migration",
    "customer_rfm_segments",
    "orders_interpurchase_intervals",
    "orders_shipping_busdays",
    "orders_diversified_topk",
    "orders_status_summary",
    "lineitem_fifo_allocation",
    "join_key_skew_stats",
    "duplicate_baskets",
    "graph_bfs_hops",
    "graph_kcore_sizes",
    "graph_degree_assortativity",
    "item_item_similar_parts",
    "seq2_event_patterns",
    "supplier_part_matching",
    "doc_fuzzy_clusters",
    "doc_weighted_sample",
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
    "curation_funnel_counts",
    # --- previously-green blocks, stalest first (r2 era), as tail filler
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
    "events_multi_grain_rollup",
    "salted_join_skewed",
    "unpivot_pricing_metrics",
]
registry.promote(_SWEEP_PRIORITY)

__all__ = ["registry", "get_spark"]
__version__ = "0.1.0"
