"""Physical-plan assertions: the queries must not merely return correct
rows — their executed plans must be the ones that survive a 100×
scale-up (pushed filters, broadcast dims, no global single-partition
windows, whole-stage codegen on the hot paths)."""

from __future__ import annotations

from empdia_iceberg_spark import registry
import empdia_iceberg_spark  # noqa: F401
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = registry.queries()[name](spark, SF_DIR)
    df.collect()  # AQE: the final plan (with codegen spans) exists post-run
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan";
    # assert against the final plan only
    return plan.split("== Initial Plan ==")[0]


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_agg")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    assert "*(" in plan  # whole-stage codegen spans (shown as *(n) prefixes)


def test_q1_reads_only_needed_columns(spark):
    plan = _plan(spark, "q1_pricing_agg")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema  # column pruning reached the scan
    assert "l_quantity" in read_schema


def test_q5_broadcasts_small_dims(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan  # region/nation never shuffle the fact side


def test_q10_broadcasts_nation(spark):
    plan = _plan(spark, "q10_returned_revenue")
    assert "BroadcastHashJoin" in plan
    # the returnflag predicate must reach SOME scan's pushed filters
    pushed_sections = plan.split("PushedFilters")[1:]
    assert any("l_returnflag" in s[:300] for s in pushed_sections), plan


def test_no_single_partition_global_window(spark):
    """The scale-killer plans of round 1 must stay gone: neither the
    ntile query, the positional split, nor the Spearman mid-ranks
    (bucketed prefix-sum since r6), nor the Mann-Whitney mid-ranks
    (bucketed since r7) may contain an empty-key global window."""
    for name in (
        "window_ntile_quartiles",
        "positional_split_70_30",
        "spearman_qty_price",
        "mannwhitney_u_segments",
    ):
        plan = _plan(spark, name)
        assert "Window [" not in plan or "windowspecdefinition()" not in plan, name
        # a global window shows as 'Window [...], [], [...]' (no partition keys)
        for line in plan.splitlines():
            if line.strip().startswith("+- Window") or line.strip().startswith("Window"):
                assert "], [], [" not in line, (name, line)


def test_dedup_partial_aggregation(spark):
    """Exact dedup must partial-aggregate map-side before the exchange
    (collapses duplicate groups before shuffling at 100 TB). Asserted on
    the survivors variant — the dup-groups query is empty at test SF and
    AQE short-circuits it to EmptyRelation."""
    plan = _plan(spark, "doc_dedup_survivors")
    assert "partial_count" in plan  # map-side partial aggregate
    assert "Exchange hashpartitioning(" in plan  # one hash shuffle on the key


def test_reward_single_shuffle_for_window_and_agg(spark):
    """The lag window and the trajectory aggregate share one dia_id
    exchange — Catalyst must not re-shuffle between them."""
    plan = _plan(spark, "reward_trajectory")
    n_hash_exchanges = plan.count("Exchange hashpartitioning(dia_id")
    assert n_hash_exchanges == 1, plan


def test_q3_agg_below_join_single_exchange(spark):
    """r9 rewrite: the revenue aggregate is pushed BELOW the join (the
    per-orderkey groups equal the query's groups because orderkey is
    unique in orders), so the plan's only hash exchange is the
    map-side-combined lineitem pre-agg — orders joins off a broadcast
    (or, above the threshold, its own single exchange), and NO
    re-aggregation runs after the join."""
    plan = _plan(spark, "q3_join3_topk")
    # long-speed partial sum of scaled revenue, combined before the exchange
    assert "partial_sum(FLOOR" in plan, plan
    # no aggregate may consume join output: every HashAggregate block
    # sits below the joins (string order mirrors tree order: joins at
    # top of the final plan tree print BEFORE their aggregate children)
    join_positions = [
        i for i in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
        if i >= 0
    ]
    assert join_positions, plan  # the plan must still contain a join
    first_join = min(join_positions)
    agg_keys = [s[:80] for s in plan.split("HashAggregate(keys=")[1:]]
    assert agg_keys and all("l_orderkey" in k for k in agg_keys), agg_keys
    # top-k must be TakeOrderedAndProject (not a global Sort+Limit),
    # above the join: find() = -1 would pass the < vacuously
    topk = plan.find("TakeOrderedAndProject")
    assert 0 <= topk < first_join, plan
    # exactly one hash-partitioned exchange (the pre-agg); customer and
    # the agg output move by broadcast at test scale
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_q6_all_filters_pushed(spark):
    """Q6 is nothing BUT filters + one aggregate: every predicate must
    reach the scan, and the plan stays fully whole-stage-codegen'd."""
    plan = _plan(spark, "q6_forecast_revenue")
    pushed = plan.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    assert "partial" in plan  # map-side combine before one result merge


def test_q14_q19_broadcast_part_dim(spark):
    """The part dim must broadcast — shuffling the lineitem fact side on
    partkey is the plan that dies at 100x."""
    for name in ("q14_promo_revenue", "q19_disjunctive_revenue"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_q19_pushes_per_side_conjuncts(spark):
    """Catalyst must extract the disjunction's common per-side conjuncts
    below the join: l_quantity bounds to lineitem's scan, brand/size to
    part's."""
    plan = _plan(spark, "q19_disjunctive_revenue")
    pushed = plan.split("PushedFilters")[1][:600]
    assert "l_quantity" in pushed or "quantity" in pushed


def test_tfidf_reuses_tf_exchange(spark):
    """doc lengths and document frequencies both derive from the one
    (doc_id, term) aggregate; the plan must reuse that exchange (or its
    shuffle output), not recompute the token explode three times."""
    plan = _plan(spark, "doc_tfidf_top_terms")
    assert "ReusedExchange" in plan or plan.count("Generate explode") <= 2, plan


def test_heavy_hitters_partial_agg_before_shuffle(spark):
    plan = _plan(spark, "token_heavy_hitters")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_q4_semi_join_and_pushed_dates(spark):
    """The EXISTS decorrelates to a left-semi join and the order-date
    range reaches the orders scan."""
    plan = _plan(spark, "q4_priority_exists")
    assert "LeftSemi" in plan
    pushed_sections = plan.split("PushedFilters")[1:]
    assert any("o_orderdate" in s[:300] for s in pushed_sections), plan


def test_q16_anti_join_broadcasts_exclusion_list(spark):
    """NOT IN runs as a broadcast left-anti join — the fact side never
    shuffles for the exclusion check. Asserted on the pre-AQE plan: at
    tiny SF the exclusion list is empty and AQE (correctly) erases the
    anti join from the final plan."""
    df = registry.queries()["q16_supplier_part_counts"](spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_q22_scalar_subquery_broadcasts(spark):
    """The 1-row balance aggregate cross-joins broadcast (nested-loop,
    not a shuffled join) and NOT EXISTS is a left-anti join."""
    plan = _plan(spark, "q22_idle_rich_customers")
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan


def test_sessionize_no_global_window(spark):
    """Both session windows partition by user_id; the rollup reuses the
    window's partitioning (no extra hash exchange)."""
    plan = _plan(spark, "events_sessionize_8h")
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith("+- Window") or stripped.startswith("Window"):
            assert "], [], [" not in line, line
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    """The benchmark shingle set broadcasts — the corpus-side explode
    must not shuffle document shingles for the join."""
    plan = _plan(spark, "doc_decontaminate")
    assert "BroadcastHashJoin" in plan, plan


def test_q20_single_lineitem_scan(spark):
    """The window-over-partial-sums formulation must not recompute the
    lineitem subtree: exactly one lineitem scan, part dim broadcast,
    dominant keys broadcast into the LeftSemi."""
    plan = _plan(spark, "q20_dominant_suppliers")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_q12_pushes_year_filter(spark):
    plan = _plan(spark, "q12_late_priority_counts")
    pushed_sections = plan.split("PushedFilters")[1:]
    assert any("l_shipdate" in s[:300] for s in pushed_sections), plan


def test_curation_broadcasts_benchmark_shingles(spark):
    """The curation funnel's decontamination stage must broadcast the
    benchmark shingle set (the corpus side never shuffles text) and
    keep the dedup exchange on the content hash."""
    plan = _plan(spark, "curation_pipeline")
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning(sha2" in plan.replace("Exchange hashpartitioning(_h", "Exchange hashpartitioning(sha2") or "partial_min" in plan


def test_semantic_prune_partial_argmax(spark):
    """Anchor assignment must collapse the K candidate rows per vector
    map-side (partial max of the (cos, -anchor) struct) before the
    vec_id exchange, and the anchors must broadcast."""
    plan = _plan(spark, "semantic_prune_clusters")
    assert "partial_max" in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_ohlc_partial_minby_no_window(spark):
    """OHLC must be a pure hash aggregate with map-side partial
    min_by/max_by — no sort, no window operator."""
    plan = _plan(spark, "events_ohlc_hourly")
    assert "partial_min_by" in plan or "partial_min" in plan
    assert "Window" not in plan


def test_dup_ngram_shuffles_on_shingle_not_pairs(spark):
    """The dup-fraction diagnostic must shuffle on the shingle key
    (inverted index) and roll up per doc — never materialize doc
    pairs (no cartesian/nested-loop join)."""
    plan = _plan(spark, "doc_dup_ngram_fraction")
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning(shingle" in plan


def test_span_dedup_shuffles_on_span_then_doc(spark):
    """doc_span_dedup must shuffle on the span content key for the
    keep-first window and on doc_id for reassembly — never on doc
    pairs, and never through a global window."""
    plan = _plan(spark, "doc_span_dedup")
    assert "Exchange hashpartitioning(span" in plan, plan
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("+- Window") or s.startswith("Window"):
            assert "], [], [" not in line, line  # no empty partition spec


def test_zorder_no_global_window_and_broadcast_mins(spark):
    """table_zorder_layout must order via the bucketed row-number path
    (no single-partition window) and attach the 1-row mins aggregate
    with a broadcast join, not a shuffle. The registered query eagerly
    checkpoints (to release its cache entry), which truncates the
    visible plan — assert on the lazy _zorder_frame instead."""
    from empdia_iceberg_spark.operators.layout import _zorder_frame

    keyed, out = _zorder_frame(spark, SF_DIR)
    out.collect()  # AQE: the final plan exists post-run
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    keyed.unpersist()
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("+- Window") or s.startswith("Window"):
            assert "], [], [" not in line, line
    assert "Broadcast" in plan, plan


def test_anomaly_zscore_single_user_shuffle(spark):
    """events_anomaly_zscore computes all moments in ONE window over
    user_id — exactly one hash exchange on user_id, no join-back."""
    plan = _plan(spark, "events_anomaly_zscore")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "Join" not in plan, plan


def test_sample_per_lang_prefilter_no_full_sort(spark):
    """doc_sample_per_lang's window must run after the hash-prefix
    prefilter; the plan partitions by lang (per-stratum window), never
    an empty global window."""
    plan = _plan(spark, "doc_sample_per_lang")
    assert "Exchange hashpartitioning(lang" in plan, plan
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("+- Window") or s.startswith("Window"):
            assert "], [], [" not in line, line


def test_scd2_single_user_exchange(spark):
    """events_scd2_history's two windows both partition by user_id —
    the plan must contain exactly one user_id hash exchange (the
    second window reuses the first's partitioning)."""
    plan = _plan(spark, "events_scd2_history")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_twap_single_user_exchange(spark):
    """events_twap_user's window and rollup both key on user_id — the
    plan must carry exactly one user_id hash exchange."""
    plan = _plan(spark, "events_twap_user")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_rfm_no_global_window(spark):
    """customer_rfm_segments must derive quartile thresholds from a
    broadcast 1-row aggregate — no window operator at all in the plan,
    and a broadcast join attaching the thresholds."""
    plan = _plan(spark, "customer_rfm_segments")
    assert "Window" not in plan, plan
    assert "Broadcast" in plan, plan


def test_frame_sample_map_only(spark):
    """multimodal_frame_sample is map-only up to the final ordered
    limit: no hash-partitioned exchange anywhere in the plan."""
    plan = _plan(spark, "multimodal_frame_sample")
    assert "Exchange hashpartitioning" not in plan, plan


def test_lm_perplexity_broadcast_vocab_no_cartesian(spark):
    """doc_lm_perplexity's only broadcast is the 1-row vocabulary
    aggregate (BroadcastNestedLoopJoin, never a CartesianProduct);
    model counts join on bigram keys and the whole pipeline is
    built-in expressions — no Python UDF evaluators in the plan."""
    plan = _plan(spark, "doc_lm_perplexity")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan  # no row-/arrow-UDF stages


def test_ewma16_single_user_exchange(spark):
    """events_ewma16_user's window keys on user_id — exactly one
    user_id hash exchange, and the fold is built-in higher-order
    functions (no Python UDF stages)."""
    plan = _plan(spark, "events_ewma16_user")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "EvalPython" not in plan, plan


def test_basket_pairs_copartitioned_no_cartesian(spark):
    """part_pairs_cooccurrence self-joins on the basket key — an
    equi-join (never CartesianProduct), all built-in expressions."""
    plan = _plan(spark, "part_pairs_cooccurrence")
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_pagerank_lineage_bounded_by_checkpoint_cadence(spark):
    """pagerank_trading_graph declares its rounds as ONE plan (r9: the
    per-round checkpoint + manual broadcast cost one job per iteration
    — the 10× job floor, not the math, dominated bench wall time), but
    lineage must stay BOUNDED: a localCheckpoint every
    _PR_CHECKPOINT_EVERY rounds appears as a LogicalRDD in the final
    optimized plan, and the rounds stacked past it are at most one
    cadence window (one Aggregate per round above the boundary)."""
    from tests.conftest import SF_DIR as _SF
    from empdia_iceberg_spark import registry as _reg
    from empdia_iceberg_spark.operators import mining as _m

    df = _reg.queries()["pagerank_trading_graph"](spark, _SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in opt, opt  # the cadence checkpoint boundary
    rounds_in_plan = opt.count("Aggregate")
    # +1: when no mid-run checkpoint fires (iters <= cadence, r16) the
    # ranks0 node-distinct aggregate sits above the EDGE checkpoint
    # alongside the full round window
    assert rounds_in_plan <= _m._PR_CHECKPOINT_EVERY + 1, (
        f"{rounds_in_plan} stacked join-agg rounds in the final plan — "
        "checkpoint cadence not truncating lineage", opt)


def test_profile_reuses_stats_pass(spark):
    """profile_orders_stats computes the 1-row stats aggregate ONCE and
    reuses it (a materialized localCheckpoint, surfacing as LogicalRDD)
    for both the metric emission and the histogram bounds — never one
    orders subtree per metric. (Was a persist()/InMemoryRelation until
    r7: that cache entry leaked — never unpersisted — so the reuse now
    rides a checkpoint whose blocks release with the DataFrame.)"""
    from tests.conftest import SF_DIR as _SF
    from empdia_iceberg_spark import registry as _reg

    df = _reg.queries()["profile_orders_stats"](spark, _SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("LogicalRDD") >= 1, opt
    # exactly ONE uncached logical scan of orders (the histogram pass);
    # the stats pass is the materialized checkpoint, not a second scan
    logical_scans = [
        l for l in opt.splitlines() if l.split("+- ")[-1].startswith("Relation [")
    ]
    assert len(logical_scans) == 1, opt


def test_pit_join_is_keyed_not_cartesian(spark):
    """events_pit_dimension_join must execute as a KEYED join on
    user_id with the interval predicate residual — never a
    nested-loop/cartesian interval product."""
    plan = _plan(spark, "events_pit_dimension_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_all_outputs_driver_canonicalizable(spark):
    """Round-3 regression class, eliminated forever: the driver's
    canonicalizer sorts a pandas frame over ALL columns and dies on
    unhashable values (array/map/struct). Every registered query must
    emit scalar-only output columns. Schema-only check: builds each
    DataFrame lazily, executes nothing heavy for most queries."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    # building some queries RUNS them (table lifecycle, streaming
    # drains) — restrict the expensive ones out; their schemas are
    # covered by their own parity tests anyway
    skip_heavy = {
        n
        for n in registry.queries()
        if n.startswith(("stream_", "table_", "sink_"))
        or n in {"orc_roundtrip", "csv_roundtrip", "xml_roundtrip",
                 "json_ingest_corrupt_records"}
    }
    offenders = []
    for name, spec in registry.specs().items():
        if name in skip_heavy:
            continue
        df = spec.fn(spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_imputer_broadcasts_global_mean(spark):
    """events_impute_value: the global-mean fallback broadcasts; the
    user-mean join keys on user_id — no cartesian anywhere."""
    plan = _plan(spark, "events_impute_value")
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row global mean
    assert "CartesianProduct" not in plan, plan


def test_transitions_single_user_exchange(spark):
    """events_type_transitions: the lag window is the only user_id
    exchange; the transition aggregate runs on the tiny change rows."""
    plan = _plan(spark, "events_type_transitions")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_streaks_single_user_exchange_for_windows(spark):
    """events_longest_streaks: change-mark and island windows share ONE
    user_id exchange."""
    plan = _plan(spark, "events_longest_streaks")
    assert plan.count("Exchange hashpartitioning(user_id") >= 1, plan
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("+- Window") or s.startswith("Window"):
            assert "], [], [" not in line, line


def test_fuzzy_pairs_equi_join_on_blocks(spark):
    """doc_fuzzy_pairs_blocked joins on the blocking key — an equi
    join, never an all-pairs product."""
    plan = _plan(spark, "doc_fuzzy_pairs_blocked")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fifo_allocation_keyed_join(spark):
    """lineitem_fifo_allocation joins supply to demand on the part key
    with the overlap predicate residual — keyed, never cartesian."""
    plan = _plan(spark, "lineitem_fifo_allocation")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cohort_ltv_window_on_rollup_only(spark):
    """events_cohort_ltv's running sum must partition by cohort_week
    (tiny rollup), never an empty-key global window."""
    plan = _plan(spark, "events_cohort_ltv")
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("+- Window") or s.startswith("Window"):
            assert "], [], [" not in line, line


def test_target_encode_broadcasts_category_sums(spark):
    """events_target_encode_loo: the per-category aggregate broadcasts;
    the fact side never shuffles for the encode."""
    plan = _plan(spark, "events_target_encode_loo")
    assert "BroadcastHashJoin" in plan, plan


def test_mannwhitney_ranks_on_value_grain(spark):
    """mannwhitney_u_segments: the rank window must consume the
    value-grain aggregate (domain-bounded), so a HashAggregate sits
    between the scan and the Window; no cartesian anywhere."""
    plan = _plan(spark, "mannwhitney_u_segments")
    assert "CartesianProduct" not in plan, plan
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= win_pos < agg_pos or (0 <= agg_pos and win_pos == -1) or (
        0 <= agg_pos < win_pos  # executed-plan string lists Window above its child agg
    ), plan


def test_survival_km_broadcasts_scalars(spark):
    """events_survival_km: the observation-end and n-total 1-row
    aggregates must broadcast (BNLJ), and the curve windows run over
    the day-grain table — no cartesian fact product."""
    plan = _plan(spark, "events_survival_km")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_association_rules_broadcast_supports(spark):
    """part_association_rules: item supports are dimension-sized and
    must broadcast into the rule join."""
    plan = _plan(spark, "part_association_rules")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_triangle_census_keyed_joins(spark):
    """graph_triangle_census: the two-path and closing joins key on
    edge endpoints — never a nested-loop edge square."""
    plan = _plan(spark, "graph_triangle_census")
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop joins are the two 1-row count cross-broadcasts;
    # every edge join is keyed (hash/sort-merge, possibly inside the
    # cached-edge broadcast subtree)
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_open_peak_day_grain_before_running_window(spark):
    """orders_open_peak_monthly: deltas must collapse to day grain
    (HashAggregate) BEFORE the running-total window, keeping the
    global ordering calendar-bounded."""
    plan = _plan(spark, "orders_open_peak_monthly")
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan
    assert "Window" in plan, plan


def test_benford_prunes_to_totalprice(spark):
    """benford_order_totals: the scan must read ONLY o_totalprice."""
    plan = _plan(spark, "benford_order_totals")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "o_totalprice" in read_schema, read_schema
    assert "o_orderkey" not in read_schema, read_schema
    assert "o_custkey" not in read_schema, read_schema


def test_survival_km_curve_monotone(spark):
    """Kaplan-Meier invariant: S(t) is non-increasing and within
    [0, 1]; at-risk counts strictly decrease across death days."""
    rows = registry.queries()["events_survival_km"](spark, SF_DIR).collect()
    assert rows, "empty curve"
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv), surv
    assert all(a >= b for a, b in zip(surv, surv[1:])), surv
    risks = [r["n_risk"] for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:])), risks


def test_mannwhitney_u_complement(spark):
    """U_A + U_B == n_A · n_B (rank-sum identity) on real data."""
    row = registry.queries()["mannwhitney_u_segments"](spark, SF_DIR).collect()[0]
    assert row["u_building"] + row["u_automobile"] == (
        row["n_building"] * row["n_automobile"]
    )


def test_bm25_takeordered_not_global_window(spark):
    """doc_bm25_search: the global top-k must be TakeOrdered (orderBy+
    limit); the rank window runs only on the LIMIT-bounded rows."""
    plan = _plan(spark, "doc_bm25_search")
    assert "TakeOrdered" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rrf_fusion_bounded_join(spark):
    """doc_rrf_fusion: candidate lists are LIMIT-bounded before the
    fusion join; the only nested-loop joins are 1-row broadcasts
    (corpus stats, query vector)."""
    plan = _plan(spark, "doc_rrf_fusion")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrdered" in plan, plan


def test_drawdown_single_user_exchange(spark):
    """events_max_drawdown_user: the running-max window and the final
    per-user aggregate share ONE user_id exchange."""
    plan = _plan(spark, "events_max_drawdown_user")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_weighted_sample_prefilter_matches_plain_window(spark):
    """The Chernoff key-cutoff prefilter must select exactly the same
    sample as the unfiltered per-stratum rank window (miss prob
    ~2e-9 is theoretical; on this corpus it must be exact)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.functions.exact import det_round
    from empdia_iceberg_spark.operators.dataprep import (
        WEIGHTED_SAMPLE_K,
        doc_weighted_sample,
    )
    from empdia_iceberg_spark.sources.tables import load

    got = {
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in doc_weighted_sample(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").select("source", "doc_id", "n_chars")
    u = (
        F.conv(
            F.md5(F.col("doc_id").cast("string").cast("binary")).substr(1, 13),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4503599627370496.0)
    keyed = docs.select(
        "source",
        "doc_id",
        det_round(-F.log(u) / F.col("n_chars"), 12).alias("k"),
    )
    w = W.partitionBy("source").orderBy("k", "doc_id")
    plain = {
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= WEIGHTED_SAMPLE_K)
        .collect()
    }
    assert got == plain


def test_weighted_sample_prefilter_bounds_window_input(spark):
    """doc_weighted_sample: the cutoff filter must run BEFORE the rank
    window (plan order: Filter below Window), with the stratum totals
    broadcast."""
    plan = _plan(spark, "doc_weighted_sample")
    assert "BroadcastHashJoin" in plan, plan
    win_pos = plan.find("Window")
    assert win_pos != -1, plan
    below = plan[win_pos:]
    assert "Filter" in below and "w_total" in below, plan


def test_bfs_keyed_frontier_join(spark):
    """graph_bfs_hops: every frontier expansion is a keyed node join —
    no cartesian, no nested-loop over the edge set."""
    plan = _plan(spark, "graph_bfs_hops")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rolling_median_single_user_exchange(spark):
    """events_rolling_median_7d: both percentile frames share ONE
    user_id exchange; no global window."""
    plan = _plan(spark, "events_rolling_median_7d")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("+- Window") or s.startswith("Window"):
            assert "], [], [" not in line, line


def test_kmv_takeordered_mins(spark):
    """kmv_distinct_orders: the k smallest hashes come from TakeOrdered
    (per-partition k-mins merged), never a global sort."""
    plan = _plan(spark, "kmv_distinct_orders")
    assert "TakeOrdered" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmv_estimate_within_sketch_bound(spark):
    """KMV's ±1/√k relative error (k=256 → ~6.25%); allow 4σ."""
    row = registry.queries()["kmv_distinct_orders"](spark, SF_DIR).collect()[0]
    assert abs(row["rel_error"]) < 4.0 / (256 ** 0.5), row


def test_greedy_coverage_gains_monotone(spark):
    """Submodularity: marginal gains must be non-increasing and
    coverage strictly increasing across picks."""
    rows = registry.queries()["doc_greedy_coverage_select"](
        spark, SF_DIR
    ).collect()
    assert rows
    gains = [r["marginal_gain"] for r in rows]
    assert all(a >= b for a, b in zip(gains, gains[1:])), gains
    cov = [r["covered_bigrams"] for r in rows]
    assert all(a < b for a, b in zip(cov, cov[1:])), cov


def test_acf_calendar_bounded_join(spark):
    """daily_acf_value's lag pairing must be a keyed equi-join over the
    day-grain rollup (broadcast lag table), never a cartesian or a
    global window over the series."""
    plan = _plan(spark, "daily_acf_value")
    assert "CartesianProduct" not in plan
    # the t_prev pairing is a keyed broadcast hash join, never a
    # nested-loop over the series; the plan's BNLJ nodes are only the
    # tiny broadcast cross joins (13-row lag list, 1-row scalars)
    assert any(
        "BroadcastHashJoin" in line and "t_prev" in line
        for line in plan.splitlines()
    ), plan
    assert all(
        "BuildRight" in line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
    ), plan


def test_seasonal_scan_broadcasts_periods(spark):
    """seasonal_strength_scan fans the daily rollup out by 13 periods
    via a broadcast, and its phase aggregation partially aggregates
    map-side."""
    plan = _plan(spark, "seasonal_strength_scan")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial" in plan.lower()


def test_item_item_window_partitioned_by_item(spark):
    """item_item_similar_parts' top-5 window must partition by the item
    key — never an empty-key global window over all pairs."""
    plan = _plan(spark, "item_item_similar_parts")
    for line in plan.splitlines():
        if line.strip().startswith("+- Window") or line.strip().startswith("Window"):
            assert "], [], [" not in line, line


def test_assortativity_partial_moment_sums(spark):
    """graph_degree_assortativity reduces the edge list with map-side
    partial aggregation of the moment sums."""
    plan = _plan(spark, "graph_degree_assortativity")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan


def test_nb_broadcasts_model_scalars_only(spark):
    """nb_lang_confusion: the language table and vocab size broadcast;
    the token-stream-to-counts join is keyed (no cartesian on data)."""
    plan = _plan(spark, "nb_lang_confusion")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_weighted_quantiles_no_global_window(spark):
    """weighted_quantiles_quantity must use the bucketed prefix sum —
    its windows partition on the bucket key, never empty."""
    plan = _plan(spark, "weighted_quantiles_quantity")
    for line in plan.splitlines():
        if line.strip().startswith("+- Window") or line.strip().startswith("Window"):
            assert "], [], [" not in line, line


def test_seq2_join_keyed_on_user(spark):
    """seq2_event_patterns' pair join runs over the (user, type) span
    rollup keyed on user_id — no cartesian, partial agg before it."""
    plan = _plan(spark, "seq2_event_patterns")
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()


def test_emb_decontaminate_broadcasts_benchmark(spark):
    """The benchmark side broadcasts; the corpus max-cos aggregation
    partially aggregates map-side before any exchange."""
    plan = _plan(spark, "emb_decontaminate")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial_max" in plan or "partial" in plan.lower()


def test_rolling_wau_no_window_function(spark):
    """events_rolling_wau must contain NO window operator at all — the
    sliding-distinct is re-expressed as fan-out + day-keyed distinct."""
    plan = _plan(spark, "events_rolling_wau")
    assert "Window" not in plan


def test_kmv_overlap_takeordered_sketches(spark):
    """kmv_set_overlap's k-mins come from TakeOrdered (per-partition
    k-mins merged), never a global sort of the hash stream."""
    plan = _plan(spark, "kmv_set_overlap")
    assert "TakeOrderedAndProject" in plan


def test_rake_windows_doc_bounded(spark):
    """doc_rake_keyphrases' only window partitions by doc_id (island
    numbering) — no global window; top-20 is TakeOrdered."""
    plan = _plan(spark, "doc_rake_keyphrases")
    for line in plan.splitlines():
        if line.strip().startswith("+- Window") or line.strip().startswith("Window"):
            assert "], [], [" not in line, line
    assert "TakeOrderedAndProject" in plan


def test_pyds_source_plans_16_partitions(spark):
    """The custom Python data source must plan one InputPartition per
    row range — a parallel scan, not a driver materialization."""
    from empdia_iceberg_spark.sources.pydatasource import (
        SYNTH_PARTS,
        SYNTH_ROWS,
        SyntheticLedgerDataSource,
    )

    spark.dataSource.register(SyntheticLedgerDataSource)
    df = (
        spark.read.format("empdia_synth")
        .option("n_rows", SYNTH_ROWS)
        .option("n_partitions", SYNTH_PARTS)
        .load()
    )
    assert df.rdd.getNumPartitions() == SYNTH_PARTS
    assert df.count() == SYNTH_ROWS


def test_phrase_search_pushes_token_filter(spark):
    """doc_phrase_search: only the two query terms' postings survive —
    the isin filter must run before the adjacency join (no corpus-wide
    pair join), and the top-20 is TakeOrdered."""
    plan = _plan(spark, "doc_phrase_search")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_rerank_candidates_bounded_before_model(spark):
    """doc_rerank_crossencoder: the pandas_udf scores only the
    LIMIT-bounded BM25 candidates — the plan's UDF eval sits above a
    TakeOrdered, never above the corpus scan."""
    plan = _plan(spark, "doc_rerank_crossencoder")
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" in plan or "pythonUDF" in plan.lower()


def test_mc_pi_no_shuffle_of_samples(spark):
    """mc_pi_estimate: 1M synthetic points reduce via map-side partial
    aggregation — no exchange carries sample rows (only the final
    1-row partial merge)."""
    plan = _plan(spark, "mc_pi_estimate")
    assert "partial" in plan.lower()
    assert "Window" not in plan


def test_var_cvar_tail_filter_after_broadcast(spark):
    """orders_var_cvar: the 1-row percentile cut broadcasts; the tail
    scan is a filter + aggregate, no sort of the fact table."""
    plan = _plan(spark, "orders_var_cvar")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    # the tail scan is filter + aggregate only: NO Sort node anywhere —
    # the fact table is never ordered
    assert "Sort [" not in plan, plan


def test_session_window_batch_no_window_fn(spark):
    """events_session_window_batch: the built-in session_window plans as
    an aggregation, not a window function."""
    plan = _plan(spark, "events_session_window_batch")
    assert "SessionWindow" in plan.replace(" ", "") or "session_window" in plan or "Window" not in plan


def test_matching_rounds_keyed_no_cartesian(spark):
    """supplier_part_matching: every round is keyed aggregates + keyed
    joins — no cartesian product anywhere in the final plan."""
    plan = _plan(spark, "supplier_part_matching")
    assert "CartesianProduct" not in plan


def test_segment_migration_broadcasts_cuts(spark):
    """customer_segment_migration: the per-period percentile cut rows
    broadcast; tiers never come from a global ntile window."""
    plan = _plan(spark, "customer_segment_migration")
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if line.strip().startswith("+- Window") or line.strip().startswith("Window"):
            assert "], [], [" not in line, line


def test_sprt_interval_join_keyed_on_user(spark):
    """ab_sprt_trace: the click→purchase interval join is keyed on
    user_id with the time bound as residual — never a cartesian."""
    plan = _plan(spark, "ab_sprt_trace")
    assert "CartesianProduct" not in plan


def test_oov_vocab_broadcast(spark):
    """doc_oov_rate: the top-1000 vocabulary broadcasts onto the token
    stream; vocab selection is TakeOrdered."""
    plan = _plan(spark, "doc_oov_rate")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
