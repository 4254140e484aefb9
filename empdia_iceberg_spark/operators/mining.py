"""Pattern- and graph-mining operators (SURVEY.md §2.B extensions):
market-basket pair mining over order lines, Markov transition matrices
over per-user event sequences, and PageRank over the customer–supplier
bipartite graph.

All three are exact-arithmetic shapes (integer counts, det_round-then-
decimal sums for the iterative ranks) with full DuckDB value oracles —
the PageRank oracle unrolls the fixed iteration count into chained
CTEs, so even the iterative algorithm is hash-checked, not rows-only.

Scale posture:
- basket pairs: the self-join co-partitions on the basket key
  (l_orderkey) and per-basket fan-out is bounded by order width
  (≤ 7 lines in TPC-H-shaped data), so the pair stream is O(lines·k),
  never corpus². Pair counts shuffle on the (p1, p2) key.
- transitions: one user_id exchange for the lag window, then a tiny
  (prev, cur) aggregate.
- pagerank: the iteration-invariant edge list (with out-degrees
  pre-joined) is partitioned by src and persisted ONCE; each round the
  rank vector — |nodes| rows, tiny next to |edges| — joins it
  BROADCAST below a node-count ceiling (map-side, so per iteration the
  only shuffle is the (node, contribution) partial-agg), else falls
  back to a shuffle join in which only the rank vector moves (the
  cached edge partitioning is reused). Each round is eagerly
  localCheckpoint-ed: lineage stays flat AND the next round's
  broadcast reads materialized rows instead of re-executing the prior
  rounds' plan (stacked lineage makes per-round broadcasts quadratic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


@register(
    "part_pairs_cooccurrence",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_cnt AS (
        SELECT l_partkey, count(*) AS c_item FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS pair_cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.p1, p.p2, p.pair_cnt,
           {sql_det_round('CAST(p.pair_cnt AS DOUBLE) / CAST(c1.c_item AS DOUBLE)', 6)} AS conf_p1_p2
    FROM pairs p JOIN item_cnt c1 ON p.p1 = c1.l_partkey
    WHERE p.pair_cnt >= 2
    ORDER BY p.pair_cnt DESC, p.p1, p.p2
    LIMIT 100
    """,
    doc="Market-basket pair mining: frequent part pairs across orders "
    "with confidence P(p2|p1). The self-join co-partitions on the "
    "basket key (per-basket fan-out bounded by order width), pair "
    "support and confidence are exact integer counts.",
)
def part_pairs_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    item_cnt = items.groupBy(F.col("l_partkey").alias("p1")).agg(
        F.count(F.lit(1)).alias("c_item")
    )
    return (
        pairs.join(item_cnt, ["p1"])
        .select(
            "p1",
            "p2",
            "pair_cnt",
            det_round(
                F.col("pair_cnt").cast("double") / F.col("c_item").cast("double"), 6
            ).alias("conf_p1_p2"),
        )
        .orderBy(F.col("pair_cnt").desc(), "p1", "p2")
        .limit(100)
    )


@register(
    "events_type_transitions",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    totals AS (
        SELECT prev_type, sum(n) AS total FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
           {sql_det_round('CAST(t.n AS DOUBLE) / CAST(tt.total AS DOUBLE)', 6)} AS prob
    FROM trans t JOIN totals tt ON t.prev_type = tt.prev_type
    ORDER BY t.prev_type, t.next_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() inside one user_id exchange, then a tiny "
    "(prev, next) aggregate; transition probabilities are ratios of "
    "exact integer counts.",
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return (
        trans.join(totals, ["prev_type"])
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("bigint").alias("n"),
            det_round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


# ----------------------------------------------------------- pagerank
#
# Nodes: customers ('c<key>') and suppliers ('s<key>'); an undirected
# edge per distinct trading pair from orders⋈lineitem, walked in both
# directions. Fixed 10 power iterations of
#     r' = 0.15/N + 0.85 · Σ_in det_round(r/outdeg, 12)
# with the contribution terms det_round(12)-stabilized and summed in
# DECIMAL(38,12) — the det-round-then-decimal-sum discipline
# (functions/exact.py) that makes an ITERATIVE double computation
# bit-identical across engines and partitionings, so the oracle is a
# full value hash, not a rows-only check. The DuckDB oracle unrolls
# the 10 iterations into chained CTEs built by `_pagerank_oracle()`.

_PR_ITERS = 10
_PR_DAMP = 0.85
# Lineage bound for long iteration counts: one localCheckpoint every N
# rounds truncates plan growth and fault-recovery depth while leaving
# the common 10-round run as at most two jobs (r9: the per-ROUND
# checkpoint + manual rank broadcast forced one job — plan, AQE,
# scheduler, driver collect — per iteration, and that 10× job floor,
# not the math, was the bulk of the wall time at bench scale).
_PR_CHECKPOINT_EVERY = 10
# Rank-vector broadcast ceiling (r16): one row per node ≈ 16 bytes, so
# 2M nodes ≈ 32 MB broadcast — comfortably inside executor memory while
# far above any reasonable autoBroadcastJoinThreshold estimate miss.
# Below the ceiling the per-iteration rank join is PINNED broadcast
# (the build side is an aggregate subtree whose size estimate Catalyst
# routinely gets wrong — guide §3.1: hint when you know); above it the
# hint is dropped and the planner falls back to a shuffle join against
# the dst-partitioned checkpointed edges, whose iteration-invariant
# exchange is reused across rounds.
_PR_BROADCAST_MAX_NODES = 2_000_000


def _pagerank_oracle() -> str:
    head = """
    WITH edges0 AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM edges0
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges0
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (
        SELECT node, 1.0 / CAST(nn.n AS DOUBLE) AS r FROM nodes, nn
    )"""
    parts = [head]
    for k in range(1, _PR_ITERS + 1):
        contrib = sql_det_round(f"r{k-1}.r / CAST(deg.outdeg AS DOUBLE)", 12)
        parts.append(
            f""",
    c{k} AS (
        SELECT e.dst AS node,
               CAST(sum(CAST({contrib} AS DECIMAL(38,12))) AS DOUBLE) AS s
        FROM edges e
        JOIN r{k-1} ON r{k-1}.node = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst
    ),
    r{k} AS (
        SELECT nodes.node,
               0.15 / CAST(nn.n AS DOUBLE)
               + {_PR_DAMP} * COALESCE(c{k}.s, 0.0) AS r
        FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.node, nn
    )"""
        )
    parts.append(
        f"""
    SELECT node, {sql_det_round(f'r{_PR_ITERS}.r', 10)} AS rank
    FROM r{_PR_ITERS}
    ORDER BY node
    """
    )
    return "".join(parts)


@register(
    "pagerank_trading_graph",
    oracle=_pagerank_oracle(),
    doc="PageRank over the customer–supplier trading graph (distinct "
    "pairs from orders⋈lineitem, walked both directions): 10 "
    "join-agg power iterations, det_round(12)-stabilized long "
    "contribution sums so the iterative ranks stay bit-deterministic. "
    "Long surrogate node keys through the whole pipeline (string "
    "labels only in the final projection); the out-degree-annotated "
    "edge list checkpoints once, hash-exposed by dst so every round's "
    "contribution aggregate shares ONE runtime-reused exchange; the "
    "rounds are ONE declarative plan with the rank side PINNED "
    "broadcast below _PR_BROADCAST_MAX_NODES (shuffle-join fallback "
    "above the ceiling — a hint ignores autoBroadcastJoinThreshold) "
    "and a localCheckpoint every _PR_CHECKPOINT_EVERY (10) rounds "
    "bounding lineage on longer runs. The oracle unrolls the "
    "iterations into chained CTEs — a full value hash for an "
    "iterative algorithm.",
)
def pagerank_trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Long surrogate node keys — customers even (2k), suppliers odd
    # (2k+1) — instead of 'c<key>'/'s<key>' strings: every shuffle,
    # sort, and hash over the 10 rounds compares 8-byte longs, not
    # variable-length UTF-8. The human-readable labels the oracle
    # expects materialize once, in the final projection.
    directed = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Iteration-invariant: out-degree pre-joined onto every edge,
    # materialized ONCE as an eager localCheckpoint (not persist: the
    # returned plan must read it at action time, and a still-persisted
    # cache entry would outlive the query — checkpoint blocks release
    # with the DataFrame, the profile_orders_stats discipline).
    # Partitioned by DST (r16): every iteration ends in groupBy(dst-as-
    # node), so one hash exchange by dst ABOVE the checkpoint — under
    # AQE the checkpoint scan itself reports UnknownPartitioning, so
    # the repartition must stay a PLAN node, where EnsureRequirements
    # sees it and ReuseExchange executes it once for all rounds — lets
    # all 10 per-round contribution aggregates run WITHOUT their own
    # Exchange (guide §2.4: operations keyed the same way share one
    # exchange; the alias-aware projection carries hash(dst) through
    # the broadcast join). The rank side rides a broadcast below
    # _PR_BROADCAST_MAX_NODES; above it the planner falls back to a
    # shuffle join whose edge-side exchange is equally reused.
    edge_w = edges.join(deg, ["src"]).localCheckpoint().repartition("dst")
    # The edge list is symmetric, so distinct dst == distinct src ==
    # the node set — and a dst-keyed distinct reuses the repartition's
    # exchange (no extra shuffle) where the old src-keyed one added one.
    nodes = edge_w.select(F.col("dst").alias("node")).distinct()
    n = nodes.count()  # scalar driver read
    rank_side = (
        F.broadcast if n <= _PR_BROADCAST_MAX_NODES else (lambda d: d)
    )

    # The rounds build ONE declarative plan (r9 rewrite). The previous
    # shape — manual F.broadcast(ranks) + localCheckpoint EVERY round —
    # forced one complete job (plan, AQE, schedule, driver collect) per
    # iteration; at bench scale that 10× per-job floor dominated the
    # wall time (10 × ~0.45 s against ~1.5 s of actual compute). The
    # manual broadcast was also why the per-round checkpoint existed at
    # all (broadcasting a stacked lineage re-executes prior rounds —
    # O(rounds²)). Declared as one plan, a single action executes every
    # round exactly once. The rank side is PINNED broadcast below
    # _PR_BROADCAST_MAX_NODES (r16 — guide §3.1: the build side is an
    # aggregate whose size estimate is unreliable, and n is already in
    # hand): with the edges checkpointed dst-partitioned, a round is
    # then scan → BroadcastHashJoin → aggregate with ZERO exchanges —
    # the rank vector travels between rounds as a ~16·n-byte broadcast
    # instead of a contribution-row shuffle. The physical tree is one
    # linear chain (each round's broadcast appears exactly once), so
    # there is no per-round re-execution. Above the ceiling (~32 MB at
    # 2M nodes) the hint drops away and huge graphs take the shuffle
    # join, whose iteration-invariant edge-side exchange is reused
    # across rounds. A checkpoint every _PR_CHECKPOINT_EVERY rounds
    # still bounds plan depth and fault-recovery re-execution for long
    # iteration counts.
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    for it in range(_PR_ITERS):
        # The edge list is symmetric (each trading pair walked both
        # ways), so every node has indegree ≥ 1 and the inner groupBy
        # already covers the full node set — no dangling-node left
        # join is needed to keep the rank vector complete.
        # Contribution sum at LONG speed (exact.exact_sum_r6_bounded
        # discipline, d=12): k = floor((r/outdeg)·10¹² + 0.5) is exactly
        # the integer the old det_round(·,12) → DECIMAL(38,12) cast
        # accumulated, and a long Σk is overflow-safe at ANY graph size
        # because PageRank mass is conserved — Σr = 1 every round, so a
        # group's Σk ≤ 10¹² ≪ 2⁵³ < 2⁶³ regardless of corpus scale.
        # double(Σk)/10¹² therefore equals the decimal→double cast
        # bit-for-bit (verified rank-identical at sf0.1 against the
        # unrolled-CTE oracle), with no BigDecimal buffer in the hot
        # per-row aggregation.
        ranks = (
            edge_w.join(rank_side(ranks), edge_w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    F.col("r") / F.col("outdeg").cast("double") * F.lit(1e12)
                    + F.lit(0.5)
                ).alias("k"),
            )
            .groupBy("node")
            .agg((F.sum("k").cast("double") / F.lit(1e12)).alias("s"))
            .select(
                "node",
                (
                    F.lit(0.15) / F.lit(float(n))
                    + F.lit(_PR_DAMP) * F.col("s")
                ).alias("r"),
            )
        )
        if (it + 1) % _PR_CHECKPOINT_EVERY == 0 and it < _PR_ITERS - 1:
            ranks = ranks.localCheckpoint()
    # node >> 1 recovers the original key for BOTH parities (2k and
    # 2k+1) in pure integer arithmetic — `node / 2` would be a DOUBLE
    # division, whose quotient rounds for keys ≥ 2⁵³ and would silently
    # mislabel ranks on exactly the any-graph-size path the long-sum
    # argument above guarantees
    out = ranks.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
            F.shiftright(F.col("node"), 1).cast("string"),
        ).alias("node"),
        det_round(F.col("r"), 10).alias("rank"),
    ).orderBy("node")
    return out


# --------------------------------------------------- hierarchy rollup


@register(
    "part_hierarchy_rollup",
    oracle="""
    WITH anc AS (
        SELECT p.p_partkey // CAST(power(10, l.i) AS BIGINT) AS ancestor,
               p.p_retailprice
        FROM part p
        CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i) l
    )
    SELECT ancestor,
           CAST(count(*) AS BIGINT) AS n_descendants,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS subtree_value
    FROM anc
    WHERE ancestor > 0
    GROUP BY ancestor
    ORDER BY ancestor
    """,
    doc="Hierarchical (BOM-style) subtree rollup over the implicit "
    "decimal-digit part hierarchy (parent = key div 10): instead of "
    "iterating parent joins, each leaf EXPLODES its full ancestor "
    "chain in closed form (key div 10^i, bounded by key width) and "
    "one groupBy sums every subtree — transitive aggregation as a "
    "single map-side explode + one shuffle, the shape that beats "
    "k iterative self-joins at 100 TB when depth is bounded.",
)
def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    anc = part.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 6),"
                " i -> p_partkey div CAST(power(10, i) AS BIGINT))"
            )
        ).alias("ancestor"),
        "p_retailprice",
    ).filter(F.col("ancestor") > 0)
    return (
        anc.groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_descendants"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("subtree_value"),
        )
        .orderBy("ancestor")
    )


# ------------------------------------------------ duplicate baskets


@register(
    "duplicate_baskets",
    oracle="""
    WITH baskets AS (
        SELECT l_orderkey,
               md5(array_to_string(list_sort(list_distinct(list(l_partkey))), ',')) AS basket_hash,
               len(list_distinct(list(l_partkey))) AS basket_size
        FROM lineitem
        GROUP BY l_orderkey
    ),
    per_hash AS (
        SELECT basket_size, basket_hash, count(*) AS n_orders
        FROM baskets GROUP BY basket_size, basket_hash
    )
    SELECT CAST(basket_size AS INT)                 AS basket_size,
           CAST(sum(n_orders) AS BIGINT)            AS n_orders,
           CAST(count(*) AS BIGINT)                 AS n_distinct_baskets,
           CAST(count(*) FILTER (WHERE n_orders > 1) AS BIGINT) AS n_dup_groups,
           min(basket_hash)                         AS min_hash
    FROM per_hash
    GROUP BY basket_size
    ORDER BY basket_size
    """,
    doc="Duplicate-transaction detection: each order's part set "
    "canonicalizes to a NUMERIC-sorted distinct array fingerprint "
    "(md5 of the joined key list — set equality as hash equality); "
    "identical baskets share a fingerprint, and the per-size summary "
    "(orders, distinct baskets, duplicate groups, min fingerprint) "
    "stays productive even when the corpus has few true duplicates. "
    "Two map-side-combined hash aggregates; the shape behind "
    "duplicate-payment / replay detection.",
)
def duplicate_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.md5(
            F.concat_ws(
                ",",
                # sort NUMERICALLY first, stringify after — lexicographic
                # sorting of stringified keys ("10" < "9") would produce a
                # different canonical form than the oracle's numeric sort
                F.transform(
                    F.sort_array(F.collect_set("l_partkey")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("basket_hash"),
        F.size(F.collect_set("l_partkey")).alias("basket_size"),
    )
    per_hash = baskets.groupBy("basket_size", "basket_hash").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per_hash.groupBy("basket_size")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_baskets"),
            F.count(F.when(F.col("n_orders") > 1, 1))
            .cast("bigint")
            .alias("n_dup_groups"),
            F.min("basket_hash").alias("min_hash"),
        )
        .select(
            F.col("basket_size").cast("int").alias("basket_size"),
            "n_orders",
            "n_distinct_baskets",
            "n_dup_groups",
            "min_hash",
        )
        .orderBy("basket_size")
    )


# -------------------------------------------------- association rules
#
# The directional extension of part_pairs_cooccurrence: every frequent
# unordered pair yields TWO candidate rules A→B and B→A, scored with
# confidence, lift and leverage against the basket universe. All four
# metrics are ratios of exact integer counts combined in one IEEE
# closed form, so the rule table is hash-checkable. Scale shape: the
# pair stream shuffles on the basket key (fan-out bounded by order
# width), supports shuffle on the item key, and the final top-k is a
# TakeOrdered over the thresholded rule set — never materializing an
# unthresholded rule table.

_LIFT = "(pair_cnt * n_baskets) / (c_ante * c_cons)"
_LEVERAGE = (
    "pair_cnt / n_baskets - (c_ante / n_baskets) * (c_cons / n_baskets)"
)


@register(
    "part_association_rules",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets FROM items
    ),
    item_cnt AS (
        SELECT l_partkey, CAST(count(*) AS DOUBLE) AS c_item FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(count(*) AS DOUBLE) AS pair_cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    rules AS (
        SELECT p1 AS antecedent, p2 AS consequent, pair_cnt FROM pairs
        UNION ALL
        SELECT p2 AS antecedent, p1 AS consequent, pair_cnt FROM pairs
    ),
    scored AS (
        SELECT r.antecedent, r.consequent,
               CAST(r.pair_cnt AS BIGINT) AS pair_support,
               ca.c_item AS c_ante, cc.c_item AS c_cons,
               r.pair_cnt, n.n_baskets
        FROM rules r
        JOIN item_cnt ca ON r.antecedent = ca.l_partkey
        JOIN item_cnt cc ON r.consequent = cc.l_partkey
        CROSS JOIN n
    )
    SELECT antecedent, consequent, pair_support,
           {sql_det_round('pair_cnt / c_ante', 6)} AS confidence,
           {sql_det_round(_LIFT, 6)} AS lift,
           {sql_det_round(_LEVERAGE, 9)} AS leverage
    FROM scored
    ORDER BY {sql_det_round(_LIFT, 6)} DESC, antecedent, consequent
    LIMIT 50
    """,
    doc="Association-rule mining over order baskets: directional rules "
    "from frequent part pairs, scored with confidence, lift and "
    "leverage (exact integer counts, identical IEEE closed forms). "
    "Top-50 by lift with deterministic tiebreaks. Shuffles: basket-key "
    "pair join, item-key support joins (the support side is "
    "dimension-sized — AQE broadcasts it), TakeOrdered top-k.",
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    n = items.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_baskets")
    )
    item_cnt = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("c_item")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    rules = pairs.select(
        F.col("p1").alias("antecedent"),
        F.col("p2").alias("consequent"),
        "pair_cnt",
    ).unionByName(
        pairs.select(
            F.col("p2").alias("antecedent"),
            F.col("p1").alias("consequent"),
            "pair_cnt",
        )
    )
    scored = (
        rules.join(
            F.broadcast(
                item_cnt.select(
                    F.col("l_partkey").alias("antecedent"),
                    F.col("c_item").alias("c_ante"),
                )
            ),
            ["antecedent"],
        )
        .join(
            F.broadcast(
                item_cnt.select(
                    F.col("l_partkey").alias("consequent"),
                    F.col("c_item").alias("c_cons"),
                )
            ),
            ["consequent"],
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        scored.select(
            "antecedent",
            "consequent",
            F.col("pair_cnt").cast("bigint").alias("pair_support"),
            det_round(F.expr("pair_cnt / c_ante"), 6).alias("confidence"),
            det_round(F.expr(_LIFT), 6).alias("lift"),
            det_round(F.expr(_LEVERAGE), 9).alias("leverage"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(50)
    )


# ------------------------------------------------------ triangle census
#
# Global clustering structure of the co-purchase graph: nodes are
# parts, edges are part pairs co-purchased in ≥ 2 baskets. Triangles
# are enumerated with the canonical node-ordered two-path join
# (a<b<c), the distributed-standard algorithm: every triangle is
# produced exactly once, and the join keys are edge endpoints so the
# work shuffles on node ids, never on the full edge square. Wedges
# (open two-paths) come from per-node degrees; the global clustering
# coefficient 3·triangles/wedges is one IEEE division over exact
# integer counts.


@register(
    "graph_triangle_census",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    deg AS (
        SELECT node, CAST(count(*) AS DECIMAL(38,0)) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
        ) GROUP BY node
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    m AS (
        SELECT (SELECT count(*) FROM edges) AS n_edges,
               (SELECT count(*) FROM deg) AS n_nodes,
               (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
               (SELECT n_triangles FROM tri) AS n_triangles
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           {sql_det_round('3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)', 6)} AS clustering_coef
    FROM m
    """,
    doc="Triangle census of the co-purchase part graph (edges: pairs "
    "co-bought in ≥ 2 baskets): node/edge/wedge/triangle counts and "
    "the global clustering coefficient. Node-ordered two-path join "
    "(a<b<c) enumerates each triangle once — the standard distributed "
    "triangle algorithm; joins shuffle on node endpoints, degrees are "
    "one node-key aggregate. Counts are exact integers; the "
    "coefficient is one IEEE division.",
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    # The thresholded edge set feeds three joins: materialize it ONCE —
    # localCheckpoint, not persist: a persist() here was never
    # unpersisted (the returned plan still references it, so there is
    # no safe unpersist point), pinning cache blocks for the session
    # lifetime across long registry sweeps; checkpointed blocks release
    # with the DataFrame by GC (same discipline as pagerank/BFS/k-core).
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("d"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    m = (
        nodes.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
    )
    return m.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        det_round(
            F.lit(3.0)
            * F.col("n_triangles").cast("double")
            / F.col("n_wedges").cast("double"),
            6,
        ).alias("clustering_coef"),
    )


# ------------------------------------------------------ BFS hop counts
#
# Graph traversal as iterative join-aggregate (the connected-components
# / PageRank discipline): breadth-first distances from a deterministic
# source (the smallest node id in the co-purchase edge set) out to
# MAX_HOPS, returning the hop histogram. Each round is ONE join of the
# current frontier against the edge list (shuffle keys: node ids) and
# a min-aggregate; `localCheckpoint` truncates lineage so 6 rounds do
# not stack a 6-join plan, and the loop reads back only a 1-int
# frontier count per round. The oracle is a bounded recursive CTE with
# set-dedup — a FULL value check for an iterative algorithm.

BFS_MAX_HOPS = 6


@register(
    "graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges0 AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    edges AS (
        SELECT u, v FROM edges0 UNION ALL SELECT v AS u, u AS v FROM edges0
    ),
    src AS (
        SELECT min(u) AS s FROM edges
    ),
    bfs(node, d) AS (
        SELECT s AS node, 0 AS d FROM src
        UNION
        SELECT e.v AS node, bfs.d + 1 AS d
        FROM bfs JOIN edges e ON e.u = bfs.node
        WHERE bfs.d < {BFS_MAX_HOPS}
    ),
    dist AS (
        SELECT node, min(d) AS hop FROM bfs GROUP BY node
    )
    SELECT CAST(hop AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY hop ORDER BY hop
    """,
    doc="BFS hop histogram over the undirected co-purchase graph from "
    "the smallest node id: distances to every node within 6 hops via "
    "iterative frontier-join-min (one node-key join + one min-agg per "
    "round, localCheckpoint lineage truncation, only a scalar frontier "
    "count crosses to the driver per round). Value-checked against a "
    "bounded recursive-CTE oracle.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    edges = edges.localCheckpoint(eager=True)  # reused every round

    src = edges.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).alias("hop")
    )
    dist = src.localCheckpoint(eager=True)
    frontier = dist
    for h in range(1, BFS_MAX_HOPS + 1):
        # expand the frontier one hop; drop nodes already reached
        reached = (
            frontier.join(edges, frontier.node == edges.u)
            .select(F.col("v").alias("node"), F.lit(h).alias("hop"))
            .distinct()
            .join(dist.select("node"), ["node"], "left_anti")
        )
        reached = reached.localCheckpoint(eager=True)
        # only a scalar crosses to the driver — never frontier rows
        if reached.limit(1).count() == 0:
            break
        dist = dist.unionByName(reached).localCheckpoint(eager=True)
        frontier = reached
    return (
        dist.groupBy("hop")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.col("hop").cast("int").alias("hop"), "n_nodes")
        .orderBy("hop")
    )


# ----------------------------------------- item-item recommendations
#
# The classic neighborhood recommender: cosine similarity between
# parts over BINARY basket membership, sim(u,v) = cooc(u,v) /
# sqrt(freq(u)·freq(v)). Aggregate-first: the pair stream is the same
# basket-key-co-partitioned self-join as part_pairs_cooccurrence
# (bounded per-basket fan-out), supports are one part-key aggregate
# joined back on the pair endpoints, and the per-item top-5 window
# runs over each item's candidate list (≤ its co-purchase degree),
# never a global sort. sqrt is IEEE-exact on both engines, so the
# cosine is hash-checkable.


@register(
    "item_item_similar_parts",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey AS pk, count(*) AS f FROM items GROUP BY l_partkey
    ),
    cooc AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS c
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    sym AS (
        SELECT u, v, c FROM cooc
        UNION ALL
        SELECT v AS u, u AS v, c FROM cooc
    ),
    scored AS (
        SELECT sym.u, sym.v,
               {sql_det_round('CAST(sym.c AS DOUBLE) / sqrt(CAST(fu.f AS DOUBLE) * CAST(fv.f AS DOUBLE))', 6)} AS cosine,
               row_number() OVER (PARTITION BY sym.u
                                  ORDER BY CAST(sym.c AS DOUBLE) / sqrt(CAST(fu.f AS DOUBLE) * CAST(fv.f AS DOUBLE)) DESC, sym.v) AS rnk
        FROM sym
        JOIN freq fu ON fu.pk = sym.u
        JOIN freq fv ON fv.pk = sym.v
    )
    SELECT CAST(u AS BIGINT) AS part_id,
           CAST(v AS BIGINT) AS similar_part,
           CAST(rnk AS INT) AS rnk,
           cosine
    FROM scored WHERE rnk <= 5
    ORDER BY part_id, rnk
    """,
    doc="Item-item collaborative filtering over binary basket vectors: "
    "cosine(u,v) = cooc/sqrt(freq_u·freq_v) for part pairs co-bought "
    "in ≥2 baskets, top-5 neighbours per part with deterministic "
    "tiebreak. The pair stream co-partitions on the basket key with "
    "bounded fan-out; supports broadcast back onto pair endpoints; "
    "the ranking window is per-item-candidate-bounded, never global.",
)
def item_item_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    freq = items.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("f")
    )
    a, b = items.alias("a"), items.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
    )
    sym = cooc.unionByName(
        cooc.select(F.col("v").alias("u"), F.col("u").alias("v"), "c")
    )
    fu = freq.select(F.col("pk").alias("u"), F.col("f").alias("fu"))
    fv = freq.select(F.col("pk").alias("v"), F.col("f").alias("fv"))
    cosine = F.col("c").cast("double") / F.sqrt(
        F.col("fu").cast("double") * F.col("fv").cast("double")
    )
    w = W.partitionBy("u").orderBy(cosine.desc(), F.col("v"))
    scored = (
        sym.join(fu, "u")
        .join(fv, "v")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
    )
    return scored.select(
        F.col("u").cast("bigint").alias("part_id"),
        F.col("v").cast("bigint").alias("similar_part"),
        F.col("rnk").cast("int").alias("rnk"),
        det_round(cosine, 6).alias("cosine"),
    ).orderBy("part_id", "rnk")


# ------------------------------------------- degree assortativity
#
# Newman's degree-assortativity coefficient: the Pearson correlation
# of endpoint degrees over the (symmetrized) edge list of the
# co-purchase graph. One degree aggregate on the node key, one join of
# the edge list against it per endpoint, then the five moment sums —
# exact decimal accumulation with the identical IEEE closed form on
# both engines (sqrt is correctly rounded per IEEE-754), so even a
# correlation coefficient over a graph is hash-checkable.


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    cooc AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    sym AS (
        SELECT u, v FROM cooc UNION ALL SELECT v AS u, u AS v FROM cooc
    ),
    deg AS (
        SELECT u AS node, count(*) AS d FROM sym GROUP BY u
    ),
    pairs AS (
        SELECT CAST(du.d AS DOUBLE) AS x, CAST(dv.d AS DOUBLE) AS y
        FROM sym JOIN deg du ON du.node = sym.u JOIN deg dv ON dv.node = sym.v
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           {sql_det_round('(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))', 6)} AS assortativity
    FROM m
    """,
    doc="Newman degree assortativity of the co-purchase part graph: "
    "Pearson correlation of endpoint degrees over the symmetrized "
    "edge list. Degrees are one node-key aggregate joined back per "
    "endpoint; the five moment sums accumulate exactly in decimal "
    "and the closed form (with IEEE-exact sqrt) hash-matches across "
    "engines. Negative values = hubs link to leaves (disassortative).",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    sym = cooc.unionByName(cooc.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dy"))
    pairs = (
        sym.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("dx").cast("double").alias("x"),
            F.col("dy").cast("double").alias("y"),
        )
    )
    dx = F.col("x").cast("decimal(18,2)")
    dy = F.col("y").cast("decimal(18,2)")
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_directed_edges"),
        det_round(r, 6).alias("assortativity"),
    )


# -------------------------------------- sequential pattern support
#
# Frequent ordered 2-sequences "a … then … b" (any gap) across user
# event histories — the sequence-mining complement of the ADJACENT
# Markov transitions: support(a→b) = how many users have SOME a
# strictly before SOME b. Aggregate-first: a→b exists for a user iff
# min_ts(a) < max_ts(b), so the per-user pair enumeration runs over
# the (user, type) MIN/MAX rollup — at most |types|² rows per user,
# never the event history — one user-keyed self-join of a table with
# one row per (user, type). Pure integer counts ⇒ hash-green.


@register(
    "seq2_event_patterns",
    oracle="""
    WITH spans AS (
        SELECT user_id, event_type,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM events GROUP BY user_id, event_type
    ),
    users AS (SELECT count(DISTINCT user_id) AS nu FROM events),
    sup AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS support
        FROM spans a JOIN spans b
          ON a.user_id = b.user_id AND a.first_ts < b.last_ts
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           CAST(support AS BIGINT) AS support,
           (floor(CAST(support AS DOUBLE) / CAST(nu AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS user_share
    FROM sup CROSS JOIN users
    ORDER BY type_a, type_b
    """,
    doc="Frequent ordered event-type 2-sequences with arbitrary gap "
    "(a occurs strictly before b for the same user): existence "
    "reduces to min_ts(a) < max_ts(b) over the per-(user, type) "
    "span rollup, so the pair join touches ≤ |types|² rows per user "
    "— the aggregate-first trick that keeps sequence mining off the "
    "raw history. Supports are exact user counts.",
)
def seq2_event_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    spans = events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    users = events.agg(F.countDistinct("user_id").alias("nu"))
    a = spans.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("first_ts").alias("fa"),
    )
    b = spans.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("last_ts").alias("lb"),
    )
    sup = (
        a.join(b, "user_id")
        .filter(F.col("fa") < F.col("lb"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        sup.crossJoin(F.broadcast(users))
        .select(
            "type_a",
            "type_b",
            F.col("support").cast("bigint").alias("support"),
            det_round(
                F.col("support").cast("double") / F.col("nu").cast("double"), 6
            ).alias("user_share"),
        )
        .orderBy("type_a", "type_b")
    )


# ------------------------------------------------ k-core decomposition

KCORE_KS = (2, 3)
KCORE_ROUNDS = 24  # peeling is idempotent post-fixpoint: extra rounds no-op


def _kcore_oracle() -> str:
    """Unrolled peeling (the _pagerank_oracle discipline): for each k,
    KCORE_ROUNDS rounds of 'keep nodes with degree >= k in the current
    subgraph'. Peeling is monotone and idempotent at the fixpoint, so
    as long as the graph stabilizes within the unrolled budget (the
    Spark side ASSERTS it does) the chained CTEs equal the true core."""
    base = """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    cooc AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    sym AS MATERIALIZED (SELECT u, v FROM cooc UNION ALL SELECT v, u FROM cooc)"""
    selects = []
    for k in KCORE_KS:
        prev = "sym"
        for r in range(KCORE_ROUNDS):
            cur = f"e_{k}_{r}"
            base += f""",
    keep_{k}_{r} AS MATERIALIZED (
        SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {k}
    ),
    {cur} AS MATERIALIZED (
        SELECT e.u, e.v FROM {prev} e
        JOIN keep_{k}_{r} a ON e.u = a.u
        JOIN keep_{k}_{r} b ON e.v = b.u
    )"""
            prev = cur
        selects.append(
            f"SELECT {k} AS k, CAST(count(DISTINCT u) AS BIGINT) AS n_nodes,"
            f" CAST(count(*) / 2 AS BIGINT) AS n_edges FROM {prev}"
        )
    return base + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY k"


@register(
    "graph_kcore_sizes",
    oracle=_kcore_oracle(),
    doc="k-core decomposition of the co-purchase graph (k=2,3): "
    "iterative peeling — drop nodes with degree < k, recompute, "
    "repeat to fixpoint. Each round is one degree aggregate plus one "
    "semi-join of the edge list against the survivors (shuffles on "
    "node ids only), lineage truncated with localCheckpoint; the "
    "driver reads a single edge-count scalar per round and ASSERTS "
    "the fixpoint lands within the unrolled-oracle budget. Cores are "
    "the standard dense-subgraph/influence screen.",
)
def graph_kcore_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    sym = cooc.unionByName(
        cooc.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)

    results = []
    for k in KCORE_KS:
        edges = sym
        n_edges = edges.count()
        for _ in range(KCORE_ROUNDS):
            keep = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d")).filter(
                F.col("d") >= k
            ).select("u")
            edges = (
                edges.join(keep, "u", "left_semi")
                .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            prev, n_edges = n_edges, edges.count()  # one scalar per round
            if n_edges == prev:
                break
        else:
            raise RuntimeError(
                f"k-core (k={k}) did not stabilize within {KCORE_ROUNDS} "
                "rounds; raise KCORE_ROUNDS (and regenerate the oracle)"
            )
        stats = edges.agg(
            F.countDistinct("u").cast("bigint").alias("n_nodes"),
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
        ).select(F.lit(k).alias("k"), "n_nodes", "n_edges")
        results.append(stats)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy("k")


# ----------------------------------------- Markov-chain entropy rate
#
# H = −Σ_i π_i Σ_j P_ij log2 P_ij over the empirical transition matrix
# (π = observed source-state distribution): how predictable user
# behaviour is — 0 bits = deterministic next event, log2(|types|) =
# uniform. All inputs are exact integer counts from the transitions
# aggregate; each π_i·P_ij·log2(P_ij) term is det_round+decimal-summed
# so the entropy rate hash-matches across engines.

from empdia_iceberg_spark.functions.exact import exact_sum_r6, sql_sum_r6  # noqa: E402

_ER_TERM = (
    "-(CAST(tt.total AS DOUBLE) / CAST(g.gt AS DOUBLE))"
    " * (CAST(t.n AS DOUBLE) / CAST(tt.total AS DOUBLE))"
    " * log2(CAST(t.n AS DOUBLE) / CAST(tt.total AS DOUBLE))"
)


@register(
    "events_markov_entropy_rate",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    totals AS (
        SELECT prev_type, sum(n) AS total FROM trans GROUP BY prev_type
    ),
    g AS (SELECT sum(n) AS gt FROM trans)
    SELECT CAST((SELECT count(*) FROM totals) AS INT) AS n_states,
           {sql_sum_r6(_ER_TERM)} AS entropy_rate_bits
    FROM trans t JOIN totals tt ON t.prev_type = tt.prev_type CROSS JOIN g
    """,
    doc="Entropy rate of the user-behaviour Markov chain: "
    "H = −Σ π_i P_ij log2 P_ij with π the empirical source-state "
    "share — the single-number predictability of the event stream "
    "(0 = deterministic, log2|types| = uniform). Reuses the "
    "transitions aggregate's one user_id exchange; terms are "
    "det_round+decimal-summed ⇒ hash-green.",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("total"))
    g = trans.agg(F.sum("n").alias("gt"))
    n_states = totals.agg(F.count(F.lit(1)).cast("int").alias("n_states"))
    pi = F.col("total").cast("double") / F.col("gt").cast("double")
    pij = F.col("n").cast("double") / F.col("total").cast("double")
    h = (
        trans.join(totals, ["prev_type"])
        .crossJoin(F.broadcast(g))
        # exact_sum_r6 det_rounds its argument at 6 itself
        .agg(exact_sum_r6(-pi * pij * F.log2(pij)).alias("entropy_rate_bits"))
    )
    return n_states.crossJoin(F.broadcast(h))


# ------------------------------------- greedy weighted matching

MATCH_ROUNDS = 16  # mutual-best matches ~half the free vertices/round


def _matching_oracle() -> str:
    """Unrolled mutual-best matching (the _kcore_oracle discipline):
    each round keeps the edges whose supplier-side argmax and
    part-side argmax coincide (deterministic (w DESC, s, p) order),
    adds them to the matching, and drops every edge touching a
    matched vertex. Idempotent once the edge set is empty, so the
    fixed unroll equals the converged matching — asserted Spark-side."""
    base = """
    WITH e_0 AS MATERIALIZED (
        SELECT l_suppkey AS s, l_partkey AS p,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS w,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS w_exact
        FROM lineitem GROUP BY l_suppkey, l_partkey
    )"""
    matched = []
    for r in range(MATCH_ROUNDS):
        base += f""",
    sb_{r} AS MATERIALIZED (
        SELECT s, p AS bp FROM (
            SELECT s, p, row_number() OVER (PARTITION BY s ORDER BY w DESC, p) AS rn
            FROM e_{r}
        ) WHERE rn = 1
    ),
    pb_{r} AS MATERIALIZED (
        SELECT p, s AS bs FROM (
            SELECT p, s, row_number() OVER (PARTITION BY p ORDER BY w DESC, s) AS rn
            FROM e_{r}
        ) WHERE rn = 1
    ),
    m_{r} AS MATERIALIZED (
        SELECT e.s, e.p, e.w, e.w_exact
        FROM e_{r} e
        JOIN sb_{r} ON sb_{r}.s = e.s AND sb_{r}.bp = e.p
        JOIN pb_{r} ON pb_{r}.p = e.p AND pb_{r}.bs = e.s
    ),
    e_{r + 1} AS MATERIALIZED (
        SELECT e.s, e.p, e.w, e.w_exact FROM e_{r} e
        WHERE e.s NOT IN (SELECT s FROM m_{r})
          AND e.p NOT IN (SELECT p FROM m_{r})
    )"""
        matched.append(f"SELECT s, p, w_exact FROM m_{r}")
    base += f""",
    matching AS ({' UNION ALL '.join(matched)})
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           (floor(CAST(sum(w_exact) AS DOUBLE) * 100.0 + 0.5) / 100.0) AS total_weight,
           CAST((SELECT count(*) FROM e_{MATCH_ROUNDS}) AS BIGINT) AS n_unmatched_edges
    FROM matching"""
    return base


@register(
    "supplier_part_matching",
    oracle=_matching_oracle(),
    doc="Distributed greedy weighted matching (the parallel 'auction' "
    "round: an edge is matched iff it is BOTH its supplier's and its "
    "part's best remaining edge — the locally-dominant-edge algorithm, "
    "which agrees with sequential greedy matching and halves the free "
    "vertices per round in expectation): suppliers paired to parts "
    "maximizing revenue weight. Each round is two argmax aggregates + "
    "one mutual join + two anti-joins, all keyed on vertex ids; "
    "lineage truncated per round, one scalar read per round, "
    "convergence ASSERTED within the unrolled-oracle budget. The "
    "assignment-problem family (allocation, load balance, ad "
    "matching) at shuffle-join scale.",
)
def supplier_part_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    edges = (
        li.groupBy(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("w_exact")
        )
        # comparisons use the double (identical across engines — the
        # same exact rational casts to the same nearest double); the
        # EXACT decimal rides along so the final total is an exact
        # decimal sum, never an order-dependent double sum
        .select("s", "p", F.col("w_exact").cast("double").alias("w"), "w_exact")
        .localCheckpoint(eager=True)
    )
    matched = None
    n_edges = edges.count()
    for r in range(MATCH_ROUNDS):
        if n_edges == 0:
            break
        sb = edges.groupBy("s").agg(
            F.max(F.struct(F.col("w"), (-F.col("p")).alias("np"))).alias("b")
        ).select("s", (-F.col("b.np")).alias("bp"))
        pb = edges.groupBy("p").agg(
            F.max(F.struct(F.col("w"), (-F.col("s")).alias("ns"))).alias("b")
        ).select("p", (-F.col("b.ns")).alias("bs"))
        m = (
            edges.join(sb, ["s"])
            .filter(F.col("bp") == F.col("p"))
            .join(pb, ["p"])
            .filter(F.col("bs") == F.col("s"))
            .select("s", "p", "w", "w_exact")
            .localCheckpoint(eager=True)
        )
        matched = m if matched is None else matched.unionByName(m)
        matched = matched.localCheckpoint(eager=True)
        edges = (
            edges.join(m.select("s"), ["s"], "left_anti")
            .join(m.select("p"), ["p"], "left_anti")
            .select("s", "p", "w", "w_exact")
            .localCheckpoint(eager=True)
        )
        n_edges = edges.count()  # one scalar per round
    else:
        if n_edges != 0:
            raise RuntimeError(
                f"matching did not converge within {MATCH_ROUNDS} rounds "
                f"({n_edges} edges left); raise MATCH_ROUNDS (and the oracle)"
            )
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        # exact decimal total: a plain double sum is summation-order-
        # dependent and could flip det_round by 0.01 near a boundary
        det_round(F.sum("w_exact").cast("double"), 2).alias("total_weight"),
        F.lit(0).cast("bigint").alias("n_unmatched_edges"),
    )
