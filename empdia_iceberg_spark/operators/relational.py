"""Relational core operators (SURVEY.md §2.B: scans, projection/filter,
joins incl. semi/anti/broadcast, aggregation incl. rollup/distinct,
sort/limit/top-k, set ops, scalar functions, subqueries).

Every query is registered with a DuckDB oracle (driver gate) unless its
semantics are engine-specific (e.g. ``approx_count_distinct`` sketches
differ between engines → rows-only).

Scale notes (100 TB posture):
- fact-side scans carry their filters (Catalyst pushes them into the
  parquet reader — verified via ``.explain``: PushedFilters);
- region/nation are fixed-cardinality dims → explicit ``broadcast``;
- customer/orders/lineitem joins are equi-joins on their keys, so AQE
  picks SMJ/shuffled-hash with skew splitting at scale, broadcast at
  test scale; nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import (
    det_round,
    exact_sum2,
    exact_sum8,
    exact_sum8_bounded,
    grouped_scaled_sums,
    moment_sums,
    sql_avg2,
    sql_det_round,
    sql_moment_sums,
    sql_sum2,
    sql_sum8,
    exact_sum_r6,
    sql_sum_r6,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load, local_df

# Shared cutoffs (data spans 1995-01..2001-11, see FIXTURES.md).
_Q1_CUTOFF = "1998-09-02"
_Q3_DATE = "1998-01-01"


@register(
    "q1_pricing_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round({sql_sum2('l_quantity')}, 2)                                        AS sum_qty,
           round({sql_sum2('l_extendedprice')}, 2)                                   AS sum_base_price,
           {sql_det_round(sql_sum8('l_extendedprice * (1 - l_discount)'), 2)}                AS sum_disc_price,
           {sql_det_round(sql_sum8('l_extendedprice * (1 - l_discount) * (1 + l_tax)'), 2)}  AS sum_charge,
           {sql_det_round(sql_avg2('l_quantity'), 4)}                                        AS avg_qty,
           {sql_det_round(sql_avg2('l_extendedprice'), 4)}                                   AS avg_price,
           {sql_det_round(sql_avg2('l_discount'), 4)}                                        AS avg_disc,
           count(*)                                                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style pricing summary: scan→filter→groupBy→7 aggs→sort. "
    "The seven exact sums run through exact.grouped_scaled_sums — "
    "scaled-long per-partition partials re-aggregated in DECIMAL(38,0) "
    "— so the hot path is integer arithmetic (measured ~1.8× the whole "
    "query vs BigDecimal buffers at sf0.1) while whole-corpus sums stay "
    "overflow-safe; the values are bit-identical to the decimal casts "
    "(the oracle is unchanged: products of 2-decimal money columns "
    "carry ≤6 exact decimals, so the DECIMAL(28,8) oracle sum equals "
    "the 10⁶-scaled integer sum).",
)
def q1_pricing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    g = grouped_scaled_sums(
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        {
            "s_qty": (F.col("l_quantity"), 2),
            "s_price": (F.col("l_extendedprice"), 2),
            "s_disc_price": (disc_price, 6),
            "s_charge": (disc_price * (1 + F.col("l_tax")), 6),
            "s_disc": (F.col("l_discount"), 2),
        },
    )
    n = F.col("__count")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("s_qty"), 2).alias("sum_qty"),
        F.round(F.col("s_price"), 2).alias("sum_base_price"),
        det_round(F.col("s_disc_price"), 2).alias("sum_disc_price"),
        det_round(F.col("s_charge"), 2).alias("sum_charge"),
        det_round(F.col("s_qty") / n, 4).alias("avg_qty"),
        det_round(F.col("s_price") / n, 4).alias("avg_price"),
        det_round(F.col("s_disc") / n, 4).alias("avg_disc"),
        n.alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "q3_join3_topk",
    oracle=f"""
    SELECT l_orderkey,
           {sql_det_round(sql_sum8('l_extendedprice * (1 - l_discount)'), 2)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H-Q3-style: 3-way join → group → top-10 by revenue "
    "(deterministic tiebreak). Plan shape (r9): the revenue aggregate "
    "is pushed BELOW the join — lineitem pre-aggregates per "
    "l_orderkey (o_orderdate/o_orderpriority are functionally "
    "dependent on the unique orderkey, so the per-orderkey groups are "
    "exactly the query's groups), and orders is semi-reduced by the "
    "broadcast BUILDING-customer dim BEFORE its exchange. The big "
    "exchange then carries map-side-combined (orderkey, Σrevenue) "
    "partials — ~4× fewer rows, 2 narrow columns — instead of every "
    "filtered lineitem, the post-join re-aggregation disappears, and "
    "the final join reuses the pre-agg's hash partitioning (one "
    "exchange per side total). Catalyst doesn't push aggregates "
    "through joins, so the shape is declared this way; the revenue "
    "sum itself runs at LONG speed (exact_sum8_bounded: per-order "
    "groups are structurally ≤7 lineitems), bit-identical to the "
    "oracle's DECIMAL(28,8) sum.",
)
def q3_join3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    li_rev = li.groupBy("l_orderkey").agg(
        det_round(
            exact_sum8_bounded(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            2,
        ).alias("revenue")
    )
    # customer prunes to one join column (~2.4 MB per 100M-row scale
    # unit after the segment filter) — under the auto-broadcast
    # threshold at bench scale, and above it Catalyst falls back to a
    # shuffle join on its own: no forced broadcast to outgrow.
    orders_b = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        li_rev.join(orders_b, li_rev.l_orderkey == orders_b.o_orderkey)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           {sql_det_round(sql_sum8('l_extendedprice * (1 - l_discount)'), 2)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H-Q5-style 6-way join with local-supplier condition; nation/region broadcast.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            det_round(
                exact_sum8(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_det_round(sql_sum8('l_extendedprice * (1 - l_discount)'), 2)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H-Q10-style returned-item revenue: quarter of orders, "
    "returned lineitems only, customer×nation context, top-20 "
    "customers by lost revenue. Both date and returnflag predicates "
    "push to their scans; nation broadcasts.",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            det_round(
                exact_sum8(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_det_round(sql_sum8('l_extendedprice * l_discount'), 2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.04
      AND l_quantity < 24
    """,
    doc="TPC-H-Q6-style forecast-revenue: pure filter + single aggregate "
    "— every predicate pushes to the parquet scan (date range, discount "
    "band, quantity cap), then one map-side-combined sum. The minimal "
    "full-scan query: at 100 TB its cost IS the pruned scan.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            det_round(
                exact_sum8(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {sql_det_round(
        "100.0 * "
        + sql_sum8("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
        + " / " + sql_sum8('l_extendedprice * (1 - l_discount)'), 4)} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H-Q14-style promo-revenue share: fact-to-dim equi-join "
    "(part broadcasts — it is the small side at any scale factor) with "
    "a conditional-aggregate ratio; both sums decimal-exact so the "
    "division is bit-deterministic.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        det_round(
            F.lit(100.0) * exact_sum8(promo) / exact_sum8(disc), 4
        ).alias("promo_revenue_pct")
    )


_Q18_MIN_QTY = 300


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           round({sql_sum2('l_quantity')}, 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_MIN_QTY}
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H-Q18-style large-volume orders: aggregate-derived semi-join "
    "(orders whose total quantity exceeds the threshold) back into a "
    "3-way join + re-aggregate, top-20. The HAVING subquery shuffles "
    "only (orderkey, qty-sum) — never wide rows.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > _Q18_MIN_QTY)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(exact_sum2("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_det_round(sql_sum8('l_extendedprice * (1 - l_discount)'), 2)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H-Q19-style disjunctive predicates: an OR of brand/size/"
    "quantity conjunctions across the join. Catalyst extracts the "
    "common join key and pushes the per-side conjuncts "
    "(p_brand/p_size to part, l_quantity to lineitem) below the join.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        det_round(
            exact_sum8(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    )
    ORDER BY c_custkey
    """,
    doc="Left-semi join (EXISTS): customers having at least one order > 100k.",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big_orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    -- NOT EXISTS, not NOT IN: a single NULL o_custkey would make
    -- NOT IN return ZERO rows while the Spark left-anti join keeps
    -- every order-less customer (and dq_checks_orders audits for
    -- exactly such dirty keys)
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "set_ops_segments",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
    ORDER BY op, c_custkey
    """,
    doc="Set operations: union distinct, intersect, except on customer key sets.",
)
def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    tagged = (
        building.union(rich).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionByName(
            building.intersect(rich).select(F.lit("intersect").alias("op"), "c_custkey")
        )
        .unionByName(
            # subtract == SQL EXCEPT (set semantics); exceptAll().distinct()
            # would wrongly keep values whose count(left) > count(right).
            building.subtract(rich).select(F.lit("except").alias("op"), "c_custkey")
        )
    )
    return tagged.orderBy("op", "c_custkey")


@register(
    "rollup_pricing",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round({sql_sum2('l_quantity')}, 2)     AS sum_qty,
           count(*)                      AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    doc="Hierarchical ROLLUP aggregate (grouping-sets family); NULL levels coalesced to 'ALL'.",
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(exact_sum2("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "cube_order_priority",
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*)                         AS n_orders,
           round({sql_sum2('o_totalprice')}, 2)      AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY orderstatus, orderpriority
    """,
    doc="CUBE aggregate over order status × priority.",
)
def cube_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(exact_sum2("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total",
        )
        .orderBy("orderstatus", "orderpriority")
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Multi distinct-aggregate per group (exact).",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_distinct_counts",
    oracle=None,  # HLL sketches differ across engines → rows-only check.
    doc="approx_count_distinct (HyperLogLog++) per group; rows-only (sketch-dependent).",
)
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Global top-k: sort + limit with deterministic tiebreak (TakeOrderedAndProject).",
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "scalar_string_fns",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           substr(c_name, 1, 9)                            AS name_prefix,
           concat(c_name, '#', c_mktsegment)               AS name_seg,
           regexp_extract(c_name, '([0-9]+)', 1)           AS name_digits,
           length(c_name)                                  AS name_len,
           starts_with(lower(c_mktsegment), 'b')           AS seg_b,
           replace(lower(c_mktsegment), 'i', '_')          AS seg_repl
    FROM customer
    ORDER BY c_custkey
    """,
    doc="String scalar functions: case, substring, concat, regexp, length, predicate, replace.",
)
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.concat_ws("#", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.length("c_name").alias("name_len"),
        F.startswith(F.lower("c_mktsegment"), F.lit("b")).alias("seg_b"),
        F.replace(F.lower("c_mktsegment"), F.lit("i"), F.lit("_")).alias("seg_repl"),
    ).orderBy("c_custkey")


@register(
    "date_fns_orders",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                   AS order_year,
           month(o_orderdate)                                  AS order_month,
           quarter(o_orderdate)                                AS order_quarter,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)  AS days_since_epoch_95
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Date/time scalar functions: year/month/quarter, date_trunc, datediff.",
)
def date_fns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_95"
        ),
    ).orderBy("o_orderkey")


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           count(*)                                          AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           floor(CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON extraction on the events.props column + aggregate (R201-family scalar fns).",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            det_round(F.sum(k).cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_above_customer_avg",
    oracle=f"""
    WITH w AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               -- decimal sum => exact & order-independent across engines;
               -- the double division then matches Spark bit-for-bit
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER win AS DOUBLE)
                 / count(*) OVER win AS cust_avg
        FROM orders
        WINDOW win AS (PARTITION BY o_custkey)
    )
    SELECT o_orderkey, o_custkey,
           round(o_totalprice, 2) AS totalprice,
           {sql_det_round('cust_avg', 2)}     AS cust_avg
    FROM w
    WHERE o_totalprice > cust_avg
    ORDER BY o_orderkey
    """,
    doc="Correlated-subquery semantics (orders above their customer's average) via window.",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        orders.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            det_round(F.col("cust_avg"), 2).alias("cust_avg"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "events_hourly_rollup",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*)              AS n_events,
           round({sql_sum2('value')}, 2)  AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour, event_type
    """,
    doc="Time-bucketed rollup: hourly event counts and value sums (BASELINE headline query).",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum2("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("hour", "event_type")
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
               min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT)                                        AS n_users,
           CAST(count(t_signup) AS BIGINT)                                 AS n_signed_up,
           CAST(count(*) FILTER (WHERE t_click > t_signup) AS BIGINT)      AS n_clicked_after,
           CAST(count(*) FILTER (WHERE t_purchase > t_click
                                   AND t_click > t_signup) AS BIGINT)      AS n_converted
    FROM firsts
    """,
    doc="Funnel analysis (signup → click → purchase, first occurrences "
    "in strict order): one conditional-min aggregate per user, then a "
    "single funnel rollup — the sessionized-conversion staple. One "
    "shuffle on user_id; NULL stage times drop out of later stages "
    "automatically (SQL NULL comparison semantics, identical in both "
    "engines).",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t_signup").cast("bigint").alias("n_signed_up"),
        # count(when), not sum(cast): sum over an input with no true
        # rows is NULL where the oracle's count(*) FILTER is 0
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1))
        .cast("bigint")
        .alias("n_clicked_after"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        )
        .cast("bigint")
        .alias("n_converted"),
    )


@register(
    "events_weekly_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_week,
               CAST(floor((epoch(date_trunc('week', e.ts)) - epoch(c.cohort_week))
                          / (7*24*3600)) AS BIGINT) AS week_offset
        FROM events e JOIN cohorts c USING (user_id)
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    WHERE week_offset <= 4
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    doc="Cohort retention: users bucketed by first-activity week, then "
    "distinct active users per (cohort, week offset) for the first 5 "
    "weeks — the classic retention triangle. Two shuffles (cohort "
    "assignment on user_id, then the retention rollup); the cohort map "
    "is user-cardinality and joins back broadcast-or-shuffle as AQE "
    "sizes it.",
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp("cohort_week")
                )
                / (7 * 24 * 3600)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 4)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 0), 2) AS open_total,
           round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 0), 2) AS done_total,
           round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 0), 2) AS part_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Pivot (wide conditional aggregation) of order totals by status.",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")

    def total_for(status: str):
        return F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == status, F.col("o_totalprice")
                    ).cast("decimal(18,2)")
                ).cast("double"),
                F.lit(0.0),
            ),
            2,
        )

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            total_for("O").alias("open_total"),
            total_for("F").alias("done_total"),
            total_for("P").alias("part_total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "null_safe_join_acctbal",
    oracle="""
    SELECT c.c_custkey, s.s_suppkey
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey IS NOT DISTINCT FROM s.s_nationkey
    ORDER BY c.c_custkey, s.s_suppkey
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM) customer↔supplier by nation.",
)
def null_safe_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    return (
        cust.join(supp, cust.c_nationkey.eqNullSafe(supp.s_nationkey))
        .select("c_custkey", "s_suppkey")
        .orderBy("c_custkey", "s_suppkey")
    )


@register(
    "map_functions_props",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT)            AS n_keys,
           CAST(props->>'$.k' AS BIGINT)                 AS k_val,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(props->>'$.k' AS BIGINT)                 AS roundtrip_val
    FROM events
    ORDER BY event_id
    LIMIT 1000
    """,
    doc="Map functions (§2.B scalar-fns row): from_json to MAP, "
    "element_at, map_keys, and a map_from_entries round trip over the "
    "events.props JSON column.",
)
def map_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    k_val = F.element_at(m, "k")
    rebuilt = F.map_from_entries(  # map built back from an entries array
        F.array(F.struct(F.lit("k").alias("key"), k_val.alias("value")))
    )
    return (
        ev.select(
            "event_id",
            F.size(m).cast("int").alias("n_keys"),
            k_val.alias("k_val"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
            F.element_at(rebuilt, "k").alias("roundtrip_val"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "grouping_sets_pricing",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n_rows,
           round({sql_sum2('l_quantity')}, 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY gid, returnflag, linestatus
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube) with grouping_id — "
    "per-flag, per-status, and grand-total aggregates in one pass "
    "(one shuffle; Spark expands sets map-side).",
)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               count(*) AS n_rows,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, returnflag, linestatus
        """
    )


@register(
    "percentile_order_values",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {sql_det_round('quantile_cont(o_totalprice, 0.25)', 4)} AS p25,
           {sql_det_round('quantile_cont(o_totalprice, 0.50)', 4)} AS p50,
           {sql_det_round('quantile_cont(o_totalprice, 0.90)', 4)} AS p90
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact percentiles (continuous interpolation) per priority — "
    "Spark percentile() vs DuckDB quantile_cont. The exact form is the "
    "oracle anchor; the sketch form for 100 TB is "
    "approx_percentile_sketch (rows-only, bounded-error t-digest-style).",
)
def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            det_round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            det_round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
            det_round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "approx_percentile_sketch",
    oracle=None,  # sketch: bounded-error, not bit-exact — rows-only; the
    # error bound vs the exact percentiles is asserted in tests.
    doc="approx_percentile sketch per priority — the mergeable-summary "
    "path that replaces exact percentile sort at 100 TB (single pass, "
    "O(1) state per group).",
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_multi_grain_rollup",
    oracle="""
    WITH g AS (
        SELECT date_trunc('hour', ts)                    AS h,
               CAST(date_trunc('day', ts) AS TIMESTAMP)  AS d,  -- DuckDB day-trunc returns DATE
               event_type, value
        FROM events
    )
    SELECT coalesce(CAST(h AS VARCHAR), CAST(d AS VARCHAR), 'ALL') AS grain_start,
           CASE WHEN h IS NOT NULL THEN 'hour'
                WHEN d IS NOT NULL THEN 'day'
                ELSE 'total' END AS grain,
           event_type,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM g
    GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (event_type))
    ORDER BY grain, grain_start, event_type
    """,
    doc="Hypertable-style multi-granularity rollup (continuous-aggregate "
    "shape): hourly, daily, and total aggregates of the events stream in "
    "ONE pass via GROUPING SETS over the time truncations — one shuffle "
    "instead of three rollup jobs.",
)
def events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("_ev_mg")
    return spark.sql(
        """
        WITH g AS (
            SELECT date_trunc('hour', ts)  AS h,
                   date_trunc('day', ts)   AS d,
                   event_type, value
            FROM _ev_mg
        )
        SELECT coalesce(CAST(h AS STRING), CAST(d AS STRING), 'ALL') AS grain_start,
               CASE WHEN h IS NOT NULL THEN 'hour'
                    WHEN d IS NOT NULL THEN 'day'
                    ELSE 'total' END AS grain,
               event_type,
               count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM g
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (event_type))
        ORDER BY grain, grain_start, event_type
        """
    )


@register(
    "salted_join_skewed",
    oracle="""
    WITH skewed AS (
        SELECT CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id END AS k, value
        FROM events
    ),
    dim AS (
        SELECT user_id AS k, count(*) AS user_events
        FROM events GROUP BY user_id
    )
    SELECT s.k,
           count(*) AS n_rows,
           CAST(max(d.user_events) AS BIGINT) AS dim_val
    FROM skewed s JOIN dim d ON s.k = d.k
    GROUP BY s.k
    ORDER BY s.k
    """,
    doc="Skew-handling salted join: a third of the fact rows share one "
    "hot key (k=0). The fact side gets a random-free deterministic salt "
    "(event hash % 8); the dim side is exploded across all 8 salts; the "
    "join key becomes (k, salt), splitting the hot key across 8 reducers. "
    "Result identical to the unsalted join (the oracle).",
)
def salted_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    SALTS = 8
    ev = load(spark, sf_dir, "events")
    skewed = ev.select(
        F.when(F.col("event_id") % 3 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
        # deterministic salt (no rand(): keeps the query replayable)
        (F.xxhash64("event_id") % SALTS).alias("salt"),
    ).withColumn("salt", F.abs("salt").cast("int"))
    dim = (
        ev.groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("user_events"))
        .withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(SALTS)])))
    )
    joined = skewed.join(dim, ["k", "salt"])
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("user_events").cast("bigint").alias("dim_val"),
        )
        .orderBy("k")
    )


@register(
    "unpivot_pricing_metrics",
    oracle=f"""
    WITH wide AS (
        SELECT l_returnflag,
               round({sql_sum2('l_quantity')}, 2)      AS sum_qty,
               round({sql_sum2('l_extendedprice')}, 2) AS sum_price,
               CAST(count(*) AS DOUBLE)                AS n_items
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_items))
    ORDER BY l_returnflag, metric
    """,
    doc="UNPIVOT/melt (inverse of pivot): wide per-flag pricing metrics "
    "reshaped to long (metric, value) rows — df.unpivot vs DuckDB "
    "UNPIVOT.",
)
def unpivot_pricing_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(exact_sum2("l_quantity"), 2).alias("sum_qty"),
        F.round(exact_sum2("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("l_returnflag", "metric")


@register(
    "stats_exact_moments",
    oracle=f"""
    WITH s AS (
        SELECT l_returnflag,
               {sql_moment_sums('l_quantity', 'l_extendedprice')}
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT)                                                     AS n_items,
           {sql_det_round('(sxy - sx * sy / n) / n', 4)}                         AS covar_pop,
           {sql_det_round('(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))', 6)} AS corr,
           {sql_det_round('sqrt(n * syy - sy * sy) / n', 4)}                     AS stddev_pop_price
    FROM s
    ORDER BY l_returnflag
    """,
    doc="Second-moment aggregates (covar_pop/corr/stddev_pop) computed "
    "EXACTLY: all five moment sums accumulate as DECIMAL (associative, "
    "order-independent), convert once to double, and both engines apply "
    "the identical IEEE formula — bit-for-bit deterministic, unlike the "
    "built-in streaming corr/covar whose merge order varies. One "
    "shuffle, map-side partial aggregation.",
)
def stats_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        *moment_sums("l_quantity", "l_extendedprice")
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_items"),
        det_round((sxy - sx * sy / n) / n, 4).alias("covar_pop"),
        det_round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr"),
        det_round(F.sqrt(n * syy - sy * sy) / n, 4).alias("stddev_pop_price"),
    ).orderBy("l_returnflag")


SPLIT_PCT = (80, 10)  # train < 80, val < 90, else test


@register(
    "hash_split_assignments",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < {SPLIT_PCT[0]} THEN 'train'
                WHEN bucket < {SPLIT_PCT[0] + SPLIT_PCT[1]} THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id)              AS min_doc,
           max(doc_id)              AS max_doc
    FROM h
    GROUP BY split
    ORDER BY split
    """,
    doc="Deterministic hash-based 80/10/10 split (md5(doc_id) mod 100): "
    "the scale-correct complement to the reference's positional split "
    "(utils/split.py:6-7) — assignment is a pure per-row function of "
    "the key, so it needs no global ordering, survives reshuffling and "
    "incremental ingest, and never moves a document between splits when "
    "the corpus grows. Map-only until the summary aggregate.",
)
def hash_split_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[0] + SPLIT_PCT[1], "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


SAMPLE_FRACTIONS = {"1-URGENT": 0.5, "2-HIGH": 0.25, "3-MEDIUM": 0.1}
SAMPLE_SEED = 7


@register(
    "stratified_sample_counts",
    oracle=None,  # Bernoulli sampling is engine-RNG-dependent → rows-only;
    # per-stratum fraction tolerance is asserted in tests/test_scale_paths.py.
    doc="Stratified sampling (df.sampleBy): per-stratum Bernoulli "
    "fractions {0.5, 0.25, 0.1} with a fixed seed, unlisted strata "
    "dropped. Map-only scan — sampling decisions are per-row, no "
    "shuffle until the summary aggregate; the layout used to cut a "
    "100 TB corpus to a class-balanced training subset.",
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    sample = orders.sampleBy("o_orderpriority", SAMPLE_FRACTIONS, seed=SAMPLE_SEED)
    return (
        sample.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("o_orderkey").alias("min_key"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH k AS (
        SELECT date_trunc('hour', ts) AS hour_ts, value,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
        FROM events
    )
    SELECT strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           arg_min(value, ord)      AS open,
           max(value)               AS high,
           min(value)               AS low,
           arg_max(value, ord)      AS close
    FROM k
    GROUP BY hour_ts
    ORDER BY hour
    """,
    doc="OHLC candlestick rollup: per-hour open/high/low/close of the "
    "event value — open/close via min_by/max_by on a zero-padded "
    "(epoch_micros, event_id) ordering key, so exact-timestamp ties "
    "break deterministically on event_id in both engines. One shuffle "
    "with map-side partial min_by/max_by state (a single (key,value) "
    "pair per bucket per mapper — no sort, no window).",
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "value",
            ord_key.alias("ord"),
        )
        .groupBy("hour_ts")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
        )
        .select(
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
        .orderBy("hour")
    )


@register(
    "orders_status_summary",
    oracle=f"""
    WITH sc AS (
        SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    md AS (
        SELECT o_orderpriority, max(cnt) AS max_cnt
        FROM sc GROUP BY 1
    ),
    mode_pick AS (
        -- mode with an explicit tie-break: highest count, then lowest status
        SELECT sc.o_orderpriority, min(sc.o_orderstatus) AS mode_status
        FROM sc JOIN md ON sc.o_orderpriority = md.o_orderpriority
                       AND sc.cnt = md.max_cnt
        GROUP BY sc.o_orderpriority
    ),
    base AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_det_round('median(o_totalprice)', 4)} AS median_price,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        FROM orders GROUP BY 1
    )
    SELECT b.o_orderpriority, b.n_orders, b.median_price, b.statuses, m.mode_status
    FROM base b JOIN mode_pick m ON b.o_orderpriority = m.o_orderpriority
    ORDER BY b.o_orderpriority
    """,
    doc="Ordered-set / collection aggregates: exact median, sorted "
    "string_agg of distinct statuses (listagg), and mode with an "
    "explicit (count DESC, value ASC) tie-break — mode is computed as "
    "a two-level aggregate because engine-native mode() leaves ties "
    "unspecified. Median is the only sort-based aggregate; everything "
    "else is hash-aggregable with map-side partials.",
)
def orders_status_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    sc = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mode_pick = sc.groupBy("o_orderpriority").agg(
        F.min_by(
            "o_orderstatus", F.struct((-F.col("cnt")).alias("nc"), "o_orderstatus")
        ).alias("mode_status")
    )
    base = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        det_round(F.median("o_totalprice"), 4).alias("median_price"),
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
    )
    return (
        base.join(mode_pick, "o_orderpriority")
        .select("o_orderpriority", "n_orders", "median_price", "statuses", "mode_status")
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------- per-entity anomaly scan

ZSCORE_THRESHOLD = 3.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH m AS (
        SELECT event_id, user_id, value,
               CAST(count(*) OVER w AS DOUBLE)                                  AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)         AS sx,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sxx
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    ),
    z AS (
        SELECT event_id, user_id, value,
               (value - sx / n) / sqrt(greatest(sxx / n - (sx / n) * (sx / n), 1e-12)) AS zval
        FROM m
    )
    SELECT event_id, user_id, value,
           {sql_det_round('zval', 6)} AS zscore
    FROM z
    WHERE abs(zval) > {ZSCORE_THRESHOLD}
    ORDER BY event_id
    """,
    doc="Per-user anomaly detection: population z-score of each event "
    "value against its user's mean/stddev, flagging |z| > 3. The "
    "moments come from a whole-partition window (one shuffle on "
    "user_id, no join-back); sums accumulate in DECIMAL so mean and "
    "variance are bit-deterministic across engines, and the variance "
    "is floored at 1e-12 so constant-valued users divide cleanly "
    "instead of by zero. At 100 TB the per-user partitions stay small "
    "(events per user, not global), so the window never concentrates "
    "on one reducer.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    dec = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(dec).over(w).cast("double")
    sxx = F.sum(dec * dec).over(w).cast("double")
    mean = sx / n
    var = F.greatest(sxx / n - mean * mean, F.lit(1e-12))
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.select("event_id", "user_id", "value", z.alias("zval"))
        .filter(F.abs(F.col("zval")) > ZSCORE_THRESHOLD)
        .select(
            "event_id",
            "user_id",
            "value",
            det_round(F.col("zval"), 6).alias("zscore"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------- mergeable-sketch rollup


@register(
    "user_reach_hll_rollup",
    oracle=None,  # Spark's Datasketches HLL and DuckDB's approx engine
    # differ by construction — rows-only; a ±5% accuracy bound vs the
    # exact distinct count is asserted in tests/test_scale_paths.py.
    doc="Re-aggregatable sketch rollup — THE pattern for distinct "
    "counting at 100 TB: per-(event_type, day) HLL sketches of "
    "user_id (hll_sketch_agg, map-side partial like any agg) are "
    "merged upward with hll_union_agg to per-type reach WITHOUT "
    "re-scanning raw events. naive_sum_daily (the wrong answer a "
    "non-mergeable rollup would give by summing daily uniques) is "
    "reported next to the merged estimate to show why sketch "
    "mergeability matters. Deterministic: HLL registers are "
    "hash-derived and merge by max — associative and order-free.",
)
def user_reach_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.approx_count_distinct("user_id").alias("daily_uniques"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("daily_uniques").cast("bigint").alias("naive_sum_daily"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("bigint")
            .alias("reach_estimate"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- SCD2 dimension build


@register(
    "events_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    versioned AS (
        SELECT user_id, event_type, ts,
               lead(ts) OVER w AS next_ts,
               row_number() OVER w AS version
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id,
           CAST(version AS INT)                            AS version,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S')               AS valid_from,
           strftime(next_ts, '%Y-%m-%d %H:%M:%S')          AS valid_to,
           (next_ts IS NULL)                               AS is_current
    FROM versioned
    ORDER BY user_id, version
    """,
    doc="SCD type-2 dimension build (the warehouse change-history "
    "pattern): each user's event stream collapses to versioned "
    "(valid_from, valid_to] intervals, one row per event_type change "
    "— detect changes with lag over (user, time), then close each "
    "interval with lead over the change rows only. Two windows, ONE "
    "shuffle: both partition by user_id, so the second window reuses "
    "the first exchange. At 100 TB the state per user is its event "
    "history — partition-parallel, no global ordering anywhere.",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", "ts")
    )
    w2 = W.partitionBy("user_id").orderBy("ts")
    return (
        changes.withColumn("next_ts", F.lead("ts").over(w2))
        .withColumn("version", F.row_number().over(w2).cast("int"))
        .select(
            "user_id",
            "version",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            F.col("next_ts").isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# ------------------------------------------------- RFM segmentation


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH refdate AS (
        SELECT max(o_orderdate) AS ref FROM orders
    ),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate), (SELECT ref FROM refdate)) AS recency,
               count(*) AS freq,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    th AS (
        SELECT quantile_cont(recency * 1.0, 0.25) AS r25,
               quantile_cont(recency * 1.0, 0.50) AS r50,
               quantile_cont(recency * 1.0, 0.75) AS r75,
               quantile_cont(freq * 1.0, 0.25)    AS f25,
               quantile_cont(freq * 1.0, 0.50)    AS f50,
               quantile_cont(freq * 1.0, 0.75)    AS f75,
               quantile_cont(monetary, 0.25)      AS m25,
               quantile_cont(monetary, 0.50)      AS m50,
               quantile_cont(monetary, 0.75)      AS m75
        FROM per_cust
    ),
    scored AS (
        SELECT per_cust.*,
               CASE WHEN recency <= r25 THEN 4 WHEN recency <= r50 THEN 3
                    WHEN recency <= r75 THEN 2 ELSE 1 END AS r_score,
               CASE WHEN freq <= f25 THEN 1 WHEN freq <= f50 THEN 2
                    WHEN freq <= f75 THEN 3 ELSE 4 END AS f_score,
               CASE WHEN monetary <= m25 THEN 1 WHEN monetary <= m50 THEN 2
                    WHEN monetary <= m75 THEN 3 ELSE 4 END AS m_score
        FROM per_cust, th
    ),
    seg AS (
        SELECT *,
               CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
                    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                    WHEN r_score >= 3 AND f_score <= 2 THEN 'promising'
                    ELSE 'regular' END AS segment
        FROM scored
    )
    SELECT segment,
           count(*) AS n_customers,
           round({sql_sum2('monetary')}, 2) AS total_monetary,
           {sql_det_round('CAST(sum(freq) AS DOUBLE) / count(*)', 4)} AS avg_frequency
    FROM seg
    GROUP BY segment
    ORDER BY segment
    """,
    doc="RFM customer segmentation (recency / frequency / monetary): "
    "per-customer metrics from one orders groupBy, quartile score "
    "thresholds from ONE 1-row exact-percentile aggregate broadcast "
    "back (never a global ntile window — the scale-killer form of "
    "RFM), CASE-scored 1–4 per axis, segments rolled up. Monetary "
    "values are exact 2-decimal sums so re-summing across customers "
    "stays order-independent; threshold comparisons use identical "
    "doubles on both engines.",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    asof = orders.agg(F.max("o_orderdate").alias("ref"))
    per_cust = (
        orders.join(F.broadcast(asof))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("ref"), F.max("o_orderdate")).alias("recency"),
            F.count(F.lit(1)).alias("freq"),
            exact_sum2(F.col("o_totalprice")).alias("monetary"),
        )
    )
    th = per_cust.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(q)).alias(f"{c[0]}{int(q*100)}")
            for c in ("recency", "freq", "monetary")
            for q in (0.25, 0.50, 0.75)
        ]
    )
    scored = per_cust.join(F.broadcast(th)).select(
        "*",
        F.when(F.col("recency") <= F.col("r25"), 4)
        .when(F.col("recency") <= F.col("r50"), 3)
        .when(F.col("recency") <= F.col("r75"), 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("freq") <= F.col("f25"), 1)
        .when(F.col("freq") <= F.col("f50"), 2)
        .when(F.col("freq") <= F.col("f75"), 3)
        .otherwise(4)
        .alias("f_score"),
        F.when(F.col("monetary") <= F.col("m25"), 1)
        .when(F.col("monetary") <= F.col("m50"), 2)
        .when(F.col("monetary") <= F.col("m75"), 3)
        .otherwise(4)
        .alias("m_score"),
    )
    seg = scored.withColumn(
        "segment",
        F.when(
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3) & (F.col("m_score") >= 3),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), "promising")
        .otherwise("regular"),
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(exact_sum2(F.col("monetary")), 2).alias("total_monetary"),
            det_round(F.sum("freq").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_frequency"
            ),
        )
        .orderBy("segment")
    )


# ------------------------------------------------- time-weighted average


@register(
    "events_twap_user",
    oracle=f"""
    WITH iv AS (
        SELECT user_id,
               CAST(value AS DECIMAL(10,2)) AS v,
               CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS DECIMAL(14,0)) AS dur
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*)                                     AS n_intervals,
           CAST(sum(dur) AS BIGINT)                     AS total_dur_us,
           {sql_det_round('CAST(sum(v * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE)', 6)} AS twap
    FROM iv
    WHERE dur IS NOT NULL AND dur > 0
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Time-weighted average price/value (TWAP) per user over an "
    "IRREGULAR event series — each value holds until the user's next "
    "event, so plain avg() is wrong whenever sampling is uneven. "
    "Interval durations come from lead(ts) in integer microseconds; "
    "value×duration products and their sums accumulate entirely in "
    "DECIMAL (exact, associative), with ONE double conversion at the "
    "final division — bit-identical across engines. One user_id "
    "shuffle shared by the window and the rollup.",
)
def events_twap_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        F.col("value").cast("decimal(10,2)").alias("v"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
        .cast("decimal(14,0)")
        .alias("dur"),
    ).filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur").cast("bigint").alias("total_dur_us"),
            det_round(
                F.sum(F.col("v") * F.col("dur")).cast("double")
                / F.sum("dur").cast("double"),
                6,
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------------- ABC / Pareto analysis


@register(
    "parts_abc_pareto",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(r) AS t FROM rev),
    cum AS (
        SELECT l_partkey, r,
               sum(r) OVER (ORDER BY r DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS c
        FROM rev
    ),
    classed AS (
        SELECT l_partkey, r,
               CASE WHEN CAST(c AS DOUBLE) / CAST(t AS DOUBLE) <= 0.8 THEN 'A'
                    WHEN CAST(c AS DOUBLE) / CAST(t AS DOUBLE) <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum, tot
    )
    SELECT abc_class,
           count(*) AS n_parts,
           floor(CAST(sum(r) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS class_revenue
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    doc="ABC / Pareto inventory classification: parts ranked by exact "
    "decimal revenue, classified A/B/C at the 80%/95% cumulative-share "
    "marks. The global running sum uses bucketed prefix summation "
    "(operators.scale.bucketed_prefix_sum) — quantile buckets, one "
    "(bucket, sum) driver collect, within-bucket decimal cumsum + "
    "exact offsets — never a single-partition global window; the "
    "decimal accumulation keeps every cumulative value bit-identical "
    "to the oracle's window form.",
)
def parts_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_prefix_sum

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("r")
    )
    rev = rev.withColumn("neg_r", (-F.col("r")).cast(dict(rev.dtypes)["r"]))
    total = rev.agg(F.sum("r").alias("t"))
    cum = bucketed_prefix_sum(
        rev, "neg_r", "r", tiebreaks=("l_partkey",), out_col="c"
    )
    share = F.col("c").cast("double") / F.col("t").cast("double")
    classed = cum.join(F.broadcast(total)).select(
        "l_partkey",
        "r",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            det_round(F.sum("r").cast("double"), 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# ------------------------------------------------- data-quality checks


@register(
    "dq_checks_orders",
    oracle="""
    SELECT 'duplicate_orderkeys' AS check_name,
           (SELECT count(*) FROM (
               SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
           )) AS n_violations
    UNION ALL
    SELECT 'null_custkey', (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'orphan_custkey',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'nonpositive_totalprice', (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'bad_status_domain',
           (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    UNION ALL
    SELECT 'orderdate_out_of_range',
           (SELECT count(*) FROM orders
            WHERE o_orderdate < TIMESTAMP '1992-01-01'
               OR o_orderdate > TIMESTAMP '2030-01-01')
    ORDER BY check_name
    """,
    doc="Data-quality assertion suite (the dbt-test pattern as one "
    "engine op): uniqueness (duplicate keys), completeness (null "
    "keys), referential integrity (orders→customer via LEFT ANTI "
    "join — never a driver-side loop), domain validity, and range "
    "checks, each reported as a (check, violation-count) row. Every "
    "check is a filter-aggregate or anti-join: map-side partial "
    "counts, broadcastable dimension side, no shuffles beyond the "
    "anti-join and the duplicate-key groupBy — the shape that audits "
    "a 100 TB table in one pass per check family.",
)
def dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")

    def one(name: str, df) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    dups = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    orphans = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
    )
    checks = [
        one("duplicate_orderkeys", dups),
        one("null_custkey", orders.filter(F.col("o_custkey").isNull())),
        one("orphan_custkey", orphans),
        one("nonpositive_totalprice", orders.filter(F.col("o_totalprice") <= 0)),
        one(
            "bad_status_domain",
            orders.filter(~F.col("o_orderstatus").isin("O", "F", "P")),
        ),
        one(
            "orderdate_out_of_range",
            orders.filter(
                (F.col("o_orderdate") < "1992-01-01")
                | (F.col("o_orderdate") > "2030-01-01")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


# ------------------------------------------------- period-over-period


@register(
    "revenue_yoy_growth",
    oracle=f"""
    WITH yearly AS (
        SELECT l_returnflag,
               CAST(year(l_shipdate) AS INT) AS yr,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY l_returnflag, year(l_shipdate)
    )
    SELECT l_returnflag, yr,
           floor(revenue * 100.0 + 0.5) / 100.0 AS revenue,
           {sql_det_round("CASE WHEN lag(revenue) OVER w IS NULL THEN NULL "
                          "ELSE (revenue - lag(revenue) OVER w) / lag(revenue) OVER w END", 6)} AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY yr)
    ORDER BY l_returnflag, yr
    """,
    doc="Year-over-year growth per return flag: yearly exact-decimal "
    "revenue rollup, then lag() over the TINY aggregated table (one "
    "row per flag-year — the window runs on the rollup, never the "
    "fact table). The period-over-period shape every reporting "
    "workload needs; growth ratios divide identical doubles on both "
    "engines.",
)
def revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        "l_returnflag", F.year("l_shipdate").cast("int").alias("yr")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue")
    )
    w = W.partitionBy("l_returnflag").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return (
        yearly.select(
            "l_returnflag",
            "yr",
            det_round(F.col("revenue"), 2).alias("revenue"),
            det_round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
        )
        .orderBy("l_returnflag", "yr")
    )


# ------------------------------------------ point-in-time (PIT) join


@register(
    "events_pit_dimension_join",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
        SELECT user_id, event_type AS state_type, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               row_number() OVER w AS version
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT f.event_id, f.user_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(d.version AS INT)              AS state_version,
           d.state_type
    FROM events f
    JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    WHERE f.event_type = 'purchase'
    ORDER BY f.event_id
    """,
    doc="Point-in-time join of purchase facts to the SCD2 user-state "
    "dimension: each fact matches the ONE version whose "
    "(valid_from, valid_to] interval covers its timestamp. The join "
    "is an equi-join on user_id with the interval predicate as a "
    "residual condition — facts and versions co-partition on the "
    "user key, so at 100 TB this is one co-located shuffle, never an "
    "interval cross-product. Completes the SCD2 story: build "
    "(events_scd2_history) + temporally-correct consumption.",
)
def events_pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("state_type"), "ts")
    )
    w2 = W.partitionBy("user_id").orderBy("ts")
    dim = (
        changes.withColumn("valid_to", F.lead("ts").over(w2))
        .withColumn("version", F.row_number().over(w2).cast("int"))
        .select(
            F.col("user_id").alias("d_user_id"),
            "version",
            "state_type",
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase")
    return (
        facts.join(
            dim,
            (facts["user_id"] == dim["d_user_id"])
            & (dim["valid_from"] <= facts["ts"])
            & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"])),
        )
        .select(
            "event_id",
            "user_id",
            F.date_format(facts["ts"], "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.col("version").alias("state_version"),
            "state_type",
        )
        .orderBy("event_id")
    )


# ------------------------------------------------- cohort LTV curve


@register(
    "events_cohort_ltv",
    oracle=f"""
    WITH first_seen AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    labeled AS (
        SELECT e.user_id,
               date_trunc('week', f.first_ts) AS cohort_week,
               CAST(floor(epoch(e.ts - date_trunc('week', f.first_ts)) / 604800.0) AS INT) AS week_index,
               e.value
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    ),
    weekly AS (
        SELECT cohort_week, week_index,
               {sql_sum2('value')} AS revenue
        FROM labeled GROUP BY cohort_week, week_index
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_index,
           round(revenue, 2) AS revenue,
           round(CAST(sum(CAST(revenue AS DECIMAL(18,2)))
                     OVER (PARTITION BY cohort_week ORDER BY week_index
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
               AS cum_revenue
    FROM weekly
    ORDER BY cohort_week, week_index
    """,
    doc="Cohort LTV curve: users cohorted by first-seen week, purchase "
    "revenue bucketed by weeks-since-cohort, cumulative revenue per "
    "cohort as a running decimal sum over the TINY weekly rollup "
    "(the window runs on cohort×week rows, never the fact table). "
    "The lifetime-value report every growth team maintains.",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    labeled = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, ["user_id"])
        .select(
            F.date_trunc("week", "first_ts").alias("cohort_week"),
            F.floor(
                (
                    F.unix_timestamp("ts")
                    - F.unix_timestamp(F.date_trunc("week", "first_ts"))
                )
                / 604800.0
            )
            .cast("int")
            .alias("week_index"),
            "value",
        )
    )
    weekly = labeled.groupBy("cohort_week", "week_index").agg(
        exact_sum2("value").alias("revenue")
    )
    w = (
        W.partitionBy("cohort_week")
        .orderBy("week_index")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return weekly.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_index",
        F.round(F.col("revenue"), 2).alias("revenue"),
        F.round(
            F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("cum_revenue"),
    ).orderBy("cohort_week", "week_index")


# ------------------------------------------- conversion-delay percentiles


@register(
    "events_time_to_convert",
    oracle=f"""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY e.user_id
    ),
    delays AS (
        SELECT CAST(epoch_us(p.first_purchase_ts - s.signup_ts) AS DOUBLE) / 3600e6 AS delay_h
        FROM s JOIN p ON s.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           {sql_det_round('quantile_cont(delay_h, 0.50)', 4)} AS p50_hours,
           {sql_det_round('quantile_cont(delay_h, 0.90)', 4)} AS p90_hours
    FROM delays
    """,
    doc="Time-to-convert distribution: per user the delay from first "
    "signup to first subsequent purchase (exact µs arithmetic), then "
    "exact median/p90 of the delay in hours. Two tiny keyed "
    "aggregates + one join on the user key; the percentile runs over "
    "one row per converted user.",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, ["user_id"])
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    delays = s.join(p, ["user_id"]).select(
        (
            (
                F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
            ).cast("double")
            / F.lit(3600e6)
        ).alias("delay_h")
    )
    return delays.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        det_round(F.percentile("delay_h", F.lit(0.50)), 4).alias("p50_hours"),
        det_round(F.percentile("delay_h", F.lit(0.90)), 4).alias("p90_hours"),
    )


# --------------------------------------------- FIFO inventory matching


@register(
    "lineitem_fifo_allocation",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_orderkey, l_linenumber,
               CAST(l_quantity AS DECIMAL(18,2)) AS qty,
               sum(CAST(l_quantity AS DECIMAL(18,2)))
                   OVER (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        FROM lineitem WHERE l_returnflag = 'N'
    ),
    demand AS (
        SELECT l_partkey, l_orderkey, l_linenumber,
               CAST(l_quantity AS DECIMAL(18,2)) AS qty,
               sum(CAST(l_quantity AS DECIMAL(18,2)))
                   OVER (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d1
        FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT d.l_partkey,
           d.l_orderkey AS demand_order, d.l_linenumber AS demand_line,
           s.l_orderkey AS supply_order, s.l_linenumber AS supply_line,
           CAST(least(d.d1, s.s1) - greatest(d.d1 - d.qty, s.s1 - s.qty) AS DOUBLE) AS alloc_qty
    FROM demand d JOIN supply s
      ON d.l_partkey = s.l_partkey
     AND s.s1 - s.qty < d.d1
     AND d.d1 - d.qty < s.s1
    ORDER BY d.l_partkey, demand_order, demand_line, supply_order, supply_line
    """,
    doc="FIFO inventory allocation: returned-demand lines ('R') match "
    "supply lines ('N') per part in ship-date order WITHOUT any "
    "sequential loop — each side gets an exact-decimal cumulative "
    "interval [cum−qty, cum) and the allocation is the interval "
    "OVERLAP, found by an equi-join on the part key with the overlap "
    "predicate residual. One window + one co-keyed join; per-part "
    "fan-out is bounded by lines-per-part. The matching shape behind "
    "FIFO costing, order fulfilment, and lot tracking.",
)
def lineitem_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )

    def side(flag: str, cum: str):
        return (
            li.filter(F.col("l_returnflag") == flag)
            .select(
                "l_partkey",
                "l_orderkey",
                "l_linenumber",
                F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).alias(cum),
            )
        )

    s = side("N", "s1").select(
        F.col("l_partkey").alias("s_part"),
        F.col("l_orderkey").alias("supply_order"),
        F.col("l_linenumber").alias("supply_line"),
        F.col("qty").alias("s_qty"),
        "s1",
    )
    d = side("R", "d1")
    return (
        d.join(
            s,
            (d["l_partkey"] == s["s_part"])
            & (s["s1"] - s["s_qty"] < d["d1"])
            & (d["d1"] - d["qty"] < s["s1"]),
        )
        .select(
            "l_partkey",
            F.col("l_orderkey").alias("demand_order"),
            F.col("l_linenumber").alias("demand_line"),
            "supply_order",
            "supply_line",
            (
                F.least(d["d1"], s["s1"])
                - F.greatest(d["d1"] - d["qty"], s["s1"] - s["s_qty"])
            )
            .cast("double")
            .alias("alloc_qty"),
        )
        .orderBy("l_partkey", "demand_order", "demand_line", "supply_order", "supply_line")
    )


# ------------------------------------------- multi-touch attribution


@register(
    "events_linear_attribution",
    oracle=f"""
    WITH pairs AS (
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               c.user_id, CAST(p.value AS DECIMAL(18,2)) AS purchase_value
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ),
    weighted AS (
        SELECT click_id, user_id,
               CAST(purchase_value AS DOUBLE)
                   / count(*) OVER (PARTITION BY purchase_id) AS credit
        FROM pairs
    )
    SELECT click_id, user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           {sql_det_round(
               'CAST(sum(CAST(floor(credit * 1000000.0 + 0.5) / 1000000.0'
               ' AS DECIMAL(27,6))) AS DOUBLE)', 4)} AS attributed_value
    FROM weighted
    GROUP BY click_id, user_id
    ORDER BY click_id
    """,
    doc="Linear multi-touch attribution: each purchase's value splits "
    "equally across the same-user clicks in the preceding hour "
    "(interval join on the user key), credit = value / touch-count "
    "via a window over the purchase — per-click totals are "
    "det_round+decimal-summed. The marketing-attribution shape, "
    "keyed end to end (no pair blowup beyond the interval join).",
)
def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(18,2)").alias("purchase_value"),
    )
    pairs = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    w = W.partitionBy("purchase_id")
    weighted = pairs.select(
        "click_id",
        "user_id",
        (
            F.col("purchase_value").cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("credit"),
    )
    return (
        weighted.groupBy("click_id", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            det_round(
                F.sum(det_round(F.col("credit"), 6).cast("decimal(27,6)")).cast(
                    "double"
                ),
                4,
            ).alias("attributed_value"),
        )
        .orderBy("click_id")
    )


# ------------------------------------------------- join-key skew stats


@register(
    "join_key_skew_stats",
    oracle=f"""
    WITH ok AS (
        SELECT count(*) AS f FROM lineitem GROUP BY l_orderkey
    ),
    pk AS (
        SELECT count(*) AS f FROM lineitem GROUP BY l_partkey
    ),
    uk AS (
        SELECT count(*) AS f FROM events GROUP BY user_id
    )
    SELECT 'events.user_id' AS key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(f) AS BIGINT) AS max_freq,
           {sql_det_round('CAST(sum(f) AS DOUBLE) / count(*)', 4)} AS avg_freq,
           {sql_det_round('CAST(max(f) AS DOUBLE) / (CAST(sum(f) AS DOUBLE) / count(*))', 4)} AS skew_ratio
    FROM uk
    UNION ALL
    SELECT 'lineitem.l_orderkey', CAST(count(*) AS BIGINT), CAST(max(f) AS BIGINT),
           {sql_det_round('CAST(sum(f) AS DOUBLE) / count(*)', 4)},
           {sql_det_round('CAST(max(f) AS DOUBLE) / (CAST(sum(f) AS DOUBLE) / count(*))', 4)}
    FROM ok
    UNION ALL
    SELECT 'lineitem.l_partkey', CAST(count(*) AS BIGINT), CAST(max(f) AS BIGINT),
           {sql_det_round('CAST(sum(f) AS DOUBLE) / count(*)', 4)},
           {sql_det_round('CAST(max(f) AS DOUBLE) / (CAST(sum(f) AS DOUBLE) / count(*))', 4)}
    FROM pk
    ORDER BY key_name
    """,
    doc="Join-key skew diagnostics — the planner-advisor query behind "
    "salting decisions: per candidate join key, distinct-key count, "
    "max and mean per-key frequency, and the max/mean skew ratio "
    "(≈1 ⇒ uniform, ≫1 ⇒ salt or AQE-split). One map-side-combined "
    "count per key family; exact integer frequencies.",
)
def join_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")

    def stats(df, col: str, label: str) -> DataFrame:
        f = df.groupBy(col).agg(F.count(F.lit(1)).alias("f"))
        avg = F.sum("f").cast("double") / F.count(F.lit(1))
        return f.agg(
            F.lit(label).alias("key_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("f").cast("bigint").alias("max_freq"),
            det_round(avg, 4).alias("avg_freq"),
            det_round(F.max("f").cast("double") / avg, 4).alias("skew_ratio"),
        )
    out = stats(ev, "user_id", "events.user_id")
    for df, col, label in (
        (li, "l_orderkey", "lineitem.l_orderkey"),
        (li, "l_partkey", "lineitem.l_partkey"),
    ):
        out = out.unionByName(stats(df, col, label))
    return out.orderBy("key_name")


# ------------------------------------------------- diversified top-k


@register(
    "orders_diversified_topk",
    oracle="""
    WITH ranked AS (
        SELECT n.n_name, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY n.n_name
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn_nation
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, o_orderkey, round(o_totalprice, 2) AS totalprice, rn_nation
    FROM ranked
    WHERE rn_nation <= 2
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Diversified top-k (result diversification): the global top-10 "
    "orders subject to a max-2-per-nation quota — per-nation "
    "row_number prunes to ≤2·nations candidates FIRST (one keyed "
    "window), then a TakeOrdered top-10 over the tiny candidate set; "
    "never a global sort of the fact table. The quota-constrained "
    "ranking shape of search and recommendation backends.",
)
def orders_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # customer scales with SF (150k x SF): no explicit broadcast —
    # AQE decides; nation is a fixed 25-row dim, broadcast stays
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    w = W.partitionBy("n_name").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        joined.select(
            "n_name",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn_nation"),
        )
        .filter(F.col("rn_nation") <= 2)
        .select(
            "n_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn_nation",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ------------------------------------------------- business-day latency


@register(
    "orders_shipping_busdays",
    oracle=f"""
    WITH lat AS (
        SELECT o.o_orderpriority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS days,
               dayofweek(o.o_orderdate) AS dow0
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    ),
    bus AS (
        SELECT o_orderpriority,
               5 * (days // 7)
               + len(list_filter(range(1, days % 7 + 1),
                     d -> ((dow0 + d) % 7) NOT IN (0, 6))) AS busdays
        FROM lat
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(max(busdays) AS INT) AS max_busdays,
           {sql_det_round('CAST(sum(CAST(busdays AS DECIMAL(18,0))) AS DOUBLE) / count(*)', 4)} AS avg_busdays
    FROM bus
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Business-day shipping latency per order priority: weekends "
    "excluded by pure integer calendar arithmetic — 5·(weeks) plus a "
    "per-remainder-day weekday test, with the day-of-week convention "
    "explicitly aligned between engines (Spark's 1=Sunday mapped to "
    "DuckDB's 0=Sunday). Map-side expression + one broadcast-joined "
    "rollup; exact integer day counts, decimal-exact mean.",
)
def orders_shipping_busdays(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = (
        # plain equi-join: orders is FACT-scale (never an explicit
        # broadcast — that hint forces the whole table into every
        # executor at any SF); AQE picks broadcast only when it fits
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
                "days"
            ),
            # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek:
            # 0=Sunday..6=Saturday — subtract 1 to share the convention
            (F.dayofweek(F.to_date("o_orderdate")) - 1).alias("dow0"),
        )
    )
    bus = lat.select(
        "o_orderpriority",
        (
            5 * (F.col("days") / 7).cast("int")
            # sequence(1, 0) yields DESCENDING [1, 0] in Spark, not an
            # empty array — guard the zero-remainder case explicitly
            + F.size(
                F.filter(
                    F.when(
                        F.col("days") % 7 > 0,
                        F.sequence(F.lit(1), F.col("days") % 7),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda d: ~((F.col("dow0") + d) % 7).isin(0, 6),
                )
            )
        ).alias("busdays"),
    )
    return (
        bus.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.max("busdays").cast("int").alias("max_busdays"),
            det_round(
                F.sum(F.col("busdays").cast("decimal(18,0)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_busdays"),
        )
        .orderBy("o_orderpriority")
    )


# ------------------------------------------- weighted order statistics


@register(
    "weighted_quantiles_quantity",
    oracle="""
    WITH w AS (
        SELECT l_quantity AS v,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS wt
        FROM lineitem
    ),
    tot AS (SELECT sum(wt) AS tw FROM w),
    cum AS (
        SELECT v, sum(wt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c
        FROM w
    )
    SELECT (SELECT min(v) FROM cum, tot WHERE 2 * c >= tw)  AS w_median,
           (SELECT min(v) FROM cum, tot WHERE 10 * c >= 9 * tw) AS w_p90,
           (SELECT CAST(tw AS DOUBLE) FROM tot) AS total_weight
    """,
    doc="Weighted median and weighted p90 of l_quantity with "
    "l_extendedprice weights: the smallest value whose cumulative "
    "weight crosses p·W. The global running weight uses "
    "operators.scale.bucketed_prefix_sum (quantile buckets + exact "
    "decimal offsets — never a single-partition window), and the "
    "crossing test is an EXACT decimal comparison (2·cum ≥ W, "
    "10·cum ≥ 9·W) — no float threshold, so the quantiles are "
    "hash-identical however ties are ordered.",
)
def weighted_quantiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_prefix_sum

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("v"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    tot = li.agg(F.sum("wt").alias("tw"))
    cum = bucketed_prefix_sum(
        li, "v", "wt", tiebreaks=("l_orderkey", "l_linenumber"), out_col="c"
    )
    crossed = cum.crossJoin(F.broadcast(tot))
    # BOTH crossing thresholds from ONE aggregate pass — separate
    # filter+agg subtrees would execute the prefix-sum frame (window +
    # bucket join over all of lineitem) once per quantile
    return crossed.agg(
        F.min(F.when(F.lit(2) * F.col("c") >= F.col("tw"), F.col("v"))).alias(
            "w_median"
        ),
        F.min(
            F.when(F.lit(10) * F.col("c") >= F.lit(9) * F.col("tw"), F.col("v"))
        ).alias("w_p90"),
        F.first("tw").cast("double").alias("total_weight"),
    )


# ------------------------------------------- rolling distinct actives


@register(
    "events_rolling_wau",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d0 FROM events
    ),
    contrib AS (
        SELECT user_id, CAST(d0 + k * INTERVAL 1 DAY AS DATE) AS d
        FROM active, unnest(generate_series(0, 6)) AS t(k)
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    SELECT days.d AS day,
           CAST(count(DISTINCT contrib.user_id) AS BIGINT) AS n_active_7d
    FROM days JOIN contrib ON contrib.d = days.d
    GROUP BY days.d
    ORDER BY day
    """,
    doc="Rolling 7-day active users per day (the WAU curve): the naive "
    "form is COUNT(DISTINCT) over a sliding window — undistributable. "
    "Scale shape: dedupe to (user, active-day) once, fan each row out "
    "to the ≤7 trailing window-days it contributes to (map-only "
    "explode), then one distinct-count per day keyed on the day — "
    "shuffle volume is 7× the (user, day) rollup, never the raw "
    "events, and no window function appears at all.",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    active = events.select(
        "user_id", F.col("ts").cast("date").alias("d0")
    ).distinct()
    contrib = active.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "d0",
    ).select("user_id", F.expr("date_add(d0, k)").alias("d"))
    days = events.select(F.col("ts").cast("date").alias("d")).distinct()
    return (
        days.join(contrib, "d")
        .groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active_7d"))
        .orderBy("day")
    )


# ------------------------------------------- VARIANT semi-structured


@register(
    "variant_props_typed",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
           floor(median(k) * 10000.0 + 0.5) / 10000.0 AS median_k,
           CAST(count(*) AS BIGINT) AS n_missing_null,
           'OBJECT<k: BIGINT>' AS variant_schema
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Semi-structured analytics on Spark 4's VARIANT type: "
    "events.props parses ONCE into a binary-encoded variant "
    "(parse_json), then typed paths extract without re-parsing — "
    "variant_get for the present field, try_variant_get proving "
    "missing paths yield NULL (counted), schema_of_variant pinning "
    "the inferred object shape. The oracle reproduces the typed "
    "extraction with DuckDB JSON operators and pins the variant "
    "schema string — the engine's semi-structured fast path, "
    "hash-checked.",
)
def variant_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "v", F.parse_json(F.col("props"))
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("try_variant_get(v, '$.missing', 'int')")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct(k).cast("bigint").alias("n_distinct_k"),
            det_round(F.median(k), 4).alias("median_k"),
            F.count(F.when(missing.isNull(), 1)).cast("bigint").alias("n_missing_null"),
            F.any_value(F.expr("schema_of_variant(v)")).alias("variant_schema"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- governance: masked view


@register(
    "secure_masked_view",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 1, 2) || '***' AS name_masked,
           CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_band,
           c_mktsegment
    FROM customer
    WHERE c_mktsegment <> 'BUILDING'
    ORDER BY c_custkey
    """,
    doc="Column masking + row-level security as a governed view: "
    "c_name truncates to a 2-char prefix, account balance "
    "generalizes to a 1000-unit band (k-anonymity-style "
    "coarsening), and the restricted segment's rows are filtered "
    "out entirely — the masked SELECT registered as a temp view and "
    "queried through spark.sql, so consumers never touch raw "
    "columns. Both the predicate and the projection reach the scan "
    "(pushed filter + pruned columns); masking is deterministic "
    "string/integer arithmetic ⇒ hash-green.",
)
def secure_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    masked = cust.filter(F.col("c_mktsegment") != "BUILDING").select(
        "c_custkey",
        F.concat(F.substring("c_name", 1, 2), F.lit("***")).alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000.0) * 1000)
        .cast("bigint")
        .alias("acctbal_band"),
        "c_mktsegment",
    )
    masked.createOrReplaceTempView("customer_masked_v")
    return spark.sql(
        "SELECT * FROM customer_masked_v ORDER BY c_custkey"
    )


# --------------------------------------------- inline observed metrics


@register(
    "observed_metrics_shipments",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    """,
    doc="Inline pipeline observability via Spark's Observation API: "
    "the ETL filter runs ONCE, and audit metrics (row count, "
    "discounted-line count, exact-decimal quantity sum) are "
    "harvested from the SAME pass by observe() — no second scan, no "
    "separate audit query; the accumulator-style metrics ride the "
    "action. This is how production ETL asserts volumes without "
    "doubling I/O; the oracle recomputes the metrics relationally.",
)
def observed_metrics_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    ob = Observation("shipments_audit")
    observed = li.observe(
        ob,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(F.when(F.col("l_discount") > 0.05, 1))
        .cast("bigint")
        .alias("n_discounted"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
    )
    observed.write.format("noop").mode("overwrite").save()  # one real pass
    m = ob.get
    # an empty slice reports total_qty as None (sum over zero rows):
    # surface the same NULL the oracle emits instead of a TypeError
    tq = float(m["total_qty"]) if m["total_qty"] is not None else None
    return local_df(
        spark,
        [(int(m["n_rows"]), int(m["n_discounted"]), tq)],
        "n_rows long, n_discounted long, total_qty double",
    )


# --------------------------------------------- price-volume bridge


@register(
    "revenue_price_volume_bridge",
    oracle=f"""
    WITH yearly AS (
        SELECT CAST(year(l_shipdate) AS INT) AS yr,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS vol,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        FROM lineitem GROUP BY year(l_shipdate)
    ),
    paired AS (
        SELECT yr, vol, rev,
               lag(vol) OVER (ORDER BY yr) AS vol0,
               lag(rev) OVER (ORDER BY yr) AS rev0
        FROM yearly
    )
    SELECT yr,
           {sql_det_round('rev - rev0', 2)} AS delta_revenue,
           {sql_det_round('(vol - vol0) * (rev0 / vol0)', 2)} AS volume_effect,
           {sql_det_round('vol * (rev / vol - rev0 / vol0)', 2)} AS price_effect
    FROM paired WHERE vol0 IS NOT NULL
    ORDER BY yr
    """,
    doc="Price-volume bridge (the FP&A revenue-change decomposition): "
    "Δrevenue between consecutive years split into a volume effect "
    "(Δvolume at old average price) and a price effect (new volume × "
    "Δaverage price) — the two sum to Δrevenue by construction. One "
    "exact-decimal year rollup; the lag runs over the calendar-"
    "bounded year table; effects are identical IEEE closed forms ⇒ "
    "hash-green bridge.",
)
def revenue_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    yearly = li.groupBy(F.year("l_shipdate").cast("int").alias("yr")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("vol"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("rev"),
    )
    w = W.orderBy("yr")
    paired = yearly.select(
        "yr",
        "vol",
        "rev",
        F.lag("vol").over(w).alias("vol0"),
        F.lag("rev").over(w).alias("rev0"),
    ).filter(F.col("vol0").isNotNull())
    p0 = F.col("rev0") / F.col("vol0")
    return paired.select(
        "yr",
        det_round(F.col("rev") - F.col("rev0"), 2).alias("delta_revenue"),
        det_round((F.col("vol") - F.col("vol0")) * p0, 2).alias("volume_effect"),
        det_round(F.col("vol") * (F.col("rev") / F.col("vol") - p0), 2).alias(
            "price_effect"
        ),
    ).orderBy("yr")


# --------------------------------------------- quantile transform


@register(
    "quantile_transform_acctbal",
    oracle="""
    WITH r AS (
        SELECT c_custkey, c_acctbal,
               row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn,
               count(*) OVER () AS n
        FROM customer
    )
    SELECT c_custkey,
           round(c_acctbal, 2) AS acctbal,
           (floor((CAST(rn AS DOUBLE) - 0.5) / n * 1000000.0 + 0.5) / 1000000.0) AS quantile
    FROM r
    ORDER BY c_custkey
    """,
    doc="Quantile transform (the sklearn QuantileTransformer / "
    "rank-gauss preprocessor): every balance maps to its empirical "
    "quantile (rank − ½)/n with a deterministic key tiebreak. The "
    "global ranking uses operators.scale.bucketed_global_row_number "
    "— quantile-bucketed parallel numbering, never a single-"
    "partition window — so the transform scales to any corpus while "
    "the oracle's plain window form pins every value.",
)
def quantile_transform_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n = bucketed_global_row_number(
        cust, "c_acctbal", tiebreaks=("c_custkey",), out_col="rn"
    )
    return ranked.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        det_round(
            (F.col("rn").cast("double") - F.lit(0.5)) / F.lit(float(n)), 6
        ).alias("quantile"),
    ).orderBy("c_custkey")


# ------------------------------------------------------- robust means


@register(
    "orders_robust_means",
    oracle=f"""
    WITH v AS (
        SELECT o_totalprice AS p,
               CAST(o_totalprice AS DECIMAL(18,2)) AS pd,
               o_orderkey
        FROM orders
    ),
    n_tot AS (SELECT count(*) AS n FROM v),
    ranked AS (
        SELECT pd, row_number() OVER (ORDER BY p, o_orderkey) AS rn FROM v
    ),
    trimmed AS (
        SELECT CAST(sum(r.pd) AS DOUBLE) AS s, count(*) AS m
        FROM ranked r, n_tot
        WHERE r.rn > floor(0.05 * n_tot.n) AND r.rn <= n_tot.n - floor(0.05 * n_tot.n)
    )
    SELECT CAST(n_tot.n AS BIGINT) AS n_orders,
           {sql_det_round('CAST((SELECT sum(pd) FROM v) AS DOUBLE) / n_tot.n', 2)} AS mean,
           {sql_det_round('exp(' + sql_sum_r6('ln(p)') + ' / n_tot.n)', 2)} AS geometric_mean,
           {sql_det_round('n_tot.n / ' + sql_sum_r6('1.0 / p'), 2)} AS harmonic_mean,
           (SELECT {sql_det_round('s / m', 2)} FROM trimmed) AS trimmed_mean_5pct
    FROM v CROSS JOIN n_tot
    GROUP BY n_tot.n
    """,
    doc="The four classical location estimators of order value in one "
    "row: arithmetic (exact decimal sum), geometric (exp of det_round"
    "+decimal-summed logs), harmonic (reciprocal sums, same "
    "discipline), and the 5%-two-sided trimmed mean — whose rank "
    "filter uses operators.scale.bucketed_global_row_number, never a "
    "single-partition window, making the order-statistic estimator "
    "scale-safe. All four hash-green.",
)
def orders_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("p"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("pd"),
        "o_orderkey",
    )
    ranked, n = bucketed_global_row_number(
        orders, "p", tiebreaks=("o_orderkey",), out_col="rn"
    )
    cut = int(0.05 * n)
    trimmed = ranked.filter(
        (F.col("rn") > cut) & (F.col("rn") <= n - cut)
    ).agg(
        (F.sum("pd").cast("double") / F.count(F.lit(1))).alias("tm")
    )
    base = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("pd").cast("double") / F.count(F.lit(1))).alias("am"),
        F.exp(
            exact_sum_r6(F.log(F.col("p"))) / F.count(F.lit(1))
        ).alias("gm"),
        (
            F.count(F.lit(1)).cast("double")
            / exact_sum_r6(F.lit(1.0) / F.col("p"))
        ).alias("hm"),
    )
    return base.crossJoin(F.broadcast(trimmed)).select(
        "n_orders",
        det_round(F.col("am"), 2).alias("mean"),
        det_round(F.col("gm"), 2).alias("geometric_mean"),
        det_round(F.col("hm"), 2).alias("harmonic_mean"),
        det_round(F.col("tm"), 2).alias("trimmed_mean_5pct"),
    )


# --------------------------------------------- revenue recognition


@register(
    "revenue_recognition_schedule",
    oracle="""
    WITH sched AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               date_trunc('month', CAST(o_orderdate AS DATE)) AS m0,
               unnest(generate_series(0, 2)) AS k
        FROM orders
    ),
    alloc AS (
        SELECT o_orderkey,
               CAST(m0 + to_months(CAST(k AS INT)) AS DATE) AS month,
               CASE WHEN k = 0 THEN cents - 2 * (cents // 3)
                    ELSE cents // 3 END AS rec_cents
        FROM sched
    )
    SELECT strftime(month, '%Y-%m') AS month,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(sum(rec_cents) AS DECIMAL(28,0)) AS DOUBLE) / 100.0 AS recognized
    FROM alloc
    GROUP BY month
    ORDER BY month
    """,
    doc="Deferred-revenue recognition schedule: each order's total "
    "spreads over 3 months in exact INTEGER cents — two equal "
    "floor-to-cent installments plus a first-month remainder "
    "installment (cents − 2·⌊cents/3⌋), so Σ == o_totalprice EXACTLY (the "
    "reconciliation auditors require; float splits never reconcile). "
    "Map-only 3× month explode, one month-key shuffle; the monthly "
    "ledger is hash-green because the allocation is integer-cent "
    "arithmetic.",
)
def revenue_recognition_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    sched = orders.select(
        "o_orderkey",
        cents.alias("cents"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("m0"),
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"),
    )
    third = F.floor(F.col("cents") / 3).cast("bigint")
    alloc = sched.select(
        "o_orderkey",
        F.add_months(F.col("m0"), F.col("k")).alias("month"),
        F.when(F.col("k") == 0, F.col("cents") - F.lit(2) * third)
        .otherwise(third)
        .alias("rec_cents"),
    )
    return (
        alloc.groupBy(F.date_format("month", "yyyy-MM").alias("month"))
        .agg(
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
            (
                F.sum("rec_cents").cast("decimal(28,0)").cast("double")
                / F.lit(100.0)
            ).alias("recognized"),
        )
        .orderBy("month")
    )


# --------------------------------------------- segment migration


@register(
    "customer_segment_migration",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CASE WHEN year(o_orderdate) <= 1998 THEN 'p1' ELSE 'p2' END AS period,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM orders
        GROUP BY o_custkey, CASE WHEN year(o_orderdate) <= 1998 THEN 'p1' ELSE 'p2' END
    ),
    cuts AS (
        SELECT period,
               quantile_disc(s, 0.25) AS q1,
               quantile_disc(s, 0.50) AS q2,
               quantile_disc(s, 0.75) AS q3
        FROM spend GROUP BY period
    ),
    seg AS (
        SELECT spend.o_custkey, spend.period,
               CASE WHEN s <= q1 THEN 1 WHEN s <= q2 THEN 2
                    WHEN s <= q3 THEN 3 ELSE 4 END AS tier
        FROM spend JOIN cuts USING (period)
    )
    SELECT a.tier AS tier_p1, b.tier AS tier_p2,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM (SELECT o_custkey, tier FROM seg WHERE period = 'p1') a
    JOIN (SELECT o_custkey, tier FROM seg WHERE period = 'p2') b USING (o_custkey)
    GROUP BY a.tier, b.tier
    ORDER BY tier_p1, tier_p2
    """,
    doc="Customer segment-migration matrix (the BI churn/upsell "
    "screen): customers tiered into spend quartiles independently in "
    "two periods (exact discrete percentile cut points — a broadcast "
    "3-value row per period, never a global ntile window), then the "
    "4×4 transition matrix counts who moved where. Exact integer "
    "counts over one custkey-keyed self-join ⇒ hash-green.",
)
def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy(
        "o_custkey",
        F.when(F.year("o_orderdate") <= 1998, "p1").otherwise("p2").alias("period"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"))
    cuts = spend.groupBy("period").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY s)").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY s)").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY s)").alias("q3"),
    )
    seg = spend.join(F.broadcast(cuts), "period").select(
        "o_custkey",
        "period",
        F.when(F.col("s") <= F.col("q1"), 1)
        .when(F.col("s") <= F.col("q2"), 2)
        .when(F.col("s") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("tier"),
    )
    p1 = seg.filter(F.col("period") == "p1").select("o_custkey", F.col("tier").alias("tier_p1"))
    p2 = seg.filter(F.col("period") == "p2").select("o_custkey", F.col("tier").alias("tier_p2"))
    return (
        p1.join(p2, "o_custkey")
        .groupBy("tier_p1", "tier_p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("tier_p1", "tier_p2")
    )


# --------------------------------------------- repeat-purchase gaps


@register(
    "orders_interpurchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w,
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           floor(median(gap_days) * 10000.0 + 0.5) / 10000.0 AS median_days,
           CAST(quantile_disc(gap_days, 0.90) AS BIGINT) AS p90_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM gaps WHERE gap_days IS NOT NULL
    """,
    doc="Repeat-purchase behaviour: the distribution of gaps between "
    "a customer's consecutive orders (lag over ONE o_custkey "
    "exchange, integer day arithmetic), summarized by exact "
    "min/median/p90/max. The reorder-cycle metric behind "
    "replenishment forecasting and churn-risk windows; all order "
    "statistics exact ⇒ hash-green.",
)
def orders_interpurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        det_round(F.median("gap_days"), 4).alias("median_days"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY gap_days)")
        .cast("bigint")
        .alias("p90_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )
