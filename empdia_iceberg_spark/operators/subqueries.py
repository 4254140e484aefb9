"""Subquery decorrelation shapes (SURVEY.md §2.B relational core:
EXISTS / NOT EXISTS / NOT IN / correlated scalar subqueries) plus
batch sessionization.

TPC-H q4/q13/q16/q17/q22/q2 are the canonical subquery benchmarks; the
schemas here lack partsupp and commit/receipt dates, so the shapes are
adapted to the driver tables while keeping each query's defining
feature (the subquery kind and its decorrelation):

- EXISTS            → left-semi join with a non-equi conjunct (q4)
- NOT EXISTS/NOT IN → left-anti join (q22, q16)
- correlated scalar → aggregate-then-join-back (q17, q2)
- uncorrelated scalar → 1-row aggregate cross-joined broadcast (q22)

Determinism notes: scalar-subquery thresholds never divide — the
comparisons are multiplied out into exact DECIMAL arithmetic so both
engines compare identical exact values (no double-division boundary
flips). Money sums use the exact.py decimal-sum helpers.

Scale notes (100 TB posture): every subquery decorrelates into an
equi-join that shuffles on its natural key (orderkey / partkey /
custkey) with map-side partial aggregation; the 1-row scalar aggregates
and the filtered supplier exclusion list are driver-known-small →
explicit ``broadcast``. Sessionization partitions by user_id — no
global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from empdia_iceberg_spark.functions.exact import (
    det_round,
    exact_sum2,
    exact_sum8,
    sql_det_round,
    sql_sum2,
    sql_sum8,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

_Q4_LO, _Q4_HI = "1997-07-01", "1997-10-01"


@register(
    "q4_priority_exists",
    oracle=f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q4_HI}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H-Q4 shape: EXISTS with a correlated non-equi conjunct → "
    "left-semi join (l_orderkey = o_orderkey AND l_shipdate > "
    "o_orderdate). The date filter is pushed into the orders scan; the "
    "semi join shuffles on orderkey and short-circuits per probe row.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q13_custdist",
    oracle="""
    WITH co AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM co
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H-Q13: distribution of per-customer order counts via a "
    "LEFT join with a compound ON condition (the filter must stay in "
    "the join, not a WHERE — customers with only urgent orders count "
    "as 0). Two shuffles: custkey join+agg, then the tiny count-of-"
    "counts rollup.",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    co = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


@register(
    "q16_supplier_part_counts",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN {_Q16_SIZES}
      -- NOT EXISTS form: NULL-safe, matches the Spark left-anti join
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_acctbal < 0 AND s.s_suppkey = l_suppkey)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H-Q16 shape (lineitem stands in for partsupp): NOT IN "
    "subquery → broadcast left-anti join against the filtered supplier "
    "exclusion list, then a distinct-count rollup. The part dim filter "
    "is broadcast; the only big shuffle is the distinct aggregation on "
    "the group keys.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(*_Q16_SIZES)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    WITH th AS (
        SELECT l_partkey AS pk,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               count(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_det_round(f"{sql_sum2('l_extendedprice')} / 7.0", 2)} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN th ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
    """,
    doc="TPC-H-Q17: correlated scalar AVG subquery (l_quantity < "
    "0.2·avg over the same part) decorrelated into a per-part "
    "aggregate joined back on partkey. The threshold comparison is "
    "multiplied out (qty·5·cnt < Σqty) so it is exact DECIMAL "
    "arithmetic on both engines — no double-division boundary. One "
    "partkey shuffle for the aggregate, one for the join-back "
    "(AQE-broadcast at small SF); final 1-row reduce.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    th = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(th, li.l_partkey == th.pk)
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(det_round(exact_sum2("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q22_RECENT = "2000-01-01"


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH pos AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
               count(*) AS n_pos
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_Q22_RECENT}')
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-H-Q22 shape: customers with above-average positive balance "
    "and no recent orders, rolled up by nation. The uncorrelated scalar AVG is "
    "a 1-row aggregate cross-joined broadcast, with the comparison "
    "multiplied out (bal·n > Σbal) for exact decimal determinism; NOT "
    "EXISTS is a left-anti join on custkey; nation is broadcast.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_RECENT).cast("timestamp"))
        .select("o_custkey")
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,2)") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH best AS (
        SELECT l_partkey AS pk, min(l_extendedprice) AS best_price
        FROM lineitem GROUP BY l_partkey
    )
    SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
           l_extendedprice AS best_price
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN best     ON pk = l_partkey AND l_extendedprice = best_price
    WHERE p_size <= 3
    ORDER BY p_partkey, s_suppkey
    """,
    doc="TPC-H-Q2 shape (lineitem stands in for partsupp): correlated "
    "MIN subquery — for each small part, the supplier(s) offering the "
    "minimum extended price — decorrelated into a per-part min joined "
    "back on (partkey, price). MIN of a double is order-independent, "
    "so the equality join is exact. part/supplier dims broadcast; "
    "DISTINCT collapses equal-price duplicate offers.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    supp = load(spark, sf_dir, "supplier")
    best = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("best_price")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            best,
            (li.l_partkey == best.pk) & (li.l_extendedprice == best.best_price),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("l_extendedprice").alias("best_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


# ------------------------------------------------------- sessionization

SESSION_GAP_US = 8 * 3600 * 1_000_000  # 8 hours, in microseconds


@register(
    "events_sessionize_8h",
    oracle=f"""
    WITH marks AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marks
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT)            AS session_seq,
           CAST(count(*) AS BIGINT)               AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    doc="Batch sessionization: gap-based session assignment (a new "
    "session starts after an 8h silence) via lag + running sum of "
    "session-start marks, then a per-session rollup. Gap arithmetic is "
    "integer microseconds (unix_micros / epoch_us) — no fractional-"
    "second double drift between engines. All windows partition by "
    "user_id (ordered by ts with event_id tiebreak) — no global "
    "window; the rollup shuffles on (user_id, session_seq).",
)
def events_sessionize_8h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load(spark, sf_dir, "events"), SESSION_GAP_US)


def sessionize(ev: DataFrame, gap_us: int) -> DataFrame:
    """Gap-based session assignment + per-session rollup over a frame
    with (user_id, ts, event_id) columns. Property-tested invariants:
    sessions partition each user's events in time order; consecutive
    events within a session are ≤ gap apart; each session starts >
    gap after the previous session's last event."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marks.select(
        "user_id",
        "ts",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_seq"),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("bigint").alias("session_seq"),
            "n_events",
            "session_start",
            "session_end",
        )
        .orderBy("user_id", "session_seq")
    )


# ------------------------------------------- join-heavy TPC-H battery

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_det_round(sql_sum8('volume'), 2)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
            OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H-Q7: bilateral shipping volume between two nations by "
    "year — a 5-way join where the disjunctive nation-pair predicate "
    "can only be applied AFTER both nation joins. Both nation copies "
    "broadcast; the fact-side joins shuffle on their natural keys and "
    "the date filter is pushed into the lineitem scan.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2)
    ) | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(det_round(exact_sum8(F.col("volume")), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_NUM = sql_sum8("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END")
_Q8_DEN = sql_sum8("volume")


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_n AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region    ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    SELECT o_year,
           {sql_det_round(_Q8_NUM + ' / ' + _Q8_DEN, 6)} AS mkt_share
    FROM all_n
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H-Q8: a nation's market share of PROMO-part volume sold "
    "into ASIA by order year — an 8-way join with conditional "
    "aggregation (share = Σ volume·[nation] / Σ volume, both sums "
    "exact decimal). All dims broadcast; only customer/orders/lineitem "
    "shuffle.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            det_round(exact_sum8(num) / exact_sum8(F.col("volume")), 6).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@register(
    "q9_profit_by_nation",
    oracle=f"""
    SELECT nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_det_round(
               sql_sum8('l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity'),
               2)} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN (SELECT n_nationkey, n_name AS nation FROM nation) n
      ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H-Q9 shape: profit by supplier nation and order year for "
    "parts matching a name pattern. The schema has no partsupp, so "
    "supply cost is the synthetic 0.5·p_retailprice·l_quantity — the "
    "join topology (part-filter → lineitem → supplier/orders/nation) "
    "and the per-row profit expression are the Q9 features. Profit "
    "sums use the decimal(28,8) discipline.",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(det_round(exact_sum8(F.col("profit")), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
          AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {sql_det_round('CAST(total_revenue AS DOUBLE)', 2)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H-Q15: the top supplier(s) by quarterly revenue — a scalar "
    "MAX-of-aggregate subquery. Revenues are exact decimal sums, so "
    "the max-equality comparison is exact on both engines; the 1-row "
    "max cross-joins broadcast against the per-supplier revenue table.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,8)")
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            det_round(F.col("total_revenue").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey = 3
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE val * 500 > (SELECT sum(val) FROM pv)
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H-Q11 shape (lineitem stands in for partsupp): parts whose "
    "inventory value from nation-3 suppliers exceeds 1/500 of the "
    "total — a scalar subquery in HAVING position over the same "
    "aggregate. Decorrelated into one partkey aggregate reused for "
    "both sides, with the 1-row grand total cross-joined broadcast; "
    "the fraction test is multiplied out (val·500 > Σval) so it is "
    "exact decimal on both engines.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3).select("s_suppkey")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val"))
    )
    tot = pv.agg(F.sum("val").alias("total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val") * 500 > F.col("total"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H-Q21 shape (l_returnflag='R' stands in for the late-"
    "delivery predicate): suppliers solely responsible for a problem "
    "on a multi-supplier finalized order — the double correlated "
    "EXISTS + NOT EXISTS. Decorrelated into a left-semi join (another "
    "supplier exists on the order) followed by a left-anti join (no "
    "OTHER supplier has a returned line), both shuffling on orderkey "
    "with a non-equi suppkey<>suppkey conjunct; supplier dim "
    "broadcasts.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("l3_orderkey"),
            F.col("l_suppkey").alias("l3_suppkey"),
        )
    )
    return (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )

_Q12_LO, _Q12_HI = "1996-01-01", "1997-01-01"
_Q12_LATE_DAYS = 60
_HIGH_PRIO = ("1-URGENT", "2-HIGH")


@register(
    "q12_late_priority_counts",
    oracle=f"""
    SELECT l_returnflag AS ship_group,
           CAST(sum(CASE WHEN o_orderpriority IN {_HIGH_PRIO} THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN {_HIGH_PRIO} THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
      AND l_shipdate >= TIMESTAMP '{_Q12_LO}'
      AND l_shipdate <  TIMESTAMP '{_Q12_HI}'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H-Q12 shape (l_returnflag stands in for l_shipmode; "
    f"shipped ≥{_Q12_LATE_DAYS} days after the order date stands in "
    "for receipt>commit — the driver lineitem has no commit/receipt "
    "dates): late lines per ship group with the two-way conditional "
    "priority counts. The year filter is pushed into the lineitem "
    "scan; the late predicate is a non-equi join conjunct evaluated "
    "during the orderkey shuffle join; the final rollup is 3 groups.",
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin(*_HIGH_PRIO)
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (
                li.l_shipdate
                >= orders.o_orderdate + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAYS")
            ),
        )
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_group")
    )


_Q20_LO, _Q20_HI = "1996-01-01", "1997-01-01"
_Q20_PREFIX = "red"
_Q20_SHARE = 0.5  # dominant-supplier share; exact binary fraction on purpose


@register(
    "q20_dominant_suppliers",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS s_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PREFIX}%')
          AND l_shipdate >= TIMESTAMP '{_Q20_LO}'
          AND l_shipdate <  TIMESTAMP '{_Q20_HI}'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey, sum(s_qty) AS t_qty FROM ps GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM ps JOIN tot USING (l_partkey)
                        WHERE s_qty > {_Q20_SHARE} * t_qty)
    ORDER BY s_name, s_suppkey
    """,
    doc="TPC-H-Q20 shape (lineitem shipped quantities stand in for "
    "partsupp availability): suppliers that shipped more than half of "
    "some matching part's total 1996 volume — the nested IN-subqueries "
    "with a correlated scalar-aggregate comparison. Decorrelation: the "
    "part name filter broadcasts into the lineitem scan, per-(part,"
    "supp) partial sums shuffle once on partkey, the per-part total "
    "reuses that layout, and the dominant-supplier keys semi-join into "
    "the supplier dim. Quantities are integral doubles, so the sums "
    "and the power-of-two share comparison are exact in both engines.",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_Q20_PREFIX))
        .select("p_partkey")
    )
    ps = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("s_qty"))
    )
    # Per-part total via a window over the (part, supp) partial sums —
    # one pass instead of an aggregate-then-join-back that would make
    # Spark recompute the whole ps subtree on both sides of the join.
    t_qty = F.sum("s_qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        ps.withColumn("t_qty", t_qty)
        .filter(F.col("s_qty") > F.lit(_Q20_SHARE) * F.col("t_qty"))
        .select("l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .orderBy("s_name", "s_suppkey")
    )


@register(
    "events_session_window_batch",
    oracle=f"""
    WITH marks AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marks
    ),
    per_session AS (
        SELECT user_id, session_seq, count(*) AS n FROM sess
        GROUP BY user_id, session_seq
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Batch sessionization via the BUILT-IN session_window (the same "
    "API the streaming path uses, running in batch): per-user 8h-gap "
    "sessions aggregated to (n_sessions, n_events, largest session). "
    "session_window opens a new session when the gap is >= the "
    "timeout (the oracle's islands formulation mirrors that "
    "boundary); state is the standard (user, window) aggregation "
    "keyed shuffle. Complements the manual gaps-and-islands "
    "sessionize — same answer, zero window functions in the Spark "
    "plan.",
)
def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", "8 hours").alias("sw")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.max("n").cast("bigint").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@register(
    "lateral_top2_per_customer",
    oracle="""
    WITH rich AS (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > 9000
    )
    SELECT r.c_custkey,
           round(r.c_acctbal, 2) AS acctbal,
           t.o_orderkey,
           round(t.o_totalprice, 2) AS totalprice
    FROM rich r,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = r.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2
    ) t
    ORDER BY r.c_custkey, t.o_orderkey
    """,
    doc="Explicit LATERAL correlated subquery (the SQL-standard "
    "form of per-probe top-k): for each high-balance customer, the "
    "lateral derived table returns their 2 most expensive orders. "
    "Catalyst decorrelates this into the same keyed window shape as "
    "window_rank_topk_per_customer — asserted by the identical "
    "result against DuckDB's native LATERAL execution; no "
    "row-at-a-time re-execution survives in the physical plan.",
)
def lateral_top2_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cust.filter(F.col("c_acctbal") > 9000).createOrReplaceTempView("rich_cust")
    orders.createOrReplaceTempView("orders_for_lateral")
    return spark.sql(
        """
        SELECT r.c_custkey,
               round(r.c_acctbal, 2) AS acctbal,
               t.o_orderkey,
               round(t.o_totalprice, 2) AS totalprice
        FROM rich_cust r,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders_for_lateral o
            WHERE o.o_custkey = r.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 2
        ) t
        ORDER BY r.c_custkey, t.o_orderkey
        """
    )
