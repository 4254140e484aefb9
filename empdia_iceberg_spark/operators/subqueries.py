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

from empdia_iceberg_spark.functions.exact import det_round, exact_sum2, sql_det_round, sql_sum2
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
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
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
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > SESSION_GAP_US),
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
