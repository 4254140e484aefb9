"""Window-function operators (SURVEY.md §2.B windows row): ranking,
analytic lag/lead, running aggregates with row frames, trailing-k
windows (the same machinery the reference's termination predicates
R30-R32 use), ntile, first/last.

All window orderings carry a unique tiebreak column so results are
deterministic and hash-comparable against the DuckDB oracle.

Scale note: every window here partitions by a high-cardinality key
(custkey/user_id) — at 100 TB the shuffle is one exchange per query,
and AQE coalesces the post-shuffle partitions. No global (unpartitioned)
windows are used anywhere in the engine's hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


@register(
    "window_rank_topk_per_customer",
    oracle="""
    WITH w AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               rank()       OVER (PARTITION BY o_custkey ORDER BY round(o_totalprice, 2) DESC)   AS rnk,
               dense_rank() OVER (PARTITION BY o_custkey ORDER BY round(o_totalprice, 2) DESC)   AS drnk
        FROM orders
    )
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn, rnk, drnk
    FROM w WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Per-group top-k via row_number/rank/dense_rank (BASELINE window_rank headline).",
)
def window_rank_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w_unique = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_price = W.partitionBy("o_custkey").orderBy(F.round("o_totalprice", 2).desc())
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_price).alias("rnk"),
            F.dense_rank().over(w_price).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_lag_lead_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           round(lag(o_totalprice)  OVER w, 2) AS prev_total,
           round(lead(o_totalprice) OVER w, 2) AS next_total,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Analytic lag/lead over per-customer order history (R38 lag-feature machinery).",
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lag_total = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round(lag_total, 2).alias("prev_total"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_total"),
        F.round(F.col("o_totalprice") - F.coalesce(lag_total, F.col("o_totalprice")), 2).alias(
            "delta"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_running_max_events",
    oracle="""
    SELECT user_id, event_id,
           round(value, 2) AS value,
           round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_max,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_sum
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Running max/sum per user (reference R27 deepest-layer running max, Spark-general).",
)
def window_running_max_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(F.max("value").over(w), 2).alias("running_max"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("running_sum"),
    ).orderBy("user_id", "event_id")


@register(
    "window_trailing_frame_events",
    oracle="""
    SELECT user_id, event_id,
           count(*)            OVER w AS trailing_n,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / count(*) OVER w * 10000.0 + 0.5) / 10000.0 AS trailing_avg,
           round(min(value) OVER w, 2) AS trailing_min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="Trailing-6 row frame per user — the exact frame shape of termination predicate R31.",
)
def window_trailing_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-5, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        det_round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            4,
        ).alias("trailing_avg"),
        F.round(F.min("value").over(w), 2).alias("trailing_min"),
    ).orderBy("user_id", "event_id")


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="ntile(4) bucketing by order value (deterministic via orderkey "
    "tiebreak). Scale-safe: global position via quantile-bucketed "
    "parallel row numbering (operators/scale.py) + the ntile arithmetic "
    "— no single-partition global window.",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import (
        bucketed_global_row_number,
        ntile_from_row_number,
    )

    orders = load(spark, sf_dir, "orders")
    numbered, n = bucketed_global_row_number(
        orders, "o_totalprice", tiebreaks=("o_orderkey",)
    )
    return numbered.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        ntile_from_row_number(F.col("_rn"), n, 4).alias("quartile"),
    ).orderBy("o_orderkey")


@register(
    "window_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           count(*)                OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
    doc="first/last-in-order per customer. Implemented as ONE hash "
    "aggregate (min_by/max_by on the (date, key) ordering struct) — the "
    "plan a sort-window + distinct would only emulate at higher cost.",
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    order_key = F.struct("o_orderdate", "o_orderkey")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", order_key).alias("first_order"),
            F.max_by("o_orderkey", order_key).alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@register(
    "window_range_frame_value",
    oracle="""
    SELECT user_id, event_id, round(value, 2) AS value,
           count(*) OVER (PARTITION BY user_id ORDER BY value
                          RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS peers_within_10
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="RANGE frame with a numeric bound: events within value-distance 10, per user.",
)
def window_range_frame_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("value").rangeBetween(-10, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.count(F.lit(1)).over(w).alias("peers_within_10"),
    ).orderBy("user_id", "event_id")


@register(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT user_id, event_id,
           floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
           floor(cume_dist()    OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    ORDER BY user_id, event_id
    """,
    doc="percent_rank + cume_dist per user (relative-position analytics; "
    "partitioned windows, no global sort).",
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        det_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        det_round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------- exponential smoothing
#
# EWMA-16: trailing exponentially-weighted moving average with α = 1/2
# truncated at 16 lags. With α = 1/2 the weight of lag k is 2^-k, so
# the truncation error is ≤ max|x|·2^-16 — and because every term is a
# 2-decimal value times a power of two, the whole sum is EXACT integer
# arithmetic: x·2^-k = (100x)·5^k / 10^(k+2), so over the common
# denominator 10^18 each term is the integer (100x)·5^k·10^(16-k)
# (≤ ~3e20, well inside DECIMAL(38,0) / HUGEINT). Both engines fold the
# same integers, convert ONCE to double, and divide by 1e18 — one IEEE
# division each, bit-identical. No pow() of non-representable bases
# anywhere: 5^k ≤ 5^16 and 10^(16-k) ≤ 10^15 are both < 2^53, so
# power() returns them exactly.
#
# Scale: one hash exchange on user_id; per-row state is a bounded
# 16-element frame, so memory is O(1) per row regardless of history
# length — the shape that survives unbounded per-user event counts
# (an untruncated closed-form EWMA via (1-α)^-i prefix products
# overflows doubles past ~1000 rows per user; the truncated frame
# never does, and for α = 1/2 lag-17+ weights are below one ulp of
# realistic values anyway).

_EWMA16 = """
  CAST(aggregate(
    transform(vals, (v, i) ->
      CAST(floor(v * 100 + 0.5) AS DECIMAL(38,0))
      * CAST(power(5, size(vals) - i) AS DECIMAL(38,0))
      * CAST(power(10, 16 - (size(vals) - i)) AS DECIMAL(38,0))),
    CAST(0 AS DECIMAL(38,0)),
    (acc, t) -> acc + t) AS DOUBLE) / 1e18
"""


# shared with streaming/ewma.py: the stateful-streaming twin must
# reproduce this batch answer exactly, so both register the same oracle
EWMA16_ORACLE = """
    WITH e AS (
        SELECT event_id, user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    terms AS (
        SELECT n.event_id, n.user_id,
               CAST(floor(i.value * 100 + 0.5) AS HUGEINT)
               * CAST(power(5, n.rn - i.rn + 1) AS HUGEINT)
               * CAST(power(10, 16 - (n.rn - i.rn + 1)) AS HUGEINT) AS term
        FROM e n JOIN e i
          ON i.user_id = n.user_id AND i.rn BETWEEN n.rn - 15 AND n.rn
    )
    SELECT event_id, user_id,
           (floor((CAST(sum(term) AS DOUBLE) / 1e18) * 1000000.0 + 0.5) / 1000000.0) AS ewma16
    FROM terms
    GROUP BY event_id, user_id
    ORDER BY event_id
    """


@register(
    "events_ewma16_user",
    oracle=EWMA16_ORACLE,
    doc="Per-user trailing EWMA (α=1/2, 16 lags) over the event value "
    "series: collect_list over a bounded rows-frame window, then an "
    "exact integer fold — (100x)·5^k·10^(16-k) over denominator 1e18 "
    "— so the smoothed value is bit-identical across engines and "
    "partitionings. One user_id exchange, O(1) state per row.",
)
def events_ewma16_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    frame = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-15, 0)
    return (
        events.select(
            "event_id",
            "user_id",
            F.collect_list(F.col("value")).over(frame).alias("vals"),
        )
        .select(
            "event_id",
            "user_id",
            det_round(F.expr(_EWMA16), 6).alias("ewma16"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------- gaps and islands


@register(
    "events_longest_streaks",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grouped AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
        FROM marked
    ),
    streaks AS (
        SELECT user_id, event_type, island,
               count(*) AS streak_len, min(ts) AS start_ts
        FROM grouped GROUP BY user_id, event_type, island
    ),
    ranked AS (
        SELECT user_id, event_type, streak_len, start_ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY streak_len DESC, start_ts, event_type) AS rn
        FROM streaks
    )
    SELECT user_id, event_type,
           CAST(streak_len AS BIGINT) AS streak_len,
           strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS start_ts
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Gaps-and-islands: longest consecutive same-event_type run per "
    "user. Change markers (lag) and island ids (running sum) come "
    "from TWO windows over the SAME user_id partitioning — one "
    "exchange — then a per-island rollup and a top-1 pick. The "
    "value-change-island shape every funnel/streak analysis needs.",
)
def events_longest_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    grouped = marked.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("island"),
    )
    streaks = grouped.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("ts").alias("start_ts")
    )
    w2 = W.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), "start_ts", "event_type"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("streak_len").cast("bigint").alias("streak_len"),
            F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------- CUSUM drift scan


@register(
    "events_cusum_drift",
    oracle="""
    WITH mu AS (
        SELECT CAST(floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                           / count(*)) * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS mu
        FROM events
    ),
    pref AS (
        SELECT e.event_id, e.user_id, e.ts,
               sum(CAST(e.value AS DECIMAL(18,2)) - m.mu)
                   OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM events e CROSS JOIN mu m
    ),
    runmin AS (
        SELECT event_id, user_id, p,
               min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        FROM pref
    )
    SELECT event_id, user_id,
           CAST(p - least(mn, 0) AS DOUBLE) AS cusum,
           (CAST(p - least(mn, 0) AS DOUBLE) > 500.0) AS drifted
    FROM runmin
    ORDER BY event_id
    """,
    doc="One-sided CUSUM drift detection per user: s_n = max(0, "
    "s_{n-1} + (x_n − μ)) computed in CLOSED FORM as P_n − min_{j≤n} "
    "P_j over exact decimal prefix sums — two window functions over "
    "ONE user_id exchange, O(1) state per row, instead of a "
    "sequential fold over per-user history (which would hold O(n) "
    "state and break at unbounded history). μ is the det-rounded "
    "global mean, broadcast; all arithmetic stays in DECIMAL until "
    "one final double cast, so the statistic is bit-deterministic.",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mu = ev.agg(
        det_round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            2,
        )
        .cast("decimal(18,2)")
        .alias("mu")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pref = ev.crossJoin(F.broadcast(mu)).select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)") - F.col("mu")).over(w).alias("p"),
    )
    # second window orders by (ts, event_id) — the SAME chronological
    # order the prefix sums use: ordering the running min by event_id
    # alone silently assumed per-user event_ids are ts-monotone (true
    # of the current generator, an undeclared invariant otherwise), and
    # the CUSUM closed form s_n = P_n - min_j<=n P_j is only the
    # documented statistic when both windows scan the same order.
    # The window still reuses the same user_id partitioning.
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    runmin = pref.select(
        "event_id",
        "user_id",
        "p",
        F.min("p").over(w2).alias("mn"),
    )
    cusum = (F.col("p") - F.least(F.col("mn"), F.lit(0).cast("decimal(18,2)"))).cast(
        "double"
    )
    return runmin.select(
        "event_id",
        "user_id",
        cusum.alias("cusum"),
        (cusum > 500.0).alias("drifted"),
    ).orderBy("event_id")


# ------------------------------------------- sweep-line peak concurrency
#
# Interval concurrency — "how many orders were simultaneously open at
# the worst moment of each month" — via the distributed sweep-line:
# each order contributes a +1 delta at the start of its activity span
# and a −1 the day after it closes (the span is least/greatest over
# orderdate and the order's ship dates, tolerant of out-of-order
# synthetic dates). The deltas collapse to DAY grain in one shuffle,
# so the running-total window operates on a CALENDAR-bounded table
# (one row per active day) no matter how many orders exist — the
# standard trick that keeps prefix sums scale-free. Peak extraction is
# a per-month rank over the same tiny day table.


@register(
    "orders_open_peak_monthly",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey,
               least(o.o_orderdate, min(l.l_shipdate))    AS open_day,
               greatest(o.o_orderdate, max(l.l_shipdate)) AS close_day
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT date_trunc('day', open_day) AS day, 1 AS delta FROM spans
        UNION ALL
        SELECT date_trunc('day', close_day) + INTERVAL 1 DAY AS day, -1 AS delta
        FROM spans
    ),
    daily AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY day
    ),
    open_count AS (
        SELECT day,
               sum(net) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_open
        FROM daily
    ),
    ranked AS (
        SELECT strftime(date_trunc('month', day), '%Y-%m-%d') AS month,
               strftime(day, '%Y-%m-%d') AS peak_day,
               CAST(n_open AS BIGINT) AS peak_open,
               row_number() OVER (PARTITION BY date_trunc('month', day)
                                  ORDER BY n_open DESC, day) AS rn
        FROM open_count
    )
    SELECT month, peak_day, peak_open FROM ranked WHERE rn = 1
    ORDER BY month
    """,
    doc="Peak interval concurrency by month via the distributed "
    "sweep-line: per-order activity spans (least/greatest of order and "
    "ship dates — robust to out-of-order dates) become ±1 deltas, "
    "deltas collapse to day grain in one shuffle, and the running "
    "open-count window runs over the calendar-bounded daily table "
    "(O(#days) rows regardless of order count). Peak day per month "
    "with deterministic earliest-day tiebreak.",
)
def orders_open_peak_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.least(F.col("o_orderdate"), F.min("l_shipdate")).alias("open_day"),
            F.greatest(F.col("o_orderdate"), F.max("l_shipdate")).alias("close_day"),
        )
    )
    deltas = spans.select(
        F.date_trunc("day", "open_day").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            (F.date_trunc("day", "close_day") + F.expr("INTERVAL 1 DAY")).alias(
                "day"
            ),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    open_count = daily.select("day", F.sum("net").over(w).alias("n_open"))
    month = F.date_trunc("month", "day")
    rn = F.row_number().over(
        W.partitionBy(month).orderBy(F.col("n_open").desc(), "day")
    )
    return (
        open_count.select(
            F.date_format(month, "yyyy-MM-dd").alias("month"),
            F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
            F.col("n_open").cast("bigint").alias("peak_open"),
            rn.alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("month")
    )


# ---------------------------------------------------- maximum drawdown
#
# The finance/monitoring metric over each user's irregular value
# series: drawdown(t) = running-peak(value) − value(t); report each
# user's worst drawdown and when it bottomed. value is 2-decimal
# (driver-verified lossless as DECIMAL(18,2)), so peak−value is EXACT
# decimal subtraction — no float tolerance anywhere. One user_id
# exchange shared by the running-max window and the per-user argmax.


@register(
    "events_max_drawdown_user",
    oracle="""
    WITH series AS (
        SELECT user_id, event_id,
               CAST(value AS DECIMAL(18,2)) AS v,
               max(CAST(value AS DECIMAL(18,2)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM events
    ),
    dd AS (
        SELECT user_id, event_id, CAST(peak - v AS DOUBLE) AS drawdown
        FROM series
    )
    SELECT user_id,
           CAST(max(drawdown) AS DOUBLE) AS max_drawdown,
           CAST(arg_min(event_id, lpad(CAST(CAST(floor(100 * (999999.99 - drawdown) + 0.5) AS BIGINT) AS VARCHAR), 12, '0')
                         || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS BIGINT) AS trough_event_id
    FROM dd
    GROUP BY user_id
    HAVING max(drawdown) > 0
    ORDER BY user_id
    """,
    doc="Per-user maximum drawdown over the ts-ordered value series: "
    "running peak via a rows-frame max window, drawdown as EXACT "
    "DECIMAL(18,2) subtraction, per-user worst drawdown plus the "
    "deterministic trough event (earliest event_id at the worst "
    "drawdown, via a zero-padded composite min_by key). The window "
    "and the final aggregate share one user_id exchange.",
)
def events_max_drawdown_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    v = F.col("value").cast("decimal(18,2)")
    series = ev.select(
        "user_id",
        "event_id",
        v.alias("v"),
        F.max(v).over(w).alias("peak"),
    )
    dd = series.select(
        "user_id",
        "event_id",
        (F.col("peak") - F.col("v")).cast("double").alias("drawdown"),
    )
    # deterministic argmin key: worst drawdown first (descending via the
    # 999999.99 complement — drawdown is 2-decimal exact, so 100·x is an
    # exact integer), then earliest event_id
    # floor(x + 0.5), the det_round discipline — a raw double->bigint
    # cast TRUNCATES in Spark but rounds-to-nearest in DuckDB, so a
    # 1-ulp non-integral product would key k-1 vs k across engines
    ordkey = F.concat(
        F.lpad(
            F.floor(F.lit(100) * (F.lit(999999.99) - F.col("drawdown")) + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            12,
            "0",
        ),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        dd.groupBy("user_id")
        .agg(
            F.max("drawdown").cast("double").alias("max_drawdown"),
            F.min_by("event_id", ordkey).cast("bigint").alias("trough_event_id"),
        )
        .filter(F.col("max_drawdown") > 0)
        .orderBy("user_id")
    )


# ------------------------------------------- rolling exact percentiles
#
# Time-based rolling robust statistics: per user, the exact median and
# p90 of `value` over the trailing 7 days (RANGE frame on the event
# time, not a row count — irregular series need time frames). Exact
# windowed percentiles hold one frame in memory per partition; the
# frame is bounded by a user's 7-day event volume (fine for per-entity
# monitoring; the approx-percentile rollups cover the unbounded case).
# Spark's integer-µs rangeBetween and the oracle's INTERVAL frame are
# both closed on [t−7d, t]; interpolation arithmetic over 2-decimal
# values is identical IEEE on both engines.


@register(
    "events_rolling_median_7d",
    oracle="""
    SELECT user_id, event_id,
           (floor(quantile_cont(value, 0.5) OVER w * 10000.0 + 0.5) / 10000.0) AS med_7d,
           (floor(quantile_cont(value, 0.9) OVER w * 10000.0 + 0.5) / 10000.0) AS p90_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="Rolling 7-day exact median and p90 per user over the "
    "irregular event series (RANGE time frame, closed both ends). "
    "One user_id exchange; frame memory is bounded by per-user 7-day "
    "volume. Interpolated quantiles over 2-decimal values are "
    "IEEE-identical across engines; det_round(…,4) closes the "
    "rounding-boundary gap.",
)
def events_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        det_round(F.percentile("value", F.lit(0.5)).over(w), 4).alias("med_7d"),
        det_round(F.percentile("value", F.lit(0.9)).over(w), 4).alias("p90_7d"),
    ).orderBy("user_id", "event_id")
