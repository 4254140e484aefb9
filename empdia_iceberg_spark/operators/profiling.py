"""Table profiling — the `ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS` surface as an engine query: per-column counts, null counts,
exact NDV, min/max, deterministic mean, and an 8-bucket equi-width
histogram, emitted as a long-format (column, metric, value) table.

Two scans, like any stats collector: one all-columns aggregate pass,
then one histogram pass whose bucket bounds come from the broadcast
1-row aggregate (never a driver round-trip into query logic). Bucket
assignment floor((x−min)/(max−min)·8) is pure IEEE arithmetic on
identical doubles, so histogram counts are exact integers on both
engines. At 100 TB this is two map-side-combined scans and two tiny
shuffles — the same cost ANALYZE pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round, sql_sum2
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


@register(
    "profile_orders_stats",
    oracle=f"""
    WITH base AS (
        SELECT CAST(count(*) AS DOUBLE)                          AS n,
               CAST(count(*) - count(o_totalprice) AS DOUBLE)    AS price_nulls,
               CAST(count(DISTINCT o_totalprice) AS DOUBLE)      AS price_ndv,
               CAST(min(o_totalprice) AS DOUBLE)                 AS price_min,
               CAST(max(o_totalprice) AS DOUBLE)                 AS price_max,
               {sql_det_round(sql_sum2('o_totalprice') + ' / count(*)', 4)} AS price_mean,
               CAST(count(DISTINCT o_custkey) AS DOUBLE)         AS cust_ndv,
               CAST(min(o_custkey) AS DOUBLE)                    AS cust_min,
               CAST(max(o_custkey) AS DOUBLE)                    AS cust_max,
               CAST(count(DISTINCT o_orderstatus) AS DOUBLE)     AS status_ndv
        FROM orders
    ),
    hist AS (
        SELECT least(7, CAST(floor((o.o_totalprice - b.price_min)
                                   / (b.price_max - b.price_min) * 8.0) AS INT)) AS bucket,
               CAST(count(*) AS DOUBLE) AS cnt
        FROM orders o, base b
        GROUP BY 1
    ),
    long AS (
        SELECT 'o_totalprice' AS col_name, 'count' AS metric, n AS value FROM base
        UNION ALL SELECT 'o_totalprice', 'nulls', price_nulls FROM base
        UNION ALL SELECT 'o_totalprice', 'ndv', price_ndv FROM base
        UNION ALL SELECT 'o_totalprice', 'min', price_min FROM base
        UNION ALL SELECT 'o_totalprice', 'max', price_max FROM base
        UNION ALL SELECT 'o_totalprice', 'mean', price_mean FROM base
        UNION ALL SELECT 'o_totalprice', 'hist_' || CAST(bucket AS VARCHAR), cnt FROM hist
        UNION ALL SELECT 'o_custkey', 'ndv', cust_ndv FROM base
        UNION ALL SELECT 'o_custkey', 'min', cust_min FROM base
        UNION ALL SELECT 'o_custkey', 'max', cust_max FROM base
        UNION ALL SELECT 'o_orderstatus', 'ndv', status_ndv FROM base
    )
    SELECT col_name, metric, value FROM long
    ORDER BY col_name, metric
    """,
    doc="ANALYZE-style column statistics for orders: counts, nulls, "
    "exact NDV, min/max, deterministic mean, and an 8-bucket "
    "equi-width histogram, as long-format (column, metric, value) "
    "rows. Two scans: one combined aggregate pass, one histogram "
    "pass with broadcast bounds.",
)
def profile_orders_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.functions.exact import exact_sum2

    orders = load(spark, sf_dir, "orders")
    base = orders.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).cast("double").alias(
            "price_nulls"
        ),
        F.countDistinct("o_totalprice").cast("double").alias("price_ndv"),
        F.min("o_totalprice").cast("double").alias("price_min"),
        F.max("o_totalprice").cast("double").alias("price_max"),
        det_round(exact_sum2("o_totalprice") / F.count(F.lit(1)), 4).alias(
            "price_mean"
        ),
        F.countDistinct("o_custkey").cast("double").alias("cust_ndv"),
        F.min("o_custkey").cast("double").alias("cust_min"),
        F.max("o_custkey").cast("double").alias("cust_max"),
        F.countDistinct("o_orderstatus").cast("double").alias("status_ndv"),
    ).localCheckpoint()  # 1 row, reused by the metric emission AND the
    # histogram bounds — localCheckpoint, not persist: a persist here was
    # never unpersisted, leaking one cache entry per invocation across
    # registry sweeps; checkpointed blocks release with the DataFrame

    hist = (
        orders.crossJoin(F.broadcast(base.select("price_min", "price_max")))
        .select(
            F.least(
                F.lit(7),
                F.floor(
                    (F.col("o_totalprice") - F.col("price_min"))
                    / (F.col("price_max") - F.col("price_min"))
                    * 8.0
                ).cast("int"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .select(
            F.lit("o_totalprice").alias("col_name"),
            F.concat(F.lit("hist_"), F.col("bucket").cast("string")).alias("metric"),
            F.col("cnt").alias("value"),
        )
    )

    # ONE stack() over the 1-row aggregate emits all scalar metrics —
    # a single aggregate subtree, so the whole query stays at two
    # scans of orders (aggregate pass + histogram pass).
    scalar_rows = base.select(
        F.expr(
            "stack(10,"
            " 'o_totalprice', 'count', n,"
            " 'o_totalprice', 'nulls', price_nulls,"
            " 'o_totalprice', 'ndv', price_ndv,"
            " 'o_totalprice', 'min', price_min,"
            " 'o_totalprice', 'max', price_max,"
            " 'o_totalprice', 'mean', price_mean,"
            " 'o_custkey', 'ndv', cust_ndv,"
            " 'o_custkey', 'min', cust_min,"
            " 'o_custkey', 'max', cust_max,"
            " 'o_orderstatus', 'ndv', status_ndv"
            ") AS (col_name, metric, value)"
        )
    )
    return scalar_rows.unionByName(hist).orderBy("col_name", "metric")


# --------------------------------------------------- Benford digit audit
#
# Fraud/data-quality screening: the first-significant-digit
# distribution of order totals against Benford's law. The digit is
# extracted from the EXACT cents integer (decimal(18,2)·100 → bigint →
# first character) — no log10 on doubles, so there is no libm boundary
# risk where 1000.00 could land on digit 9 in one engine and 1 in the
# other. Expected shares are shared 17-digit literals (identical
# constant text in both plans). One map-side-combined digit aggregate
# (9 groups) + a broadcast total: a single cheap scan at any scale.

_BENFORD = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_SQL_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD.items())
    + " END"
)


@register(
    "benford_order_totals",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
    ),
    counts AS (
        SELECT digit, CAST(count(*) AS DOUBLE) AS c FROM digits GROUP BY digit
    ),
    tot AS (
        SELECT CAST(sum(c) AS DOUBLE) AS n FROM counts
    ),
    scored AS (
        SELECT digit, c, n, {_BENFORD_SQL_CASE} AS expected
        FROM counts CROSS JOIN tot
    )
    SELECT digit,
           CAST(c AS BIGINT) AS n_orders,
           {sql_det_round('c / n', 6)} AS obs_share,
           {sql_det_round('expected', 6)} AS exp_share,
           {sql_det_round('(c - n * expected) * (c - n * expected) / (n * expected)', 6)} AS chi2_term
    FROM scored ORDER BY digit
    """,
    doc="Benford first-digit audit of o_totalprice: observed vs "
    "expected digit shares and per-digit chi-square contribution. The "
    "leading digit comes from the exact cents integer via string "
    "slicing (never log10 on a double — no cross-libm boundary risk); "
    "expected shares are shared literals. One 9-group map-side "
    "aggregate + broadcast total: one scan at any scale.",
)
def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = counts.agg(F.sum("c").cast("double").alias("n"))
    expected = F.expr(_BENFORD_SQL_CASE)
    scored = counts.crossJoin(F.broadcast(tot)).withColumn("expected", expected)
    return scored.select(
        "digit",
        F.col("c").cast("bigint").alias("n_orders"),
        det_round(F.col("c") / F.col("n"), 6).alias("obs_share"),
        det_round(F.col("expected"), 6).alias("exp_share"),
        det_round(
            (F.col("c") - F.col("n") * F.col("expected"))
            * (F.col("c") - F.col("n") * F.col("expected"))
            / (F.col("n") * F.col("expected")),
            6,
        ).alias("chi2_term"),
    ).orderBy("digit")


# ------------------------------------------ KMV distinct-count sketch
#
# The k-minimum-values cardinality sketch made DETERMINISTIC (and
# therefore fully value-oracled — rare for an "approximate" algorithm):
# hash every key to an exact-dyadic uniform u = hex52(md5)/2^52, keep
# the k smallest distinct u, estimate D ≈ (k−1)/u_(k). Every step is a
# pure function of the key set, so both engines produce the identical
# estimate — the sketch's ±1/√k error is against the TRUE cardinality,
# not between engines.
#
# Scale shape: an adaptive map-side prefilter u ≤ 64k/D̂ (D̂ from
# Spark's built-in HLL approx_count_distinct, one cheap scalar job)
# cuts the stream to ~64k candidate hashes BEFORE the distinct —
# #{u ≤ 64k/D} is Binomial(D, 64k/D), so P(losing a true k-min) is
# astronomically small — then TakeOrdered merges per-partition k-mins:
# the mergeable-sketch layout, never a full-key global sort.

KMV_K = 256


def _kmv_u_sql(col: str, offset: int = 0) -> str:
    """md5-derived exact-dyadic uniform, DuckDB side. THE one shared
    hash-to-uniform construction (52-bit hex prefix / 2^52) — it was
    once written out in four places across profiling/dataprep, and a
    drift in any copy (prefix width, divisor) silently breaks the
    cross-engine hashes. ``offset=1`` gives the (0, 1]-supported
    variant dataprep's Efraimidis-Spirakis keys need (−ln u defined)."""
    off = f" + {offset}" if offset else ""
    return (
        f"((CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 13) AS BIGINT){off})"
        " / 4503599627370496.0)"
    )


def _kmv_u_col(col: str, offset: int = 0):
    """Spark mirror of `_kmv_u_sql` — same 52-bit dyadic uniform."""
    h = F.conv(
        F.md5(F.col(col).cast("string").cast("binary")).substr(1, 13), 16, 10
    ).cast("bigint")
    if offset:
        h = h + F.lit(offset)
    return h / F.lit(4503599627370496.0)


@register(
    "kmv_distinct_orders",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT {_kmv_u_sql('l_orderkey')} AS u FROM lineitem
    ),
    mins AS (
        SELECT u FROM hashes ORDER BY u LIMIT {KMV_K}
    ),
    m AS (
        SELECT max(u) AS u_k, CAST(count(*) AS BIGINT) AS k_used FROM mins
    ),
    x AS (
        SELECT (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS n_exact,
               k_used, u_k
        FROM m
    )
    SELECT n_exact, k_used,
           {sql_det_round(f'({KMV_K} - 1) / u_k', 4)} AS kmv_estimate,
           {sql_det_round(f'(({KMV_K} - 1) / u_k - n_exact) / n_exact', 6)} AS rel_error
    FROM x
    """,
    doc="KMV (k-minimum-values) distinct-count sketch over lineitem "
    "order keys, deterministic end-to-end: md5-derived exact-dyadic "
    "uniforms, k=256 smallest distinct values via TakeOrdered "
    "(per-partition k-mins merged — the mergeable-sketch layout), "
    "estimate (k−1)/u_(k). An adaptive HLL-guided map-side prefilter "
    "bounds the candidate stream at scale. Reported against the exact "
    "cardinality with its relative error — fully hash-checkable.",
)
def kmv_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    u = _kmv_u_col("l_orderkey").alias("u")

    # one cheap scalar job: HLL estimate steers the prefilter threshold
    d_approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("d")
    ).collect()[0]["d"]
    threshold = min(1.0, (64.0 * KMV_K) / max(d_approx, 1))

    hashes = li.select(u).filter(F.col("u") <= F.lit(threshold)).distinct()
    mins = hashes.orderBy("u").limit(KMV_K)
    m = mins.agg(
        F.max("u").alias("u_k"), F.count(F.lit(1)).cast("bigint").alias("k_used")
    )
    n_exact = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_exact")
    )
    est = (F.lit(float(KMV_K - 1)) / F.col("u_k"))
    return (
        m.crossJoin(F.broadcast(n_exact))
        .select(
            "n_exact",
            "k_used",
            det_round(est, 4).alias("kmv_estimate"),
            det_round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_error"
            ),
        )
    )


# ------------------------------------------ KMV sketch set algebra
#
# Theta/KMV-style SET OPERATIONS on sketches (the Datasketches
# "sketch algebra" story): Jaccard overlap of the click-user and
# purchase-user sets estimated from their k-min-value sketches alone —
# union sketch = k smallest of the merged k-mins, intersection share =
# common hashes inside the union sketch's theta region. Deterministic
# md5-dyadic hashing makes the whole pipeline a pure function of the
# key sets, so the ESTIMATE itself is value-oracled (and reported next
# to the exact Jaccard with its error). When a set is smaller than k
# the sketch degrades to exact — the estimator switches by k_used,
# same CASE on both engines.


# (_kmv_u_sql / _kmv_u_col are defined once, above kmv_distinct_orders.)


@register(
    "kmv_set_overlap",
    oracle=f"""
    WITH ah AS (
        SELECT DISTINCT {_kmv_u_sql('user_id')} AS u
        FROM events WHERE event_type = 'click'
    ),
    bh AS (
        SELECT DISTINCT {_kmv_u_sql('user_id')} AS u
        FROM events WHERE event_type = 'purchase'
    ),
    ak AS (SELECT u FROM ah ORDER BY u LIMIT {KMV_K}),
    bk AS (SELECT u FROM bh ORDER BY u LIMIT {KMV_K}),
    un AS (
        SELECT u FROM (SELECT u FROM ak UNION SELECT u FROM bk)
        ORDER BY u LIMIT {KMV_K}
    ),
    th AS (SELECT max(u) AS theta, CAST(count(*) AS BIGINT) AS ku FROM un),
    inter AS (
        SELECT CAST(count(*) AS BIGINT) AS ci
        FROM ak JOIN bk USING (u) CROSS JOIN th WHERE ak.u <= th.theta
    ),
    au AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    bu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    ex AS (
        -- exact baseline over RAW user_ids: computing it over the
        -- 52-bit hashes would collapse colliding ids, so the reported
        -- "exact" Jaccard (and the sketch's error against it) would be
        -- wrong at cardinalities where birthday collisions appear
        SELECT (SELECT count(*) FROM (SELECT user_id FROM au INTERSECT SELECT user_id FROM bu)) AS i,
               (SELECT count(*) FROM (SELECT user_id FROM au UNION SELECT user_id FROM bu)) AS n
    )
    SELECT th.ku AS k_used, inter.ci AS n_common_in_sketch,
           {sql_det_round('CAST(inter.ci AS DOUBLE) / CAST(th.ku AS DOUBLE)', 6)} AS jaccard_kmv,
           {sql_det_round('CAST(ex.i AS DOUBLE) / CAST(ex.n AS DOUBLE)', 6)} AS jaccard_exact
    FROM th CROSS JOIN inter CROSS JOIN ex
    """,
    doc="KMV sketch set algebra: Jaccard overlap of click-users vs "
    "purchase-users estimated from the two k-min-value sketches only "
    "(union sketch = k smallest of the merged k-mins; intersection = "
    "common hashes under theta), reported next to the exact Jaccard. "
    "Deterministic md5-dyadic hashing makes even the estimate "
    "hash-checkable; sketches merge per-partition via TakeOrdered — "
    "the re-aggregatable layout that joins sets WITHOUT re-scanning "
    "either side at 100 TB.",
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")

    def sketch(ev_type: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == ev_type)
            .select(_kmv_u_col("user_id").alias("u"))
            .distinct()
            .orderBy("u")
            .limit(KMV_K)
        )

    ak, bk = sketch("click"), sketch("purchase")
    un = ak.unionByName(bk).distinct().orderBy("u").limit(KMV_K)
    th = un.agg(
        F.max("u").alias("theta"), F.count(F.lit(1)).cast("bigint").alias("ku")
    )
    inter = (
        ak.join(bk, "u")
        .crossJoin(F.broadcast(th))
        .filter(F.col("u") <= F.col("theta"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ci"))
    )

    def uset(ev_type: str) -> DataFrame:
        # RAW user_ids for the exact baseline — hashing first would
        # collapse 52-bit collisions and misstate the sketch's error
        return (
            events.filter(F.col("event_type") == ev_type)
            .select("user_id")
            .distinct()
        )

    ua, ub = uset("click"), uset("purchase")
    ex = (
        ua.join(ub, "user_id")
        .agg(F.count(F.lit(1)).alias("i"))
        .crossJoin(ua.unionByName(ub).distinct().agg(F.count(F.lit(1)).alias("n")))
    )
    return (
        th.crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(ex))
        .select(
            F.col("ku").alias("k_used"),
            F.col("ci").alias("n_common_in_sketch"),
            det_round(F.col("ci").cast("double") / F.col("ku").cast("double"), 6).alias(
                "jaccard_kmv"
            ),
            det_round(F.col("i").cast("double") / F.col("n").cast("double"), 6).alias(
                "jaccard_exact"
            ),
        )
    )
