"""Statistical-inference operators: OLS regression via the normal
equations and a chi-square independence test — the "ANALYZE the
relationship" surface a warehouse bolts onto its aggregates.

Both reduce to the engine's bit-deterministic moment discipline
(`functions/exact.py:moment_sums`): all sufficient statistics are
exact DECIMAL sums accumulated map-side in ONE scan, the closed-form
combination afterwards is pure IEEE arithmetic on identical doubles.
That makes even r² and the chi-square statistic hash-comparable
across engines — no tolerance needed. At 100 TB each operator is one
map-side-combined aggregation (plus, for chi², one tiny contingency
shuffle): the cheapest possible distributed shape for model fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import (
    det_round,
    moment_sums,
    sql_det_round,
    sql_moment_sums,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

# OLS closed forms over the moment sums (identical expression text on
# both engines ⇒ identical IEEE evaluation order):
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
#   intercept = (Σy − slope·Σx) / n
#   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
_SLOPE = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
_INTERCEPT = f"((sy - {_SLOPE} * sx) / n)"
_R2 = (
    "(((n * sxy - sx * sy) * (n * sxy - sx * sy))"
    " / ((n * sxx - sx * sx) * (n * syy - sy * sy)))"
)


@register(
    "ols_quantity_price",
    oracle=f"""
    WITH m AS (
        SELECT {sql_moment_sums('l_quantity', 'l_extendedprice')}
        FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           {sql_det_round(_SLOPE, 6)} AS slope,
           {sql_det_round(_INTERCEPT, 4)} AS intercept,
           {sql_det_round(_R2, 6)} AS r2
    FROM m
    """,
    doc="OLS regression l_extendedprice ~ l_quantity by the normal "
    "equations: one scan accumulates exact decimal moment sums "
    "(map-side partials), the slope/intercept/r² closed forms are "
    "identical IEEE arithmetic on both engines — a hash-checkable "
    "regression fit.",
)
def ols_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    m = li.agg(*moment_sums("l_quantity", "l_extendedprice"))
    return m.select(
        F.col("n").cast("bigint").alias("n_obs"),
        det_round(F.expr(_SLOPE), 6).alias("slope"),
        det_round(F.expr(_INTERCEPT), 4).alias("intercept"),
        det_round(F.expr(_R2), 6).alias("r2"),
    )


# chi² = Σ_cells (observed − expected)² / expected, expected =
# row_total·col_total/grand_total. Every total is an exact integer
# count; each cell's term is the same IEEE expression on both engines,
# det_round(6)-stabilized and decimal-summed (order-independent).
_CHI_TERM = (
    "((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))"
    " * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))"
    " / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE)))"
)


@register(
    "chi2_events_type_dow",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow, count(*) AS o
        FROM events GROUP BY event_type, dayofweek(ts)
    ),
    rt AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY event_type),
    ct AS (SELECT dow, sum(o) AS ct FROM obs GROUP BY dow),
    gt AS (SELECT sum(o) AS gt FROM obs),
    cells AS (
        SELECT obs.event_type, obs.dow, obs.o, rt.rt, ct.ct, gt.gt
        FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN gt
    ),
    terms AS (
        SELECT count(*) AS n_cells,
               CAST(sum(CAST({sql_det_round(_CHI_TERM, 6)} AS DECIMAL(27,6))) AS DOUBLE) AS chi2
        FROM cells
    )
    SELECT CAST(n_cells AS BIGINT) AS n_cells, {sql_det_round('chi2', 4)} AS chi2
    FROM terms
    """,
    doc="Chi-square independence test of event_type × day-of-week: "
    "contingency counts in one tiny shuffle, marginals re-aggregated "
    "from the cells (never a second scan), per-cell terms det_round+"
    "decimal-summed so the statistic hash-matches across engines.",
)
def chi2_events_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    obs = events.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    gt = obs.agg(F.sum("o").alias("gt"))
    cells = (
        obs.join(rt, ["event_type"]).join(ct, ["dow"]).crossJoin(F.broadcast(gt))
    )
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        det_round(
            F.sum(det_round(F.expr(_CHI_TERM), 6).cast("decimal(27,6)")).cast(
                "double"
            ),
            4,
        ).alias("chi2"),
    )


# Welch's t-test closed forms over per-group moment sums. IEEE sqrt is
# correctly rounded by spec, so even the denominator stays
# bit-identical across engines.
@register(
    "welch_t_acctbal_segments",
    oracle=f"""
    WITH g AS (
        SELECT c_mktsegment,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                        * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS ss
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        GROUP BY c_mktsegment
    ),
    w AS (
        SELECT
            max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN n END) AS n1,
            max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN s END) AS s1,
            max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN ss END) AS ss1,
            max(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS n2,
            max(CASE WHEN c_mktsegment = 'BUILDING' THEN s END) AS s2,
            max(CASE WHEN c_mktsegment = 'BUILDING' THEN ss END) AS ss2
        FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_auto, CAST(n2 AS BIGINT) AS n_build,
           {sql_det_round('(s1 / n1 - s2 / n2)', 4)} AS mean_diff,
           {sql_det_round(
               '(s1 / n1 - s2 / n2) / sqrt('
               '((ss1 - s1 * s1 / n1) / (n1 - 1.0)) / n1'
               ' + ((ss2 - s2 * s2 / n2) / (n2 - 1.0)) / n2)', 6)} AS t_stat
    FROM w
    """,
    doc="Welch's two-sample t-test of account balance between the "
    "AUTOMOBILE and BUILDING segments: per-group exact decimal moment "
    "sums in one scan, pivoted into one row; means/variances/t are "
    "identical IEEE closed forms (sqrt is correctly rounded by "
    "IEEE-754) — a hash-checkable significance test.",
)
def welch_t_acctbal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    )
    d = F.col("c_acctbal").cast("decimal(18,2)")
    g = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d).cast("double").alias("s"),
        F.sum(d * d).cast("double").alias("ss"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("c_mktsegment") == seg, F.col(c))).alias(f"{c}{i}")
            for i, seg in ((1, "AUTOMOBILE"), (2, "BUILDING"))
            for c in ("n", "s", "ss")
        ]
    )
    t_expr = (
        "(s1 / n1 - s2 / n2) / sqrt("
        "((ss1 - s1 * s1 / n1) / (n1 - 1.0)) / n1"
        " + ((ss2 - s2 * s2 / n2) / (n2 - 1.0)) / n2)"
    )
    return w.select(
        F.col("n1").cast("bigint").alias("n_auto"),
        F.col("n2").cast("bigint").alias("n_build"),
        det_round(F.expr("s1 / n1 - s2 / n2"), 4).alias("mean_diff"),
        det_round(F.expr(t_expr), 6).alias("t_stat"),
    )


@register(
    "events_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT quantile_cont(value, 0.5) AS med FROM events
    ),
    dev AS (
        SELECT e.value, abs(e.value - m.med) AS d, m.med
        FROM events e CROSS JOIN med m
    ),
    mad AS (
        SELECT any_value(med) AS med, quantile_cont(d, 0.5) AS mad FROM dev
    )
    SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n,
           {sql_det_round('med', 4)} AS median_value,
           {sql_det_round('mad', 4)} AS mad,
           CAST((SELECT count(*) FROM dev, mad
                 WHERE dev.d > 3.0 * 1.4826 * mad.mad) AS BIGINT) AS n_outliers
    FROM mad
    """,
    doc="Robust outlier detection by median absolute deviation: global "
    "exact median (one pass), deviations against the broadcast "
    "median (second pass), MAD and the 3σ-equivalent cut "
    "(3·1.4826·MAD) — the outlier rule that, unlike z-scores, does "
    "not let the outliers inflate their own threshold. All "
    "comparisons are IEEE arithmetic on identical doubles.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select("value")
    med = events.agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = events.crossJoin(F.broadcast(med)).select(
        "value", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.agg(
        F.first("med").alias("med"), F.percentile("d", F.lit(0.5)).alias("mad")
    ).persist()  # 1 row, reused for the threshold count
    outliers = (
        dev.crossJoin(F.broadcast(mad.select(F.col("mad").alias("m2"))))
        .filter(F.col("d") > 3.0 * 1.4826 * F.col("m2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
    )
    n = events.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        n.crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(outliers))
        .select(
            "n",
            det_round(F.col("med"), 4).alias("median_value"),
            det_round(F.col("mad"), 4).alias("mad"),
            "n_outliers",
        )
    )


@register(
    "ols_by_returnflag",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag, {sql_moment_sums('l_quantity', 'l_extendedprice')}
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_obs,
           {sql_det_round(_SLOPE, 6)} AS slope,
           {sql_det_round(_INTERCEPT, 4)} AS intercept,
           {sql_det_round(_R2, 6)} AS r2
    FROM m
    ORDER BY l_returnflag
    """,
    doc="Grouped OLS — one regression PER return flag from a single "
    "grouped moment-sum pass (map-side partial decimal sums, one tiny "
    "shuffle): the GROUP BY model-fitting shape, sharing the exact "
    "closed forms with the global fit.",
)
def ols_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(*moment_sums("l_quantity", "l_extendedprice"))
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_obs"),
        det_round(F.expr(_SLOPE), 6).alias("slope"),
        det_round(F.expr(_INTERCEPT), 4).alias("intercept"),
        det_round(F.expr(_R2), 6).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "revenue_concentration_hhi",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT sum(rev) AS total FROM per_cust),
    shares AS (
        SELECT CAST(p.rev AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
        FROM per_cust p CROSS JOIN tot t
    )
    SELECT CAST((SELECT count(*) FROM per_cust) AS BIGINT) AS n_customers,
           {sql_det_round(
               'CAST(sum(CAST((floor(share * share * 1000000000.0 + 0.5) / 1000000000.0)'
               ' AS DECIMAL(28,9))) AS DOUBLE)', 6)} AS hhi
    FROM shares
    """,
    doc="Herfindahl–Hirschman revenue-concentration index over "
    "customers: exact decimal revenue shares, per-share squared terms "
    "det_round(9)-stabilized and decimal-summed (order-independent), "
    "one aggregate + a broadcast total — the market-concentration "
    "metric as a hash-checkable scalar.",
)
def revenue_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    tot = per_cust.agg(F.sum("rev").alias("total"))
    shares = per_cust.crossJoin(F.broadcast(tot)).select(
        (F.col("rev").cast("double") / F.col("total").cast("double")).alias("share")
    )
    n = per_cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    hhi = shares.agg(
        det_round(
            F.sum(
                det_round(F.col("share") * F.col("share"), 9).cast("decimal(28,9)")
            ).cast("double"),
            6,
        ).alias("hhi")
    )
    return n.crossJoin(F.broadcast(hhi))


@register(
    "corpus_zipf_slope",
    oracle=rf"""
    WITH freq AS (
        SELECT term, count(*) AS f
        FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
              FROM documents)
        GROUP BY term
        ORDER BY f DESC, term
        LIMIT 1000
    ),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, term) AS rnk FROM freq
    ),
    logs AS (
        SELECT {sql_det_round('ln(CAST(rnk AS DOUBLE))', 9)} AS x,
               {sql_det_round('ln(CAST(f AS DOUBLE))', 9)} AS y
        FROM ranked
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(28,9)) * CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(28,9)) * CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS DECIMAL(28,9)) * CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sxy
        FROM logs
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           {sql_det_round(_SLOPE, 6)} AS zipf_slope,
           {sql_det_round(_R2, 6)} AS r2
    FROM m
    """,
    doc="Zipf's-law exponent of the corpus: top-1000 term frequencies "
    "(TakeOrdered — bounded, no global window over the vocabulary), "
    "log-log OLS via det_round(9)-stabilized decimal moment sums — "
    "the corpus-health diagnostic (natural text ⇒ slope ≈ −1) as a "
    "hash-checkable statistic.",
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.col("f").desc(), "term")
        .limit(1000)
    )
    # ranking the top-1000 rows: the input is already LIMIT-bounded, so
    # the single-partition window operates on ≤1000 rows by construction
    ranked = freq.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.col("f").desc(), "term"))
    )
    logs = ranked.select(
        det_round(F.log(F.col("rnk").cast("double")), 9).alias("x"),
        det_round(F.log(F.col("f").cast("double")), 9).alias("y"),
    )
    dx = F.col("x").cast("decimal(28,9)")
    dy = F.col("y").cast("decimal(28,9)")
    m = logs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        det_round(F.expr(_SLOPE), 6).alias("zipf_slope"),
        det_round(F.expr(_R2), 6).alias("r2"),
    )


@register(
    "revenue_gini_customers",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev, o_custkey) AS rnk
        FROM per_cust
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE)                                    AS n,
               CAST(sum(rev) AS DOUBLE)                                    AS total,
               CAST(sum(CAST(rnk AS DECIMAL(38,0)) * CAST(rev AS DECIMAL(38,2))) AS DOUBLE) AS s_ranked
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           {sql_det_round('(2.0 * s_ranked) / (n * total) - (n + 1.0) / n', 6)} AS gini
    FROM m
    """,
    doc="Gini coefficient of customer revenue (the Lorenz-curve "
    "inequality metric): per-customer exact decimal revenue, global "
    "rank via the scale-safe BUCKETED row numbering "
    "(operators/scale.py — no single-partition window over the "
    "customer set), Σ rank·revenue accumulated exactly in DECIMAL, "
    "one closed form — hash-checkable inequality measurement.",
)
def revenue_gini_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    ranked, _n = bucketed_global_row_number(
        per_cust, "rev", tiebreaks=("o_custkey",), out_col="rnk"
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("rev").cast("decimal(18,2)")).cast("double").alias("total"),
        F.sum(
            F.col("rnk").cast("decimal(38,0)")
            * F.col("rev").cast("decimal(38,2)")
        )
        .cast("double")
        .alias("s_ranked"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        det_round(
            F.expr("(2.0 * s_ranked) / (n * total) - (n + 1.0) / n"), 6
        ).alias("gini"),
    )


# Pairwise correlation matrix from ONE moment pass. corr(x,y) =
# (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) — identical
# IEEE closed form on both engines over exact decimal sums.
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_expr(a: str, b: str) -> str:
    return (
        f"((n * s_{a}_{b} - s_{a} * s_{b})"
        f" / sqrt((n * s_{a}_{a} - s_{a} * s_{a})"
        f" * (n * s_{b}_{b} - s_{b} * s_{b})))"
    )


@register(
    "lineitem_corr_matrix",
    oracle=f"""
    WITH m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               {", ".join(f"CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}" for c in _CORR_COLS)},
               {", ".join(f"CAST(sum(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS DOUBLE) AS s_{a}_{b}" for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i:])}
        FROM lineitem
    )
    {" UNION ALL ".join(
        f"SELECT '{a}' AS var_a, '{b}' AS var_b, "
        + sql_det_round(_corr_expr(a, b), 6) + " AS corr FROM m"
        for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
    )}
    ORDER BY var_a, var_b
    """,
    doc="Pairwise Pearson correlation matrix over four lineitem "
    "measures from ONE scan: all 14 moment sums (4 first-order + 10 "
    "second-order) accumulate exactly in a single map-side-combined "
    "aggregate, then each of the 6 correlations is an identical IEEE "
    "closed form — the multi-measure generalization of "
    "stats_exact_moments, hash-checkable with no tolerance.",
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).cast("double").alias(f"s_{c}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(F.sum(dec[a] * dec[b]).cast("double").alias(f"s_{a}_{b}"))
    m = li.agg(*aggs)
    rows = None
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            r = m.select(
                F.lit(a).alias("var_a"),
                F.lit(b).alias("var_b"),
                det_round(F.expr(_corr_expr(a, b)), 6).alias("corr"),
            )
            rows = r if rows is None else rows.unionByName(r)
    # the 1-row moment aggregate is reused by all 6 outputs: cache it so
    # the union does not replicate the lineitem scan per pair
    m.persist()
    return rows.orderBy("var_a", "var_b")
