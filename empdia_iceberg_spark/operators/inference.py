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
    exact_sum_r6,
    moment_sums,
    sql_det_round,
    sql_moment_sums,
    sql_sum_r6,
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
    # localCheckpoint, not persist: the 1-row aggregate is reused by the
    # threshold count AND the final select, but a persist() here is
    # never unpersisted — each invocation would pin a cache entry for
    # the session's lifetime. The checkpointed blocks are released with
    # the DataFrame by GC.
    mad = dev.agg(
        F.first("med").alias("med"), F.percentile("d", F.lit(0.5)).alias("mad")
    ).localCheckpoint()
    # count from the CHECKPOINTED mad row (it carries med too): deriving
    # the threshold filter from `dev` would rebuild dev's lineage and
    # re-run the exact-percentile median pass — the operator's heaviest
    # stage — a second time (no cross-action reuse in Spark)
    outliers = (
        events.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("value") - F.col("med")) > 3.0 * 1.4826 * F.col("mad"))
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
    # the 1-row moment aggregate is reused by all 6 union branches:
    # materialize it ONCE eagerly (localCheckpoint) so the union does
    # not replicate the lineitem scan per pair. Not persist(): a
    # persist here is never unpersisted, so each invocation would pin a
    # cache entry for the session's lifetime; checkpointed blocks are
    # released with the DataFrame by GC.
    m = li.agg(*aggs).localCheckpoint()
    rows = None
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            r = m.select(
                F.lit(a).alias("var_a"),
                F.lit(b).alias("var_b"),
                det_round(F.expr(_corr_expr(a, b)), 6).alias("corr"),
            )
            rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("var_a", "var_b")


# --------------------------------------- Mann-Whitney U (rank-sum test)
#
# Nonparametric two-sample test — the robust complement to
# welch_t_acctbal_segments when the distribution is skewed. All rank
# arithmetic happens at VALUE grain: c_acctbal is a 2-decimal amount in
# a bounded domain, so the distinct-value table is capped by the value
# domain (≤ ~1.1M rows for [-999.99, 9999.99]) NO MATTER how many
# customers there are — the one shuffle is the value-grain groupBy, and
# the rank window runs over the domain-bounded aggregate, never the
# customer set. Mid-ranks are k/2 rationals (exact in DECIMAL(38,1));
# U, the tie-corrected variance, and z are one IEEE closed form over
# exact integer sums — hash-checkable, no tolerance.

_MWU_VAR = (
    "(na * nb / 12.0) * ((nn + 1.0) - tsum / (nn * (nn - 1.0)))"
)
_MWU_Z = f"((ua - na * nb / 2.0) / sqrt({_MWU_VAR}))"


@register(
    "mannwhitney_u_segments",
    oracle=f"""
    WITH pool AS (
        SELECT c_acctbal AS v,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    vals AS (
        SELECT v, CAST(sum(is_a) AS BIGINT) AS ta,
               CAST(count(*) AS BIGINT) AS t
        FROM pool GROUP BY v
    ),
    ranked AS (
        SELECT ta, t,
               sum(t) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - t AS below,
               CAST(t * t * t - t AS DECIMAL(38,0)) AS tie3
        FROM vals
    ),
    m AS (
        SELECT CAST(sum(ta) AS DOUBLE) AS na,
               CAST(sum(t - ta) AS DOUBLE) AS nb,
               CAST(sum(t) AS DOUBLE) AS nn,
               -- integral form: DuckDB DECIMAL division returns DOUBLE,
               -- so the (t+1)/2 half-rank form silently degraded the
               -- whole sum to an order-dependent float sum; doubling
               -- keeps every term integer in DECIMAL(38,0), one exact
               -- halving (a power of two) after the final cast
               CAST(sum(CAST(ta AS DECIMAL(38,0))
                        * (2 * CAST(below AS DECIMAL(38,0))
                           + CAST(t AS DECIMAL(38,0)) + 1)) AS DOUBLE) / 2
                 AS ra,
               CAST(sum(tie3) AS DOUBLE) AS tsum
        FROM ranked
    ),
    u AS (
        SELECT na, nb, nn, tsum,
               ra - na * (na + 1.0) / 2.0 AS ua
        FROM m
    )
    SELECT CAST(na AS BIGINT) AS n_building,
           CAST(nb AS BIGINT) AS n_automobile,
           ua AS u_building,
           na * nb - ua AS u_automobile,
           {sql_det_round(_MWU_Z, 6)} AS z,
           {sql_det_round('1.0 - 2.0 * ua / (na * nb)', 6)} AS rank_biserial
    FROM u
    """,
    doc="Mann-Whitney U rank-sum test comparing c_acctbal between the "
    "BUILDING and AUTOMOBILE segments, with full mid-rank tie handling "
    "and the tie-corrected normal approximation. Ranks are computed on "
    "the value-grain aggregate (distinct 2-decimal balances — domain-"
    "bounded, so the rank window never scales with customer count); "
    "mid-ranks are exact k/2 rationals summed in DECIMAL(38,1); "
    "U / z / rank-biserial effect size are identical IEEE closed forms "
    "on both engines. One value-grain shuffle + a bucketed prefix sum "
    "(`scale.bucketed_prefix_sum`, no partition-less window anywhere): "
    "scale-safe at 100 TB.",
)
def mannwhitney_u_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_prefix_sum

    cust = load(spark, sf_dir, "customer")
    pool = cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    ).select(
        F.col("c_acctbal").alias("v"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("is_a"),
    )
    vals = pool.groupBy("v").agg(
        F.sum("is_a").cast("bigint").alias("ta"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    # cumulative count of strictly-smaller observations per distinct
    # value, via the bucketed prefix sum (quantile buckets of v, one
    # (bucket, sum) driver row each — the spearman_qty_price pattern):
    # no single-partition ORDER BY window even if the value grain grows.
    # The bigint tie counts sum exactly in any order, so the result is
    # partitioning-independent.
    cum = bucketed_prefix_sum(vals, "v", "t", out_col="_cum")
    ranked = cum.select(
        "ta",
        "t",
        (F.col("_cum") - F.col("t")).alias("below"),
        (
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("tie3"),
    )
    m = ranked.agg(
        F.sum("ta").cast("double").alias("na"),
        F.sum(F.col("t") - F.col("ta")).cast("double").alias("nb"),
        F.sum("t").cast("double").alias("nn"),
        F.sum(
            F.col("ta").cast("decimal(38,1)")
            * (
                F.col("below").cast("decimal(38,1)")
                + (F.col("t").cast("decimal(38,1)") + 1) / 2
            )
        )
        .cast("double")
        .alias("ra"),
        F.sum("tie3").cast("double").alias("tsum"),
    )
    u = m.select(
        "na", "nb", "nn", "tsum",
        (F.col("ra") - F.col("na") * (F.col("na") + 1.0) / 2.0).alias("ua"),
    )
    return u.select(
        F.col("na").cast("bigint").alias("n_building"),
        F.col("nb").cast("bigint").alias("n_automobile"),
        F.col("ua").alias("u_building"),
        (F.col("na") * F.col("nb") - F.col("ua")).alias("u_automobile"),
        det_round(F.expr(_MWU_Z), 6).alias("z"),
        det_round(
            F.lit(1.0) - F.lit(2.0) * F.col("ua") / (F.col("na") * F.col("nb")), 6
        ).alias("rank_biserial"),
    )


# ------------------------------------------- Kaplan-Meier survival curve
#
# Survival analysis over the signup→purchase funnel: subjects are
# signup users, the "event" is the first subsequent purchase, users who
# never purchase are right-censored at the global observation end (the
# corpus max timestamp — a deterministic constant, not wall clock).
# Durations collapse to DAY grain, so every window below runs over a
# calendar-bounded table (#days in the observation span) no matter how
# many users exist: the per-user work is two keyed aggregates + one
# join, the curve itself is O(days). The survival product
# Π(1 − d/n) is computed as exp(Σ ln(1 − d/n)) with each ln term
# det_round-ed to 9 digits and summed exactly in DECIMAL (the
# corpus_zipf_slope discipline), so the curve is hash-checkable.


@register(
    "events_survival_km",
    oracle=f"""
    WITH obs AS (
        SELECT max(ts) AS end_ts FROM events
    ),
    s AS (
        SELECT user_id, min(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY e.user_id
    ),
    subj AS (
        SELECT CAST(floor(CAST(epoch_us(
                   coalesce(p.first_purchase_ts, obs.end_ts) - s.signup_ts
               ) AS DOUBLE) / 86400e6) AS BIGINT) AS t_days,
               CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS converted
        FROM s LEFT JOIN p ON s.user_id = p.user_id CROSS JOIN obs
    ),
    byday AS (
        SELECT t_days,
               CAST(sum(converted) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leave_n
        FROM subj GROUP BY t_days
    ),
    risk AS (
        -- DuckDB's window sum(BIGINT) is HUGEINT, which pandas converts to
        -- float64 while Spark emits int64 — the values are identical but the
        -- driver's dtype-sensitive hash splits. CAST the whole expression
        -- back to BIGINT so both engines materialize int64.
        SELECT t_days, d,
               CAST(CAST((SELECT count(*) FROM subj) AS BIGINT)
                 - (sum(leave_n) OVER (ORDER BY t_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - leave_n) AS BIGINT) AS n_risk
        FROM byday
    ),
    death AS (
        SELECT t_days, d, n_risk,
               CASE WHEN d < n_risk
                    THEN {sql_det_round('ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))', 9)}
                    ELSE 0.0 END AS lnterm,
               CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS zero_factor
        FROM risk WHERE d > 0
    ),
    curve AS (
        SELECT t_days, d, n_risk,
               CAST(sum(CAST(lnterm AS DECIMAL(28,9))) OVER (ORDER BY t_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS lnsum,
               max(zero_factor) OVER (ORDER BY t_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS zero_seen
        FROM death
    )
    SELECT t_days, d AS n_events, n_risk,
           CASE WHEN zero_seen = 1 THEN 0.0
                ELSE {sql_det_round('exp(lnsum)', 6)} END AS survival
    FROM curve ORDER BY t_days
    """,
    doc="Kaplan-Meier survival curve of signup→first-purchase delay "
    "with right-censoring at the corpus observation end. Per-user work "
    "is two keyed aggregates and one user-key join; durations collapse "
    "to day grain so the at-risk/curve windows run over a calendar-"
    "bounded table (O(#days), independent of user count). "
    "S(t) = Π(1 − dᵢ/nᵢ) is evaluated as exp of an exactly-summed "
    "det_round-ed log series — bit-identical across engines.",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    end_ts = ev.agg(F.max("ts").alias("end_ts"))
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
    subj = (
        s.join(p, ["user_id"], "left")
        # the observation-end scalar joins in as a broadcast 1-row dim
        .crossJoin(F.broadcast(end_ts))
        .select(
            F.floor(
                (
                    F.unix_micros(
                        F.coalesce("first_purchase_ts", "end_ts")
                    )
                    - F.unix_micros("signup_ts")
                ).cast("double")
                / F.lit(86400e6)
            )
            .cast("bigint")
            .alias("t_days"),
            F.when(F.col("first_purchase_ts").isNull(), 0)
            .otherwise(1)
            .alias("converted"),
        )
    )
    byday = subj.groupBy("t_days").agg(
        F.sum("converted").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave_n"),
    )
    n_total = subj.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    # day-grain windows: input cardinality is the observation span in
    # days — calendar-bounded, safe as a single global ordering.
    w = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = (
        byday.crossJoin(F.broadcast(n_total))
        .select(
            "t_days",
            "d",
            (
                F.col("n_total")
                - (F.sum("leave_n").over(w) - F.col("leave_n"))
            ).alias("n_risk"),
        )
        .filter(F.col("d") > 0)
    )
    # an S(t) factor of exactly zero (d == n_risk: everyone remaining
    # dies) would be ln(0) = -inf; carry it as an absorbing flag instead
    # so the log-sum stays finite on both engines.
    death = risk.select(
        "t_days",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            det_round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_risk").cast("double")
                ),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lnterm"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("zero_factor"),
    )
    curve = death.select(
        "t_days",
        "d",
        "n_risk",
        F.sum(F.col("lnterm").cast("decimal(28,9)"))
        .over(w)
        .cast("double")
        .alias("lnsum"),
        F.max("zero_factor").over(w).alias("zero_seen"),
    )
    return curve.select(
        "t_days",
        F.col("d").alias("n_events"),
        "n_risk",
        F.when(F.col("zero_seen") == 1, F.lit(0.0))
        .otherwise(det_round(F.exp("lnsum"), 6))
        .alias("survival"),
    ).orderBy("t_days")


# ------------------------------------------ information-theoretic profiling
#
# Entropy and mutual information between event_type and hour-of-day —
# the feature-relevance / drift-diagnostic companion to the chi-square
# test: the same one tiny contingency shuffle, marginals re-aggregated
# from the cells, and every p·log2 term det_round(6)+decimal-summed so
# the information quantities are hash-comparable.


def _sql_h_term(c: str) -> str:
    """-p·log2(p) for a count column over grand total gt."""
    p = f"(CAST({c} AS DOUBLE) / CAST(gt AS DOUBLE))"
    return f"(-{p} * log2({p}))"


_SQL_MI_TERM = (
    "((CAST(o AS DOUBLE) / CAST(gt AS DOUBLE))"
    " * log2(CAST(o AS DOUBLE) * CAST(gt AS DOUBLE)"
    " / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))))"
)


@register(
    "mi_events_type_hour",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS o
        FROM events GROUP BY event_type, hour(ts)
    ),
    rt AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY event_type),
    ct AS (SELECT hr, sum(o) AS ct FROM obs GROUP BY hr),
    gt AS (SELECT sum(o) AS gt FROM obs),
    hx AS (
        SELECT {sql_sum_r6(_sql_h_term('rt.rt'))} AS h FROM rt CROSS JOIN gt
    ),
    hy AS (
        SELECT {sql_sum_r6(_sql_h_term('ct.ct'))} AS h FROM ct CROSS JOIN gt
    ),
    mi AS (
        SELECT {sql_sum_r6(_SQL_MI_TERM)} AS mi
        FROM obs JOIN rt USING (event_type) JOIN ct USING (hr) CROSS JOIN gt
    )
    SELECT {sql_det_round('hx.h', 4)} AS h_type,
           {sql_det_round('hy.h', 4)} AS h_hour,
           {sql_det_round('mi.mi', 4)} AS mutual_info
    FROM hx CROSS JOIN hy CROSS JOIN mi
    """,
    doc="Entropy of event_type, entropy of hour-of-day, and their "
    "mutual information in bits: one contingency shuffle, marginals "
    "re-aggregated from the cells, every p·log2 term det_round+"
    "decimal-summed — hash-checkable information theory. MI near 0 "
    "means the event mix is stationary across the day; drift "
    "monitors alert on a rise.",
)
def mi_events_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    obs = events.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("hr").agg(F.sum("o").alias("ct"))
    gt = obs.agg(F.sum("o").alias("gt"))

    def h_sum(df: DataFrame, c: str) -> DataFrame:
        p = F.col(c).cast("double") / F.col("gt").cast("double")
        return df.crossJoin(F.broadcast(gt)).agg(
            # exact_sum_r6 det_rounds its argument at 6 itself
            exact_sum_r6(-p * F.log2(p)).alias("h")
        )

    hx = h_sum(rt, "rt")
    hy = h_sum(ct, "ct")
    p_xy = F.col("o").cast("double") / F.col("gt").cast("double")
    ratio = (
        F.col("o").cast("double")
        * F.col("gt").cast("double")
        / (F.col("rt").cast("double") * F.col("ct").cast("double"))
    )
    mi = (
        obs.join(rt, ["event_type"])
        .join(ct, ["hr"])
        .crossJoin(F.broadcast(gt))
        # exact_sum_r6 det_rounds its argument at 6 itself
        .agg(exact_sum_r6(p_xy * F.log2(ratio)).alias("mi"))
    )
    return (
        hx.crossJoin(F.broadcast(hy.withColumnRenamed("h", "h2")))
        .crossJoin(F.broadcast(mi))
        .select(
            det_round(F.col("h"), 4).alias("h_type"),
            det_round(F.col("h2"), 4).alias("h_hour"),
            det_round(F.col("mi"), 4).alias("mutual_info"),
        )
    )


# --------------------------------------------- two-proportion z-test
#
# The A/B-test readout: conversion rate (purchases per click-user) in
# two deterministic cohorts (user_id parity), compared with the pooled
# two-proportion z statistic. Cohort assignment by key hash/parity is
# the production pattern (stable under re-runs); every count is exact,
# the z closed form is identical IEEE on both engines.


@register(
    "ab_test_conversion",
    oracle=f"""
    WITH clicks AS (
        SELECT event_id, user_id, ts, CAST(user_id % 2 AS INT) AS cohort
        FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    conv AS (
        SELECT c.event_id, c.cohort,
               CASE WHEN EXISTS (
                   SELECT 1 FROM purch p
                   WHERE p.user_id = c.user_id
                     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
               ) THEN 1 ELSE 0 END AS converted
        FROM clicks c
    ),
    g AS (
        SELECT cohort,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(converted) AS DOUBLE) AS x
        FROM conv GROUP BY cohort
    ),
    w AS (
        SELECT max(CASE WHEN cohort = 0 THEN n END) AS n0,
               max(CASE WHEN cohort = 0 THEN x END) AS x0,
               max(CASE WHEN cohort = 1 THEN n END) AS n1,
               max(CASE WHEN cohort = 1 THEN x END) AS x1
        FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
           {sql_det_round('x0 / n0', 6)} AS rate_control,
           {sql_det_round('x1 / n1', 6)} AS rate_treat,
           {sql_det_round(
               '(x1 / n1 - x0 / n0) / sqrt('
               '((x0 + x1) / (n0 + n1)) * (1.0 - (x0 + x1) / (n0 + n1))'
               ' * (1.0 / n0 + 1.0 / n1))', 6)} AS z_stat
    FROM w
    """,
    doc="Two-proportion z-test (the A/B-test readout): users split into "
    "deterministic parity cohorts, a click converts if the same user "
    "purchases within the following hour (user-keyed interval join "
    "with residual time predicate — never a cartesian), pooled z "
    "statistic from exact counts — "
    "identical IEEE closed form on both engines, so the significance "
    "readout is hash-checkable. One user-keyed aggregate + one "
    "two-row pivot; nothing else moves.",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id",
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        (F.col("user_id") % 2).cast("int").alias("cohort"),
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    matched = clicks.join(
        purch,
        (F.col("pu") == F.col("cu"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("event_id")
    conv = clicks.join(
        matched.withColumn("converted", F.lit(1)), "event_id", "left"
    ).withColumn("converted", F.coalesce(F.col("converted"), F.lit(0)))
    g = conv.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("x"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("cohort") == c, F.col(v))).alias(f"{v}{c}")
            for c in (0, 1)
            for v in ("n", "x")
        ]
    )
    p_pool = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    z = (F.col("x1") / F.col("n1") - F.col("x0") / F.col("n0")) / F.sqrt(
        p_pool * (F.lit(1.0) - p_pool) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return w.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("n1").cast("bigint").alias("n_treat"),
        det_round(F.col("x0") / F.col("n0"), 6).alias("rate_control"),
        det_round(F.col("x1") / F.col("n1"), 6).alias("rate_treat"),
        det_round(z, 6).alias("z_stat"),
    )


# ------------------------------------------------- one-way ANOVA F


@register(
    "anova_acctbal_segments",
    oracle=f"""
    WITH g AS (
        SELECT c_mktsegment,
               CAST(count(*) AS DOUBLE) AS n,
               sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s_dec,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                        * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS ss
        FROM customer GROUP BY c_mktsegment
    ),
    tot AS (
        -- grand total from the EXACT decimal group sums (one double
        -- conversion): sum(s) over double group sums is order-dependent
        -- and can differ between engines by an ulp
        SELECT CAST(count(*) AS DOUBLE) AS k,
               sum(n) AS n, CAST(sum(s_dec) AS DOUBLE) AS s
        FROM g
    ),
    parts AS (
        SELECT
            {sql_sum_r6('g.n * (g.s / g.n - tot.s / tot.n) * (g.s / g.n - tot.s / tot.n)')} AS bss,
            {sql_sum_r6('g.ss - g.s * g.s / g.n')} AS wss,
            max(tot.k) AS k, max(tot.n) AS n
        FROM g CROSS JOIN tot
    )
    SELECT CAST(k AS INT) AS n_groups,
           CAST(n AS BIGINT) AS n_obs,
           {sql_det_round('bss', 2)} AS between_ss,
           {sql_det_round('wss', 2)} AS within_ss,
           {sql_det_round('(bss / (k - 1.0)) / (wss / (n - k))', 6)} AS f_stat
    FROM parts
    """,
    doc="One-way ANOVA F-test of account balance across ALL market "
    "segments (the k-group generalization of the Welch pair test): "
    "per-group exact decimal moment sums in one scan, between/within "
    "sums of squares det_round+decimal-summed over the 5-row group "
    "table, F from the identical IEEE closed form — a hash-checkable "
    "variance decomposition.",
)
def anova_acctbal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    d = F.col("c_acctbal").cast("decimal(18,2)")
    g = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d).alias("s_dec"),  # exact decimal, for the grand total
        F.sum(d).cast("double").alias("s"),
        F.sum(d * d).cast("double").alias("ss"),
    )
    # Grand total from the exact decimal group sums, one double
    # conversion: F.sum over the double group sums would add them in
    # partial-aggregation order while the oracle adds them in scan
    # order — double addition is order-dependent, so the two can differ
    # by an ulp and flip the det_round grid (exact.py discipline).
    tot = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").alias("tn"),
        F.sum("s_dec").cast("double").alias("ts"),
    )
    gm = F.col("ts") / F.col("tn")
    parts = g.crossJoin(F.broadcast(tot)).agg(
        exact_sum_r6(
            F.col("n") * (F.col("s") / F.col("n") - gm) * (F.col("s") / F.col("n") - gm)
        ).alias("bss"),
        exact_sum_r6(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("wss"),
        F.max("k").alias("k"),
        F.max("tn").alias("n"),
    )
    return parts.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("n").cast("bigint").alias("n_obs"),
        det_round(F.col("bss"), 2).alias("between_ss"),
        det_round(F.col("wss"), 2).alias("within_ss"),
        det_round(
            (F.col("bss") / (F.col("k") - F.lit(1.0)))
            / (F.col("wss") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# --------------------------------------------- two-sample KS test


@register(
    "ks_acctbal_two_sample",
    oracle=f"""
    WITH s AS (
        SELECT c_acctbal AS v,
               CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g1,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g2
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    byv AS (
        SELECT v, sum(g1) AS d1, sum(g2) AS d2 FROM s GROUP BY v
    ),
    tot AS (SELECT sum(d1) AS n1, sum(d2) AS n2 FROM byv),
    cum AS (
        SELECT v,
               sum(d1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
               sum(d2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2
        FROM byv
    )
    SELECT CAST(tot.n1 AS BIGINT) AS n_auto,
           CAST(tot.n2 AS BIGINT) AS n_build,
           {sql_det_round(
               'max(abs(CAST(c1 AS DOUBLE) / CAST(tot.n1 AS DOUBLE)'
               ' - CAST(c2 AS DOUBLE) / CAST(tot.n2 AS DOUBLE)))', 6)} AS ks_d
    FROM cum CROSS JOIN tot
    GROUP BY tot.n1, tot.n2
    """,
    doc="Two-sample Kolmogorov–Smirnov statistic between the "
    "AUTOMOBILE and BUILDING balance distributions: D = max |F1−F2| "
    "evaluated at every distinct pooled value. The empirical CDFs "
    "come from bucketed prefix sums over the value-grain (value, "
    "count-per-group) rollup — ONE `scale.bucketed_prefix_sums` pass "
    "for both CDFs (shared boundaries, shared window), never a "
    "single-partition window — and D is a max over exact "
    "integer-ratio differences ⇒ hash-green distribution comparison.",
)
def ks_acctbal_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_prefix_sums

    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    )
    byv = cust.groupBy(F.col("c_acctbal").alias("v")).agg(
        F.sum(
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0)
        ).alias("d1"),
        F.sum(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        ).alias("d2"),
    )
    tot = byv.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    # one pass for BOTH cumulative CDFs: shared quantile probe, shared
    # bucketing, shared window (two sequential bucketed_prefix_sum calls
    # would re-scan for boundaries and could even bucket differently)
    cum = bucketed_prefix_sums(byv, "v", {"c1": "d1", "c2": "d2"})
    d = F.abs(
        F.col("c1").cast("double") / F.col("n1").cast("double")
        - F.col("c2").cast("double") / F.col("n2").cast("double")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(F.col("n1")).cast("bigint").alias("n_auto"),
            F.max(F.col("n2")).cast("bigint").alias("n_build"),
            det_round(F.max(d), 6).alias("ks_d"),
        )
    )


# ------------------------------------------- deterministic Monte Carlo

MC_SAMPLES = 1_000_000


@register(
    "mc_pi_estimate",
    oracle=f"""
    WITH pts AS (
        SELECT (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':x'), 1, 13) AS BIGINT)
                / 4503599627370496.0) AS x,
               (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':y'), 1, 13) AS BIGINT)
                / 4503599627370496.0) AS y
        FROM (SELECT unnest(generate_series(0, {MC_SAMPLES - 1})) AS i)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_samples,
           CAST(count(CASE WHEN x * x + y * y <= 1.0 THEN 1 END) AS BIGINT) AS n_inside,
           {sql_det_round(f'4.0 * count(CASE WHEN x * x + y * y <= 1.0 THEN 1 END) / {float(MC_SAMPLES)}', 6)} AS pi_estimate
    FROM pts
    """,
    doc="Monte Carlo simulation made reproducible: π from 1M 2-D "
    "points whose coordinates are md5-derived exact-dyadic uniforms "
    "— a pure function of the sample index, so the 'random' "
    "simulation is bit-identical across engines, partitionings, and "
    "re-runs (the determinism discipline data pipelines need for "
    "audited simulations). Embarrassingly parallel: spark.range "
    "shards the index space, one count aggregate, no shuffle of "
    "sample rows.",
)
def mc_pi_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    def u(salt: str):
        return (
            F.conv(
                F.md5(
                    F.concat(F.col("id").cast("string"), F.lit(":" + salt)).cast(
                        "binary"
                    )
                ).substr(1, 13),
                16,
                10,
            ).cast("bigint")
            / F.lit(4503599627370496.0)
        )

    pts = spark.range(MC_SAMPLES).select(u("x").alias("x"), u("y").alias("y"))
    inside = F.count(
        F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1)
    )
    return pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        inside.cast("bigint").alias("n_inside"),
        det_round(F.lit(4.0) * inside / F.lit(float(MC_SAMPLES)), 6).alias(
            "pi_estimate"
        ),
    )


# --------------------------------------------------- tail risk (VaR/CVaR)


@register(
    "orders_var_cvar",
    oracle="""
    WITH v AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
    cut AS (
        SELECT quantile_disc(p, 0.99) AS var99 FROM v
    )
    SELECT CAST(var99 AS DOUBLE) AS var_99,
           CAST((SELECT count(*) FROM v, cut WHERE p >= var99) AS BIGINT) AS n_tail,
           (floor((SELECT CAST(sum(p) AS DOUBLE) / count(*)
                   FROM v, cut WHERE p >= var99) * 100.0 + 0.5) / 100.0) AS cvar_99
    FROM cut
    """,
    doc="Tail risk on order values: VaR(99) as the exact discrete "
    "99th-percentile price, CVaR(99) as the exact-decimal mean of "
    "the tail at-or-beyond it. The quantile comes from Spark's "
    "exact percentile aggregate (discrete, no interpolation — "
    "engine-agnostic on 2-decimal data); the tail mean is one "
    "pushed-filter scan with decimal accumulation ⇒ hash-green "
    "risk metrics.",
)
def orders_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    v = orders.select(F.col("o_totalprice").cast("decimal(18,2)").alias("p"))
    cut = v.agg(
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY p)").alias("var99")
    )
    tail = v.crossJoin(F.broadcast(cut)).filter(F.col("p") >= F.col("var99"))
    return tail.agg(
        F.max(F.col("var99")).cast("double").alias("var_99"),
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        det_round(
            F.sum("p").cast("double") / F.count(F.lit(1)), 2
        ).alias("cvar_99"),
    )


# --------------------------------------------- Spearman rank correlation
#
# The nonparametric dependence measure: Pearson correlation of
# mid-ranks. Each variable's ranks are computed at VALUE grain (the
# mannwhitney_u_segments discipline — the rank window runs over the
# domain-bounded distinct-value aggregate, never the row set), joined
# back on the value key, then the five moment sums over the exact
# k/2-rational ranks give rho as one IEEE closed form — hash-green.


def _sql_midranks(col: str) -> str:
    return f"""(
        SELECT v,
               CAST(below AS DECIMAL(38,1))
                 + (CAST(t AS DECIMAL(38,1)) + 1) / 2 AS r
        FROM (
            SELECT v, t,
                   sum(t) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - t AS below
            FROM (SELECT {col} AS v, count(*) AS t FROM lineitem GROUP BY {col})
        )
    )"""


@register(
    "spearman_qty_price",
    oracle=f"""
    WITH rx AS {_sql_midranks('l_quantity')},
    ry AS {_sql_midranks('l_extendedprice')},
    pairs AS (
        SELECT CAST(rx.r AS DECIMAL(18,2)) AS a,
               CAST(ry.r AS DECIMAL(18,2)) AS b
        FROM lineitem li
        JOIN rx ON rx.v = li.l_quantity
        JOIN ry ON ry.v = li.l_extendedprice
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(a) AS DOUBLE) AS sx,
               CAST(sum(b) AS DOUBLE) AS sy,
               CAST(sum(a * a) AS DOUBLE) AS sxx,
               CAST(sum(b * b) AS DOUBLE) AS syy,
               CAST(sum(a * b) AS DOUBLE) AS sxy
        FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           {sql_det_round('(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))', 6)} AS spearman_rho
    FROM m
    """,
    doc="Spearman rank correlation of quantity vs extended price: "
    "mid-ranks per variable at value grain (tie-exact k/2 rationals, "
    "via `scale.bucketed_prefix_sum` over the distinct-value counts — "
    "no single-partition global window, the KS/ABC-Pareto pattern), "
    "joined back on the value key, Pearson closed form over the exact "
    "decimal rank moments. The nonparametric complement to the OLS/"
    "Pearson pair — monotone dependence, hash-green.",
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import bucketed_prefix_sum

    li = load(spark, sf_dir, "lineitem")

    def midranks(col: str) -> DataFrame:
        # mid-rank of value v = (#rows below v) + (ties + 1)/2; the
        # "#rows below" prefix sum runs bucketed (quantile buckets of v,
        # one (bucket, sum) driver row each), so the l_extendedprice
        # value grain — which grows with the part catalog — never funnels
        # through a one-reducer ORDER BY window.
        vals = li.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("t"))
        cum = bucketed_prefix_sum(vals, "v", "t", out_col="_cum")
        return cum.select(
            "v",
            (
                (F.col("_cum") - F.col("t")).cast("decimal(38,1)")
                + (F.col("t").cast("decimal(38,1)") + 1) / 2
            ).alias("r"),
        )

    rx = midranks("l_quantity").select(
        F.col("v").alias("l_quantity"), F.col("r").cast("decimal(18,2)").alias("a")
    )
    ry = midranks("l_extendedprice").select(
        F.col("v").alias("l_extendedprice"),
        F.col("r").cast("decimal(18,2)").alias("b"),
    )
    pairs = li.select("l_quantity", "l_extendedprice").join(
        F.broadcast(rx), "l_quantity"
    ).join(ry, "l_extendedprice")
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("a").cast("double").alias("sx"),
        F.sum("b").cast("double").alias("sy"),
        F.sum(F.col("a") * F.col("a")).cast("double").alias("sxx"),
        F.sum(F.col("b") * F.col("b")).cast("double").alias("syy"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("sxy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_obs"),
        det_round(rho, 6).alias("spearman_rho"),
    )


# --------------------------------------------- sequential testing (SPRT)

SPRT_P0 = 0.010  # H0 click→purchase-within-1h conversion rate
SPRT_P1 = 0.020  # H1 rate the test is powered to detect
SPRT_ALPHA_BOUND = 2.944438979166441  # ln(19): alpha=beta=0.05 thresholds


@register(
    "ab_sprt_trace",
    oracle=f"""
    WITH clicks AS (
        SELECT event_id, user_id, ts, CAST(ts AS DATE) AS d FROM events
        WHERE event_type = 'click'
    ),
    purch AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    conv AS (
        SELECT c.d,
               count(*) AS n,
               sum(CASE WHEN EXISTS (
                   SELECT 1 FROM purch p
                   WHERE p.user_id = c.user_id
                     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
               ) THEN 1 ELSE 0 END) AS x
        FROM clicks c GROUP BY c.d
    ),
    llr AS (
        SELECT d, n, x,
               {sql_det_round(
                   f'CAST(x AS DOUBLE) * ln({SPRT_P1} / {SPRT_P0})'
                   f' + CAST(n - x AS DOUBLE) * ln((1.0 - {SPRT_P1}) / (1.0 - {SPRT_P0}))', 6)}
                 AS day_llr
        FROM conv
    ),
    cum AS (
        SELECT d, n, x, day_llr,
               CAST(sum(CAST(day_llr AS DECIMAL(27,6)))
                    OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_llr
        FROM llr
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_trials,
           CAST(x AS BIGINT) AS n_conversions,
           {sql_det_round('cum_llr', 6)} AS cum_llr,
           CASE WHEN cum_llr >= {SPRT_ALPHA_BOUND} THEN 'accept_h1'
                WHEN cum_llr <= -{SPRT_ALPHA_BOUND} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    ORDER BY day
    """,
    doc="Sequential probability ratio test (Wald's SPRT — the "
    "early-stopping A/B monitor): daily click→purchase-within-1h "
    "conversions accumulate a binomial log-likelihood ratio against "
    "H0 p=1% vs H1 p=2%, with ±ln(19) decision bounds (5%/5% "
    "errors). Daily LLR terms are det_round+decimal-cumsum'd over "
    "the calendar-bounded day series, so the whole decision TRACE — "
    "not just the endpoint — is hash-green.",
)
def ab_sprt_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id",
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.col("ts").cast("date").alias("d"),
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    matched = clicks.join(
        purch,
        (F.col("pu") == F.col("cu"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("event_id")
    conv = (
        clicks.join(matched.withColumn("hit", F.lit(1)), "event_id", "left")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("x"),
        )
    )
    import math

    day_llr = det_round(
        F.col("x").cast("double") * F.lit(math.log(SPRT_P1 / SPRT_P0))
        + (F.col("n") - F.col("x")).cast("double")
        * F.lit(math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))),
        6,
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    cum = conv.withColumn("day_llr", day_llr).withColumn(
        "cum_llr",
        F.sum(F.col("day_llr").cast("decimal(27,6)")).over(w).cast("double"),
    )
    return cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_trials"),
        F.col("x").cast("bigint").alias("n_conversions"),
        det_round(F.col("cum_llr"), 6).alias("cum_llr"),
        F.when(F.col("cum_llr") >= SPRT_ALPHA_BOUND, "accept_h1")
        .when(F.col("cum_llr") <= -SPRT_ALPHA_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")
