"""Time-series diagnostics over day-grain rollups: sample
autocorrelation (ACF) and a trig-free seasonal-strength scan.

Both operators share the engine's calendar-bounded window discipline
(the `orders_open_peak_monthly` precedent): the fact table collapses
to ONE row per day in a single shuffle, so every subsequent window or
join runs over a table bounded by the calendar span — at 100 TB the
daily series is still a few thousand rows, and the lag windows /
phase-fold joins never touch the raw events again.

Determinism follows `functions/exact.py`: the daily sums are exact
DECIMAL accumulations; per-element doubles (products of deviations,
squared phase-mean gaps) are det_round(6)-stabilized then
decimal-summed, and every closed-form combination is the identical
IEEE expression on both engines — so even an autocorrelation
coefficient is hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import (
    det_round,
    sql_det_round,
    sql_sum_r6,
    exact_sum_r6,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

# Daily series CTE shared by both oracles: exact decimal sum of
# events.value per calendar day, plus a 0-based day index from the
# series start (DuckDB date_diff('day', start, d) == Spark
# datediff(d, start) for DATE operands).
_DAILY_SQL = """
    daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    idx AS (
        SELECT d, x,
               CAST(date_diff('day', (SELECT min(d) FROM daily), d) AS INT) AS t
        FROM daily
    )
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain exact-decimal rollup of events.value with a 0-based
    day index — ONE shuffle over the fact table; everything downstream
    is calendar-bounded."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x")
    )
    start = daily.agg(F.min("d").alias("d0"))
    return daily.crossJoin(F.broadcast(start)).select(
        "d", "x", F.datediff("d", "d0").cast("int").alias("t")
    )


@register(
    "daily_acf_value",
    oracle=f"""
    WITH {_DAILY_SQL},
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx
        FROM idx
    ),
    dev AS (
        SELECT idx.t, idx.x - stats.sx / stats.n AS dx FROM idx CROSS JOIN stats
    ),
    denom AS (
        SELECT {sql_sum_r6('dx * dx')} AS ss FROM dev
    ),
    lagged AS (
        SELECT l.lag_k, cur.dx AS dx, prev.dx AS dx_lag
        FROM (SELECT unnest(generate_series(1, 7)) AS lag_k) l
        JOIN dev cur ON TRUE
        JOIN dev prev ON prev.t = cur.t - l.lag_k
    ),
    numer AS (
        SELECT lag_k, {sql_sum_r6('dx * dx_lag')} AS sp, count(*) AS n_pairs
        FROM lagged GROUP BY lag_k
    )
    SELECT CAST(lag_k AS INT) AS lag_k,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           {sql_det_round('sp / denom.ss', 6)} AS acf
    FROM numer CROSS JOIN denom
    ORDER BY lag_k
    """,
    doc="Sample autocorrelation of the daily events.value series at "
    "lags 1..7: the fact table collapses to one row per day in a "
    "single shuffle, deviations from the series mean are paired with "
    "their k-day-earlier counterparts by an equi-join on the day "
    "index (calendar-bounded — never the fact table), and each "
    "r_k = Σ dx_t·dx_{t−k} / Σ dx_t² is det_round+decimal-summed so "
    "the coefficients hash-match across engines. Lag-7 spikes flag "
    "weekly seasonality.",
)
def daily_acf_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily_series(spark, sf_dir)
    stats = idx.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(27,6)")).cast("double").alias("sx"),
    )
    dev = idx.crossJoin(F.broadcast(stats)).select(
        "t", (F.col("x") - F.col("sx") / F.col("n")).alias("dx")
    )
    denom = dev.agg(exact_sum_r6(F.col("dx") * F.col("dx")).alias("ss"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
    # Pair each day with its k-day-earlier neighbour: broadcast the
    # 7-row lag table against the daily series, then equi-join back to
    # the series on the shifted index — both sides calendar-bounded.
    cur = dev.crossJoin(F.broadcast(lags)).withColumn(
        "t_prev", F.col("t") - F.col("lag_k")
    )
    prev = dev.select(F.col("t").alias("t_prev"), F.col("dx").alias("dx_lag"))
    numer = (
        cur.join(prev, "t_prev")
        .groupBy("lag_k")
        .agg(
            exact_sum_r6(F.col("dx") * F.col("dx_lag")).alias("sp"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return (
        numer.crossJoin(F.broadcast(denom))
        .select(
            F.col("lag_k").cast("int").alias("lag_k"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            det_round(F.col("sp") / F.col("ss"), 6).alias("acf"),
        )
        .orderBy("lag_k")
    )


@register(
    "seasonal_strength_scan",
    oracle=f"""
    WITH {_DAILY_SQL},
    periods AS (SELECT unnest(generate_series(2, 14)) AS period),
    folded AS (
        SELECT p.period, idx.t % p.period AS phase, idx.x
        FROM periods p JOIN idx ON TRUE
    ),
    phase_stats AS (
        SELECT period, phase,
               CAST(count(*) AS DOUBLE) AS ng,
               CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sg
        FROM folded GROUP BY period, phase
    ),
    tot AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx
        FROM idx
    ),
    tss AS (
        SELECT {sql_sum_r6('(idx.x - tot.sx / tot.n) * (idx.x - tot.sx / tot.n)')} AS ss
        FROM idx CROSS JOIN tot
    ),
    bss AS (
        SELECT period,
               {sql_sum_r6('ng * (sg / ng - tot.sx / tot.n) * (sg / ng - tot.sx / tot.n)')} AS bs
        FROM phase_stats CROSS JOIN tot GROUP BY period
    )
    SELECT CAST(period AS INT) AS period,
           {sql_det_round('bs / tss.ss', 6)} AS eta2
    FROM bss CROSS JOIN tss
    ORDER BY period
    """,
    doc="Trig-free seasonality detection: for each candidate period "
    "p∈[2,14], fold the daily series by t mod p and measure the "
    "variance explained by the phase means (ANOVA η² = between-SS / "
    "total-SS). A weekly cycle peaks at p=7 — the periodogram's "
    "job WITHOUT cos/sin, so every term is an exact closed form "
    "over decimal sums and the scan hash-matches across engines. "
    "The fold runs over the day-grain rollup (13 periods × days "
    "rows), never the fact table.",
)
def seasonal_strength_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily_series(spark, sf_dir)
    periods = spark.range(2, 15).select(F.col("id").cast("int").alias("period"))
    folded = idx.crossJoin(F.broadcast(periods)).select(
        "period", (F.col("t") % F.col("period")).alias("phase"), "x"
    )
    phase_stats = folded.groupBy("period", "phase").agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.sum(F.col("x").cast("decimal(27,6)")).cast("double").alias("sg"),
    )
    tot = idx.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(27,6)")).cast("double").alias("sx"),
    )
    mean = F.col("sx") / F.col("n")
    tss = idx.crossJoin(F.broadcast(tot)).agg(
        exact_sum_r6((F.col("x") - mean) * (F.col("x") - mean)).alias("ss")
    )
    gap = F.col("sg") / F.col("ng") - mean
    bss = (
        phase_stats.crossJoin(F.broadcast(tot))
        .groupBy("period")
        .agg(exact_sum_r6(F.col("ng") * gap * gap).alias("bs"))
    )
    return (
        bss.crossJoin(F.broadcast(tss))
        .select(
            F.col("period").cast("int").alias("period"),
            det_round(F.col("bs") / F.col("ss"), 6).alias("eta2"),
        )
        .orderBy("period")
    )


@register(
    "forecast_backtest_snaive",
    oracle=f"""
    WITH {_DAILY_SQL},
    joined AS (
        SELECT cur.t, cur.x AS actual, prev.x AS forecast
        FROM idx cur JOIN idx prev ON prev.t = cur.t - 7
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           {sql_det_round(sql_sum_r6('abs(actual - forecast)') + ' / count(*)', 4)} AS mae,
           -- MAPE over nonzero-actual days only: a zero-total day would
           -- make the term Infinity (DuckDB then ERRORS casting to
           -- DECIMAL; Spark det_round floors it into garbage)
           {sql_det_round(sql_sum_r6('CASE WHEN actual <> 0 THEN abs(actual - forecast) / actual END') + ' / count(CASE WHEN actual <> 0 THEN 1 END)', 6)} AS mape
    FROM joined
    """,
    doc="Seasonal-naive forecast backtest: forecast each day's total "
    "event value as the value 7 days earlier (the benchmark every "
    "fancier forecaster must beat), scored by MAE and MAPE over the "
    "evaluation days. The lag pairing is the same calendar-bounded "
    "day-index equi-join as the ACF; absolute-error terms are "
    "det_round+decimal-summed so the backtest metrics hash-match.",
)
def forecast_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily_series(spark, sf_dir)
    cur = idx.select("t", F.col("x").alias("actual"))
    prev = idx.select((F.col("t") + 7).alias("t"), F.col("x").alias("forecast"))
    joined = cur.join(prev, "t")
    err = F.abs(F.col("actual") - F.col("forecast"))
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        det_round(
            exact_sum_r6(err) / F.count(F.lit(1)), 4
        ).alias("mae"),
        # nonzero-actual days only — see the oracle comment
        det_round(
            exact_sum_r6(F.when(F.col("actual") != 0, err / F.col("actual")))
            / F.count(F.when(F.col("actual") != 0, 1)),
            6,
        ).alias("mape"),
    )


@register(
    "events_seasonal_residual_outliers",
    oracle=f"""
    WITH {_DAILY_SQL},
    phase_means AS (
        SELECT t % 7 AS phase,
               CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS mu
        FROM idx GROUP BY t % 7
    ),
    resid AS (
        SELECT idx.d, idx.x, idx.t % 7 AS phase,
               idx.x - pm.mu AS r
        FROM idx JOIN phase_means pm ON pm.phase = idx.t % 7
    ),
    med AS (SELECT median(r) AS m FROM resid),
    absdev AS (
        SELECT resid.d, resid.x, resid.phase, resid.r,
               abs(resid.r - med.m) AS ad
        FROM resid CROSS JOIN med
    ),
    mad AS (SELECT median(ad) AS mad FROM absdev),
    flagged AS (
        SELECT a.d, a.x, a.phase, a.r
        FROM absdev a CROSS JOIN med CROSS JOIN mad
        WHERE abs(a.r - med.m) > 1.5 * 1.4826 * mad.mad
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(phase AS INT) AS phase,
           {sql_det_round('x', 2)} AS value,
           {sql_det_round('r', 2)} AS residual
    FROM flagged
    ORDER BY day
    """,
    doc="Seasonality-adjusted anomaly detection on the daily series: "
    "subtract the day-of-week phase mean (the seasonal_strength_scan "
    "fold), then flag days whose residual exceeds 1.5·1.4826·MAD — "
    "robust outliers that plain z-scores miss when the weekly cycle "
    "inflates the variance. Phase means are a 7-row broadcast; the "
    "exact medians run over the calendar-bounded day rollup; all "
    "arithmetic det_round+decimal ⇒ hash-green.",
)
def events_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily_series(spark, sf_dir)
    phase_means = idx.groupBy((F.col("t") % 7).alias("phase")).agg(
        (
            F.sum(F.col("x").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu")
    )
    resid = (
        idx.withColumn("phase", F.col("t") % 7)
        .join(F.broadcast(phase_means), "phase")
        .select("d", "x", "phase", (F.col("x") - F.col("mu")).alias("r"))
    )
    med = resid.agg(F.expr("median(r)").alias("m"))
    absdev = resid.crossJoin(F.broadcast(med)).withColumn(
        "ad", F.abs(F.col("r") - F.col("m"))
    )
    mad = absdev.agg(F.expr("median(ad)").alias("mad"))
    flagged = (
        absdev.crossJoin(F.broadcast(mad))
        .filter(
            F.abs(F.col("r") - F.col("m"))
            > F.lit(1.5) * F.lit(1.4826) * F.col("mad")
        )
    )
    return flagged.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("phase").cast("int").alias("phase"),
        det_round(F.col("x"), 2).alias("value"),
        det_round(F.col("r"), 2).alias("residual"),
    ).orderBy("day")


_INTERP_BLEND = (
    "v_prev + (v_next - v_prev)"
    " * CAST(date_diff('day', d_prev, d) AS DOUBLE)"
    " / CAST(date_diff('day', d_prev, d_next) AS DOUBLE)"
)


@register(
    "events_linear_interpolate",
    oracle=f"""
    WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
        SELECT user_id, min(d) AS d_min, max(d) AS d_max FROM obs GROUP BY user_id
    ),
    cal AS (
        SELECT s.user_id, CAST(s.d_min + k * INTERVAL 1 DAY AS DATE) AS d
        FROM spans s,
             unnest(generate_series(0, date_diff('day', s.d_min, s.d_max))) AS t(k)
    ),
    joined AS (
        SELECT cal.user_id, cal.d, obs.v FROM cal LEFT JOIN obs USING (user_id, d)
    ),
    fenced AS (
        SELECT user_id, d, v,
               last_value(v IGNORE NULLS) OVER w_prev AS v_prev,
               last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                 OVER w_prev AS d_prev,
               first_value(v IGNORE NULLS) OVER w_next AS v_next,
               first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                 OVER w_next AS d_next
        FROM joined
        WINDOW w_prev AS (PARTITION BY user_id ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY user_id ORDER BY d
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    interp AS (
        SELECT user_id,
               CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_interp,
               CASE WHEN v IS NOT NULL THEN v
                    ELSE {sql_det_round(_INTERP_BLEND, 4)}
               END AS val
        FROM fenced
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(is_interp) AS BIGINT) AS n_interpolated,
           {sql_det_round(sql_sum_r6('val'), 2)} AS total_value
    FROM interp
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Linear-interpolation resampling of per-user daily series (the "
    "pandas df.interpolate / upsample-to-daily shape): each user's "
    "calendar gap-fills from min to max observed day (map-only "
    "sequence explode), missing days take the linear blend of the "
    "surrounding observations — prev/next located by IGNORE NULLS "
    "window frames that SHARE one user_id exchange. Integer day "
    "arithmetic + det_round'd blends + decimal sums ⇒ the resampled "
    "per-user totals hash-match.",
)
def events_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    obs = events.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    spans = obs.groupBy("user_id").agg(
        F.min("d").alias("d_min"), F.max("d").alias("d_max")
    )
    cal = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d_min, d_max, interval 1 day)")).alias("d"),
    )
    joined = cal.join(obs, ["user_id", "d"], "left")
    w_prev = (
        W.partitionBy("user_id").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("user_id").orderBy("d").rowsBetween(0, W.unboundedFollowing)
    )
    d_obs = F.when(F.col("v").isNotNull(), F.col("d"))
    fenced = joined.select(
        "user_id",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("v_prev"),
        F.last(d_obs, ignorenulls=True).over(w_prev).alias("d_prev"),
        F.first("v", ignorenulls=True).over(w_next).alias("v_next"),
        F.first(d_obs, ignorenulls=True).over(w_next).alias("d_next"),
    )
    blend = det_round(
        F.col("v_prev")
        + (F.col("v_next") - F.col("v_prev"))
        * F.datediff("d", "d_prev").cast("double")
        / F.datediff("d_next", "d_prev").cast("double"),
        4,
    )
    interp = fenced.select(
        "user_id",
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_interp"),
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(blend).alias("val"),
    )
    return (
        interp.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("is_interp").cast("bigint").alias("n_interpolated"),
            det_round(exact_sum_r6(F.col("val")), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )
