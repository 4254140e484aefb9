"""Feature/data-preparation operators: the ML-preprocessing shapes
(imputation here; encoding/binning live in the relational and window
modules) a training pipeline runs right before feature export.

`events_impute_value` is the canonical two-level mean imputer: nulls
are filled from the per-user mean and, for users with no observed
values at all, from the global mean. The driver tables carry no nulls,
so the operator first *injects* a deterministic null mask
(event_id % 13 == 0) — making the fill path itself oracle-checkable.

Scale posture: per-user means are one map-side-combined aggregation
joined back on the already-shuffled user key; the global mean is a
broadcast 1-row aggregate. No windows, no driver round-trips.
Determinism: means are exact decimal sums ÷ counts, det_round(4)'d
before the fill so the imputed value is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round, sql_sum2
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


@register(
    "events_impute_value",
    oracle=f"""
    WITH masked AS (
        SELECT event_id, user_id,
               CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    user_mean AS (
        SELECT user_id,
               {sql_det_round(sql_sum2('v') + ' / count(v)', 4)} AS u_mean
        FROM masked WHERE v IS NOT NULL GROUP BY user_id
    ),
    global_mean AS (
        SELECT {sql_det_round(sql_sum2('v') + ' / count(v)', 4)} AS g_mean
        FROM masked WHERE v IS NOT NULL
    )
    SELECT m.event_id, m.user_id,
           COALESCE(m.v, u.u_mean, g.g_mean) AS value_imputed,
           (m.v IS NULL) AS was_imputed
    FROM masked m
    LEFT JOIN user_mean u ON m.user_id = u.user_id
    CROSS JOIN global_mean g
    ORDER BY m.event_id
    """,
    doc="Two-level mean imputation over a deterministically-masked "
    "value column: per-user det-rounded decimal means joined back on "
    "the user key, global-mean broadcast fallback for all-null users "
    "— the standard ML imputer as one declarative plan.",
)
def events_impute_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    observed = events.filter(F.col("v").isNotNull())
    mean2 = det_round(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double") / F.count("v"), 4
    )
    user_mean = observed.groupBy("user_id").agg(mean2.alias("u_mean"))
    global_mean = observed.agg(mean2.alias("g_mean"))
    return (
        events.join(user_mean, ["user_id"], "left")
        .crossJoin(F.broadcast(global_mean))
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("v"), F.col("u_mean"), F.col("g_mean")).alias(
                "value_imputed"
            ),
            F.col("v").isNull().alias("was_imputed"),
        )
        .orderBy("event_id")
    )


@register(
    "events_target_encode_loo",
    oracle="""
    WITH g AS (
        SELECT event_type,
               sum(CAST(value AS DECIMAL(18,2))) AS s,
               count(*) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           (floor((CAST(g.s - CAST(e.value AS DECIMAL(18,2)) AS DOUBLE)
                   / CAST(g.n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS te_loo
    FROM events e JOIN g USING (event_type)
    ORDER BY e.event_id
    """,
    doc="Leave-one-out target encoding of event_type by the value "
    "column: per-category exact decimal sums broadcast back, each "
    "row's own target excluded — (Σ−x)/(n−1) — the LOO form that "
    "prevents target leakage in feature engineering. One tiny "
    "aggregate + one broadcast join; the encode itself is "
    "map-side arithmetic, det-rounded to hash across engines.",
)
def events_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    g = events.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        events.join(F.broadcast(g), ["event_type"])
        .select(
            "event_id",
            "event_type",
            det_round(
                (F.col("s") - F.col("value").cast("decimal(18,2)")).cast("double")
                / (F.col("n") - 1).cast("double"),
                4,
            ).alias("te_loo"),
        )
        .orderBy("event_id")
    )
