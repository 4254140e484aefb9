"""Group-relative (GRPO-style) advantage normalization — SURVEY.md §2.A
R43. The reference only configures this (VERL implements it): n
rollouts per prompt form a group; each reward is normalized to
(r − mean(group)) / (std(group) + ε).

Spark-native batch form: one hash aggregate for the group moments +
a join back (at scale the moments table is tiny relative to the
samples, so AQE broadcasts it — a single shuffle on the group key).

Cross-engine determinism: group mean and std are derived from DECIMAL
sums (exact, order-independent) followed by double arithmetic written
in the same operation order in Spark and in the oracle SQL, so the
resulting doubles match bit-for-bit — double `avg()`/`stddev()` vary
by summation order between engines and straddle rounding boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

EPS = 1e-6


def grpo_advantages(
    samples: DataFrame, group_cols: list[str], reward_col: str
) -> DataFrame:
    """Append group mean/std (decimal-sum derived) and the advantage."""
    dec = F.col(reward_col).cast("decimal(18,2)")
    moments = samples.groupBy(*group_cols).agg(
        F.sum(dec).cast("double").alias("_sum"),
        F.sum(dec * dec).cast("double").alias("_sumsq"),
        F.count(F.lit(1)).alias("group_n"),
    )
    n = F.col("group_n")
    mean = F.col("_sum") / n
    var = F.when(
        n > 1,
        F.greatest(
            (F.col("_sumsq") - F.col("_sum") * F.col("_sum") / n) / (n - 1), F.lit(0.0)
        ),
    ).otherwise(F.lit(0.0))
    moments = moments.withColumn("group_mean", mean).withColumn("group_std", F.sqrt(var))
    return samples.join(moments, group_cols).withColumn(
        "advantage",
        (F.col(reward_col) - F.col("group_mean")) / (F.col("group_std") + F.lit(EPS)),
    )


@register(
    "grpo_group_normalize",
    oracle=f"""
    WITH moments AS (
        SELECT user_id, event_type,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)       AS _sum,
               CAST(sum(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) AS DOUBLE)     AS _sumsq,
               count(*)                                                AS group_n
        FROM events
        GROUP BY user_id, event_type
    ),
    stats AS (
        SELECT user_id, event_type, group_n,
               _sum / group_n AS group_mean,
               sqrt(CASE WHEN group_n > 1
                         THEN greatest((_sumsq - _sum * _sum / group_n) / (group_n - 1), 0.0)
                         ELSE 0.0 END) AS group_std
        FROM moments
    )
    SELECT e.event_id, e.user_id, e.event_type,
           round(e.value, 4)                                           AS reward,
           floor(m.group_mean * 10000.0 + 0.5) / 10000.0               AS group_mean,
           m.group_n                                                   AS group_n,
           floor((e.value - m.group_mean) / (m.group_std + {EPS}) * 10000.0 + 0.5) / 10000.0 AS advantage
    FROM events e
    JOIN stats m USING (user_id, event_type)
    ORDER BY e.event_id
    """,
    doc="GRPO group-relative advantage (R43): (r - mean)/(std + eps) within (user, type) groups.",
)
def grpo_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = grpo_advantages(ev, ["user_id", "event_type"], "value")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 4).alias("reward"),
        det_round(F.col("group_mean"), 4).alias("group_mean"),
        "group_n",
        det_round(F.col("advantage"), 4).alias("advantage"),
    ).orderBy("event_id")


@register(
    "grpo_pairwise_n2",
    oracle=f"""
    WITH pairs AS (
        SELECT event_id, value,
               CAST(event_id // 2 AS BIGINT) AS prompt_id,
               CAST(event_id % 2 AS INT)     AS rollout_idx
        FROM events
    ),
    moments AS (
        SELECT prompt_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS _sum,
               CAST(sum(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS _sumsq,
               count(*) AS group_n
        FROM pairs
        GROUP BY prompt_id
    ),
    stats AS (
        SELECT prompt_id, group_n,
               _sum / group_n AS group_mean,
               sqrt(CASE WHEN group_n > 1
                         THEN greatest((_sumsq - _sum * _sum / group_n) / (group_n - 1), 0.0)
                         ELSE 0.0 END) AS group_std
        FROM moments
    )
    SELECT p.prompt_id, p.rollout_idx,
           round(p.value, 4) AS reward,
           CAST(m.group_n AS BIGINT) AS group_n,
           floor((p.value - m.group_mean) / (m.group_std + {EPS}) * 10000.0 + 0.5) / 10000.0 AS advantage
    FROM pairs p JOIN stats m USING (prompt_id)
    ORDER BY p.prompt_id, p.rollout_idx
    """,
    doc="GRPO with the reference's ACTUAL group shape — n=2 rollouts per "
    "prompt (train.sh:50, rollout.n=2): consecutive event pairs form a "
    "prompt group; within a pair the advantages are symmetric "
    "±(r−mean)/(std+eps). Same decimal-exact moment math as the general "
    "form.",
)
def grpo_pairwise_n2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(
        "event_id",
        "value",
        (F.col("event_id") / 2).cast("long").alias("prompt_id"),
        (F.col("event_id") % 2).cast("int").alias("rollout_idx"),
    )
    out = grpo_advantages(pairs, ["prompt_id"], "value")
    return out.select(
        "prompt_id",
        "rollout_idx",
        F.round("value", 4).alias("reward"),
        F.col("group_n").cast("bigint").alias("group_n"),
        det_round(F.col("advantage"), 4).alias("advantage"),
    ).orderBy("prompt_id", "rollout_idx")
