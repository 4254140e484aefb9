"""Trajectory reward pipeline — Spark-native reimplementation of the
reference semantics (SURVEY.md §2.A R35-R40; reference reward.py:6-69):

per turn t with layer L_t, confidence c_t and previous layer P_t
(P_1 = L_1, i.e. seeded from the first entry):

    depth    = L_t / 5
    progress = max(L_t - P_t, 0) / 5
    regress  = max(P_t - L_t, 0) / 5
    skip     = max(L_t - (P_t + 1), 0) / 5
    raw      = (depth + β·progress − δ·regress − w·skip) · (0.5 + 0.5·c_t)
    score_t  = σ(k·(raw − c))        # sigmoid
    reward   = mean_t(score_t), gated to 0.0 when n_turns < 5

Everything is built-in column arithmetic over a lag window — no UDF in
the SQL path (whole-stage codegen keeps it JVM-side); a grouped-map
pandas variant exists as the UDF-path cross-check (SURVEY §2.B).

At 100 TB the layer history is a long-format table partitioned by
conversation; the only shuffle is the single hash exchange on dia_id
shared by the lag window and the final aggregate (Catalyst reuses the
partitioning between the two).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, exact_sum_r6, sql_sum_r6
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

DEFAULTS = dict(beta=0.7, delta=0.6, w=5.0, k=8.0, c=0.5, max_depth=5.0)
MIN_TURNS = 5

# Deterministic layer-history derivation from the events table, shared
# by the Spark queries and the DuckDB oracles (same arithmetic).
LAYER_HISTORY_SQL = """
    SELECT user_id                                                            AS dia_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)     AS turn,
           CAST(event_id % 5 + 1 AS INT)                                      AS layer,
           0.5 + (event_id % 50) / 100.0                                      AS confidence
    FROM events
"""


def layer_history_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a long-format layer_history(dia_id, turn, layer, confidence)
    deterministically from events — the fixture shape of FIXTURES.md B3."""
    ev = load(spark, sf_dir, "events")
    # Rename BEFORE the window: partitioning the turn numbering on the
    # final key name lets every downstream dia_id window/aggregate reuse
    # this one exchange (an alias after the window reads as a different
    # attribute and forces a second shuffle — verified in test_plans).
    base = ev.select(F.col("user_id").alias("dia_id"), "ts", "event_id")
    w = W.partitionBy("dia_id").orderBy("ts", "event_id")
    return base.select(
        "dia_id",
        F.row_number().over(w).alias("turn"),
        (F.col("event_id") % 5 + 1).cast("int").alias("layer"),
        (F.lit(0.5) + (F.col("event_id") % 50) / 100.0).alias("confidence"),
    )


def per_turn_scores(lh: DataFrame, **cfg) -> DataFrame:
    """Append per-turn ``score`` to a layer_history DataFrame.

    Pure built-in expressions (reference reward.py:47-64 semantics).
    """
    p = {**DEFAULTS, **cfg}
    w = W.partitionBy("dia_id").orderBy("turn")
    last = F.coalesce(F.lag("layer").over(w), F.col("layer"))
    md = F.lit(p["max_depth"])
    depth = F.col("layer") / md
    progress = F.greatest(F.col("layer") - last, F.lit(0)) / md
    regress = F.greatest(last - F.col("layer"), F.lit(0)) / md
    skip = F.greatest(F.col("layer") - (last + 1), F.lit(0)) / md
    raw = (
        depth + F.lit(p["beta"]) * progress - F.lit(p["delta"]) * regress
        - F.lit(p["w"]) * skip
    ) * (F.lit(0.5) + F.lit(0.5) * F.col("confidence"))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(p["k"]) * (raw - F.lit(p["c"]))))
    return lh.withColumn("score", score)


def trajectory_reward(lh: DataFrame, min_turns: int = MIN_TURNS, **cfg) -> DataFrame:
    """One row per dia_id: n_turns + gated mean score (reward.py:24-26,69).

    The mean uses `exact_sum_r6` (per-turn scores det-rounded to 6
    digits, summed as DECIMAL) so the value is independent of summation
    order — a raw double avg() varies by ±1 ulp between Spark partials
    and the DuckDB oracle's scan order and can flip det_round at a
    rounding boundary.
    """
    scored = per_turn_scores(lh, **cfg)
    return scored.groupBy("dia_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.when(F.count(F.lit(1)) < min_turns, F.lit(0.0))
        .otherwise(exact_sum_r6(F.col("score")) / F.count(F.lit(1)))
        .alias("reward"),
    )


_SCORE_SQL_EXPR = """
        1.0 / (1.0 + exp(-8.0 * (
            ( layer / 5.0
              + 0.7 * greatest(layer - last_layer, 0) / 5.0
              - 0.6 * greatest(last_layer - layer, 0) / 5.0
              - 5.0 * greatest(layer - (last_layer + 1), 0) / 5.0
            ) * (0.5 + 0.5 * confidence) - 0.5)))
"""

_REWARD_ORACLE = f"""
    WITH lh AS ({LAYER_HISTORY_SQL}),
    lagged AS (
        SELECT dia_id, turn, layer, confidence,
               coalesce(lag(layer) OVER (PARTITION BY dia_id ORDER BY turn), layer) AS last_layer
        FROM lh
    ),
    scored AS (
        SELECT dia_id, {_SCORE_SQL_EXPR} AS score FROM lagged
    )
    SELECT dia_id,
           count(*) AS n_turns,
           floor((CASE WHEN count(*) < 5 THEN 0.0 ELSE {sql_sum_r6('score')} / count(*) END) * 1000000.0 + 0.5) / 1000000.0 AS reward
    FROM scored
    GROUP BY dia_id
    ORDER BY dia_id
"""


@register(
    "reward_trajectory",
    oracle=_REWARD_ORACLE,
    doc="Reference reward pipeline R35-R40 over events-derived layer_history (lag window + sigmoid + gated mean).",
)
def reward_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    lh = layer_history_from_events(spark, sf_dir)
    out = trajectory_reward(lh)
    return out.select(
        "dia_id", "n_turns", det_round(F.col("reward"), 6).alias("reward")
    ).orderBy("dia_id")


@register(
    "reward_per_turn_scores",
    oracle=f"""
    WITH lh AS ({LAYER_HISTORY_SQL}),
    lagged AS (
        SELECT dia_id, turn, layer, confidence,
               coalesce(lag(layer) OVER (PARTITION BY dia_id ORDER BY turn), layer) AS last_layer
        FROM lh
    )
    SELECT dia_id, turn, layer,
           floor(({_SCORE_SQL_EXPR}) * 1000000.0 + 0.5) / 1000000.0 AS score
    FROM lagged
    ORDER BY dia_id, turn
    """,
    doc="Per-turn lag features + sigmoid score (R38/R39), long format.",
)
def reward_per_turn_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    lh = layer_history_from_events(spark, sf_dir)
    return per_turn_scores(lh).select(
        "dia_id", "turn", "layer", det_round(F.col("score"), 6).alias("score")
    ).orderBy("dia_id", "turn")


def _reward_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map pandas cross-check of the pure-SQL reward (same math,
    Arrow-batched; demonstrates the UDF path of SURVEY §2.B)."""
    import numpy as np

    p = DEFAULTS
    pdf = pdf.sort_values("turn")
    layer = pdf["layer"].to_numpy(dtype=np.float64)
    conf = pdf["confidence"].to_numpy(dtype=np.float64)
    last = np.roll(layer, 1)
    if len(layer):
        last[0] = layer[0]
    md = p["max_depth"]
    raw = (
        layer / md
        + p["beta"] * np.maximum(layer - last, 0) / md
        - p["delta"] * np.maximum(last - layer, 0) / md
        - p["w"] * np.maximum(layer - (last + 1), 0) / md
    ) * (0.5 + 0.5 * conf)
    score = 1.0 / (1.0 + np.exp(-p["k"] * (raw - p["c"])))
    n = len(layer)
    # Mirror exact_sum_r6 bit-for-bit: det-round each score to 6 digits
    # (floor(x·1e6+0.5) — exact integers in float64), sum exactly, then
    # the same double divisions the SQL path performs.
    units = np.floor(score * 1e6 + 0.5)
    reward = 0.0 if n < MIN_TURNS else (float(units.sum()) / 1e6) / n
    return pd.DataFrame(
        {"dia_id": [pdf["dia_id"].iloc[0]], "n_turns": [n], "reward": [reward]}
    )


@register(
    "reward_fallback_mean",
    oracle=f"""
    WITH lh AS ({LAYER_HISTORY_SQL}),
    per_turn AS (
        SELECT dia_id, turn, (dia_id * 31 + turn) % 100 / 100.0 AS turn_reward
        FROM lh
    )
    SELECT dia_id,
           count(*) AS n_turns,
           floor((CASE WHEN count(*) < 5 THEN 0.0
                       ELSE CAST(sum(CAST(turn_reward AS DECIMAL(18,2))) AS DOUBLE) / count(*) END) * 1000000.0 + 0.5) / 1000000.0
             AS fallback_reward
    FROM per_turn
    GROUP BY dia_id
    ORDER BY dia_id
    """,
    doc="R36 array-mean fallback (reward.py:29-33): when a trajectory has "
    "no layer history, the reward is mean(user_turn_rewards) — computed "
    "the reference's way, as an ARRAY aggregate (collect_list in turn "
    "order + F.aggregate sum / size), gated by the R35 min-turns rule.",
)
def reward_fallback_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    lh = layer_history_from_events(spark, sf_dir)
    per_turn = lh.select(
        "dia_id",
        "turn",
        ((F.col("dia_id") * 31 + F.col("turn")) % 100 / 100.0).alias("turn_reward"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct("turn", "turn_reward"))
    )  # rebuild the reference's ordered rewards list
    return (
        per_turn.groupBy("dia_id")
        .agg(F.count(F.lit(1)).alias("n_turns"), arr.alias("_arr"))
        .select(
            "dia_id",
            "n_turns",
            det_round(
                # Fold in DECIMAL (exact, order-independent): turn_reward
                # is exactly 2-decimal, so the ordered array fold equals
                # the oracle's unordered decimal sum bit-for-bit. A raw
                # double fold is order-sensitive and flips det_round at
                # .5 boundaries (reachable here: 32 turns, odd sum).
                F.when(F.col("n_turns") < MIN_TURNS, F.lit(0.0)).otherwise(
                    F.aggregate(
                        F.transform(
                            F.col("_arr"), lambda s: s.turn_reward.cast("decimal(18,2)")
                        ),
                        F.lit(0).cast("decimal(28,2)"),
                        lambda a, x: (a + x).cast("decimal(28,2)"),
                    ).cast("double")
                    / F.size("_arr")
                ),
                6,
            ).alias("fallback_reward"),
        )
        .orderBy("dia_id")
    )


@register(
    "reward_config_coalesce",
    oracle=f"""
    WITH lh AS ({LAYER_HISTORY_SQL}),
    cfg AS (
        SELECT *,
               CASE WHEN dia_id % 2 = 0 THEN CAST(0.9 AS DOUBLE) END  AS beta_cfg,
               CASE WHEN dia_id % 3 = 0 THEN CAST(10.0 AS DOUBLE) END AS k_cfg
        FROM lh
    ),
    eff AS (
        SELECT dia_id, turn, layer, confidence,
               coalesce(beta_cfg, CAST(0.7 AS DOUBLE)) AS beta_eff,
               coalesce(k_cfg, CAST(8.0 AS DOUBLE))    AS k_eff,
               coalesce(lag(layer) OVER (PARTITION BY dia_id ORDER BY turn), layer) AS last_layer
        FROM cfg
    ),
    scored AS (
        SELECT dia_id, beta_eff, k_eff,
               1.0 / (1.0 + exp(-k_eff * (
                   ( layer / 5.0
                     + beta_eff * greatest(layer - last_layer, 0) / 5.0
                     - 0.6 * greatest(last_layer - layer, 0) / 5.0
                     - 5.0 * greatest(layer - (last_layer + 1), 0) / 5.0
                   ) * (0.5 + 0.5 * confidence) - 0.5))) AS score
        FROM eff
    )
    SELECT dia_id,
           max(beta_eff) AS beta_eff,
           max(k_eff)    AS k_eff,
           floor((CASE WHEN count(*) < 5 THEN 0.0 ELSE {sql_sum_r6('score')} / count(*) END) * 1000000.0 + 0.5) / 1000000.0 AS reward
    FROM scored
    GROUP BY dia_id
    ORDER BY dia_id
    """,
    doc="R37 column-level config coalescing (reward.py:36-45): per-row "
    "reward_config overrides (NULL = absent) coalesced onto the defaults "
    "with coalesce(col, default), feeding the same scoring pipeline.",
)
def reward_config_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    lh = layer_history_from_events(spark, sf_dir)
    beta_eff = F.coalesce(
        F.when(F.col("dia_id") % 2 == 0, F.lit(0.9)), F.lit(DEFAULTS["beta"])
    )
    k_eff = F.coalesce(
        F.when(F.col("dia_id") % 3 == 0, F.lit(10.0)), F.lit(DEFAULTS["k"])
    )
    w = W.partitionBy("dia_id").orderBy("turn")
    last = F.coalesce(F.lag("layer").over(w), F.col("layer"))
    raw = (
        F.col("layer") / 5.0
        + beta_eff * F.greatest(F.col("layer") - last, F.lit(0)) / 5.0
        - F.lit(DEFAULTS["delta"]) * F.greatest(last - F.col("layer"), F.lit(0)) / 5.0
        - F.lit(DEFAULTS["w"]) * F.greatest(F.col("layer") - (last + 1), F.lit(0)) / 5.0
    ) * (F.lit(0.5) + F.lit(0.5) * F.col("confidence"))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-k_eff * (raw - F.lit(DEFAULTS["c"]))))
    scored = lh.select(
        "dia_id", beta_eff.alias("beta_eff"), k_eff.alias("k_eff"), score.alias("score")
    )
    return (
        scored.groupBy("dia_id")
        .agg(
            F.max("beta_eff").alias("beta_eff"),
            F.max("k_eff").alias("k_eff"),
            det_round(
                # order-independent mean — see trajectory_reward
                F.when(F.count(F.lit(1)) < MIN_TURNS, F.lit(0.0)).otherwise(
                    exact_sum_r6(F.col("score")) / F.count(F.lit(1))
                ),
                6,
            ).alias("reward"),
        )
        .orderBy("dia_id")
    )


@register(
    "reward_trajectory_pandas",
    oracle=_REWARD_ORACLE,
    doc="Same reward pipeline via grouped-map pandas UDF (applyInPandas) — UDF-path cross-check.",
)
def reward_trajectory_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    lh = layer_history_from_events(spark, sf_dir)
    out = lh.groupBy("dia_id").applyInPandas(
        _reward_pdf, schema="dia_id bigint, n_turns bigint, reward double"
    )
    return out.select(
        "dia_id", "n_turns", det_round(F.col("reward"), 6).alias("reward")
    ).orderBy("dia_id")
