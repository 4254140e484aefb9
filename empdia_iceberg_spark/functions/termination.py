"""Termination predicates — Spark-native reimplementation of the
reference's per-turn termination decision (SURVEY.md §2.A R28, R30-R32;
reference empathy_interaction.py:299-311), with the exact precedence

    empty_next_user > max_turns > no_progress_6 > perception_5

- no_progress_6: the trailing 6 layers exist and are all identical;
- perception_5: the trailing 5 layers are all == 5 (only checked when
  no earlier reason fired — so 6 consecutive 5s yields no_progress_6).

Batch form: trailing row-frame windows over a per-conversation turn
log. The "empty generated turn" condition is simulated deterministically
as event_type = 'error' (the events table has no text payload).

Also includes R27 (running deepest layer). One shuffle on dia_id,
shared by all the windows (same partitioning/ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

MAX_TURNS = 20

# Events-derived turn log with the simulated "empty turn" flag.
_TURN_LOG_SQL = """
    SELECT user_id                                                            AS dia_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)     AS turn,
           CAST(event_id % 5 + 1 AS INT)                                      AS layer,
           (event_type = 'error')                                             AS is_empty,
           props                                                              AS next_user
    FROM events
"""


def turn_log_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # rename before the window so one dia_id exchange serves the whole
    # pipeline (see reward.layer_history_from_events)
    base = ev.select(
        F.col("user_id").alias("dia_id"), "ts", "event_id", "event_type", "props"
    )
    w = W.partitionBy("dia_id").orderBy("ts", "event_id")
    return base.select(
        "dia_id",
        F.row_number().over(w).alias("turn"),
        (F.col("event_id") % 5 + 1).cast("int").alias("layer"),
        (F.col("event_type") == "error").alias("is_empty"),
        F.col("props").alias("next_user"),  # the turn's "user text" stand-in
    )


def with_termination(log: DataFrame, max_turns: int = MAX_TURNS) -> DataFrame:
    """Append ``terminate_reason`` (empty string = keep going) and the
    running ``deepest_layer`` to a (dia_id, turn, layer, is_empty) log."""
    w = W.partitionBy("dia_id").orderBy("turn")
    w6 = w.rowsBetween(-5, 0)
    w5 = w.rowsBetween(-4, 0)
    wrun = w.rowsBetween(W.unboundedPreceding, 0)

    no_progress_6 = (
        (F.count(F.lit(1)).over(w6) == 6)
        & (F.min("layer").over(w6) == F.max("layer").over(w6))
    )
    perception_5 = (
        (F.count(F.lit(1)).over(w5) == 5)
        & (F.min("layer").over(w5) == 5)
        & (F.max("layer").over(w5) == 5)
    )
    reason = (
        F.when(F.col("is_empty"), "empty_next_user")
        .when(F.col("turn") >= max_turns, "max_turns")
        .when(no_progress_6, "no_progress_6")
        .when(perception_5, "perception_5")
        .otherwise("")
    )
    return log.withColumn("terminate_reason", reason).withColumn(
        "deepest_layer", F.max("layer").over(wrun)
    )


_TERMINATION_CASE = """
    CASE
      WHEN is_empty THEN 'empty_next_user'
      WHEN turn >= 20 THEN 'max_turns'
      WHEN count(*) OVER w6 = 6
           AND min(layer) OVER w6 = max(layer) OVER w6 THEN 'no_progress_6'
      WHEN count(*) OVER w5 = 5
           AND min(layer) OVER w5 = 5 AND max(layer) OVER w5 = 5 THEN 'perception_5'
      ELSE ''
    END
"""

_WINDOW_DEFS = """
    WINDOW w6 AS (PARTITION BY dia_id ORDER BY turn ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
           w5 AS (PARTITION BY dia_id ORDER BY turn ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
           wrun AS (PARTITION BY dia_id ORDER BY turn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "termination_flags",
    oracle=f"""
    WITH log AS ({_TURN_LOG_SQL})
    SELECT dia_id, turn, layer,
           {_TERMINATION_CASE} AS terminate_reason,
           max(layer) OVER wrun AS deepest_layer
    FROM log
    {_WINDOW_DEFS}
    ORDER BY dia_id, turn
    """,
    doc="Per-turn termination decision R28/R30-R32 (precedence-exact) + running deepest layer R27.",
)
def termination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = turn_log_from_events(spark, sf_dir)
    return with_termination(log).select(
        "dia_id", "turn", "layer", "terminate_reason", "deepest_layer"
    ).orderBy("dia_id", "turn")


@register(
    "termination_first_stop",
    oracle=f"""
    WITH log AS ({_TURN_LOG_SQL}),
    flagged AS (
        SELECT dia_id, turn,
               {_TERMINATION_CASE} AS terminate_reason
        FROM log
        {_WINDOW_DEFS}
    )
    SELECT dia_id,
           min(turn)                      AS stop_turn,
           min_by(terminate_reason, turn) AS stop_reason
    FROM flagged
    WHERE terminate_reason <> ''
    GROUP BY dia_id
    ORDER BY dia_id
    """,
    doc="First firing termination per conversation (R33 metrics emission shape).",
)
def termination_first_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = turn_log_from_events(spark, sf_dir)
    flagged = with_termination(log).filter(F.col("terminate_reason") != "")
    return (
        flagged.groupBy("dia_id")
        .agg(
            F.min("turn").alias("stop_turn"),
            F.min_by("terminate_reason", "turn").alias("stop_reason"),
        )
        .orderBy("dia_id")
    )


@register(
    "trajectory_metrics",
    oracle=f"""
    WITH log AS ({_TURN_LOG_SQL}),
    flagged AS (
        SELECT dia_id, turn, layer, next_user,
               {_TERMINATION_CASE} AS terminate_reason
        FROM log
        {_WINDOW_DEFS}
    )
    SELECT dia_id,
           max(turn)                 AS num_turns,
           max_by(layer, turn)       AS last_layer,
           max(layer)                AS deepest_layer,
           floor(CAST(sum(layer) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_layer,
           substr(max_by(next_user, turn), 1, 64) AS next_user_preview,
           coalesce(min_by(terminate_reason, turn) FILTER (terminate_reason <> ''), '')
             AS stop_reason
    FROM flagged
    GROUP BY dia_id
    ORDER BY dia_id
    """,
    doc="Per-trajectory metrics summary (R33/D6, full shape per "
    "empathy_interaction.py:319-328): turn count, last/deepest layer, "
    "64-char preview of the final turn text, and the first firing "
    "terminate_reason ('' when the conversation never terminated).",
)
def trajectory_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = with_termination(turn_log_from_events(spark, sf_dir))
    first_stop = F.min(
        F.when(
            F.col("terminate_reason") != "",
            F.struct("turn", "terminate_reason"),
        )
    )
    return (
        log.groupBy("dia_id")
        .agg(
            F.max("turn").alias("num_turns"),
            F.max_by("layer", "turn").alias("last_layer"),
            F.max("layer").alias("deepest_layer"),
            det_round(F.sum("layer").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_layer"
            ),
            F.substring(F.max_by("next_user", "turn"), 1, 64).alias(
                "next_user_preview"
            ),
            F.coalesce(first_stop.getField("terminate_reason"), F.lit("")).alias(
                "stop_reason"
            ),
        )
        .orderBy("dia_id")
    )
