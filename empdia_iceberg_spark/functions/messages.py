"""Chat-message array transforms — Spark-native reimplementation of the
reference's message-history munging (SURVEY.md §2.A R17-R21; reference
empathy_interaction.py:181-214,236-256):

R17 normalization (content coalesced to ''), R18 role-swap
(user↔assistant, others pass through — an involution), R19 conditional
sentinel append (if the last message isn't a user turn, append an empty
user message), R20 head-slice (drop the system message), R21 reverse
scan for the last user/assistant message.

All of it is built-in array/struct expressions (``transform``,
``slice``, ``filter``, ``element_at``) over an
``ARRAY<STRUCT<role,content>>`` column — no UDF, fully codegen'd, and
at scale the only shuffle is the conversation groupBy that assembles
the array.

Conversations are derived deterministically from events: each event is
a message (even event_id → user, odd → assistant, content =
event_type), ordered by (ts, event_id), with a system message
prepended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

SYS_CONTENT = "sys"

_CONV_SQL = f"""
    SELECT user_id AS dia_id,
           list_prepend(
             {{'role': 'system', 'content': '{SYS_CONTENT}'}},
             list(
               {{'role': CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END,
                 'content': coalesce(event_type, '')}}
               ORDER BY ts, event_id)
           ) AS msgs
    FROM events
    GROUP BY user_id
"""


def conversations_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dia_id, msgs ARRAY<STRUCT<role,content>>) with a leading system msg."""
    msg = F.struct(
        F.col("ts"),
        F.col("event_id"),
        F.when(F.col("event_id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.coalesce(F.col("event_type"), F.lit("")).alias("content"),
    )
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("dia_id"))
        .agg(F.sort_array(F.collect_list(msg)).alias("ordered"))
        .select(
            "dia_id",
            F.concat(
                F.array(F.struct(F.lit("system").alias("role"), F.lit(SYS_CONTENT).alias("content"))),
                F.transform(
                    "ordered", lambda m: F.struct(m.role.alias("role"), m.content.alias("content"))
                ),
            ).alias("msgs"),
        )
    )


def role_swap(msgs_col):
    """R18: user↔assistant, others untouched (involution)."""
    return F.transform(
        msgs_col,
        lambda m: F.struct(
            F.when(m.role == "user", "assistant")
            .when(m.role == "assistant", "user")
            .otherwise(m.role)
            .alias("role"),
            m.content.alias("content"),
        ),
    )


def drop_system_head(msgs_col):
    """R20: messages[1:]."""
    return F.slice(msgs_col, 2, F.greatest(F.size(msgs_col) - 1, F.lit(0)))


def append_user_sentinel(msgs_col, sentinel: str = ""):
    """R19: ensure the history ends with a user message."""
    need = (F.size(msgs_col) == 0) | (
        F.element_at(msgs_col, -1).role != F.lit("user")
    )
    appended = F.concat(
        msgs_col,
        F.array(F.struct(F.lit("user").alias("role"), F.lit(sentinel).alias("content"))),
    )
    return F.when(need, appended).otherwise(msgs_col)


@register(
    "messages_role_swap_pipeline",
    oracle=f"""
    WITH conv AS ({_CONV_SQL}),
    sliced AS (SELECT dia_id, msgs[2:] AS body FROM conv),
    swapped AS (
        SELECT dia_id,
               list_transform(body, m -> {{
                   'role': CASE WHEN m.role = 'user' THEN 'assistant'
                                WHEN m.role = 'assistant' THEN 'user'
                                ELSE m.role END,
                   'content': m.content}}) AS body
        FROM sliced
    ),
    ready AS (
        SELECT dia_id,
               CASE WHEN len(body) = 0 OR body[-1].role <> 'user'
                    THEN list_append(body, {{'role': 'user', 'content': ''}})
                    ELSE body END AS body
        FROM swapped
    ),
    exploded AS (
        SELECT dia_id,
               unnest(range(1, len(body) + 1)) AS pos,
               unnest(body, recursive := false) AS m
        FROM ready
    )
    SELECT dia_id, pos, m.role AS role, m.content AS content
    FROM exploded
    ORDER BY dia_id, pos
    """,
    doc="Full R20→R18→R19 pipeline (head-slice, role-swap, sentinel append), exploded long.",
)
def messages_role_swap_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    conv = conversations_from_events(spark, sf_dir)
    ready = conv.select(
        "dia_id",
        append_user_sentinel(role_swap(drop_system_head(F.col("msgs")))).alias("body"),
    )
    return (
        ready.select("dia_id", F.posexplode("body").alias("pos0", "m"))
        .select(
            "dia_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("m.role").alias("role"),
            F.col("m.content").alias("content"),
        )
        .orderBy("dia_id", "pos")
    )


@register(
    "messages_last_by_role",
    oracle=f"""
    WITH conv AS ({_CONV_SQL})
    SELECT dia_id,
           len(msgs)                                                    AS n_msgs,
           list_filter(msgs, m -> m.role = 'user')[-1].content          AS last_user,
           list_filter(msgs, m -> m.role = 'assistant')[-1].content     AS last_assistant
    FROM conv
    ORDER BY dia_id
    """,
    doc="R21 reverse scan: last user / last assistant message per conversation.",
)
def messages_last_by_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    conv = conversations_from_events(spark, sf_dir)
    # try_element_at, not element_at: under Spark 4 ANSI mode,
    # element_at(empty_array, -1) RAISES — a conversation with no user
    # (or no assistant) messages would kill the query, while the oracle
    # returns NULL for that row (prep.py uses try_element_at for the
    # same reason)
    return conv.select(
        "dia_id",
        F.size("msgs").alias("n_msgs"),
        F.try_element_at(
            F.filter("msgs", lambda m: m.role == "user"), F.lit(-1)
        ).content.alias("last_user"),
        F.try_element_at(
            F.filter("msgs", lambda m: m.role == "assistant"), F.lit(-1)
        ).content.alias("last_assistant"),
    ).orderBy("dia_id")
