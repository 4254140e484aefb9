"""Stateful conversation machine — the Structured-Streaming
reimplementation of the reference's per-conversation event loop
(SURVEY.md §2.A R15/R29/R34; reference empathy_interaction.py:65-82
state init, :278-297 per-turn update, :335-336 eviction).

Keyed state per `dia_id` holds exactly the reference's D4 fields that
the termination logic needs: `turn_index` (R29 counter), running
`deepest_layer` (R27), and the trailing 5-layer history buffer (the
window the R31/R32 predicates read). Each incoming turn advances the
state and emits the termination decision with the reference's exact
precedence `empty > max_turns > no_progress_6 > perception_5`; when a
conversation's final staged turn arrives the state is evicted
(`state.remove()` — R34's `self._state.pop`).

The registered query streams the SAME events-derived turn log as the
batch `termination_flags` query — split into two files fed through two
micro-batches, so state genuinely persists across batch boundaries —
and is checked against the SAME DuckDB oracle as the batch query: the
stateful streaming path must reproduce the windowed-SQL answer
exactly.

Scale posture: state is O(active conversations) × O(1) per key (a
5-int buffer — NOT the full history), shuffled once on dia_id; this is
the shape that holds at millions of concurrent conversations.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import Window as W

from empdia_iceberg_spark.functions.termination import (
    MAX_TURNS,
    _TERMINATION_CASE,
    _TURN_LOG_SQL,
    _WINDOW_DEFS,
    turn_log_from_events,
)
from empdia_iceberg_spark.registry import register

_WORK_ROOT = os.environ.get("SPARK_GRAFT_STREAM_ROOT", "/root/repo/.stream_work")

OUTPUT_SCHEMA = (
    "dia_id bigint, turn int, layer int, terminate_reason string, deepest_layer int"
)
STATE_SCHEMA = "turn_index int, deepest int, hist array<int>"


def process_conversation(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key state transition: mirrors empathy_interaction.py:278-311
    semantics over (turn, layer, is_empty, n_turns) rows."""
    (dia_id,) = key
    if state.exists:
        turn_index, deepest, hist = state.get
        hist = list(hist)
    else:  # R15 state init
        turn_index, deepest, hist = 0, 0, []

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("turn")
    out = {k: [] for k in ("turn", "layer", "terminate_reason", "deepest_layer")}
    evict = False
    for r in rows.itertuples(index=False):
        turn_index += 1  # R29 counter (staged feed ⇒ == r.turn)
        layer = int(r.layer)
        deepest = max(deepest, layer)  # R27 running max
        trailing = hist + [layer]  # last ≤6 layers incl. current
        if bool(r.is_empty):  # precedence: empty > ...
            reason = "empty_next_user"
        elif r.turn >= MAX_TURNS:
            reason = "max_turns"
        elif len(trailing) == 6 and len(set(trailing)) == 1:
            reason = "no_progress_6"
        elif len(trailing) >= 5 and all(x == 5 for x in trailing[-5:]):
            reason = "perception_5"
        else:
            reason = ""
        out["turn"].append(int(r.turn))
        out["layer"].append(layer)
        out["terminate_reason"].append(reason)
        out["deepest_layer"].append(deepest)
        hist = trailing[-5:]  # the only window state the predicates need
        if int(r.turn) == int(r.n_turns):
            evict = True

    if evict:
        state.remove()  # R34 eviction — conversation finished
    else:
        state.update((turn_index, deepest, hist))
    yield pd.DataFrame({"dia_id": dia_id, **out})


@register(
    "stream_conversation_state",
    oracle=f"""
    WITH log AS ({_TURN_LOG_SQL})
    SELECT dia_id, turn, layer,
           {_TERMINATION_CASE} AS terminate_reason,
           max(layer) OVER wrun AS deepest_layer
    FROM log
    {_WINDOW_DEFS}
    ORDER BY dia_id, turn
    """,
    doc="Stateful streaming conversation machine (applyInPandasWithState, "
    "two real micro-batches with cross-batch keyed state + eviction) — "
    "must reproduce the batch termination_flags windowed-SQL answer.",
)
def stream_conversation_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stage the turn log (with per-conversation turn counts for eviction)
    # as two files split mid-conversation, so keyed state must carry
    # turn counters and trailing layers across the batch boundary.
    log = turn_log_from_events(spark, sf_dir).withColumn(
        "n_turns", F.max("turn").over(W.partitionBy("dia_id"))
    )
    feed = os.path.join(_WORK_ROOT, "conv_feed")
    shutil.rmtree(feed, ignore_errors=True)
    log.filter(F.col("turn") <= 10).write.parquet(feed)

    for q in spark.streams.active:
        if q.name == "t_conv":
            q.stop()
    spark.catalog.dropTempView("t_conv") if "t_conv" in [
        t.name for t in spark.catalog.listTables()
    ] else None
    ckpt = os.path.join(_WORK_ROOT, f"conv_ckpt_{uuid.uuid4().hex[:8]}")

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(feed)
        .groupBy("dia_id")
        .applyInPandasWithState(
            process_conversation,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.queryName("t_conv")
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # micro-batch 1: turns 1-10, state persists
        log.filter(F.col("turn") > 10).write.mode("append").parquet(feed)
        q.processAllAvailable()  # micro-batch 2: turns 11+, state resumes, evicts
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table("t_conv")
        .select("dia_id", "turn", "layer", "terminate_reason", "deepest_layer")
        .orderBy("dia_id", "turn")
    )
