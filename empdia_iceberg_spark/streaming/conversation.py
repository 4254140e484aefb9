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

from empdia_iceberg_spark.streaming.windows import work_root

OUTPUT_SCHEMA = (
    "dia_id bigint, turn int, layer int, terminate_reason string, deepest_layer int"
)
STATE_SCHEMA = "turn_index int, deepest int, hist array<int>"


def advance_conversation(
    state: tuple | None, rows: pd.DataFrame
) -> tuple[dict, tuple | None]:
    """Pure per-key state transition shared by BOTH stateful APIs:
    mirrors empathy_interaction.py:278-311 semantics over
    (turn, layer, is_empty, n_turns) rows. Returns (output columns,
    new state or None-to-evict)."""
    if state is not None:
        turn_index, deepest, hist = state
        hist = list(hist)
    else:  # R15 state init
        turn_index, deepest, hist = 0, 0, []

    rows = rows.sort_values("turn")
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

    return out, (None if evict else (turn_index, deepest, hist))


def process_conversation(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState wrapper around advance_conversation."""
    (dia_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    out, new_state = advance_conversation(state.get if state.exists else None, rows)
    if new_state is None:
        state.remove()  # R34 eviction — conversation finished
    else:
        state.update(new_state)
    yield pd.DataFrame({"dia_id": dia_id, **out})


_CONV_ORACLE = f"""
    WITH log AS ({_TURN_LOG_SQL})
    SELECT dia_id, turn, layer,
           {_TERMINATION_CASE} AS terminate_reason,
           max(layer) OVER wrun AS deepest_layer
    FROM log
    {_WINDOW_DEFS}
    ORDER BY dia_id, turn
"""


def _run_conversation_stream(
    spark: SparkSession, sf_dir: str, name: str, build_stateful
) -> DataFrame:
    """Stage the turn log (with per-conversation turn counts for
    eviction) as two files split mid-conversation — keyed state must
    carry turn counters and trailing layers across the micro-batch
    boundary — then drain `build_stateful(grouped_stream)` to a memory
    sink."""
    log = turn_log_from_events(spark, sf_dir).withColumn(
        "n_turns", F.max("turn").over(W.partitionBy("dia_id"))
    )
    feed = os.path.join(work_root(), f"{name}_feed")
    shutil.rmtree(feed, ignore_errors=True)
    log.filter(F.col("turn") <= 10).write.parquet(feed)

    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = os.path.join(work_root(), f"{name}_ckpt_{uuid.uuid4().hex[:8]}")

    schema = spark.read.parquet(feed).schema
    stream = build_stateful(
        spark.readStream.schema(schema).parquet(feed).groupBy("dia_id")
    )
    q = (
        stream.writeStream.queryName(name)
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # micro-batch 1: turns 1-10, state persists
        # Live append without atomic staging is safe HERE (unlike
        # streaming/ewma.py, which stages via append_atomically): the
        # dia_id window shuffle above hash-partitions the log, so one
        # conversation's phase-2 turns sit in exactly ONE part file — a
        # trigger listing a half-committed job can split conversations
        # ACROSS batches but never split one conversation's turns, and
        # per-key arrival order is all the keyed state relies on.
        log.filter(F.col("turn") > 10).write.mode("append").parquet(feed)
        q.processAllAvailable()  # micro-batch 2: turns 11+, state resumes, evicts
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table(name)
        .select("dia_id", "turn", "layer", "terminate_reason", "deepest_layer")
        .orderBy("dia_id", "turn")
    )


@register(
    "stream_conversation_state",
    oracle=_CONV_ORACLE,
    doc="Stateful streaming conversation machine (applyInPandasWithState, "
    "two real micro-batches with cross-batch keyed state + eviction) — "
    "must reproduce the batch termination_flags windowed-SQL answer.",
)
def stream_conversation_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_conversation_stream(
        spark,
        sf_dir,
        "t_conv",
        lambda grouped: grouped.applyInPandasWithState(
            process_conversation,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        ),
    )


class ConversationProcessor:
    """transformWithStateInPandas processor (Spark 4 arbitrary-state
    API, RocksDB-backed): same transition function, ValueState handle.
    Defined lazily-importing so module import works without a session."""

    def __new__(cls):
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        class _P(StatefulProcessor):
            def init(self, handle) -> None:
                self._state = handle.getValueState("conv", STATE_SCHEMA)

            def handleInputRows(self, key, rows, timerValues):
                rows = pd.concat(list(rows), ignore_index=True)
                prev = self._state.get() if self._state.exists() else None
                out, new_state = advance_conversation(prev, rows)
                if new_state is None:
                    self._state.clear()  # R34 eviction
                else:
                    self._state.update(new_state)
                yield pd.DataFrame({"dia_id": key[0], **out})

            def close(self) -> None:
                pass

        return _P()


def stream_conversation_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same conversation machine on the Spark 4 transformWithState API
    (StatefulProcessor + ValueState, RocksDB state store).

    NOT registered as a driver query: the TWS Python driver worker
    requires `google.protobuf`, which is broken in this container
    (ImportError: cannot import name 'descriptor'), so the query
    crashes at runtime here. Verified unusable 2026-08-13; the
    applyInPandasWithState form above is the checked path, and this
    function is the drop-in upgrade where protobuf is available —
    `advance_conversation` is shared, so semantics are identical."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return _run_conversation_stream(
            spark,
            sf_dir,
            "t_conv_tws",
            lambda grouped: grouped.transformWithStateInPandas(
                statefulProcessor=ConversationProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            ),
        )
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            # previously UNSET: restore that, don't leave RocksDB pinned
            # session-wide for every later streaming query
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
