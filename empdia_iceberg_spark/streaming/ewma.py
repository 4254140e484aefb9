"""Streaming EWMA-16: the stateful-streaming twin of
`operators/windows.py:events_ewma16_user`, via applyInPandasWithState.

Keyed state per user is a ring buffer of the last ≤16 values — O(1)
per key, the state shape that holds at millions of users — carried
across real micro-batch boundaries (the feed is staged as two files
split on an event-time boundary, so batch 2 resumes mid-series for
most users).

The per-row smoothing uses the SAME exact integer arithmetic as the
batch operator — Σ (100x)·5^k·10^(16−k) over denominator 10¹⁸, k the
lag+1 — evaluated with Python arbitrary-precision ints, then ONE
int→float conversion and ONE IEEE division, exactly the
decimal→double→÷1e18 sequence the batch plan performs. Both paths
therefore register the IDENTICAL DuckDB oracle: the streaming answer
must hash-match the batch windowed answer, not merely approximate it.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from empdia_iceberg_spark.operators.windows import EWMA16_ORACLE
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

from empdia_iceberg_spark.streaming.windows import work_root

OUTPUT_SCHEMA = "event_id bigint, user_id bigint, ewma16 double"
STATE_SCHEMA = "vals array<double>"


# The 16 possible integer weights 5^k · 10^(16-k), k = 1..16 — constant,
# precomputed once: recomputing two bigint pows per element of every
# row's window inside the applyInPandasWithState worker was pure
# per-row overhead for identical values.
_EWMA_W = [5**k * 10 ** (16 - k) for k in range(17)]


def ewma16_exact(vals: list[float]) -> float:
    """Exact-integer EWMA-16 of a ≤16-element window (oldest first):
    mirrors the batch plan's DECIMAL fold bit-for-bit — Python ints are
    exact, float(int) and the final /1e18 are the same two correctly-
    rounded conversions the JVM performs, and floor(x·1e6+0.5)/1e6 is
    `det_round(…, 6)`."""
    n = len(vals)
    total = 0
    for i, v in enumerate(vals):
        k = n - i  # lag + 1: latest element gets k=1
        total += int(math.floor(v * 100 + 0.5)) * _EWMA_W[k]
    x = float(total) / 1e18
    return math.floor(x * 1e6 + 0.5) / 1e6


def process_user_series(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    vals: list[float] = list(state.get[0]) if state.exists else []
    out_ids: list[int] = []
    out_ewma: list[float] = []
    for r in rows.itertuples(index=False):
        vals.append(float(r.value))
        vals = vals[-16:]
        out_ids.append(int(r.event_id))
        out_ewma.append(ewma16_exact(vals))
    state.update((vals,))
    yield pd.DataFrame(
        {"event_id": out_ids, "user_id": user_id, "ewma16": out_ewma}
    )


@register(
    "stream_ewma16_state",
    oracle=EWMA16_ORACLE,
    doc="Stateful-streaming EWMA-16 (applyInPandasWithState, two real "
    "micro-batches split on an event-time boundary, ≤16-value ring "
    "buffer state per user) — must hash-match the batch "
    "events_ewma16_user oracle exactly, via the same exact integer "
    "arithmetic.",
)
def stream_ewma16_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    name = "t_ewma16"
    feed = os.path.join(work_root(), f"{name}_feed")
    shutil.rmtree(feed, ignore_errors=True)
    # event-time split: batch 1 = first week, batch 2 = the rest, so
    # per-user series genuinely straddle the micro-batch boundary
    boundary = "2024-01-08"
    events.filter(F.col("ts") < boundary).write.parquet(feed)

    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = os.path.join(work_root(), f"{name}_ckpt_{uuid.uuid4().hex[:8]}")

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(feed)
        .groupBy("user_id")
        .applyInPandasWithState(
            process_user_series,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.queryName(name)
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # micro-batch 1: week 1, state persists
        # atomically: the query is LIVE, and a half-committed multi-file
        # append could split week 2 across micro-batches in file-listing
        # order, feeding each user's ring buffer out of event-time order
        from empdia_iceberg_spark.streaming.windows import append_atomically

        append_atomically(events.filter(F.col("ts") >= boundary), feed)
        q.processAllAvailable()  # micro-batch 2: state resumes mid-series
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table(name)
        .select("event_id", "user_id", "ewma16")
        .orderBy("event_id")
    )
