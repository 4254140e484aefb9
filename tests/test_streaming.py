"""Streaming-specific tests: watermark late-drop exactness and
conversation-state parity with the batch path (the oracle parity for
the streaming queries themselves runs in test_parity.py)."""

from __future__ import annotations

import datetime as dt

import pytest
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


def test_stream_dedup_state_bounded_by_watermark(spark, tmp_path):
    """The scale failure mode of streaming dedup is unbounded seen-key
    state. dedup_stream_within_watermark must (a) still drop duplicates
    that arrive within the re-delivery window and (b) evict state as the
    watermark advances — numRowsTotal after draining a 30-day feed must
    be far below the total key count, and must not grow between phases."""
    from empdia_iceberg_spark.streaming.windows import dedup_stream_within_watermark

    ev = load(spark, SF_DIR, "events").select("event_id", "event_type", "ts")
    n_total = ev.count()
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    cutoff = "2024-01-15 00:00:00"
    first = ev.filter(F.col("ts") < cutoff)
    second = ev.filter(F.col("ts") >= cutoff)
    # phase-1 batch carries immediate duplicates (same file → same batch)
    first.unionByName(first).write.parquet(f"{feed}/f1")

    schema = spark.read.parquet(f"{feed}/f1").schema
    stream = spark.readStream.schema(schema).parquet(feed + "/*")
    deduped = dedup_stream_within_watermark(stream, "event_id", "1 hour")
    q = (
        deduped.writeStream.queryName("t_dedup_wm")
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        state1 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        second.write.mode("append").parquet(f"{feed}/f2")
        q.processAllAvailable()
        state2 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        emitted = spark.table("t_dedup_wm").count()
    finally:
        q.stop()
    # duplicates within the watermark window were dropped
    assert emitted == n_total
    # state is bounded after BOTH phases: nowhere near one row per key
    # ever seen (plain dropDuplicates would hold n_total rows by phase 2)
    assert state1 < n_total / 2, (state1, n_total)
    assert state2 < n_total / 2, (state2, n_total)


def test_tws_twin_when_protobuf_available(spark):
    """Per-round env re-probe (VERDICT r2 item 5): the moment
    google.protobuf imports in this container, the transformWithState
    twin must produce the same result as the applyInPandasWithState
    path. Skipped (not passed) while the env lacks protobuf."""
    import pytest

    pytest.importorskip("google.protobuf")
    from empdia_iceberg_spark.streaming.conversation import stream_conversation_tws

    rows_tws = {
        tuple(r) for r in stream_conversation_tws(spark, SF_DIR).collect()
    }
    rows_aip = {
        tuple(r) for r in stream_conversation_state(spark, SF_DIR).collect()
    }
    assert rows_tws == rows_aip


def test_run_to_memory_captures_progress(spark):
    """bench.py's streaming netting reads per-micro-batch
    StreamingQueryProgress from LAST_RUN_PROGRESS — the capture must
    survive the query stop and carry the duration fields the
    breakdown uses."""
    from empdia_iceberg_spark import registry
    from empdia_iceberg_spark.streaming import windows as sw
    from tests.conftest import SF_DIR

    registry.queries()["stream_tumbling_hourly"](spark, SF_DIR).limit(1).collect()
    prog = sw.LAST_RUN_PROGRESS.get("t_tumbling")
    assert prog, "no progress captured"
    assert all("durationMs" in p and "numInputRows" in p for p in prog)
    assert any(p["numInputRows"] > 0 for p in prog)  # the data batch
    assert all("triggerExecution" in p["durationMs"] for p in prog)


def test_additive_upsert_is_idempotent_per_batch_id(spark):
    """foreachBatch is at-least-once: re-delivering a micro-batch (crash
    between the table commit and the checkpoint commit) must NOT merge
    its counts twice. The shared sink stamps each batch id into the
    snapshot op, so the retry is recognized and skipped — and a NEW
    batch id still merges."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.streaming.windows import additive_upsert
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    t = SnapshotTable(spark, "t_idem_upsert_unit")
    t.drop()
    b0 = spark.createDataFrame(
        [("click", 10.0), ("click", 5.0), ("buy", 2.0)], "event_type string, value double"
    )
    additive_upsert(t, b0, 0, ["event_type"])
    first = {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()}
    assert first["click"] == (2, 15.0) and first["buy"] == (1, 2.0)

    # retry of batch 0: identical state, no new snapshot
    v = t.current_version()
    additive_upsert(t, b0, 0, ["event_type"])
    assert t.current_version() == v
    assert {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()} == first

    # a genuinely new batch merges additively
    b1 = spark.createDataFrame([("click", 1.0)], "event_type string, value double")
    additive_upsert(t, b1, 1, ["event_type"])
    after = {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()}
    assert after["click"] == (3, 16.0) and after["buy"] == (1, 2.0)

    # r8 ADVICE: the probe now walks the snapshot log BACKWARDS to the
    # newest merge@b stamp (O(1) steady-state metadata reads, not
    # O(versions) per trigger). A STALE re-delivery (batch 0 after
    # batch 1 committed) must still be recognized via batch-id
    # monotonicity, and a non-merge op interleaved at the head must
    # not blind the scan.
    v = t.current_version()
    additive_upsert(t, b0, 0, ["event_type"])  # stale retry, skipped
    assert t.current_version() == v
    assert {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()} == after
    t.append(spark.createDataFrame([("noise", 1, 0.0)],
                                   "event_type string, n_events long, sum_value double"))
    b2 = spark.createDataFrame([("buy", 4.0)], "event_type string, value double")
    additive_upsert(t, b2, 2, ["event_type"])  # scan steps over the append op
    final = {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()}
    assert final["buy"] == (2, 6.0) and final["click"] == (3, 16.0)
    t.drop()


def test_additive_upsert_two_checkpoint_lineages(spark):
    """r9 ADVICE: batch ids are only monotonic within ONE checkpoint
    lineage. A second stream (fresh checkpoint dir — ids restart at 0)
    writing the same table must not have its early batches dropped by
    the first lineage's newer stamps: the run_id stamp
    ("merge@<run_id>#b<N>") scopes the monotonic skip per lineage,
    while re-delivery WITHIN a lineage is still recognized."""
    from empdia_iceberg_spark.streaming.windows import additive_upsert
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    t = SnapshotTable(spark, "t_idem_upsert_lineages")
    t.drop()

    def b(*rows):
        return spark.createDataFrame(list(rows), "event_type string, value double")

    # lineage A commits batches 0 and 1
    additive_upsert(t, b(("click", 1.0)), 0, ["event_type"], run_id="ckptA")
    additive_upsert(t, b(("click", 2.0)), 1, ["event_type"], run_id="ckptA")
    # lineage B: fresh checkpoint, ids restart at 0 — must still land
    additive_upsert(t, b(("click", 4.0)), 0, ["event_type"], run_id="ckptB")
    got = {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()}
    assert got["click"] == (3, 7.0), "lineage B's batch 0 was dropped"

    # re-delivery inside each lineage is still skipped (no new snapshot)
    v = t.current_version()
    additive_upsert(t, b(("click", 8.0)), 0, ["event_type"], run_id="ckptB")
    additive_upsert(t, b(("click", 8.0)), 1, ["event_type"], run_id="ckptA")
    assert t.current_version() == v
    assert {r.event_type: (r.n_events, r.sum_value)
            for r in t.read().collect()} == got

    # legacy unscoped stamps are distinct from run-id stamps: the
    # digit-suffix guard keeps "merge@b" from matching "merge@ckptB#b0",
    # so an unscoped writer's batch 0 is not mistaken as already landed
    additive_upsert(t, b(("click", 16.0)), 0, ["event_type"])
    got = {r.event_type: (r.n_events, r.sum_value) for r in t.read().collect()}
    assert got["click"] == (4, 23.0)
    t.drop()


def test_stream_cdc_apply_per_key_fates(spark):
    """The CDC apply's per-key semantics, asserted key-by-key: same-batch
    collapse (seq 3 beats seq 2), delete, late insert, and the
    upsert-back of an update arriving after a delete."""
    from empdia_iceberg_spark.streaming.cdc import stream_cdc_apply
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    stream_cdc_apply(spark, SF_DIR).collect()  # builds orders_cdc_state
    state = {
        r.k: r.price
        for r in SnapshotTable(spark, "orders_cdc_state", scratch_root())
        .read()
        .collect()
    }
    orders = {
        r.o_orderkey: r.o_totalprice
        for r in load(spark, SF_DIR, "orders").collect()
    }
    for k, price in orders.items():
        if k % 8 == 1:  # two updates in ONE batch: max-seq (+20) wins
            assert state[k] == price + 20.0
        elif k % 4 == 1:  # single update (+10)
            assert state[k] == price + 10.0
        elif k % 8 == 2:  # deleted then updated: upserted back (+5)
            assert state[k] == price + 5.0
        elif k % 4 == 2:  # deleted, never resurrected
            assert k not in state
        else:  # k%4 in (0, 3): plain insert (phase 1 or late phase 3)
            assert state[k] == price
    assert len(state) == sum(1 for k in orders if k % 4 != 2 or k % 8 == 2)


def test_snapshot_tail_exactly_once_and_change_commit_guard(spark, tmp_path):
    """The snapshot_tail source: version offsets give exactly-once
    across checkpoint recovery, change commits refuse unless
    skip_change_commits, and renamed columns stream under their
    current logical names (physical projection on the executor)."""
    import os
    import shutil
    import uuid

    from empdia_iceberg_spark.sources.table_stream import SnapshotTailDataSource
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    spark.dataSource.register(SnapshotTailDataSource)
    nation = load(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    t = SnapshotTable(spark, "t_tail_unit")
    t.drop()
    t.create(nation.filter(F.col("n_nationkey") < 10))
    t.rename_column("n_name", "nation_name")
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"tail_unit_ckpt_{run}")
    sink = os.path.join(work_root(), f"tail_unit_sink_{run}")

    def drain(skip_change=False):
        reader = (
            spark.readStream.format("snapshot_tail").option("table", "t_tail_unit")
        )
        if skip_change:
            reader = reader.option("skip_change_commits", "true")
        q = (
            reader.load()
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()
        # post-rename append streams under the logical name
        t.append(
            nation.filter(F.col("n_nationkey") >= 10)
            .select("n_nationkey", F.col("n_name").alias("nation_name"))
        )
        drain()
        got = spark.read.parquet(sink)
        assert got.columns == ["n_nationkey", "nation_name"]
        assert got.count() == nation.count()  # each row exactly once
        assert got.select("n_nationkey").distinct().count() == nation.count()
        # a change commit (compact) refuses ...
        t.compact()
        import pytest as _pytest

        with _pytest.raises(Exception, match="append stream"):
            drain()
        # ... and skip_change_commits skips it (no new rows)
        drain(skip_change=True)
        assert spark.read.parquet(sink).count() == nation.count()
    finally:
        for q in spark.streams.active:
            q.stop()
        t.drop()
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


def test_snapshot_tail_across_schema_evolution(spark):
    """Tailing ACROSS an ADD COLUMN: files written before the evolution
    stream the new column as typed NULLs; a later DROP stops projecting
    it — the field plan comes from the CURRENT schema by PHYSICAL name,
    never by index against a historical commit (r11 review fix)."""
    import os
    import shutil
    import uuid

    from empdia_iceberg_spark.sources.table_stream import SnapshotTailDataSource
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    spark.dataSource.register(SnapshotTailDataSource)
    nation = load(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    t = SnapshotTable(spark, "t_tail_evo")
    t.drop()
    t.create(nation.filter(F.col("n_nationkey") < 10))  # v1: 2 columns
    t.add_column("score", "double")  # v2: metadata-only
    t.append(  # v3: 3 columns
        nation.filter(F.col("n_nationkey") >= 10).withColumn(
            "score", F.col("n_nationkey") * 1.0
        )
    )
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"tailevo_ckpt_{run}")
    sink = os.path.join(work_root(), f"tailevo_sink_{run}")
    try:
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", "t_tail_evo")
            .load()
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(sink)
        assert set(got.columns) == {"n_nationkey", "n_name", "score"}
        rows = {r.n_nationkey: r.score for r in got.collect()}
        assert len(rows) == nation.count()
        for k, score in rows.items():
            assert score == (None if k < 10 else float(k))  # pre-ADD files: NULL
        # a missing table fails with a clear error, not a raw OSError
        import pytest as _pytest

        with _pytest.raises(Exception, match="does not exist"):
            spark.readStream.format("snapshot_tail").option(
                "table", "no_such_tail_table"
            ).load()
    finally:
        for q in spark.streams.active:
            q.stop()
        t.drop()
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


def test_snapshot_tail_bounded_batches_drain_backlog(spark):
    """max_files_per_trigger (r12 admission control): a backlog that
    lands while the stream runs drains in MULTIPLE bounded micro-batches
    — every row exactly once, no post-initial batch exceeding the cap's
    file budget — including a split WITHIN one multi-file commit. (The
    FIRST batch of a run is unbounded by design: the Python streaming
    API hands latestOffset no start offset, and a self-guessed bound
    could regress the checkpoint — see the reader docstring.)"""
    import os
    import shutil
    import time
    import uuid

    from empdia_iceberg_spark.sources.table_stream import SnapshotTailDataSource
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    spark.dataSource.register(SnapshotTailDataSource)
    nation = load(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    t = SnapshotTable(spark, "t_tail_bounded")
    t.drop()
    # small initial table: batch 0 (the unbounded learn-position batch)
    # stays tiny; the REAL backlog arrives while the stream runs
    t.create(nation.filter(F.col("n_nationkey") < 2))
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"tail_bounded_ckpt_{run}")
    sink_name = f"t_tail_bounded_mem_{run}"
    q = (
        spark.readStream.format("snapshot_tail")
        .option("table", "t_tail_bounded")
        .option("maxFilesPerTrigger", "2")
        .load()
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        # wait for batch 0 (the initial 2 rows) so the position is learned
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(sink_name).count() < 2:
            time.sleep(0.2)
        assert spark.table(sink_name).count() == 2
        # backlog: 4 single-file appends (5 rows each) + one partitioned
        # append whose commit has one file per region (multi-file commit
        # the cap must split inside)
        for lo, hi in ((2, 7), (7, 12), (12, 17), (17, 20)):
            t.append(
                nation.filter(
                    (F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < hi)
                )
            )
        expect = nation.filter(F.col("n_nationkey") < 20).count()
        deadline = time.time() + 120
        while time.time() < deadline and spark.table(sink_name).count() < expect:
            time.sleep(0.5)
        got = spark.table(sink_name)
        assert got.count() == expect
        assert got.select("n_nationkey").distinct().count() == expect  # exactly once
        batches = [
            p
            for p in q.recentProgress
            if p["numInputRows"] and p["numInputRows"] > 0
        ]
        # batch 0 = 2 rows; the 18-row backlog over 4 files at cap=2 needs
        # >= 2 further batches; every post-initial batch <= 2 files * 5 rows
        assert len(batches) >= 3, f"expected a multi-batch drain, got {len(batches)}"
        post_initial = [p["numInputRows"] for p in batches[1:]]
        assert post_initial and max(post_initial) <= 10
    finally:
        q.stop()
        t.drop()
        shutil.rmtree(ckpt, ignore_errors=True)


def test_snapshot_tail_bounded_offsets_split_within_commit(spark):
    """Driving the reader directly (the deterministic layer under the
    live-query test): the bounded walk splits inside a multi-file
    commit, resumes mid-version, honors pre-r12 offsets, and never
    regresses once the position is learned from Spark-shaped calls."""
    import json as _json

    from empdia_iceberg_spark.sources.table_stream import SnapshotTailStreamReader
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    nation = load(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    t = SnapshotTable(spark, "t_tail_off_unit")
    t.drop()
    t.create(nation.filter(F.col("n_nationkey") < 10), partition_by=["n_regionkey"])
    t.append(nation.filter(F.col("n_nationkey") >= 10))
    schema_json = t._read_meta(t.current_version())["schema"]
    r = SnapshotTailStreamReader(
        {"table": "t_tail_off_unit", "maxfilespertrigger": "2"}, schema_json
    )
    n1 = len(r._new_files(1, raise_on_change=True))
    assert n1 >= 3  # partitioned create => multi-file commit
    # simulate the engine's call order: latestOffset BEFORE initialOffset
    head = r.latestOffset()
    assert head == {"version": 2, "file": None}  # unbounded until learned
    o0 = r.initialOffset()
    # now bounded: splits INSIDE v1
    o1 = r.latestOffset()
    assert o1 == {"version": 1, "file": 2}
    assert len(r.partitions(o0, o1)) == 2
    r.commit(o1)
    o2 = r.latestOffset()
    parts2 = r.partitions(o1, o2)
    assert len(parts2) == 2 and (o2["version"], o2["file"]) in ((1, 4), (2, 1))
    r.commit(o2)
    # pre-r12 offset form still reads as "all of v done"
    legacy = r.partitions({"version": 1}, {"version": 2})
    assert len(legacy) == len(r._new_files(2, raise_on_change=True))
    # a backwards batch (restart probe shape) plans empty and cannot
    # drag the learned position backwards
    assert r.partitions({"version": 2, "file": None}, {"version": 1, "file": 0}) == []
    assert r.latestOffset() == {"version": 2, "file": None}
    t.drop()


def test_snapshot_tail_byte_budget_bounds_batches(spark):
    """max_bytes_per_trigger: the byte-budget twin of the file cap —
    whichever exhausts first ends the batch, and a single file larger
    than the budget still ships whole instead of stalling."""
    from empdia_iceberg_spark.sources.table_stream import SnapshotTailStreamReader
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    nation = load(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    t = SnapshotTable(spark, "t_tail_bytes_unit")
    t.drop()
    t.create(nation.filter(F.col("n_nationkey") < 8))
    for lo, hi in ((8, 16), (16, 25)):
        t.append(
            nation.filter((F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < hi))
        )
    schema_json = t._read_meta(t.current_version())["schema"]
    sizes = [
        sz
        for v in (1, 2, 3)
        for _p, sz in SnapshotTailStreamReader(
            {"table": "t_tail_bytes_unit"}, schema_json
        )._new_files(v, raise_on_change=True)
    ]
    # budget = just under two files: each batch carries exactly one file
    r = SnapshotTailStreamReader(
        {"table": "t_tail_bytes_unit",
         "maxbytespertrigger": str(min(sizes) * 2 - 1)},
        schema_json,
    )
    o = r.initialOffset()
    seen = 0
    while True:
        nxt = r.latestOffset()
        if nxt == o:
            break
        parts = r.partitions(o, nxt)
        assert len(parts) == 1, "byte budget under 2 files => 1 file per batch"
        r.commit(nxt)
        seen += len(parts)
        o = nxt
    assert seen == len(sizes)  # every file delivered exactly once
    # an oversized single file ships whole rather than stalling
    r2 = SnapshotTailStreamReader(
        {"table": "t_tail_bytes_unit", "maxbytespertrigger": "1"}, schema_json
    )
    o2 = r2.initialOffset()
    n2 = r2.latestOffset()
    assert len(r2.partitions(o2, n2)) == 1
    with pytest.raises(ValueError, match="max_bytes_per_trigger"):
        SnapshotTailStreamReader(
            {"table": "t_tail_bytes_unit", "maxbytespertrigger": "-1"}, schema_json
        )
    t.drop()


def test_snapshot_tail_starting_timestamp(spark):
    """starting_timestamp (Delta's startingTimestamp): commits at or
    after the given time stream; earlier history is skipped. Resolved
    through the same commit timestamps as TIMESTAMP AS OF time travel."""
    import os
    import shutil
    import uuid

    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailDataSource,
        SnapshotTailStreamReader,
    )
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable

    spark.dataSource.register(SnapshotTailDataSource)
    nation = load(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    t = SnapshotTable(spark, "t_tail_ts_unit")
    t.drop()
    t.create(nation.filter(F.col("n_nationkey") < 10))
    cut = t._read_meta(1)["ts"] + 0.0005  # just after v1's commit
    t.append(nation.filter(F.col("n_nationkey") >= 10))
    schema_json = t._read_meta(t.current_version())["schema"]
    r = SnapshotTailStreamReader(
        {"table": "t_tail_ts_unit", "startingtimestamp": str(cut)}, schema_json
    )
    assert r.starting_version == 1  # v1 predates the cut; v2 streams
    o0, o1 = r.initialOffset(), r.latestOffset()
    ids = set()
    import pyarrow as pa

    for part in r.partitions(o0, o1):
        for batch in r.read(part):
            ids |= set(batch.column(0).to_pylist())
    assert ids == {int(x.n_nationkey) for x in nation.filter(F.col("n_nationkey") >= 10).collect()}
    # a pre-history timestamp streams everything; exclusivity guard fires
    r2 = SnapshotTailStreamReader(
        {"table": "t_tail_ts_unit", "startingtimestamp": "0"}, schema_json
    )
    assert r2.starting_version == 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        SnapshotTailStreamReader(
            {"table": "t_tail_ts_unit", "starting_version": "1",
             "startingtimestamp": "0"}, schema_json
        )
    t.drop()


# ------------------------------------------------------ CDC tail (r14)


def test_cdc_tail_option_validation(spark):
    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailStreamReader,
    )

    with pytest.raises(ValueError, match="mutually exclusive"):
        SnapshotTailStreamReader(
            {"table": "x", "read_changes": "true",
             "skip_change_commits": "true"},
            "{}",
        )
    with pytest.raises(ValueError, match="requires read_changes"):
        SnapshotTailStreamReader({"table": "x", "cdc_key": "k"}, "{}")


def test_cdc_tail_metadata_commits_and_schema(spark):
    """Metadata-only commits plan zero CDC partitions; the CDC schema
    appends the three Delta-CDF tag columns; append commits stay
    per-FILE partitions (the parallel fast path)."""
    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailDataSource,
        SnapshotTailStreamReader,
        _ChangeCommitPartition,
        _TailFilePartition,
    )
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    t = SnapshotTable(spark, "t_cdc_plan_unit", scratch_root())
    t.drop()
    t.create(nat.filter(F.col("n_nationkey") < 10))       # v1 append-shaped
    t.set_properties({"owner": "x"})                       # v2 metadata-only
    t.append(nat.filter(F.col("n_nationkey") >= 10))       # v3 append-shaped
    t.delete_where_mor(F.col("n_nationkey") == 3, key="n_nationkey")  # v4 MOR
    ds = SnapshotTailDataSource(
        {"table": "t_cdc_plan_unit", "root": scratch_root(),
         "read_changes": "true"}
    )
    struct = ds.schema()
    assert [f.name for f in struct.fields][-3:] == [
        "_change_type", "_commit_version", "_commit_timestamp",
    ]
    reader = SnapshotTailStreamReader(ds.options, struct.json())
    parts = reader.partitions(
        {"version": 0, "file": None}, {"version": 4, "file": None}
    )
    per_file = [p for p in parts if isinstance(p, _TailFilePartition)]
    per_commit = [p for p in parts if isinstance(p, _ChangeCommitPartition)]
    assert all(p.cdc_tag[0] == "insert" for p in per_file)
    assert {p.cdc_tag[1] for p in per_file} == {1, 3}  # v2 contributed nothing
    assert [p.version for p in per_commit] == [4]
    assert per_commit[0].mor_hits and not per_commit[0].cow
    t.drop()


def test_cdc_tail_admission_control_is_commit_granular(spark):
    """In CDC mode max_files_per_trigger bounds at commit granularity:
    after the position is learned, each latestOffset ends a batch before
    the version that would blow the budget (>=1 version always ships)."""
    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailStreamReader,
    )
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet").coalesce(1)
    t = SnapshotTable(spark, "t_cdc_admit_unit", scratch_root())
    t.drop()
    t.create(nat.filter(F.col("n_nationkey") < 5))
    t.append(nat.filter((F.col("n_nationkey") >= 5) & (F.col("n_nationkey") < 10)))
    t.append(nat.filter(F.col("n_nationkey") >= 10))
    reader = SnapshotTailStreamReader(
        {"table": "t_cdc_admit_unit", "root": scratch_root(),
         "read_changes": "true", "max_files_per_trigger": "1"},
        t._read_meta(t.current_version())["schema"],
    )
    reader.commit({"version": 0, "file": None})  # learn the position
    assert reader.latestOffset() == {"version": 1, "file": None}
    reader.commit({"version": 1, "file": None})
    assert reader.latestOffset() == {"version": 2, "file": None}
    reader.commit({"version": 3, "file": None})
    assert reader.latestOffset() == {"version": 3, "file": None}
    t.drop()


def test_cdc_tail_streams_position_delete_commits(spark):
    """A position-delete commit streams through the CDC tail with the
    same rows batch changes() reports — the executor synthesizes
    (file, ordinal) lineage from its sequential pyarrow read, which
    must agree with Spark's _metadata.row_index coordinates."""
    import os
    import shutil
    import uuid

    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailDataSource,
    )
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    spark.dataSource.register(SnapshotTailDataSource)
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    t = SnapshotTable(spark, "t_cdc_posdel_unit", scratch_root())
    t.drop()
    t.create(nat)
    t.delete_where_position(F.col("n_nationkey").isin(3, 7))
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"cdcp_ckpt_{run}")
    sink = os.path.join(work_root(), f"cdcp_sink_{run}")
    q = (
        spark.readStream.format("snapshot_tail")
        .option("table", "t_cdc_posdel_unit")
        .option("root", scratch_root())
        .option("read_changes", "true")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.read.parquet(sink)
        .select("n_nationkey", "_change_type", "_commit_version")
        .collect()
    )
    exp = (
        t.changes(1)
        .select("n_nationkey", "_change_type", "_commit_version")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    deld = [r for r in got if r[1] == "delete"]
    assert sorted(r[0] for r in deld) == [3, 7]
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)
    t.drop()


def test_cdc_tail_across_add_column_evolution(spark):
    """ADD COLUMN mid-lineage: rows from files written BEFORE the evolve
    stream through the CDC tail with typed NULLs in the new column, and
    the whole streamed set equals batch changes() — including a CoW
    commit whose swapped sets span both schema eras."""
    import os
    import shutil
    import uuid

    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailDataSource,
    )
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    spark.dataSource.register(SnapshotTailDataSource)
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    t = SnapshotTable(spark, "t_cdc_evo_unit", scratch_root())
    t.drop()
    t.create(nat.filter(F.col("n_nationkey") < 10))          # v1 (old era)
    t.add_column("score", "double")                           # v2 metadata-only
    t.append(                                                 # v3 (new era)
        nat.filter(F.col("n_nationkey") >= 10).withColumn(
            "score", F.col("n_nationkey").cast("double")
        )
    )
    # v4: CoW update touching BOTH eras' files
    t.update_where(
        F.col("n_nationkey").isin(1, 20), {"n_name": F.lit("X")}
    )
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"cdce_ckpt_{run}")
    sink = os.path.join(work_root(), f"cdce_sink_{run}")
    q = (
        spark.readStream.format("snapshot_tail")
        .option("table", "t_cdc_evo_unit")
        .option("root", scratch_root())
        .option("read_changes", "true")
        .option("cdc_key", "n_nationkey")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = ["n_nationkey", "n_name", "score", "_change_type", "_commit_version"]
    got = sorted(map(tuple, spark.read.parquet(sink).select(*cols).collect()))
    exp = sorted(map(tuple, t.changes(1, key="n_nationkey").select(*cols).collect()))
    assert got == exp
    # old-era insert rows surface the evolved column as NULL
    assert all(
        r[2] is None for r in got if r[4] == 1
    ), "pre-evolve files must stream typed NULLs for the added column"
    # the CoW update folded into pre/post pairs across both eras
    assert {r[0] for r in got if r[3] == "update_postimage"} == {1, 20}
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)
    t.drop()


def test_cdc_tail_across_add_column_default(spark):
    """r15 (VERDICT r14 ask #4): a table that used `ADD COLUMN ...
    DEFAULT` CAN be CDC-tailed — pre-evolve files stream the DEFAULT
    value (not NULL) exactly like the batch read's per-dir coalesce,
    post-evolve files keep their stored values, and the streamed set
    equals batch changes(). Previously this raised."""
    import os
    import shutil
    import uuid

    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailDataSource,
    )
    from empdia_iceberg_spark.streaming.windows import work_root
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    spark.dataSource.register(SnapshotTailDataSource)
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    t = SnapshotTable(spark, "t_cdc_def_unit", scratch_root())
    t.drop()
    t.create(nat.filter(F.col("n_nationkey") < 10))           # v1 (pre)
    t.add_column("tier", "string", default="'std'")           # v2 meta-only
    t.append(                                                  # v3 (post)
        nat.filter(F.col("n_nationkey") >= 10).withColumn(
            "tier", F.lit("gold")
        )
    )
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"cdcd_ckpt_{run}")
    sink = os.path.join(work_root(), f"cdcd_sink_{run}")
    q = (
        spark.readStream.format("snapshot_tail")
        .option("table", "t_cdc_def_unit")
        .option("root", scratch_root())
        .option("read_changes", "true")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: df.write.mode("append").parquet(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = ["n_nationkey", "n_name", "tier", "_change_type", "_commit_version"]
    got = sorted(map(tuple, spark.read.parquet(sink).select(*cols).collect()))
    exp = sorted(map(tuple, t.changes(1).select(*cols).collect()))
    assert got == exp
    assert all(r[2] == "std" for r in got if r[4] == 1), (
        "pre-evolve files must stream the DEFAULT, not NULL"
    )
    assert all(r[2] == "gold" for r in got if r[4] == 3)
    # plain (non-CDC) tail surfaces the default the same way
    sink2 = os.path.join(work_root(), f"cdcd_sink2_{run}")
    ckpt2 = os.path.join(work_root(), f"cdcd_ckpt2_{run}")
    q2 = (
        spark.readStream.format("snapshot_tail")
        .option("table", "t_cdc_def_unit")
        .option("root", scratch_root())
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: df.write.mode("append").parquet(sink2))
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    tiers = {
        (r["n_nationkey"], r["tier"])
        for r in spark.read.parquet(sink2).collect()
    }
    exp2 = {
        (r["n_nationkey"], r["tier"]) for r in t.read().collect()
    }
    assert tiers == exp2
    for p in (ckpt, sink, ckpt2, sink2):
        shutil.rmtree(p, ignore_errors=True)
    t.drop()


def test_default_literal_parsing():
    """The sessionless default-value parser covers Iceberg's literal
    surface and refuses expressions loudly."""
    import datetime

    import pytest as _pytest

    from empdia_iceberg_spark.sources.table_stream import _default_literal

    assert _default_literal("'x''y'") == "x'y"
    assert _default_literal("42") == 42
    assert _default_literal("-1.5") == -1.5
    assert _default_literal("TRUE") is True
    assert _default_literal("NULL") is None
    assert _default_literal("DATE '2024-01-03'") == datetime.date(2024, 1, 3)
    assert _default_literal(
        "TIMESTAMP '2024-01-03 04:05:06'"
    ) == datetime.datetime(2024, 1, 3, 4, 5, 6)
    with _pytest.raises(ValueError, match="not a literal"):
        _default_literal("current_timestamp()")


def test_cdc_tail_cow_byte_guard(spark):
    """A rewrite-sized CoW commit must fail loudly in CDC mode (its diff
    is one both-sides task), pointing at batch changes() — never OOM."""
    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailStreamReader,
    )
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    t = SnapshotTable(spark, "t_cdc_guard_unit", scratch_root())
    t.drop()
    t.create(nat)
    t.compact()  # v2: CoW swap of the whole (tiny) table
    reader = SnapshotTailStreamReader(
        {"table": "t_cdc_guard_unit", "root": scratch_root(),
         "read_changes": "true", "cdc_cow_max_bytes": "1"},
        t._read_meta(t.current_version())["schema"],
    )
    with pytest.raises(ValueError, match="cdc_cow_max_bytes"):
        reader.partitions(
            {"version": 1, "file": None}, {"version": 2, "file": None}
        )
    # default ceiling admits the tiny commit
    reader2 = SnapshotTailStreamReader(
        {"table": "t_cdc_guard_unit", "root": scratch_root(),
         "read_changes": "true"},
        t._read_meta(t.current_version())["schema"],
    )
    parts = reader2.partitions(
        {"version": 1, "file": None}, {"version": 2, "file": None}
    )
    assert len(parts) == 1 and parts[0].cow
    t.drop()
