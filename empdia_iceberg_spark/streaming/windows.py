"""Structured-Streaming windowed aggregations over the `events` table
(SURVEY.md §2.B streaming rows; §7 slice 3).

Each registered query runs a REAL streaming query — file-stream source
over the events parquet, `Trigger.AvailableNow`-style full drain via
``processAllAvailable``, memory sink — and returns the sink contents.
Because the whole file arrives in the first micro-batch, watermarking
drops nothing and the result equals the batch answer, which is exactly
what makes a deterministic DuckDB oracle possible (the driver gate).
Late-data drop semantics (which are inherently arrival-order-dependent)
are exercised separately by `stream_watermark_late_drop` with an
explicit two-phase file feed, rows-only + unit-tested.

Scale posture: these plans are the standard streaming shuffle —
partial aggregation per micro-batch, state keyed by (window, group);
watermarks bound the state store size, which is what survives at
100 TB/day ingest.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import sql_sum2
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load, local_df, path_for

def work_root() -> str:
    """Per-PROCESS streaming scratch (VERDICT r13 what's-wrong #1). The
    fixed ``/root/repo/.stream_work`` root — with fixed per-query feed
    dirs like ``cagg_feed`` — was the last scaffold family two concurrent
    clients could corrupt: one client's rmtree+rewrite of a feed raced
    another's file-stream read of the same dir (observed as an 11,000-row
    result from a 10,000-row feed). Routing through
    ``tables.manager.scratch_root()`` gives each process its own dir with
    the same relative layout, exactly as r12/r13 did for the catalog and
    sink roots; ``SPARK_GRAFT_STREAM_ROOT`` still pins an explicit
    location for debugging."""
    env = os.environ.get("SPARK_GRAFT_STREAM_ROOT")
    if env:
        return env
    from empdia_iceberg_spark.tables.manager import scratch_root

    return os.path.join(scratch_root(), "stream_work")

SESSION_GAP = "8 hours"
SESSION_GAP_SEC = 8 * 3600


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet. The file stores ts as
    TIMESTAMP(NANOS) (illegal for Spark's reader) — same workaround as
    the batch loader: read int64 nanos, convert to micros timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(path_for(sf_dir, "events"))
    # the file-stream source wants a directory: stream the sf dir with a
    # glob filter selecting only the events file
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # shared dtype dispatch with the batch loader — the two paths must
    # never diverge on how event time is decoded
    from empdia_iceberg_spark.sources.tables import normalize_event_ts

    return normalize_event_ts(stream)


# Per-micro-batch StreamingQueryProgress of the most recent
# run_to_memory drain (name → list of progress dicts). bench.py reads
# this to separate the state-store/commit lifecycle constant from data
# work when netting streaming times against the batch baseline.
LAST_RUN_PROGRESS: dict[str, list[dict]] = {}


def append_atomically(df: DataFrame, feed: str) -> None:
    """Stage a follow-up batch into a LIVE file-stream feed.

    Spark's file source requires files to APPEAR atomically: it lists
    the watched directory every trigger, and a plain
    ``df.write.mode("append")`` commits part files one rename at a
    time — a trigger firing mid-commit sees a partial subset, splitting
    one event-time batch across micro-batches in file-listing (not
    event-time) order. For a stateful consumer that corrupts per-key
    state (out-of-order EWMA ingestion) or drops on-time rows behind a
    watermark the first sub-batch advanced. Writing to a sibling temp
    dir and moving ONE part file in with a single atomic rename makes
    the whole batch visible to exactly one trigger. coalesce(1) is
    test-scaffold-sized by design — a production continuous feed
    commits files through a transactional manifest (Iceberg/Delta) or
    writes temp-then-rename per file."""
    import glob as _glob

    tmp = feed.rstrip("/") + f".stage_{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.parquet(tmp)
    parts = _glob.glob(os.path.join(tmp, "part-*"))
    assert len(parts) == 1, parts
    os.makedirs(feed, exist_ok=True)
    os.rename(parts[0], os.path.join(feed, os.path.basename(tmp) + ".parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def additive_upsert(
    table,
    batch_df: DataFrame,
    batch_id: int,
    group_cols: list,
    run_id: str | None = None,
) -> None:
    """Shared foreachBatch sink: merge a micro-batch's per-group
    count/sum increments into a snapshot table, idempotently.

    foreachBatch is AT-LEAST-once: a crash after the table commit but
    before the checkpoint records the batch re-delivers it on restart,
    and a plain additive merge would double-count. Each commit stamps
    its lineage + batch id in the snapshot op ("merge@<run_id>#b<N>",
    or legacy "merge@b<N>" when no run_id is given), so a re-delivered
    batch is recognized and skipped — the make-foreachBatch-idempotent
    pattern from the Structured Streaming guide, with the snapshot log
    itself as the transaction record (the table commit and the
    batch-id stamp are ONE atomic metadata publish).

    `run_id` identifies the CHECKPOINT LINEAGE (callers pass a token
    derived from the checkpoint dir): batch ids are only monotonic
    within one lineage, so the skip probe compares against the newest
    stamp carrying THIS lineage's run_id and walks past other writers'
    stamps. Without it, a second stream writing the same table — or a
    restart with a fresh checkpoint dir — restarts batch ids at 0 and
    the old probe silently dropped all its early batches (r9 ADVICE).
    Omitting run_id keeps the legacy single-writer-per-table contract:
    batch_id <= newest legacy stamp ⇔ already landed, which is only
    sound when exactly one checkpoint lineage ever writes the table.

    The already-committed probe walks the snapshot log BACKWARDS and
    stops at the first stamp from this lineage: this sink commits a
    lineage's batches in order, so batch_id <= N ⇔ this batch already
    landed. Reading every version's metadata per micro-batch (the r7
    shape) made a long-running stream O(batches²) in metadata I/O; the
    backward scan reads ONE snapshot JSON per trigger in the
    single-writer steady state (the newest stamp is at or next to the
    head even when compaction/expire ops interleave; interleaved
    foreign-lineage stamps cost one extra JSON read each)."""
    mine = f"merge@{run_id}#b" if run_id is not None else "merge@b"
    last = None
    for v in reversed(table._versions()):
        op = table._read_meta(v).get("op", "")
        # digit-suffix check: the legacy prefix "merge@b" would otherwise
        # also match a run-id stamp like "merge@bench123#b4"
        if op.startswith(mine) and op[len(mine):].isdigit():
            last = int(op[len(mine):])
            break
    if last is not None and batch_id <= last:
        return
    agg = batch_df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    stamp = f"{mine}{batch_id}"
    group_names = agg.columns[: len(group_cols)]
    if table.current_version() is None:
        table.overwrite(agg, op=stamp)
    else:
        combined = (
            table.read()
            .unionByName(agg)
            .groupBy(*group_names)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum(F.col("sum_value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
        )
        table.overwrite(combined, op=stamp)


def run_to_memory(
    agg: DataFrame, name: str, output_mode: str = "complete"
) -> "SparkSession":
    """Start agg → memory sink, drain all available input, stop. Returns
    the session for `spark.table(name)` reads. Fresh checkpoint per run."""
    import json as _json

    spark = agg.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = os.path.join(work_root(), f"ckpt_{name}_{uuid.uuid4().hex[:8]}")
    q = (
        agg.writeStream.queryName(name)
        .outputMode(output_mode)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        try:
            LAST_RUN_PROGRESS[name] = [_json.loads(p.json) for p in q.recentProgress]
        except Exception:
            LAST_RUN_PROGRESS[name] = []
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark


@register(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round({sql_sum2('value')}, 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Streaming tumbling 1-hour window aggregate with a 1-hour "
    "watermark, drained via a real file-stream → memory-sink query; "
    "single-batch arrival makes it equal the batch answer (the oracle).",
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "sum_value"
        ),
    )
    run_to_memory(agg, "t_tumbling")
    return (
        spark.table("t_tumbling")
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_sliding_2h_1h",
    oracle="""
    WITH contrib AS (
        SELECT date_trunc('hour', ts)                    AS window_start, event_type FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR  AS window_start, event_type FROM events
    )
    SELECT window_start, event_type, count(*) AS n_events
    FROM contrib
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Streaming sliding window (2h length, 1h slide): every event "
    "lands in two overlapping windows; oracle = union of the two "
    "shifted hour-truncations.",
)
def stream_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    run_to_memory(agg, "t_sliding")
    return (
        spark.table("t_sliding")
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_session_window",
    oracle=f"""
    WITH l AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        FROM events
    ),
    brk AS (
        SELECT user_id, ts,
               CASE WHEN pts IS NULL OR epoch(ts - pts) >= {SESSION_GAP_SEC} THEN 1 ELSE 0 END AS is_new
        FROM l
    ),
    sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM brk
    )
    SELECT user_id,
           min(ts)                               AS session_start,
           max(ts) + INTERVAL 8 HOUR             AS session_end,
           count(*)                              AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="Streaming session_window (8h inactivity gap) per user; oracle = "
    "the classic gaps-and-islands SQL (session end = last event + gap, "
    "matching Spark's session semantics exactly).",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.session_window("ts", SESSION_GAP), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    run_to_memory(agg, "t_session")
    return (
        spark.table("t_session")
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "stream_stream_join_1h",
    oracle="""
    SELECT c.event_id                        AS click_id,
           p.event_id                        AS purchase_id,
           c.user_id,
           CAST(epoch_us(p.ts - c.ts) AS BIGINT) AS gap_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
    doc="Stream-stream INTERVAL JOIN: clicks joined to same-user "
    "purchases within [0, 1h], both sides watermarked so the join state "
    "is evicted once the event-time bound passes — the canonical "
    "attribution join. Single-batch arrival makes the inner join equal "
    "the batch interval join (the oracle). At 100 TB/day the state "
    "store holds only the 1-hour tail of each side per user key; "
    "without the time bound + watermarks Spark would (rightly) reject "
    "the plan as unbounded-state.",
)
def stream_stream_join_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    run_to_memory(joined, "t_ssjoin", output_mode="append")
    return spark.table("t_ssjoin").orderBy("click_id", "purchase_id")


@register(
    "stream_static_enrich",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           round({sql_sum2('e.value')}, 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Stream-static join: the event stream enriches against the "
    "static customer dim (broadcast — the dim is re-read per "
    "micro-batch but never shuffles the stream side), then aggregates "
    "by segment. The standard streaming-ETL enrichment shape; oracle = "
    "the batch join + rollup.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
    )
    run_to_memory(agg, "t_enrich")
    return spark.table("t_enrich").orderBy("c_mktsegment")


@register(
    "stream_watermark_late_drop",
    oracle=None,  # arrival-order semantics — deterministic only under the
    # controlled two-phase feed below; exact counts pinned by unit test.
    doc="Watermark late-data drop, demonstrated deterministically: phase 1 "
    "streams the first 29 days of events and advances the watermark; "
    "phase 2 delivers day-30 events PLUS stale copies of day-1 events, "
    "which the 1-hour watermark must drop. Output: per-phase ingested "
    "window counts.",
)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cutoff = "2024-01-30 00:00:00"
    # uuid-suffixed feed AND checkpoint (unlike the fixed feed dirs of
    # the single-phase scaffolds below, which assume one invocation per
    # host at a time): fixed paths would let a concurrent invocation
    # clobber a LIVE checkpoint
    run_id = uuid.uuid4().hex[:8]
    feed = os.path.join(work_root(), f"late_feed_{run_id}")
    ckpt = os.path.join(work_root(), f"late_ckpt_{run_id}")
    shutil.rmtree(feed, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    onm = ev.filter(F.col("ts") < cutoff)
    late = ev.filter(F.col("ts") < "2024-01-02").withColumn("event_id", F.col("event_id") + 1000000)
    tail = ev.filter(F.col("ts") >= cutoff)

    onm.write.parquet(os.path.join(feed, "f1"))
    schema = spark.read.parquet(os.path.join(feed, "f1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1000")
        .parquet(feed + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    for q in spark.streams.active:
        if q.name == "t_late":
            q.stop()
    q = (
        stream.writeStream.queryName("t_late")
        .outputMode("append")  # append mode: windows emit once finalized by the watermark
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        phase1 = spark.table("t_late").count()
        # phase 2: new tail data + stale day-1 rows (behind the watermark).
        # Staged atomically: the query is LIVE, and a half-committed
        # multi-file append could split the tail across micro-batches —
        # the first sub-batch's max(ts) advances the watermark past the
        # second sub-batch's earlier-but-on-time rows, wrongly dropping
        # them (see append_atomically).
        append_atomically(tail.unionByName(late), os.path.join(feed, "f2"))
        q.processAllAvailable()
        phase2 = spark.table("t_late").count()
        total_emitted = (
            spark.table("t_late").agg(F.sum("n_events")).collect()[0][0] or 0
        )
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(feed, ignore_errors=True)  # uuid dirs never reused
    return local_df(
        spark,
        [(int(phase1), int(phase2), int(total_emitted))],
        "windows_after_phase1 long, windows_after_phase2 long, events_emitted long",
    )


@register(
    "stream_dedup_events",
    oracle="""
    SELECT event_type,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Streaming exact dedup: the feed delivers every event TWICE "
    "(two files, two micro-batches); dropDuplicates keyed on event_id "
    "holds seen-key state across batches, so the sink equals the batch "
    "distinct answer — streaming ingestion dedup, the first stage of a "
    "continuously-ingesting training-data pipeline.",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    feed = os.path.join(work_root(), "dedup_feed")
    ckpt = os.path.join(work_root(), f"dedup_ckpt_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(feed, ignore_errors=True)
    ev.write.parquet(feed)  # batch 1: the events
    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(feed)
        .dropDuplicates(["event_id"])
    )
    for q in spark.streams.active:
        if q.name == "t_dedup":
            q.stop()
    q = (
        stream.writeStream.queryName("t_dedup")
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        ev.write.mode("append").parquet(feed)  # batch 2: full duplicate copy
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table("t_dedup")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


def dedup_stream_within_watermark(stream: DataFrame, key: str, delay: str) -> DataFrame:
    """Watermark-BOUNDED streaming dedup: `dropDuplicatesWithinWatermark`
    evicts seen-key state once the watermark passes key-ts + delay, so
    state size is O(events per delay window), not O(all keys ever seen).
    This is the 100 TB/day posture — the exact `dropDuplicates` variant in
    `stream_dedup_events` keeps every key forever, which is only
    acceptable when the key space is bounded. Dedup is guaranteed for
    duplicates arriving within `delay` of the original (the re-delivery
    window of an at-least-once source). Bounded-state is asserted in
    tests/test_streaming.py via StreamingQueryProgress stateOperators."""
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark([key])


@register(
    "stream_dedup_bounded_state",
    oracle="""
    SELECT event_type,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Watermark-bounded streaming dedup: the feed delivers every event "
    "twice within ONE micro-batch (inside the 1-hour re-delivery window), "
    "dropDuplicatesWithinWatermark removes them, and — unlike plain "
    "dropDuplicates — evicts seen-key state as the watermark advances, "
    "so state is O(events/delay-window), not O(all keys ever). "
    "Bounded-state growth is asserted in tests/test_streaming.py.",
)
def stream_dedup_bounded_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    feed = os.path.join(work_root(), "dedup_wm_feed")
    ckpt = os.path.join(work_root(), f"dedup_wm_ckpt_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(feed, ignore_errors=True)
    ev.unionByName(ev).write.parquet(feed)  # every event twice, same batch
    schema = spark.read.parquet(feed).schema
    stream = dedup_stream_within_watermark(
        spark.readStream.schema(schema).parquet(feed), "event_id", "1 hour"
    )
    for q in spark.streams.active:
        if q.name == "t_dedup_wm_q":
            q.stop()
    q = (
        stream.writeStream.queryName("t_dedup_wm_q")
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table("t_dedup_wm_q")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


@register(
    "stream_continuous_aggregate",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round({sql_sum2('value')}, 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Continuous aggregate (materialized-view maintenance): the event "
    "stream is drained in two phases split mid-hour; each micro-batch's "
    "updated windows are MERGEd (upsert on window+type) into a managed "
    "snapshot table via foreachBatch, so phase 2 genuinely REVISES "
    "phase-1 rows. The final table must equal the batch rollup — the "
    "incremental-maintenance invariant.",
)
def stream_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    feed = os.path.join(work_root(), "cagg_feed")
    ckpt = os.path.join(work_root(), f"cagg_ckpt_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(feed, ignore_errors=True)
    cutoff = "2024-01-15 12:30:00"  # mid-hour: phase 2 updates the 12:00 window
    ev.filter(F.col("ts") < cutoff).write.parquet(feed)

    table = SnapshotTable(spark, "events_hourly_cagg", scratch_root())
    table.drop()

    schema = spark.read.parquet(feed).schema
    stream = spark.readStream.schema(schema).parquet(feed)
    for q in spark.streams.active:
        if q.name == "t_cagg":
            q.stop()

    # Micro-batches are increments, so per-window partial sums are merged
    # ADDITIVELY into the table (count/sum are decomposable aggregates —
    # the property continuous aggregates rely on).
    def upsert_additive(batch_df, batch_id: int) -> None:
        # shared idempotent additive sink (at-least-once retry guard +
        # decomposable count/sum merge) — see additive_upsert; run_id =
        # checkpoint basename, the lineage batch ids are monotonic within
        additive_upsert(
            table,
            batch_df,
            batch_id,
            [F.date_trunc("hour", "ts").alias("window_start"), "event_type"],
            run_id=os.path.basename(ckpt),
        )

    q = (
        stream.writeStream.queryName("t_cagg")
        .outputMode("append")
        .foreachBatch(upsert_additive)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        ev.filter(F.col("ts") >= cutoff).write.mode("append").parquet(feed)
        q2 = (
            stream.writeStream.queryName("t_cagg")
            .outputMode("append")
            .foreachBatch(upsert_additive)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
    finally:
        for qq in spark.streams.active:
            if qq.name == "t_cagg":
                qq.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        table.read()
        .select(
            "window_start",
            "event_type",
            "n_events",
            F.round(F.col("sum_value").cast("decimal(18,2)").cast("double"), 2).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_stream_left_join",
    oracle="""
    SELECT c.event_id                            AS click_id,
           p.event_id                            AS purchase_id,
           c.user_id,
           CAST(epoch_us(p.ts - c.ts) AS BIGINT) AS gap_us
    FROM events c LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    ORDER BY click_id, purchase_id
    """,
    doc="Stream-stream LEFT OUTER interval join: clicks with no "
    "same-user purchase within 1h emit a NULL row — but only once the "
    "WATERMARK has passed their join window (outer emission is "
    "watermark-driven, the part the inner join never exercises). A "
    "far-future sentinel row in a second micro-batch pushes the "
    "watermark past every window so the streaming answer equals the "
    "batch LEFT JOIN exactly — a full value oracle for outer "
    "streaming semantics. State stays bounded to the 1-hour tail per "
    "user key, as at 100 TB/day.",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = "t_ssleft"
    feed = os.path.join(work_root(), f"{name}_feed")
    shutil.rmtree(feed, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    ev.write.parquet(feed)

    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = os.path.join(work_root(), f"{name}_ckpt_{uuid.uuid4().hex[:8]}")

    schema = spark.read.parquet(feed).schema
    stream = spark.readStream.schema(schema).parquet(feed)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    q = (
        joined.writeStream.queryName(name)
        .outputMode("append")
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: all real events; inner matches emit
        # Outer emission lags the watermark by one batch, and the GLOBAL
        # watermark is the MIN over both sides' watermark operators — so
        # each sentinel batch must advance BOTH streams (a far-future
        # click AND a far-future purchase on disjoint sentinel users
        # that can never join). Batch 2 advances the watermark past
        # every click's join window; batch 3 evicts-and-emits ALL
        # remaining outer rows against it.
        for extra_h in (10, 20):
            sentinel = ev.agg(F.max("ts").alias("m")).select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(-1).cast("bigint").alias("event_id"),
                            (F.col("m") + F.expr(f"INTERVAL {extra_h} HOURS")).alias("ts"),
                            F.lit(-1).cast("bigint").alias("user_id"),
                            F.lit("click").alias("event_type"),
                        ),
                        F.struct(
                            F.lit(-2).cast("bigint").alias("event_id"),
                            (F.col("m") + F.expr(f"INTERVAL {extra_h} HOURS")).alias("ts"),
                            F.lit(-2).cast("bigint").alias("user_id"),
                            F.lit("purchase").alias("event_type"),
                        ),
                    )
                ).alias("s")
            ).select("s.*")
            sentinel.write.mode("append").parquet(feed)
            q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table(name)
        .filter(F.col("click_id") != -1)
        .orderBy("click_id", "purchase_id")
    )


@register(
    "stream_restart_recovery",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           round({sql_sum2('value')}, 2) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Exactly-once across QUERY RESTARTS: phase 1 drains half the "
    "feed through foreachBatch additive-MERGE into the snapshot "
    "table, then the StreamingQuery is STOPPED; a brand-new query "
    "object resumes from the same checkpoint and processes ONLY the "
    "appended second half. If checkpoint recovery re-delivered (or "
    "lost) phase-1 files, the additive counts would double (or drop) "
    "and the hash against the batch rollup would break — this is the "
    "restart-recovery guarantee production streaming jobs live on.",
)
def stream_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root

    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    name = "t_restart"
    feed = os.path.join(work_root(), f"{name}_feed")
    ckpt = os.path.join(work_root(), f"{name}_ckpt_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(feed, ignore_errors=True)
    cutoff = "2024-01-15"
    ev.filter(F.col("ts") < cutoff).write.parquet(feed)

    table = SnapshotTable(spark, "events_restart_agg", scratch_root())
    table.drop()

    def upsert_additive(batch_df, batch_id: int) -> None:
        # shared idempotent additive sink (at-least-once retry guard +
        # decomposable count/sum merge) — see additive_upsert; run_id =
        # checkpoint basename: q1 and q2 share ckpt (one lineage), so
        # restart recovery keeps the monotonic skip across query objects
        additive_upsert(table, batch_df, batch_id, ["event_type"], run_id=os.path.basename(ckpt))

    schema = spark.read.parquet(feed).schema

    def start_query():
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        return (
            spark.readStream.schema(schema)
            .parquet(feed)
            .writeStream.queryName(name)
            .foreachBatch(upsert_additive)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start_query()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # simulate a planned restart (or crash) between phases

    ev.filter(F.col("ts") >= cutoff).write.mode("append").parquet(feed)

    q2 = start_query()  # NEW query object, SAME checkpoint: must resume
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    return (
        table.read()
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.col("sum_value").cast("decimal(18,2)").cast("double"), 2).alias(
                "sum_value"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "stream_topk_trending",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    LIMIT 3
    """,
    doc="Streaming top-k trending in COMPLETE output mode — the one "
    "output mode where a streaming query may sort and limit: the "
    "running per-type count/value aggregation re-emits the full "
    "ranked top-3 after every micro-batch (two-phase file feed, so "
    "the ranking is genuinely re-derived from updated state). State "
    "is one row per event type — bounded by key cardinality, the "
    "complete-mode prerequisite. Final emission equals the batch "
    "top-3, giving the exact oracle.",
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    feed = os.path.join(work_root(), "topk_feed")
    ckpt = os.path.join(work_root(), f"topk_ckpt_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(feed, ignore_errors=True)
    cutoff = "2024-01-15 00:00:00"
    ev.filter(F.col("ts") < cutoff).write.parquet(feed)

    schema = spark.read.parquet(feed).schema
    ranked = (
        spark.readStream.schema(schema)
        .parquet(feed)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy(F.col("n_events").desc(), "event_type")
        .limit(3)
    )
    for q in spark.streams.active:
        if q.name == "t_topk":
            q.stop()
    q = (
        ranked.writeStream.queryName("t_topk")
        .outputMode("complete")  # ranking re-emitted in full per batch
        .format("memory")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.col("ts") >= cutoff).write.mode("append").parquet(feed)
        q.processAllAvailable()
        out = spark.table("t_topk").collect()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return local_df(
        spark,
        [(r["event_type"], int(r["n_events"]), float(r["sum_value"])) for r in out],
        "event_type string, n_events long, sum_value double",
    )
