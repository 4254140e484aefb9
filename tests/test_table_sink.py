"""Native streaming SINK into snapshot tables (sources/table_sink.py,
r13 VERDICT r12 ask #7): exactly-once batch-id stamping, redelivery
skip, abort cleanup, and schema guards."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from empdia_iceberg_spark.sources.table_sink import (
    SnapshotStreamWriter,
    SnapshotWriteDataSource,
)
from empdia_iceberg_spark.sources.table_stream import SnapshotTailDataSource
from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root
from tests.conftest import SF_DIR


@pytest.fixture()
def nation(spark):
    return spark.read.parquet(f"{SF_DIR}/nation.parquet")


def _writer(spark, table, run_id="t"):
    schema = T.StructType.fromJson(
        __import__("json").loads(
            SnapshotTable(spark, table, scratch_root())._read_meta(1)["schema"]
        )
    )
    return SnapshotStreamWriter(
        {"table": table, "root": scratch_root(), "run_id": run_id}, schema
    )


def test_sink_streams_appends_exactly_once_across_restart(spark, nation):
    spark.dataSource.register(SnapshotTailDataSource)
    spark.dataSource.register(SnapshotWriteDataSource)
    root = scratch_root()
    src = SnapshotTable(spark, "t_sink_src_unit", root)
    dst = SnapshotTable(spark, "t_sink_dst_unit", root)
    src.drop(), dst.drop()
    src.create(nation.filter(F.col("n_nationkey") < 10))
    dst.create(nation.limit(0))
    run = uuid.uuid4().hex[:8]
    ckpt = f"/tmp/t_sink_ckpt_{run}"

    def drain():
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", "t_sink_src_unit")
            .option("root", root)
            .load()
            .writeStream.format("snapshot_write")
            .option("table", "t_sink_dst_unit")
            .option("root", root)
            .option("run_id", run)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()
        assert dst.read().count() == 10
        src.append(nation.filter(F.col("n_nationkey") >= 10))
        drain()  # restart against the same checkpoint: only the append
        assert dst.read().count() == nation.count()
        ops = [m["op"] for m in dst.snapshots()]
        assert ops[0] == "create" and all(
            o.startswith(f"append@{run}#b") for o in ops[1:]
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        src.drop(), dst.drop()


def test_sink_commit_skips_redelivered_batch(spark, nation):
    """A redelivered micro-batch (crash between table commit and the
    Spark checkpoint write) must be recognized by its stamp and
    skipped, its staged files reclaimed — the exactly-once core."""
    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_redeliver_unit", root)
    dst.drop()
    dst.create(nation.limit(0))
    w = _writer(spark, "t_sink_redeliver_unit")
    rows = [tuple(r) for r in nation.limit(3).collect()]
    msg = w.write(iter(rows))
    w.commit([msg], 0)
    assert dst.read().count() == 3
    v = dst.current_version()
    # redelivery: same batch id, fresh staged file
    msg2 = w.write(iter(rows))
    w.commit([msg2], 0)
    assert dst.current_version() == v, "duplicate batch must not commit"
    assert dst.read().count() == 3
    assert not os.path.exists(msg2.path), "skipped batch's file reclaimed"
    # next batch id lands normally
    msg3 = w.write(iter(rows))
    w.commit([msg3], 1)
    assert dst.read().count() == 6
    dst.drop()


def test_sink_empty_batch_stamps_metadata_only(spark, nation):
    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_empty_unit", root)
    dst.drop()
    dst.create(nation.limit(0))
    w = _writer(spark, "t_sink_empty_unit")
    w.commit([w.write(iter([]))], 0)
    meta = dst._read_meta(dst.current_version())
    assert meta["op"].endswith("#b0") and meta["dirs"] == dst._read_meta(1)["dirs"]
    dst.drop()


def test_sink_abort_reclaims_staged_files(spark, nation):
    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_abort_unit", root)
    dst.drop()
    dst.create(nation.limit(0))
    w = _writer(spark, "t_sink_abort_unit")
    msg = w.write(iter([tuple(r) for r in nation.limit(2).collect()]))
    assert os.path.exists(msg.path)
    w.abort([msg], 0)
    assert not os.path.exists(msg.path)
    assert dst.current_version() == 1
    dst.drop()


def test_sink_guards_schema_and_existence(spark, nation):
    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_guard_unit", root)
    dst.drop()
    dst.create(nation.limit(0))
    with pytest.raises(ValueError, match="does not exist"):
        SnapshotStreamWriter(
            {"table": "no_such_sink_table", "root": root},
            nation.schema,
        )
    with pytest.raises(ValueError, match="must exactly match"):
        SnapshotStreamWriter(
            {"table": "t_sink_guard_unit", "root": root},
            T.StructType([T.StructField("x", T.IntegerType())]),
        )
    dst.drop()


def test_sink_reclaims_stale_staging_orphans(spark, nation, monkeypatch):
    """A crashed run's staging files age out on the next writer
    construction; fresh orphans and the live lineage survive."""
    import time as _time

    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_orphan_unit", root)
    dst.drop()
    dst.create(nation.limit(0))
    ns = os.path.join(dst.base, ".stream_stage")
    dead = os.path.join(ns, "deadrun")
    os.makedirs(dead)
    orphan = os.path.join(dead, "part-x.parquet")
    open(orphan, "wb").write(b"orphan")
    old = _time.time() - 10
    os.utime(orphan, (old, old))
    os.utime(dead, (old, old))
    fresh = os.path.join(ns, "freshrun")
    os.makedirs(fresh)
    open(os.path.join(fresh, "part-y.parquet"), "wb").write(b"live")
    monkeypatch.setenv("EMPDIA_SINK_STAGE_IDLE_SEC", "5")
    _writer(spark, "t_sink_orphan_unit", run_id="live")
    assert not os.path.exists(dead), "10s-idle orphan must age out at bound 5s"
    assert os.path.exists(fresh), "fresh staging must survive"
    dst.drop()


def test_sink_timestamps_preserve_instants_across_session_zones(spark, nation):
    """Naive session-local datetimes must land as the same INSTANT the
    engine's own parquet writes store — not reinterpreted as UTC (r13
    review). Proven by flipping the session zone and comparing against
    a batch append of identical rows."""
    import datetime

    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_tz_unit", root)
    ref = SnapshotTable(spark, "t_ref_tz_unit", root)
    dst.drop(), ref.drop()
    rows = [(1, datetime.datetime(2026, 1, 1, 12, 0, 0))]
    schema = "k int, ts timestamp"
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        frame = spark.createDataFrame(rows, schema)
        dst.create(frame.limit(0))
        ref.create(frame)  # the engine's own write path = ground truth
        w = SnapshotStreamWriter(
            {"table": "t_sink_tz_unit", "root": root, "run_id": "tz"},
            frame.schema,
        )
        w.commit([w.write(iter([tuple(r) for r in frame.collect()]))], 0)
        got = dst.read().collect()[0].ts
        want = ref.read().collect()[0].ts
        assert got == want, f"sink stored {got}, batch write stored {want}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        dst.drop(), ref.drop()


def test_sink_fed_table_is_tailable_downstream(spark, nation):
    """bronze -> silver -> gold through the native source+sink pair on
    BOTH hops: snapshot_write stamps append@-shaped ops, which
    snapshot_tail treats as plain appends — medallion hops chain with
    no foreachBatch anywhere."""
    spark.dataSource.register(SnapshotTailDataSource)
    spark.dataSource.register(SnapshotWriteDataSource)
    root = scratch_root()
    bronze = SnapshotTable(spark, "t_chain_bronze_unit", root)
    silver = SnapshotTable(spark, "t_chain_silver_unit", root)
    gold = SnapshotTable(spark, "t_chain_gold_unit", root)
    for t in (bronze, silver, gold):
        t.drop()
    bronze.create(nation)
    silver.create(nation.limit(0))
    gold.create(nation.limit(0))
    run = uuid.uuid4().hex[:8]

    def hop(src, dst, ckpt):
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", src)
            .option("root", root)
            .load()
            .writeStream.format("snapshot_write")
            .option("table", dst)
            .option("root", root)
            .option("run_id", f"{run}_{dst}")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    c1, c2 = f"/tmp/t_chain1_{run}", f"/tmp/t_chain2_{run}"
    try:
        hop("t_chain_bronze_unit", "t_chain_silver_unit", c1)
        hop("t_chain_silver_unit", "t_chain_gold_unit", c2)
        assert gold.read().count() == nation.count()
        # a second bronze append flows through BOTH hops incrementally
        bronze.append(
            spark.createDataFrame(
                [(900, "NEWLAND", 1)], "n_nationkey int, n_name string, n_regionkey int"
            ).select(*nation.columns)
        )
        hop("t_chain_bronze_unit", "t_chain_silver_unit", c1)
        hop("t_chain_silver_unit", "t_chain_gold_unit", c2)
        assert gold.read().count() == nation.count() + 1
        assert silver.read().count() == nation.count() + 1
    finally:
        for c in (c1, c2):
            shutil.rmtree(c, ignore_errors=True)
        for t in (bronze, silver, gold):
            t.drop()


def test_two_concurrent_sink_lineages_both_land(spark, nation, tmp_path):
    """Two PROCESSES streaming into ONE table under different run_ids:
    OCC append commits must interleave without losing either lineage's
    batches (the additive_upsert multi-writer contract, proven for the
    native sink)."""
    import subprocess
    import sys as _sys

    root = scratch_root()
    dst = SnapshotTable(spark, "t_sink_race_unit", root)
    dst.drop()
    dst.create(spark.createDataFrame([], "k long, who string"))
    worker = tmp_path / "sink_worker.py"
    worker.write_text(
        f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from empdia_iceberg_spark.session import get_spark
from empdia_iceberg_spark.sources.table_sink import SnapshotStreamWriter
from pyspark.sql import types as T

who = sys.argv[1]
spark = get_spark(app_name="sink-race-" + who)
schema = T.StructType([
    T.StructField("k", T.LongType()), T.StructField("who", T.StringType()),
])
w = SnapshotStreamWriter(
    {{"table": "t_sink_race_unit", "root": {root!r}, "run_id": who}}, schema
)
for b in range(4):
    rows = [(b * 10 + i, who) for i in range(5)]
    w.commit([w.write(iter(rows))], b)
print("WORKER_OK")
"""
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), who],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for who in ("alpha", "beta")
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "WORKER_OK" in out, out[-3000:]
    counts = {
        r.who: r.n
        for r in dst.read().groupBy("who").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"alpha": 20, "beta": 20}, counts
    ops = [m["op"] for m in dst.snapshots()]
    assert sum(o.startswith("append@alpha#b") for o in ops) == 4
    assert sum(o.startswith("append@beta#b") for o in ops) == 4
    dst.drop()


# -------------------------------------------------- small-file hygiene (r14)


def test_compact_minor_merges_only_small_delete_free_dirs(spark, nation):
    t = SnapshotTable(spark, "t_cminor_unit", scratch_root())
    t.drop()
    # dir 1 becomes delete-bearing (applies_to pins dirs that existed at
    # delete time); the three later appends are delete-free trickle
    t.create(nation.filter(F.col("n_nationkey") < 5))
    t.delete_where_mor(F.col("n_nationkey") == 2, key="n_nationkey")
    t.append(nation.filter((F.col("n_nationkey") >= 5) & (F.col("n_nationkey") < 10)))
    t.append(nation.filter((F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 15)))
    t.append(nation.filter(F.col("n_nationkey") >= 15))
    before = sorted(r.n_nationkey for r in t.read().collect())
    v, audit = t.compact_minor(small_bytes=32 * 1024 * 1024)
    assert v is not None
    assert audit["dirs_merged"] == 3      # the trickle appends
    assert audit["dirs_carried"] == 1     # the delete-bearing create dir
    meta = t._read_meta(t.current_version())
    assert len(meta["dirs"]) == 2
    assert sorted(r.n_nationkey for r in t.read().collect()) == before
    assert t.read().filter(F.col("n_nationkey") == 2).count() == 0
    t.drop()


def test_compact_minor_noop_below_two_dirs_and_respects_threshold(spark, nation):
    t = SnapshotTable(spark, "t_cminor_noop_unit", scratch_root())
    t.drop()
    t.create(nation)
    v, audit = t.compact_minor()
    assert v is None and audit["dirs_merged"] <= 1
    # threshold: tiny limit treats every dir as big -> no-op
    t.append(nation.limit(3))
    v2, audit2 = t.compact_minor(small_bytes=1)
    assert v2 is None and audit2["dirs_merged"] == 0
    t.drop()


def test_sink_auto_compact_bounds_dir_count(spark, nation):
    """A sink fed 4 one-batch appends with auto_compact_every=2 must
    end with FEWER data dirs than batches, same rows — the small-file
    policy working inside the stream itself."""
    spark.dataSource.register(SnapshotTailDataSource)
    spark.dataSource.register(SnapshotWriteDataSource)
    root = scratch_root()
    src = SnapshotTable(spark, "t_ac_src_unit", root)
    dst = SnapshotTable(spark, "t_ac_dst_unit", root)
    src.drop(), dst.drop()
    src.create(nation.filter(F.col("n_nationkey") < 5))
    dst.create(nation.limit(0))
    run = uuid.uuid4().hex[:8]
    ckpt = f"/tmp/t_ac_ckpt_{run}"

    def drain():
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", "t_ac_src_unit")
            .option("root", root)
            .load()
            .writeStream.format("snapshot_write")
            .option("table", "t_ac_dst_unit")
            .option("root", root)
            .option("run_id", run)
            .option("auto_compact_every", "2")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()
        for lo, hi in ((5, 10), (10, 15), (15, 26)):
            src.append(
                nation.filter(
                    (F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < hi)
                )
            )
            drain()
        assert dst.read().count() == nation.count()
        ops = [s["op"] for s in dst.snapshots()]
        assert any(op == "compact-minor" for op in ops), ops
        n_dirs = len(dst._read_meta(dst.current_version())["dirs"])
        assert n_dirs < 4, f"expected merged trickle dirs, got {n_dirs}"
        assert sorted(r.n_nationkey for r in dst.read().collect()) == sorted(
            r.n_nationkey for r in nation.collect()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        src.drop()
        dst.drop()


def test_downstream_tail_survives_auto_compact_commits(spark, nation):
    """A table fed by the auto-compacting sink can still be tailed
    downstream: compact-minor commits are CoW swaps, so a
    skip_change_commits tail skips them and a CDC tail diffs them to
    zero rows — either way the downstream sees each row exactly once."""
    spark.dataSource.register(SnapshotTailDataSource)
    spark.dataSource.register(SnapshotWriteDataSource)
    root = scratch_root()
    src = SnapshotTable(spark, "t_act_src_unit", root)
    mid = SnapshotTable(spark, "t_act_mid_unit", root)
    src.drop(), mid.drop()
    src.create(nation.filter(F.col("n_nationkey") < 8))
    mid.create(nation.limit(0))
    run = uuid.uuid4().hex[:8]
    ckpt1 = f"/tmp/t_act_ck1_{run}"
    ckpt2 = f"/tmp/t_act_ck2_{run}"
    sink2 = f"/tmp/t_act_out_{run}"

    def hop1():
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", "t_act_src_unit")
            .option("root", root)
            .load()
            .writeStream.format("snapshot_write")
            .option("table", "t_act_mid_unit")
            .option("root", root)
            .option("run_id", run)
            .option("auto_compact_every", "1")  # sweep after EVERY batch
            .option("checkpointLocation", ckpt1)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def hop2():
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", "t_act_mid_unit")
            .option("root", root)
            .option("skip_change_commits", "true")
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: df.write.mode("append").parquet(sink2))
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        hop1()
        hop2()
        src.append(nation.filter((F.col("n_nationkey") >= 8) & (F.col("n_nationkey") < 16)))
        src.append(nation.filter(F.col("n_nationkey") >= 16))
        hop1()  # two batches -> two appends + compact-minor sweeps
        hop2()  # must resume past the compaction commits, no loss, no dupes
        got = sorted(r.n_nationkey for r in spark.read.parquet(sink2).collect())
        assert got == sorted(r.n_nationkey for r in nation.collect())
        assert any(s["op"] == "compact-minor" for s in mid.snapshots())
    finally:
        for d in (ckpt1, ckpt2, sink2):
            shutil.rmtree(d, ignore_errors=True)
        src.drop()
        mid.drop()
