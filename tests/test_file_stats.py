"""Per-file column-stat manifests (VERDICT r14 ask #3): parquet-footer
min/max/null-count per data file, cached in an immutable-dir sidecar,
consulted by predicate DML's file-finding pass so it costs O(candidate
files) instead of O(table). Stats pruning only ever narrows the scan —
the predicate re-applies to every surviving row."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from empdia_iceberg_spark.tables.ddl import execute_sql
from empdia_iceberg_spark.tables.dml import execute_dml
from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root


def _ranged_table(spark, name):
    t = SnapshotTable(spark, name, scratch_root())
    t.drop()
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    t.create(mk(0, 1000))
    t.append(mk(1000, 2000))
    t.append(mk(2000, 3000))
    return t


def _audit(name):
    return SnapshotTable._DML_STATS_AUDITS.get(name)


def test_stats_skip_nonmatching_files(spark):
    t = _ranged_table(spark, "t_fs_skip")
    meta = t._read_meta(t.current_version())
    hit = t._dirs_matching(meta, F.col("k") == 1500)
    assert len(hit) == 1
    a = _audit("t_fs_skip")
    assert a["bounded_columns"] == ["k"]
    assert a["files_skipped_by_stats"] == 2 and a["files_scanned"] == 1
    t.drop()


def test_stats_impossible_predicate_scans_nothing(spark):
    t = _ranged_table(spark, "t_fs_zero")
    meta = t._read_meta(t.current_version())
    hit = t._dirs_matching(meta, F.col("k") < -5)
    assert hit == set()
    assert _audit("t_fs_zero")["files_scanned"] == 0
    t.drop()


def test_stats_float_bounds(spark):
    t = _ranged_table(spark, "t_fs_float")
    meta = t._read_meta(t.current_version())
    hit = t._dirs_matching(meta, F.col("v") <= 500.5)
    assert len(hit) == 1
    a = _audit("t_fs_float")
    assert "v" in a["bounded_columns"] and a["files_skipped_by_stats"] == 2
    t.drop()


def test_dml_results_identical_with_stats(spark):
    """DELETE/UPDATE through the stats-consulting pass must be
    byte-identical to the predicate semantics."""
    t = _ranged_table(spark, "t_fs_dml")
    t.delete_where_pruned(F.col("k").between(900, 1100))
    assert t.read().count() == 3000 - 201
    assert t.read().filter(F.col("k").between(900, 1100)).count() == 0
    a = _audit("t_fs_dml")
    assert a["files_skipped_by_stats"] >= 1  # the k>=2000 file skipped
    t.drop()


def test_unparseable_predicate_falls_back_to_full_scan(spark):
    t = _ranged_table(spark, "t_fs_or")
    meta = t._read_meta(t.current_version())
    hit = t._dirs_matching(
        meta, (F.col("k") == 10) | (F.col("k") == 2500)
    )
    assert len(hit) == 2  # both matching dirs found, nothing missed
    a = _audit("t_fs_or")
    assert a["bounded_columns"] == [] and a["files_scanned"] == -1
    t.drop()


def test_sidecar_cached_and_corruption_recovers(spark):
    t = _ranged_table(spark, "t_fs_cache")
    meta = t._read_meta(t.current_version())
    t._dirs_matching(meta, F.col("k") == 10)
    side = os.path.join(meta["dirs"][0], SnapshotTable._STATS_SIDECAR)
    assert os.path.exists(side)
    with open(side) as fh:
        cached = json.load(fh)
    assert all(
        "k" in ent["cols"] and "v" in ent["cols"]
        for ent in cached["files"].values()
    )
    with open(side, "w") as fh:
        fh.write("{corrupt")
    hit = t._dirs_matching(meta, F.col("k") == 10)
    assert len(hit) == 1  # recomputed transparently
    t.drop()


def test_stats_with_hive_subdirs(spark):
    t = SnapshotTable(spark, "t_fs_hive", scratch_root())
    t.drop()
    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)], "k int, p string"
    )
    t.create(df, partition_by=["p"])
    meta = t._read_meta(t.current_version())
    hit = t._dirs_matching(meta, F.col("k") == 75)
    assert len(hit) == 1
    a = _audit("t_fs_hive")
    assert a["files_skipped_by_stats"] >= 1  # the p=a subdir file
    t.drop()


def test_stats_after_rename_uses_physical_names(spark):
    t = _ranged_table(spark, "t_fs_rename")
    execute_sql(
        spark,
        "ALTER TABLE t_fs_rename RENAME COLUMN k TO key",
        scratch_root(),
    )
    execute_dml(
        spark,
        "DELETE FROM t_fs_rename WHERE key = 1500",
        root=scratch_root(),
    )
    t2 = SnapshotTable(spark, "t_fs_rename", scratch_root())
    assert t2.read().count() == 2999
    a = _audit("t_fs_rename")
    # the logical bound 'key' mapped onto physical column 'k' stats
    assert a["bounded_columns"] == ["key"]
    assert a["files_skipped_by_stats"] == 2
    t2.drop()


def test_timestamp_stats_prune_after_micros_write(spark):
    """Table writes store timestamps as INT64 micros (r15 — INT96
    chunks carry no footer stats), so time predicates stat-prune and
    DML semantics stay exact."""
    t = SnapshotTable(spark, "t_fs_ts", scratch_root())
    t.drop()
    for d in (1, 2, 3):
        df = spark.createDataFrame(
            [(f"2024-01-{d:02d} 00:00:00", d)], "raw string, n int"
        ).select(F.col("raw").cast("timestamp").alias("ts"), "n")
        (t.create if d == 1 else t.append)(df)
    meta = t._read_meta(t.current_version())
    hit = t._dirs_matching(
        meta, F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    assert len(hit) == 1
    a = _audit("t_fs_ts")
    assert a["files_skipped_by_stats"] == 2, a
    t.delete_where_pruned(
        F.col("ts") == F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    assert sorted(r["n"] for r in t.read().collect()) == [1, 3]
    # the session conf was restored after every engine write
    assert (
        spark.conf.get("spark.sql.parquet.outputTimestampType") != ""
    )
    t.drop()
