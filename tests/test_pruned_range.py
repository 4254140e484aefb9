"""Range + merge-on-read composition for transform-pruned reads
(VERDICT r14 ask #2): `read_pruned_transform_range` serves
`ts BETWEEN a AND b` over days(ts) layouts with live MOR deletes, and
the point pruned reads no longer raise on (or resurrect rows from)
delete-bearing tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root


def _day_table(spark, name, days=("01", "02", "03", "04", "05")):
    t = SnapshotTable(spark, name, scratch_root())
    t.drop()
    rows = [(f"2024-01-{d} 12:00:00", int(d)) for d in days]
    df = spark.createDataFrame(rows, "raw string, n int").select(
        F.col("raw").cast("timestamp").alias("ts"), "n"
    )
    t.create(df, partition_by=["days(ts)"])
    return t


def test_range_selects_inclusive_days(spark):
    t = _day_table(spark, "t_rng_days")
    df, audit = t.read_pruned_transform_range(
        "days(ts)", "2024-01-02", "2024-01-04"
    )
    assert sorted(r["n"] for r in df.collect()) == [2, 3, 4]
    assert audit["subdirs_selected"] == 3
    assert audit["subdirs_pruned"] == 2
    assert audit["dirs_full_scan"] == 0
    t.drop()


def test_range_open_ends(spark):
    t = _day_table(spark, "t_rng_open")
    lo, _ = t.read_pruned_transform_range("days(ts)", "2024-01-04", None)
    assert sorted(r["n"] for r in lo.collect()) == [4, 5]
    hi, _ = t.read_pruned_transform_range("days(ts)", None, "2024-01-02")
    assert sorted(r["n"] for r in hi.collect()) == [1, 2]
    with pytest.raises(ValueError, match="at least one bound"):
        t.read_pruned_transform_range("days(ts)", None, None)
    t.drop()


def test_range_spans_multiple_append_dirs(spark):
    t = _day_table(spark, "t_rng_multi", days=("01", "02"))
    extra = spark.createDataFrame(
        [("2024-01-03 01:00:00", 3), ("2024-01-09 01:00:00", 9)],
        "raw string, n int",
    ).select(F.col("raw").cast("timestamp").alias("ts"), "n")
    t.append(extra)
    df, audit = t.read_pruned_transform_range(
        "days(ts)", "2024-01-02", "2024-01-05"
    )
    assert sorted(r["n"] for r in df.collect()) == [2, 3]
    # two data dirs, each contributed a listed-and-filtered subdir set
    assert audit["subdirs_selected"] == 2
    assert audit["subdirs_pruned"] == 2
    t.drop()


def test_range_composes_with_equality_delete(spark):
    """A live MOR equality delete applies inside the pruned range read —
    the raise-on-deletes guard is gone and rows never resurrect."""
    t = _day_table(spark, "t_rng_mor")
    t.delete_where_mor(F.col("n") == 3, key="n")
    df, audit = t.read_pruned_transform_range(
        "days(ts)", "2024-01-02", "2024-01-04"
    )
    assert sorted(r["n"] for r in df.collect()) == [2, 4]
    assert audit["mor_deletes_applied"] == 1
    assert audit["subdirs_selected"] == 3
    # the full read agrees (pruning is never a semantics change)
    expect = sorted(
        r["n"]
        for r in t.read()
        .filter(F.to_date("ts").between("2024-01-02", "2024-01-04"))
        .collect()
    )
    assert sorted(r["n"] for r in df.collect()) == expect
    t.drop()


def test_range_composes_with_position_delete(spark):
    t = _day_table(spark, "t_rng_posdel")
    t.delete_where_position(F.col("n") == 2)
    df, _ = t.read_pruned_transform_range(
        "days(ts)", "2024-01-01", "2024-01-03"
    )
    assert sorted(r["n"] for r in df.collect()) == [1, 3]
    t.drop()


def test_point_pruned_transform_over_mor_no_longer_raises(spark):
    t = _day_table(spark, "t_pt_mor")
    t.delete_where_mor(F.col("n") == 2, key="n")
    df, audit = t.read_pruned_transform("days(ts)", "2024-01-02")
    assert df.collect() == []
    assert audit["subdirs_selected"] == 1
    df2, _ = t.read_pruned_transform("days(ts)", "2024-01-03")
    assert [r["n"] for r in df2.collect()] == [3]
    t.drop()


def test_read_pruned_identity_applies_mor_deletes(spark):
    """r15 latent-bug fix: read_pruned over a delete-bearing table used
    to read raw dirs and resurrect MOR-deleted rows."""
    t = SnapshotTable(spark, "t_idprune_mor", scratch_root())
    t.drop()
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, n int"
    )
    t.create(df, partition_by=["k"])
    t.delete_where_mor(F.col("n") == 2, key="n")
    got = sorted(r["n"] for r in t.read_pruned("k", "a").collect())
    assert got == [1], "MOR-deleted row resurrected through read_pruned"
    t.drop()


def test_range_int_truncate_compares_numerically(spark):
    """truncate(10, n) dir values 0/90/100: numeric range [0, 90] must
    include 90 and exclude 100 (string compare would invert both)."""
    t = SnapshotTable(spark, "t_rng_trunc", scratch_root())
    t.drop()
    df = spark.createDataFrame([(5,), (95,), (105,)], "n int")
    t.create(df, partition_by=["truncate(10, n)"])
    got, audit = t.read_pruned_transform_range("truncate(10, n)", 0, 90)
    assert sorted(r["n"] for r in got.collect()) == [5, 95]
    assert audit["subdirs_selected"] == 2 and audit["subdirs_pruned"] == 1
    t.drop()


def test_range_string_truncate_with_escaped_values(spark):
    t = SnapshotTable(spark, "t_rng_esc", scratch_root())
    t.drop()
    df = spark.createDataFrame(
        [("a/x", 1), ("b:y", 2), ("c=z", 3)], "s string, n int"
    )
    t.create(df, partition_by=["truncate(2, s)"])
    got, audit = t.read_pruned_transform_range("truncate(2, s)", "a/", "b:")
    assert sorted(r["n"] for r in got.collect()) == [1, 2]
    assert audit["subdirs_selected"] == 2
    t.drop()


def test_range_bucket_refused(spark):
    t = SnapshotTable(spark, "t_rng_bucket", scratch_root())
    t.drop()
    t.create(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        partition_by=["bucket(4, k)"],
    )
    with pytest.raises(ValueError, match="ordering"):
        t.read_pruned_transform_range("bucket(4, k)", 0, 2)
    t.drop()


def test_range_mixed_spec_dirs_full_scan_residual(spark):
    """A dir written under a DIFFERENT spec reads whole behind the
    residual — rows outside the range never leak through it."""
    t = _day_table(spark, "t_rng_mixed", days=("01", "02"))
    t.evolve_partitioning(["months(ts)"])
    extra = spark.createDataFrame(
        [("2024-01-03 01:00:00", 3), ("2024-02-01 01:00:00", 20)],
        "raw string, n int",
    ).select(F.col("raw").cast("timestamp").alias("ts"), "n")
    t.append(extra)
    df, audit = t.read_pruned_transform_range(
        "days(ts)", "2024-01-02", "2024-01-05"
    )
    assert sorted(r["n"] for r in df.collect()) == [2, 3]
    assert audit["dirs_full_scan"] == 1
    t.drop()


def test_range_null_partition_pruned(spark):
    """NULL transform values live in __HIVE_DEFAULT_PARTITION__; a range
    residual is never NULL-satisfiable, so the subdir prunes away."""
    t = SnapshotTable(spark, "t_rng_null", scratch_root())
    t.drop()
    df = spark.createDataFrame(
        [("2024-01-02 01:00:00", 1), (None, 2)], "raw string, n int"
    ).select(F.col("raw").cast("timestamp").alias("ts"), "n")
    t.create(df, partition_by=["days(ts)"])
    got, audit = t.read_pruned_transform_range(
        "days(ts)", "2024-01-01", "2024-01-05"
    )
    assert [r["n"] for r in got.collect()] == [1]
    assert audit["subdirs_pruned"] == 1
    t.drop()
