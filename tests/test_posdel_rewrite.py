"""rewrite_position_deletes (VERDICT r14 ask #7): fold many small
position-delete files into one without touching data — Iceberg's
rewrite_position_delete_files maintenance twin — CDC-neutral and
read-invariant."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from empdia_iceberg_spark.tables.ddl import execute_ddl
from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root


def _pos_entries(t):
    meta = t._read_meta(t.current_version())
    return [
        dd
        for dd in meta.get("delete_dirs", [])
        if dd.get("kind") == "position"
    ]


def _stacked(spark, name, keys=(1, 7, 13)):
    t = SnapshotTable(spark, name, scratch_root())
    t.drop()
    nat = spark.read.parquet(
        f"{os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.001')}"
        "/nation.parquet"
    ).select("n_nationkey", "n_name")
    t.create(nat)
    for k in keys:
        t.delete_where_position(F.col("n_nationkey") == k)
    return t, nat


def test_rewrite_folds_to_one_entry_read_invariant(spark):
    t, nat = _stacked(spark, "t_pdrw_unit")
    before = sorted(r["n_nationkey"] for r in t.read().collect())
    assert len(_pos_entries(t)) == 3
    v = t.rewrite_position_deletes()
    assert len(_pos_entries(t)) == 1
    after = sorted(r["n_nationkey"] for r in t.read().collect())
    assert before == after and 1 not in after and 7 not in after
    # idempotent no-op on a single entry
    assert t.rewrite_position_deletes() == v
    t.drop()


def test_rewrite_is_cdc_neutral(spark):
    t, _ = _stacked(spark, "t_pdrw_cdc")
    v = t.rewrite_position_deletes()
    assert t.changes(v, v).count() == 0
    # and the folded deletes still replay as deletes BEFORE the rewrite
    pre = t.changes(1, v - 1)
    assert (
        pre.filter(F.col("_change_type") == "delete").count() == 3
    )
    t.drop()


def test_rewrite_survives_later_append_and_stacking(spark):
    """Coordinates only ever match their own immutable files: rows
    appended AFTER the rewrite are untouched, and a NEW position
    delete stacks on top of the folded one."""
    t, nat = _stacked(spark, "t_pdrw_stack")
    t.rewrite_position_deletes()
    t.append(
        t.spark.createDataFrame([(99, "NEW")], "n_nationkey int, n_name string")
    )
    assert t.read().filter(F.col("n_nationkey") == 99).count() == 1
    t.delete_where_position(F.col("n_nationkey") == 2)
    assert len(_pos_entries(t)) == 2
    t.rewrite_position_deletes()
    assert len(_pos_entries(t)) == 1
    got = {r["n_nationkey"] for r in t.read().collect()}
    assert 99 in got and not ({1, 2, 7, 13} & got)
    t.drop()


def test_call_procedure_surface(spark):
    t, _ = _stacked(spark, "t_pdrw_call")
    res = execute_ddl(
        spark,
        "CALL rewrite_position_deletes('t_pdrw_call')",
        root=scratch_root(),
    )
    assert res["audit"]["position_delete_files_before"] == 3
    assert res["audit"]["position_delete_files_after"] == 1
    assert len(_pos_entries(t)) == 1
    t.drop()


def test_plain_tail_skips_rewrite_commit(spark):
    """The maintenance commit has zero data delta — a plain tail must
    not raise on it."""
    from empdia_iceberg_spark.sources.table_stream import (
        SnapshotTailDataSource,
        SnapshotTailStreamReader,
    )

    t, _ = _stacked(spark, "t_pdrw_tail")
    v_rw = t.rewrite_position_deletes()
    ds = SnapshotTailDataSource(
        {"table": "t_pdrw_tail", "root": scratch_root()}
    )
    reader = SnapshotTailStreamReader(ds.options, ds.schema().json())
    # the rewrite commit itself is metadata-class: zero new files, no
    # change-commit raise even in strict mode
    assert reader._new_files(v_rw, raise_on_change=True) == []
    t.drop()
