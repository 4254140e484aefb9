"""`t.file_stats` metadata table + `CALL compute_file_stats` (r15):
the readable surface over the footer-stat sidecars."""

from __future__ import annotations

from pyspark.sql import functions as F

from empdia_iceberg_spark.tables.ddl import execute_ddl, execute_sql
from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root


def test_file_stats_metadata_table_and_call(spark):
    t = SnapshotTable(spark, "t_fsmeta_unit", scratch_root())
    t.drop()
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    t.create(mk(0, 100))
    t.append(mk(100, 200))
    res = execute_ddl(
        spark, "CALL compute_file_stats('t_fsmeta_unit')", root=scratch_root()
    )
    assert res["audit"]["files_profiled"] >= 2
    assert res["audit"]["column_entries"] >= 4
    rows = execute_sql(
        spark,
        "SELECT col_name, min_value, max_value, null_count "
        "FROM t_fsmeta_unit.file_stats ORDER BY file, col_name",
        scratch_root(),
    ).collect()
    by_col = {}
    for r in rows:
        by_col.setdefault(r["col_name"], []).append(r)
    assert set(by_col) == {"k", "v"}
    mins = sorted(int(r["min_value"]) for r in by_col["k"])
    maxs = sorted(int(r["max_value"]) for r in by_col["k"])
    assert mins[0] == 0 and maxs[-1] == 199
    assert all(r["null_count"] == 0 for r in rows)
    # joins against other metadata tables compose in one statement
    j = execute_sql(
        spark,
        "SELECT count(*) AS c FROM t_fsmeta_unit.file_stats fs "
        "JOIN t_fsmeta_unit.files f ON fs.dir = f.dir",
        scratch_root(),
    ).collect()[0]["c"]
    assert j == len(rows)
    t.drop()
