"""SQL-path partition pruning (VERDICT r14 ask #1): plain
`SELECT ... FROM t WHERE <partition predicate>` through execute_sql
binds the temp view to a dir-pruned read; scoping is proven by
Catalyst's own pushed-down filters, and anything unprovable falls back
to the full plan — never a semantics change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from empdia_iceberg_spark.tables import sqlprune
from empdia_iceberg_spark.tables.ddl import execute_sql
from empdia_iceberg_spark.tables.manager import SnapshotTable, scratch_root


@pytest.fixture()
def day_table(spark):
    t = SnapshotTable(spark, "t_sqlp_days", scratch_root())
    t.drop()
    df = spark.createDataFrame(
        [(f"2024-01-{d:02d} 12:00:00", d) for d in range(1, 6)],
        "raw string, n int",
    ).select(F.col("raw").cast("timestamp").alias("ts"), "n")
    t.create(df, partition_by=["days(ts)"])
    yield t
    t.drop()


def _audit(name):
    return sqlprune.LAST_SQL_PRUNE_AUDITS.get(name)


def test_cast_date_equality_prunes_to_one_subdir(spark, day_table):
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT n FROM t_sqlp_days WHERE CAST(ts AS DATE) = DATE'2024-01-03'",
        scratch_root(),
    )
    assert [x["n"] for x in r.collect()] == [3]
    a = _audit("t_sqlp_days")
    assert a and a["subdirs_selected"] == 1 and a["subdirs_pruned"] == 4


def test_between_prunes_to_range(spark, day_table):
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT n FROM t_sqlp_days WHERE ts BETWEEN "
        "TIMESTAMP'2024-01-02 00:00:00' AND TIMESTAMP'2024-01-04 23:59:59'",
        scratch_root(),
    )
    assert sorted(x["n"] for x in r.collect()) == [2, 3, 4]
    a = _audit("t_sqlp_days")
    assert a and a["subdirs_selected"] == 3 and a["subdirs_pruned"] == 2


def test_alias_and_subquery_scoping(spark, day_table):
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT s.n FROM (SELECT * FROM t_sqlp_days AS x "
        "WHERE x.ts >= TIMESTAMP'2024-01-04 00:00:00') s",
        scratch_root(),
    )
    assert sorted(x["n"] for x in r.collect()) == [4, 5]
    a = _audit("t_sqlp_days")
    assert a and a["subdirs_selected"] == 2 and a["subdirs_pruned"] == 3


def test_cte_scoping(spark, day_table):
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "WITH w AS (SELECT * FROM t_sqlp_days "
        "WHERE CAST(ts AS DATE) = DATE'2024-01-02') "
        "SELECT count(*) AS c FROM w",
        scratch_root(),
    )
    assert r.collect()[0]["c"] == 1
    a = _audit("t_sqlp_days")
    assert a and a["subdirs_selected"] == 1


def test_join_side_predicate(spark, day_table):
    spark.createDataFrame([(3, "three"), (4, "four")], "n int, w string") \
        .createOrReplaceTempView("sqlp_dim")
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT d.w FROM t_sqlp_days t JOIN sqlp_dim d ON t.n = d.n "
        "WHERE CAST(t.ts AS DATE) = DATE'2024-01-03'",
        scratch_root(),
    )
    assert [x["w"] for x in r.collect()] == ["three"]
    a = _audit("t_sqlp_days")
    assert a and a["subdirs_selected"] == 1


def test_self_join_unions_bounds(spark, day_table):
    """Two scans of the same view with different day predicates: the
    shared pruned view must serve BOTH days (union of bounds)."""
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT a.n AS n1, b.n AS n2 FROM t_sqlp_days a, t_sqlp_days b "
        "WHERE CAST(a.ts AS DATE) = DATE'2024-01-01' "
        "AND CAST(b.ts AS DATE) = DATE'2024-01-05'",
        scratch_root(),
    )
    rows = r.collect()
    assert [(x["n1"], x["n2"]) for x in rows] == [(1, 5)]
    a = _audit("t_sqlp_days")
    # union range [01, 05] covers all five days -> no subdir pruned;
    # pruning correctly declines to engage (audit may be absent)
    assert a is None or a["subdirs_pruned"] == 0


def test_union_all_with_unfiltered_occurrence_no_prune(spark, day_table):
    """One scan has no predicate -> the view must stay full."""
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT n FROM t_sqlp_days WHERE CAST(ts AS DATE) = DATE'2024-01-01' "
        "UNION ALL SELECT n FROM t_sqlp_days",
        scratch_root(),
    )
    assert sorted(x["n"] for x in r.collect()) == [1, 1, 2, 3, 4, 5]
    assert _audit("t_sqlp_days") is None


def test_or_predicate_no_false_prune(spark, day_table):
    """OR is one unparseable conjunct -> no pruning, full correctness."""
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT n FROM t_sqlp_days WHERE "
        "CAST(ts AS DATE) = DATE'2024-01-01' OR n = 5",
        scratch_root(),
    )
    assert sorted(x["n"] for x in r.collect()) == [1, 5]


def test_identity_string_partition_with_escaped_values(spark):
    t = SnapshotTable(spark, "t_sqlp_esc", scratch_root())
    t.drop()
    t.create(
        spark.createDataFrame(
            [("a/b", 1), ("x:y", 2), ("plain", 3)], "k string, n int"
        ),
        partition_by=["k"],
    )
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark, "SELECT n FROM t_sqlp_esc WHERE k = 'a/b'", scratch_root()
    )
    assert [x["n"] for x in r.collect()] == [1]
    a = _audit("t_sqlp_esc")
    assert a and a["subdirs_selected"] == 1 and a["subdirs_pruned"] == 2
    t.drop()


def test_bucket_equality_through_sql(spark):
    t = SnapshotTable(spark, "t_sqlp_bucket", scratch_root())
    t.drop()
    df = spark.createDataFrame([(k, f"v{k}") for k in range(20)], "k int, v string")
    t.create(df, partition_by=["bucket(4, k)"])
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark, "SELECT v FROM t_sqlp_bucket WHERE k = 7", scratch_root()
    )
    assert [x["v"] for x in r.collect()] == ["v7"]
    a = _audit("t_sqlp_bucket")
    assert a and a["subdirs_selected"] == 1 and a["subdirs_pruned"] == 3
    t.drop()


def test_sql_prune_composes_with_mor_deletes(spark, day_table):
    day_table.delete_where_mor(F.col("n") == 3, key="n")
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT n FROM t_sqlp_days WHERE ts >= TIMESTAMP'2024-01-03 00:00:00'",
        scratch_root(),
    )
    assert sorted(x["n"] for x in r.collect()) == [4, 5]
    a = _audit("t_sqlp_days")
    assert a and a["mor_deletes_applied"] == 1 and a["subdirs_selected"] == 3


def test_full_view_restored_after_pruned_statement(spark, day_table):
    execute_sql(
        spark,
        "SELECT n FROM t_sqlp_days WHERE CAST(ts AS DATE) = DATE'2024-01-03'",
        scratch_root(),
    ).collect()
    assert spark.table("t_sqlp_days").count() == 5


def test_no_false_prune_property_battery(spark, day_table):
    """Every statement must return exactly what the full read returns —
    pruning engaged or not. Covers quoted edge cases, non-partition
    predicates, negations, IS NULL, functions of the partition source,
    strict bounds, and empty ranges."""
    full = day_table.read()
    full.createOrReplaceTempView("t_ref_full")
    battery = [
        "WHERE CAST(ts AS DATE) = DATE'2024-01-03'",
        "WHERE CAST(ts AS DATE) >= DATE'2024-01-04'",
        "WHERE ts > TIMESTAMP'2024-01-02 12:00:00'",
        "WHERE ts < TIMESTAMP'2024-01-03 00:00:00'",
        "WHERE ts <= TIMESTAMP'2024-01-03 00:00:00'",
        "WHERE ts = TIMESTAMP'2024-01-03 12:00:00'",
        "WHERE ts >= TIMESTAMP'2024-01-06 00:00:00'",  # empty range
        "WHERE n = 3",
        "WHERE NOT (CAST(ts AS DATE) = DATE'2024-01-03')",
        "WHERE ts IS NULL",
        "WHERE ts IS NOT NULL",
        "WHERE date_format(ts, 'yyyy-MM-dd') = '2024-01-03'",
        "WHERE hour(ts) = 12",
        "WHERE CAST(ts AS DATE) = DATE'2024-01-03' AND n > 0",
        "WHERE CAST(ts AS DATE) BETWEEN DATE'2024-01-02' AND DATE'2024-01-03'",
        "WHERE ts BETWEEN '2024-01-02' AND '2024-01-04'",
        "",
    ]
    for where in battery:
        got = sorted(
            x["n"]
            for x in execute_sql(
                spark, f"SELECT n FROM t_sqlp_days {where}", scratch_root()
            ).collect()
        )
        want = sorted(
            x["n"]
            for x in spark.sql(f"SELECT n FROM t_ref_full {where}").collect()
        )
        assert got == want, f"row mismatch for {where!r}: {got} != {want}"


def test_bounds_parser_edge_cases():
    """Pure-function battery over the conjunct grammar: quoted ' AND '
    inside literals, reversed operands, doubled quotes, cast-wrapped
    literals, numeric suffixes, mixed incomparable types dropped."""
    import datetime

    from empdia_iceberg_spark.tables.sqlprune import (
        bounds_from_condition,
        conjuncts,
    )

    assert conjuncts("((a = 'x AND y') AND (b > 2))") == [
        "a = 'x AND y'",
        "b > 2",
    ]
    b = bounds_from_condition("(k = 'it''s')")
    assert b == {"k": ("it's", "it's")}
    # reversed operand order flips the operator
    assert bounds_from_condition("(5 <= k)") == {"k": (5, None)}
    # strict int bounds tighten to inclusive
    assert bounds_from_condition("(k > 5) AND (k < 10)") == {"k": (6, 9)}
    # timestamp strictness tightens by 1 microsecond
    lo, hi = bounds_from_condition(
        "(ts > TIMESTAMP '2024-01-03 00:00:00')"
    )["ts"]
    assert lo == datetime.datetime(2024, 1, 3, 0, 0, 0, 1) and hi is None
    # cast-wrapped literals (analyzed-plan shapes) and suffixes
    assert bounds_from_condition("(k = CAST(1500 AS BIGINT))") == {
        "k": (1500, 1500)
    }
    assert bounds_from_condition("(k >= 100L)") == {"k": (100, None)}
    assert bounds_from_condition(
        "(d = CAST('2024-01-03' AS DATE))"
    ) == {"d": (datetime.date(2024, 1, 3),) * 2}
    # float literals only with allow_float
    assert bounds_from_condition("(v < 1.5)") == {}
    assert bounds_from_condition("(v < 1.5)", allow_float=True) == {
        "v": (None, 1.5)
    }
    # incomparable mixed types for one column -> dropped, OR -> ignored
    assert bounds_from_condition("(k > 5) AND (k < 'z')") == {}
    assert bounds_from_condition("((k = 1) OR (k = 2))") == {}
    # contradictory bounds survive as an empty range (prunes everything)
    assert bounds_from_condition("(k > 10) AND (k < 5)") == {"k": (11, 4)}
    # IN-lists bound to [min, max]; cast-wrapped columns normalize
    assert bounds_from_condition("(k IN (7, 2, 5))") == {"k": (2, 7)}
    assert bounds_from_condition("(s IN ('b', 'a'))") == {"s": ("a", "b")}
    assert bounds_from_condition(
        "(CAST(k AS BIGINT) IN (CAST(1 AS BIGINT), CAST(3 AS BIGINT)))"
    ) == {"k": (1, 3)}
    assert bounds_from_condition("(CAST(k AS BIGINT) >= 5)") == {
        "k": (5, None)
    }
    # a literal cast's inner is not identifier-shaped: left alone
    assert bounds_from_condition("(k = CAST(42 AS BIGINT))") == {
        "k": (42, 42)
    }
    # IN with an unparseable member: whole conjunct ignored
    assert bounds_from_condition("(k IN (1, other_col))") == {}


def test_file_stats_refine_nonpartition_predicate(spark):
    """Within the transform-selected subdirs, footer-stat sidecars
    skip files whose ranges miss NON-partition bounds — SQL pruning
    reaches columns the partition transforms can't see."""
    t = SnapshotTable(spark, "t_sqlp_stats", scratch_root())
    t.drop()
    rows = [
        (f"2024-01-{d:02d} 12:00:00", n)
        for d in (1, 2, 3)
        for n in range(d * 100, d * 100 + 10)
    ]
    df = spark.createDataFrame(rows, "raw string, n int").select(
        F.col("raw").cast("timestamp").alias("ts"), "n"
    )
    # one dir, three day-subdirs; n ranges are disjoint per day, so a
    # bound on n can prove two of the three subdirs' files irrelevant
    t.create(df.coalesce(1), partition_by=["days(ts)"])
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT n FROM t_sqlp_stats WHERE ts >= TIMESTAMP'2024-01-01 00:00:00' "
        "AND n BETWEEN 200 AND 205",
        scratch_root(),
    )
    assert sorted(x["n"] for x in r.collect()) == list(range(200, 206))
    a = sqlprune.LAST_SQL_PRUNE_AUDITS.get("t_sqlp_stats")
    assert a and a["files_skipped_by_stats"] >= 2, a
    t.drop()


def test_stats_only_prune_on_unpartitioned_table(spark):
    """An UNPARTITIONED table still file-prunes through plain SQL when
    footer stats prove files irrelevant (three appends with disjoint
    key ranges; the statement's bound hits one)."""
    t = SnapshotTable(spark, "t_sqlp_flat", scratch_root())
    t.drop()
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    t.create(mk(0, 100))
    t.append(mk(100, 200))
    t.append(mk(200, 300))
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    r = execute_sql(
        spark,
        "SELECT count(*) AS c, sum(k) AS s FROM t_sqlp_flat "
        "WHERE k BETWEEN 120 AND 130",
        scratch_root(),
    ).collect()[0]
    assert (r["c"], r["s"]) == (11, sum(range(120, 131)))
    a = sqlprune.LAST_SQL_PRUNE_AUDITS.get("t_sqlp_flat")
    assert a and a["files_skipped_by_stats"] == 2, a
    t.drop()


def test_insert_source_select_prunes(spark, day_table):
    """INSERT INTO t2 SELECT ... FROM t WHERE <day predicate> — the
    backfill shape — prunes the SOURCE read and lands exactly the
    oracle rows."""
    execute_sql(spark, "DROP TABLE IF EXISTS t_sqlp_bf", scratch_root())
    execute_sql(
        spark,
        "CREATE TABLE t_sqlp_bf AS SELECT * FROM t_sqlp_days WHERE 1 = 0",
        scratch_root(),
    )
    sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
    execute_sql(
        spark,
        "INSERT INTO t_sqlp_bf SELECT * FROM t_sqlp_days "
        "WHERE CAST(ts AS DATE) BETWEEN DATE'2024-01-02' AND DATE'2024-01-03'",
        scratch_root(),
    )
    got = sorted(
        r["n"]
        for r in execute_sql(
            spark, "SELECT n FROM t_sqlp_bf", scratch_root()
        ).collect()
    )
    assert got == [2, 3]
    a = sqlprune.LAST_SQL_PRUNE_AUDITS.get("t_sqlp_days")
    assert a and a["subdirs_selected"] == 2 and a["subdirs_pruned"] == 3
    execute_sql(spark, "DROP TABLE IF EXISTS t_sqlp_bf", scratch_root())


def test_prune_through_persisted_view_stays_correct(spark, day_table):
    """A statement over a persisted VIEW of a partitioned table: the
    view's frame is already bound, so pruning may or may not engage —
    the result must equal the full evaluation either way."""
    execute_sql(spark, "DROP VIEW IF EXISTS v_sqlp_days", scratch_root())
    execute_sql(
        spark,
        "CREATE VIEW v_sqlp_days AS SELECT ts, n FROM t_sqlp_days",
        scratch_root(),
    )
    r = execute_sql(
        spark,
        "SELECT n FROM v_sqlp_days WHERE CAST(ts AS DATE) = DATE'2024-01-03'",
        scratch_root(),
    )
    assert [x["n"] for x in r.collect()] == [3]
    execute_sql(spark, "DROP VIEW IF EXISTS v_sqlp_days", scratch_root())


def test_view_cache_serves_fresh_state_after_commits(spark):
    """The version-keyed frame cache must never serve stale state:
    write → SQL read → write → SQL read sees every commit, and a
    DROP+recreate at the same version number is caught by the
    meta-file identity key."""
    t = SnapshotTable(spark, "t_sqlp_fresh", scratch_root())
    t.drop()
    t.create(spark.createDataFrame([(1,)], "k int"))
    c1 = execute_sql(
        spark, "SELECT count(*) c FROM t_sqlp_fresh", scratch_root()
    ).collect()[0]["c"]
    t.append(spark.createDataFrame([(2,)], "k int"))
    c2 = execute_sql(
        spark, "SELECT count(*) c FROM t_sqlp_fresh", scratch_root()
    ).collect()[0]["c"]
    assert (c1, c2) == (1, 2)
    t.drop()
    t2 = SnapshotTable(spark, "t_sqlp_fresh", scratch_root())
    t2.create(spark.createDataFrame([(9,), (8,), (7,)], "k int"))
    c3 = execute_sql(
        spark, "SELECT count(*) c FROM t_sqlp_fresh", scratch_root()
    ).collect()[0]["c"]
    assert c3 == 3, "DROP+recreate at v1 served a stale cached frame"
    t2.drop()


def test_tz_mismatch_degrades_to_full_scan(spark, day_table):
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sqlprune.LAST_SQL_PRUNE_AUDITS.clear()
        r = execute_sql(
            spark,
            "SELECT n FROM t_sqlp_days WHERE "
            "ts >= TIMESTAMP'2024-01-03 00:00:00'",
            scratch_root(),
        )
        # NY rendering of these UTC-written instants shifts the day
        # boundary; the only safe read is a full scan — and the rows
        # must equal the full-view evaluation under the SAME session tz
        want = sorted(
            x["n"]
            for x in day_table.read()
            .filter(F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp"))
            .collect()
        )
        assert sorted(x["n"] for x in r.collect()) == want
        a = sqlprune.LAST_SQL_PRUNE_AUDITS.get("t_sqlp_days")
        assert a is None or a["subdirs_selected"] == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
