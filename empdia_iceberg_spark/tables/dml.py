"""Declarative SQL DML over the snapshot tables: `UPDATE ... SET ...
WHERE ...` and `DELETE FROM ... WHERE ...` statements, routed to the
manager's pruned copy-on-write engine (`SnapshotTable.update_where` /
`delete_where_pruned`) or, on request, the merge-on-read delete path.

Stock Spark SQL cannot parse UPDATE/DELETE against plain parquet (those
statements exist only for v2 catalogs like the real Iceberg runtime,
absent in this environment — SURVEY §7 slice 5). The front-end here
keeps the USER surface declarative while staying Spark-first where it
counts: the statement's WHERE clause and every assignment RHS are
handed verbatim to ``F.expr`` — i.e. parsed, analyzed and optimized by
Catalyst with the full Spark SQL expression language (functions, CASE,
subquery-free scalar logic) — so the only thing the regex layer does is
split the statement's clause skeleton, never interpret expressions.

Scale posture (inherited from `_cow_rewrite`): an UPDATE/DELETE touching
0.1% of a 100 TB table rewrites only the files that contain a matching
row — one column-pruned predicate-pushed scan finds them via
``input_file_name()`` — and carries every other file into the new
snapshot by reference, under the same optimistic-concurrency commit as
MERGE. ``mor_key`` routes DELETE to the O(deleted-keys) merge-on-read
equality-delete path instead (Iceberg v2 semantics).

Reference parity note: the reference repo has no table management
(SURVEY §0); this rounds out the Iceberg-story surface the driver's
north star asks for, cited against the public Iceberg spec's
copy-on-write vs merge-on-read row-level-operation modes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import exact_sum2, sql_sum2
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load
from empdia_iceberg_spark.tables.manager import DEFAULT_ROOT, SnapshotTable

_UPDATE_HEAD = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
_DELETE_HEAD = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+)\s*(.*?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0 only — `SET a = f(x, y),
    b = 'v,w'` must yield two assignments, not four. Backslash escapes
    inside quotes are honored (Spark SQL string syntax): a comma after
    `'it\\'s x, y'` must NOT split inside the literal."""
    parts, buf, depth, quote = [], [], 0, None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                buf.append(ch)
                buf.append(s[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _split_where(s: str) -> tuple[str, str | None]:
    """Split ``s`` at the first TOP-LEVEL ``WHERE`` keyword — outside
    quotes and parens, on word boundaries — returning (before, after)
    or (s, None). A quote-blind regex split broke valid statements
    whose string literals contain the word 'where'."""
    depth, quote = 0, None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i : i + 5].upper() == "WHERE"
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + 5 >= n or not (s[i + 5].isalnum() or s[i + 5] == "_"))
        ):
            return s[:i].strip(), s[i + 5 :].strip() or None
        i += 1
    return s.strip(), None


def _parse_assignments(set_clause: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in _split_top_level(set_clause):
        m = re.match(r"^\s*(\w+)\s*=\s*(.+)$", item, re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse SET assignment: {item!r}")
        col, rhs = m.group(1), m.group(2).strip()
        if col in out:
            raise ValueError(f"column {col!r} assigned twice in SET clause")
        out[col] = rhs
    if not out:
        raise ValueError("UPDATE statement has an empty SET clause")
    return out


def execute_dml(
    spark: SparkSession,
    statement: str,
    root: str = DEFAULT_ROOT,
    mor_key: str | None = None,
) -> dict:
    """Execute one UPDATE or DELETE statement against a snapshot table.

    Returns {"op", "table", "version", "audit"}; ``audit`` carries the
    pruning decision (dirs_rewritten / dirs_reused) for COW paths and
    is None for a merge-on-read delete (which rewrites nothing).
    A statement whose WHERE matches no row leaves the table at its
    current version (audit shows dirs_rewritten=0)."""
    m = _UPDATE_HEAD.match(statement)
    if m:
        name, rest = m.group(1), m.group(2)
        set_clause, where = _split_where(rest)
        if not set_clause:
            raise ValueError("UPDATE statement has an empty SET clause")
        if mor_key is not None:
            raise ValueError("mor_key applies to DELETE only (Iceberg v2 "
                             "equality deletes); UPDATE is copy-on-write")
        t = SnapshotTable(spark, name, root)
        cond = F.expr(where) if where else F.lit(True)
        assignments = {
            c: F.expr(rhs) for c, rhs in _parse_assignments(set_clause).items()
        }
        version, audit = t.update_where(cond, assignments)
        return {"op": "update", "table": name, "version": version, "audit": audit}
    m = _DELETE_HEAD.match(statement)
    if m:
        name, rest = m.group(1), m.group(2)
        before, where = _split_where(rest)
        if before:
            raise ValueError(
                f"unexpected tokens after DELETE FROM {name}: {before[:40]!r}"
            )
        t = SnapshotTable(spark, name, root)
        cond = F.expr(where) if where else F.lit(True)
        if mor_key is not None:
            version = t.delete_where_mor(cond, key=mor_key)
            return {"op": "delete-mor", "table": name, "version": version,
                    "audit": None}
        version, audit = t.delete_where_pruned(cond)
        return {"op": "delete", "table": name, "version": version, "audit": audit}
    raise ValueError(
        f"unsupported DML statement (expected UPDATE ... SET ... [WHERE ...] "
        f"or DELETE FROM ... [WHERE ...]): {statement[:80]!r}"
    )


def _three_dir_customer(spark: SparkSession, sf_dir: str, name: str):
    """Scratch table landed as three data dirs covering disjoint
    c_custkey thirds — the layout that makes the DML queries' pruning
    decision observable (predicates confined to the top third must
    rewrite exactly 1 dir and carry 2 by reference)."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    k_max = cust.agg(F.max("c_custkey")).first()[0]  # 1 metadata scalar
    b1, b2 = k_max // 3, (2 * k_max) // 3
    t = SnapshotTable(spark, name)
    t.drop()
    t.create(cust.filter(F.col("c_custkey") <= b1))
    t.append(cust.filter((F.col("c_custkey") > b1) & (F.col("c_custkey") <= b2)))
    t.append(cust.filter(F.col("c_custkey") > b2))
    return t, b2


def _segment_rollup(t: SnapshotTable, audit: dict) -> DataFrame:
    return (
        t.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(exact_sum2("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .withColumn("dirs_rewritten", F.lit(int(audit["dirs_rewritten"])).cast("int"))
        .withColumn("dirs_reused", F.lit(int(audit["dirs_reused"])).cast("int"))
        .orderBy("c_mktsegment")
    )


@register(
    "table_update_dml",
    oracle=f"""
    WITH bounds AS (SELECT (2 * max(c_custkey)) // 3 AS b2 FROM customer),
    updated AS (
        SELECT c_custkey,
               CASE WHEN c_custkey > b2 AND c_mktsegment = 'BUILDING'
                    THEN c_mktsegment || '_U' ELSE c_mktsegment END AS c_mktsegment,
               CASE WHEN c_custkey > b2 AND c_mktsegment = 'BUILDING'
                    THEN CAST(c_acctbal AS DOUBLE) + 100.0
                    ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal
        FROM customer, bounds
    )
    SELECT c_mktsegment, count(*) AS n_rows,
           round({sql_sum2('c_acctbal')}, 2) AS sum_acctbal,
           CAST(1 AS INT) AS dirs_rewritten,
           CAST(2 AS INT) AS dirs_reused
    FROM updated
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Declarative SQL `UPDATE ... SET ... WHERE ...` over a snapshot "
    "table (execute_dml -> pruned copy-on-write update_where). The "
    "statement's WHERE and both assignment RHSs are Catalyst-parsed "
    "(F.expr); assignments apply SIMULTANEOUSLY against pre-update "
    "values (standard SQL UPDATE). The table lands as three key-range "
    "dirs and the predicate is confined to the top third, so the "
    "emitted audit columns (dirs_rewritten=1, dirs_reused=2) hash-check "
    "the PRUNING DECISION itself against the oracle's literals.",
)
def table_update_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, b2 = _three_dir_customer(spark, sf_dir, "customer_dml_upd")
    res = execute_dml(
        spark,
        f"UPDATE customer_dml_upd SET c_acctbal = c_acctbal + 100.0, "
        f"c_mktsegment = concat(c_mktsegment, '_U') "
        f"WHERE c_custkey > {b2} AND c_mktsegment = 'BUILDING'",
    )
    return _segment_rollup(t, res["audit"])


@register(
    "table_delete_dml",
    oracle=f"""
    WITH bounds AS (SELECT (2 * max(c_custkey)) // 3 AS b2 FROM customer),
    kept AS (
        SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer, bounds
        WHERE NOT (c_custkey > b2 AND CAST(c_acctbal AS DOUBLE) < 0.0)
    )
    SELECT c_mktsegment, count(*) AS n_rows,
           round({sql_sum2('c_acctbal')}, 2) AS sum_acctbal,
           CAST(1 AS INT) AS dirs_rewritten,
           CAST(2 AS INT) AS dirs_reused
    FROM kept
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Declarative SQL `DELETE FROM ... WHERE ...` over a snapshot "
    "table (execute_dml -> pruned copy-on-write delete_where_pruned): "
    "files with no matching row carry by reference, matching files are "
    "rewritten without the matching rows. Same three-dir layout and "
    "audit-column proof as table_update_dml (dirs_rewritten=1, "
    "dirs_reused=2). The merge-on-read alternative (mor_key=...) is "
    "exercised in tests/test_tables.py.",
)
def table_delete_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, b2 = _three_dir_customer(spark, sf_dir, "customer_dml_del")
    res = execute_dml(
        spark,
        f"DELETE FROM customer_dml_del "
        f"WHERE c_custkey > {b2} AND c_acctbal < 0.0",
    )
    return _segment_rollup(t, res["audit"])
