"""Shared fixtures: one session-scoped SparkSession + a DuckDB oracle
connection with the driver's table views pre-registered, plus the
parity checker that mimics the driver's correctness gate (row count,
column-name set, order-insensitive values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from empdia_iceberg_spark.session import get_spark
from empdia_iceberg_spark.sources.tables import TABLES, path_for

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    s = get_spark(app_name="empdia-tests")
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path_for(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # collapse ulp-level float noise the same way a value-hash with
        # rounded queries would: queries round explicitly; this is a belt.
        return round(value, 9)
    return value


def rows_key(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(canon, key=repr)


def _dtype_class(kind: str) -> str:
    """Collapse a numpy dtype kind into the classes the driver's
    pandas-based value hash distinguishes."""
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    return "other"


def assert_dtype_parity(spark_df, con, sql, name=""):
    """Mirror the driver's pandas materialization: an oracle column that
    pandas-converts to float64 while Spark emits int64 (e.g. DuckDB's
    HUGEINT window sums) splits the driver hash even when every value is
    bit-identical — fetchall()-based comparison can't see it because
    Python's 200 == 200.0. Fetch BOTH sides through pandas and fail on
    any int-vs-float column-kind drift."""
    spdf = spark_df.toPandas()
    spark_kinds = {c: spdf[c].dtype.kind for c in spdf.columns}
    odf = con.execute(sql).fetchdf()
    for col, skind in spark_kinds.items():
        if col not in odf.columns:
            continue  # column-set mismatch is assert_parity's job
        sc, oc = _dtype_class(skind), _dtype_class(odf[col].dtype.kind)
        if {sc, oc} == {"int", "float"}:
            raise AssertionError(
                f"{name}: dtype drift on column {col!r}: spark pandas kind "
                f"{skind!r} vs oracle pandas kind {odf[col].dtype.kind!r} — "
                "this splits the driver's dtype-sensitive value hash even "
                "when values match (CAST the oracle column explicitly)"
            )


def assert_parity(spark_df, con, sql, name=""):
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = con.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    assert_dtype_parity(spark_df, con, sql, name=name)

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    sk = rows_key(spark_rows, spark_cols)
    ok = rows_key(oracle_rows, oracle_cols)
    mismatches = [(a, b) for a, b in zip(sk, ok) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
