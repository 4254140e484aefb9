"""Regression tests for the round-2 ADVICE findings: edge inputs the
driver fixtures don't currently contain (empty / whitespace-padded
documents, duplicate as-of timestamps, degenerate order columns) run
against a synthetic sf-dir so Spark-vs-DuckDB parity is checked on the
exact rows that used to diverge."""

from __future__ import annotations

import os

import duckdb
import pytest

import empdia_iceberg_spark  # noqa: F401  (registry side effects)
from empdia_iceberg_spark import registry
from tests.conftest import SF_DIR, assert_parity

_SPECS = registry.specs()


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    """A miniature sf-dir: real rows plus the adversarial ones."""
    d = str(tmp_path_factory.mktemp("edge_sf"))
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            (SELECT * FROM read_parquet('{SF_DIR}/documents.parquet') LIMIT 8)
            UNION ALL
            SELECT 900001, '', 'en', 'edge', 0
            UNION ALL
            SELECT 900002, '   padded   with   whitespace   ', 'en', 'edge', 33
            UNION ALL
            SELECT 900003, '  ', 'en', 'edge', 2
        ) TO '{os.path.join(d, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            (SELECT * FROM read_parquet('{SF_DIR}/events.parquet') LIMIT 200)
            UNION ALL
            -- two errors sharing (user_id, ts): the as-of tie
            SELECT 910001, TIMESTAMP '2024-01-05 10:00:00', 42, 'error', 1.25, '{{}}'
            UNION ALL
            SELECT 910002, TIMESTAMP '2024-01-05 10:00:00', 42, 'error', 2.50, '{{}}'
            UNION ALL
            -- a click at the same instant (<= semantics) and one after
            SELECT 910003, TIMESTAMP '2024-01-05 10:00:00', 42, 'click', 0.75, '{{}}'
            UNION ALL
            SELECT 910004, TIMESTAMP '2024-01-05 11:00:00', 42, 'click', 0.10, '{{}}'
        ) TO '{os.path.join(d, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


@pytest.fixture(scope="module")
def edge_oracle(edge_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{os.path.join(edge_sf_dir, name + '.parquet')}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    ["doc_chunking", "udtf_word_windows", "asof_join_last_error"],
)
def test_edge_parity(name, spark, edge_sf_dir, edge_oracle):
    spec = _SPECS[name]
    df = spec.fn(spark, edge_sf_dir)
    assert_parity(df, edge_oracle, spec.oracle, name=name)


def test_chunking_empty_text_yields_no_rows(spark, edge_sf_dir):
    df = _SPECS["doc_chunking"].fn(spark, edge_sf_dir)
    assert df.filter("doc_id = 900001").count() == 0
    assert df.filter("chunk_idx < 0").count() == 0


def test_asof_tie_resolves_to_max_event_id(spark, edge_sf_dir):
    df = _SPECS["asof_join_last_error"].fn(spark, edge_sf_dir)
    rows = {r["event_id"]: r for r in df.filter("user_id = 42").collect()}
    assert rows[910003]["asof_event_id"] == 910002  # tie at equal ts → max id
    assert rows[910004]["asof_event_id"] == 910002


def test_bucketed_row_number_constant_order_col(spark):
    """Degenerate order column: numbering must stay correct AND not
    collapse into one bucket when a numeric tiebreak is available."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    df = spark.range(5000).select(
        F.lit(1).alias("const"), F.col("id").alias("tb")
    )
    out, n = bucketed_global_row_number(df, "const", tiebreaks=("tb",), buckets=16)
    assert n == 5000
    rows = out.orderBy("tb").select("_rn").collect()
    assert [r["_rn"] for r in rows] == list(range(1, 5001))


def test_bucketed_row_number_no_tiebreak_warns(spark):
    import warnings as w

    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    df = spark.range(100).select(
        F.lit(1).alias("const"), F.col("id").cast("string").alias("s")
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out, n = bucketed_global_row_number(df, "const", tiebreaks=("s",), buckets=16)
        out.collect()
    assert any("single-partition" in str(c.message) for c in caught)
    assert n == 100


def test_bucketed_row_number_constant_no_tiebreak_stays_bucketed(spark):
    """VERDICT r6 #5: with NO declared tiebreaks a constant order
    column must synthesize a deterministic hash tiebreak — numbering
    stays bucketed (multiple _bkt values), emits no degradation
    warning, and is a valid reproducible permutation."""
    import warnings as w

    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    df = spark.range(5000).select(F.lit(1).alias("const"), F.col("id"))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out, n = bucketed_global_row_number(df, "const", buckets=16)
        rns = sorted(r["_rn"] for r in out.collect())
    assert not any("single-partition" in str(c.message) for c in caught)
    assert n == 5000
    assert rns == list(range(1, 5001))  # exact permutation
    assert "_syn_tb" not in out.columns
    # determinism: same input → same numbering
    out2, _ = bucketed_global_row_number(df, "const", buckets=16)
    m1 = {r["id"]: r["_rn"] for r in out.collect()}
    m2 = {r["id"]: r["_rn"] for r in out2.collect()}
    assert m1 == m2


@pytest.fixture(scope="module")
def hour_sparse_sf_dir(tmp_path_factory):
    """Users active in DISJOINT single hours: the oracle's sparse
    shared-hour equi-join emits no pair at all for them, while a naive
    dense zero-filled profile join would emit cos=0 rows — pair
    MEMBERSHIP, not just values, must match."""
    d = str(tmp_path_factory.mktemp("hour_sparse_sf"))
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            -- u1: hour 1 only; u2: hour 2 only (disjoint from u1);
            -- u3: hours 1 and 2 (shares one hour with each)
            SELECT 1::BIGINT AS event_id, TIMESTAMP '2024-01-05 01:00:00' AS ts,
                   1::BIGINT AS user_id, 'click' AS event_type, 10.0 AS value, '{{}}' AS props
            UNION ALL SELECT 2, TIMESTAMP '2024-01-06 01:30:00', 1, 'click', 30.0, '{{}}'
            UNION ALL SELECT 3, TIMESTAMP '2024-01-05 02:00:00', 2, 'click', 5.0, '{{}}'
            UNION ALL SELECT 4, TIMESTAMP '2024-01-05 01:15:00', 3, 'click', 7.0, '{{}}'
            UNION ALL SELECT 5, TIMESTAMP '2024-01-05 02:45:00', 3, 'click', 2.0, '{{}}'
        ) TO '{os.path.join(d, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


def test_profile_similarity_hour_disjoint_pairs(spark, hour_sparse_sf_dir):
    spec = _SPECS["user_profile_similarity"]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(hour_sparse_sf_dir, 'events.parquet')}')"
    )
    df = spec.fn(spark, hour_sparse_sf_dir)
    rows = {(r.user_id, r.peer_id) for r in df.collect()}
    # u1-u2 share no hour: the pair must be ABSENT in both engines
    assert (1, 2) not in rows and (2, 1) not in rows
    assert (1, 3) in rows and (3, 2) in rows
    assert_parity(df, con, spec.oracle, name="user_profile_similarity[sparse]")
    con.close()


def test_bucketed_row_number_map_column_and_name_collision(spark):
    """The synthesized xxhash64 tiebreak must (a) skip MapType columns
    (xxhash64 rejects them — maps have no canonical element order)
    instead of raising AnalysisException, and (b) never clobber a
    pre-existing user column named _syn_tb."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    df = spark.range(2000).select(
        F.lit(1).alias("const"),
        F.col("id"),
        F.create_map(F.lit("k"), F.col("id")).alias("props"),  # map col
        (F.col("id") * 10).alias("_syn_tb"),  # collision bait
    )
    out, n = bucketed_global_row_number(df, "const", buckets=16)
    assert n == 2000
    rows = out.collect()
    assert sorted(r["_rn"] for r in rows) == list(range(1, 2001))
    # the user column survives untouched
    assert all(r["_syn_tb"] == r["id"] * 10 for r in rows)
    assert all(r["props"] == {"k": r["id"]} for r in rows)
