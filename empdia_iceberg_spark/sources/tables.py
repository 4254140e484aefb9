"""Table loaders for the driver-generated parquet star schema.

All scans go through ``load`` so predicate pushdown / column pruning are
preserved (plain ``spark.read.parquet`` — Catalyst handles pruning).
``SMALL_DIMS`` marks tables that stay broadcast-size at any scale factor
(region/nation are fixed-cardinality in TPC-H) — join helpers broadcast
them explicitly so the plan never shuffles the fact side on their
account.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed-cardinality dimensions: always broadcastable, even at 100 TB.
SMALL_DIMS = frozenset({"region", "nation"})


def path_for(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(path_for(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to a session-zone TIMESTAMP regardless of how
    the driver generated the parquet. Two physical encodings have been
    observed across testdata generations: TIMESTAMP(NANOS) (illegal for
    Spark's native reader — read as raw int64 via the legacy conf and
    convert) and timestamp[us] without a timezone (Spark 4 infers
    TIMESTAMP_NTZ — cast to TIMESTAMP; the session zone is pinned to UTC
    so the wall-clock values are identical to DuckDB's naive reading).
    Downstream operators rely on LTZ-only expressions (`unix_micros`,
    `window`, watermarks), so this chokepoint is the one place that
    guarantees the type."""
    from pyspark.sql import functions as F

    # Deliberately SESSION-scoped, not save-and-restore: the conf is
    # consulted when the scan EXECUTES, and the returned DataFrame is
    # lazy — restoring immediately would break every deferred read.
    # Engine contract: in any session this engine touches, nanos
    # parquet columns read as raw int64 and must pass through
    # normalize_event_ts (the one dispatch below), exactly as events
    # does. A foreign nanos table read around this engine would see
    # the same convention, not a decode error.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(path_for(sf_dir, "events")))


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Shared ts-dtype dispatch for BOTH the batch loader above and the
    streaming reader (streaming/windows._events_stream): one place to
    extend if a new physical ts encoding appears in future testdata
    generations — a divergence here would silently feed wrong event
    times to every watermark/window query on one of the two paths."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        # integer division: epoch-nanos overflow double's 53-bit mantissa,
        # so float division rounds some timestamps by ±1 µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def local_df(spark: SparkSession, data, schema) -> DataFrame:
    """Single-partition DataFrame from driver-local fixture/result rows.

    `createDataFrame(list, ...)` fans tiny data across
    defaultParallelism pickled partitions (32 Python-worker round-trips
    per downstream stage), and `.coalesce(1)` on that is WORSE — the one
    merged task computes all parent partitions sequentially, each with
    its own worker round-trip (~5 s flat, measured). Parallelizing to
    ONE slice up front keeps the whole fixture in a single partition and
    a single worker round-trip."""
    return spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
