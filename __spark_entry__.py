"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``empdia_iceberg_spark`` package; importing
it populates the registry (one entry per SURVEY.md §2 operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import empdia_iceberg_spark  # noqa: F401  (populates the registry)
from empdia_iceberg_spark import registry

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing aggregate: scan → pushed filter → groupBy →
    7 aggregates → sort (SURVEY.md §7 slice 0).
    """
    return registry.queries()["q1_pricing_agg"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return registry.oracles()
