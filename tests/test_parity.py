"""Differential parity: every registered query with an oracle is run on
Spark and DuckDB at SF_DIR and compared the way the driver compares
(row count + column names + order-insensitive values). Rows-only
queries are smoke-run (must return a DataFrame with a stable schema).
"""

from __future__ import annotations

import pytest

import empdia_iceberg_spark  # noqa: F401
from empdia_iceberg_spark import registry
from tests.conftest import SF_DIR, assert_parity

_SPECS = registry.specs()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_parity(name, spark, oracle):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        rows = df.limit(5).collect()
        assert df.columns, f"{name}: empty schema"
        assert rows is not None
    else:
        assert_parity(df, oracle, spec.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(e.oracle_sql()) <= set(e.queries())
