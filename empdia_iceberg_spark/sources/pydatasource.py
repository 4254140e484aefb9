"""Custom connector via the Spark 4 Python Data Source API
(pyspark.sql.datasource) — the engine's extensibility surface for
sources Spark has no built-in reader for (feeds, internal formats,
synthetic generators).

The demo source generates a deterministic synthetic ledger as a pure
function of the row id, with REAL partition planning: `partitions()`
returns one InputPartition per row-range, each executor materializes
only its range (`read(partition)`), so the source scales out exactly
like a parquet scan — no driver materialization, no single-partition
read. Because every field is a closed-form function of the id, the
whole read is value-oracled: DuckDB reproduces the generator with
generate_series arithmetic and the rollup hash-matches.

Spark-first notes: the Python Data Source API ships rows from Python
workers via Arrow batches (same path as mapInPandas); schema is
declared up front so Catalyst prunes and plans normally. This is the
public, documented API (SPARK-44076, Spark 4.0) — not an internal
hook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from empdia_iceberg_spark.registry import register

SYNTH_ROWS = 100_000
SYNTH_PARTS = 16


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticLedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", SYNTH_ROWS))
        self.n_parts = int(options.get("n_partitions", SYNTH_PARTS))

    def partitions(self):
        chunk = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + chunk, self.n_rows))
            for lo in range(0, self.n_rows, chunk)
        ]

    def read(self, partition: _RangePartition):
        # executed ON THE EXECUTOR for its range only — a pure function
        # of the row id, so re-runs and retries are identical
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % 97,
                (i * 37 % 10000) / 100.0,
                i % 30,
            )


class SyntheticLedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "empdia_synth"

    def schema(self) -> str:
        return "id bigint, account bigint, amount double, day int"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticLedgerReader(self.options)


@register(
    "pyds_synthetic_rollup",
    oracle=f"""
    WITH gen AS (
        SELECT i AS id,
               i % 97 AS account,
               (i * 37 % 10000) / 100.0 AS amount,
               CAST(i % 30 AS INT) AS day
        FROM (SELECT unnest(generate_series(0, {SYNTH_ROWS - 1})) AS i)
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT account) AS BIGINT) AS n_accounts,
           CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM gen
    GROUP BY day
    ORDER BY day
    """,
    doc="Custom connector through the public Spark 4 Python Data Source "
    "API: a deterministic synthetic ledger with real partition "
    "planning (one InputPartition per row range, materialized on the "
    "executors via Arrow), aggregated per day with exact decimal "
    "sums. The generator is a closed-form function of the row id, so "
    "DuckDB reproduces it with generate_series arithmetic and the "
    "rollup is fully hash-checked — connector correctness proven "
    "end-to-end, not smoke-tested.",
)
def pyds_synthetic_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # registration is idempotent per session; re-register defensively
    # (cheap) so the query is self-contained for the driver harness
    spark.dataSource.register(SyntheticLedgerDataSource)
    df = (
        spark.read.format("empdia_synth")
        .option("n_rows", SYNTH_ROWS)
        .option("n_partitions", SYNTH_PARTS)
        .load()
    )
    return (
        df.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("account").cast("bigint").alias("n_accounts"),
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .orderBy("day")
    )
