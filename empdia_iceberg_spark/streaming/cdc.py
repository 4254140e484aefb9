"""Streaming CDC apply: a change-data-capture feed (I/U/D row events
with per-key sequence numbers — the Debezium/CDF shape) streams through
``foreachBatch`` into a managed snapshot table via the declarative
`MERGE INTO` engine, using the canonical three-clause apply:

    WHEN MATCHED AND s.op = 'D' THEN DELETE
    WHEN MATCHED              THEN UPDATE SET ...
    WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ...

This is the integration point the rest of the engine builds toward:
Structured Streaming (incremental delivery + checkpointing) × the SQL
MERGE surface (multi-clause first-match-wins, qualifiers) × snapshot
tables (pruned copy-on-write commits, time travel over the applied
states). The final table state is BATCH-BOUNDARY-INDEPENDENT: each
micro-batch first collapses to its newest event per key (max seq —
without this, MERGE would correctly reject the duplicate source keys),
and applying collapsed prefixes in order is associative, so however the
stream chops the feed the table converges to last-writer-wins over the
whole log — which is exactly what the DuckDB oracle computes with one
``max_by`` aggregate.

At-least-once note: foreachBatch may re-deliver the LAST batch after a
crash-before-checkpoint. Re-applying a collapsed CDC batch that carries
FULL rows is idempotent by construction (U rewrites the same values, D
on an absent key deletes nothing, I on a present key matches and
rewrites the same values), so no transaction stamp is needed — unlike
the additive sink (`windows.additive_upsert`), which must de-duplicate
because increments are not idempotent.

Scale posture: each micro-batch costs one pruned MERGE — the key
envelope check rewrites only the dirs the batch's keys actually touch,
so a trickle feed into a 100 TB table never rewrites cold files; the
per-batch collapse is one window over the batch (batch-sized, not
table-sized).

Reference parity: the reference repo has no streaming (SURVEY §0); this
extends the engine's Iceberg/CDC story, cited against the public Delta
change-data-feed MERGE idiom and the Structured Streaming guide's
foreachBatch upsert pattern.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import exact_sum2, sql_sum2
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load
from empdia_iceberg_spark.streaming.windows import work_root
from empdia_iceberg_spark.tables.dml import execute_dml
from empdia_iceberg_spark.tables.manager import scratch_root
from empdia_iceberg_spark.tables.manager import SnapshotTable

# The deterministic CDC log derived from `orders` (key = o_orderkey):
#   seq 1 'I'  k%4 ∈ {0,1,2}   initial inserts
#   seq 2 'U'  k%4 = 1          price +10
#   seq 3 'U'  k%8 = 1          price +20  (same keys as a seq-2 subset,
#                               SAME batch — proves per-batch collapse)
#   seq 4 'D'  k%4 = 2          deletes
#   seq 5 'I'  k%4 = 3          late inserts (not-matched path)
#   seq 6 'U'  k%8 = 2          update of a DELETED key — the canonical
#                               apply upserts it back (not-matched & op≠D)
# staged as three feed files applied in three availableNow phases:
# {1}, {2,3,4}, {5,6}.
_LOG_PARTS = [
    (1, "I", "o_orderkey % 4 IN (0, 1, 2)", "o_totalprice"),
    (2, "U", "o_orderkey % 4 = 1", "o_totalprice + 10.0"),
    (3, "U", "o_orderkey % 8 = 1", "o_totalprice + 20.0"),
    (4, "D", "o_orderkey % 4 = 2", "o_totalprice"),
    (5, "I", "o_orderkey % 4 = 3", "o_totalprice"),
    (6, "U", "o_orderkey % 8 = 2", "o_totalprice + 5.0"),
]
_PHASES = [(1,), (2, 3, 4), (5, 6)]


def _log_frame(orders: DataFrame, seqs: tuple[int, ...]) -> DataFrame:
    parts = []
    for seq, op, cond, price in _LOG_PARTS:
        if seq not in seqs:
            continue
        parts.append(
            orders.filter(F.expr(cond)).select(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.expr(price).cast("double").alias("price"),
                F.lit(seq).cast("int").alias("seq"),
                F.lit(op).alias("op"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _oracle_log_sql() -> str:
    rows = []
    for seq, op, cond, price in _LOG_PARTS:
        rows.append(
            f"SELECT o_orderkey AS k, o_orderstatus AS status, "
            f"CAST({price} AS DOUBLE) AS price, {seq} AS seq, '{op}' AS op "
            f"FROM orders WHERE {cond}"
        )
    return " UNION ALL ".join(rows)


@register(
    "stream_cdc_apply",
    oracle=f"""
    WITH log AS ({_oracle_log_sql()}),
    final AS (
        SELECT k,
               max_by(op, seq)     AS op,
               max_by(status, seq) AS status,
               max_by(price, seq)  AS price
        FROM log GROUP BY k
    )
    SELECT status,
           count(*) AS n_rows,
           round({sql_sum2('price')}, 2) AS sum_price,
           CAST(3 AS INT) AS n_versions
    FROM final
    WHERE op <> 'D'
    GROUP BY status
    ORDER BY status
    """,
    doc="Streaming CDC apply: a 6-sequence I/U/D change log streams in "
    "three availableNow phases through foreachBatch; each micro-batch "
    "collapses to its newest event per key and applies via declarative "
    "MERGE INTO with the canonical three-clause form (qualified DELETE, "
    "UPDATE, qualified INSERT). Exercises same-batch multi-ops per key "
    "(collapse), deletes, late inserts, and the upsert-back of an "
    "update arriving after a delete. Final state is hash-checked "
    "against one last-writer-wins max_by aggregate over the whole log; "
    "n_versions=3 pins that the state was built INCREMENTALLY (one "
    "pruned-MERGE commit per phase), not recomputed.",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    feed = os.path.join(work_root(), f"cdc_feed_{uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(work_root(), f"cdc_ckpt_{uuid.uuid4().hex[:8]}")
    table = SnapshotTable(spark, "orders_cdc_state", scratch_root())
    table.drop()

    def apply_cdc(batch_df: DataFrame, batch_id: int) -> None:
        latest = (
            batch_df.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("k").orderBy(F.col("seq").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if table.current_version() is None:
            table.create(
                latest.filter(F.col("op") != "D").select("k", "status", "price")
            )
            return
        latest.createOrReplaceTempView("cdc_apply_batch")
        execute_dml(
            batch_df.sparkSession,
            """
            MERGE INTO orders_cdc_state t USING cdc_apply_batch s ON t.k = s.k
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET status = s.status, price = s.price
            WHEN NOT MATCHED AND s.op <> 'D' THEN
                INSERT (k, status, price) VALUES (s.k, s.status, s.price)
            """,
            root=scratch_root(),
        )

    first = _log_frame(orders, _PHASES[0])
    first.coalesce(1).write.parquet(feed)
    schema = spark.read.parquet(feed).schema
    stream = spark.readStream.schema(schema).parquet(feed)
    try:
        for i, phase in enumerate(_PHASES):
            if i > 0:
                # atomic single-file staging: one phase = one micro-batch
                from empdia_iceberg_spark.streaming.windows import append_atomically

                append_atomically(_log_frame(orders, phase), feed)
            q = (
                stream.writeStream.queryName("t_cdc_apply")
                .outputMode("append")
                .foreachBatch(apply_cdc)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        for qq in spark.streams.active:
            if qq.name == "t_cdc_apply":
                qq.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(feed, ignore_errors=True)
    n_versions = table.current_version()
    return (
        table.read()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(exact_sum2("price"), 2).alias("sum_price"),
        )
        .withColumn("n_versions", F.lit(int(n_versions)).cast("int"))
        .orderBy("status")
    )


@register(
    "pipeline_medallion",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           round({sql_sum2('o_totalprice + 0.0')}, 2) AS sum_price,
           round({sql_sum2("floor(o_totalprice * 0.1 * 100 + 0.5) / 100")}, 2)
               AS sum_margin
    FROM orders
    WHERE o_totalprice >= 1000.0 AND o_orderstatus IN ('O', 'F')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Medallion pipeline (bronze → silver), the composed user story: "
    "raw appends land in a BRONZE snapshot table in two phases; a "
    "downstream job TAILS bronze as a stream (snapshot_tail source, "
    "version offsets, checkpoint recovery across the phases), applies "
    "a quality gate + derived-column transform per micro-batch, and "
    "MERGEs the result into a SILVER snapshot table (idempotent upsert "
    "through the declarative MERGE engine). Exactly-once end-to-end: "
    "the silver state hash-matches one batch SQL expression over all "
    "bronze rows — every row transformed once, none lost or doubled "
    "across the restart boundary.",
)
def pipeline_medallion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.sources.table_stream import SnapshotTailDataSource

    spark.dataSource.register(SnapshotTailDataSource)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    bronze = SnapshotTable(spark, "orders_bronze", scratch_root())
    silver = SnapshotTable(spark, "orders_silver", scratch_root())
    bronze.drop(), silver.drop()
    bronze.create(orders.filter(F.col("o_orderstatus") == "O"))
    run = uuid.uuid4().hex[:8]
    ckpt = os.path.join(work_root(), f"medallion_ckpt_{run}")

    def refine(batch_df: DataFrame, batch_id: int) -> None:
        refined = batch_df.filter(F.col("o_totalprice") >= 1000.0).select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            # det_round shape (floor(x·100+0.5)/100) — bit-stable vs SQL
            (
                F.floor(F.col("o_totalprice") * 0.1 * 100 + 0.5).cast("double")
                / 100
            ).alias("margin"),
        )
        if silver.current_version() is None:
            silver.create(refined)
            return
        refined.createOrReplaceTempView("medallion_batch")
        execute_dml(
            batch_df.sparkSession,
            """
            MERGE INTO orders_silver t USING medallion_batch s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """,
            root=scratch_root(),
        )

    def drain():
        q = (
            spark.readStream.format("snapshot_tail")
            .option("table", "orders_bronze")
            .option("root", scratch_root())
            .load()
            .writeStream.queryName("t_medallion")
            .foreachBatch(refine)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        drain()  # silver <- refined 'O' rows
        bronze.append(orders.filter(F.col("o_orderstatus") == "F"))
        drain()  # resumes at v1: refines ONLY the 'F' append
    finally:
        for q in spark.streams.active:
            if q.name == "t_medallion":
                q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        silver.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(exact_sum2("o_totalprice"), 2).alias("sum_price"),
            F.round(exact_sum2("margin"), 2).alias("sum_margin"),
        )
        .orderBy("o_orderstatus")
    )
