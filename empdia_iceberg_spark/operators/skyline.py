"""Skyline (Pareto-front) operator — pattern from the public literature
("Integration of Skyline Queries into Spark SQL", EDBT 2023; see
PAPERS.md): return the orders not dominated by any other order, where
p dominates q when p is cheaper AND at least as recent.

Algorithm (2-D sorted-scan skyline): sort by (price asc, key asc);
a row survives iff its date is strictly greater than the running max
date of everything sorted before it — O(n log n) total, no pairwise
join. Ties on price resolve by key order, mirrored exactly in the
oracle, so both engines agree on the boundary cases.

Scale-safe layout: the "sort" is NOT a global single-partition window.
Rows are quantile-bucketed by price (operators/scale.py layout); each
bucket computes its running max in parallel, and the cross-bucket
prefix max (one tiny driver-side pass over per-bucket maxima) is
injected as a literal map — the same two-phase trick as the bucketed
global row number. At 100 TB this is one range-ish shuffle + a
broadcast of B scalars.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


def skyline_2d(
    df: DataFrame, price_col: str, date_col: str, key_col: str, buckets: int = 32
) -> DataFrame:
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(df.approxQuantile(price_col, qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(price_col) > F.lit(b), 1).otherwise(0)
    bdf = df.withColumn("_bkt", bucket)

    # per-bucket maxima → cross-bucket prefix maxima (tiny driver pass)
    maxima = {
        r["_bkt"]: r["mx"]
        for r in bdf.groupBy("_bkt").agg(F.max(date_col).alias("mx")).collect()
    }
    prefix: dict[int, dt.date | None] = {}
    run: dt.date | None = None
    for b in sorted(maxima):
        prefix[b] = run  # max date over all STRICTLY cheaper buckets
        run = maxima[b] if run is None else max(run, maxima[b])
    prefix_expr = F.lit(None).cast("date")
    for b in sorted(prefix, reverse=True):
        mx = prefix[b]
        val = F.lit(mx).cast("date") if mx is not None else F.lit(None).cast("date")
        prefix_expr = F.when(F.col("_bkt") == b, val).otherwise(prefix_expr)

    w = (
        W.partitionBy("_bkt")
        .orderBy(price_col, key_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    staged = bdf.withColumn("_local_prev", F.max(date_col).over(w)).withColumn(
        "_prefix_max", prefix_expr
    )
    prev_max = F.greatest(
        F.coalesce(F.col("_local_prev"), F.lit("0001-01-01").cast("date")),
        F.coalesce(F.col("_prefix_max"), F.lit("0001-01-01").cast("date")),
    )
    first_ever = F.col("_local_prev").isNull() & F.col("_prefix_max").isNull()
    return staged.filter(first_ever | (F.col(date_col) > prev_max)).drop(
        "_bkt", "_local_prev", "_prefix_max"
    )


@register(
    "skyline_orders_2d",
    oracle="""
    WITH s AS (
        SELECT o_orderkey, o_totalprice, o_orderdate,
               max(o_orderdate) OVER (ORDER BY o_totalprice, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM orders
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderdate
    FROM s
    WHERE prev_max IS NULL OR o_orderdate > prev_max
    ORDER BY totalprice
    """,
    doc="Skyline / Pareto front of orders (cheap AND recent): sorted-scan "
    "running-max formulation, executed scale-safe via price-quantile "
    "buckets + cross-bucket prefix maxima instead of one global window.",
)
def skyline_orders_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    sky = skyline_2d(orders, "o_totalprice", "o_orderdate", "o_orderkey")
    return sky.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "o_orderdate"
    ).orderBy("totalprice")
