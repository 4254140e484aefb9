"""Scale-safe global ordering primitives.

A global ``row_number() OVER (ORDER BY ...)`` moves the whole table
through ONE reducer — the classic scale-killer. The equivalent layout
that parallelizes: bucket the order column by approx-quantile
boundaries, count per bucket (a driver collect of one row per bucket),
convert counts to cumulative offsets, then number WITHIN each bucket
and add the offset. Every bucket numbers in parallel; the result is an
exact global position. Used by `plans.prep.positional_split` (R3) and
`operators.windows.window_ntile_quartiles`.

Assumes the order column is numeric and ties are broken by the
tiebreak columns within a bucket; rows equal to a bucket boundary land
in one bucket together, so cross-bucket order is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def bucketed_global_row_number(
    df: DataFrame,
    order_col: str,
    tiebreaks: tuple[str, ...] = (),
    buckets: int = 64,
    out_col: str = "_rn",
) -> tuple[DataFrame, int]:
    """Append an exact global 1-based row number in (order_col,
    *tiebreaks) order without a single-partition window. Returns
    (df_with_out_col, total_row_count)."""
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(df.approxQuantile(order_col, qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    bdf = df.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["cnt"]
        for r in bdf.groupBy("_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(*[F.lit(x) for b, o in offsets.items() for x in (b, o)])
    w = W.partitionBy("_bkt").orderBy(order_col, *tiebreaks)
    out = bdf.withColumn(out_col, F.row_number().over(w) + off_map[F.col("_bkt")]).drop(
        "_bkt"
    )
    return out, n


def ntile_from_row_number(rn, n: int, tiles: int):
    """SQL ntile(k) bucket from a global row number: the first n%k
    buckets take ceil(n/k) rows, the rest floor(n/k)."""
    base, rem = divmod(n, tiles)
    head = rem * (base + 1)
    if base == 0:
        return rn.cast("int")
    return (
        F.when(rn <= head, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - head - 1) / base) + 1)
        .cast("int")
    )
