"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the dominant cost of a selective query is how many files the
scan can SKIP. A single-column sort gives tight min/max file ranges on
that column only; a Z-order (Morton) curve interleaves the bits of
several columns so every file's min/max envelope is tight on ALL of
them — the standard layout-maintenance op behind
`OPTIMIZE ... ZORDER BY` in lakehouse engines (public Delta/Iceberg
feature; implemented here from first principles on stock Spark). The
Hilbert-curve twin (`table_hilbert_layout`) keys the same pipeline by
the Hilbert index — strictly better locality at quadrant boundaries
(no diagonal jumps), the curve Delta OPTIMIZE uses for liquid
clustering — via an Arrow-batched numpy kernel (see `hilbert_spark`
for why it cannot be a Catalyst expression tree).

The pipeline is: compute the Morton key with pure built-in bit
expressions (whole-stage codegen, map-only) → order globally by the key
WITHOUT a single-reducer window (`operators.scale.
bucketed_global_row_number`) → assign ntile file buckets → per-bucket
min/max envelopes. In production the same ordering feeds
``df.repartitionByRange(z).sortWithinPartitions(z).write`` — the
registered query returns the per-bucket envelopes instead so the
clustering quality is value-checkable: a DuckDB oracle reproduces the
exact same Morton arithmetic with `ntile` over a plain window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.operators.scale import (
    bucketed_global_row_number,
    ntile_from_row_number,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

Z_BITS = 21  # per dimension: 2M distinct values — headroom beyond sf100
Z_FILES = 16  # target file buckets for the layout


def _spread_bits(x, bits: int):
    """Spread the low ``bits`` bits of a non-negative bigint column so
    bit i lands at position 2i — the standard 64-bit part1by1
    mask-shift cascade (binary magic numbers; public-domain
    bit-twiddling identity used by every Morton library). 5
    shift+or+and steps instead of a 2·bits-term sum: the per-bit
    formulation built an 84-node expression tree whose Catalyst
    analysis/optimization alone cost ~3 s PER JOB on the driver
    corpus; this tree is ~30 nodes and constant in ``bits``. The
    cascade is exact for any bits ≤ 31 (callers validate), keeping
    every interleaved position ≤ 62 — inside positive int64."""
    x = x.bitwiseAND(F.lit((1 << bits) - 1))
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return x


def morton_spark(x, y, bits: int = Z_BITS):
    """Bit-interleaved Morton key as a Spark Column: bit i of ``x`` lands
    at position 2i, bit i of ``y`` at 2i+1. Pure built-in expressions —
    stays inside whole-stage codegen. Value-identical to the per-bit
    oracle formula `morton_sql` (property-tested in tests). Accepts SQL
    expression strings or Columns — `_curve_frame` passes its rebased
    dim Columns so both curve twins key off the SAME expressions."""
    if not 1 <= bits <= 31:
        raise ValueError(f"morton_spark: bits must be in [1, 31], got {bits}")
    xs = _spread_bits((F.expr(x) if isinstance(x, str) else x).cast("bigint"), bits)
    ys = _spread_bits((F.expr(y) if isinstance(y, str) else y).cast("bigint"), bits)
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def morton_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB mirror of `morton_spark` (same bit placement)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"morton_sql: bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def hilbert_spark(x, y, bits: int = Z_BITS):
    """Hilbert curve index d of grid point (x, y) as an Arrow-batched
    Pandas UDF over two bigint columns.

    Why not built-in expressions like `morton_spark`: the Hilbert
    transform is a 21-level STATEFUL bit recurrence — each level
    conditionally swaps/flips the (x, y) pair before the next level
    reads it (the classic xy2d quadrant rotation, public-domain
    Wikipedia/Hacker's-Delight algorithm). Chained as Column
    expressions, Catalyst's CollapseProject would inline each level's
    x/y into the next level's THREE references without common
    subexpression reuse — an exponentially exploding expression tree
    (the same Catalyst-inlining trap SNIPPETS.md documents for
    transform() lambdas). The numpy kernel is O(bits) vectorized passes
    per Arrow batch, map-only, no shuffle — tier (b) of the brief's
    custom-operator ladder.

    Inputs are masked to [0, 2^bits); d ranges over [0, 4^bits), inside
    int64 for bits ≤ 31 (d ≤ 2⁶²). NULL in either dimension yields a
    NULL index — the same propagation as `morton_spark`'s built-in
    expressions, so the twins place nullable dims identically (a
    silent null→0 coercion would cluster unknown values with the
    dimension minimum)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"hilbert_spark: bits must be in [1, 31], got {bits}")

    @F.pandas_udf("long")
    def _hilbert(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np

        nulls = (xs.isna() | ys.isna()).to_numpy()
        n = np.int64(1 << bits)
        mask = np.int64(n - 1)
        x = xs.to_numpy(dtype=np.int64, na_value=0, copy=True) & mask
        y = ys.to_numpy(dtype=np.int64, na_value=0, copy=True) & mask
        d = np.zeros_like(x)
        s = np.int64(n >> 1)
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            swap = ry == 0
            flip = swap & (rx == 1)
            xf = np.where(flip, n - 1 - x, x)
            yf = np.where(flip, n - 1 - y, y)
            x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
            s >>= 1
        out = pd.Series(d, dtype="Int64")
        out[nulls] = pd.NA
        return out

    return _hilbert(x.cast("bigint"), y.cast("bigint"))


def hilbert_sql_ctes(x: str, y: str, bits: int, src: str) -> tuple[str, str]:
    """DuckDB mirror of `hilbert_spark` as a chain of CTEs — one
    projection per bit level, value-identical to the kernel (each level
    is a real operator in DuckDB, so no exponential expression inlining
    there either). Returns (cte_sql, last_cte_name); the chain carries
    working columns _hx/_hy/_hd alongside ``src``'s columns.

    Value identity includes the kernel's edge semantics (r10 ADVICE):
    inputs are masked to [0, 2^bits) in h0 exactly like the kernel's
    ``& mask``, and a NULL in EITHER dimension yields a NULL ``_hd`` —
    without the explicit final CASE, the per-level CASE expressions'
    ELSE branches swallow the NULL comparison and the chain would emit
    ``_hd = 0`` where the Spark kernel (deliberately) emits NULL."""
    if not 1 <= bits <= 31:
        raise ValueError(f"hilbert_sql_ctes: bits must be in [1, 31], got {bits}")
    n = 1 << bits
    lines = [
        f"h0 AS (SELECT *, (CAST({x} AS BIGINT) & {n - 1}) AS _hx, "
        f"(CAST({y} AS BIGINT) & {n - 1}) AS _hy, "
        f"(CAST({x} AS BIGINT) IS NULL OR CAST({y} AS BIGINT) IS NULL) AS _hnull, "
        f"CAST(0 AS BIGINT) AS _hd FROM {src})"
    ]
    lvl, s = 0, n >> 1
    while s > 0:
        lvl += 1
        lines.append(
            # the level weight is CAST to BIGINT: DuckDB parses a
            # ≤2^30 literal as INT32, and INT32·3 overflows at the
            # s=2^15 level the moment an input actually has that bit
            # set (the registered orders dims never do — full-range
            # grid inputs in tools/layout_quality_study.py did)
            f"h{lvl} AS (SELECT * EXCLUDE (_hx, _hy, _hd), "
            f"_hd + CAST({s * s} AS BIGINT) * (CASE WHEN (_hx & {s}) > 0 THEN "
            f"(CASE WHEN (_hy & {s}) > 0 THEN 2 ELSE 3 END) ELSE "
            f"(CASE WHEN (_hy & {s}) > 0 THEN 1 ELSE 0 END) END) AS _hd, "
            f"CASE WHEN (_hy & {s}) = 0 THEN (CASE WHEN (_hx & {s}) > 0 "
            f"THEN {n - 1} - _hy ELSE _hy END) ELSE _hx END AS _hx, "
            f"CASE WHEN (_hy & {s}) = 0 THEN (CASE WHEN (_hx & {s}) > 0 "
            f"THEN {n - 1} - _hx ELSE _hx END) ELSE _hy END AS _hy "
            f"FROM h{lvl - 1})"
        )
        s >>= 1
    lines.append(
        f"h{lvl + 1} AS (SELECT * EXCLUDE (_hd, _hnull), "
        f"CASE WHEN _hnull THEN NULL ELSE _hd END AS _hd FROM h{lvl})"
    )
    return ",\n".join(lines), f"h{lvl + 1}"


_SQL_DAYS = "date_diff('day', DATE '1970-01-01', o_orderdate)"


@register(
    "table_zorder_layout",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_custkey, {_SQL_DAYS} AS odays FROM orders
    ),
    mins AS (
        SELECT min(o_custkey) AS min_ck, min(odays) AS min_od FROM base
    ),
    keyed AS (
        -- dims are rebased to their min before interleaving so neither
        -- dimension's high bits drown the other (same as the Spark side)
        SELECT o_orderkey, o_custkey, odays,
               {morton_sql('(o_custkey - min_ck)', '(odays - min_od)')} AS z
        FROM base, mins
    ),
    tiled AS (
        SELECT *, ntile({Z_FILES}) OVER (ORDER BY z, o_orderkey) AS file_bucket
        FROM keyed
    )
    SELECT CAST(file_bucket AS INT)      AS file_bucket,
           CAST(count(*) AS BIGINT)      AS n_rows,
           CAST(min(o_custkey) AS BIGINT) AS min_custkey,
           CAST(max(o_custkey) AS BIGINT) AS max_custkey,
           CAST(min(odays) AS BIGINT)     AS min_odays,
           CAST(max(odays) AS BIGINT)     AS max_odays
    FROM tiled
    GROUP BY file_bucket
    ORDER BY file_bucket
    """,
    doc="Z-order (Morton) clustering of orders on (o_custkey, "
    "o_orderdate): interleave 21 bits of each dimension with built-in "
    "bit expressions (map-only, codegen'd), order globally by the "
    "Morton key via bucketed parallel row-numbering (no single-"
    "reducer window), cut into 16 ntile file buckets, and report each "
    "bucket's min/max envelope on BOTH dimensions — the file-skipping "
    "statistics a lakehouse scan would prune with. The same ordering "
    "feeds repartitionByRange(z).write for the actual rewrite; the "
    "envelope form makes clustering quality value-checkable against "
    "the oracle's identical Morton arithmetic.",
)
def table_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed, out = _zorder_frame(spark, sf_dir)
    # Materialize the Z_FILES-row summary eagerly so the persisted
    # keyed projection can be RELEASED before returning — otherwise
    # every invocation leaks a cache entry into the block manager for
    # the session's lifetime (same residue discipline as pagerank's
    # edge_w.unpersist()). Plan-shape tests assert on _zorder_frame,
    # whose lazy plan the checkpoint would otherwise hide.
    out = out.localCheckpoint().orderBy("file_bucket")
    keyed.unpersist()
    return out


def _zorder_frame(spark: SparkSession, sf_dir: str):
    """The lazy (un-checkpointed) zorder plan: returns (keyed, summary)
    where `keyed` is the persisted slim projection the caller must
    unpersist after materializing `summary`."""
    return _curve_frame(spark, sf_dir, lambda x, y: morton_spark(x, y))


def curve_envelopes(
    keyed: DataFrame,
    z_col: str,
    xcol: str,
    ycol: str,
    n_buckets: int,
    tiebreaks: tuple[str, ...],
) -> DataFrame:
    """Generic clustering-quality report for ANY precomputed curve key:
    order ``keyed`` globally by ``z_col`` (bucketed parallel numbering,
    never a single-reducer window), cut into ``n_buckets`` ntile file
    buckets, and emit each bucket's (min_x, max_x, min_y, max_y)
    envelope plus row count — the statistics a lakehouse scan prunes
    with. Shared by the registered zorder/hilbert queries and
    tools/layout_quality_study.py's skip-rate measurements."""
    numbered, n = bucketed_global_row_number(
        keyed, z_col, tiebreaks=tiebreaks, out_col="_rn"
    )
    tiled = numbered.withColumn(
        "file_bucket", ntile_from_row_number(F.col("_rn"), n, n_buckets)
    )
    return (
        tiled.groupBy("file_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(xcol).cast("bigint").alias("min_x"),
            F.max(xcol).cast("bigint").alias("max_x"),
            F.min(ycol).cast("bigint").alias("min_y"),
            F.max(ycol).cast("bigint").alias("max_y"),
        )
        .select(
            F.col("file_bucket").cast("int").alias("file_bucket"),
            "n_rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
        )
    )


def _curve_frame(spark: SparkSession, sf_dir: str, key_of):
    """Shared layout scaffolding for space-filling-curve clustering:
    rebase dims to their min, compute the curve key via ``key_of(x, y)``
    (Morton expression or Hilbert kernel), order globally without a
    single-reducer window, ntile into Z_FILES buckets, and report each
    bucket's per-dimension min/max envelope."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "odays"
        ),
    )
    # Rebase both dims to their min before interleaving (a 1-row
    # aggregate broadcast-joined to the fact side — never a global
    # window) so neither dimension's high bits drown the other.
    mins = orders.agg(
        F.min("o_custkey").alias("min_ck"), F.min("odays").alias("min_od")
    )
    # The bucketed numbering below makes three passes over the keyed
    # rows (quantile boundaries, per-bucket counts, the windowed
    # numbering itself) — persist the slim (key, dims, z) projection so
    # the scan+join+interleave runs once. A few MB per million rows;
    # the session's LRU store reclaims it.
    keyed = (
        orders.join(F.broadcast(mins))
        .withColumn(
            "z",
            key_of(
                F.col("o_custkey") - F.col("min_ck"),
                F.col("odays") - F.col("min_od"),
            ),
        )
        .persist()
    )
    out = curve_envelopes(
        keyed, "z", "o_custkey", "odays", Z_FILES, ("o_orderkey",)
    ).select(
        "file_bucket",
        "n_rows",
        F.col("min_x").alias("min_custkey"),
        F.col("max_x").alias("max_custkey"),
        F.col("min_y").alias("min_odays"),
        F.col("max_y").alias("max_odays"),
    )
    return keyed, out


_H_CTES, _H_LAST = hilbert_sql_ctes(
    "(o_custkey - min_ck)", "(odays - min_od)", Z_BITS, "keyed_base"
)


@register(
    "table_hilbert_layout",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_custkey, {_SQL_DAYS} AS odays FROM orders
    ),
    mins AS (
        SELECT min(o_custkey) AS min_ck, min(odays) AS min_od FROM base
    ),
    keyed_base AS (
        SELECT o_orderkey, o_custkey, odays, min_ck, min_od FROM base, mins
    ),
    {_H_CTES},
    tiled AS (
        SELECT *, ntile({Z_FILES}) OVER (ORDER BY _hd, o_orderkey) AS file_bucket
        FROM {_H_LAST}
    )
    SELECT CAST(file_bucket AS INT)      AS file_bucket,
           CAST(count(*) AS BIGINT)      AS n_rows,
           CAST(min(o_custkey) AS BIGINT) AS min_custkey,
           CAST(max(o_custkey) AS BIGINT) AS max_custkey,
           CAST(min(odays) AS BIGINT)     AS min_odays,
           CAST(max(odays) AS BIGINT)     AS max_odays
    FROM tiled
    GROUP BY file_bucket
    ORDER BY file_bucket
    """,
    doc="Hilbert-curve clustering twin of table_zorder_layout: same "
    "(o_custkey, o_orderdate) dims, rebase, bucketed global ordering "
    "and 16-bucket envelope report, but keyed by the Hilbert index "
    "(hilbert_spark, Arrow-batched numpy kernel — see its docstring "
    "for why the 21-level stateful bit recurrence cannot be a Catalyst "
    "expression tree). Hilbert preserves locality strictly better than "
    "Morton at quadrant boundaries (no long diagonal jumps) — "
    "QUANTIFIED in tools/layout_quality_study.py (r11, every envelope "
    "value-checked vs the oracle): on ×10/×100 orders with 64 file "
    "buckets, Hilbert envelopes cover 1.9× less area than Morton's on "
    "uniform dims (0.0174 vs 0.0328 of the domain) and 1.7× less "
    "under a quadratic x-skew (0.0222 vs 0.0387), and selective 2-D "
    "probes touch ~45%% fewer buckets (skip 0.982 vs 0.968). The "
    "OPTIMIZE ... ZORDER/HILBERT pair lakehouse engines expose. The "
    "DuckDB oracle reproduces the exact recurrence as one chained CTE "
    "per bit level.",
)
def table_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed, out = _hilbert_frame(spark, sf_dir)
    # same eager-summary + release discipline as table_zorder_layout
    out = out.localCheckpoint().orderBy("file_bucket")
    keyed.unpersist()
    return out


def _hilbert_frame(spark: SparkSession, sf_dir: str):
    return _curve_frame(spark, sf_dir, lambda x, y: hilbert_spark(x, y))
