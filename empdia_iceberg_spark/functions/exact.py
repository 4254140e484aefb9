"""Cross-engine-deterministic aggregate helpers.

Double `sum()`/`avg()` results depend on summation order, which differs
between Spark (partial aggregation over partitions) and DuckDB (scan
order) — and in Spark can change with parallelism. When such a value is
then rounded for the value-hash gate, a result sitting within one ulp
of a rounding boundary flips between engines.

Fix: sum in DECIMAL (exact, associative, order-independent), convert
once to double, and perform any subsequent arithmetic in the same
operation order as the oracle SQL — IEEE doubles then match
bit-for-bit. The driver tables' money/value columns are all exactly
2-decimal (verified), so DECIMAL(18,2) casts are lossless; derived
products (price×(1−disc)×(1+tax)) have ≤6 decimals and are cast to
DECIMAL(28,8).

SQL-side mirror snippets are provided for oracle strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(expr, dectype: str) -> Column:
    """The one core pattern every deterministic aggregate here derives
    from: cast each element to a DECIMAL wide enough to hold it
    losslessly, sum in decimal (exact, associative — immune to
    partial-aggregation order), convert ONCE back to double. Specialized
    entry points below pick the decimal type; new aggregate queries
    should use those rather than re-derive the cast discipline."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(dectype)).cast("double")


def sql_exact_sum(expr: str, dectype: str) -> str:
    """DuckDB mirror of `exact_sum` for oracle strings."""
    return f"CAST(sum(CAST({expr} AS {dectype})) AS DOUBLE)"


def exact_sum2(col) -> Column:
    """Order-independent sum of a 2-decimal double column, as double."""
    return exact_sum(col, "decimal(18,2)")


def exact_sum8(expr: Column) -> Column:
    """Order-independent sum of a derived double expression with ≤8
    meaningful decimals, as double."""
    return exact_sum(expr, "decimal(28,8)")


def exact_avg2(col) -> Column:
    """Deterministic average: exact decimal sum ÷ count."""
    return exact_sum2(col) / F.count(F.lit(1))


def det_round(expr: Column, d: int) -> Column:
    """Cross-engine-deterministic rounding of a double.

    Spark's ``round`` rounds the double's SHORTEST decimal repr
    (Double.toString → BigDecimal HALF_UP); DuckDB rounds the exact
    binary value — identical doubles can round differently (e.g.
    70.49124999999999937 → .4913 vs .4912). floor(x·10^d + 0.5)/10^d
    uses only IEEE ops, so both engines agree bit-for-bit.
    """
    scale = float(10**d)
    return F.floor(expr * scale + F.lit(0.5)).cast("double") / scale


def sql_det_round(expr: str, d: int) -> str:
    scale = float(10**d)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def exact_sum_r6(expr: Column) -> Column:
    """Order-independent sum of an ARBITRARY double expression (e.g. a
    sigmoid score), as double.

    A plain double sum depends on summation order (Spark partials vs
    DuckDB scan order), which flips det_round at boundary values. Fix:
    det_round each element to 6 digits first — bit-identical across
    engines — then cast to DECIMAL(27,6). The det_round output is the
    nearest double to k/10^6, whose shortest decimal repr IS the
    6-digit value, so Spark's shortest-repr double→decimal cast and
    DuckDB's exact-binary cast both yield exactly k·10⁻⁶. The decimal
    sum is exact and associative; one final cast back to double is
    correctly rounded on both engines. Mirror: `sql_sum_r6`.
    """
    return exact_sum(det_round(expr, 6), "decimal(27,6)")


def sql_sum_r6(expr: str) -> str:
    return sql_exact_sum(sql_det_round(expr, 6), "DECIMAL(27,6)")


def exact_sum_r6_bounded(expr: Column) -> Column:
    """`exact_sum_r6` for BOUNDED-cardinality groups, at LONG speed.

    Same value: floor(x·10⁶+0.5) is exactly the integer k the
    det_round→DECIMAL(27,6) cast would accumulate, a long sum of the
    k's is exact, and double(Σk)/10⁶ equals the decimal→double cast
    while |Σk| < 2⁵³. The difference from `exact_sum_r6` is the
    overflow posture: the decimal buffer is exact at ANY group size,
    the long sum only while rows-per-group · max|x|·10⁶ ≪ 2⁶³. Use
    this ONLY where the group is structurally bounded — per-document
    token sums, per-key fixed-width vectors — never for whole-corpus
    rollups (those take `exact_sum_r6` or `grouped_scaled_sums`).
    PRECONDITION: x ≥ 0 (r10 ADVICE). floor(x·10⁶+0.5) rounds negative
    halfway values toward +inf while the decimal cast rounds HALF_UP
    away from zero, so the bit-identity only holds for non-negative
    inputs; a signed call site must use `exact_sum_r6` instead.
    Hot-loop motivation: a DECIMAL(27,6) sum buffer is BigDecimal
    (~4× per element, measured); per-doc NB/LM scoring over the token
    stream is the engine's largest decimal-aggregation volume."""
    return (
        F.sum(F.floor(expr * F.lit(1e6) + F.lit(0.5))).cast("double") / F.lit(1e6)
    )


def exact_sum8_bounded(expr: Column) -> Column:
    """`exact_sum8` for BOUNDED-cardinality groups, at LONG speed.

    The d=8 sibling of `exact_sum_r6_bounded` (same argument): for an
    expression with ≤8 exact decimal digits, floor(x·10⁸+0.5) is
    exactly the integer the DECIMAL(28,8) cast would accumulate, the
    long sum of those integers is exact while
    rows-per-group · max|x|·10⁸ ≪ 2⁶³, and double(Σk)/10⁸ equals the
    oracle's decimal→double cast bit-for-bit while |Σk| < 2⁵³. Use
    ONLY where the group is structurally bounded — e.g. per-ORDER
    lineitem revenue (≤7 lineitems per order in the TPC-H data model;
    the 2⁵³ identity holds to ~800 lineitems × 10⁵ money values, and
    the long itself to ~840k) — never for whole-corpus rollups (those
    take `grouped_scaled_sums`, exact at any scale).
    PRECONDITION: x ≥ 0, same as `exact_sum_r6_bounded` (r10 ADVICE):
    floor(x·10⁸+0.5) rounds negative halfway values toward +inf, the
    DECIMAL(28,8) cast rounds HALF_UP away from zero — the sole call
    site (q3 revenue, extendedprice·(1−discount)) is non-negative by
    construction; a signed call site must use `exact_sum8`."""
    return (
        F.sum(F.floor(expr * F.lit(1e8) + F.lit(0.5))).cast("double") / F.lit(1e8)
    )


def sql_sum2(col: str) -> str:
    return sql_exact_sum(col, "DECIMAL(18,2)")


def sql_sum8(expr: str) -> str:
    return sql_exact_sum(expr, "DECIMAL(28,8)")


def sql_avg2(col: str) -> str:
    return f"({sql_sum2(col)} / count(*))"


def grouped_scaled_sums(df, keys: list[str], specs: dict):
    """Exact grouped decimal sums at LONG speed: two-level aggregation
    with scaled-integer partials.

    Spark's sum over a DECIMAL wider than 18 digits keeps a BigDecimal
    buffer — ~4× slower per element than a long sum on the driver
    corpus (measured: 8 exact decimal aggs over 600k rows 1.1 s vs
    0.28 s as longs). But a single-level long sum silently wraps once a
    whole-table group sum passes 2⁶³. This helper restores the decimal
    path's scale safety while keeping the hot per-row work integral:

    - level 1 groups by (keys, spark_partition_id): each element is
      floor(x·10^d + 0.5) — for values with ≤ d exact decimal digits
      this is precisely the integer the decimal cast would produce
      (same argument as det_round) — and sums as a LONG. The bound is
      per-PARTITION: ≤ rows-per-split · max|x|·10^d, e.g. 4M rows of
      128 MB splits × 10¹³ stays far under 2⁶³ for money columns.
    - level 2 re-aggregates the per-partition partials per key in
      DECIMAL(38,0) — exact at any corpus size — and converts once to
      double. double(Σk)/10^d equals the oracle's decimal→double cast
      exactly while Σk < 2⁵³ (true at every hash-gated SF; beyond it
      both sides agree to within the double's own representability).

    ``specs``: {name: (Column expr with ≤ d exact decimals, d)}.
    Returns df grouped by ``keys`` with one double column per spec
    plus ``__count`` (the level-1 row count, for averages). Shuffled
    rows: |groups|·|partitions| of longs — the same volume a plain
    partial aggregation exchanges.
    """
    lvl1 = df.withColumn("__pid", F.spark_partition_id()).groupBy(
        *keys, "__pid"
    ).agg(
        *[
            F.sum(F.floor(expr * F.lit(float(10**d)) + F.lit(0.5))).alias(
                f"__p_{name}"
            )
            for name, (expr, d) in specs.items()
        ],
        F.count(F.lit(1)).alias("__pn"),
    )
    return lvl1.groupBy(*keys).agg(
        *[
            (
                F.sum(F.col(f"__p_{name}").cast("decimal(38,0)")).cast("double")
                / F.lit(float(10**d))
            ).alias(name)
            for name, (expr, d) in specs.items()
        ],
        F.sum("__pn").alias("__count"),
    )


# ------------------------------------------------------ second moments
#
# Bit-deterministic covariance/correlation/stddev need all five moment
# sums (Σx, Σy, Σx², Σy², Σxy) accumulated exactly; the closed-form
# combinations are then pure IEEE arithmetic identical on both engines.
# This is THE pattern for any future exact statistical aggregate — use
# these two helpers instead of re-deriving the cast discipline
# (stats_exact_moments in operators/relational.py is the model caller).


def moment_sums(x: str, y: str) -> list[Column]:
    """Aggregate columns [n, sx, sy, sxx, syy, sxy] over 2-decimal
    columns ``x``/``y``: exact decimal accumulation, one double
    conversion each. Products of two DECIMAL(18,2) stay exact in
    Spark/DuckDB's widened decimal multiply."""
    dx = F.col(x).cast("decimal(18,2)")
    dy = F.col(y).cast("decimal(18,2)")
    return [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    ]


def sql_moment_sums(x: str, y: str) -> str:
    """DuckDB mirror of `moment_sums` — the select-list snippet producing
    the same n/sx/sy/sxx/syy/sxy names."""
    dx = f"CAST({x} AS DECIMAL(18,2))"
    dy = f"CAST({y} AS DECIMAL(18,2))"
    return f"""
           CAST(count(*) AS DOUBLE)              AS n,
           CAST(sum({dx}) AS DOUBLE)             AS sx,
           CAST(sum({dy}) AS DOUBLE)             AS sy,
           CAST(sum({dx} * {dx}) AS DOUBLE)      AS sxx,
           CAST(sum({dy} * {dy}) AS DOUBLE)      AS syy,
           CAST(sum({dx} * {dy}) AS DOUBLE)      AS sxy"""
