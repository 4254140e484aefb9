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


def exact_sum2(col) -> Column:
    """Order-independent sum of a 2-decimal double column, as double."""
    return F.sum(F.col(col).cast("decimal(18,2)") if isinstance(col, str) else col.cast("decimal(18,2)")).cast("double")


def exact_sum8(expr: Column) -> Column:
    """Order-independent sum of a derived double expression with ≤8
    meaningful decimals, as double."""
    return F.sum(expr.cast("decimal(28,8)")).cast("double")


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
    return F.sum(det_round(expr, 6).cast("decimal(27,6)")).cast("double")


def sql_sum_r6(expr: str) -> str:
    return f"CAST(sum(CAST({sql_det_round(expr, 6)} AS DECIMAL(27,6))) AS DOUBLE)"


def sql_sum2(col: str) -> str:
    return f"CAST(sum(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_sum8(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(28,8))) AS DOUBLE)"


def sql_avg2(col: str) -> str:
    return f"({sql_sum2(col)} / count(*))"
