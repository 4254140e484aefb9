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

import warnings

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
    (df_with_out_col, total_row_count).

    Degenerate order columns (constant / low-cardinality) collapse the
    approx-quantile boundaries, which would silently reinstate the
    single-reducer global window this function exists to avoid. In
    that case every primary bucket holds exactly ONE distinct
    order_col value (boundaries = the exact distinct values, fetched
    with a small groupBy — safe: low cardinality is the premise), so a
    secondary RANGE bucketing on the first numeric tiebreak still
    yields a total order across composite buckets. With NO declared
    tiebreaks a deterministic xxhash64-of-the-row tiebreak is
    synthesized (tie order is arbitrary by contract, so this is
    semantics-preserving and keeps the numbering bucketed); only a
    declared-but-non-numeric tiebreak order keeps the single-bucket
    behavior, with a warning.
    """
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(df.approxQuantile(order_col, qs, 0.001)))

    sub_col = None
    synthesized = False
    if len(bounds) < max(2, buckets // 8):
        nd = df.agg(F.approx_count_distinct(order_col).alias("nd")).collect()[0]["nd"]
        if nd > buckets * 4:
            # High cardinality but skewed: a composite range bucketing
            # can't preserve order (a primary bucket mixes values), so
            # keep the quantile buckets and surface the hot spot.
            warnings.warn(
                f"bucketed_global_row_number: {order_col!r} is skewed "
                f"({len(bounds)} usable boundaries for {nd} distinct values); "
                "heavy-hitter buckets will be large",
                stacklevel=2,
            )
        else:
            # Boundaries collapsed → order_col has few distinct values.
            # Exact distinct values (small by premise) become the primary
            # boundaries so each bucket is single-valued.
            distinct_vals = sorted(
                r[0] for r in df.select(order_col).distinct().collect()
            )
            bounds = distinct_vals[:-1]  # > v boundaries between the values
            numeric_tb = [
                c
                for c in tiebreaks
                if dict(df.dtypes).get(c)
                in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
            ]
            # xxhash64 rejects MapType anywhere in an input's type (maps
            # have no canonical element order), so the synthesized row
            # hash feeds only map-free columns; 'map<' in the ddl string
            # catches maps at any nesting depth.
            hashable = [
                c for c, t in df.dtypes if "map<" not in t
            ]
            if numeric_tb:
                sub_col = numeric_tb[0]
            elif not tiebreaks and hashable:
                # No declared tiebreaks: tie order is arbitrary by this
                # function's contract, so synthesize a deterministic
                # numeric one — xxhash64 over the full row — and
                # range-bucket on it. The numbering stays bucketed even
                # for a constant order column, and tie order becomes
                # reproducible instead of partitioning-dependent. (With
                # DECLARED non-numeric tiebreaks we must not override
                # the caller's tie order, so that path still warns.)
                sub_col = "_syn_tb"
                while sub_col in df.columns:  # never clobber a user column
                    sub_col += "_"
                synthesized = True
                df = df.withColumn(
                    sub_col, F.xxhash64(*[F.col(c) for c in hashable])
                )
            else:
                warnings.warn(
                    f"bucketed_global_row_number: order column {order_col!r} has "
                    f"{len(distinct_vals)} distinct values and no numeric tiebreak — "
                    "row numbering degrades toward a single-partition window",
                    stacklevel=2,
                )

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    if sub_col is not None:
        # Secondary range bucketing: valid because each primary bucket
        # now contains exactly one order_col value, so ordering the
        # composite buckets by (primary, secondary) agrees with the row
        # order (order_col, *tiebreaks).
        sub_bounds = sorted(set(df.approxQuantile(sub_col, qs, 0.001)))
        sub = F.lit(0)
        for b in sub_bounds:
            sub = sub + F.when(F.col(sub_col) > F.lit(b), 1).otherwise(0)
        bucket = bucket * (len(sub_bounds) + 1) + sub

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
    order_cols = [order_col, *tiebreaks]
    if synthesized:
        order_cols.append(sub_col)  # synthesized tiebreak decides ties
    w = W.partitionBy("_bkt").orderBy(*order_cols)
    out = bdf.withColumn(out_col, F.row_number().over(w) + off_map[F.col("_bkt")]).drop(
        "_bkt"
    )
    if synthesized:
        out = out.drop(sub_col)
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


def hash_sample_per_stratum(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    oversample: int = 32,
) -> DataFrame:
    """Deterministic per-stratum sample: the k rows with the smallest
    md5(key) per stratum — a reproducible 'reservoir' whose membership
    is a pure function of the key, so re-runs, retries, and different
    cluster layouts all pick the same rows (unlike rand()-based
    sampling).

    Scale shape: a naive per-stratum top-k window sorts EVERY row of a
    stratum on one reducer-group. Instead, strata counts (bounded by
    the number of strata — a driver-safe collect) derive a hash-prefix
    threshold keeping ~oversample*k rows per stratum; the exact top-k
    window then runs on survivors only. With oversample=32 the
    probability a stratum yields fewer than k survivors is
    Chernoff-negligible (P[Bin(n, 32k/n) < k] < exp(-20k)), so the
    result equals the unfiltered top-k; callers' oracles can use the
    plain window form.

    Appends ``_hkey`` (the md5 rank key) and ``sample_rank`` (1..k).
    """
    hkey = F.md5(F.col(key_col).cast("string"))
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    space = 16**8  # first 8 hex chars of the md5
    thresholds = {}
    for s, n in counts.items():
        frac = min(1.0, oversample * k / max(n, 1))
        if frac < 1.0:
            thresholds[s] = format(int(frac * space), "08x")
    out = df.withColumn("_hkey", hkey)
    if thresholds:
        thresh_map = F.create_map(
            *[F.lit(x) for s, t in thresholds.items() for x in (s, t)]
        )
        bound = thresh_map[F.col(stratum_col)]
        out = out.filter(bound.isNull() | (F.substring("_hkey", 1, 8) <= bound))
    w = W.partitionBy(stratum_col).orderBy("_hkey", key_col)
    return out.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def bucketed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tiebreaks: tuple[str, ...] = (),
    buckets: int = 64,
    out_col: str = "_cum",
) -> DataFrame:
    """Exact global running sum of ``value_col`` in (order_col,
    *tiebreaks) order WITHOUT a single-partition window — the prefix-sum
    sibling of `bucketed_global_row_number`: quantile-bucket the order
    column, collect one (count, sum) row per bucket (driver-bounded),
    convert to cumulative offsets, then add a within-bucket running sum.
    ``value_col`` should be DECIMAL for an order-independent result.

    Rows equal to a bucket boundary land in one bucket, so the
    cross-bucket order is total; ties inside a bucket follow the
    tiebreaks, exactly like the row-number variant."""
    return bucketed_prefix_sums(
        df, order_col, {out_col: value_col}, tiebreaks=tiebreaks, buckets=buckets
    )


def bucketed_prefix_sums(
    df: DataFrame,
    order_col: str,
    specs: dict,
    tiebreaks: tuple[str, ...] = (),
    buckets: int = 64,
) -> DataFrame:
    """Multi-column `bucketed_prefix_sum`: ``specs`` maps out_col →
    value_col; every cumulative column shares ONE quantile probe, ONE
    bucket assignment, ONE per-bucket stats collect, and ONE window —
    callers needing several running sums over the same ordering (the KS
    two-sample CDFs, for instance) would otherwise re-run the
    approxQuantile scan and the driver round-trip per column, and the
    two passes' independently-sampled boundaries could even bucket the
    table differently."""
    qs = [i / buckets for i in range(1, buckets)]
    probe = df.withColumn("_ord_d", F.col(order_col).cast("double"))
    bounds = sorted(set(probe.approxQuantile("_ord_d", qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col).cast("double") > F.lit(b), 1).otherwise(0)
    bdf = df.withColumn("_bkt", bucket)
    stats_rows = bdf.groupBy("_bkt").agg(
        *[F.sum(v).alias(f"_s_{o}") for o, v in specs.items()]
    ).collect()
    w = (
        W.partitionBy("_bkt")
        .orderBy(order_col, *tiebreaks)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dtypes = dict(df.dtypes)
    out = bdf
    for out_col, value_col in specs.items():
        stats = {r["_bkt"]: r[f"_s_{out_col}"] for r in stats_rows}
        offsets, acc = {}, None
        for b in sorted(stats):
            offsets[b] = acc  # None => zero offset (first bucket)
            acc = stats[b] if acc is None else acc + stats[b]
        off_items = [(b, o) for b, o in offsets.items() if o is not None]
        within = F.sum(value_col).over(w)
        if off_items:
            off_map = F.create_map(
                *[F.lit(x) for b, o in off_items for x in (b, str(o))]
            )
            # offsets travel as exact decimal strings → cast back, never double
            offset = F.coalesce(
                off_map[F.col("_bkt")].cast(dtypes[value_col]), F.lit(0)
            )
        else:
            offset = F.lit(0)
        out = out.withColumn(out_col, within + offset)
    return out.drop("_bkt")
