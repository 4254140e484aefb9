"""Temporal joins (SURVEY.md §2.B joins row): as-of join and
equi+range (theta) join — the two join shapes stock Spark lacks a
dedicated operator for.

**As-of join** ("for each probe row, the latest build row at or before
its timestamp, per key") is built with the scalable union trick SURVEY
§4.3 prescribes: tag both sides, union, and take
``last(build_value) IGNORE NULLS`` over a (key)-partitioned window
ordered by (ts, side) — one shuffle on the key, no range explosion, no
per-row subquery. The DuckDB oracle is a native ``ASOF LEFT JOIN``, so
the trick is differentially checked against a real as-of
implementation.

**Range join** (equi key + time band) stays a plain join with a
range predicate: Catalyst executes the equi part as a hash/SMJ join
and post-filters the band, which is the right plan when the equi key
is selective (per-user here). The band is closed-open [ts, ts+1h).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    value_cols: tuple[str, ...],
    tiebreaks: tuple[str, ...] = (),
) -> DataFrame:
    """Generic as-of join: probe columns + last build value_cols with
    build.ts <= probe.ts per key (ties: build row sorts first, so an
    equal-timestamp build row IS visible to the probe row — DuckDB ASOF
    `<=` semantics).

    ``tiebreaks`` (a subset of value_cols) deterministically picks
    among build rows sharing (key, ts): the row with the GREATEST
    tiebreak tuple wins. Without it, last() over a window ordered only
    by (ts, side) picks an arbitrary peer when build timestamps
    collide — nondeterministic across runs and engines.
    """
    p = probe.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),  # probe sorts after build at equal ts
        F.struct(*probe.columns).alias("_probe"),
        *[F.lit(None).cast(dict(build.dtypes)[c]).alias(f"_b_{c}") for c in value_cols],
    )
    b = build.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in probe.dtypes) + ">"
        ).alias("_probe"),
        *[F.col(c).alias(f"_b_{c}") for c in value_cols],
    )
    # Tiebreak columns are null on probe rows, but _side already orders
    # probe after every build row at equal ts, so the nulls never decide.
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side", *[f"_b_{c}" for c in tiebreaks])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = p.unionByName(b)
    # Carry the matched build row as ONE struct, not one last(ignore
    # nulls) window per column: per-column carries TEAR the row when a
    # build value column is NULL — each column falls back to a
    # DIFFERENT earlier build row, producing a composite no build row
    # ever contained, where ASOF semantics return the latest row's
    # values (NULLs included). The struct is NULL exactly on probe
    # rows (build structs are never NULL even when every field is), so
    # last(struct, ignorenulls) is precisely "latest build row".
    brow = F.when(
        F.col("_side") == 0, F.struct(*[F.col(f"_b_{c}").alias(c) for c in value_cols])
    )
    carried = unioned.select(
        "_probe",
        F.last(brow, ignorenulls=True).over(w).alias("_brow"),
    )
    out = carried.filter(F.col("_probe").isNotNull()).select(
        "_probe.*",
        *[F.col(f"_brow.{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return out


@register(
    "asof_join_last_error",
    oracle="""
    SELECT a.event_id,
           a.user_id,
           a.ts,
           b.event_id AS asof_event_id,
           b.ts       AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF LEFT JOIN (
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'error'
        GROUP BY user_id, ts
    ) b
      ON a.user_id = b.user_id AND b.ts <= a.ts
    ORDER BY a.event_id
    """,
    doc="As-of join: for every click, the latest error by the same user "
    "at or before it — union + last() IGNORE NULLS over one keyed "
    "window, checked against DuckDB's native ASOF LEFT JOIN. Ties on "
    "(user_id, ts) resolve to the max event_id on both sides: the Spark "
    "window tiebreaks on event_id; the oracle pre-collapses ties so "
    "DuckDB ASOF (whose tie choice is unspecified) sees a unique row.",
)
def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    out = asof_join(
        clicks,
        errors,
        key="user_id",
        ts="ts",
        value_cols=("event_id", "ts"),
        tiebreaks=("event_id",),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id"),
        F.col("asof_ts"),
    ).orderBy("event_id")


@register(
    "range_join_events_1h",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           count(f.event_id)                 AS n_following_1h,
           coalesce(round(CAST(sum(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE), 2), 0.0) AS sum_following_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN events f
      ON f.user_id = p.user_id
     AND f.ts >= p.ts AND f.ts < p.ts + INTERVAL 1 HOUR
     AND f.event_id <> p.event_id
    GROUP BY p.event_id, p.user_id
    ORDER BY p.event_id
    """,
    doc="Equi+range (theta) join: per purchase, activity of the same user "
    "in the following hour — hash join on user_id with a time-band "
    "post-predicate (the selective-equi-key plan).",
)
def range_join_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    f = ev.select(
        F.col("event_id").alias("f_id"), F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"), F.col("value").alias("f_value"),
    )
    joined = p.join(
        f,
        (F.col("f_user") == F.col("p_user"))
        & (F.col("f_ts") >= F.col("p_ts"))
        & (F.col("f_ts") < F.col("p_ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("f_id") != F.col("p_id")),
        "left",
    )
    return (
        joined.groupBy(F.col("p_id").alias("event_id"), F.col("p_user").alias("user_id"))
        .agg(
            F.count("f_id").alias("n_following_1h"),
            F.coalesce(
                F.round(F.sum(F.col("f_value").cast("decimal(18,2)")).cast("double"), 2),
                F.lit(0.0),
            ).alias("sum_following_value"),
        )
        .orderBy("event_id")
    )


GAP_FILL_START = "2024-01-01 00:00:00"
GAP_FILL_END = "2024-01-03 23:00:00"  # 3 days of hourly buckets


@register(
    "events_gap_fill_ffill",
    oracle=f"""
    WITH hours AS (
        SELECT unnest(generate_series(TIMESTAMP '{GAP_FILL_START}',
                                      TIMESTAMP '{GAP_FILL_END}',
                                      INTERVAL 1 HOUR)) AS hour
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    grid AS (SELECT user_id, hour FROM users CROSS JOIN hours),
    hourly AS (
        -- row_number (ts DESC, event_id DESC) mirror of Spark's
        -- max_by(value, struct(ts, event_id)): DuckDB max_by takes no
        -- composite key, and max_by on ts alone picks an ARBITRARY
        -- peer when two events share a timestamp
        SELECT user_id, hour, round(value, 2) AS last_value_in_hour
        FROM (
            SELECT user_id, date_trunc('hour', ts) AS hour, value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts >= TIMESTAMP '{GAP_FILL_START}'
              AND ts <  TIMESTAMP '{GAP_FILL_END}' + INTERVAL 1 HOUR
        ) WHERE rn = 1
    )
    SELECT g.user_id, g.hour,
           h.last_value_in_hour AS observed,
           last_value(h.last_value_in_hour IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
    ORDER BY g.user_id, g.hour
    """,
    doc="Time-series resample + gap fill (hypertable/continuous-timeline "
    "shape): a dense per-user hourly grid is generated with sequence()+"
    "explode, observed hours join in, and missing hours forward-fill via "
    "last() IGNORE NULLS over the user timeline — one shuffle on "
    "user_id; the grid generation is embarrassingly parallel.",
)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit(GAP_FILL_START).cast("timestamp"),
                F.lit(GAP_FILL_END).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    hourly = (
        ev.filter(
            (F.col("ts") >= F.lit(GAP_FILL_START).cast("timestamp"))
            & (F.col("ts") < F.lit(GAP_FILL_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        # (ts, event_id) tiebreak: max_by on ts alone picks an
        # ARBITRARY peer when two events share a timestamp — the same
        # nondeterminism asof_join's docstring warns about
        .agg(
            F.round(
                F.max_by("value", F.struct("ts", "event_id")), 2
            ).alias("last_value_in_hour")
        )
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        F.col("last_value_in_hour").alias("observed"),
        F.last("last_value_in_hour", ignorenulls=True).over(w).alias("filled"),
    ).orderBy("user_id", "hour")
