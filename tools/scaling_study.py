"""Reproducible scaling studies for SURVEY.md §6 (VERDICT asks).

Small-SF bench ratios vs the in-process DuckDB baseline are LATENCY
bound: every fresh Spark plan pays a fixed ~0.1–0.3 s floor an
in-process library doesn't, so the honest question is how the ratio
moves as the data grows toward the scales this engine targets. This
tool builds ×k replicas of the sf0.1 tables (key/time offsets preserve
referential integrity and group-size structure — scaling adds GROUPS,
it doesn't inflate groups), then times the REAL registered query
function against its own DuckDB oracle on the same files, fresh plan
per run, best-of-3 both engines (the bench.py methodology).

Studies:
  window_rank   window_rank_topk_per_customer over orders ×k
                (custkey+orderkey offsets: k× more customers, window
                sizes unchanged — per-group top-k at growing group count)
  events_hourly events_hourly_rollup over events ×k (ts offset by 35
                days per replica: k× more hour buckets, rows per bucket
                unchanged; event_id offset keeps ids unique)
  q3            q3_join3_topk over customer/orders/lineitem ×k
                (matching custkey/orderkey offsets keep every join edge)
  q3_bucketed   the identical q3 shape with orders and lineitem
                PRE-BUCKETED by the join key (bucketBy(32, orderkey),
                sortBy) — the pay-once layout that removes the per-query
                big-big exchange; the bucketed write is untimed prep,
                exactly the trade a 100 TB deployment makes. DuckDB has
                no bucketed twin — compare against the q3 study's
                DuckDB column at the same scale.

Usage:
  python tools/scaling_study.py window_rank events_hourly --scales 10,30,100
  python tools/scaling_study.py q3 q3_bucketed --scales 10,30,100
  python tools/scaling_study.py q1 --scales 10,30,100
  python tools/scaling_study.py dedup --scales 100,1000

Scaled datasets land under $SPARK_GRAFT_SCALE_ROOT (default
/tmp/scale_study) and are reused across invocations; `--check` also
value-compares Spark vs oracle rows on the scaled data (sorted,
column-name-canonical — the driver's compare), proving the replication
recipe preserves query semantics, not just row counts.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/tmp/scale_study")
EVENT_TS_STRIDE_DAYS = 35  # base events span <35 days: replicas never collide
_TS_TICKS_PER_DAY = {"s": 86_400, "ms": 86_400_000, "us": 86_400_000_000, "ns": 86_400_000_000_000}

STUDY_TABLES = {
    "q1": ["lineitem"],
    "window_rank": ["orders"],
    "events_hourly": ["events"],
    "q3": ["customer", "orders", "lineitem"],
    "q3_bucketed": ["customer", "orders", "lineitem"],
    "dedup": ["documents"],
}
STUDY_QUERY = {
    "q1": "q1_pricing_agg",
    "window_rank": "window_rank_topk_per_customer",
    "events_hourly": "events_hourly_rollup",
    "q3": "q3_join3_topk",
    "q3_bucketed": "q3_join3_topk",  # oracle + unbucketed twin source
    "dedup": "doc_exact_dedup",
}
# q1 is the one study whose scaling mode is BIGGER groups, not more
# groups (its output is always the 4 returnflag/linestatus rows):
# replication just multiplies rows per group, which is exactly what the
# partial-aggregation path must absorb. dedup replicates documents with
# a per-replica text salt so duplicate-GROUP structure is preserved
# within each replica and no cross-replica dups appear.


# Pack replicas into files of roughly this many base-table bytes. A
# one-file-per-replica layout hands BOTH engines a file-count artifact
# at high scale factors (e.g. ×1000 of a 0.6 MB table = 1000 tiny
# files: Spark pays ~1 s of per-file open/task overhead that a REAL
# corpus — written at the 64–256 MB targets every production writer
# uses, including tables/manager.py's 128 MB — never exhibits). Each
# replica still lands as its own ROW GROUP, so per-replica structure
# (and the tests' replica-range assertions) are unchanged.
_TARGET_FILE_BYTES = 64 * 1024**2


def _replicate(table: str, scale: int, dest_dir: str, offsets: dict) -> None:
    """Write `scale` replicas of the base table, each with its key
    columns shifted by replica_index × (max_key + 1) so replicas are
    disjoint but referential integrity (customer↔orders↔lineitem, and
    per-replica group sizes) is preserved exactly. Replicas are packed
    into ~64 MB files (one row group per replica)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base_path = os.path.join(BASE_SF, f"{table}.parquet")
    base = pq.read_table(base_path)
    per_file = max(1, _TARGET_FILE_BYTES // max(1, os.path.getsize(base_path)))
    os.makedirs(dest_dir, exist_ok=True)
    writer = None
    file_no = 0
    for i in range(scale):
        cols = {}
        for name in base.schema.names:
            col = base.column(name)
            if name in offsets:
                kind, stride = offsets[name]
                if kind == "int":
                    col = pc.add(col, i * stride).cast(col.type)
                elif kind == "salt":
                    # per-replica text suffix: duplicate groups stay
                    # intact within a replica, never merge across them
                    col = pc.binary_join_element_wise(
                        col.cast(pa.string()), pa.scalar(f" repl{i:04d}"), ""
                    ).cast(base.schema.field(name).type)
                else:  # timestamp shift by `stride` DAYS, in the column's
                    # own tick unit (a fixed-unit constant silently shifts
                    # a timestamp[us] column ~1e3 too far), type preserved
                    ticks = stride * _TS_TICKS_PER_DAY[col.type.unit]
                    shifted = pc.add(col.cast(pa.int64()), i * ticks)
                    col = shifted.cast(col.type)
            cols[name] = col
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(dest_dir, f"part-{file_no:04d}.parquet"), base.schema
            )
        writer.write_table(pa.table(cols, schema=base.schema))
        if (i + 1) % per_file == 0:
            writer.close()
            writer = None
            file_no += 1
    if writer is not None:
        writer.close()


def build_dataset(study: str, scale: int) -> str:
    """Build (or reuse) the ×scale dataset dir; returns an sf_dir-shaped
    path usable by both sources.tables.load and the DuckDB views."""
    import pyarrow.parquet as pq

    sf_dir = os.path.join(ROOT, f"{'q3' if study == 'q3_bucketed' else study}_x{scale}")
    done = os.path.join(sf_dir, "_done")
    if os.path.exists(done):
        return sf_dir

    import pyarrow.compute as pc

    def mx(table, col):
        t = pq.read_table(os.path.join(BASE_SF, f"{table}.parquet"), columns=[col])
        return int(pc.max(t.column(col)).as_py()) + 1

    # key maxima read lazily: only the tables this study replicates are
    # touched (the q3 studies must not require events.parquet to exist)
    tables = STUDY_TABLES[study]
    o_off = mx("orders", "o_orderkey") if {"orders", "lineitem"} & set(tables) else 0
    c_off = mx("customer", "c_custkey") if {"orders", "customer"} & set(tables) else 0
    offsets = {
        "orders": {"o_orderkey": ("int", o_off), "o_custkey": ("int", c_off)},
        "customer": {"c_custkey": ("int", c_off)},
        "lineitem": {"l_orderkey": ("int", o_off)},
        "events": {
            "event_id": ("int", mx("events", "event_id") if "events" in tables else 0),
            "ts": ("ts", EVENT_TS_STRIDE_DAYS),
        },
        "documents": {
            "doc_id": (
                "int",
                mx("documents", "doc_id") if "documents" in tables else 0,
            ),
            "text": ("salt", None),
        },
    }
    for table in tables:
        _replicate(table, scale, os.path.join(sf_dir, f"{table}.parquet"), offsets[table])
    open(done, "w").close()
    return sf_dir


def _bucketed_q3(spark, sf_dir: str, scale: int):
    """The q3 shape over pre-bucketed orders/lineitem: both sides
    bucketBy(32, orderkey).sortBy(orderkey). Mirrors the registered
    query's r9 agg-below-join shape, where bucketing removes EVERY
    remaining exchange: the per-orderkey revenue pre-agg runs
    bucket-local (the scan's HashPartitioning(l_orderkey) already
    satisfies the agg's distribution), and the orderkey join reads
    both sides straight off their buckets; customer stays a plain
    broadcast dim. The bucketed write happens once per dataset
    (untimed prep — the layout investment bucketing is)."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.functions.exact import det_round, exact_sum8_bounded
    from empdia_iceberg_spark.operators.relational import _Q3_DATE
    from empdia_iceberg_spark.sources.tables import load

    warehouse = os.path.join(ROOT, "bucketed_warehouse")
    names = {t: f"scale_{t}_bkt_x{scale}" for t in ("orders", "lineitem")}
    for t, tbl in names.items():
        path = os.path.join(warehouse, tbl)
        if not spark.catalog.tableExists(tbl) or not os.path.isdir(path):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(path, ignore_errors=True)
            key = "o_orderkey" if t == "orders" else "l_orderkey"
            # repartition by the bucket column first (same Murmur3 hash
            # as bucketBy): each write task then holds exactly one
            # bucket's rows, so the table is 32 files, not
            # input-tasks × 32 tiny ones — the layout a production
            # bucketed write targets.
            (
                load(spark, sf_dir, t)
                .repartition(32, F.col(key))
                .write.format("parquet")
                .bucketBy(32, key)
                .sortBy(key)
                .option("path", path)
                .saveAsTable(tbl)
            )
    orders = spark.table(names["orders"]).filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    li = spark.table(names["lineitem"]).filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    li_rev = li.groupBy("l_orderkey").agg(
        det_round(
            exact_sum8_bounded(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            2,
        ).alias("revenue")
    )
    # identical join order to the registered q3: orders semi-reduced by
    # the broadcast customer dim FIRST, then the orderkey join
    orders_b = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        li_rev.join(orders_b, li_rev.l_orderkey == orders_b.o_orderkey)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = lambda v: round(v, 9) if isinstance(v, float) and not math.isnan(v) else v  # noqa: E731
    return sorted([tuple(norm(r[i]) for i in order) for r in rows], key=repr)


def run_study(spark, study: str, scale: int, reps: int, check: bool) -> dict:
    import duckdb

    from empdia_iceberg_spark import registry

    sf_dir = build_dataset(study, scale)
    qname = STUDY_QUERY[study]
    spec = registry.specs()[qname]

    def spark_df():
        if study == "q3_bucketed":
            return _bucketed_q3(spark, sf_dir, scale)
        return spec.fn(spark, sf_dir)

    spark_df().toPandas()  # warm: listing, codegen, JIT, bucketed prep
    s_best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        pdf = spark_df().toPandas()  # fresh plan every run (bench.py rule)
        s_best = min(s_best, time.perf_counter() - t0)

    d_best = None
    con = duckdb.connect()
    for t in STUDY_TABLES[study]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    if study != "q3_bucketed":  # bucketing has no DuckDB TIMING twin
        con.execute(spec.oracle).fetchall()  # warm OS page cache
        d_best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            orows = con.execute(spec.oracle).fetchall()
            d_best = min(d_best, time.perf_counter() - t0)
    if check:
        # the VALUE check runs for every study — including q3_bucketed,
        # whose rows must equal the plain q3 oracle on the same files
        # (the bucketed layout may not change the answer)
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        srows = [tuple(r) for r in pdf.itertuples(index=False)]
        ok = len(srows) == len(orows) and _canon(srows, list(pdf.columns)) == _canon(
            orows, ocols
        )
        assert ok, f"{study} x{scale}: Spark/oracle mismatch on scaled data"
    con.close()

    return {
        "study": study,
        "scale": scale,
        "rows": len(pdf),
        "spark_sec": round(s_best, 3),
        "duckdb_sec": round(d_best, 3) if d_best is not None else None,
        "ratio": round(s_best / d_best, 2) if d_best else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("studies", nargs="+", choices=list(STUDY_TABLES))
    ap.add_argument("--scales", default="10,30,100")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check", action="store_true", help="value-compare Spark vs oracle on the scaled data")
    args = ap.parse_args()

    from empdia_iceberg_spark.session import get_spark

    spark = get_spark(app_name="scaling-study")
    for study in args.studies:
        for scale in [int(s) for s in args.scales.split(",")]:
            r = run_study(spark, study, scale, args.reps, args.check)
            print(
                f"| {r['study']} | x{r['scale']} | {r['spark_sec']} s | "
                f"{r['duckdb_sec']} s | {r['ratio']}x | rows={r['rows']} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
