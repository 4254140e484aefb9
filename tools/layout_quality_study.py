"""Hilbert-vs-Morton clustering quality study (VERDICT r10 ask #3).

`table_hilbert_layout`'s docstring claims Hilbert keeps file envelopes
tighter than Morton under skew; until r11 nothing quantified it. This
tool measures BOTH curves (plus a single-dim sort for context) on the
same ×k orders data with the engine's real layout machinery
(`operators.layout.curve_envelopes` — bucketed global ordering, ntile
file buckets, per-bucket min/max envelopes) and reports:

  - envelope area: Σ_buckets (Δx+1)·(Δy+1) / (G²·B) — the fraction of
    the key domain a bucket's envelope covers on average (lower =
    tighter clustering = fewer false-positive file reads);
  - skip rate: the fraction of file buckets a selective 2-D probe can
    PRUNE by envelope intersection, averaged over a 512-probe workload
    whose x-centers follow the DATA density (probes go where data
    lives), at two probe widths (point-ish G/4096 and range G/128).

Dimensions: x = o_custkey rebased (optionally SKEWED by the exact
integer map x² DIV X, which crowds density toward 0 — a power-law-ish
distribution), y = o_orderdate days rebased; both quantized to the
common 2²¹ grid with exact integer arithmetic so the DuckDB `--check`
twin (morton_sql / hilbert_sql_ctes + ntile over a plain window) is
value-identical, proving the measured envelopes come from correct
curve keys, not a drifted reimplementation.

Usage:
  python tools/layout_quality_study.py --scales 10,100 --check
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_study import _canon, build_dataset  # noqa: E402

GRID_BITS = 21
G = 1 << GRID_BITS
N_BUCKETS = 64  # file buckets: a sharper ruler than the queries' 16
N_PROBES = 512
SEED = 7


def _grid_frame(spark, sf_dir: str, skewed: bool):
    """(o_orderkey, xg, yg) on the 2^21 grid, plus the ints the oracle
    twin needs to reproduce the exact same integer arithmetic."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.sources.tables import load

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "odays"
        ),
    )
    lim = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("odays"), F.max("odays")
    ).first()
    mck, xspan = int(lim[0]), int(lim[1]) - int(lim[0]) + 1
    mod, yspan = int(lim[2]), int(lim[3]) - int(lim[2]) + 1
    x0 = f"(CAST(o_custkey AS BIGINT) - {mck})"
    xs = f"(({x0} * {x0}) DIV {xspan})" if skewed else x0
    base = orders.select(
        "o_orderkey",
        F.expr(f"({xs} * {G - 1}) DIV {xspan}").alias("xg"),
        F.expr(f"((CAST(odays AS BIGINT) - {mod}) * {G - 1}) DIV {yspan}").alias("yg"),
    )
    return base, {"mck": mck, "xspan": xspan, "mod": mod, "yspan": yspan}


def _oracle_sql(curve: str, skewed: bool, lims: dict) -> str:
    from empdia_iceberg_spark.operators.layout import hilbert_sql_ctes, morton_sql

    mck, xspan = lims["mck"], lims["xspan"]
    mod, yspan = lims["mod"], lims["yspan"]
    x0 = f"(CAST(o_custkey AS BIGINT) - {mck})"
    xs = f"(({x0} * {x0}) // {xspan})" if skewed else x0
    grid = f"""
    base AS (
        SELECT o_orderkey, o_custkey,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS odays
        FROM orders
    ),
    g AS (
        SELECT o_orderkey,
               ({xs} * {G - 1}) // {xspan} AS xg,
               ((CAST(odays AS BIGINT) - {mod}) * {G - 1}) // {yspan} AS yg
        FROM base
    )"""
    if curve == "hilbert":
        ctes, last = hilbert_sql_ctes("xg", "yg", GRID_BITS, "g")
        keyed = f"{grid},\n{ctes},\nkeyed AS (SELECT o_orderkey, xg, yg, _hd AS z FROM {last})"
    elif curve == "morton":
        keyed = f"{grid},\nkeyed AS (SELECT o_orderkey, xg, yg, {morton_sql('xg', 'yg', GRID_BITS)} AS z FROM g)"
    else:  # xsort: single-dimension sort baseline
        keyed = f"{grid},\nkeyed AS (SELECT o_orderkey, xg, yg, xg AS z FROM g)"
    return f"""
    WITH {keyed},
    tiled AS (
        SELECT *, ntile({N_BUCKETS}) OVER (ORDER BY z, o_orderkey) AS file_bucket
        FROM keyed
    )
    SELECT CAST(file_bucket AS INT) AS file_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(xg) AS BIGINT) AS min_x, CAST(max(xg) AS BIGINT) AS max_x,
           CAST(min(yg) AS BIGINT) AS min_y, CAST(max(yg) AS BIGINT) AS max_y
    FROM tiled GROUP BY file_bucket ORDER BY file_bucket
    """


def _envelopes(spark, base, curve: str):
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.layout import (
        curve_envelopes,
        hilbert_spark,
        morton_spark,
    )

    key_of = {
        "morton": lambda x, y: morton_spark(x, y, GRID_BITS),
        "hilbert": lambda x, y: hilbert_spark(x, y, GRID_BITS),
        "xsort": lambda x, y: x,
    }[curve]
    keyed = base.withColumn("z", key_of(F.col("xg"), F.col("yg"))).persist()
    env = (
        curve_envelopes(keyed, "z", "xg", "yg", N_BUCKETS, ("o_orderkey",))
        .orderBy("file_bucket")
        .collect()
    )
    keyed.unpersist()
    return env


def _metrics(env_rows, skewed: bool) -> dict:
    lo_x = np.array([r.min_x for r in env_rows], dtype=np.int64)
    hi_x = np.array([r.max_x for r in env_rows], dtype=np.int64)
    lo_y = np.array([r.min_y for r in env_rows], dtype=np.int64)
    hi_y = np.array([r.max_y for r in env_rows], dtype=np.int64)
    b = len(env_rows)
    area = float(((hi_x - lo_x + 1.0) * (hi_y - lo_y + 1.0)).sum() / (float(G) * G * b))

    rng = np.random.default_rng(SEED)
    u = rng.random(N_PROBES)
    # probe x-centers follow the DATA density: under the x² DIV X skew a
    # near-uniform raw dim lands at u²·G on the grid
    xc = ((u * u if skewed else u) * G).astype(np.int64)
    yc = (rng.random(N_PROBES) * G).astype(np.int64)
    out = {"env_area": area}
    for label, w in (("skip_point", G // 4096), ("skip_range", G // 128)):
        plo_x, phi_x = xc - w // 2, xc + w // 2
        plo_y, phi_y = yc - w // 2, yc + w // 2
        touched = (
            (lo_x[None, :] <= phi_x[:, None])
            & (hi_x[None, :] >= plo_x[:, None])
            & (lo_y[None, :] <= phi_y[:, None])
            & (hi_y[None, :] >= plo_y[:, None])
        )
        out[label] = float(1.0 - touched.sum(axis=1).mean() / b)
    # y-ONLY predicates (x unconstrained): the case a single-dim x-sort
    # cannot prune at all — the reason multi-dim curves exist
    w = G // 128
    plo_y, phi_y = yc - w // 2, yc + w // 2
    touched = (lo_y[None, :] <= phi_y[:, None]) & (hi_y[None, :] >= plo_y[:, None])
    out["skip_yonly"] = float(1.0 - touched.sum(axis=1).mean() / b)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10,100")
    ap.add_argument("--check", action="store_true",
                    help="value-compare every envelope table vs its DuckDB twin")
    args = ap.parse_args()

    import duckdb

    from empdia_iceberg_spark.session import get_spark

    spark = get_spark(app_name="layout-quality-study")
    print("| scale | dims | curve | env_area | skip@G/4096 | skip@G/128 | skip@y-only | checked |")
    print("|---|---|---|---|---|---|---|---|")
    for scale in [int(s) for s in args.scales.split(",")]:
        sf_dir = build_dataset("window_rank", scale)  # orders ×k
        for skewed in (False, True):
            base, lims = _grid_frame(spark, sf_dir, skewed)
            for curve in ("morton", "hilbert", "xsort"):
                env = _envelopes(spark, base, curve)
                checked = ""
                if args.check:
                    con = duckdb.connect()
                    con.execute(
                        "CREATE VIEW orders AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
                    )
                    res = con.execute(_oracle_sql(curve, skewed, lims))
                    ocols = [d[0] for d in res.description]
                    orows = res.fetchall()
                    cols = ["file_bucket", "n_rows", "min_x", "max_x", "min_y", "max_y"]
                    srows = [tuple(r) for r in env]
                    ok = len(srows) == len(orows) and _canon(srows, cols) == _canon(
                        orows, ocols
                    )
                    con.close()
                    assert ok, f"{curve} skewed={skewed} x{scale}: envelope mismatch vs oracle"
                    checked = "value-ok"
                m = _metrics(env, skewed)
                print(
                    f"| x{scale} | {'skewed' if skewed else 'uniform'} | {curve} "
                    f"| {m['env_area']:.4f} | {m['skip_point']:.4f} "
                    f"| {m['skip_range']:.4f} | {m['skip_yonly']:.4f} | {checked} |",
                    flush=True,
                )


if __name__ == "__main__":
    main()
