"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>}

Methodology (BASELINE.md): Spark session startup excluded; each query
warmed once (file listing, codegen cache, JIT), then timed best-of-3
where every timed run REBUILDS the DataFrame from the query function
and materializes it to the driver via Arrow (`toPandas`) — the analog
of the DuckDB baseline re-running `execute().fetchall()`.

Fixed in r7: earlier rounds timed repeated `toPandas()` on ONE
DataFrame object. Spark keeps the materialized shuffle map outputs
(and AQE's finalized stages) alive on the plan's lineage, so a re-
collect of the same object re-runs only the stages PAST the last
shuffle — for most queries that is the final coalesced stage, ~30 ms
regardless of data volume. Those numbers measured the Arrow fetch, not
the query. Rebuilding the plan per run executes every stage, the way a
user issuing the query would. The `overhead_sec` anchor below is
measured the same fresh-plan way for fair netting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_agg",
    "q3_join3_topk",
    "q5_region_revenue",
    "window_rank_topk_per_customer",
    "events_hourly_rollup",
    "reward_trajectory",
    "termination_flags",
    "doc_exact_dedup",
    "knn_cosine_top5",
    "doc_minhash_near_dup",
    "doc_tfidf_top_terms",
    "doc_dedup_clusters",
    "doc_decontaminate",
    "curation_pipeline",
    "semantic_prune_clusters",
    "events_sessionize_8h",
    "doc_span_dedup",
    "events_anomaly_zscore",
    "table_zorder_layout",
    "user_profile_similarity",
    "doc_lm_perplexity",
    "pagerank_trading_graph",
    "doc_bm25_search",
    "events_survival_km",
    "orders_open_peak_monthly",
    "mannwhitney_u_segments",
    "stream_tumbling_hourly",
    "table_merge_upsert",
    "table_merge_pruned",
    # round-4 late additions: trained-model, recommender, time-series,
    # sliding-distinct, and custom-source shapes
    "nb_lang_confusion",
    "item_item_similar_parts",
    "daily_acf_value",
    "events_rolling_wau",
    "pyds_synthetic_rollup",
    # r11 late additions — NEW in BENCH_r11, so the cross-round
    # comparable number is the sum over the queries shared with r10:
    # streaming CDC apply (3 availableNow phases + 2 pruned MERGE
    # commits per call) and the BY SOURCE full-sync MERGE
    "stream_cdc_apply",
    "table_merge_sync_dml",
    # r12 late additions — NEW in BENCH_r12 (cross-round comparable number
    # is the sum over queries shared with r11): the ALTER COLUMN TYPE
    # metadata-only promotion story and the governance statement bundle
    # (TBLPROPERTIES + CHECK-constraint enforcement + CALL expire)
    "table_alter_type_sql",
    "table_governance_sql",
    # r13 late additions — NEW in BENCH_r13 (cross-round comparable number
    # is the sum over queries shared with r12): the CDC read TVF story
    # (4 table eras + the pruned per-commit change scan) and the native
    # streaming sink medallion (2 availableNow drains through
    # snapshot_tail -> snapshot_write with batch-id-stamped commits)
    "table_changes_sql",
    "stream_native_sink_medallion",
    # r14 late additions — NEW in BENCH_r14 (cross-round comparable number
    # is the sum over queries shared with r13): hidden partitioning
    # (CTAS PARTITIONED BY days/bucket + one-day pruned read + one-day
    # dynamic overwrite) and the CDC-mode streaming tail (two availableNow
    # drains of a create→append→MERGE→DELETE lineage + the batch-changes
    # equality probe)
    "table_partition_transforms_sql",
    "stream_cdc_tail",
    # r15 late addition — NEW in BENCH_r15 (cross-round comparable number
    # is the sum over queries shared with r14): partition pruning on the
    # PLAIN SQL read path (CTAS + INSERT build, then a one-day statement,
    # a BETWEEN range statement, and a declined non-partition statement,
    # each with Catalyst-proven scoping and dirs-pruned audits)
    "table_sql_pruned_read",
]

# r7: no per-query special-casing remains. Every timed run is the
# whole call — query-function invocation (which for streaming drains,
# MERGE commits, and iterative checkpointed operators IS where the work
# happens) plus the Arrow collect. The former SIDE_EFFECT set existed
# only because non-side-effect queries were timed by re-collecting a
# prebuilt DataFrame; see the methodology note above.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from empdia_iceberg_spark import registry
    from empdia_iceberg_spark.session import get_spark
    import empdia_iceberg_spark  # noqa: F401

    spark = get_spark(app_name="empdia-bench")
    qs = registry.queries()

    from pyspark.sql import functions as F

    def _floor_df():
        return spark.range(1000).groupBy((F.col("id") % 8).alias("k")).count()

    def _anchor_once() -> float:
        t0 = time.perf_counter()
        _floor_df().toPandas()
        return time.perf_counter() - t0

    # Per-query stall guard (VERDICT r15 ask #2, additions-only): the
    # r15 c32 window recorded fixed-work micro-anchor readings 2.7x the
    # r14 run's — whole multi-second host stalls landed inside query
    # windows and the record could not separate them from plans. The
    # micro anchor is read once at run start and once after EACH
    # query's best-of-3; a post-query reading > 2x the run-start floor
    # marks that window stall-contaminated and the query is re-run
    # (one more best-of-3, min over all runs — same fresh-plan
    # methodology). Both the per-query readings and the re-run events
    # are emitted in BENCH_DETAIL.json; the contract line is unchanged.
    _floor_df().toPandas()  # warm the anchor path (codegen, JIT)
    anchor0 = min(_anchor_once() for _ in range(2))
    query_anchor: dict[str, float] = {}
    stall_reruns: dict[str, dict] = {}

    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        if name not in qs:
            skipped.append(name)  # explicit: missing coverage, not omitted silently
            continue
        qs[name](spark, sf_dir).toPandas()  # warm-up (listing, codegen, JIT)
        best = float("inf")
        # Full best-of-3 for EVERY query, multi-second ones included
        # (VERDICT r8 ask #2): r8 showed iterative multi-job chains
        # (pagerank: 10 jobs) amplify scheduler jitter the most, so the
        # longest queries need the min-of-N discipline more, not less —
        # the old best-of-2 shortcut for >=2 s queries traded exactly
        # the wrong measurements for wall time.
        for i in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).toPandas()  # fresh plan, every stage runs
            best = min(best, time.perf_counter() - t0)
        a_q = _anchor_once()
        query_anchor[name] = round(a_q, 4)
        # self-correcting floor: if the RUN-START probes themselves hit
        # a stall, the first clean per-query reading ratchets the floor
        # down so the guard is not silently disabled for the whole run
        # (queries before the first clean reading are the only blind
        # spot, and their inflated anchor readings are on record).
        # Absolute damping term: an exceptionally clean run-start floor
        # (~0.10 s observed) would otherwise make ordinary ±0.1 s micro
        # jitter fire re-runs on a quarter of the queries — the guard
        # targets the r15-style multi-second stalls (micro readings
        # 0.45 s+), not scheduler noise.
        stalled = a_q > max(2 * anchor0, anchor0 + 0.2)
        anchor0 = min(anchor0, a_q)
        if stalled:
            first_best = best
            for i in range(3):  # stall-contaminated window: re-run once
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            stall_reruns[name] = {
                "anchor_sec": round(a_q, 4),
                "anchor_run_start_sec": round(anchor0, 4),
                "first_window_sec": round(first_best, 4),
                "rerun_sec": round(best, 4),
            }
        timings[name] = round(best, 4)

    # Fixed per-query overhead: a trivial two-stage shuffle, REBUILT per
    # run like the real queries (a reused plan would skip its shuffle
    # stage and report only the Arrow fetch — the r7 methodology fix).
    # Every timed query pays at least this plan + AQE + scheduler +
    # collect floor regardless of data volume — at sf0.1 it dominates
    # the smallest queries (doc_exact_dedup's whole answer is 8 rows),
    # while at cluster scale it vanishes into real work. Reported so
    # tiny-SF ratios vs the in-process DuckDB baseline can be read
    # fairly. (_floor_df defined above — it doubles as the per-query
    # stall guard's fixed-work probe.)
    _floor_df().toPandas()  # warm-up
    overhead = float("inf")
    anchor_runs: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        _floor_df().toPandas()
        dt = time.perf_counter() - t0  # one reading: runs_sec and the
        # min must agree exactly — an attestation record that disagrees
        # with itself at the 4th decimal invites the doubt it exists
        # to remove
        anchor_runs.append(round(dt, 4))
        overhead = min(overhead, dt)

    # Attestation record (VERDICT r8 ask #2): BENCH_r08 drifted +13-15%
    # across the board INCLUDING this fixed-work anchor and untouched
    # code, and nothing in the bench line let a reader separate machine
    # load from engine regression. The anchor is fixed work, so its
    # ratio against the r7 idle-machine reference IS the machine-load
    # factor of this run; round-over-round per-query deltas within
    # ~that ratio are drift, not engine change. All three anchor runs
    # are persisted so a noisy run is visible as spread, not hidden by
    # the min.
    ANCHOR_REF_SEC = 0.116  # BENCH_r07, attested idle machine
    anchor = {
        "runs_sec": anchor_runs,
        "ref_sec": ANCHOR_REF_SEC,
        "ratio_vs_ref": round(overhead / ANCHOR_REF_SEC, 3),
    }

    # MID-SIZE anchor (VERDICT r13 what's-wrong #2 / round-14 ask #2):
    # the ~0.1 s micro-anchor's round-over-round swing (r12→r13:
    # 1.152→0.915, ±26%) EXCEEDED every per-query move it was supposed
    # to normalize — anchor-adjusted sums moved +19% while raw moved
    # −5.6%, and the record could not say which was real. This anchor is
    # ~1.5 s of pure JVM compute (no I/O, no Python): a 64-partition
    # range with integer mixing through a two-level aggregate, sized so
    # scheduler jitter and page-cache state are <2% of its wall. Its
    # ratio_vs_ref is the machine-load factor used for
    # queries_adjusted; the micro anchor stays as the plan/schedule
    # FLOOR record (they measure different things — r10 showed floor
    # and bulk throughput can anti-correlate).
    def _mid_anchor_df():
        # xxhash64 mixing (overflow-safe under ANSI mode); pmod bounds
        # the summed values so the bigint aggregate cannot overflow
        x = F.xxhash64(F.col("id"))
        return (
            spark.range(0, 200_000_000, 1, 64)
            .select(
                F.pmod(x, F.lit(1024)).alias("g"),
                F.pmod(x, F.lit(1_000_000_007)).alias("v"),
            )
            .groupBy("g")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy()
            .agg(F.sum("s").alias("sum_s"), F.sum("n").alias("sum_n"))
        )

    _mid_anchor_df().toPandas()  # warm-up (codegen, JIT)
    mid_best = float("inf")
    mid_runs: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        _mid_anchor_df().toPandas()  # fresh plan, every stage runs
        dt = time.perf_counter() - t0
        mid_runs.append(round(dt, 4))
        mid_best = min(mid_best, dt)
    MID_ANCHOR_REF_SEC = 1.17  # pinned r14: idle-machine best-of-3 across two sessions (1.149, 1.205)
    anchor_mid = {
        "runs_sec": mid_runs,
        "ref_sec": MID_ANCHOR_REF_SEC,
        "ratio_vs_ref": round(mid_best / MID_ANCHOR_REF_SEC, 3),
    }

    # Fixed STREAMING overhead (VERDICT r6 #2): the probe is the REAL
    # stream_tumbling_hourly query function, run against a 2-row events
    # file that preserves the production file's TIMESTAMP(NANOS) quirk —
    # the identical code path (schema read, nanos conversion, watermark,
    # stateful agg, memory sink, processAllAvailable drain, sink read +
    # sort + Arrow collect), identical file count, identical micro-batch
    # cadence. The only difference from the timed query is data volume,
    # so real − probe is exactly the data-dependent part. Per-micro-batch
    # StreamingQueryProgress durations for BOTH runs are emitted below
    # (stream_breakdown) so the state-store lifecycle constant — commit
    # cost across all state-store instances, paid per batch regardless
    # of rows — is separable from data work in the record itself.
    import shutil
    import uuid

    def _batches(prog: list[dict]) -> list[dict]:
        out = []
        for p in prog:
            so = (p.get("stateOperators") or [{}])[0]
            out.append(
                {
                    "batch": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
                    "add_batch_ms": p.get("durationMs", {}).get("addBatch"),
                    # summed across all state-store instances (32 here) —
                    # per-batch lifecycle, independent of input rows
                    "state_commit_ms_sum": so.get("commitTimeMs"),
                    "state_update_ms_sum": so.get("allUpdatesTimeMs"),
                }
            )
        return out

    from empdia_iceberg_spark.streaming import windows as _sw

    real_stream_batches = _batches(_sw.LAST_RUN_PROGRESS.get("t_tumbling", []))

    stream_overhead: float | None = float("inf")
    probe_batches: list[dict] = []
    from empdia_iceberg_spark.streaming.windows import work_root

    stream_root = work_root()
    probe_root = os.path.join(stream_root, f"bench_probe_{uuid.uuid4().hex[:8]}")
    try:
        import pyarrow.parquet as pq

        os.makedirs(probe_root, exist_ok=True)
        # first 2 rows of the real file, schema preserved bit-for-bit
        # (pyarrow keeps timestamp[ns], which Spark's reader maps through
        # the same nanosAsLong branch the real feed takes)
        pq.write_table(
            pq.read_table(os.path.join(sf_dir, "events.parquet")).slice(0, 2),
            os.path.join(probe_root, "events.parquet"),
        )
        qs["stream_tumbling_hourly"](spark, probe_root).toPandas()  # warm
        for _ in range(3):
            t0 = time.perf_counter()
            qs["stream_tumbling_hourly"](spark, probe_root).toPandas()
            stream_overhead = min(stream_overhead, time.perf_counter() - t0)
        probe_batches = _batches(_sw.LAST_RUN_PROGRESS.get("t_tumbling", []))
    except Exception:
        # probe must never kill the bench line; None serializes as JSON
        # null (NaN would make the whole output line invalid JSON)
        stream_overhead = None
    finally:
        shutil.rmtree(probe_root, ignore_errors=True)

    stream_breakdown: dict = {
        "real": real_stream_batches,
        "probe_2rows": probe_batches,
    }
    if (
        stream_overhead is not None
        and "stream_tumbling_hourly" in timings
        and real_stream_batches
        and probe_batches
        and real_stream_batches[0]["trigger_ms"] is not None
        and probe_batches[0]["trigger_ms"] is not None
    ):
        stream_breakdown["netted_wall_sec"] = round(
            timings["stream_tumbling_hourly"] - stream_overhead, 4
        )
        stream_breakdown["netted_trigger_ms"] = (
            real_stream_batches[0]["trigger_ms"] - probe_batches[0]["trigger_ms"]
        )

    # ANN quality next to ANN speed: recall@5 of the approximate paths vs
    # the exact brute-force answer, so the approximate/exact tradeoff is
    # auditable from the bench line alone (VERDICT r3 item 6). r11: the
    # probe now folds the FULL-CORPUS recall-audit histograms (every
    # query), not the first-100-display-rows prefix the pre-r11 probe
    # intersected — the prefix overstated recall (first rows = smallest
    # query ids, which seed the IVF centroids and so probe their own
    # cells). Cross-round note: r10 and earlier recall_at_5 values are
    # prefix-scoped and NOT comparable to these.
    # scope note: full-corpus audit histograms; pre-r11 rounds measured a
    # 100-row display prefix and are NOT comparable (see r11 bench note).
    recall: dict = {"scope": "full-corpus"}
    try:
        from empdia_iceberg_spark.operators.similarity import TOP_K

        for approx_name, audit_name in (
            ("knn_cosine_lsh", "knn_lsh_recall_audit"),
            ("knn_cosine_ivf", "knn_ivf_recall_audit"),
        ):
            hist = qs[audit_name](spark, sf_dir).toPandas()
            n_q = int(hist["n_queries"].sum())
            hits = int((hist["n_hit"] * hist["n_queries"]).sum())
            recall[approx_name] = round(hits / (TOP_K * n_q), 4)
    except Exception as exc:  # never let the quality probe kill the bench line
        recall = {"error": str(exc)[:200]}

    # Cross-round adjudication (VERDICT r10 ask #5): r10's
    # doc_tfidf_top_terms moved +40% raw on untouched code while the
    # anchor swung 0.926→0.67, and nothing in the record let a reader
    # separate machine from engine. Two fields fix that: (1)
    # queries_adjusted divides every wall time by this run's anchor
    # ratio — context for cross-round reading, NOT the flag: the anchor
    # measures only the fixed plan/schedule floor, and the r10→r11 pair
    # shows floor and bulk throughput can ANTI-correlate (r10: anchor
    # 0.67 yet raw walls ~25% higher across the board), so dividing
    # whole walls by it over-corrects; (2) any query whose RAW time
    # moved >25% vs the latest committed BENCH_r*.json is re-timed in
    # THIS process (best-of-2, fresh plans) — a reading that does not
    # reproduce within 15% is marked transient (scheduler/page-cache
    # blip), one that does is a real move on this machine this round.
    # r14: queries_adjusted now divides by the MID anchor's ratio — the
    # micro anchor's own noise exceeded the moves it normalized (VERDICT
    # r13 #2). The micro ratio is still recorded above as the floor.
    ratio = anchor_mid["ratio_vs_ref"] or 1.0
    queries_adjusted = {q: round(v / ratio, 4) for q, v in timings.items()}
    adjudication: dict = {}
    try:
        import glob
        import re

        repo = os.path.dirname(os.path.abspath(__file__))
        prior_files = sorted(
            glob.glob(os.path.join(repo, "BENCH_r*.json")),
            key=lambda f: int(re.search(r"_r(\d+)", os.path.basename(f)).group(1)),
        )
        prior_line = None
        # Walk newest-first until a file with a parseable final line is
        # found: BENCH_r11's tail starts mid-line (the ~3k-char r11 line
        # overflowed the driver's 2,000-char capture window, VERDICT r11
        # what's-wrong #1), so the latest PARSEABLE record is the right
        # comparison base, not simply the latest file.
        for pf in reversed(prior_files):
            try:
                blob = json.load(open(pf))
            except (OSError, json.JSONDecodeError):
                continue
            tail = blob.get("tail", "")
            at = tail.rfind('{"metric"')
            if at >= 0:
                try:
                    prior_line = json.loads(tail[at:])
                    break
                except json.JSONDecodeError:
                    continue
        if prior_line:
            # prior round's adjusted ruler: its mid anchor when recorded
            # (r14+), else its micro anchor (r13 and earlier recorded
            # only the micro ratio — a cross-ruler comparison, flagged
            # in the entry so the reader can discount it)
            p_mid = (prior_line.get("anchor_mid") or {}).get("ratio_vs_ref")
            p_micro = (prior_line.get("anchor") or {}).get("ratio_vs_ref")
            p_ratio = p_mid or p_micro or 1.0
            p_q = prior_line.get("queries", {})
            for q, now_adj in queries_adjusted.items():
                if q not in p_q:
                    continue  # new query this round: nothing to adjudicate
                prior_adj = p_q[q] / p_ratio
                move = timings[q] / p_q[q] if p_q[q] else 1.0
                adj_move = now_adj / prior_adj if prior_adj else 1.0
                # SYMMETRIC trigger (VERDICT r13 ask #2): raw move >±25%
                # OR anchor-adjusted move >±15%, improvements AND
                # regressions alike — r13's record rechecked only the six
                # largest raw improvements while 26 adjusted regressions
                # went unexamined.
                if 0.8 <= move <= 1.25 and 1 / 1.15 <= adj_move <= 1.15:
                    continue
                best = float("inf")
                for _ in range(2):  # interleaved re-check, fresh plans
                    t0 = time.perf_counter()
                    qs[q](spark, sf_dir).toPandas()
                    best = min(best, time.perf_counter() - t0)
                reproduced = abs(best - timings[q]) <= 0.15 * timings[q]
                adjudication[q] = {
                    "prior_raw": p_q[q],
                    "prior_adjusted": round(prior_adj, 4),
                    "prior_ruler": "mid" if p_mid else "micro",
                    "raw": timings[q],
                    "adjusted": now_adj,
                    "move": round(move, 3),
                    "adj_move": round(adj_move, 3),
                    "recheck_sec": round(best, 4),
                    "verdict": "reproduced" if reproduced else "transient",
                }
    except Exception as exc:  # adjudication must never kill the bench line
        adjudication = {"error": str(exc)[:200]}

    # ---- emission (VERDICT r11 what's-wrong #1 / ask #1) -------------
    # The driver captures a 2,000-char stdout TAIL and parses the final
    # JSON line. r11's line grew to ~3k chars (queries_adjusted +
    # adjudication) and the capture window started mid-line, so the
    # round's official record carried no per-query data. The contract
    # line is now minimal and budget-guarded; the adjudication /
    # adjusted-timings / streaming-breakdown detail goes to (a) an
    # EARLIER stdout line (may be truncated in the tail — that's fine)
    # and (b) a committed sidecar file BENCH_DETAIL.json.
    detail = {
        "queries_adjusted": queries_adjusted,
        "adjudication": adjudication,
        "stream_breakdown": stream_breakdown,
        "anchor": anchor,
        "anchor_mid": anchor_mid,
        # per-query stall guard (r16): the micro-anchor reading taken
        # right after each query's window, the run-start floor it is
        # judged against, and any stall-triggered re-runs
        "anchor_run_start_sec": round(anchor0, 4),
        "query_anchor": query_anchor,
        "stall_reruns": stall_reruns,
        "queries": timings,
        "sf": sf,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # sidecar is best-effort; the stdout detail line still goes out
    print(json.dumps({"detail": detail}, separators=(",", ":")))

    out = {
        "metric": "headline-queries total wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {q: round(v, 3) for q, v in timings.items()},
        "overhead_sec": round(overhead, 3),
        "anchor": {
            "runs_sec": [round(r, 3) for r in anchor["runs_sec"]],
            "ref_sec": ANCHOR_REF_SEC,
            "ratio_vs_ref": anchor["ratio_vs_ref"],
        },
        "anchor_mid": {
            "runs_sec": [round(r, 3) for r in anchor_mid["runs_sec"]],
            "ref_sec": MID_ANCHOR_REF_SEC,
            "ratio_vs_ref": anchor_mid["ratio_vs_ref"],
        },
        "stream_overhead_sec": (
            round(stream_overhead, 3) if stream_overhead is not None else None
        ),
        "recall_at_5": recall,
        "skipped": skipped,
        "sf": sf,
    }
    print(final_line(out))


LINE_BUDGET = 1900  # driver tail capture is 2,000 chars; leave newline headroom


def final_line(out: dict) -> str:
    """Serialize the one-line bench contract, guaranteed under LINE_BUDGET.

    Sheds the most-droppable fields first if a future headline-list
    growth pushes the compact line over budget — per-query timings are
    the contract and are never dropped (they shrink to 2 decimals as the
    last step before the hard assert)."""
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > LINE_BUDGET and "skipped" in out and not out["skipped"]:
        out = {k: v for k, v in out.items() if k != "skipped"}
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > LINE_BUDGET and isinstance(out.get("anchor"), dict):
        out = dict(out, anchor={"ratio_vs_ref": out["anchor"]["ratio_vs_ref"]})
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > LINE_BUDGET and isinstance(out.get("anchor_mid"), dict):
        # the mid ratio is the load factor queries_adjusted used — it is
        # the last anchor field to shed, and only down to ratio-only
        out = dict(out, anchor_mid={"ratio_vs_ref": out["anchor_mid"]["ratio_vs_ref"]})
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > LINE_BUDGET:
        out = dict(out, queries={q: round(v, 2) for q, v in out["queries"].items()})
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > LINE_BUDGET and "anchor" in out:
        # the micro anchor is the most shed-able record: BENCH_DETAIL.json
        # carries it in full, and the mid anchor (kept above) is the
        # ruler queries_adjusted actually uses (r14)
        out = {k: v for k, v in out.items() if k != "anchor"}
        line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= LINE_BUDGET, (
        f"bench contract line is {len(line)} chars (> {LINE_BUDGET}): trim the "
        "HEADLINE list's serialized footprint or move a field to BENCH_DETAIL"
    )
    return line


if __name__ == "__main__":
    main()
