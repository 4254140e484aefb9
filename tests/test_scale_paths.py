"""Tests for the scale-path operators: bucketed co-located join plan,
IVF/LSH ANN recall, approx-percentile error bound."""

from __future__ import annotations

import os

import numpy as np

from empdia_iceberg_spark.operators.bucketing import bucketed_orders_customer
from empdia_iceberg_spark.operators import relational, similarity
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed+sorted by the join key ⇒ the SMJ plan must
    contain no Exchange and no explicit Sort stage for the join."""
    joined = bucketed_orders_customer(spark, SF_DIR)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def _exact_top1(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    order = np.argsort(ids)
    ids = ids[order]
    m = np.array([r.embedding for r in emb], dtype=np.float64)[order]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    return ids, sims


def test_ivf_recall_reasonable(spark):
    """IVF with nprobe=4/16 cells should recover most true top-1
    neighbors on this data; assert a conservative floor + structure."""
    ids, sims = _exact_top1(spark)
    true_top1 = {int(ids[i]): int(ids[int(np.argmax(sims[i]))]) for i in range(len(ids))}
    rows = similarity.knn_cosine_ivf(spark, SF_DIR).collect()
    assert rows
    got_top1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    hits = sum(1 for q, n in got_top1.items() if true_top1[q] == n)
    assert hits / len(got_top1) >= 0.5  # conservative floor for nprobe=4/16
    for r in rows:
        assert 1 <= r.rank <= similarity.TOP_K


def test_knn_index_size_guard(spark, tmp_path, monkeypatch):
    """The broadcast-index kNN must fail fast (driver-side, clear message)
    when the index parquet exceeds the per-executor ceiling, pointing the
    user at the sharded IVF path instead of OOMing workers."""
    import shutil

    import pytest

    guarded = tmp_path / "guarded"
    guarded.mkdir()
    shutil.copy(f"{SF_DIR}/embeddings.parquet", guarded / "embeddings.parquet")
    monkeypatch.setenv("EMPDIA_MAX_INDEX_BYTES", "1024")  # 1 KiB: always over
    with pytest.raises(ValueError, match="knn_cosine_ivf"):
        similarity.knn_cosine_top5(spark, str(guarded))
    monkeypatch.delenv("EMPDIA_MAX_INDEX_BYTES")
    # under the default ceiling the same call plans fine
    assert similarity.knn_cosine_top5(spark, str(guarded)).columns == [
        "query_id", "neighbor_id", "cos_sim", "rank",
    ]


def test_approx_distinct_within_hll_error(spark):
    """approx_count_distinct uses HLL++ with default rsd=5%; rsd is a
    standard deviation, so gate at 3σ (±15%) — a quantitative in-repo
    bound that a broken sketch would still blow through."""
    exact = relational.distinct_counts(spark, SF_DIR).collect()
    approx = relational.approx_distinct_counts(spark, SF_DIR).collect()
    e = {r.l_returnflag: r for r in exact}
    a = {r.l_returnflag: r for r in approx}
    assert set(e) == set(a)
    for k in e:
        for col_e, col_a in (
            ("n_parts", "approx_parts"),
            ("n_orders", "approx_orders"),
        ):
            ev, av = getattr(e[k], col_e), getattr(a[k], col_a)
            assert abs(av - ev) <= max(2, 0.15 * ev), (k, col_e, ev, av)


def test_approx_percentile_close_to_exact(spark):
    exact = {
        r.o_orderpriority: r.p50
        for r in relational.percentile_order_values(spark, SF_DIR).collect()
    }
    approx = {
        r.o_orderpriority: r.p50_approx
        for r in relational.approx_percentile_sketch(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        # the sketch returns an actual data value while the exact form
        # interpolates; at ~300 rows/group adjacent-value gaps are ~1%
        assert abs(approx[k] - exact[k]) / exact[k] < 0.03


def test_stratified_sample_fractions(spark):
    """sampleBy must honor each stratum's fraction (Bernoulli, so allow
    generous binomial tolerance) and drop unlisted strata entirely."""
    from pyspark.sql import functions as F

    totals = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = relational.stratified_sample_counts(spark, SF_DIR).collect()
    got = {r.o_orderpriority: r.n_sampled for r in rows}
    assert set(got) <= set(relational.SAMPLE_FRACTIONS)
    for stratum, frac in relational.SAMPLE_FRACTIONS.items():
        n = totals[stratum]
        expect = n * frac
        sd = (n * frac * (1 - frac)) ** 0.5
        assert abs(got.get(stratum, 0) - expect) <= 5 * sd + 2, (stratum, got.get(stratum), expect)


def test_hash_sample_prefilter_equals_exact_topk(spark):
    """hash_sample_per_stratum with the prefilter ACTIVE (n >>
    oversample*k) must equal the plain per-stratum top-k window — the
    Chernoff-safe equivalence doc_sample_per_lang's oracle relies on."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.scale import hash_sample_per_stratum

    df = spark.range(20000).select(
        (F.col("id") % 3).cast("string").alias("grp"), F.col("id").alias("k")
    )
    got = hash_sample_per_stratum(df, "grp", "k", 10, oversample=32)
    exact = (
        df.withColumn("_h", F.md5(F.col("k").cast("string")))
        .withColumn("r", F.row_number().over(W.partitionBy("grp").orderBy("_h", "k")))
        .filter(F.col("r") <= 10)
    )
    a = sorted((r["grp"], r["k"], r["sample_rank"]) for r in got.collect())
    b = sorted((r["grp"], r["k"], r["r"]) for r in exact.collect())
    assert len(a) == 30 and a == b


def test_span_dedup_kept_equals_distinct_spans(spark):
    """doc_span_dedup's keep-first invariant: the total number of kept
    spans across the corpus must equal the number of DISTINCT spans
    (each duplicate group keeps exactly one), and per-doc kept counts
    never exceed totals."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark import registry
    from empdia_iceberg_spark.operators.dedup import SPAN_WORDS
    from empdia_iceberg_spark.sources.tables import load
    from tests.conftest import SF_DIR

    out = registry.queries()["doc_span_dedup"](spark, SF_DIR).collect()
    assert all(r["n_kept"] <= r["n_spans"] for r in out)

    docs = load(spark, SF_DIR, "documents").filter(F.length("text") > 0)
    toks = docs.select("doc_id", F.split("text", r"\s+").alias("t"))
    n_spans = F.ceil(F.size("t") / F.lit(float(SPAN_WORDS))).cast("int")
    spans = toks.select(
        F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("pos"), "t"
    ).select(F.array_join(F.slice("t", F.col("pos") * SPAN_WORDS + 1, SPAN_WORDS), " ").alias("span"))
    n_distinct = spans.distinct().count()
    assert sum(r["n_kept"] for r in out) == n_distinct


def test_hll_rollup_within_5pct_of_exact(spark):
    """user_reach_hll_rollup's merged estimate must be within ±5% of the
    exact per-type distinct user count (HLL lgK=12 ⇒ ~1.6% relative
    stderr; 5% is >3σ), and the naive daily sum must overcount any
    type whose users appear on multiple days."""
    from pyspark.sql import functions as F

    from empdia_iceberg_spark import registry
    from empdia_iceberg_spark.sources.tables import load
    from tests.conftest import SF_DIR

    got = {
        r["event_type"]: r
        for r in registry.queries()["user_reach_hll_rollup"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, row in got.items():
        assert abs(row["reach_estimate"] - exact[et]) <= max(2, 0.05 * exact[et]), (
            et,
            row["reach_estimate"],
            exact[et],
        )
        assert row["naive_sum_daily"] >= row["reach_estimate"]


def test_pq_codes_deterministic_and_better_than_mean(spark):
    """PQ encoding must be bit-reproducible across runs (deterministic
    codebooks) and reconstruct vectors far better than the trivial
    'predict the subspace mean' baseline (k-means with k=16 strictly
    refines k=1)."""
    import numpy as np

    from empdia_iceberg_spark import registry
    from tests.conftest import SF_DIR

    a = registry.queries()["embedding_pq_codes"](spark, SF_DIR).collect()
    b = registry.queries()["embedding_pq_codes"](spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(0 <= r["pq_code"] < 2**32 for r in a)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    m = np.array([r.embedding for r in emb], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    baseline = ((m - m.mean(axis=0)) ** 2).mean()  # k=1 per-dim MSE
    avg_mse = sum(r["recon_mse"] for r in a) / len(a)
    assert avg_mse < baseline, (avg_mse, baseline)


def test_pca_power_rayleigh_near_lambda1(spark):
    """Convergence criterion robust to the synthetic data's
    near-degenerate spectrum (λ2/λ1 ≈ 0.93, so the eigenVECTOR mixes
    among the top directions): the returned unit vector's Rayleigh
    quotient must reach ≥ 95% of numpy's exact λ1, the vector must be
    unit-norm, and the reported eigenvalue must agree with the
    Rayleigh quotient within 5%."""
    import numpy as np

    from empdia_iceberg_spark import registry
    from tests.conftest import SF_DIR

    rows = registry.queries()["embedding_pca_power"](spark, SF_DIR).collect()
    v = np.zeros(64)
    for r in rows:
        v[r["dim"]] = r["component"]
    assert abs(float(v @ v) - 1.0) < 1e-3
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    m = np.array([r.embedding for r in emb], dtype=np.float64)
    cov = m.T @ m
    lam1 = float(np.linalg.eigvalsh(cov)[-1])
    rayleigh = float(v @ cov @ v) / float(v @ v)
    assert rayleigh >= 0.95 * lam1, (rayleigh, lam1)
    assert abs(rows[0]["eigenvalue"] - rayleigh) / lam1 < 0.05


def test_bucketed_prefix_sum_equals_global_window(spark):
    """bucketed_prefix_sum must equal the single-partition global
    running sum exactly (decimal values), including duplicate order
    keys that straddle would-be bucket boundaries."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from empdia_iceberg_spark.operators.scale import bucketed_prefix_sum

    df = spark.range(5000).select(
        (F.col("id") % 700).alias("k"),  # heavy duplicate order keys
        F.col("id").alias("tb"),
        ((F.col("id") % 97) + 1).cast("decimal(18,2)").alias("v"),
    )
    got = {
        r["tb"]: r["c"]
        for r in bucketed_prefix_sum(df, "k", "v", tiebreaks=("tb",), out_col="c").collect()
    }
    w = W.orderBy("k", "tb").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {r["tb"]: r["c"] for r in df.withColumn("c", F.sum("v").over(w)).collect()}
    assert got == want


def test_pagerank_shuffle_fallback_matches_broadcast(spark, monkeypatch):
    """r16: the rank-side broadcast is PINNED below
    _PR_BROADCAST_MAX_NODES (a hint ignores the auto-broadcast
    threshold), with a shuffle-join fallback above the ceiling for
    huge graphs. Force the fallback (ceiling 0, auto-broadcast off so
    AQE cannot re-broadcast either); ranks must be identical — the
    det_round(12) long contribution sums are partitioning-independent
    by construction."""
    from tests.conftest import SF_DIR
    from empdia_iceberg_spark import registry
    from empdia_iceberg_spark.operators import mining as _m

    fn = registry.queries()["pagerank_trading_graph"]
    broad = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    conf = spark.conf
    saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_aqe = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        monkeypatch.setattr(_m, "_PR_BROADCAST_MAX_NODES", 0)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        fell = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        if saved_aqe is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", saved_aqe)
    assert broad == fell and len(broad) > 0


def test_grouped_scaled_sums_matches_decimal_path(spark):
    """grouped_scaled_sums (long partials + DECIMAL(38,0) re-agg) must
    be bit-identical to the straight decimal-cast sum for 2- and
    6-decimal data, including negatives and NULLs."""
    import random

    from pyspark.sql import functions as F

    from empdia_iceberg_spark.functions.exact import grouped_scaled_sums

    rng = random.Random(7)
    rows = []
    for i in range(5000):
        k = rng.choice(["a", "b", "c"])
        v2 = None if i % 97 == 0 else round(rng.uniform(-1e4, 1e4), 2)
        v6 = None if i % 89 == 0 else round(rng.uniform(-50, 50), 6)
        rows.append((k, v2, v6))
    df = spark.createDataFrame(rows, "k string, v2 double, v6 double").repartition(7)

    fast = {
        r["k"]: (r["s2"], r["s6"], r["__count"])
        for r in grouped_scaled_sums(
            df, ["k"], {"s2": (F.col("v2"), 2), "s6": (F.col("v6"), 6)}
        ).collect()
    }
    exact = {
        r["k"]: (r["s2"], r["s6"], r["n"])
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v2").cast("decimal(18,2)")).cast("double").alias("s2"),
            F.sum(F.col("v6").cast("decimal(28,6)")).cast("double").alias("s6"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert fast == exact


def test_knn_kernel_exact_tiebreak_and_tiny_index(spark, tmp_path):
    """argpartition alone breaks ties ARBITRARILY at the k+1 cut, which
    disagreed with the oracle's (cos DESC, neighbor_id ASC) order when
    equal cosines span the boundary (duplicate embeddings — exactly
    what a near-dup corpus contains). The kernel must keep every
    candidate at-or-above the cut value and lexsort, so the tied
    low-id neighbor always wins; and it must not crash on indexes
    smaller than k+1."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from empdia_iceberg_spark.operators.similarity import _topk_batches

    # ids 0-3: identical vectors (cos=1 with the query direction);
    # ids 4-6: identical second tier; id 7: filler; id 8: the query itself
    base = [1.0] + [0.0] * 7
    tier2 = [0.8] + [0.6] + [0.0] * 6
    emb = [base] * 4 + [tier2] * 3 + [[0.0] * 7 + [1.0]] + [base]
    ids = list(range(9))
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, "int64"),
                  "embedding": pa.array(emb, pa.list_(pa.float32()))}),
        path,
    )
    query = pd.DataFrame({"vec_id": [8], "embedding": [base]})
    out = pd.concat(list(_topk_batches(path, 5)([query])))
    # ties: cos=1 for ids 0,1,2,3 (and self 8, excluded); tier2 ties on
    # ids 4,5,6 → rank-5 must be id 4, never an arbitrary one of 4-6
    assert list(out["neighbor_id"]) == [0, 1, 2, 3, 4]
    # tiny index: n <= k+1 must not raise (argpartition kth bound)
    tiny = str(tmp_path / "tiny.parquet")
    pq.write_table(
        pa.table({"vec_id": pa.array([0, 1], "int64"),
                  "embedding": pa.array([base, tier2], pa.list_(pa.float32()))}),
        tiny,
    )
    out2 = pd.concat(list(_topk_batches(tiny, 5)([pd.DataFrame({"vec_id": [0], "embedding": [base]})])))
    assert list(out2["neighbor_id"]) == [1]


def test_knn_kernel_tie_cap_partial_selection(tmp_path):
    """r8 ADVICE: the tie-exact cut keeps every candidate at the cutoff
    value, so a duplicate-heavy corpus (the very thing a near-dup
    kernel targets) can tie nearly the WHOLE index at the boundary and
    degrade the per-query lexsort to O(n log n). The kernel now caps
    the candidate set with an O(|tied|) partial selection of the
    smallest ids — results must stay bit-identical to sorting the full
    tied set: the k lowest ids among the ties, in id order."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from empdia_iceberg_spark.operators.similarity import _topk_batches

    base = [1.0] + [0.0] * 7
    n = 2000  # every index vector identical → all n tie at the cut
    pq.write_table(
        pa.table({"vec_id": pa.array(list(range(n)), "int64"),
                  "embedding": pa.array([base] * n, pa.list_(pa.float32()))}),
        str(tmp_path / "dup.parquet"),
    )
    query = pd.DataFrame({"vec_id": [7], "embedding": [base]})
    out = pd.concat(list(_topk_batches(str(tmp_path / "dup.parquet"), 5)([query])))
    # self (id 7) excluded; the 5 lowest ids win, in id order
    assert list(out["neighbor_id"]) == [0, 1, 2, 3, 4]
    assert list(out["rank"]) == [1, 2, 3, 4, 5]

    # mixed corpus: a strict tier above the cutoff plus a huge tied
    # tier spanning it — strict rows must all survive, then lowest ids
    tier_hi = [0.9, float(np.sqrt(1 - 0.81))] + [0.0] * 6
    emb = [base if i % 2 else tier_hi for i in range(6)] + [base] * 1000
    pq.write_table(
        pa.table({"vec_id": pa.array(list(range(len(emb))), "int64"),
                  "embedding": pa.array(emb, pa.list_(pa.float32()))}),
        str(tmp_path / "mix.parquet"),
    )
    q2 = pd.DataFrame({"vec_id": [100001], "embedding": [base]})
    out2 = pd.concat(list(_topk_batches(str(tmp_path / "mix.parquet"), 5)([q2])))
    # cos=1 rows: odd ids 1,3,5 and ids 6..1005; cos=0.9 rows: 0,2,4.
    # top-5 by (cos DESC, id ASC) = ids 1,3,5,6,7
    assert list(out2["neighbor_id"]) == [1, 3, 5, 6, 7]


def test_ivf_cell_cache_rebuilds_when_index_file_changes(spark, tmp_path, monkeypatch):
    """r8 ADVICE: the IVF cell-shard cache was keyed on the index PATH
    alone — regenerating the embeddings file at the same path reused
    stale shards while centroids retrained on the new data (silent
    recall loss). The cache key now fingerprints mtime+size, so a
    changed file lands in a fresh cache dir."""
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from empdia_iceberg_spark.operators.similarity import _ivf_cells_dir

    monkeypatch.setenv("SPARK_GRAFT_ANN_ROOT", str(tmp_path / "ann"))
    path = str(tmp_path / "embeddings.parquet")
    shutil.copy(f"{SF_DIR}/embeddings.parquet", path)
    d1, c1 = _ivf_cells_dir(spark, path)
    d1_again, _ = _ivf_cells_dir(spark, path)
    assert d1 == d1_again  # unchanged file → cache hit

    # regenerate the file at the SAME path (content changes: drop rows)
    t = pq.read_table(path)
    time.sleep(0.01)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), path)
    d2, c2 = _ivf_cells_dir(spark, path)
    assert d2 != d1, "stale cell shards reused after the index file changed"
    assert os.path.exists(os.path.join(d2, "_built"))


def test_profile_similarity_broadcast_gate_fallback(spark, monkeypatch):
    """r8 ADVICE: user_profile_similarity force-broadcast three
    one-row-per-user tables; past executor memory that fails outright.
    The hints are now gated on a user-count ceiling — force the
    fallback (ceiling 0) and the shuffle-join plan must produce the
    exact same rows."""
    from empdia_iceberg_spark.operators import similarity as sim

    expected = {tuple(r) for r in sim.user_profile_similarity(spark, SF_DIR).collect()}
    monkeypatch.setattr(sim, "_PROFILE_BROADCAST_MAX_USERS", 0)
    got = {tuple(r) for r in sim.user_profile_similarity(spark, SF_DIR).collect()}
    assert got == expected


def test_load_index_cache_keys_on_content_fingerprint(tmp_path):
    """r9 ADVICE: the brute-force kernel's executor-local _INDEX_CACHE
    was keyed on path alone — regenerating the embeddings file at the
    same path made long-lived executor processes silently serve stale
    vectors (the exact hazard class the r8 IVF fix documents). The
    cache now re-stats the index per lookup and reloads on a content
    fingerprint mismatch. (r10: the re-stat itself is TTL-bounded —
    _FP_TTL_CACHE is cleared here to model TTL expiry; the TTL window
    has its own tests below.)"""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from empdia_iceberg_spark.operators.similarity import _FP_TTL_CACHE, _load_index

    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({"vec_id": pa.array([1, 2], "int64"),
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32()))}),
        path,
    )
    ids, m = _load_index(path)
    assert list(ids) == [1, 2]
    ids_again, _ = _load_index(path)
    assert list(ids_again) == [1, 2]  # unchanged file → cache hit

    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    pq.write_table(
        pa.table({"vec_id": pa.array([7], "int64"),
                  "embedding": pa.array([[0.6, 0.8]], pa.list_(pa.float32()))}),
        path,
    )
    _FP_TTL_CACHE.clear()  # model TTL expiry (default window 1 s)
    ids2, m2 = _load_index(path)
    assert list(ids2) == [7], "stale executor-local index served after in-place regeneration"
    np.testing.assert_allclose(m2, [[0.6, 0.8]])


def test_fingerprint_sees_nested_file_changes(tmp_path):
    """r9 ADVICE: the r8 fingerprint statted only top-level entries of a
    directory index, so a file replaced in place two levels deep (e.g.
    inside a hive `_cell=` partition subdir) left the fingerprint — and
    the cache — stale. The fingerprint now walks recursively. Top-level
    mtimes are pinned across the rewrite so ONLY the nested file's stat
    can distinguish the two states."""
    import time

    from empdia_iceberg_spark.operators.similarity import _fingerprint

    root = tmp_path / "ds"
    sub = root / "_cell=3"
    sub.mkdir(parents=True)
    f = sub / "part-0.bin"
    f.write_bytes(b"aaaa")
    pin = 1_700_000_000
    for d in (root, sub):
        os.utime(d, ns=(pin * 10**9, pin * 10**9))
    fp1 = _fingerprint(str(root))

    time.sleep(0.01)
    f.write_bytes(b"bbbb")  # same size, two levels deep
    for d in (root, sub):
        os.utime(d, ns=(pin * 10**9, pin * 10**9))
    fp2 = _fingerprint(str(root))
    assert fp1 != fp2, "nested in-place rewrite invisible to the fingerprint"


def test_ivf_generation_reclamation_keeps_two_bounded(spark, tmp_path, monkeypatch):
    """r9 ADVICE: fingerprint-keyed ivf_* cache dirs accumulated
    unboundedly across index regenerations. A winning build now keeps
    the current generation plus the most recent superseded one (the
    bloom blob two-generation grace) within ITS source's namespace,
    deletes older ones, and never touches another dataset's dirs."""
    import time

    import pyarrow.parquet as pq

    from empdia_iceberg_spark.operators.similarity import _ivf_cells_dir

    ann = tmp_path / "ann"
    ann.mkdir()
    # another dataset's live cache dir + a legacy unprefixed dir
    other = ann / "ivf_feedf00d_0123456789ab"
    other.mkdir()
    legacy = ann / "ivf_0123456789ab"
    legacy.mkdir()
    monkeypatch.setenv("SPARK_GRAFT_ANN_ROOT", str(ann))

    import shutil as _sh

    path = str(tmp_path / "embeddings.parquet")
    _sh.copy(f"{SF_DIR}/embeddings.parquet", path)
    dirs = []
    for i in range(3):  # three successive index generations
        if i:
            t = pq.read_table(path)
            time.sleep(0.01)
            pq.write_table(t.slice(0, t.num_rows - i), path)
        d, _ = _ivf_cells_dir(spark, path)
        dirs.append(d)
    assert len(set(dirs)) == 3
    mine = sorted(p for p in os.listdir(ann) if p.startswith("ivf_")
                  and p not in (other.name, legacy.name))
    assert len(mine) == 2, f"expected exactly two generations, got {mine}"
    assert os.path.basename(dirs[-1]) in mine  # current generation kept
    assert os.path.basename(dirs[-2]) in mine  # one-generation grace
    assert other.is_dir(), "another dataset's cache dir was reclaimed"
    assert not legacy.exists(), "legacy unprefixed dir should be reclaimed"


def test_ivf_reclamation_ages_out_crashed_staging_orphans(spark, tmp_path, monkeypatch):
    """r9 review: a builder killed between write and rename leaves its
    `.build_` staging dir forever; without an age bound repeated crashes
    accumulate full-index-sized orphans. The reclaim pass now removes
    staging dirs whose NEWEST file write is >6 h old (a live build keeps
    closing part files, refreshing that stamp) and must leave a fresh
    staging dir — a possibly in-flight concurrent build — untouched."""
    import shutil as _sh
    import time

    from empdia_iceberg_spark.operators.similarity import _ivf_cells_dir

    ann = tmp_path / "ann"
    ann.mkdir()
    old_ns = int((time.time() - 7 * 3600) * 1e9)
    crashed = ann / "ivf_deadbeef_aaaaaaaaaaaa.build_cafe"
    crashed.mkdir()
    (crashed / "part-0.parquet").write_bytes(b"orphan")
    for p in (crashed / "part-0.parquet", crashed):
        os.utime(p, ns=(old_ns, old_ns))
    fresh = ann / "ivf_deadbeef_bbbbbbbbbbbb.build_beef"
    fresh.mkdir()
    (fresh / "part-0.parquet").write_bytes(b"in-flight")
    monkeypatch.setenv("SPARK_GRAFT_ANN_ROOT", str(ann))

    path = str(tmp_path / "embeddings.parquet")
    _sh.copy(f"{SF_DIR}/embeddings.parquet", path)
    _ivf_cells_dir(spark, path)  # triggers a build + the reclaim pass
    assert not crashed.exists(), "crashed builder's stale staging dir must age out"
    assert fresh.is_dir(), "a fresh staging dir (possible live build) must survive"


def test_fingerprint_survives_file_vanishing_mid_walk(tmp_path, monkeypatch):
    """r9 review: a file deleted between the fingerprint's walk listing
    and its stat (an in-place dataset rewrite in progress) must not
    crash the task — the vanishing is itself recorded, so the resulting
    fingerprint differs from the settled state and the next probe
    reloads."""
    from empdia_iceberg_spark.operators.similarity import _fingerprint

    root = tmp_path / "ds"
    root.mkdir()
    (root / "a.bin").write_bytes(b"aaaa")
    target = root / "b.bin"
    target.write_bytes(b"bbbb")
    fp_settled = _fingerprint(str(root))

    real_stat = os.stat

    def flaky_stat(p, *a, **kw):
        if str(p) == str(target):
            raise FileNotFoundError(p)
        return real_stat(p, *a, **kw)

    monkeypatch.setattr(os, "stat", flaky_stat)
    fp_mid_rewrite = _fingerprint(str(root))  # must not raise
    assert fp_mid_rewrite != fp_settled


def test_exact_sum8_bounded_matches_decimal_path(spark):
    """r9: `exact_sum8_bounded` (long-scaled revenue sums for
    structurally bounded groups, the q3 pre-agg kernel) must be
    bit-identical to the DECIMAL(28,8) path on q3-shaped money values —
    2-decimal prices × (1 − 2-decimal discounts), groups well under the
    2⁵³ identity bound."""
    import random

    from pyspark.sql import functions as F

    from empdia_iceberg_spark.functions.exact import exact_sum8, exact_sum8_bounded

    rng = random.Random(1234)
    rows = [
        (i % 997, round(rng.uniform(900.0, 110000.0), 2), round(rng.uniform(0.0, 0.10), 2))
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "k int, price double, disc double")
    expr = F.col("price") * (1 - F.col("disc"))
    got = (
        df.groupBy("k")
        .agg(
            exact_sum8(expr).alias("dec"),
            exact_sum8_bounded(expr).alias("lng"),
        )
        .collect()
    )
    assert len(got) == 997
    for r in got:
        assert r.dec == r.lng, (r.k, r.dec, r.lng, r.dec.hex(), r.lng.hex())


def test_fingerprint_ttl_bounds_per_batch_stat_storms(tmp_path, monkeypatch):
    """r10 ADVICE: _load_index/_pq_codebooks fingerprint the index per
    lookup; for a directory index that's a recursive walk+stat of every
    part file per Arrow batch per executor. The TTL cache must (a) skip
    the walk entirely within the window, (b) re-walk once it expires,
    and (c) bypass the cache when the TTL is set to 0 (test/debug
    posture)."""
    import time

    from empdia_iceberg_spark.operators import similarity as sim

    f = tmp_path / "idx.bin"
    f.write_bytes(b"v1")
    calls = {"n": 0}
    real = sim._fingerprint

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(sim, "_fingerprint", counting)
    sim._FP_TTL_CACHE.clear()

    # r11 (r10 ADVICE): the TTL is parsed ONCE at import — the per-call
    # env read + float() sat on the hot per-batch path. Overrides go
    # through the module constant, which is what these monkeypatches do.
    monkeypatch.setattr(sim, "_FP_TTL_SEC", 60.0)
    fp1 = sim._fingerprint_cached(str(f))
    for _ in range(10):  # 10 batches inside the window -> zero re-walks
        assert sim._fingerprint_cached(str(f)) == fp1
    assert calls["n"] == 1, "stat storm: fingerprint re-walked inside the TTL"

    monkeypatch.setattr(sim, "_FP_TTL_SEC", 0.02)
    sim._FP_TTL_CACHE.clear()
    sim._fingerprint_cached(str(f))
    time.sleep(0.03)
    f.write_bytes(b"v2-longer")  # regeneration after the window
    fp2 = sim._fingerprint_cached(str(f))
    assert fp2 != fp1, "expired TTL must re-stat and see the regeneration"

    monkeypatch.setattr(sim, "_FP_TTL_SEC", 0.0)
    before = calls["n"]
    sim._fingerprint_cached(str(f))
    sim._fingerprint_cached(str(f))
    assert calls["n"] == before + 2, "TTL=0 must bypass the cache entirely"

    # the cache is BOUNDED: exceeding the entry cap must evict (expired
    # entries first, everything as the fallback), never grow unbounded
    monkeypatch.setattr(sim, "_FP_TTL_SEC", 60.0)
    monkeypatch.setattr(sim, "_FP_TTL_CACHE_MAX", 4)
    sim._FP_TTL_CACHE.clear()
    for i in range(10):
        g = tmp_path / f"idx_{i}.bin"
        g.write_bytes(b"x")
        sim._fingerprint_cached(str(g))
    assert len(sim._FP_TTL_CACHE) <= 5, "TTL cache must stay bounded"


def test_ivf_grace_generations_env_tunable(spark, tmp_path, monkeypatch):
    """r10 ADVICE: the superseded-generation keep depth is env-tunable
    for shared-FS deployments where a plan can outlive two index
    regenerations. With EMPDIA_IVF_GRACE_GENERATIONS=2 a fourth build
    must leave three dirs (current + two grace), not two."""
    import shutil as _sh
    import time

    import pyarrow.parquet as pq

    from empdia_iceberg_spark.operators.similarity import _ivf_cells_dir

    ann = tmp_path / "ann"
    ann.mkdir()
    monkeypatch.setenv("SPARK_GRAFT_ANN_ROOT", str(ann))
    monkeypatch.setenv("EMPDIA_IVF_GRACE_GENERATIONS", "2")

    path = str(tmp_path / "embeddings.parquet")
    _sh.copy(f"{SF_DIR}/embeddings.parquet", path)
    dirs = []
    for i in range(4):
        if i:
            t = pq.read_table(path)
            time.sleep(0.01)
            pq.write_table(t.slice(0, t.num_rows - i), path)
        d, _ = _ivf_cells_dir(spark, path)
        dirs.append(d)
    kept = sorted(p for p in os.listdir(ann) if p.startswith("ivf_"))
    assert len(kept) == 3, f"grace=2 must keep current + two superseded, got {kept}"
    assert {os.path.basename(d) for d in dirs[-3:]} == set(kept)


def test_ivf_build_idle_bound_env_tunable(spark, tmp_path, monkeypatch):
    """r10 ADVICE: the crashed-staging age-out compares file mtimes to
    this process's clock, so clock-skewed shared filesystems need a
    bigger bound. A staging dir idle for ~2 s must survive the default
    6 h bound but be reclaimed when EMPDIA_IVF_BUILD_IDLE_SEC=1."""
    import shutil as _sh
    import time

    from empdia_iceberg_spark.operators.similarity import _ivf_cells_dir

    ann = tmp_path / "ann"
    ann.mkdir()
    stale_ns = int((time.time() - 2) * 1e9)
    staging = ann / "ivf_deadbeef_cccccccccccc.build_feed"
    staging.mkdir()
    (staging / "part-0.parquet").write_bytes(b"orphan")
    for p in (staging / "part-0.parquet", staging):
        os.utime(p, ns=(stale_ns, stale_ns))
    monkeypatch.setenv("SPARK_GRAFT_ANN_ROOT", str(ann))
    monkeypatch.setenv("EMPDIA_IVF_BUILD_IDLE_SEC", "1")

    path = str(tmp_path / "embeddings.parquet")
    _sh.copy(f"{SF_DIR}/embeddings.parquet", path)
    _ivf_cells_dir(spark, path)
    assert not staging.exists(), "idle bound 1s: 2s-idle staging dir must age out"


def test_ivf_near_dup_blocked_pairs_exact_subset_and_recall(spark):
    """emb_near_dup_ivf (r12): every emitted pair must appear in the
    brute-force all-pairs answer with the identical rounded cosine
    (blocking narrows the CANDIDATES, never perturbs a value), and the
    blocking recall on this corpus stays >= 0.9 (r13, VERDICT r12 ask
    #1): the synthetic corpus has no true near-dups — the 0.4
    threshold sits in the far-apart tail where co-location is weakest
    — so the pair path uses the WIDE assignment
    (NEAR_DUP_IVF_ASSIGN=4; measured 0.955 at sf0.001, 1.0 at
    sf0.01)."""
    from empdia_iceberg_spark.operators import similarity

    blocked = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in similarity.emb_near_dup_ivf(spark, SF_DIR).collect()
    }
    brute = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in similarity.emb_cosine_near_dup(spark, SF_DIR).collect()
    }
    assert blocked, "blocked path found no pairs at all"
    for pair, cos in blocked.items():
        assert pair in brute and brute[pair] == cos
    assert len(blocked) / len(brute) >= 0.9
