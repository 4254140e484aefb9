"""Feature/data-preparation operators: the ML-preprocessing shapes
(imputation here; encoding/binning live in the relational and window
modules) a training pipeline runs right before feature export.

`events_impute_value` is the canonical two-level mean imputer: nulls
are filled from the per-user mean and, for users with no observed
values at all, from the global mean. The driver tables carry no nulls,
so the operator first *injects* a deterministic null mask
(event_id % 13 == 0) — making the fill path itself oracle-checkable.

Scale posture: per-user means are one map-side-combined aggregation
joined back on the already-shuffled user key; the global mean is a
broadcast 1-row aggregate. No windows, no driver round-trips.
Determinism: means are exact decimal sums ÷ counts, det_round(4)'d
before the fill so the imputed value is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round, sql_sum2
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


@register(
    "events_impute_value",
    oracle=f"""
    WITH masked AS (
        SELECT event_id, user_id,
               CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    user_mean AS (
        SELECT user_id,
               {sql_det_round(sql_sum2('v') + ' / count(v)', 4)} AS u_mean
        FROM masked WHERE v IS NOT NULL GROUP BY user_id
    ),
    global_mean AS (
        SELECT {sql_det_round(sql_sum2('v') + ' / count(v)', 4)} AS g_mean
        FROM masked WHERE v IS NOT NULL
    )
    SELECT m.event_id, m.user_id,
           COALESCE(m.v, u.u_mean, g.g_mean) AS value_imputed,
           (m.v IS NULL) AS was_imputed
    FROM masked m
    LEFT JOIN user_mean u ON m.user_id = u.user_id
    CROSS JOIN global_mean g
    ORDER BY m.event_id
    """,
    doc="Two-level mean imputation over a deterministically-masked "
    "value column: per-user det-rounded decimal means joined back on "
    "the user key, global-mean broadcast fallback for all-null users "
    "— the standard ML imputer as one declarative plan.",
)
def events_impute_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    observed = events.filter(F.col("v").isNotNull())
    mean2 = det_round(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double") / F.count("v"), 4
    )
    user_mean = observed.groupBy("user_id").agg(mean2.alias("u_mean"))
    global_mean = observed.agg(mean2.alias("g_mean"))
    return (
        events.join(user_mean, ["user_id"], "left")
        .crossJoin(F.broadcast(global_mean))
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("v"), F.col("u_mean"), F.col("g_mean")).alias(
                "value_imputed"
            ),
            F.col("v").isNull().alias("was_imputed"),
        )
        .orderBy("event_id")
    )


@register(
    "events_target_encode_loo",
    oracle="""
    WITH g AS (
        SELECT event_type,
               sum(CAST(value AS DECIMAL(18,2))) AS s,
               count(*) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           (floor((CAST(g.s - CAST(e.value AS DECIMAL(18,2)) AS DOUBLE)
                   / CAST(g.n - 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS te_loo
    FROM events e JOIN g USING (event_type)
    ORDER BY e.event_id
    """,
    doc="Leave-one-out target encoding of event_type by the value "
    "column: per-category exact decimal sums broadcast back, each "
    "row's own target excluded — (Σ−x)/(n−1) — the LOO form that "
    "prevents target leakage in feature engineering. One tiny "
    "aggregate + one broadcast join; the encode itself is "
    "map-side arithmetic, det-rounded to hash across engines.",
)
def events_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    g = events.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        events.join(F.broadcast(g), ["event_type"])
        .select(
            "event_id",
            "event_type",
            det_round(
                (F.col("s") - F.col("value").cast("decimal(18,2)")).cast("double")
                / (F.col("n") - 1).cast("double"),
                4,
            ).alias("te_loo"),
        )
        .orderBy("event_id")
    )


# ------------------------------------- deterministic WEIGHTED sampling
#
# Efraimidis–Spirakis A-ES weighted sampling without replacement, made
# reproducible: the per-row uniform comes from an md5 prefix (a pure
# function of doc_id — rerun- and layout-stable, like
# doc_sample_per_lang), the exponential key is u's arrival time scaled
# by the weight, and the k smallest keys per stratum win. P(pick) is
# proportional to weight (n_chars) — the "sample training docs by
# quality/length" primitive.
#
# Scale shape (the hash_sample_per_stratum discipline, weighted):
# before the per-stratum rank window, rows are prefiltered MAP-SIDE to
# key ≤ 16k/W_s, where W_s is the stratum's total weight from one tiny
# broadcast aggregate. N(t) = #{keys ≤ t} is a sum of independent
# Bernoullis with E[N(16k/W)] ≳ 10k even under weight skew (heavy rows
# pass the cutoff with prob ≥ 1 − e^(−16k·w/W)); Chernoff gives
# P(top-k row filtered) ≤ exp(−4k) ≈ 2·10⁻⁹ at k=5 — so the window
# input is ≤ ~16k rows per stratum in expectation, never the full
# stratum, and the plain-window oracle provably equals the
# prefiltered plan.

WEIGHTED_SAMPLE_K = 5
_WS_CUSHION = 16.0

# u = (hex52(md5(doc_id)) + 1) / 2^52  ∈ (0, 1] — exact dyadic double,
# identical in both engines; key = −ln(u)/w (det-rounded to 12: the
# only libm call, same discipline as corpus_zipf_slope).
from empdia_iceberg_spark.operators.profiling import _kmv_u_sql as _shared_u_sql

_U_SQL = _shared_u_sql("doc_id", offset=1)


@register(
    "doc_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               {sql_det_round(f'-ln({_U_SQL}) / n_chars', 12)} AS k
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
                 AS sample_rank
        FROM keyed
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(sample_rank AS INT) AS sample_rank
    FROM ranked WHERE sample_rank <= {WEIGHTED_SAMPLE_K}
    ORDER BY source, sample_rank
    """,
    doc="Deterministic Efraimidis-Spirakis weighted sampling: 5 docs "
    "per source with probability proportional to n_chars, via "
    "exponential keys −ln(u)/w over md5-derived exact-dyadic "
    "uniforms. A map-side Chernoff prefilter (key ≤ 16k/W_stratum, "
    "stratum weights from one broadcast aggregate; miss prob "
    "≤ 2·10⁻⁹ even under weight skew) bounds the rank-window input to ~16k rows per "
    "stratum, so no reducer ever sorts a full stratum. The oracle is "
    "the plain window form the prefiltered plan provably equals.",
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    from empdia_iceberg_spark.operators.profiling import _kmv_u_col

    u = _kmv_u_col("doc_id", offset=1)
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        det_round(-F.log(u) / F.col("n_chars"), 12).alias("k"),
    )
    # stratum weight totals: dimension-sized (one row per source) →
    # broadcast; the cutoff prefilter runs map-side before any shuffle
    totals = docs.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("w_total")
    )
    pruned = keyed.join(F.broadcast(totals), ["source"]).filter(
        F.col("k")
        <= F.lit(_WS_CUSHION * WEIGHTED_SAMPLE_K) / F.col("w_total")
    )
    w = W.partitionBy("source").orderBy("k", "doc_id")
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= WEIGHTED_SAMPLE_K)
        .select(
            "source",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
        .orderBy("source", "sample_rank")
    )


# -------------------------------- greedy coverage (submodular) selection
#
# Facility-location-style training-data selection: greedily pick the K
# documents that maximize marginal BIGRAM coverage of the corpus — the
# classic submodular data-subset-selection primitive (guaranteed
# (1−1/e)-optimal for coverage). Each round is one anti-join of the
# (doc_id, bigram) inverted index against the covered set plus one
# count-per-doc TakeOrdered(1); only the 1-row winner and a scalar
# coverage count cross to the driver, and `localCheckpoint` keeps the
# growing covered set's lineage flat — the same iterative discipline
# as connected_components/pagerank. The oracle unrolls all K greedy
# rounds into chained CTEs, so even this iterative selection is
# value-hashed, not rows-only.

GREEDY_COVERAGE_K = 5


def _coverage_round_sql(r: int) -> str:
    prev_c = f"c{r - 1}" if r > 1 else None
    marg = (
        "items"
        if prev_c is None
        else f"(SELECT i.* FROM items i ANTI JOIN {prev_c} p ON i.it = p.it)"
    )
    pick = (
        f"p{r} AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS g FROM {marg} m"
        f" GROUP BY doc_id ORDER BY g DESC, doc_id LIMIT 1)"
    )
    if prev_c is None:
        cov = (
            f"c{r} AS (SELECT DISTINCT it FROM items JOIN p{r} USING (doc_id))"
        )
    else:
        cov = (
            f"c{r} AS (SELECT it FROM {prev_c} UNION "
            f"SELECT it FROM items JOIN p{r} USING (doc_id))"
        )
    return f"{pick},\n    {cov}"


_COVERAGE_ROUNDS_SQL = ",\n    ".join(
    _coverage_round_sql(r) for r in range(1, GREEDY_COVERAGE_K + 1)
)
_COVERAGE_UNION_SQL = " UNION ALL ".join(
    f"SELECT {r} AS pick_rank, doc_id, g AS marginal_gain,"
    f" (SELECT CAST(count(*) AS BIGINT) FROM c{r}) AS covered_bigrams FROM p{r}"
    for r in range(1, GREEDY_COVERAGE_K + 1)
)


@register(
    "doc_greedy_coverage_select",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    items AS (
        SELECT DISTINCT doc_id, w1 || ' ' || w2 AS it FROM (
            SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT doc_id, toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM tok)
        )
    ),
    {_COVERAGE_ROUNDS_SQL}
    {_COVERAGE_UNION_SQL}
    ORDER BY pick_rank
    """,
    doc="Greedy submodular coverage selection: the 5 documents that "
    "maximize marginal bigram coverage, one anti-join + count-per-doc "
    "TakeOrdered(1) per round (driver sees only the 1-row winner and "
    "a scalar coverage count; covered-set lineage truncated via "
    "localCheckpoint). The (1−1/e) facility-location primitive behind "
    "coverage-based training-subset selection. Oracle unrolls the "
    "greedy rounds into chained CTEs — full value hash for an "
    "iterative selection.",
)
def doc_greedy_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.langmodel import _bigrams, _tokenized

    toked = _tokenized(spark, sf_dir)
    items = (
        _bigrams(toked)
        .select("doc_id", F.concat_ws(" ", "w1", "w2").alias("it"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = None
    picks: list[tuple[int, int, int, int]] = []
    for r in range(1, GREEDY_COVERAGE_K + 1):
        marg = (
            items
            if covered is None
            else items.join(covered, ["it"], "left_anti")
        )
        top = (
            marg.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("g"))
            .orderBy(F.col("g").desc(), "doc_id")
            .limit(1)
            .collect()  # 1-row winner — the only row-data driver read
        )
        if not top:
            break
        winner, gain = top[0]["doc_id"], top[0]["g"]
        new_cov = items.filter(F.col("doc_id") == winner).select("it")
        covered = (
            new_cov
            if covered is None
            else covered.unionByName(new_cov).distinct()
        ).localCheckpoint(eager=True)
        picks.append((r, winner, gain, covered.count()))
    return spark.createDataFrame(
        picks, "pick_rank int, doc_id bigint, marginal_gain bigint, covered_bigrams bigint"
    )
