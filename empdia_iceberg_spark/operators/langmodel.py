"""Statistical language-model quality scoring over `documents`.

The CCNet / Gopher data-curation recipe scores each document by the
perplexity of a small n-gram language model and drops the tail — the
standard quality gate before LLM pretraining (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets"). The reference
repo has no LM scoring (its only text processing is trim/strip,
utils/data_preprocess.py:34-35); this is an engine-surface extension
from SURVEY.md §2.B's LLM-pipeline rows.

Spark-first shape (everything is built-in expressions — no UDFs):

- TRAIN: bigram + context counts are plain `groupBy` aggregations over
  the exploded bigram stream. The model LIVES DISTRIBUTED as two
  DataFrames keyed by (w1, w2) / (w1) — it is never collected, so
  vocabulary size is unbounded (a 100 TB corpus's bigram table shards
  across the cluster like any fact table).
- SCORE: the corpus joins BACK to its own counts on the bigram key —
  the inverted-index layout: shuffles move (token, count) pairs, never
  document pairs or model snapshots. Hot contexts (stopwords) are the
  classic skew keys; AQE skew-join splitting handles them.
- The only broadcast is the 1-row vocabulary-size aggregate.

Determinism: add-one-smoothed probabilities are ratios of exact small
integers; each -log2(p) term is det_round(6)-stabilized and summed in
DECIMAL (order-independent), so the per-doc score is bit-identical
across engines and across partitionings (`functions/exact.py`
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import (
    det_round,
    exact_sum_r6,
    sql_det_round,
    sql_sum_r6,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

# -log2((c_bg + 1) / (c_ctx + V)): integer→double conversions are exact
# (counts ≪ 2^53), the division is one IEEE op, and det_round(6)
# absorbs any last-ulp log2 difference between JVM and DuckDB libm.
_BITS = "-log2((CAST(c_bg AS DOUBLE) + 1.0) / (CAST(c_ctx AS DOUBLE) + CAST(v AS DOUBLE)))"


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )


def _bigrams(toked: DataFrame) -> DataFrame:
    """One (doc_id, w1, w2) row per adjacent token pair — map-only
    explode, no shuffle."""
    pairs = F.expr(
        "transform(slice(toks, 1, size(toks) - 1),"
        " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
    )
    return toked.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", "bg.w1", "bg.w2"
    )


@register(
    "doc_lm_perplexity",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
              FROM tok)
    ),
    ctx AS (SELECT w1, count(*) AS c_ctx FROM big GROUP BY w1),
    bgc AS (SELECT w1, w2, count(*) AS c_bg FROM big GROUP BY w1, w2),
    vocab AS (
        SELECT count(DISTINCT w) AS v
        FROM (SELECT unnest(toks) AS w FROM tok)
    ),
    scored AS (
        SELECT b.doc_id,
               {sql_det_round(_BITS, 6)} AS bits
        FROM big b
        JOIN bgc USING (w1, w2)
        JOIN ctx USING (w1)
        CROSS JOIN vocab
    ),
    agg AS (
        SELECT doc_id,
               count(*) AS n_bigrams,
               {sql_sum_r6('bits')} AS sum_bits
        FROM scored GROUP BY doc_id
    )
    SELECT t.doc_id, t.lang,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           {sql_det_round('a.sum_bits / CAST(a.n_bigrams AS DOUBLE)', 4)} AS avg_bits
    FROM tok t LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
    doc="CCNet-style LM quality score: train an add-one-smoothed bigram "
    "model on the corpus (distributed count tables, never collected), "
    "then score every document's mean bits-per-bigram by joining the "
    "bigram stream back to its own counts — the inverted-index "
    "layout. det_round(6)+decimal-summed log terms make the score "
    "bit-deterministic across engines.",
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    toked = _tokenized(spark, sf_dir)
    big = _bigrams(toked)

    ctx = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_ctx"))
    bgc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    vocab = (
        toked.select(F.explode("toks").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )

    scored = (
        big.join(bgc, ["w1", "w2"])
        .join(ctx, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", det_round(F.expr(_BITS), 6).alias("bits"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        exact_sum_r6(F.col("bits")).alias("sum_bits"),
    )
    return (
        toked.select("doc_id", "lang")
        .join(agg, ["doc_id"], "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            det_round(
                F.col("sum_bits") / F.col("n_bigrams").cast("double"), 4
            ).alias("avg_bits"),
        )
        .orderBy("doc_id")
    )
