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
    exact_sum_r6_bounded,
    sql_det_round,
    sql_sum_r6,
)
from empdia_iceberg_spark.operators.textstats import _sql_lang_hits
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
        # per-doc group: bounded by document length -> long-scaled exact sum
        exact_sum_r6_bounded(F.col("bits")).alias("sum_bits"),
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


# ----------------------------------------- multinomial Naive Bayes
#
# The classic trained text classifier, distributed the same way as the
# bigram LM: per-language token counts are groupBy aggregations that
# LIVE as DataFrames (never collected — a 100 TB corpus's count table
# shards like any fact), scoring joins the token stream back to the
# counts on the token key, and the only broadcasts are the
# language table (one row per class) and the 1-row vocabulary size.
# Add-one smoothing makes every probability a ratio of exact small
# integers; each ln-term is det_round(6)+decimal-summed, so the
# per-class scores — and therefore the argmax predictions — are
# bit-identical across engines, making a TRAINED classifier's
# confusion matrix hash-checkable.

_NB_TERM = "ln((CAST(c AS DOUBLE) + 1.0) / (CAST(n_l AS DOUBLE) + CAST(v AS DOUBLE)))"


_NB_PRED_SQL = rf"""
    tok AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    tokens AS (
        SELECT doc_id, lang, unnest(toks) AS w FROM tok
    ),
    cnt AS (
        SELECT lang AS cand_lang, w, count(*) AS c
        FROM tokens GROUP BY lang, w
    ),
    langs AS (
        SELECT cand_lang, sum(c) AS n_l FROM cnt GROUP BY cand_lang
    ),
    priors AS (
        SELECT t.lang AS cand_lang, count(*) AS n_docs_l
        FROM tok t GROUP BY t.lang
    ),
    vocab AS (SELECT count(DISTINCT w) AS v FROM tokens),
    total AS (SELECT count(*) AS n_docs FROM tok),
    stream AS (
        SELECT tk.doc_id, tk.lang AS actual_lang, l.cand_lang, l.n_l, tk.w
        FROM (SELECT doc_id, lang, w FROM tokens) tk
        CROSS JOIN langs l
    ),
    terms AS (
        SELECT s.doc_id, s.actual_lang, s.cand_lang,
               {sql_det_round(_NB_TERM, 6)} AS term
        FROM (SELECT s.*, COALESCE(cnt.c, 0) AS c
              FROM stream s
              LEFT JOIN cnt ON cnt.cand_lang = s.cand_lang AND cnt.w = s.w) s
        CROSS JOIN vocab
    ),
    scores AS (
        SELECT doc_id, actual_lang, cand_lang,
               {sql_sum_r6('term')}
               + {sql_det_round('ln(CAST(p.n_docs_l AS DOUBLE) / CAST(t.n_docs AS DOUBLE))', 6)} AS score
        FROM terms
        JOIN priors p USING (cand_lang)
        CROSS JOIN total t
        GROUP BY doc_id, actual_lang, cand_lang, p.n_docs_l, t.n_docs
    ),
    nb_pred AS (
        SELECT doc_id, actual_lang, predicted_lang FROM (
            SELECT doc_id, actual_lang, cand_lang AS predicted_lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cand_lang) AS rnk
            FROM scores
        ) WHERE rnk = 1
    )"""


@register(
    "nb_lang_confusion",
    oracle=f"""
    WITH {_NB_PRED_SQL.strip()}
    SELECT actual_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM nb_pred
    GROUP BY actual_lang, predicted_lang
    ORDER BY actual_lang, predicted_lang
    """,
    doc="Multinomial Naive Bayes language identification, trained and "
    "applied in one plan: per-language add-one-smoothed token counts "
    "(distributed, never collected), corpus re-scored by joining the "
    "token stream to its own counts, argmax class per document with "
    "a deterministic tiebreak, output as the confusion matrix vs the "
    "true labels. det_round+decimal-summed ln-terms make the scores "
    "— hence the predictions — bit-identical across engines.",
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = _nb_predictions(spark, sf_dir)
    return (
        pred.groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


def _nb_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc NB argmax predictions (doc_id, actual_lang,
    predicted_lang) — the plan shared by nb_lang_confusion and
    classifier_agreement_kappa; mirrors _NB_PRED_SQL."""
    from pyspark.sql import Window as W

    toked = _tokenized(spark, sf_dir)
    tokens = toked.select("doc_id", "lang", F.explode("toks").alias("w"))

    cnt = tokens.groupBy(F.col("lang").alias("cand_lang"), "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    langs = cnt.groupBy("cand_lang").agg(F.sum("c").alias("n_l"))
    priors = toked.groupBy(F.col("lang").alias("cand_lang")).agg(
        F.count(F.lit(1)).alias("n_docs_l")
    )
    vocab = tokens.agg(F.countDistinct("w").alias("v"))
    total = toked.agg(F.count(F.lit(1)).alias("n_docs"))

    stream = tokens.select(
        "doc_id", F.col("lang").alias("actual_lang"), "w"
    ).crossJoin(F.broadcast(langs))
    joined = stream.join(
        cnt, ["cand_lang", "w"], "left"
    ).withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    terms = joined.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "actual_lang",
        "cand_lang",
        det_round(F.expr(_NB_TERM), 6).alias("term"),
    )
    scores = (
        terms.groupBy("doc_id", "actual_lang", "cand_lang")
        # per-(doc, lang) group: bounded by document length
        .agg(exact_sum_r6_bounded(F.col("term")).alias("sum_terms"))
        .join(F.broadcast(priors), ["cand_lang"])
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "actual_lang",
            "cand_lang",
            (
                F.col("sum_terms")
                + det_round(
                    F.log(
                        F.col("n_docs_l").cast("double")
                        / F.col("n_docs").cast("double")
                    ),
                    6,
                )
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand_lang"))
    pred = scores.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") == 1
    )
    return pred.select(
        "doc_id", "actual_lang", F.col("cand_lang").alias("predicted_lang")
    )


# ------------------------------------------- inter-classifier kappa
#
# Cohen's kappa between the engine's TWO language identifiers — the
# trained Naive Bayes (above) and the stopword-vote heuristic
# (operators/textstats.py) — the measurement-science answer to "do my
# two labelers actually agree beyond chance?". Every input is an
# exact integer count over per-doc predictions; po/pe/kappa are one
# IEEE closed form ⇒ a hash-green agreement study. (Honest caveat,
# inherited from the heuristic: the synthetic corpus shares one
# vocabulary, so the heuristic mostly votes en/und — kappa is
# expected to be LOW; the operator demonstrates the shape.)


@register(
    "classifier_agreement_kappa",
    oracle=f"""
    WITH {{nb}},
    hh AS (
        SELECT doc_id,
               {{h_en}} AS h_en, {{h_es}} AS h_es, {{h_fr}} AS h_fr,
               {{h_de}} AS h_de, {{h_zh}} AS h_zh
        FROM documents
    ),
    heur AS (
        SELECT doc_id,
               CASE
                 WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0 AND h_zh = 0 THEN 'und'
                 WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en >= h_zh THEN 'en'
                 WHEN h_es >= h_fr AND h_es >= h_de AND h_es >= h_zh THEN 'es'
                 WHEN h_fr >= h_de AND h_fr >= h_zh THEN 'fr'
                 WHEN h_de >= h_zh THEN 'de'
                 ELSE 'zh'
               END AS heur_lang
        FROM hh
    ),
    paired AS (
        SELECT nb_pred.predicted_lang AS a, heur.heur_lang AS b
        FROM nb_pred JOIN heur USING (doc_id)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM paired),
    po AS (
        SELECT CAST(count(CASE WHEN a = b THEN 1 END) AS DOUBLE) AS agree FROM paired
    ),
    pe AS (
        SELECT {{sumr6}} AS pe
        FROM (
            SELECT COALESCE(ca.c, 0) AS ca_c, COALESCE(cb.c, 0) AS cb_c, nn.n
            FROM (SELECT a AS k, count(*) AS c FROM paired GROUP BY a) ca
            FULL OUTER JOIN (SELECT b AS k, count(*) AS c FROM paired GROUP BY b) cb
              USING (k)
            CROSS JOIN nn
        )
    )
    SELECT CAST(nn.n AS BIGINT) AS n_docs,
           {{po_r}} AS p_observed,
           {{pe_r}} AS p_expected,
           {{kappa_r}} AS kappa
    FROM nn CROSS JOIN po CROSS JOIN pe
    """.format(
        nb=_NB_PRED_SQL.strip(),
        # built from the SAME LANG_STOPWORDS the Spark side votes with —
        # inline literals here once went stale-prone against textstats
        h_en=_sql_lang_hits("en"),
        h_es=_sql_lang_hits("es"),
        h_fr=_sql_lang_hits("fr"),
        h_de=_sql_lang_hits("de"),
        h_zh=_sql_lang_hits("zh"),
        sumr6=sql_sum_r6("(CAST(ca_c AS DOUBLE) / n) * (CAST(cb_c AS DOUBLE) / n)"),
        po_r=sql_det_round("po.agree / nn.n", 6),
        pe_r=sql_det_round("pe.pe", 6),
        kappa_r=sql_det_round("(po.agree / nn.n - pe.pe) / (1.0 - pe.pe)", 6),
    ),
    doc="Cohen's kappa between the trained Naive Bayes language ID and "
    "the stopword-vote heuristic: per-doc predictions from BOTH "
    "models joined on doc_id, observed vs chance agreement from "
    "exact integer marginals, kappa as one IEEE closed form — a "
    "hash-green inter-rater agreement study over 2 real classifiers.",
)
def classifier_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from empdia_iceberg_spark.operators.textstats import (
        _LANG_ORDER,
        _lang_hits,
        ws_tokens,
    )

    nb = _nb_predictions(spark, sf_dir).select("doc_id", F.col("predicted_lang").alias("a"))

    docs = load(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    hits = docs.select(
        "doc_id", *[_lang_hits(toks, lg).alias(f"h_{lg}") for lg in _LANG_ORDER]
    )
    h = {lg: F.col(f"h_{lg}") for lg in _LANG_ORDER}
    heur = (
        F.when(sum(h.values(), F.lit(0)) == 0, F.lit("und"))
        .when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]) & (h["en"] >= h["zh"]), "en")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]) & (h["es"] >= h["zh"]), "es")
        .when((h["fr"] >= h["de"]) & (h["fr"] >= h["zh"]), "fr")
        .when(h["de"] >= h["zh"], "de")
        .otherwise("zh")
    )
    # the costliest pipeline in the module (NB scoring: token-stream x
    # 5-language join + per-doc window) feeds FOUR independent
    # aggregates below — materialize it once instead of executing 4x
    paired = nb.join(hits.select("doc_id", heur.alias("b")), "doc_id").localCheckpoint(
        eager=True
    )

    nn = paired.agg(F.count(F.lit(1)).cast("double").alias("n"))
    po = paired.agg(
        F.count(F.when(F.col("a") == F.col("b"), 1)).cast("double").alias("agree")
    )
    ca = paired.groupBy(F.col("a").alias("k")).agg(F.count(F.lit(1)).alias("ca_c"))
    cb = paired.groupBy(F.col("b").alias("k")).agg(F.count(F.lit(1)).alias("cb_c"))
    pe = (
        ca.join(cb, "k", "full_outer")
        .crossJoin(F.broadcast(nn))
        .agg(
            exact_sum_r6(
                det_round(
                    (F.coalesce(F.col("ca_c"), F.lit(0)).cast("double") / F.col("n"))
                    * (F.coalesce(F.col("cb_c"), F.lit(0)).cast("double") / F.col("n")),
                    6,
                )
            ).alias("pe")
        )
    )
    return (
        nn.crossJoin(F.broadcast(po))
        .crossJoin(F.broadcast(pe))
        .select(
            F.col("n").cast("bigint").alias("n_docs"),
            det_round(F.col("agree") / F.col("n"), 6).alias("p_observed"),
            det_round(F.col("pe"), 6).alias("p_expected"),
            det_round(
                (F.col("agree") / F.col("n") - F.col("pe")) / (F.lit(1.0) - F.col("pe")),
                6,
            ).alias("kappa"),
        )
    )
