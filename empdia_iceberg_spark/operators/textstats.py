"""Text-analysis operators over the `documents` table (driver north
star; SURVEY.md §2.B "LLM-pipeline" rows). The reference repo's only
text processing is trim/strip (utils/data_preprocess.py:34-35); these
are the engine-surface extensions a training-data pipeline needs.

Everything here is pure built-in column expressions — no UDFs, fully
whole-stage-codegen'd, one shuffle per group-by at most. Token counting
uses (a) whitespace split and (b) a BPE-ish regex ([letters]+ |
[digits]+ | single punctuation), both expressible in DuckDB for exact
oracles. The language-ID heuristic is stopword-hit voting with a fixed
precedence tie-break — honest about being a heuristic (the synthetic
corpus shares one vocabulary across langs, so it mostly votes 'en' /
'und'); the operator's value is the deterministic, oracle-checkable
shape of a real lang-id pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round, sql_sum_r6
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the heuristic vote.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "es": ["el", "la", "de", "y", "que", "en", "los"],
    "fr": ["le", "la", "de", "et", "que", "les", "des"],
    "de": ["der", "die", "das", "und", "zu", "den", "ist"],
    "zh": ["的", "了", "是", "在", "我", "有", "和"],
}
_LANG_ORDER = ["en", "es", "fr", "de", "zh"]  # deterministic tie precedence


def ws_tokens(text: Column) -> Column:
    return F.split(text, r"\s+")


_SQL_TOK_SUM = r"CAST(sum(len(string_split_regex(text, '\s+'))) AS DOUBLE) / count(*)"


@register(
    "doc_text_stats",
    oracle=rf"""
    SELECT lang, source,
           count(*)                                   AS n_docs,
           CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens,
           {sql_det_round(_SQL_TOK_SUM, 4)} AS avg_tokens,
           {sql_det_round('CAST(sum(n_chars) AS DOUBLE) / count(*)', 4)} AS avg_chars,
           CAST(max(n_chars) AS BIGINT)               AS max_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="Corpus length statistics by (lang, source): doc counts, "
    "whitespace-token totals/averages, char-length stats.",
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(ws_tokens(F.col("text")))
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).cast("bigint").alias("total_tokens"),
            det_round(F.sum(n_tok).cast("double") / F.count(F.lit(1)), 4).alias("avg_tokens"),
            det_round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "doc_token_counts",
    oracle=rf"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT)                                  AS n_chars,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT)     AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="Per-document token counting: whitespace tokens and a BPE-ish "
    "regex tokenizer (letter-runs | digit-runs | single punctuation).",
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.size(ws_tokens(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


_STOP_EN_SQL = "', '".join(LANG_STOPWORDS["en"])

QUALITY_THRESHOLD = 0.55


def quality_parts(text: Column) -> tuple[Column, Column, Column]:
    """(n_tok, punct_ratio, stop_ratio) raw columns — the inputs of the
    quality score, shared by doc_quality_filter and the curation
    pipeline (plans/curation.py) so both gates drop the same docs."""
    n_tok = F.size(ws_tokens(text))
    punct_ratio = (
        F.length(text) - F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    ).cast("double") / F.length(text)
    stop_ratio = (
        F.size(
            F.filter(ws_tokens(F.lower(text)), lambda t: t.isin(*LANG_STOPWORDS["en"]))
        ).cast("double")
        / n_tok
    )
    return n_tok, punct_ratio, stop_ratio


def quality_score(n_tok: Column, punct_ratio: Column, stop_ratio: Column) -> Column:
    """Raw (unrounded) weighted quality score; term order matters for
    cross-engine float determinism — keep in sync with the SQL oracles."""
    return (
        0.4 * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + 0.3 * (F.lit(1.0) - punct_ratio)
        + 0.3 * F.least(stop_ratio * 10.0, F.lit(1.0))
    )


@register(
    "doc_quality_filter",
    oracle=rf"""
    WITH s AS (
        SELECT doc_id, lang,
               len(string_split_regex(text, '\s+')) AS n_tok,
               CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
                 / length(text) AS punct_ratio,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> list_contains(['{_STOP_EN_SQL}'], t))) AS DOUBLE)
                 / len(string_split_regex(text, '\s+')) AS stop_ratio
        FROM documents
        WHERE length(text) > 0
    ),
    q AS (
        SELECT doc_id, lang, n_tok, punct_ratio, stop_ratio,
               0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - punct_ratio)
             + 0.3 * least(stop_ratio * 10.0, 1.0) AS score
        FROM s
    )
    SELECT doc_id, lang,
           CAST(n_tok AS BIGINT)            AS n_tok,
           {sql_det_round('punct_ratio', 6)} AS punct_ratio,
           {sql_det_round('stop_ratio', 6)}  AS stop_ratio,
           {sql_det_round('score', 6)}       AS quality_score
    FROM q
    WHERE score >= {QUALITY_THRESHOLD}
    ORDER BY doc_id
    """,
    doc="Heuristic quality scoring (length / punctuation ratio / stopword "
    "ratio → weighted score) + threshold filter — the standard cheap "
    "quality gate of a pretraining data pipeline, as pure column math.",
)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Empty docs dropped EXPLICITLY, not via divide-by-zero -> NULL ->
    # filter: NULL-drop is engine-version-dependent (DuckDB >= 1.1
    # makes 0.0/0 NaN, which compares GREATER than the threshold), so
    # both engines gate on length(text) > 0 up front.
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tok, punct_ratio, stop_ratio = quality_parts(F.col("text"))
    score = quality_score(n_tok, punct_ratio, stop_ratio)
    return (
        docs.select(
            "doc_id",
            "lang",
            n_tok.cast("bigint").alias("n_tok"),
            det_round(punct_ratio, 6).alias("punct_ratio"),
            det_round(stop_ratio, 6).alias("stop_ratio"),
            det_round(score, 6).alias("quality_score"),
            score.alias("_score_raw"),
        )
        .filter(F.col("_score_raw") >= QUALITY_THRESHOLD)
        .drop("_score_raw")
        .orderBy("doc_id")
    )


def _lang_hits(tokens: Column, lang: str) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*LANG_STOPWORDS[lang])))


def _sql_lang_hits(lang: str) -> str:
    words = "', '".join(LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"t -> list_contains(['{words}'], t)))"
    )


@register(
    "doc_lang_id_confusion",
    oracle=f"""
    WITH hits AS (
        SELECT lang,
               {_sql_lang_hits('en')} AS h_en,
               {_sql_lang_hits('es')} AS h_es,
               {_sql_lang_hits('fr')} AS h_fr,
               {_sql_lang_hits('de')} AS h_de,
               {_sql_lang_hits('zh')} AS h_zh
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE
                 WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0 AND h_zh = 0 THEN 'und'
                 WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en >= h_zh THEN 'en'
                 WHEN h_es >= h_fr AND h_es >= h_de AND h_es >= h_zh THEN 'es'
                 WHEN h_fr >= h_de AND h_fr >= h_zh THEN 'fr'
                 WHEN h_de >= h_zh THEN 'de'
                 ELSE 'zh'
               END AS pred_lang
        FROM hits
    )
    SELECT lang, pred_lang, count(*) AS n_docs
    FROM pred
    GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang
    """,
    doc="Stopword-vote language-ID heuristic with fixed precedence "
    "tie-break, reported as a (true lang × predicted lang) confusion "
    "matrix. Honest caveat: the synthetic corpus shares one vocabulary "
    "across langs, so the vote is dominated by 'en'/'und' — the operator "
    "demonstrates the deterministic lang-id shape, not model quality.",
)
def doc_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    hits = docs.select(
        "lang", *[_lang_hits(toks, lg).alias(f"h_{lg}") for lg in _LANG_ORDER]
    )
    h = {lg: F.col(f"h_{lg}") for lg in _LANG_ORDER}
    pred = (
        F.when(sum(h.values(), F.lit(0)) == 0, F.lit("und"))
        .when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]) & (h["en"] >= h["zh"]), "en")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]) & (h["es"] >= h["zh"]), "es")
        .when((h["fr"] >= h["de"]) & (h["fr"] >= h["zh"]), "fr")
        .when(h["de"] >= h["zh"], "de")
        .otherwise("zh")
    )
    return (
        hits.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


FP_GRAM = 16  # char-16-gram rolling fingerprint


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(text) >= {FP_GRAM}
                THEN list_min(list_transform(range(1, length(text) - {FP_GRAM} + 2),
                                             i -> md5(substr(text, i, {FP_GRAM}))))
                ELSE md5(text) END AS fingerprint,
           CAST(greatest(length(text) - {FP_GRAM} + 1, 1) AS BIGINT) AS n_grams
    FROM documents
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="Rolling-hash document fingerprint (winnowing-lite): minimum md5 "
    "over all char-16-gram windows — a content-defined signature robust "
    "to local edits, computed as pure array expressions.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    # substring() with a column start position needs the SQL form.
    grams = F.expr(
        f"transform(sequence(1, length(text) - {FP_GRAM - 1}), i -> md5(substring(text, i, {FP_GRAM})))"
    )
    fp = F.when(F.length(text) >= FP_GRAM, F.array_min(grams)).otherwise(F.md5(text))
    return (
        docs.select(
            "doc_id",
            fp.alias("fingerprint"),
            F.greatest(F.length(text) - (FP_GRAM - 1), F.lit(1)).cast("bigint").alias("n_grams"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


CHUNK_LEN = 200  # chars per chunk
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


@register(
    "doc_chunking",
    oracle=f"""
    -- per-row unnest(range(0, n_chunks)): the earlier CROSS JOIN
    -- range(0, 64) silently capped the oracle at 64 chunks while the
    -- Spark side derives n_chunks unbounded — a one-sided truncation
    -- latent until a document exceeds 1 + 63 * stride chars
    SELECT doc_id,
           CAST(i AS INT)                              AS chunk_idx,
           length(substr(text, 1 + CAST(i AS INT) * {CHUNK_STRIDE}, {CHUNK_LEN})) AS chunk_len,
           md5(substr(text, 1 + CAST(i AS INT) * {CHUNK_STRIDE}, {CHUNK_LEN}))    AS chunk_md5
    FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(floor((length(text) - 1) / {CHUNK_STRIDE}) + 1 AS BIGINT))) AS i
        FROM documents
        WHERE length(text) > 0
    )
    ORDER BY doc_id, chunk_idx
    """,
    doc="Document chunking for training-sequence preparation: "
    "fixed-length overlapping character windows (200 chars, stride "
    "150) via explode(sequence) — map-only plan, no shuffle; chunk "
    "content is fingerprinted with md5 for the value-level oracle.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Empty text must yield zero chunks: without the filter, n_chunks=0
    # makes sequence(0, -1) auto-infer step -1 and emit two spurious
    # rows (chunk_idx 0 and -1) that the oracle's WHERE clause never
    # produces.
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks = F.floor((F.length("text") - 1) / CHUNK_STRIDE) + 1
    exploded = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
    )
    chunk = F.expr(f"substring(text, 1 + chunk_idx * {CHUNK_STRIDE}, {CHUNK_LEN})")
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------- TF-IDF

TFIDF_TOP = 3


@register(
    "doc_tfidf_top_terms",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS cnt
        FROM toks WHERE term <> ''
        GROUP BY doc_id, term
    ),
    doc_len AS (
        SELECT doc_id, sum(cnt) AS n_tokens FROM tf GROUP BY doc_id
    ),
    df_t AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id, tf.term,
               {sql_det_round('(CAST(cnt AS DOUBLE) / n_tokens) * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df)', 6)} AS tfidf
        FROM tf JOIN doc_len USING (doc_id) JOIN df_t USING (term)
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TFIDF_TOP}
    ORDER BY doc_id, rank
    LIMIT 1500
    """,
    doc="TF-IDF top-3 terms per document: the inverted-index layout. "
    "Term frequencies and document frequencies come from ONE "
    "(doc_id, term) aggregate — doc lengths and df both derive from it, "
    "so the corpus shuffles once on the composite key plus once on "
    "term for df. Ranking happens on the det-rounded score so both "
    "engines order identically (raw ln() can differ in the last ulp). "
    "At 100 TB: tf is the big intermediate; df_t is vocabulary-sized "
    "and AQE broadcast-joins it back.",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()  # one scalar job; becomes a literal in the plan
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("cnt").alias("n_tokens"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_t, "term")
        .select(
            "doc_id",
            "term",
            det_round(
                (F.col("cnt").cast("double") / F.col("n_tokens"))
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "term", "tfidf", F.col("rank").cast("int").alias("rank"))
        .orderBy("doc_id", "rank")
        .limit(1500)
    )


# ---------------------------------------------------------- heavy hitters

HEAVY_HITTERS_K = 20


@register(
    "token_heavy_hitters",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents
    )
    SELECT term,
           CAST(count(*) AS BIGINT)              AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM toks WHERE term <> ''
    GROUP BY term
    ORDER BY n_occurrences DESC, term
    LIMIT {HEAVY_HITTERS_K}
    """,
    doc="Global heavy-hitter tokens: top-20 by occurrence count with "
    "per-token document frequency. Map-side partial aggregation makes "
    "the shuffle O(vocabulary), not O(tokens); the final top-k is a "
    "TakeOrdered, no global sort materialized. The vocabulary-audit "
    "staple of a pretraining corpus.",
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(HEAVY_HITTERS_K)
    )


# ------------------------------------------------------ sequence packing

PACK_BUDGET = 2048  # tokens per training window


@register(
    "doc_pack_windows",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM toks
    ),
    packed AS (
        SELECT source, doc_id, n_tok,
               CAST((cum_tok - n_tok) // {PACK_BUDGET} AS BIGINT) AS pack_id
        FROM cum
    )
    SELECT source, pack_id,
           CAST(count(*) AS BIGINT)    AS n_docs,
           CAST(sum(n_tok) AS BIGINT)  AS n_tokens,
           min(doc_id)                 AS first_doc,
           max(doc_id)                 AS last_doc
    FROM packed
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    LIMIT 1000
    """,
    doc="Sequence packing (concat-then-split): docs are laid out in "
    "deterministic (source, doc_id) order, token counts prefix-summed, "
    "and each doc assigned to the 2048-token training window its start "
    "offset falls in — the standard pretraining batch-packing layout. "
    "One window function partitioned by source (parallel across "
    "sources, no global window), then one aggregate.",
)
def doc_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
        )
    )
    toks = docs.select("doc_id", "source", n_tok.alias("n_tok"))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / PACK_BUDGET).cast(
            "bigint"
        ),
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
        .limit(1000)
    )


# ------------------------------------------------------ count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_col_spark(term, d: int):
    """Deterministic CMS cell hash: first 8 hex digits of md5(term:d)
    mod width. md5 exists JVM-side and in DuckDB, so the whole sketch —
    an approximation STRUCTURE — is still exactly reproducible."""
    return (
        F.conv(F.substring(F.md5(F.concat(term, F.lit(f":{d}"))), 1, 8), 16, 10)
        .cast("long")
        % CMS_WIDTH
    )


def _cms_col_sql(term: str, d: int) -> str:
    return f"(('0x' || substr(md5({term} || ':{d}'), 1, 8))::BIGINT % {CMS_WIDTH})"


@register(
    "token_cms_estimates",
    oracle=rf"""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT term, count(*) AS cnt FROM toks WHERE term <> '' GROUP BY term
    ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT {d} AS d, {_cms_col_sql('term', d)} AS col, sum(cnt) AS cell FROM tf GROUP BY 2"
            for d in range(CMS_DEPTH)
        )}
    ),
    top AS (
        SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 20
    ),
    probes AS (
        {" UNION ALL ".join(
            f"SELECT term, cnt, {d} AS d, {_cms_col_sql('term', d)} AS col FROM top"
            for d in range(CMS_DEPTH)
        )}
    )
    SELECT p.term,
           CAST(p.cnt AS BIGINT)  AS true_count,
           CAST(min(c.cell) AS BIGINT) AS cms_estimate
    FROM probes p JOIN cells c USING (d, col)
    GROUP BY p.term, p.cnt
    ORDER BY true_count DESC, term
    """,
    doc="Count-min sketch (depth 4 × width 1024) with DISTRIBUTED merge: "
    "cell totals are a plain (d, col) aggregate — associative, so "
    "map-side partials merge like any sum, the way sketch shards merge "
    "across 1000 executors. Estimates (min over rows) are reported next "
    "to true counts for the exact top-20 terms; the md5 cell hash makes "
    "the whole sketch deterministic, so even this approximation "
    "structure gets a full value oracle. est ≥ true always; "
    "est ≤ true + εN w.h.p. is property-tested.",
)
def token_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    # sketch cells: every term lands in one cell per depth row
    cell_rows = tf.select(
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_col_spark(F.col("term"), d).alias("col")
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("dc"),
    ).select("dc.d", "dc.col", "cnt")
    cells = cell_rows.groupBy("d", "col").agg(F.sum("cnt").alias("cell"))
    top = tf.orderBy(F.desc("cnt"), F.asc("term")).limit(20)
    probes = top.select(
        "term",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_col_spark(F.col("term"), d).alias("col")
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("dc"),
    ).select("term", "cnt", "dc.d", "dc.col")
    return (
        probes.join(F.broadcast(cells), ["d", "col"])
        .groupBy("term", "cnt")
        .agg(F.min("cell").alias("cms_estimate"))
        .select(
            "term",
            F.col("cnt").cast("bigint").alias("true_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        )
        .orderBy(F.desc("true_count"), F.asc("term"))
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]+"


@register(
    "doc_pii_scrub",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 7 = 0
                            THEN ' contact user' || doc_id || '@example.com or +1-555-' || doc_id
                            ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM aug
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="PII scrubbing pass (pretraining-pipeline staple): detect and "
    "redact email/phone patterns with regexp_replace; deterministic "
    "synthetic PII is injected for 1-in-7 docs so the scrub is "
    "observable, and the scrubbed text is md5-fingerprinted for the "
    "oracle. Map-only plan.",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), 0)).cast("int").alias("n_emails"),
            F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), 0)).cast("int").alias("n_phones"),
            F.md5(scrubbed).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# --------------------------------------------------- repetition signals


@register(
    "doc_repetition_stats",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
    ),
    base AS (
        SELECT doc_id, len(t) AS n_words, len(list_distinct(t)) AS n_distinct
        FROM toks
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks WHERE len(t) >= 2
    ),
    gc AS (
        SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    ),
    gstats AS (
        SELECT doc_id, max(c) AS top_c, sum(c) AS n_g FROM gc GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           {sql_det_round('1.0 - CAST(n_distinct AS DOUBLE) / n_words', 6)} AS dup_word_frac,
           CAST(coalesce(top_c, 0) AS BIGINT) AS top_bigram_count,
           {sql_det_round('coalesce(CAST(top_c AS DOUBLE) / n_g, 0.0)', 6)} AS top_bigram_frac
    FROM base b LEFT JOIN gstats g USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Gopher-style repetition quality signals per document: "
    "duplicate-word fraction (1 - distinct/total) and the frequency "
    "share of the most repeated word bigram. The bigram mode is "
    "computed by explode → count per (doc, gram) → max per doc — two "
    "map-side-combining shuffles keyed on the document, never an "
    "O(n²) per-row array scan, so a 100 TB corpus streams through. "
    "High values on either signal are the standard pretraining "
    "filter cut (Rae et al., Gopher §A1.2).",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("t"))
    base = toks.select(
        "doc_id",
        F.size("t").alias("n_words"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
    )
    grams = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("g"),
    )
    gstats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_g"))
    )
    return (
        base.join(gstats, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            det_round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_words"), 6
            ).alias("dup_word_frac"),
            F.coalesce(F.col("top_c"), F.lit(0)).cast("bigint").alias("top_bigram_count"),
            det_round(
                F.coalesce(F.col("top_c").cast("double") / F.col("n_g"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------ deterministic stratified sample

SAMPLE_PER_LANG_K = 20


@register(
    "doc_sample_per_lang",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS sample_rank
        FROM documents
    )
    SELECT lang, doc_id, CAST(sample_rank AS INT) AS sample_rank
    FROM ranked WHERE sample_rank <= {SAMPLE_PER_LANG_K}
    ORDER BY lang, sample_rank
    """,
    doc="Deterministic stratified sampling: the 20 docs with the "
    "smallest md5(doc_id) per language — a reproducible reservoir "
    "whose membership is a pure function of the key (re-runs and "
    "cluster-layout changes pick the same rows, unlike rand()). "
    "Scale shape via operators.scale.hash_sample_per_stratum: a "
    "hash-prefix threshold from broadcast-size strata counts cuts "
    "each stratum to ~32k survivors map-side BEFORE the top-k "
    "window, so no reducer ever sorts a full stratum; the oracle is "
    "the plain window form, which the thresholded plan provably "
    "(Chernoff) equals.",
)
def doc_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.operators.scale import hash_sample_per_stratum

    docs = load(spark, sf_dir, "documents").select("lang", "doc_id")
    return (
        hash_sample_per_stratum(docs, "lang", "doc_id", SAMPLE_PER_LANG_K)
        .select("lang", "doc_id", F.col("sample_rank").cast("int").alias("sample_rank"))
        .orderBy("lang", "sample_rank")
    )


# ------------------------------------------ RAKE keyphrase extraction

# Union of the per-language stopword votes — RAKE phrase delimiters.
RAKE_STOPS = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
RAKE_TOP = 20


def _rake_stop_sql() -> str:
    return ", ".join("'" + w + "'" for w in RAKE_STOPS)


@register(
    "doc_rake_keyphrases",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    pos AS (
        SELECT doc_id, i, toks[i] AS tok,
               (toks[i] IN ({_rake_stop_sql()}) OR toks[i] = '') AS is_stop
        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
              FROM tok)
    ),
    runs AS (
        SELECT doc_id, i, tok,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island
        FROM pos WHERE NOT is_stop
    ),
    phrases AS (
        SELECT doc_id, island,
               string_agg(tok, ' ' ORDER BY i) AS phrase,
               count(*) AS plen
        FROM runs GROUP BY doc_id, island
    ),
    pw AS (
        SELECT p.doc_id, p.island, p.phrase, p.plen, r.tok
        FROM phrases p JOIN runs r
          ON r.doc_id = p.doc_id AND r.island = p.island
    ),
    wstat AS (
        SELECT tok,
               count(*) AS freq,
               sum(plen) AS deg
        FROM pw GROUP BY tok
    ),
    pscore AS (
        SELECT pw.doc_id, pw.island, pw.phrase,
               {sql_sum_r6('CAST(wstat.deg AS DOUBLE) / CAST(wstat.freq AS DOUBLE)')} AS score
        FROM pw JOIN wstat USING (tok)
        GROUP BY pw.doc_id, pw.island, pw.phrase
    ),
    agg AS (
        SELECT phrase,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               {sql_det_round('max(score)', 6)} AS rake_score
        FROM pscore GROUP BY phrase
    )
    SELECT phrase, n_occurrences, rake_score
    FROM agg
    ORDER BY rake_score DESC, phrase
    LIMIT {RAKE_TOP}
    """,
    doc="RAKE keyphrase extraction (Rose et al. 2010) corpus-wide: "
    "stopwords delimit candidate phrases (gaps-and-islands per doc — "
    "the run window is doc-length-bounded), word degree/frequency "
    "statistics aggregate over ALL phrase occurrences on the token "
    "key (inverted-index layout), phrase score = Σ deg(w)/freq(w) "
    "det_round+decimal-summed, top-20 by score with deterministic "
    "tiebreak. Integer-ratio word scores make the extraction "
    "hash-checkable.",
)
def doc_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from empdia_iceberg_spark.functions.exact import exact_sum_r6

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    pos = tok.select(
        "doc_id", F.posexplode("toks").alias("i0", "tok")
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        "tok",
        (F.col("tok").isin(*RAKE_STOPS) | (F.col("tok") == "")).alias("is_stop"),
    )
    runs = (
        pos.filter(~F.col("is_stop"))
        .withColumn(
            "island",
            F.col("i")
            - F.row_number().over(W.partitionBy("doc_id").orderBy("i")),
        )
        .select("doc_id", "i", "tok", "island")
    )
    phrases = runs.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    pw = phrases.join(runs, ["doc_id", "island"]).select(
        "doc_id", "island", "phrase", "plen", "tok"
    )
    wstat = pw.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    pscore = (
        pw.join(wstat, "tok")
        .groupBy("doc_id", "island", "phrase")
        .agg(
            exact_sum_r6(
                det_round(
                    F.col("deg").cast("double") / F.col("freq").cast("double"), 6
                )
            ).alias("score")
        )
    )
    agg = pscore.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        det_round(F.max("score"), 6).alias("rake_score"),
    )
    return agg.orderBy(F.col("rake_score").desc(), "phrase").limit(RAKE_TOP)


# --------------------------------------------- vocabulary coverage

OOV_VOCAB_SIZE = 1000


@register(
    "doc_oov_rate",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents
    ),
    tf AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
    vocab AS (
        SELECT w FROM tf ORDER BY c DESC, w LIMIT {OOV_VOCAB_SIZE}
    ),
    per_doc AS (
        SELECT t.doc_id, t.lang,
               count(*) AS n_toks,
               count(CASE WHEN v.w IS NULL THEN 1 END) AS n_oov
        FROM (SELECT * FROM toks WHERE w <> '') t
        LEFT JOIN vocab v ON v.w = t.w
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           {sql_det_round('CAST(sum(n_oov) AS DOUBLE) / sum(n_toks)', 6)} AS oov_rate
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Vocabulary-coverage diagnostic (tokenizer-fit / domain-shift "
    "screen): the top-1000 corpus tokens form the vocabulary "
    "(TakeOrdered over the term-frequency aggregate — never a "
    "vocabulary-wide window), every token left-joins against the "
    "BROADCAST vocab, and per-language out-of-vocabulary rates come "
    "from exact integer counts ⇒ hash-green. High OOV for a "
    "language = the tokenizer/vocab underserves it — the check run "
    "before committing a 100 TB tokenization pass.",
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    tf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = tf.orderBy(F.col("c").desc(), "w").limit(OOV_VOCAB_SIZE).select(
        "w", F.lit(True).alias("in_vocab")
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            det_round(
                F.sum("n_oov").cast("double") / F.sum("n_toks"), 6
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )
