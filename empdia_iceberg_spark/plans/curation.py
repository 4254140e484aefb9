"""End-to-end corpus curation pipeline — the flagship composition of the
training-data operators (SURVEY.md §2.B "LLM-pipeline" rows) into the
funnel every pretraining corpus goes through before a token is trained
on:

    raw documents
      → quality gate        (heuristic score ≥ threshold; textstats.py)
      → exact dedup         (keep min doc_id per sha256(text); dedup.py)
      → decontamination     (drop docs sharing ≥ 20% of their word-3-gram
                             shingles with the benchmark set, and the
                             benchmark docs themselves; dedup.py)
      → hash split          (md5(doc_id) mod 100 → 80/10/10; relational.py)

Each stage reuses the exact column expressions of its standalone
operator (imported, not re-derived), so the composed pipeline drops
precisely the documents the individual gates drop — and the chained
DuckDB oracle proves it value-for-value.

100 TB posture, stage by stage: the quality gate is map-only column
math; dedup is one shuffle on the uniformly-distributed content hash
with map-side partial aggregation; decontamination broadcasts the
(eval-suite-sized) benchmark shingle set so the corpus-side explode
never shuffles document text — the only exchange is the per-doc hit
rollup on doc_id; split assignment is a pure per-row hash, map-only.
Nothing in the funnel materializes an intermediate corpus copy, and
every reported result is an aggregate (counts per split×lang / per
stage), so driver-side data never exceeds a few rows at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.operators.dedup import (
    BENCH_MOD,
    CONTAM_THRESHOLD,
    _SQL_SHINGLES,
    word_shingles,
)
from empdia_iceberg_spark.operators.relational import SPLIT_PCT
from empdia_iceberg_spark.operators.textstats import (
    _STOP_EN_SQL,
    QUALITY_THRESHOLD,
    quality_parts,
    quality_score,
)
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load


def _quality_docs(docs: DataFrame) -> DataFrame:
    """Stage 1: documents passing the heuristic quality gate (same raw
    score expression as doc_quality_filter — shared helpers)."""
    n_tok, punct_ratio, stop_ratio = quality_parts(F.col("text"))
    score = quality_score(n_tok, punct_ratio, stop_ratio)
    # explicit empty-text gate, same rationale as doc_quality_filter:
    # engine-version-independent drop instead of divide-by-zero NULL/NaN
    return (
        docs.filter(F.length("text") > 0)
        .filter(score >= QUALITY_THRESHOLD)
        .select("doc_id", "lang", "text")
    )


def _dedup_survivors(quality: DataFrame) -> DataFrame:
    """Stage 2: exact-dedup survivors among quality-passing docs — keep
    the min doc_id per content hash (doc_dedup_survivors semantics)."""
    return (
        quality.groupBy(F.sha2(F.col("text"), 256).alias("_h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .drop("_h")
    )


def _decontaminated(docs: DataFrame, kept: DataFrame) -> DataFrame:
    """Stage 3: drop benchmark docs (doc_id % BENCH_MOD == 0) and kept
    docs whose shingle overlap with the benchmark set reaches the
    contamination threshold (doc_decontaminate semantics). The benchmark
    shingle set comes from the FULL corpus — the eval suite is fixed
    regardless of what the quality/dedup gates dropped upstream."""
    bench = (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode(word_shingles(F.col("text"))).alias("shingle"))
        .distinct()
    )
    # The dedup aggregate upstream leaves the survivors on a handful of
    # AQE-coalesced partitions; spread them before the (CPU-heavy)
    # shingling so the explode parallelizes.
    corpus = kept.filter(F.col("doc_id") % BENCH_MOD != 0).repartition(
        kept.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    )
    # Materialize the shingle array as a named column BEFORE size/explode:
    # referencing one alias twice keeps CollapseProject from inlining the
    # transform() into both consumers (which would recompute the whole
    # shingle array per exploded row — quadratic per document).
    sh = corpus.select("doc_id", "lang", word_shingles(F.col("text")).alias("sh"))
    ex = sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    flagged = (
        ex.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit").cast("double") / F.col("n_sh") >= CONTAM_THRESHOLD)
        .select("doc_id")
    )
    return corpus.join(flagged, "doc_id", "left_anti")


def _split_col() -> F.Column:
    """Stage 4: deterministic hash split (hash_split_assignments bucket)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[0] + SPLIT_PCT[1], "val")
        .otherwise("test")
    )


# Shared CTE chain: every stage of the funnel, mirrored stage-for-stage
# from the Spark expressions above (and from the standalone operators'
# oracles, which are hash-green individually).
_FUNNEL_CTES = rf"""
    s AS (
        SELECT doc_id, lang, text,
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
        SELECT doc_id, lang, text FROM s
        WHERE 0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
            + 0.3 * (1.0 - punct_ratio)
            + 0.3 * least(stop_ratio * 10.0, 1.0) >= {QUALITY_THRESHOLD}
    ),
    kept AS (
        SELECT min(doc_id)            AS doc_id,
               arg_min(lang, doc_id)  AS lang,
               arg_min(text, doc_id)  AS text
        FROM q GROUP BY sha256(text)
    ),
    btoks AS (
        SELECT string_split_regex(text, '\s+') AS t
        FROM documents WHERE doc_id % {BENCH_MOD} = 0
    ),
    bench AS (
        SELECT DISTINCT unnest({_SQL_SHINGLES}) AS shingle FROM btoks
    ),
    ktoks AS (
        SELECT doc_id, lang, string_split_regex(text, '\s+') AS t
        FROM kept WHERE doc_id % {BENCH_MOD} <> 0
    ),
    ksh AS (
        SELECT doc_id, lang, {_SQL_SHINGLES} AS sh FROM ktoks
    ),
    kex AS (
        SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM ksh
    ),
    flagged AS (
        SELECT doc_id
        FROM kex JOIN bench USING (shingle)
        GROUP BY doc_id, n_sh
        HAVING CAST(count(*) AS DOUBLE) / n_sh >= {CONTAM_THRESHOLD}
    ),
    clean AS (
        SELECT doc_id, lang FROM ksh
        WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    )
"""


@register(
    "curation_pipeline",
    oracle=rf"""
    WITH {_FUNNEL_CTES}
    SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {SPLIT_PCT[0]} THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {SPLIT_PCT[0] + SPLIT_PCT[1]} THEN 'val'
                ELSE 'test' END    AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id)              AS min_doc,
           max(doc_id)              AS max_doc
    FROM clean
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="Flagship end-to-end curation: quality gate → exact-dedup "
    "survivors → benchmark decontamination → 80/10/10 hash split, each "
    "stage reusing its standalone operator's exact expressions, "
    "summarized per split×lang. The whole funnel is three exchanges "
    "(content-hash dedup, per-doc contamination rollup, final tiny "
    "aggregate) regardless of corpus size.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    clean = _decontaminated(docs, _dedup_survivors(_quality_docs(docs)))
    return (
        clean.select(_split_col().alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split", "lang")
    )


@register(
    "curation_funnel_counts",
    oracle=rf"""
    WITH {_FUNNEL_CTES}
    SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM documents
    UNION ALL
    SELECT '2_quality', CAST(count(*) AS BIGINT) FROM q
    UNION ALL
    SELECT '3_dedup_survivors', CAST(count(*) AS BIGINT) FROM kept
    UNION ALL
    SELECT '4_decontaminated', CAST(count(*) AS BIGINT) FROM clean
    ORDER BY stage
    """,
    doc="Curation-funnel audit report: documents remaining after each "
    "stage of curation_pipeline. Every branch reduces to a scalar "
    "before the driver sees it — the report costs four aggregates and "
    "returns four rows at any corpus size.",
)
def curation_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    quality = _quality_docs(docs)
    kept = _dedup_survivors(quality)
    clean = _decontaminated(docs, kept)
    base = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_raw"))
    n_q = quality.agg(F.count(F.lit(1)).cast("bigint").alias("n_quality"))
    n_k = kept.agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    n_c = clean.agg(F.count(F.lit(1)).cast("bigint").alias("n_clean"))
    counts = base.crossJoin(n_q).crossJoin(n_k).crossJoin(n_c)
    return counts.select(
        F.expr(
            "stack(4, '1_raw', n_raw, '2_quality', n_quality, "
            "'3_dedup_survivors', n_kept, '4_decontaminated', n_clean) "
            "AS (stage, n_docs)"
        )
    ).orderBy("stage")
