"""Retrieval operators: BM25 lexical search and reciprocal-rank
fusion of a lexical and a dense (embedding-cosine) ranking — the
query-side complement to the corpus-side text/similarity stacks
(`operators/textstats.py`, `operators/similarity.py`), and the shape a
RAG/data-curation pipeline runs to pull evidence out of a 100 TB
corpus.

Cross-engine discipline (the repo-wide rules from
`functions/exact.py`): every ln() is det_round-ed to 9 digits before
entering a sum, per-document score series are summed exactly in
DECIMAL, final scores are det_round-ed to 6 — so rankings (computed on
the rounded score with id tiebreaks) are identical on both engines and
the whole retrieval stack is hash-checkable.

Scale shape:
- BM25: one (doc_id, term) aggregate over the tokenized corpus (the
  inverted-index layout — same shuffle doc_tfidf_top_terms pays), a
  vocabulary-sized df join (AQE broadcasts it), and a TakeOrdered
  top-k — never a global sort or window over the corpus.
- Ranking windows only ever run over LIMIT-bounded candidate sets
  (top-100 by construction), the corpus_zipf_slope discipline.
- RRF: two bounded candidate lists full-outer-joined on the doc key —
  a ~100-row join regardless of corpus size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

# BM25 constants (Robertson's defaults) and the fixed benchmark query.
BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS = ["hash", "join", "stream"]
BM25_TOP = 20
RRF_CAND = 100  # candidate depth per ranking
RRF_K = 60  # the standard RRF dampening constant
RRF_TOP = 10
RRF_QUERY_VEC_ID = 1  # dense query = this corpus vector (deterministic)

_QUERY_SQL_LIST = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# idf(t) = ln(1 + (N − df + ½)/(df + ½)); tf part is the standard
# saturating quotient. Identical expression text on both engines.
_IDF = "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
_TFPART = "(cnt * (1.0 + %s)) / (cnt + %s * (1.0 - %s + %s * dl / avgdl))" % (
    BM25_K1,
    BM25_K1,
    BM25_B,
    BM25_B,
)


def _bm25_scored_sql() -> str:
    """Shared oracle CTE chain producing (doc_id, score) BM25 rows."""
    return rf"""
    toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS cnt
        FROM toks WHERE term <> ''
        GROUP BY doc_id, term
    ),
    doc_len AS (
        SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS dl FROM tf GROUP BY doc_id
    ),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM doc_len
    ),
    df_t AS (
        SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
        WHERE term IN ({_QUERY_SQL_LIST}) GROUP BY term
    ),
    terms AS (
        SELECT tf.doc_id,
               {sql_det_round(f'({_IDF}) * ({_TFPART})', 9)} AS t_score
        FROM tf
        JOIN df_t USING (term)
        JOIN doc_len USING (doc_id)
        CROSS JOIN stats
    ),
    scored AS (
        SELECT doc_id,
               {sql_det_round('CAST(sum(CAST(t_score AS DECIMAL(28,9))) AS DOUBLE)', 6)} AS score
        FROM terms GROUP BY doc_id
    )
    """


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) BM25 rows for QUERY_TERMS — the Spark twin of
    `_bm25_scored_sql`."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    doc_len = tf.groupBy("doc_id").agg(F.sum("cnt").cast("double").alias("dl"))
    stats = doc_len.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    df_t = (
        tf.filter(F.col("term").isin(QUERY_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    terms = (
        tf.join(F.broadcast(df_t), ["term"])
        .join(doc_len, ["doc_id"])
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            det_round(F.expr(f"({_IDF}) * ({_TFPART})"), 9).alias("t_score"),
        )
    )
    return terms.groupBy("doc_id").agg(
        det_round(
            F.sum(F.col("t_score").cast("decimal(28,9)")).cast("double"), 6
        ).alias("score")
    )


@register(
    "doc_bm25_search",
    oracle=f"""
    WITH {_bm25_scored_sql()},
    top AS (
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT {BM25_TOP}
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
           doc_id, score
    FROM top ORDER BY rank
    """,
    doc=f"BM25 lexical search for the fixed query {QUERY_TERMS}: "
    "inverted-index (doc_id, term) aggregate, vocabulary-sized df "
    "broadcast join, per-term saturating scores det-rounded then "
    "decimal-summed per doc, global top-20 via TakeOrdered (orderBy+"
    "limit — no corpus-wide window); the rank label is assigned on "
    "the LIMIT-bounded result only. Hash-checkable lexical ranking.",
)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOP)
    w = W.orderBy(F.col("score").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "doc_id", "score"
    ).orderBy("rank")


@register(
    "doc_rrf_fusion",
    oracle=f"""
    WITH {_bm25_scored_sql()},
    lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
        FROM (SELECT doc_id, score FROM scored
              ORDER BY score DESC, doc_id LIMIT {RRF_CAND})
    ),
    qv AS (
        SELECT embedding FROM embeddings WHERE vec_id = {RRF_QUERY_VEC_ID}
    ),
    dense_scored AS (
        SELECT e.vec_id AS doc_id,
               {sql_det_round('list_cosine_similarity(e.embedding::DOUBLE[], qv.embedding::DOUBLE[])', 6)} AS cos
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id <> {RRF_QUERY_VEC_ID}
    ),
    dense AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS r
        FROM (SELECT doc_id, cos FROM dense_scored
              ORDER BY cos DESC, doc_id LIMIT {RRF_CAND})
    ),
    fused AS (
        SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
               lex.r AS lex_rank, dense.r AS dense_rank,
               {sql_det_round(
                   f'coalesce(1.0 / ({RRF_K} + lex.r), 0.0)'
                   f' + coalesce(1.0 / ({RRF_K} + dense.r), 0.0)', 9)} AS rrf
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    )
    SELECT doc_id, lex_rank, dense_rank, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """,
    doc="Reciprocal-rank fusion of the BM25 lexical ranking and a "
    "dense embedding-cosine ranking (query = a fixed corpus vector, "
    "broadcast 1-row join — no collect). Each candidate list is "
    "LIMIT-bounded to 100 before its rank window, so the windows and "
    "the full-outer fusion join run over ~100 rows regardless of "
    "corpus size; rrf = Σ 1/(60+r) over identical integer ranks — "
    "hash-checkable hybrid retrieval.",
)
def doc_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lexical candidates: bounded TakeOrdered, then rank the 100 rows
    lex_top = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(RRF_CAND)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), "doc_id"))
        .cast("bigint")
        .alias("r"),
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qv = emb.filter(F.col("vec_id") == RRF_QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    # the ONE shared cosine fold (similarity.jvm_cosine) — identical
    # IEEE order on both engines; arrays cast to double first
    # (float32 inputs), exactly the established pattern at
    # similarity.py's semantic-prune/decontaminate call sites
    from empdia_iceberg_spark.operators.similarity import jvm_cosine

    dense_scored = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            det_round(
                jvm_cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("qv").cast("array<double>"),
                ),
                6,
            ).alias("cos"),
        )
    )
    dense_top = dense_scored.orderBy(F.col("cos").desc(), "doc_id").limit(RRF_CAND)
    dense = dense_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("cos").desc(), "doc_id"))
        .cast("bigint")
        .alias("r"),
    )

    fused = (
        lex.withColumnRenamed("r", "lex_rank")
        .join(
            dense.withColumnRenamed("r", "dense_rank"),
            ["doc_id"],
            "full_outer",
        )
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            det_round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
                ),
                9,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(RRF_TOP)


# ------------------------------------------ positional phrase search

PHRASE_Q = ("fast", "table")  # the benchmark two-token phrase query
PHRASE_TOP = 20


@register(
    "doc_phrase_search",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    postings AS (
        SELECT doc_id, toks[i] AS tok, i AS pos
        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
              FROM tok)
        WHERE toks[i] IN ('{PHRASE_Q[0]}', '{PHRASE_Q[1]}')
    ),
    hits AS (
        SELECT a.doc_id, count(*) AS n_occurrences
        FROM postings a JOIN postings b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = '{PHRASE_Q[0]}' AND b.tok = '{PHRASE_Q[1]}'
        GROUP BY a.doc_id
    )
    SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM hits
    ORDER BY n_occurrences DESC, doc_id
    LIMIT {PHRASE_TOP}
    """,
    doc="Exact-phrase search over a POSITIONAL inverted index (the "
    "structure behind quoted-phrase queries): posting lists carry "
    "(doc, position), only the query terms' postings survive the "
    "pushed token filter, and phrase occurrences are an adjacency "
    "equi-join on (doc, pos+1) — shuffles move tiny posting rows "
    "keyed by doc, never documents. Top-20 by occurrence count with "
    "deterministic tiebreak; exact integer counts ⇒ hash-green.",
)
def doc_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    postings = (
        tok.select("doc_id", F.posexplode("toks").alias("i0", "tok"))
        .filter(F.col("tok").isin(*PHRASE_Q))
        .select("doc_id", "tok", (F.col("i0") + 1).alias("pos"))
    )
    a = postings.filter(F.col("tok") == PHRASE_Q[0]).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = postings.filter(F.col("tok") == PHRASE_Q[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pa")
    )
    hits = (
        a.join(b, ["doc_id", "pa"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    return hits.orderBy(F.col("n_occurrences").desc(), "doc_id").limit(PHRASE_TOP)


# --------------------------------------- retrieve → rerank pipeline

RERANK_HEAD = 64  # the "cross-encoder" reads the first 64 tokens


def _rerank_stub_udf():
    """Deterministic cross-encoder STUB with the production shape: an
    Arrow-batched pandas_udf scoring (query, doc-head) pairs — the
    executor-singleton slot where a real reranker checkpoint would
    load (mirroring functions/classifier.py's env-gated pattern).
    The stub's score is query-term density over the first
    RERANK_HEAD tokens, a pure function of the text that the oracle
    reproduces in SQL."""
    terms = set(QUERY_TERMS)

    def score(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            head = (t or "").lower().split()[:RERANK_HEAD]
            hits = sum(1 for w in head if w in terms)
            out.append(hits / max(len(head), 1))
        return pd.Series(out)

    return F.pandas_udf(score, "double")


@register(
    "doc_rerank_crossencoder",
    oracle=rf"""
    WITH {_bm25_scored_sql()},
    top AS (
        SELECT doc_id, score AS bm25_score FROM scored
        ORDER BY score DESC, doc_id LIMIT {BM25_TOP}
    ),
    heads AS (
        SELECT t.doc_id, t.bm25_score,
               list_slice(list_filter(string_split_regex(lower(d.text), '\s+'),
                                      x -> x <> ''), 1, {RERANK_HEAD}) AS head
        FROM top t JOIN documents d ON d.doc_id = t.doc_id
    ),
    reranked AS (
        SELECT doc_id, bm25_score,
               {sql_det_round(
                   'CAST(len(list_filter(head, x -> x IN (' + _QUERY_SQL_LIST + '))) AS DOUBLE)'
                   ' / greatest(len(head), 1)', 6)} AS rerank_score
        FROM heads
    )
    SELECT CAST(row_number() OVER (ORDER BY rerank_score DESC, bm25_score DESC, doc_id) AS INT) AS rank,
           doc_id, bm25_score, rerank_score
    FROM reranked
    ORDER BY rank
    """,
    doc="Retrieve→rerank pipeline (the RAG serving shape): BM25 pulls "
    "top-20 candidates from the inverted index, then an Arrow-batched "
    "cross-encoder STUB re-scores each (query, doc-head) pair — the "
    "executor-singleton pandas_udf slot a real reranker checkpoint "
    "drops into. Only the LIMIT-bounded candidates reach the model "
    "(20 rows regardless of corpus size); the stub score is a pure "
    "text function the oracle mirrors, so the fused reranking is "
    "hash-checkable end-to-end.",
)
def doc_rerank_crossencoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOP)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    heads = top.withColumnRenamed("score", "bm25_score").join(docs, "doc_id")
    rerank = _rerank_stub_udf()
    reranked = heads.select(
        "doc_id",
        "bm25_score",
        det_round(rerank(F.col("text")), 6).alias("rerank_score"),
    )
    w = W.orderBy(
        F.col("rerank_score").desc(), F.col("bm25_score").desc(), F.col("doc_id")
    )
    return reranked.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        "bm25_score",
        "rerank_score",
    ).orderBy("rank")
