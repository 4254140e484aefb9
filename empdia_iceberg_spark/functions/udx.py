"""UDTF + grouped-agg UDAF surface (SURVEY.md §2.B UDF/UDAF/UDTF row).

- **Python UDTF** (`@udtf`, Spark 3.5+): a sentence/window expander —
  one input document row → one output row per word-window. Registered
  against a DuckDB unnest oracle, so the table-function contract is
  value-checked, not just smoke-run.
- **grouped-agg pandas UDAF**: a true vectorized aggregate (weighted
  mean via numpy over Arrow batches) — distinct from the grouped-MAP
  `applyInPandas` used by the reward cross-check. Exact-decimal math
  inside the UDAF keeps it order-independent so the DuckDB oracle
  hash-matches.

Both are the slow-path escape hatches of the engine: used only where
built-ins can't express the op, always Arrow-batched, never per-row
Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

WINDOW_WORDS = 10  # word-window length for the UDTF expander
WINDOW_STRIDE = 10  # non-overlapping


def _word_windows_udtf():
    """Built lazily (UDTF registration needs an active session)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx int, n_words int, first_word string")
    class WordWindows:
        MAX_WINDOWS = 4096  # mirrored by the oracle's range(0, 4096)

        def eval(self, text: str):
            # split() drops empty tokens (and yields [] for empty or
            # whitespace-only text) — the oracle filters empties from
            # its regex split to tokenize identically.
            words = (text or "").split()
            for i, lo in enumerate(range(0, len(words), WINDOW_STRIDE)):
                if i >= self.MAX_WINDOWS:
                    break
                chunk = words[lo : lo + WINDOW_WORDS]
                yield i, len(chunk), chunk[0]

    return WordWindows


@register(
    "udtf_word_windows",
    oracle=f"""
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT)                                        AS win_idx,
           CAST(least({WINDOW_WORDS}, len(w) - i * {WINDOW_STRIDE}) AS INT) AS n_words,
           w[1 + i * {WINDOW_STRIDE}]                             AS first_word
    FROM words
    CROSS JOIN range(0, 4096) r(i)
    WHERE i * {WINDOW_STRIDE} < len(w)
    ORDER BY doc_id, win_idx
    LIMIT 5000
    """,
    doc="Python UDTF (table function): expand each document into "
    "10-word windows via a lateral join — one input row, many output "
    "rows; value-checked against a DuckDB unnest oracle.",
)
def udtf_word_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    WordWindows = _word_windows_udtf()
    spark.udtf.register("word_windows", WordWindows)
    load(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, w.win_idx, w.n_words, w.first_word
        FROM _docs_udtf d, LATERAL word_windows(d.text) w
        ORDER BY d.doc_id, w.win_idx
        LIMIT 5000
        """
    )


def _weighted_mean_udaf():
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        import numpy as np

        # value is exactly 2-decimal (see functions.exact): sum in
        # integer cents so the result is order-independent and matches
        # the oracle's DECIMAL(18,2) sum bit-for-bit. floor(v·100+0.5)
        # recovers the exact cents from the nearest-double value.
        cents = np.floor(v.to_numpy(dtype="float64") * 100.0 + 0.5)
        wt = w.to_numpy(dtype="float64")
        num = float((cents * wt).sum())  # exact: integer-valued float64
        den = float(wt.sum())
        return (num / 100.0) / den

    return F.pandas_udf(weighted_mean, "double")


def _count_udaf():
    # grouped-agg pandas UDFs cannot mix with built-in aggregates in one
    # agg() — the row count rides along as a second pandas aggregate
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    return F.pandas_udf(n_rows, "long")


@register(
    "udaf_weighted_value",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           {sql_det_round('CAST(sum(CAST(value AS DECIMAL(18,2)) * (event_id % 10 + 1)) AS DOUBLE) / CAST(sum(event_id % 10 + 1) AS DOUBLE)', 4)} AS wavg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Grouped-agg pandas UDAF: weighted mean of event value per type "
    "(vectorized numpy over Arrow batches) — the custom-aggregate "
    "escape hatch, value-checked against the relational formulation.",
)
def udaf_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "weight", (F.col("event_id") % 10 + 1).cast("double")
    )
    wavg = _weighted_mean_udaf()
    n_rows = _count_udaf()
    return (
        ev.groupBy("event_type")
        .agg(
            n_rows("value").alias("n_events"),
            det_round(wavg("value", "weight"), 4).alias("wavg_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------- polymorphic UDTF (analyze())

FIXED_COLS = 4  # leading tokens split into this many typed columns


def _split_fixed_udtf():
    """Spark 4 POLYMORPHIC UDTF: the output schema is computed by the
    static ``analyze()`` hook from the literal column-count argument —
    the table function adapts its shape per call site instead of
    declaring one static returnType. Built lazily (needs a session)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            assert n.isConstantExpression, "n must be a literal"
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"tok{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            words = (text or "").split()
            yield tuple(words[i] if i < len(words) else None for i in range(n))

    return udtf(SplitFixed)


@register(
    "udtf_split_fixed_cols",
    oracle=rf"""
    WITH w AS (
        SELECT lang,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN len(toks) >= 1 THEN 1 END) AS BIGINT) AS n_tok1,
           CAST(count(CASE WHEN len(toks) >= {FIXED_COLS} THEN 1 END) AS BIGINT) AS n_tok{FIXED_COLS},
           CAST(count(DISTINCT CASE WHEN len(toks) >= 1 THEN toks[1] END) AS BIGINT) AS n_distinct_tok1
    FROM w
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Polymorphic Python UDTF (Spark 4 analyze() API): the table "
    "function's output schema — tok1..tokN string columns — is "
    "derived at PLAN time from the literal N argument, not declared "
    "statically; the lateral join then splits each document's "
    "leading tokens into typed columns. The rollup (per-language "
    "fill-rates and distinct leading tokens) is value-checked "
    "against DuckDB list arithmetic, so the dynamic-schema contract "
    "is oracle-proven.",
)
def udtf_split_fixed_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    split_fixed = _split_fixed_udtf()
    spark.udtf.register("split_fixed", split_fixed)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    out = spark.sql(
        f"""
        SELECT d.lang, s.*
        FROM docs_for_udtf d,
        LATERAL split_fixed(d.text, {FIXED_COLS}) s
        """
    )
    return (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("tok1").cast("bigint").alias("n_tok1"),
            F.count(f"tok{FIXED_COLS}").cast("bigint").alias(f"n_tok{FIXED_COLS}"),
            F.countDistinct("tok1").cast("bigint").alias("n_distinct_tok1"),
        )
        .orderBy("lang")
    )


# ----------------------------- UDTF over a TABLE argument (Spark 4)


def _user_digest_udtf():
    """Spark 4 table-argument UDTF: the function consumes
    TABLE(events) PARTITION BY user_id ORDER BY ts — the engine feeds
    each partition's rows IN ORDER to one UDTF instance (terminate()
    emits the digest), replacing a collect_list + UDF chain with a
    streaming per-group fold. Built lazily (needs a session)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events int, first_type string, last_type string")
    class UserDigest:
        def __init__(self):
            self.user_id = None
            self.n = 0
            self.first_type = None
            self.last_type = None

        def eval(self, row):
            self.user_id = row["user_id"]
            self.n += 1
            # row counter as the 'unset' sentinel — first_type-is-None
            # would conflate 'no rows yet' with a genuinely NULL first
            # event_type and silently take the SECOND row's type
            if self.n == 1:
                self.first_type = row["event_type"]
            self.last_type = row["event_type"]

        def terminate(self):
            if self.user_id is not None:
                yield self.user_id, self.n, self.first_type, self.last_type

    return UserDigest


@register(
    "udtf_table_arg_digest",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               row_number() OVER w AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(max(n) AS INT) AS n_events,
           max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
           max(CASE WHEN rn = n THEN event_type END) AS last_type
    FROM ordered
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Polymorphic UDTF consuming a TABLE argument (Spark 4 "
    "TABLE(...) PARTITION BY ... ORDER BY ...): each user's events "
    "stream IN EVENT-TIME ORDER through one UDTF instance, which "
    "folds them to a digest row in terminate() — the per-group "
    "sequential-fold shape without collect_list materialization; "
    "partitions shuffle on user_id exactly like a window. The "
    "digest (count, first/last event type) is oracle-pinned.",
)
def udtf_table_arg_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("user_digest", _user_digest_udtf())
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_for_digest")
    return spark.sql(
        """
        SELECT * FROM user_digest(
            TABLE(SELECT user_id, event_type, ts, event_id FROM events_for_digest)
            PARTITION BY user_id ORDER BY (ts, event_id)
        )
        ORDER BY user_id
        """
    )
