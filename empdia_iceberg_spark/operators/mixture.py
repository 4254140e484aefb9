"""Domain-mixture planning for training-data pipelines: per-source
token counts → temperature-scaled sampling weights → epoch allocation
under a token budget (the UnifiedQA / Gopher / Llama "data mixture"
table, computed inside the engine instead of a notebook).

Determinism: sqrt (α=0.5 temperature) is a single IEEE op — identical
on both engines — but SUMMING the weights is order-dependent in double,
so each sqrt is det_round'ed to 6 digits and summed in DECIMAL(27,6)
(exact, associative; the functions/exact.py discipline). The final
ratios divide identical doubles by identical doubles.

Scale notes: one shuffle on `source` for the per-domain rollup (the
token counting itself is a map-side expression); the domain table is
#domains rows — inherently tiny — so the grand total is a 1-row
aggregate cross-joined broadcast, not a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load

MIX_ALPHA = 0.5  # temperature: weight ∝ tokens^α (α=1 → natural, 0 → uniform)
TOKEN_BUDGET = 1_000_000  # training-token budget the epochs column allocates


@register(
    "domain_mixture_weights",
    oracle=rf"""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    s AS (
        SELECT *,
               CAST({sql_det_round('sqrt(CAST(n_tokens AS DOUBLE))', 6)}
                    AS DECIMAL(27,6)) AS sd
        FROM per
    ),
    tot AS (SELECT sum(sd) AS total FROM s)
    SELECT source, n_docs, n_tokens,
           {sql_det_round('CAST(sd AS DOUBLE) / CAST(total AS DOUBLE)', 6)} AS weight,
           {sql_det_round(
               f"{TOKEN_BUDGET}.0 * ({sql_det_round('CAST(sd AS DOUBLE) / CAST(total AS DOUBLE)', 6)}) / n_tokens",
               4,
           )} AS epochs
    FROM s CROSS JOIN tot
    ORDER BY source
    """,
    doc=f"Temperature-scaled domain mixture (α={MIX_ALPHA}): per-source "
    "doc/token counts, sampling weight ∝ tokens^α normalized over all "
    f"sources, and the epochs each source runs under a {TOKEN_BUDGET}-"
    "token budget (epochs > 1 ⇒ the domain repeats; the up/down-"
    "sampling table a pretraining run is launched with).",
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).cast("bigint").alias("n_tokens"),
    )
    s = per.withColumn(
        "sd",
        det_round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast("decimal(27,6)"),
    )
    tot = s.agg(F.sum("sd").alias("total"))
    weight = det_round(
        F.col("sd").cast("double") / F.col("total").cast("double"), 6
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            weight.alias("weight"),
            det_round(TOKEN_BUDGET * weight / F.col("n_tokens"), 4).alias("epochs"),
        )
        .orderBy("source")
    )
