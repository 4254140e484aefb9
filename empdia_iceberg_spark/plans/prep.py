"""Dataset-preparation pipeline — Spark-native reimplementation of the
reference's dialogue-JSON → VERL-row prep (SURVEY.md §2.A R1-R13;
reference utils/data_preprocess.py:27-95) and the deterministic
positional 70/30 split (R3; utils/split.py:6-7).

The prep is a single nested-array ``select`` — no UDF, no explode/
re-group round trip: sort rounds by turn_id (R5), extract the first
speaker turn per round (R6), trim (R7), non-empty constraint (R8),
prompt assembly (R9), rounds coalesce (R10), VERL projection (R11).
At 100 TB this is embarrassingly parallel (pure per-row projection;
zero shuffles).

The registered queries run over an inline fixture corpus (FIXTURES.md
B1 — the driver's DuckDB oracle has no dialogue table) with the same
literal rows in the oracle SQL; ``prepare_corpus`` itself is the
reusable engine operator and is also exercised on real JSON input in
tests.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load, local_df

SYSTEM_PROMPT = "empathetic-listener-system-prompt"
DATA_SOURCE = "EmpDia_Iceberg"
ABILITY = "empathy_dialogue"  # reference utils/data_preprocess.py:53
# R16 (empathy_interaction.py:63,78): per-conversation user-simulator
# system prompt templated with {first_explanation} (English-equivalent
# template; the operator under test is the interpolation).
USER_SYSTEM_TEMPLATE = "user-sim-system-prompt (%s)"

DIALOGUE_SCHEMA = T.StructType(
    [
        T.StructField("dia_id", T.StringType()),
        T.StructField("seed", T.StringType()),
        T.StructField("story", T.StringType()),
        T.StructField("first_explanation", T.StringType()),
        T.StructField("rounds", T.IntegerType()),
        T.StructField(
            "dialogue",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("turn_id", T.IntegerType()),
                        T.StructField(
                            "turns",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("role", T.StringType()),
                                        T.StructField("text", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

# FIXTURES.md B1: unsorted rounds, mixed-case roles, speaker_1 prefix,
# whitespace padding, one record missing rounds, one non-speaker round.
FIXTURE_CORPUS = [
    {
        "dia_id": "d0001",
        "seed": "s1",
        "story": "story-1",
        "first_explanation": "work stress",
        "rounds": 6,
        "dialogue": [
            {
                "turn_id": 2,
                "turns": [
                    {"role": "Speaker", "text": "  second speaker line "},
                    {"role": "Listener", "text": "listener reply 2"},
                ],
            },
            {
                "turn_id": 1,
                "turns": [
                    {"role": "speaker_1", "text": " first speaker line  "},
                    {"role": "Listener", "text": "listener reply 1"},
                ],
            },
        ],
    },
    {
        "dia_id": "d0002",
        "seed": "s2",
        "story": "story-2",
        "first_explanation": "family issue",
        "rounds": None,  # R10: defaults to len(user_script)
        "dialogue": [
            {
                "turn_id": 1,
                "turns": [
                    {"role": "SPEAKER", "text": "only line "},
                    {"role": "listener", "text": "ack"},
                ],
            },
            {
                "turn_id": 2,
                "turns": [{"role": "narrator", "text": "skipped — not a speaker"}],
            },
        ],
    },
    {
        "dia_id": "d0003",
        "seed": "s3",
        "story": "story-3",
        "first_explanation": "sleep trouble",
        "rounds": 2,
        "dialogue": [
            {
                "turn_id": 3,
                "turns": [
                    {"role": "Listener", "text": "listener first"},
                    {"role": "Speaker", "text": "\tthird line\n"},
                ],
            },
            {
                "turn_id": 1,
                "turns": [{"role": "speaker", "text": "line one"}],
            },
            {
                "turn_id": 2,
                "turns": [{"role": "speaker_2", "text": "   line two"}],
            },
        ],
    },
]


def corpus_df(spark: SparkSession) -> DataFrame:
    # single partition: a 3-row fixture must not fan out to
    # defaultParallelism pickled partitions (see sources.tables.local_df).
    return local_df(spark, FIXTURE_CORPUS, DIALOGUE_SCHEMA)


def prepare_corpus(corpus: DataFrame) -> DataFrame:
    """R5-R11 as one projection: returns (dia_id, data_source, ability,
    user_script ARRAY<STRING>, rounds, prompt ARRAY<STRUCT<role,content>>,
    first_explanation, story, seed)."""
    sorted_rounds = F.array_sort("dialogue")  # struct sort: turn_id is field 1 (R5)
    first_speaker = lambda r: F.try_element_at(  # noqa: E731  (empty → NULL, R6)
        F.filter(r.turns, lambda t: F.startswith(F.lower(t.role), F.lit("speaker"))), F.lit(1)
    )
    # R7: Python str.strip() strips ALL whitespace; SQL trim() only strips
    # spaces — use a regexp strip to match the reference exactly.
    strip_ws = lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")  # noqa: E731
    # Reference (utils/data_preprocess.py:34-35) appends the stripped text
    # whenever a speaker turn EXISTS — even if empty after strip. Only
    # rounds with no speaker-role turn are skipped (first_speaker → NULL).
    script = F.filter(
        F.transform(sorted_rounds, lambda r: strip_ws(first_speaker(r).text)),
        lambda s: s.isNotNull(),
    )
    out = (
        F.when(F.col("dialogue").isNull(), F.array().cast("array<string>"))
        .otherwise(script)
        .alias("user_script")
    )
    prepared = corpus.select(
        "dia_id",
        F.lit(DATA_SOURCE).alias("data_source"),
        F.lit(ABILITY).alias("ability"),
        out,
        "rounds",
        "first_explanation",
        "story",
        "seed",
        "dialogue",  # kept (original order) for extra_info.gold_dialogue
    )
    prepared = prepared.filter(F.size("user_script") > 0)  # R8
    prepared = prepared.withColumn(
        "rounds", F.coalesce(F.col("rounds"), F.size("user_script"))  # R10
    )
    prompt = F.array(  # R9
        F.struct(F.lit("system").alias("role"), F.lit(SYSTEM_PROMPT).alias("content")),
        F.struct(
            F.lit("user").alias("role"), F.element_at("user_script", 1).alias("content")
        ),
    )
    prepared = prepared.withColumn("prompt", prompt)
    return prepared.withColumn(  # R16 system-prompt templating
        "user_system_prompt",
        F.format_string(USER_SYSTEM_TEMPLATE, F.col("first_explanation")),
    )


_CORPUS_SQL_ROWS = """
    (VALUES
      ('d0001', 's1', 'story-1', 'work stress', 6,
       [{'turn_id': 2, 'turns': [{'role': 'Speaker',  'text': '  second speaker line '},
                                 {'role': 'Listener', 'text': 'listener reply 2'}]},
        {'turn_id': 1, 'turns': [{'role': 'speaker_1','text': ' first speaker line  '},
                                 {'role': 'Listener', 'text': 'listener reply 1'}]}]),
      ('d0002', 's2', 'story-2', 'family issue', NULL,
       [{'turn_id': 1, 'turns': [{'role': 'SPEAKER',  'text': 'only line '},
                                 {'role': 'listener', 'text': 'ack'}]},
        {'turn_id': 2, 'turns': [{'role': 'narrator', 'text': 'skipped — not a speaker'}]}]),
      ('d0003', 's3', 'story-3', 'sleep trouble', 2,
       [{'turn_id': 3, 'turns': [{'role': 'Listener', 'text': 'listener first'},
                                 {'role': 'Speaker',  'text': '\tthird line\n'}]},
        {'turn_id': 1, 'turns': [{'role': 'speaker',  'text': 'line one'}]},
        {'turn_id': 2, 'turns': [{'role': 'speaker_2','text': '   line two'}]}])
    ) corpus(dia_id, seed, story, first_explanation, rounds, dialogue)
"""


@register(
    "dialogue_prep_verl_rows",
    oracle=f"""
    WITH raw AS (SELECT * FROM {_CORPUS_SQL_ROWS}),
    scripted AS (
        SELECT dia_id, seed, story, first_explanation, rounds,
               list_filter(
                 list_transform(
                   list_sort(dialogue),
                   r -> regexp_replace(list_filter(r.turns, t -> starts_with(lower(t.role), 'speaker'))[1].text, '^\\s+|\\s+$', '', 'g')),
                 s -> s IS NOT NULL) AS user_script
        FROM raw
    )
    SELECT dia_id,
           'EmpDia_Iceberg'                AS data_source,
           'empathy_dialogue'              AS ability,
           coalesce(rounds, len(user_script)) AS rounds,
           len(user_script)                AS script_len,
           user_script[1]                  AS first_user,
           'system'                        AS prompt_role_0,
           '{SYSTEM_PROMPT}'               AS prompt_content_0,
           'user-sim-system-prompt (' || first_explanation || ')' AS user_system_prompt,
           first_explanation, story, seed
    FROM scripted
    WHERE len(user_script) > 0
    ORDER BY dia_id
    """,
    doc="R1-R11 dialogue prep: sort rounds, first-speaker extraction, trim, non-empty gate, prompt assembly, VERL projection (flattened).",
)
def dialogue_prep_verl_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepared = prepare_corpus(corpus_df(spark))
    return prepared.select(
        "dia_id",
        "data_source",
        "ability",
        "rounds",
        F.size("user_script").alias("script_len"),
        F.element_at("user_script", 1).alias("first_user"),
        F.element_at("prompt", 1).role.alias("prompt_role_0"),
        F.element_at("prompt", 1).content.alias("prompt_content_0"),
        "user_system_prompt",
        "first_explanation",
        "story",
        "seed",
    ).orderBy("dia_id")


def verl_rows(corpus: DataFrame, split: str = "train") -> DataFrame:
    """R11 in FULL: the complete nested VERL training row
    (utils/data_preprocess.py:50-73) — data_source, prompt, ability,
    reward_model {style:'custom', ground_truth:''}, extra_info {dia_id,
    split, seed, story, first_explanation, gold_dialogue (the RAW
    dialogue, original round order), interaction_kwargs {name:
    'empathetic_agent', rounds, user_script, script_next_idx: 1,
    first_explanation}}. Pure projection — zero shuffles."""
    both = prepare_corpus(corpus)
    interaction_kwargs = F.struct(
        F.lit("empathetic_agent").alias("name"),
        F.col("rounds").alias("rounds"),
        F.col("user_script").alias("user_script"),
        F.lit(1).alias("script_next_idx"),  # first entry already in prompt
        F.col("first_explanation").alias("first_explanation"),
    )
    extra_info = F.struct(
        F.col("dia_id").alias("dia_id"),
        F.lit(split).alias("split"),
        F.col("seed").alias("seed"),
        F.col("story").alias("story"),
        F.col("first_explanation").alias("first_explanation"),
        F.col("dialogue").alias("gold_dialogue"),
        interaction_kwargs.alias("interaction_kwargs"),
    )
    return both.select(
        "dia_id",
        F.lit(DATA_SOURCE).alias("data_source"),
        F.col("prompt").alias("prompt"),
        F.lit(ABILITY).alias("ability"),
        F.struct(
            F.lit("custom").alias("style"), F.lit("").alias("ground_truth")
        ).alias("reward_model"),
        extra_info.alias("extra_info"),
    )


@register(
    "dialogue_prep_nested",
    oracle=rf"""
    WITH raw AS (SELECT * FROM {_CORPUS_SQL_ROWS}),
    scripted AS (
        SELECT dia_id, seed, story, first_explanation, dialogue,
               coalesce(rounds, len(user_script)) AS rounds, user_script
        FROM (
          SELECT *, list_filter(
                   list_transform(
                     list_sort(dialogue),
                     r -> regexp_replace(list_filter(r.turns, t -> starts_with(lower(t.role), 'speaker'))[1].text, '^\s+|\s+$', '', 'g')),
                   s -> s IS NOT NULL) AS user_script
          FROM raw)
        WHERE len(user_script) > 0
    )
    SELECT dia_id,
           to_json(struct_pack(
             data_source := 'EmpDia_Iceberg',
             prompt := [struct_pack(role := 'system', content := '{SYSTEM_PROMPT}'),
                        struct_pack(role := 'user',   content := user_script[1])],
             ability := 'empathy_dialogue',
             reward_model := struct_pack(style := 'custom', ground_truth := ''),
             extra_info := struct_pack(
               dia_id := dia_id, split := 'train', seed := seed, story := story,
               first_explanation := first_explanation,
               gold_dialogue := dialogue,
               interaction_kwargs := struct_pack(
                 name := 'empathetic_agent', rounds := CAST(rounds AS INT),
                 user_script := user_script, script_next_idx := 1,
                 first_explanation := first_explanation))
           )) AS verl_json
    FROM scripted
    ORDER BY dia_id
    """,
    doc="R11 full nested VERL row (utils/data_preprocess.py:50-73) with a "
    "value-level nested oracle: both engines serialize the identical "
    "struct to compact JSON (verified byte-identical Jackson vs DuckDB), "
    "so the whole prompt/reward_model/extra_info/gold_dialogue tree is "
    "hash-checked, not just a flattened projection.",
)
def dialogue_prep_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = verl_rows(corpus_df(spark), split="train")
    return rows.select(
        "dia_id",
        F.to_json(
            F.struct(
                "data_source", "prompt", "ability", "reward_model", "extra_info"
            )
        ).alias("verl_json"),
    ).orderBy("dia_id")


MAX_PROMPT_TOKENS = 64  # R42 analog of max_prompt_length (train.sh:29)


@register(
    "overlong_prompt_filter",
    oracle=rf"""
    SELECT lang,
           count(*) FILTER (len(string_split_regex(text, '\s+')) <= {MAX_PROMPT_TOKENS}) AS n_kept,
           count(*) FILTER (len(string_split_regex(text, '\s+')) >  {MAX_PROMPT_TOKENS}) AS n_dropped
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="R42 overlong-prompt filter (configs/multiturn_grpo_interaction."
    "yaml:22-25, filter_overlong_prompts vs max_prompt_length): drop "
    "prompts above a token budget — whitespace-token proxy for the "
    "tokenizer length, reported as kept/dropped per lang.",
)
def overlong_prompt_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), r"\s+"))
    keep = n_tok <= MAX_PROMPT_TOKENS
    return (
        docs.groupBy("lang")
        .agg(
            F.count_if(keep).alias("n_kept"),
            F.count_if(~keep).alias("n_dropped"),
        )
        .orderBy("lang")
    )


def positional_split(
    df: DataFrame, order_col: str, train_frac: float = 0.7, buckets: int = 64
):
    """R3: ordered positional split — NOT randomSplit; `int(n*frac)` rows
    (by position in `order_col` order) go to train, the rest to test.

    Scale-safe global numbering (no single-reducer world sort): bucket the
    order column by approx-quantile boundaries, count per bucket (tiny
    driver collect: one row per bucket), turn counts into cumulative
    offsets, then ``row_number`` WITHIN each bucket — all buckets number
    in parallel and the offset map (broadcast literal) makes the result a
    global position. Assumes `order_col` is numeric and effectively
    unique (ties make the global order, and hence the split, arbitrary —
    same as the reference's list order).
    """
    from empdia_iceberg_spark.operators.scale import bucketed_global_row_number

    numbered, n = bucketed_global_row_number(df, order_col, buckets=buckets)
    cut = int(n * train_frac)
    tagged = numbered.withColumn(
        "split", F.when(F.col("_rn") <= cut, "train").otherwise("test")
    ).drop("_rn")
    return tagged, cut


@register(
    "positional_split_70_30",
    oracle="""
    WITH numbered AS (
        SELECT c_custkey,
               row_number() OVER (ORDER BY c_custkey) AS rn,
               count(*) OVER () AS n
        FROM customer
    )
    SELECT CASE WHEN rn <= CAST(floor(n * 0.7) AS BIGINT) THEN 'train' ELSE 'test' END AS split,
           count(*)      AS n_rows,
           min(c_custkey) AS min_key,
           max(c_custkey) AS max_key
    FROM numbered
    GROUP BY 1
    ORDER BY split DESC
    """,
    doc="R3 positional (deterministic, not random) 70/30 split of customer by key order.",
)
def positional_split_70_30(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    tagged, _ = positional_split(cust, "c_custkey")
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy(F.desc("split"))
    )
