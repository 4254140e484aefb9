"""Layer classifier surface (SURVEY.md §2.A R24-R26) — label
canonicalization, lazy per-executor init, and batched text
classification — with the checkpoint replaced by a DETERMINISTIC STUB
(SURVEY §7 slice 4: the reference's checkpoint path is private, so the
contract is tested with a reproducible scorer).

Reference semantics mirrored exactly:
- R24 label canonicalization (empathy_interaction.py:88-99): lower,
  space/hyphen → underscore, membership in the 5 Satir layers;
  unmappable labels fall back to 'behavior' (:131).
- R25 lazy init (:101-113): the "model" (per-class md5 seeds) is built
  once per executor process inside the pandas UDF — the standard
  executor-singleton pattern replacing HF from_pretrained.
- R26 classification (:115-137): per-text class scores → argmax layer
  (1-5) + confidence. The stub's "logit" for class i is the first 8 hex
  chars of md5(f"{i}:{text}") as an integer — deterministic, uniform,
  and expressible in DuckDB ('0x'||hex cast), so the full UDF path gets
  a value-level SQL oracle (rare for a classifier; the point is the
  contract, not the model). Confidence = max_score / Σscores ∈ (0,1)
  (the softmax analog that stays exactly reproducible cross-engine).

R14 (utils/collate_numpy.py:3-8) is also here: the numpy object-array
batch collation of `prompt`, re-expressed as Arrow-batched mapInPandas.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.exact import det_round, sql_det_round
from empdia_iceberg_spark.registry import register
from empdia_iceberg_spark.sources.tables import load, local_df

# empathy_interaction.py:54
LAYERS = ["behavior", "coping", "feelings", "feelings_about_feelings", "perceptions"]

# Executor-process singleton (R25): trivially cheap for the stub, but the
# shape is the one a real HF checkpoint load would use.
_MODEL_CACHE: dict[str, object] = {}


def canonical_layer(label: Column) -> Column:
    """R24: lower, ' '→'_', '-'→'_', membership else NULL."""
    norm = F.replace(
        F.replace(F.lower(label), F.lit(" "), F.lit("_")), F.lit("-"), F.lit("_")
    )
    return F.when(norm.isin(*LAYERS), norm).otherwise(F.lit(None).cast("string"))


def _ensure_stub_model():
    if "stub" not in _MODEL_CACHE:
        import hashlib  # lazy, mirroring the lazy-import/load pattern

        def score(i: int, text: str) -> int:
            return int(hashlib.md5(f"{i}:{text}".encode()).hexdigest()[:8], 16)

        _MODEL_CACHE["stub"] = score
    return _MODEL_CACHE["stub"]


def predict_layer_udf():
    """R26 as an Arrow-batched pandas UDF returning
    struct<layer_idx int, layer_name string, confidence double>."""

    def predict(texts: pd.Series) -> pd.DataFrame:
        score = _ensure_stub_model()  # R25 lazy init
        n = len(LAYERS)
        scores = np.array(
            [[score(i, t) for i in range(n)] for t in texts], dtype=np.float64
        )
        idx = scores.argmax(axis=1)  # first-max tiebreak, like torch.argmax
        conf = scores.max(axis=1) / scores.sum(axis=1)
        return pd.DataFrame(
            {
                "layer_idx": (idx + 1).astype(np.int32),
                "layer_name": [LAYERS[i] for i in idx],
                "confidence": conf,
            }
        )

    return F.pandas_udf(
        predict, "layer_idx int, layer_name string, confidence double"
    )


def _sql_score(i: int) -> str:
    return f"('0x' || substr(md5('{i}:' || text), 1, 8))::BIGINT"


@register(
    "classifier_stub_layers",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               {_sql_score(0)} AS s0, {_sql_score(1)} AS s1, {_sql_score(2)} AS s2,
               {_sql_score(3)} AS s3, {_sql_score(4)} AS s4
        FROM documents
    ),
    p AS (
        SELECT doc_id,
               CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 AND s0 >= s4 THEN 1
                    WHEN s1 >= s2 AND s1 >= s3 AND s1 >= s4 THEN 2
                    WHEN s2 >= s3 AND s2 >= s4 THEN 3
                    WHEN s3 >= s4 THEN 4
                    ELSE 5 END AS layer_idx,
               greatest(s0, s1, s2, s3, s4) AS mx,
               (s0 + s1 + s2 + s3 + s4)     AS total
        FROM s
    )
    SELECT doc_id,
           CAST(layer_idx AS INT) AS layer_idx,
           CASE layer_idx WHEN 1 THEN 'behavior' WHEN 2 THEN 'coping'
                          WHEN 3 THEN 'feelings' WHEN 4 THEN 'feelings_about_feelings'
                          ELSE 'perceptions' END AS layer_name,
           {sql_det_round('CAST(mx AS DOUBLE) / total', 6)} AS confidence
    FROM p
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="R25/R26: batched text classification via pandas UDF with lazy "
    "executor-singleton model init; deterministic md5 stub scorer gives "
    "the UDF path a full value-level SQL oracle.",
)
def classifier_stub_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pred = predict_layer_udf()(F.col("text")).alias("p")
    return (
        docs.select("doc_id", pred)
        .select(
            "doc_id",
            F.col("p.layer_idx").alias("layer_idx"),
            F.col("p.layer_name").alias("layer_name"),
            det_round(F.col("p.confidence"), 6).alias("confidence"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# Raw-label fixture covering every R24 rule: exact, case, space, hyphen,
# mixed, unknown → fallback, empty → fallback.
_LABEL_FIXTURE = [
    "behavior",
    "Coping",
    "FEELINGS",
    "Feelings About Feelings",
    "feelings-about-feelings",
    "Feelings-About feelings",
    "perceptions",
    " perceptions ",
    "unknown_label",
    "",
]
_LABEL_SQL_ROWS = ", ".join(f"({i}, '{s}')" for i, s in enumerate(_LABEL_FIXTURE))


@register(
    "classifier_label_canonicalization",
    oracle=f"""
    WITH raw(id, label) AS (VALUES {_LABEL_SQL_ROWS}),
    norm AS (
        SELECT id, label,
               replace(replace(lower(label), ' ', '_'), '-', '_') AS n
        FROM raw
    )
    SELECT id, label,
           CASE WHEN n IN ('behavior','coping','feelings','feelings_about_feelings','perceptions')
                THEN n ELSE NULL END AS canonical,
           coalesce(CASE WHEN n IN ('behavior','coping','feelings','feelings_about_feelings','perceptions')
                         THEN n ELSE NULL END, 'behavior') AS effective
    FROM norm
    ORDER BY id
    """,
    doc="R24 label canonicalization rules (lower, space/hyphen→underscore, "
    "membership, 'behavior' fallback) over a fixture covering every rule; "
    "note ' perceptions ' does NOT canonicalize — the reference never "
    "trims, so neither do we.",
)
def classifier_label_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = local_df(
        spark, list(enumerate(_LABEL_FIXTURE)), "id int, label string"
    )  # 10-row fixture: one partition, one task
    canon = canonical_layer(F.col("label"))
    return raw.select(
        "id",
        "label",
        canon.alias("canonical"),
        F.coalesce(canon, F.lit("behavior")).alias("effective"),  # :131 fallback
    ).orderBy("id")


# ------------------------------------------- R26 real-model variant
#
# The reference loads a real HF sequence classifier per process
# (empathy_interaction.py:101-113: AutoTokenizer/AutoModel from a private
# checkpoint path) and runs tokenize(max_length=256) → logits → softmax →
# argmax (:115-137). This container ships no torch/transformers and no
# checkpoint, so the real path is ENV-GATED: set EMPDIA_HF_CLASSIFIER to
# any public text-classification checkpoint to light it up; otherwise the
# deterministic stub (same output contract) runs and keeps the rows-only
# check meaningful. The oracle stays on classifier_stub_layers.

HF_MODEL_ENV = "EMPDIA_HF_CLASSIFIER"


def _ml_stack_available(env_name: str) -> bool:
    """True only when the env var names a checkpoint AND the ML stack
    imports — the one shared probe behind both real-path gates."""
    import importlib.util
    import os

    if not os.environ.get(env_name):
        return False
    return (
        importlib.util.find_spec("torch") is not None
        and importlib.util.find_spec("transformers") is not None
    )


def real_model_available() -> bool:
    return _ml_stack_available(HF_MODEL_ENV)


def _ensure_real_model(model_name: str):
    """R25 once-per-process init of the HF tokenizer+model
    (empathy_interaction.py:101-113), keyed by checkpoint name."""
    key = f"hf:{model_name}"
    if key not in _MODEL_CACHE:
        import torch  # noqa: F401  (gated by real_model_available)
        from transformers import (
            AutoModelForSequenceClassification,
            AutoTokenizer,
        )

        tok = AutoTokenizer.from_pretrained(model_name)
        model = AutoModelForSequenceClassification.from_pretrained(model_name)
        model.eval()
        # id2label in index order, like empathy_interaction.py:111-113
        id2label = [
            model.config.id2label[i] for i in range(model.config.num_labels)
        ]
        _MODEL_CACHE[key] = (tok, model, id2label)
    return _MODEL_CACHE[key]


def predict_layer_real_udf(model_name: str):
    """R26 with a real checkpoint: tokenize (max_length=256, trunc/pad) →
    no-grad logits → softmax → argmax + confidence
    (empathy_interaction.py:115-137). Arrow-batched; model lives in the
    executor-process cache, one load per worker."""

    def predict(texts: pd.Series) -> pd.DataFrame:
        import torch

        tok, model, id2label = _ensure_real_model(model_name)
        batch = tok(
            list(texts.fillna("")),
            truncation=True,
            padding=True,
            max_length=256,  # empathy_interaction.py:122
            return_tensors="pt",
        )
        with torch.no_grad():  # :125-126
            probs = torch.softmax(model(**batch).logits, dim=-1)
        conf, idx = probs.max(dim=-1)
        return pd.DataFrame(
            {
                "layer_idx": (idx + 1).numpy().astype(np.int32),
                "layer_name": [id2label[int(i)] for i in idx],
                "confidence": conf.numpy().astype(np.float64),
            }
        )

    return F.pandas_udf(
        predict, "layer_idx int, layer_name string, confidence double"
    )


@register(
    "classifier_real_model",
    oracle=None,  # model outputs are checkpoint-dependent → rows-only;
    # the value-level oracle lives on classifier_stub_layers (same contract).
    doc="R26 with real-model wiring (empathy_interaction.py:101-137): if "
    f"${HF_MODEL_ENV} names an HF checkpoint and torch/transformers import, "
    "classify with it (tokenize max_length=256 → softmax → argmax, lazy "
    "per-executor load); else fall back to the deterministic stub with the "
    "identical output contract. Confidence bounds asserted either way.",
)
def classifier_real_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    docs = load(spark, sf_dir, "documents")
    if real_model_available():
        pred = predict_layer_real_udf(os.environ[HF_MODEL_ENV])(F.col("text"))
    else:
        pred = predict_layer_udf()(F.col("text"))
    pred = pred.alias("p")
    return (
        docs.select("doc_id", pred)
        .select(
            "doc_id",
            F.col("p.layer_idx").alias("layer_idx"),
            F.col("p.layer_name").alias("layer_name"),
            det_round(F.col("p.confidence"), 6).alias("confidence"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# ---------------------------------------------------- R22/R23 generation

MAX_RETRIES = 5  # configs/interaction_config.yaml:7 retry_on_empty_user


def _gen_candidate(attempt: int, text: str) -> tuple[bool, str]:
    """Deterministic stand-in for one LLM generation call: empty ~1/7 of
    the time (keyed on attempt+text), else a stable pseudo-response."""
    import hashlib

    h = hashlib.md5(f"{attempt}:{text}".encode()).hexdigest()
    empty = int(h[:8], 16) % 7 == 0
    return empty, "" if empty else f"resp-{h[:12]}"


def generate_with_retry_udf():
    """R22 batched generation call + R23 bounded retry-on-empty
    (empathy_interaction.py:216-225, 257-276): up to MAX_RETRIES
    attempts per row, first non-empty wins; all-empty gives '' after
    MAX_RETRIES calls. The blocking-call-to-thread-pool boundary of the
    reference becomes Arrow batch parallelism."""

    def gen(texts: pd.Series) -> pd.DataFrame:
        responses, attempts = [], []
        for t in texts:
            resp, n = "", MAX_RETRIES
            for a in range(MAX_RETRIES):
                empty, cand = _gen_candidate(a, t)
                if not empty:
                    resp, n = cand, a + 1
                    break
            responses.append(resp)
            attempts.append(n)
        return pd.DataFrame({"response": responses, "attempts": attempts})

    return F.pandas_udf(gen, "response string, attempts int")


# ------------------------------------------- R22 real-generator variant
#
# The reference's user simulator is a served LLM: a lazily-initialized
# LLaMA-Factory ChatModel whose blocking .chat() call is pushed to a
# thread pool (empathy_interaction.py:176-179, 216-225), with bounded
# retry-on-empty around it (:257-276). A served model can't ship in this
# container, so — exactly like the classifier above — the real path is
# ENV-GATED: set EMPDIA_HF_GENERATOR to a causal-LM checkpoint to light
# it up; otherwise the deterministic stub (same output contract, full
# SQL oracle) runs. Decoding budget mirrors the reference's interaction
# config: max 256 new tokens, temperature 0.7, top_p 0.9
# (configs/interaction_config.yaml:17-19).

HF_GENERATOR_ENV = "EMPDIA_HF_GENERATOR"
GEN_MAX_NEW_TOKENS = 256
GEN_TEMPERATURE = 0.7
GEN_TOP_P = 0.9


def real_generator_available() -> bool:
    return _ml_stack_available(HF_GENERATOR_ENV)


def _ensure_real_generator(model_name: str):
    """Once-per-process init of the generator tokenizer+model, keyed by
    checkpoint — the ChatModel lazy-init of empathy_interaction.py:176-179."""
    key = f"hfgen:{model_name}"
    if key not in _MODEL_CACHE:
        import torch  # noqa: F401  (gated by real_generator_available)
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name)
        # causal-LM batching essentials: most checkpoints (gpt2, LLaMA
        # family) ship NO pad token — tok(..., padding=True) would raise
        # before generate() ever ran — and decoder-only generation needs
        # LEFT padding, or shorter prompts in a batch condition on
        # trailing pads between prompt and continuation
        if tok.pad_token is None:
            tok.pad_token = tok.eos_token
        tok.padding_side = "left"
        model = AutoModelForCausalLM.from_pretrained(model_name)
        model.eval()
        _MODEL_CACHE[key] = (tok, model)
    return _MODEL_CACHE[key]


def generate_real_with_retry_udf(model_name: str):
    """R22 with a real causal-LM checkpoint + R23 bounded retry-on-empty.
    Batched sampling (T=0.7, top_p=0.9, 256 new tokens — the reference's
    interaction decoding budget); a row retries alone up to MAX_RETRIES
    while its batch peers keep their first non-empty response, matching
    the per-call retry loop of empathy_interaction.py:257-276."""

    def gen(texts: pd.Series) -> pd.DataFrame:
        import torch

        tok, model = _ensure_real_generator(model_name)
        responses = ["" for _ in range(len(texts))]
        attempts = [0 for _ in range(len(texts))]
        pending = list(range(len(texts)))
        for attempt in range(MAX_RETRIES):
            if not pending:
                break
            batch = tok(
                [str(texts.iloc[i] or "") for i in pending],
                return_tensors="pt",
                padding=True,
                truncation=True,
                max_length=1024,
            )
            with torch.no_grad():
                out = model.generate(
                    **batch,
                    max_new_tokens=GEN_MAX_NEW_TOKENS,
                    do_sample=True,
                    temperature=GEN_TEMPERATURE,
                    top_p=GEN_TOP_P,
                    pad_token_id=tok.pad_token_id or tok.eos_token_id,
                )
            still_pending = []
            for row, ids in zip(pending, out):
                text = tok.decode(
                    ids[batch["input_ids"].shape[1] :], skip_special_tokens=True
                ).strip()
                attempts[row] = attempt + 1
                if text:
                    responses[row] = text
                else:
                    still_pending.append(row)  # retry-on-empty (:257-276)
            pending = still_pending
        for row in pending:  # all-empty after MAX_RETRIES → '' (:300-301)
            attempts[row] = MAX_RETRIES
        return pd.DataFrame({"response": responses, "attempts": attempts})

    return F.pandas_udf(gen, "response string, attempts int")


@register(
    "generation_retry_real",
    oracle=None,  # sampled model output is nondeterministic → rows-only;
    # the value-level oracle lives on generation_retry_stub (same contract).
    doc="R22/R23 with real-model wiring (empathy_interaction.py:216-225, "
    f"257-276): if ${HF_GENERATOR_ENV} names a causal-LM checkpoint and "
    "torch/transformers import, generate with it (T=0.7, top_p=0.9, 256 "
    "new tokens, lazy per-executor load, bounded retry-on-empty); else "
    "fall back to the deterministic stub with the identical output "
    "contract.",
)
def generation_retry_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    docs = load(spark, sf_dir, "documents")
    if real_generator_available():
        udf = generate_real_with_retry_udf(os.environ[HF_GENERATOR_ENV])
    else:
        udf = generate_with_retry_udf()
    gen = udf(F.col("text")).alias("g")
    return (
        docs.select("doc_id", gen)
        .select(
            "doc_id",
            F.col("g.response").alias("response"),
            F.col("g.attempts").alias("attempts"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


def _sql_empty(a: int) -> str:
    return f"(('0x' || substr(md5('{a}:' || text), 1, 8))::BIGINT % 7 = 0)"


_GEN_ATT_CASE = (
    "CASE "
    + " ".join(f"WHEN NOT {_sql_empty(a)} THEN {a}" for a in range(MAX_RETRIES))
    + " ELSE -1 END"
)


@register(
    "generation_retry_stub",
    oracle=f"""
    WITH att AS (
        SELECT doc_id, text, {_GEN_ATT_CASE} AS a
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN a = -1 THEN ''
                ELSE 'resp-' || substr(md5(CAST(a AS VARCHAR) || ':' || text), 1, 12) END AS response,
           CAST(CASE WHEN a = -1 THEN {MAX_RETRIES} ELSE a + 1 END AS INT) AS attempts
    FROM att
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="R22 LLM generation call as a batched pandas UDF + R23 bounded "
    "retry-on-empty (5 attempts), with a deterministic md5 stub "
    "generator so the whole retry loop has a value-level SQL oracle.",
)
def generation_retry_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    gen = generate_with_retry_udf()(F.col("text")).alias("g")
    return (
        docs.select("doc_id", gen)
        .select("doc_id", F.col("g.response").alias("response"), F.col("g.attempts").alias("attempts"))
        .orderBy("doc_id")
        .limit(500)
    )


def collate_prompts(prepared: DataFrame) -> DataFrame:
    """R14: numpy object-array batch collation of `prompt`
    (utils/collate_numpy.py:3-8) as Arrow-batched mapInPandas. Emits one
    row per input with the collated batch's dtype and per-element size —
    the observable contract of the collate (object array in, one entry
    per example)."""

    def collate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prompts = np.array(list(pdf["prompt"]), dtype=object)  # the collate
            yield pd.DataFrame(
                {
                    "dia_id": pdf["dia_id"],
                    "n_messages": [len(p) for p in prompts],
                    "batch_dtype": str(prompts.dtype),
                }
            )

    return prepared.select("dia_id", "prompt").mapInPandas(
        collate, schema="dia_id string, n_messages int, batch_dtype string"
    )


@register(
    "collate_prompt_batches",
    oracle="""
    SELECT dia_id, 2 AS n_messages, 'object' AS batch_dtype
    FROM (VALUES ('d0001'), ('d0002'), ('d0003')) t(dia_id)
    ORDER BY dia_id
    """,
    doc="R14 numpy object-array collate of prompt via mapInPandas over the "
    "prep fixture (every VERL prompt is [system, first user] = 2 messages).",
)
def collate_prompt_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from empdia_iceberg_spark.plans.prep import corpus_df, prepare_corpus

    prepared = prepare_corpus(corpus_df(spark))
    return collate_prompts(prepared).orderBy("dia_id")
