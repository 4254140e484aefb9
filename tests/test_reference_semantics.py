"""Golden-value + property tests for the reference-semantics operators
(FIXTURES.md B1-B6): reward pipeline, termination precedence, message
transforms, dialogue prep, positional split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from empdia_iceberg_spark.functions.messages import (
    append_user_sentinel,
    drop_system_head,
    role_swap,
)
from empdia_iceberg_spark.functions.reward import per_turn_scores, trajectory_reward
from empdia_iceberg_spark.functions.termination import with_termination
from empdia_iceberg_spark.plans.prep import (
    FIXTURE_CORPUS,
    corpus_df,
    positional_split,
    prepare_corpus,
)
from tests.conftest import SF_DIR

# ---------- B3: reward golden values ----------

_T1 = [(1, 0.9), (2, 0.8), (2, 0.95), (3, 0.7), (5, 0.6), (4, 0.85)]
_T2 = [(1, 1.0), (2, 1.0), (3, 1.0), (4, 1.0), (5, 1.0)]
_T3 = [(1, 0.5), (3, 0.9), (2, 0.9), (2, 0.9), (5, 1.0)]

_GOLDEN_MEANS = {
    "T1": 0.40268675075822385,
    "T2": 0.699989272839742,
    "T3": 0.09499874374541376,
}
_GOLDEN_T1_SCORES = [
    0.0772722021, 0.4720292327, 0.2931777789, 0.7373034538, 0.0990343833, 0.7373034538,
]


def _lh_df(spark, trajectories: dict[str, list[tuple[int, float]]]):
    rows = [
        (dia, t + 1, layer, conf)
        for dia, traj in trajectories.items()
        for t, (layer, conf) in enumerate(traj)
    ]
    return spark.createDataFrame(rows, "dia_id string, turn int, layer int, confidence double")


def test_reward_golden_means(spark):
    """trajectory_reward sums per-turn scores det-rounded to 6 digits
    (order-independent decimal sum — the cross-engine hash-stability
    convention), so the golden mean carries a quantization error of at
    most 0.5e-6 per turn vs the full-precision reference value."""
    lh = _lh_df(spark, {"T1": _T1, "T2": _T2, "T3": _T3})
    out = {r["dia_id"]: r["reward"] for r in trajectory_reward(lh).collect()}
    for k, v in _GOLDEN_MEANS.items():
        assert out[k] == pytest.approx(v, abs=5e-7), k


def test_reward_golden_per_turn(spark):
    lh = _lh_df(spark, {"T1": _T1})
    scores = [
        r["score"] for r in per_turn_scores(lh).orderBy("turn").collect()
    ]
    assert scores == pytest.approx(_GOLDEN_T1_SCORES, abs=1e-9)


def test_reward_min_turns_gate(spark):
    lh = _lh_df(spark, {"SHORT": _T1[:4]})
    out = trajectory_reward(lh).collect()[0]
    assert out["reward"] == 0.0 and out["n_turns"] == 4


def test_reward_bounds_property(spark):
    # sigmoid keeps every per-turn score strictly inside (0, 1)
    import itertools

    traj = [(l, c) for l, c in itertools.product([1, 3, 5], [0.0, 0.5, 1.0])]
    lh = _lh_df(spark, {"P": traj})
    for r in per_turn_scores(lh).collect():
        assert 0.0 < r["score"] < 1.0


# ---------- B4: termination precedence ----------


def _term_df(spark, layers, is_empty=None, start_turn=1):
    is_empty = is_empty or [False] * len(layers)
    rows = [
        ("D", start_turn + i, layers[i], is_empty[i]) for i in range(len(layers))
    ]
    return spark.createDataFrame(rows, "dia_id string, turn int, layer int, is_empty boolean")


def _reasons(spark, layers, **kw):
    df = with_termination(_term_df(spark, layers, **kw))
    return [r["terminate_reason"] for r in df.orderBy("turn").collect()]


def test_no_progress_6_fires_on_sixth(spark):
    assert _reasons(spark, [3, 3, 3, 3, 3, 3])[-1] == "no_progress_6"
    assert _reasons(spark, [3, 3, 3, 3, 3])[-1] == ""


def test_perception_5_fires_on_fifth_five(spark):
    r = _reasons(spark, [4, 5, 5, 5, 5, 5])
    assert r[-1] == "perception_5" and r[-2] == ""


def test_six_fives_is_no_progress_not_perception(spark):
    assert _reasons(spark, [5, 5, 5, 5, 5, 5])[-1] == "no_progress_6"


def test_max_turns_beats_windows(spark):
    r = _reasons(spark, [5] * 6, start_turn=15)  # 6th row is turn 20
    assert r[-1] == "max_turns"


def test_empty_beats_everything(spark):
    r = _reasons(spark, [5] * 6, is_empty=[False] * 5 + [True])
    assert r[-1] == "empty_next_user"


def test_deepest_layer_running_max(spark):
    df = with_termination(_term_df(spark, [1, 3, 2, 5, 4]))
    assert [r["deepest_layer"] for r in df.orderBy("turn").collect()] == [1, 3, 3, 5, 5]


# ---------- B6: message transforms ----------


def _msgs_df(spark, msgs):
    return spark.createDataFrame(
        [(msgs,)], "msgs array<struct<role string, content string>>"
    )


def _apply(spark, col_expr, msgs):
    df = _msgs_df(spark, msgs).select(col_expr.alias("out"))
    return [tuple(m) for m in df.collect()[0]["out"]]


def test_role_swap_golden(spark):
    msgs = [("system", "s0"), ("user", "u1"), ("assistant", "a1")]
    out = _apply(spark, role_swap(drop_system_head(F.col("msgs"))), msgs)
    assert out == [("assistant", "u1"), ("user", "a1")]


def test_role_swap_involution(spark):
    msgs = [("system", "s"), ("user", "u"), ("assistant", "a"), ("tool", "t")]
    out = _apply(spark, role_swap(role_swap(F.col("msgs"))), msgs)
    assert out == msgs


def test_sentinel_append_only_when_needed(spark):
    ends_assistant = [("user", "u"), ("assistant", "a")]
    out = _apply(spark, append_user_sentinel(F.col("msgs")), ends_assistant)
    assert out[-1] == ("user", "")
    ends_user = [("assistant", "a"), ("user", "u")]
    out2 = _apply(spark, append_user_sentinel(F.col("msgs")), ends_user)
    assert out2 == ends_user


# ---------- B1/B2: prep + split ----------


def test_prep_golden(spark):
    rows = {r["dia_id"]: r for r in prepare_corpus(corpus_df(spark)).collect()}
    # R5+R6+R7: sorted by turn_id, first speaker-prefixed turn, trimmed
    assert rows["d0001"]["user_script"] == ["first speaker line", "second speaker line"]
    assert rows["d0001"]["prompt"][1]["content"] == "first speaker line"
    # R6: non-speaker round skipped entirely; R10: rounds defaults to len(script)
    assert rows["d0002"]["user_script"] == ["only line"]
    assert rows["d0002"]["rounds"] == 1
    # R5: 3 unsorted rounds ordered 1,2,3
    assert rows["d0003"]["user_script"] == ["line one", "line two", "third line"]
    assert rows["d0001"]["prompt"][0]["role"] == "system"


def test_positional_split_exact(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    tagged, cut = positional_split(df, "k")
    assert cut == 7
    got = {r["k"]: r["split"] for r in tagged.collect()}
    assert all(got[i] == "train" for i in range(7))
    assert all(got[i] == "test" for i in range(7, 10))


def test_prep_on_real_json(spark, tmp_path):
    """R1: the same prep runs off multiLine JSON files (object or array root)."""
    import json

    p = tmp_path / "corpus.json"
    p.write_text(json.dumps(FIXTURE_CORPUS, ensure_ascii=False))
    from empdia_iceberg_spark.plans.prep import DIALOGUE_SCHEMA

    corpus = spark.read.option("multiLine", True).schema(DIALOGUE_SCHEMA).json(str(p))
    out = prepare_corpus(corpus)
    assert out.count() == 3


def test_classifier_real_model_stub_fallback(spark, monkeypatch):
    """classifier_real_model: with no checkpoint configured (this
    container), the env gate must report unavailable and the query must
    run on the deterministic stub with the real-path output contract
    (layer_idx 1-5, canonical names, confidence in (0,1))."""
    from empdia_iceberg_spark.functions import classifier as C

    monkeypatch.delenv(C.HF_MODEL_ENV, raising=False)
    assert not C.real_model_available()
    rows = C.classifier_real_model(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.layer_idx <= 5
        assert r.layer_name == C.LAYERS[r.layer_idx - 1]
        assert 0.0 < r.confidence < 1.0
    # setting the env var alone must not flip the gate without the ML stack
    monkeypatch.setenv(C.HF_MODEL_ENV, "distilbert-base-uncased-finetuned-sst-2-english")
    import importlib.util

    expected = (
        importlib.util.find_spec("torch") is not None
        and importlib.util.find_spec("transformers") is not None
    )
    assert C.real_model_available() == expected


def test_generation_real_stub_fallback(spark, monkeypatch):
    """generation_retry_real: with no checkpoint configured (this
    container), the env gate must report unavailable and the query must
    run on the deterministic stub, matching generation_retry_stub's
    output exactly (identical contract, identical fallback path)."""
    from empdia_iceberg_spark.functions import classifier as C

    monkeypatch.delenv(C.HF_GENERATOR_ENV, raising=False)
    assert not C.real_generator_available()
    real = C.generation_retry_real(spark, SF_DIR).collect()
    stub = C.generation_retry_stub(spark, SF_DIR).collect()
    assert real == stub
    for r in real:
        assert 1 <= r.attempts <= C.MAX_RETRIES
        if r.response == "":  # all-empty rows burn the full retry budget
            assert r.attempts == C.MAX_RETRIES
    # setting the env var alone must not flip the gate without the ML stack
    monkeypatch.setenv(C.HF_GENERATOR_ENV, "Qwen/Qwen2.5-0.5B-Instruct")
    import importlib.util

    expected = (
        importlib.util.find_spec("torch") is not None
        and importlib.util.find_spec("transformers") is not None
    )
    assert C.real_generator_available() == expected
