"""llmmap fingerprint + DLI behavior-signature parity tests.

Fixture literals ported from the reference suite (tests/test_llmmap.py:48-87,
tests/test_dli.py:15-112) and re-asserted on the DataFrame operators.
"""

import math

import pytest
from pyspark.sql import functions as F

from model_audit_spark.operators.dli import (
    behavior_compare,
    behavior_features,
    bigram_distribution,
    js_divergence_pairs,
)
from model_audit_spark.operators.fingerprint import (
    cosine_compare,
    fingerprint_vectors,
    with_normalized_dims,
)


def _responses(spark, mapping):
    rows = [
        (model, i, t) for model, texts in mapping.items()
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "model_id STRING, probe_seq INT, text STRING"
    )


# ---------------------------------------------------------------------------
# llmmap
# ---------------------------------------------------------------------------

def test_identical_fingerprints_cosine_one(spark):
    texts = [
        "Hello world, this is a test.",
        "Another response here with more words.",
    ]
    df = _responses(spark, {"m1": texts, "m2": texts})
    fp = fingerprint_vectors(df, "model_id", "text")
    cmp_ = cosine_compare(fp).collect()[0]
    assert cmp_["similarity"] == pytest.approx(1.0, abs=1e-9)
    assert cmp_["is_derived"]
    assert cmp_["threshold"] == 0.85
    assert cmp_["confidence"] == pytest.approx(min(abs(1.0 - 0.85) / 0.15, 1.0))


def test_zero_vector_cosine_zero(spark):
    # empty responses -> all features 0 -> zero norm -> similarity 0
    df = _responses(spark, {"m1": [""], "m2": ["Some real text here."]})
    fp = fingerprint_vectors(df, "model_id", "text")
    cmp_ = cosine_compare(fp).collect()[0]
    assert cmp_["similarity"] == 0.0
    assert not cmp_["is_derived"]


def test_fingerprint_vector_values(spark):
    # single response "Short text." -> length_words 2, sentences 1,
    # avg_word_length = (5+5)/2, unique ratio 1, punctuation 1/11
    df = _responses(spark, {"m": ["Short text."]})
    fp = fingerprint_vectors(df, "model_id", "text").collect()[0]
    assert fp["avg_length_chars"] == 11.0
    assert fp["avg_length_words"] == 2.0
    assert fp["avg_length_sentences"] == 1.0
    assert fp["avg_avg_word_length"] == pytest.approx(5.0)
    assert fp["avg_punctuation_ratio"] == pytest.approx(1 / 11)
    assert fp["ratio_has_code_blocks"] == 0.0


def test_normalization_ranges(spark):
    df = _responses(spark, {"m": ["word " * 600]})  # 600 words > hi=500
    fp = fingerprint_vectors(df, "model_id", "text")
    n = with_normalized_dims(fp).collect()[0]
    assert n["n_avg_length_words"] == 1.0  # clamped
    assert 0.0 <= n["n_avg_length_chars"] <= 1.0


def test_averaging_across_probes(spark):
    # bool ratio: one response with code fence, one without -> 0.5
    df = _responses(spark, {"m": ["```x```", "plain"]})
    fp = fingerprint_vectors(df, "model_id", "text").collect()[0]
    assert fp["ratio_has_code_blocks"] == 0.5


# ---------------------------------------------------------------------------
# DLI
# ---------------------------------------------------------------------------

def test_bigram_distribution_counts(spark):
    df = _responses(spark, {"m": ["a b a b a b"]})
    rows = {
        r["ngram"]: (r["cnt"], r["weight"])
        for r in bigram_distribution(df, "model_id", "text").collect()
    }
    assert rows["a b"][0] == 3
    assert rows["b a"][0] == 2
    assert rows["a b"][1] == pytest.approx(3 / 5)
    assert rows["b a"][1] == pytest.approx(2 / 5)


def test_bigram_merge_across_responses(spark):
    df = _responses(spark, {"m": ["x y", "x y"]})
    rows = bigram_distribution(df, "model_id", "text").collect()
    assert len(rows) == 1
    assert rows[0]["cnt"] == 2
    assert rows[0]["weight"] == 1.0


def test_js_identical_zero_disjoint_positive(spark):
    df = _responses(
        spark, {"a": ["p q p q"], "b": ["p q p q"], "c": ["x y x y"]}
    )
    dist = bigram_distribution(df, "model_id", "text")
    js = {
        (r["model_a"], r["model_b"]): r["js_divergence"]
        for r in js_divergence_pairs(dist).collect()
    }
    assert js[("a", "b")] == pytest.approx(0.0, abs=1e-12)
    assert js[("a", "c")] > 0
    # fully disjoint distributions -> JS = ln 2
    assert js[("a", "c")] == pytest.approx(math.log(2), rel=1e-9)


def test_behavior_features_fixtures(spark):
    refusal = {
        "m": [
            "I cannot help with that.",
            "I apologize, but I'm unable to assist.",
            "Sure, here's the info.",
        ]
    }
    f = behavior_features(_responses(spark, refusal), "model_id", "text")
    row = f.collect()[0]
    assert row["refusal_rate"] == pytest.approx(2 / 3)

    md = {"m": ["# Title\n\nSome content", "Just plain text here"]}
    row2 = behavior_features(_responses(spark, md), "model_id", "text").collect()[0]
    assert row2["markdown_rate"] == 0.5
    # ws-words: ["#","Title","Some","content"] = 4 and 4 -> avg 4.0
    assert row2["avg_length"] == pytest.approx(4.0)
    # vocab: title, some, content, just, plain, text, here (8 tokens, 'text'
    # appears... tokens: title some content just plain text here -> 7 distinct/7
    assert 0 <= row2["vocab_diversity"] <= 1


def test_behavior_similarity_identical_one(spark):
    texts = [
        "Hello world, this is a test response.",
        "Another response with some content.",
    ]
    df = _responses(spark, {"m1": texts, "m2": texts})
    cmp_ = behavior_compare(df, "model_id", "text").collect()[0]
    assert cmp_["similarity"] == pytest.approx(1.0, abs=0.01)
    assert cmp_["is_derived"]
    assert cmp_["threshold"] == 0.80


def test_behavior_similarity_different_below_one(spark):
    df = _responses(
        spark,
        {
            "m1": ["Certainly! I'd be happy to help with that."],
            "m2": ["I cannot help with that request. I apologize."],
        },
    )
    cmp_ = behavior_compare(df, "model_id", "text").collect()[0]
    assert cmp_["similarity"] < 1.0


def test_hedging_certainty_rates(spark):
    # combined = both responses joined; hedging words: perhaps, might;
    # certainty: certainly. tokens total = 8
    df = _responses(spark, {"m": ["perhaps it might rain", "certainly not today sir"]})
    row = behavior_features(df, "model_id", "text").collect()[0]
    assert row["hedging_rate"] == pytest.approx(2 / 8)
    assert row["certainty_rate"] == pytest.approx(1 / 8)
