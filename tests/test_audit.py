"""Audit pipeline: method comparisons, probe consistency, verdict vote
(reference engine.py:175-337, tests/test_engine.py:86-141 semantics)."""

import pytest
from pyspark.sql import functions as F

from model_audit_spark.catalogs import PROBES
from model_audit_spark.operators.audit import (
    audit_verdict,
    consistency_rate,
    method_comparisons,
    probe_style_consistency,
)


def _responses_df(spark, per_model):
    rows = []
    for model, responses in per_model.items():
        for i, resp in enumerate(responses):
            pid, cat, _ = PROBES[i]
            rows.append((model, i, pid, cat, resp))
    return spark.createDataFrame(
        rows,
        "model_id STRING, probe_seq INT, probe_id STRING, category STRING, "
        "response STRING",
    )


GPT4ISH = [
    "Certainly! Here's a comprehensive breakdown. It's important to note "
    "that this is an active area of research.",
    "Let me walk you through the reasoning. Keep in mind the key factors.",
]
CLAUDEISH = [
    "I'd be happy to help. I should note there are different perspectives "
    "and ethical implications to consider.",
    "Let me think through this carefully. I want to be straightforward.",
]


def test_audit_identical_models_derived(spark):
    df = _responses_df(spark, {"teacher": GPT4ISH, "student": GPT4ISH})
    comps = method_comparisons(df, spark)
    rows = {r["method"]: r for r in comps.collect()}
    assert set(rows) == {"llmmap", "dli"}
    assert rows["llmmap"]["similarity"] == pytest.approx(1.0, abs=1e-9)
    assert rows["dli"]["similarity"] == pytest.approx(1.0, abs=1e-6)
    v = audit_verdict(comps).collect()[0]
    assert v["verdict"] == "likely_derived"
    assert v["derived_votes"] == 2
    assert v["confidence"] == pytest.approx(1.0)


def test_audit_verdict_branches(spark):
    # avg similarity < 0.5 and no derived majority -> independent
    comps = spark.createDataFrame(
        [("a", "b", "llmmap", 0.2, False, 0.85, 1.0),
         ("a", "b", "dli", 0.3, False, 0.80, 1.0)],
        "model_a STRING, model_b STRING, method STRING, similarity DOUBLE, "
        "is_derived BOOLEAN, threshold DOUBLE, confidence DOUBLE",
    )
    assert audit_verdict(comps).collect()[0]["verdict"] == "independent"
    comps2 = comps.withColumn("similarity", F.lit(0.6))
    assert audit_verdict(comps2).collect()[0]["verdict"] == "inconclusive"


def test_probe_style_consistency(spark):
    df = _responses_df(spark, {"t": GPT4ISH, "s": [CLAUDEISH[0], GPT4ISH[1]]})
    det = probe_style_consistency(df, spark, "t", "s")
    rows = det.collect()
    assert len(rows) == 2
    assert rows[0]["probe_id"] == "identity_direct"
    assert rows[0]["teacher_style"] == "gpt-4"
    assert rows[0]["student_style"] == "claude"
    assert not rows[0]["is_consistent"]
    assert rows[1]["is_consistent"]
    rate = consistency_rate(det).collect()[0]
    assert rate["consistent"] == 1
    assert rate["total"] == 2
    assert rate["pct"] == 50.0


def test_probe_consistency_empty_response_unknown(spark):
    df = _responses_df(spark, {"t": [GPT4ISH[0], ""], "s": GPT4ISH})
    rows = probe_style_consistency(df, spark, "t", "s").collect()
    assert rows[1]["teacher_style"] == "unknown"
    assert not rows[1]["is_consistent"]
