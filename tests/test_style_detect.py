"""Style-detection golden gate: all 14 benchmark samples must classify to
their true family (reference tests/test_style.py:94-121 semantics), plus the
scoring-regression fixtures.
"""

import pytest
from pyspark.sql import functions as F

from model_audit_spark.catalogs import benchmark_df
from model_audit_spark.operators.detect import (
    detect,
    detection_distribution,
    evaluate_accuracy,
    style_scores,
)


@pytest.fixture(scope="module")
def bench(spark):
    return benchmark_df(spark)


def test_benchmark_14_of_14(spark, bench):
    det = detect(bench, spark, text_col="text", id_col="text_id")
    joined = det.join(bench.select("text_id", "label"), "text_id")
    rows = joined.select("text_id", "predicted_model", "label").collect()
    wrong = [r for r in rows if r["predicted_model"] != r["label"]]
    assert len(rows) == 14
    assert not wrong, f"misclassified: {wrong}"


def test_accuracy_operator(spark, bench):
    det = detect(bench, spark, text_col="text", id_col="text_id")
    preds = det.join(bench.select("text_id", "label"), "text_id")
    acc = evaluate_accuracy(preds).collect()[0]
    assert acc["total"] == 14
    assert acc["correct"] == 14
    assert acc["accuracy"] == 1.0
    assert all(v == 1.0 for v in acc["per_class"].values())


def test_plain_text_lang_only_score(spark):
    # Plain short text scores exactly 0.20 (lang match only) for families with
    # no structural tendencies (mistral, phi) — reference tests/test_style.py:108-114.
    df = spark.createDataFrame(
        [(0, "The weather is nice today and birds are singing.")],
        "doc_id BIGINT, text STRING",
    )
    scores = {
        (r["family"]): r["score"]
        for r in style_scores(df, spark, "text", "doc_id").collect()
    }
    assert scores["mistral"] == pytest.approx(0.20)
    assert scores["phi"] == pytest.approx(0.20)
    # zh-only families get no lang score
    assert scores["qwen"] == pytest.approx(0.0)


def test_code_block_ranks_gpt4_over_gemini(spark):
    text = "Here's the code:\n```python\nprint('x')\n```"
    df = spark.createDataFrame([(0, text)], "doc_id BIGINT, text STRING")
    scores = {
        r["family"]: r["score"]
        for r in style_scores(df, spark, "text", "doc_id").collect()
    }
    assert scores["gpt-4"] > scores["gemini"]


def test_argmax_tie_break_is_catalog_order(spark):
    # A text where several families tie at the lang-only score: the argmax must
    # return the first family in catalog order among the tied (gpt-4 rank 0).
    df = spark.createDataFrame(
        [(0, "plain words with no markers at all")], "doc_id BIGINT, text STRING"
    )
    long = style_scores(df, spark, "text", "doc_id")
    best = long.agg(
        F.expr("max_by(family, struct(score, -family_rank))").alias("p"),
        F.max("score").alias("s"),
    ).collect()[0]
    ties = [
        r["family"] for r in long.collect() if r["score"] == best["s"]
    ]
    det = detect(df, spark, "text", "doc_id").collect()[0]
    assert det["predicted_model"] == best["p"]
    # ensure the tie-break picked the minimum-rank family among ties
    fams_in_order = [f for f, *_ in __import__(
        "model_audit_spark.catalogs", fromlist=["STYLE_SIGNATURES"]
    ).STYLE_SIGNATURES]
    first_tied = min(ties, key=fams_in_order.index)
    assert det["predicted_model"] == first_tied


def test_distribution(spark, bench):
    det = detect(bench, spark, text_col="text", id_col="text_id")
    dist = {r["predicted_model"]: (r["n_texts"], r["pct"])
            for r in detection_distribution(det).collect()}
    assert dist["gpt-4"][0] == 3
    assert sum(n for n, _ in dist.values()) == 14
    assert dist["claude"][1] == pytest.approx(round(3 / 14 * 100, 2))
