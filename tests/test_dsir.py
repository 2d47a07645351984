"""DSIR importance resampling (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from model_audit_spark.operators.dsir import dsir_weights, hashed_bucket


def _docs(spark):
    target_text = "quantum physics experiments measure entangled photon states"
    raw_text = "buy cheap shoes online free shipping best discount deals"
    rows = (
        [(i, target_text, "wiki") for i in range(4)]
        + [(i + 10, raw_text, "web") for i in range(4)]
        + [(20, "quantum physics experiments are measured here too", "web")]
        + [(21, "word", "web"), (22, None, "web")]
    )
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_target_like_docs_score_higher(spark):
    out = {
        r.doc_id: r
        for r in dsir_weights(
            _docs(spark), F.col("source") == "wiki"
        ).collect()
    }
    # the raw doc written in target vocabulary outscores pure-raw docs
    assert out[20].dsir_logweight > out[10].dsir_logweight
    # target docs themselves carry positive weight, raw docs negative
    assert out[0].dsir_logweight > 0 > out[10].dsir_logweight


def test_short_and_null_docs_emit_zero_rows(spark):
    out = {
        r.doc_id: r
        for r in dsir_weights(
            _docs(spark), F.col("source") == "wiki"
        ).collect()
    }
    assert len(out) == 11  # every input doc present
    for did in (21, 22):  # single-word and NULL text: no bigrams
        assert out[did].n_feats == 0
        assert out[did].dsir_nanonats == 0
        assert out[did].dsir_logweight == 0.0


def test_weight_is_nanonats_over_1e9_exactly(spark):
    for r in dsir_weights(
        _docs(spark), F.col("source") == "wiki"
    ).collect():
        assert r.dsir_logweight == r.dsir_nanonats / 1e9


def test_hashed_bucket_range(spark):
    rows = (
        spark.range(1000)
        .select(hashed_bucket(F.col("id").cast("string"), 97).alias("b"))
        .agg(F.min("b"), F.max("b"), F.countDistinct("b"))
        .first()
    )
    assert rows[0] >= 0 and rows[1] < 97
    assert rows[2] > 50  # buckets actually spread
