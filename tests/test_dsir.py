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


def test_dsir_select_keeps_target_like_fraction_per_group(spark):
    import pyspark.sql.functions as F

    from model_audit_spark.operators.dsir import dsir_select, dsir_weights

    rows = (
        [(i, "the quick brown fox jumps high", "tgt") for i in range(5)]
        + [(10 + i, "the quick brown fox jumps high", "raw_a")
           for i in range(4)]
        + [(20 + i, "completely unrelated database text here", "raw_a")
           for i in range(4)]
        + [(30 + i, "another pool of unrelated words entirely", "raw_b")
           for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = dsir_weights(docs, F.col("source") == "tgt").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    out = dsir_select(w, keep_frac=0.5).collect()
    # target rows never appear
    assert all(r.source != "tgt" for r in out)
    kept = {r.doc_id for r in out if r.keep}
    # in raw_a, the target-identical docs outrank the unrelated ones
    assert {10, 11, 12, 13} <= kept or all(
        r.dsir_logweight
        >= max(x.dsir_logweight for x in out if x.source == "raw_a" and not x.keep)
        for r in out
        if r.doc_id in kept and r.source == "raw_a"
    )
    # strict-< keeps just under keep_frac plus the top row per group
    for g in ("raw_a", "raw_b"):
        grp = [r for r in out if r.source == g]
        n_kept = sum(r.keep for r in grp)
        assert 1 <= n_kept <= max(1, int(len(grp) * 0.5) + 1)
