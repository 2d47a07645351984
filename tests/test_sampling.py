"""Deterministic hash sampling, stratified rates, and corpus mixing."""

import pytest
from pyspark.sql import functions as F

from model_audit_spark.operators.sampling import (
    BUCKETS,
    corpus_mix,
    hash_sample,
    mix_rates,
    sample_bucket,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 600 docs: 300 en / 200 fr / 100 zh
    rows = [
        (i, "en" if i < 300 else ("fr" if i < 500 else "zh"), f"text {i}")
        for i in range(600)
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"]).cache()


def test_hash_sample_deterministic_and_subset(spark, corpus):
    a = {r["doc_id"] for r in hash_sample(corpus, 0.3, salt="x").collect()}
    b = {r["doc_id"] for r in hash_sample(corpus, 0.3, salt="x").collect()}
    assert a == b
    # lowering the rate yields a strict subset (same hash, lower threshold)
    small = {r["doc_id"] for r in hash_sample(corpus, 0.1, salt="x").collect()}
    assert small < a
    # rate is approximately honored
    assert 0.2 * 600 < len(a) < 0.4 * 600


def test_hash_sample_salts_are_independent(spark, corpus):
    a = {r["doc_id"] for r in hash_sample(corpus, 0.5, salt="s1").collect()}
    b = {r["doc_id"] for r in hash_sample(corpus, 0.5, salt="s2").collect()}
    assert a != b
    # ~25% expected joint membership, not 0% or 50%
    assert 0.10 * 600 < len(a & b) < 0.40 * 600


def test_bucket_range(spark, corpus):
    stats = corpus.select(sample_bucket("doc_id", "x")).agg(
        F.min("bucket"), F.max("bucket")
    ).first()
    assert 0 <= stats[0] and stats[1] < BUCKETS


def test_stratified_sample_rates_per_stratum(spark, corpus):
    out = stratified_sample(
        corpus, {"en": 1.0, "fr": 0.5}, "lang", salt="x"
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 300          # rate 1.0 keeps everything
    assert 60 <= counts.get("fr", 0) <= 140   # ~100 of 200
    assert "zh" not in counts           # default rate 0


def test_mix_rates_binding_stratum_kept_whole(spark, corpus):
    # observed 300/200/100; target 1:1:1 -> zh binds, en/fr downsample to ~100
    rates = mix_rates(corpus, {"en": 1, "fr": 1, "zh": 1}, "lang")
    assert rates["zh"] == 1.0
    assert abs(rates["en"] - 100 / 300) < 1e-9
    assert abs(rates["fr"] - 100 / 200) < 1e-9


def test_corpus_mix_approaches_target(spark, corpus):
    out = corpus_mix(corpus, {"en": 1, "fr": 1, "zh": 1}, "lang", salt="x")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == 100
    assert 60 <= counts["en"] <= 140
    assert 60 <= counts["fr"] <= 140


def test_mix_rates_ignores_absent_stratum(spark, corpus):
    rates = mix_rates(corpus, {"en": 1, "ja": 1}, "lang")
    assert rates["ja"] == 0.0
    assert rates["en"] == 1.0  # en binds among present strata


def test_stratified_sample_plan_is_shuffle_free(spark, corpus):
    plan = (
        stratified_sample(corpus, {"en": 0.5}, "lang", salt="x")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange" not in plan
