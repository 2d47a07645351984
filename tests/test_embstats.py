"""Embedding-health analytics (operators/embstats.py) and
temperature-scaled mixture weights (operators/sampling.py)."""

import math

import pytest
from pyspark.sql import Row

from model_audit_spark.operators.embstats import (
    centroid_separation,
    embedding_dim_stats,
    label_centroids,
)
from model_audit_spark.operators.sampling import temperature_mix_weights


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 2.0], label=0),
        Row(vec_id=1, embedding=[3.0, 0.0, 4.0], label=0),
        Row(vec_id=2, embedding=[0.0, 5.0, 0.0], label=1),
        Row(vec_id=3, embedding=[0.0, 7.0, 0.0], label=1),
    ]
    return spark.createDataFrame(rows)


def test_dim_stats_moments(emb):
    out = {r["dim"]: r for r in embedding_dim_stats(emb).collect()}
    assert set(out) == {0, 1, 2}
    d0 = out[0]
    assert d0["n"] == 4
    assert d0["mean"] == 1.0  # (1+3+0+0)/4
    # pop variance of [1,3,0,0]: E[v^2]-mean^2 = 10/4 - 1 = 1.5
    assert d0["variance"] == 1.5
    assert d0["min_v"] == 0.0 and d0["max_v"] == 3.0
    # constant-zero dim for label-0 rows mixed with 5,7: dim 1
    assert out[1]["variance"] > 0


def test_dim_stats_dead_dimension(spark):
    rows = [Row(vec_id=i, embedding=[0.5, float(i)], label=0)
            for i in range(6)]
    out = {r["dim"]: r for r in
           embedding_dim_stats(spark.createDataFrame(rows)).collect()}
    assert out[0]["variance"] == 0.0  # dead dim detected
    assert out[1]["variance"] > 0


def test_label_centroids(emb):
    cent = {(r["label"], r["dim"]): r["c"]
            for r in label_centroids(emb).collect()}
    assert cent[(0, 0)] == 2.0  # (1+3)/2
    assert cent[(1, 1)] == 6.0  # (5+7)/2
    assert cent[(0, 1)] == 0.0


def test_centroid_separation_orthogonal(emb):
    # label-0 centroid (2,0,3) and label-1 centroid (0,6,0) are
    # orthogonal -> cosine 0
    rows = centroid_separation(emb).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["label_a"], r["label_b"]) == (0, 1)
    assert r["cosine"] == 0.0


def test_centroid_separation_collinear(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 1.0], label=0),
        Row(vec_id=1, embedding=[2.0, 2.0], label=1),
    ]
    out = centroid_separation(spark.createDataFrame(rows)).collect()
    assert out[0]["cosine"] == 1.0  # collapse detected


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(90):
        rows.append(Row(doc_id=i, source="big", n_chars=100))
    for i in range(90, 100):
        rows.append(Row(doc_id=i, source="small", n_chars=100))
    return spark.createDataFrame(rows)


def test_temperature_alpha_one_is_natural_share(docs):
    out = {r["stratum"]: r for r in
           temperature_mix_weights(docs, alpha=1.0,
                                   size_col="n_chars").collect()}
    assert out["big"]["share"] == 0.9
    assert out["big"]["weight"] == 0.9
    assert out["small"]["weight"] == 0.1


def test_temperature_alpha_zero_is_uniform(docs):
    out = {r["stratum"]: r for r in
           temperature_mix_weights(docs, alpha=0.0,
                                   size_col="n_chars").collect()}
    assert out["big"]["weight"] == 0.5
    assert out["small"]["weight"] == 0.5


def test_temperature_flattens_head(docs):
    out = {r["stratum"]: r for r in
           temperature_mix_weights(docs, alpha=0.7,
                                   size_col="n_chars").collect()}
    # 0.7-temperature sits strictly between natural and uniform
    assert 0.5 < out["big"]["weight"] < 0.9
    expect = 9000 ** 0.7 / (9000 ** 0.7 + 1000 ** 0.7)
    assert math.isclose(out["big"]["weight"], round(expect, 6),
                        abs_tol=1e-6)
    # weights sum to 1
    total = sum(r["weight"] for r in out.values())
    assert math.isclose(total, 1.0, abs_tol=2e-6)


def test_temperature_row_count_mode(docs):
    # without size_col the temperature acts on document counts
    out = {r["stratum"]: r for r in
           temperature_mix_weights(docs, alpha=1.0).collect()}
    assert out["big"]["size"] == 90
    assert out["big"]["weight"] == 0.9


def test_principal_direction_recovers_dominant_axis(spark):
    from pyspark.sql import Row
    from model_audit_spark.operators.embstats import principal_direction

    # points along the (0.6, 0.8) axis plus a tiny orthogonal dim
    rows = [Row(vec_id=i, embedding=[0.6 * i, 0.8 * i, 0.001],
                label=0) for i in range(1, 9)]
    out = {r["dim"]: r["loading"]
           for r in principal_direction(
               spark.createDataFrame(rows)).collect()}
    assert abs(out[0] - 0.6) < 0.01
    assert abs(out[1] - 0.8) < 0.01
    assert abs(out[2]) < 0.01


def test_principal_direction_zero_variance_safe(spark):
    from pyspark.sql import Row
    from model_audit_spark.operators.embstats import principal_direction

    rows = [Row(vec_id=i, embedding=[1.0, 1.0], label=0)
            for i in range(4)]
    out = principal_direction(spark.createDataFrame(rows)).collect()
    assert [r["loading"] for r in out] == [0.0, 0.0]


def test_embedding_coverage_missing_and_orphans(spark):
    """3 docs in source a (2 covered), 1 doc in b (0 covered); one
    orphan vector id 99."""
    from model_audit_spark.operators.embstats import embedding_coverage

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")],
        "doc_id long, source string",
    )
    vecs = spark.createDataFrame(
        [(1,), (2,), (99,)], "vec_id long"
    )
    got = {r.source: r for r in embedding_coverage(docs, vecs).collect()}
    a, b = got["a"], got["b"]
    assert (a.n_docs, a.n_with_embedding, a.n_missing) == (3, 2, 1)
    assert a.coverage_ppm == 666_666
    assert (b.n_with_embedding, b.coverage_ppm) == (0, 0)
    assert a.n_orphan_vectors == 1 and b.n_orphan_vectors == 1
