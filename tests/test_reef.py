"""REEF CKA tests mirroring reference tests/test_reef.py:20-63 plus the
DataFrame-only CKA path (cka_long) against the numpy kernel."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from model_audit_spark.operators.reef import (
    cka_long,
    cka_numpy,
    layer_cka,
    reef_compare,
)


def test_cka_identity_is_one():
    X = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 10.0]]
    assert cka_numpy(X, X) == pytest.approx(1.0)


def test_cka_n_below_two_is_zero():
    assert cka_numpy([[1.0, 2.0]], [[1.0, 2.0]]) == 0.0


def test_cka_zero_matrix_is_zero():
    Z = [[0.0, 0.0], [0.0, 0.0]]
    X = [[1.0, 2.0], [3.0, 4.0]]
    assert cka_numpy(Z, X) == 0.0


def test_cka_mismatched_dims_ok():
    X = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]
    Y = [[1.0, 2.0], [3.0, 4.0], [5.0, 7.0]]
    v = cka_numpy(X, Y)
    assert 0.0 <= v <= 1.0


def _long(spark, mat, name):
    rows = [
        (s, d, float(v))
        for s, vec in enumerate(mat)
        for d, v in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "sample INT, dim INT, v DOUBLE")


def test_cka_long_matches_numpy(spark):
    import random

    rng = random.Random(7)
    X = [[rng.gauss(0, 1) for _ in range(5)] for _ in range(12)]
    Y = [[rng.gauss(0, 1) for _ in range(4)] for _ in range(12)]
    expected = cka_numpy(X, Y)
    got = cka_long(_long(spark, X, "x"), _long(spark, Y, "y")).first().cka
    assert got == pytest.approx(expected, rel=1e-9)


def test_layer_cka_and_reef_compare(spark):
    # two models, 2 layers, identical representations -> cka 1 per layer
    rows = []
    for model in ("a", "b"):
        for layer in (0, 1):
            for sample in range(4):
                vec = [float(sample + layer), float(sample * 2), 1.0]
                rows.append((model, layer, sample, vec))
    hidden = spark.createDataFrame(
        rows, "model_id STRING, layer INT, sample INT, vec ARRAY<DOUBLE>"
    )
    per_layer = {r.layer: r.cka for r in layer_cka(hidden, "a", "b").collect()}
    assert per_layer[0] == pytest.approx(1.0)
    assert per_layer[1] == pytest.approx(1.0)
    verdict = reef_compare(hidden, "a", "b").first()
    assert verdict.similarity == pytest.approx(1.0)
    assert verdict.is_derived and verdict.method == "reef"
    assert verdict.threshold == 0.85


def test_layer_cka_truncates_to_shared_layers(spark):
    rows = []
    for layer in (0, 1, 2):
        for sample in range(3):
            rows.append(("a", layer, sample, [float(sample), 1.0]))
    for layer in (0, 1):
        for sample in range(3):
            rows.append(("b", layer, sample, [float(sample), 1.0]))
    hidden = spark.createDataFrame(
        rows, "model_id STRING, layer INT, sample INT, vec ARRAY<DOUBLE>"
    )
    layers = sorted(r.layer for r in layer_cka(hidden, "a", "b").collect())
    assert layers == [0, 1]  # layer 2 dropped (min(L_a, L_b))
