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


def test_uniform_layer_indices():
    from model_audit_spark.sources.hidden_states import uniform_layer_indices

    assert uniform_layer_indices(13, None) == list(range(13))
    assert uniform_layer_indices(13, 20) == list(range(13))
    # reference formula: int(i * (total-1) / (num_layers-1))
    assert uniform_layer_indices(13, 4) == [0, 4, 8, 12]
    assert uniform_layer_indices(13, 2) == [0, 12]
    assert uniform_layer_indices(13, 1) == [0]


def test_extract_hidden_states_with_fake_model(spark):
    """The S11 source with an injected tiny 'model': per-model group load,
    uniform layer sampling, long-relation output that layer_cka consumes."""
    from model_audit_spark.sources.hidden_states import extract_hidden_states

    def fake_loader(model_id, texts):
        # 5 'layers', vec dim 3; deterministic in (model, layer, sample).
        bias = 0.0 if model_id == "ma" else 100.0
        return [
            [
                [bias + layer, float(len(t)), float(s)]
                for s, t in enumerate(texts)
            ]
            for layer in range(5)
        ]

    texts = spark.createDataFrame(
        [
            (m, s, f"text {s} for {m}")
            for m in ("ma", "mb")
            for s in range(4)
        ],
        "model_id STRING, sample INT, text STRING",
    )
    hidden = extract_hidden_states(texts, num_layers=3, loader=fake_loader)
    rows = hidden.collect()
    # 2 models × 3 sampled layers × 4 samples
    assert len(rows) == 24
    assert {r.layer for r in rows} == {0, 1, 2}  # renumbered 0..k-1
    assert all(len(r.vec) == 3 for r in rows)
    # uniform sampling picked original layers [0, 2, 4]: the fake encodes
    # the ORIGINAL layer index (+bias) in vec[0]
    ma = {
        (r.layer, r.sample): r.vec
        for r in rows
        if r.model_id == "ma"
    }
    assert ma[(0, 0)][0] == 0.0
    assert ma[(1, 0)][0] == 2.0
    assert ma[(2, 0)][0] == 4.0
    # the relation feeds the existing whitebox comparison unchanged
    verdict = reef_compare(hidden, "ma", "mb").first()
    assert 0.0 <= verdict.similarity <= 1.0


def test_hf_extract_raises_importerror_without_torch():
    from model_audit_spark.sources.hidden_states import _hf_extract

    with pytest.raises(ImportError, match="whitebox"):
        _hf_extract("tiny-model", ["hello"])


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
