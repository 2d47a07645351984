"""Decontamination: eval n-gram overlap detection and corpus filtering."""

import pytest
from pyspark.sql import functions as F

from model_audit_spark.operators.decontam import (
    contamination,
    decontaminate,
    eval_shingle_hashes,
)

EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"
CLEAN_TEXT = "completely unrelated words about spark execution engines here"


@pytest.fixture()
def corpora(spark):
    ev = spark.createDataFrame([(100, EVAL_TEXT)], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            # verbatim copy of the eval doc -> fully contaminated
            (1, EVAL_TEXT),
            # shares exactly one 5-gram window's worth of prefix
            (2, "the quick brown fox jumps into a completely different river"),
            # clean
            (3, CLEAN_TEXT),
            # too short for any 5-gram
            (4, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    return train, ev


def test_contamination_flags_overlap_only(spark, corpora):
    train, ev = corpora
    rows = {
        r["doc_id"]: r
        for r in contamination(train, ev, shingle_n=5).collect()
    }
    assert set(rows) == {1, 2}
    # 10 tokens -> 6 distinct 5-grams, all shared
    assert rows[1]["n_sh"] == 6
    assert rows[1]["n_overlap"] == 6
    assert rows[1]["overlap_frac"] == 1.0
    # doc 2: first 5 tokens match -> exactly one shared 5-gram
    assert rows[2]["n_overlap"] == 1
    assert 0.0 < rows[2]["overlap_frac"] < 1.0


def test_eval_shingle_hashes_distinct(spark, corpora):
    _, ev = corpora
    hashes = eval_shingle_hashes(ev, shingle_n=5).collect()
    assert len(hashes) == 6
    assert len({r["_h"] for r in hashes}) == 6


def test_decontaminate_drops_flagged_docs(spark, corpora):
    train, ev = corpora
    kept = decontaminate(train, ev, shingle_n=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]
    # schema passes through untouched
    assert kept.columns == train.columns


def test_decontaminate_min_overlap_threshold(spark, corpora):
    train, ev = corpora
    # requiring >= 2 shared 5-grams keeps the single-gram doc 2
    kept = decontaminate(train, ev, shingle_n=5, min_overlap=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]


def test_contamination_shuffle_join_fallback(spark, corpora):
    train, ev = corpora
    a = contamination(train, ev, shingle_n=5, broadcast_eval=True)
    b = contamination(train, ev, shingle_n=5, broadcast_eval=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_contamination_plan_broadcasts_eval(spark, corpora):
    train, ev = corpora
    plan = (
        contamination(train, ev, shingle_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_embedding_contamination_planted_leak(spark):
    import random

    from model_audit_spark.operators.decontam import (
        embedding_contamination,
    )

    rng = random.Random(11)
    dim = 16
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(30)]
    # plant: train vector 100 is a near-copy of eval vector 5
    eval_ids = {i for i, _ in vecs if i % 5 == 0}
    base = dict(vecs)[5]
    vecs.append((101, [x + rng.gauss(0, 1e-6) for x in base]))
    emb = spark.createDataFrame(
        vecs, "vec_id INT, embedding ARRAY<DOUBLE>"
    )
    tr = emb.filter("vec_id % 5 != 0")
    ev = emb.filter("vec_id % 5 = 0")
    out = {
        r.train_id: (r.eval_id, r.cosine_sim)
        for r in embedding_contamination(
            tr, ev, threshold=0.9, n_planes=8, dim=dim
        ).collect()
    }
    assert 101 in out and out[101][0] == 5 and out[101][1] >= 0.999999
    # every flagged pair is genuinely train-vs-eval
    for train_id, (eval_id, _) in out.items():
        assert train_id % 5 != 0 and eval_id in eval_ids


def test_embedding_contamination_salt_invariance(spark):
    """The (bucket, salt) join enumerates the identical candidate pairs
    for every salt_buckets value — salting spreads a hot bucket's work
    across tasks, it must never change the output (r11; the skew tier
    measured one task carrying a flooded bucket's full train x eval
    product)."""
    import random

    from model_audit_spark.operators.decontam import (
        embedding_contamination,
    )

    rng = random.Random(23)
    dim = 16
    # one tight cluster so every vector shares a bucket (the hot case)
    center = [rng.gauss(0, 1) for _ in range(dim)]
    vecs = [
        (i, [x + rng.gauss(0, 0.01) for x in center]) for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "vec_id INT, embedding ARRAY<DOUBLE>")
    tr = emb.filter("vec_id % 5 != 0")
    ev = emb.filter("vec_id % 5 = 0")
    outs = [
        sorted(
            map(
                tuple,
                embedding_contamination(
                    tr, ev, threshold=0.9, n_planes=6, dim=dim,
                    salt_buckets=sb,
                ).collect(),
            )
        )
        for sb in (1, 4, 16)
    ]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0


def test_embedding_contamination_windowed_bound_and_equivalence(spark):
    """r13 bounded-candidate mode (VERDICT #1): on a single tight
    cluster (every vector in one LSH bucket — the hot case the r11 skew
    sweep measured super-linear), bucket_window=W must (a) emit only
    genuine train-vs-eval pairs, (b) STILL find a planted near-copy
    whose eval twin is its 1-D locality neighbor, and (c) match the
    unbounded mode exactly when W covers the whole bucket (frame spans
    the bucket, so truncation is vacuous)."""
    import random

    from model_audit_spark.operators.decontam import (
        embedding_contamination,
    )

    rng = random.Random(7)
    dim = 16
    center = [rng.gauss(0, 1) for _ in range(dim)]
    vecs = [
        (i, [x + rng.gauss(0, 0.05) for x in center]) for i in range(60)
    ]
    # plant: train vector 101 is a near-copy of eval vector 10
    base = dict(vecs)[10]
    vecs.append((101, [x + rng.gauss(0, 1e-7) for x in base]))
    emb = spark.createDataFrame(vecs, "vec_id INT, embedding ARRAY<DOUBLE>")
    tr = emb.filter("vec_id % 5 != 0")
    ev = emb.filter("vec_id % 5 = 0")

    win = {
        r.train_id: (r.eval_id, r.cosine_sim)
        for r in embedding_contamination(
            tr, ev, threshold=0.99, n_planes=4, dim=dim, bucket_window=3
        ).collect()
    }
    # (a) sides are honored
    for train_id, (eval_id, _) in win.items():
        assert train_id % 5 != 0 and eval_id % 5 == 0
    # (b) the planted near-copy is adjacent to its twin in projection
    # order (cosine ~1 => near-identical projection), so even W=3 keeps it
    assert 101 in win and win[101][0] == 10 and win[101][1] >= 0.999999

    unb = sorted(
        map(
            tuple,
            embedding_contamination(
                tr, ev, threshold=0.9, n_planes=4, dim=dim
            ).collect(),
        )
    )
    wide = sorted(
        map(
            tuple,
            embedding_contamination(
                tr, ev, threshold=0.9, n_planes=4, dim=dim,
                bucket_window=len(vecs),
            ).collect(),
        )
    )
    # (c) non-binding window == unbounded, and the hot case is non-empty
    assert wide == unb and len(unb) > 0
