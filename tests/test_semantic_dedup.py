"""SemDeDup-style semantic dedup (similarity.semantic_dedup)."""

from model_audit_spark.operators.similarity import semantic_dedup


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_exact_duplicate_dropped_min_id_kept(spark):
    emb = _emb(
        spark,
        [
            [1, 0, 0, 0],  # centroid 0 (seeded quantizer = 2 lowest ids)
            [0, 1, 0, 0],  # centroid 1
            [1, 0, 0, 0],  # exact dup of vec 0, same cluster
        ],
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.9, n_clusters=2).collect()
    }
    assert rows[0]["keep"] and not rows[2]["keep"]
    assert rows[2]["max_prior_sim"] == 1.0
    assert rows[0]["cluster"] == rows[2]["cluster"]


def test_below_threshold_survives_same_cluster(spark):
    emb = _emb(
        spark,
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 1, 0.5, 0],  # cluster 1, cosine to vec1 ≈ 0.894
        ],
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.9, n_clusters=2).collect()
    }
    assert rows[2]["keep"]
    assert 0.89 < rows[2]["max_prior_sim"] < 0.9


def test_cross_cluster_dups_not_compared(spark):
    # vec 2 is identical to vec 0 but assigned to cluster 0 with it;
    # vec 3 is identical to vec 1 in cluster 1 — each cluster keeps its
    # min id only; no cross-cluster comparisons leak in
    emb = _emb(
        spark,
        [[1, 0, 0, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0]],
    )
    out = semantic_dedup(emb, threshold=0.9, n_clusters=2).collect()
    kept = sorted(r["vec_id"] for r in out if r["keep"])
    assert kept == [0, 1]


def test_all_kept_when_threshold_high(spark):
    emb = _emb(spark, [[1, 0], [0, 1], [0.6, 0.8]])
    out = semantic_dedup(emb, threshold=1.01, n_clusters=2).collect()
    assert all(r["keep"] for r in out)
