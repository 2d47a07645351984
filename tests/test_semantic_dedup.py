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


def test_derived_n_clusters_integer_exact():
    from model_audit_spark.operators.similarity import derived_n_clusters

    assert derived_n_clusters(0) == 1
    assert derived_n_clusters(1) == 1
    assert derived_n_clusters(9) == 3      # perfect square -> isqrt
    assert derived_n_clusters(10) == 4     # next integer up
    assert derived_n_clusters(500) == 23   # sf0.01 embeddings table


def test_default_k_is_derived_from_corpus_count(spark):
    # 9 vectors, k derived = ceil(sqrt(9)) = 3: the 3 lowest-id vectors
    # seed 3 distinct centroids, so all 3 cluster ids appear in output
    vecs = [[1, 0, 0], [0, 1, 0], [0, 0, 1]] * 3
    out = semantic_dedup(_emb(spark, vecs), threshold=0.9).collect()
    assert {r["cluster"] for r in out} == {0, 1, 2}
    # each direction keeps exactly its min-id representative
    assert sorted(r["vec_id"] for r in out if r["keep"]) == [0, 1, 2]


def test_max_cluster_size_bounds_hot_cluster_pairs(spark):
    """Skewed fixture: 40 identical vectors land in ONE cluster. With
    max_cluster_size=10 the hot cluster is hash-split into ceil(40/10)=4
    sub-buckets; comparisons stay within a sub-bucket, so exactly one
    vector per NON-EMPTY sub-bucket survives (the sub-bucket min id).
    Pins both the population bound and the documented recall cost."""
    from pyspark.sql import functions as F

    n, cap = 40, 10
    emb = _emb(spark, [[1, 0, 0, 0]] * n)
    out = semantic_dedup(
        emb, threshold=0.9, n_clusters=1, max_cluster_size=cap
    ).collect()
    # expected sub-bucket of each id, recomputed with the same hash
    buckets = {
        r["b"]
        for r in spark.range(n)
        .select(F.pmod(F.xxhash64(F.col("id")), F.lit(n // cap)).alias("b"))
        .collect()
    }
    kept = [r["vec_id"] for r in out if r["keep"]]
    assert len(kept) == len(buckets)
    assert 1 < len(kept) <= n // cap  # split happened, bounded by ceil(pop/cap)
    # uncapped: the whole cluster collapses to the single min id
    un = semantic_dedup(emb, threshold=0.9, n_clusters=1).collect()
    assert [r["vec_id"] for r in un if r["keep"]] == [0]


def test_lloyd_kmeans_separates_two_blobs(spark):
    """Two well-separated 4-d blobs: k=2 Lloyd must put each blob in
    one cluster regardless of the seeded init, and the result must be
    identical under repartitioning (pure integer arithmetic)."""
    from model_audit_spark.operators.similarity import lloyd_kmeans

    rows = [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(10)]
    rows += [(100 + i, [-1.0, -1.0, 0.0, 0.0]) for i in range(10)]
    # small jitter that cannot bridge the blobs
    rows = [
        (i, [x + (i % 3) * 0.01 for x in v]) for i, v in rows
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lloyd_kmeans(df, k=2, iterations=3).collect()
    lo = {r.cluster for r in out if r.vec_id < 100}
    hi = {r.cluster for r in out if r.vec_id >= 100}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    again = lloyd_kmeans(
        df.repartition(5), k=2, iterations=3
    ).collect()
    assert sorted((r.vec_id, r.cluster) for r in again) == sorted(
        (r.vec_id, r.cluster) for r in out
    )


def test_cluster_topics_lift_hand_computed(spark):
    """Two clusters with disjoint signature words sharing one common
    word: the signature word tops its cluster; shared filler scores
    lift ~1x and never outranks it."""
    from model_audit_spark.operators.similarity import cluster_topics

    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "doc_id long, cluster long"
    )
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple common common"),
            (2, "apple apple common common common"),
            (3, "zebra zebra zebra common common"),
            (4, "zebra zebra common common common"),
        ],
        "doc_id long, text string",
    )
    got = cluster_topics(assign, docs, top_k=2, min_tf=2).collect()
    top = {
        r.cluster: r.term for r in got if r.rank == 1
    }
    assert top == {0: "apple", 1: "zebra"}
    # hand numbers for apple: tf_class=5, tf_global=5, T_c=10, N=20
    # lift = 5*20*1e6 // (5*10) = 2_000_000 (2x)
    a = next(r for r in got if r.cluster == 0 and r.term == "apple")
    assert (a.tf_class, a.tf_global, a.lift_ppm) == (5, 5, 2_000_000)
    c = next(r for r in got if r.cluster == 0 and r.term == "common")
    assert c.lift_ppm == 1_000_000  # 5*20*1e6 // (10*10)


def test_kmeans_cluster_quality_two_blobs(spark):
    """Quality report on two tight, well-separated blobs: scatter per
    cluster is the hand-computed within-blob spread, db_ppk is the
    same small number for both clusters (symmetric pair), and a
    tighter-blob variant lowers its own scatter but both clusters'
    DB components (shared numerator)."""
    from model_audit_spark.operators.similarity import (
        kmeans_cluster_quality,
    )

    rows = [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(6)]
    rows += [(100 + i, [-1.0, -1.0, 0.0, 0.0]) for i in range(6)]
    rows = [(i, [x + (i % 3) * 0.01 for x in v]) for i, v in rows]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.cluster: r for r in kmeans_cluster_quality(
        df, k=2, iterations=3).collect()}
    assert len(out) == 2
    assert all(r.n_vectors == 6 for r in out.values())
    # jitter spread: per blob, dims 0-3 each take values c, c+1e4,
    # c+2e4 (micro units) twice; centroid per dim = mean = c + 1e4;
    # dist² per member = 4 dims · (1e4)² · {1,0,1} -> members at
    # offset 0 and 2e4 contribute 4e8, the middle ones 0.
    # scatter = (4 members · 4e8) DIV 6 = 266666666
    assert all(r.scatter == 266666666 for r in out.values())
    # centroids differ by 2.01e6 micro in dims 0,1 -> m2 ≈ 8.08e12;
    # db_ppk = (s_i+s_j)*1000 DIV m2 = 533333332000 DIV m2 -> 0 ppk
    # at this separation (blobs are far apart relative to spread)
    assert all(r.db_ppk == 0 for r in out.values())
    # identical under repartition (pure integer arithmetic)
    again = {r.cluster: r for r in kmeans_cluster_quality(
        df.repartition(5), k=2, iterations=3).collect()}
    assert {(c, r.n_vectors, r.scatter, r.db_ppk)
            for c, r in out.items()} == {
        (c, r.n_vectors, r.scatter, r.db_ppk) for c, r in again.items()}
