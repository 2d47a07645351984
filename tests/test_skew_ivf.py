"""Skew utilities + IVF search tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from model_audit_spark.operators.similarity import cosine_topk, ivf_topk
from model_audit_spark.operators.skew import (
    frequency_capped_explode,
    salted_count,
)


def test_salted_count_equals_plain_count(spark):
    df = spark.createDataFrame(
        [("hot",)] * 500 + [("a",)] * 3 + [("b",)] * 7, ["k"]
    )
    got = {r.k: r.n for r in salted_count(df, "k", salt_buckets=8).collect()}
    assert got == {"hot": 500, "a": 3, "b": 7}


def test_frequency_capped_explode_drops_boilerplate(spark):
    rows = [
        (1, ["common", "x1"]),
        (2, ["common", "x2"]),
        (3, ["common", "x3"]),
        (4, ["common", "x4"]),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, toks ARRAY<STRING>")
    kept = frequency_capped_explode(
        df, "toks", "doc_id", max_doc_frequency=0.5
    )
    els = {r.el for r in kept.collect()}
    assert "common" not in els  # df=4/4 > cap 2
    assert els == {"x1", "x2", "x3", "x4"}


def test_ivf_topk_contains_query_and_overlaps_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = [r.vec_id for r in cosine_topk(emb, 0, 10).collect()]
    approx = ivf_topk(emb, 0, 10, n_clusters=8, nprobe=3).collect()
    ids = [r.vec_id for r in approx]
    assert ids[0] == 0 and approx[0].cosine_sim == pytest.approx(1.0)
    # nprobe=3/8 cells: expect meaningful recall vs exact top-10
    assert len(set(exact) & set(ids)) >= 5
    # deterministic across runs (seeded kmeans)
    again = [
        r.vec_id for r in ivf_topk(emb, 0, 10, n_clusters=8, nprobe=3).collect()
    ]
    assert ids == again


def test_ivf_seeded_quantizer_split_build_probe(spark):
    """The oracle-checked path: seeded-sample quantizer, explicit
    build (assign) / probe split, deterministic across runs."""
    from model_audit_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids_seeded,
        ivf_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids_seeded(emb, n_clusters=8)
    assert len(cents) == 8 and len(cents[0]) == 64
    assigned = ivf_assign(emb, cents)
    # every vector lands in exactly one of the 8 cells
    assert assigned.count() == emb.count()
    assert assigned.filter(
        (F.col("cluster") < 0) | (F.col("cluster") >= 8)
    ).count() == 0
    # a centroid's own vector must be assigned to its cell (cos=1 argmax)
    own = {r.vec_id: r.cluster for r in assigned.filter(
        F.col("vec_id") < 8).collect()}
    assert own == {i: i for i in range(8)}
    res = ivf_probe(assigned, 0, cents, k=10, nprobe=3).collect()
    ids = [r.vec_id for r in res]
    assert ids[0] == 0 and res[0].cosine_sim == pytest.approx(1.0)
    again = [
        r.vec_id
        for r in ivf_probe(assigned, 0, cents, k=10, nprobe=3).collect()
    ]
    assert ids == again


def test_ivf_index_write_probe_partition_pruned(spark, tmp_path):
    """Materialized inverted file: probe over the partitioned layout gives
    the same answer as the in-memory probe, and the candidate scan is
    dynamic-partition-pruned (only nprobe of the cluster directories are
    read)."""
    from model_audit_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids_seeded,
        ivf_index_read,
        ivf_index_write,
        ivf_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids_seeded(emb, n_clusters=8)
    assigned = ivf_assign(emb, cents)
    path = str(tmp_path / "ivf_index")
    ivf_index_write(assigned, path)

    # one directory per cluster IS the inverted file
    import os
    dirs = sorted(d for d in os.listdir(path) if d.startswith("cluster="))
    assert dirs == [f"cluster={i}" for i in range(8)]

    indexed = ivf_index_read(spark, path)
    mem = [(r.vec_id, r.cosine_sim)
           for r in ivf_probe(assigned, 0, cents, k=10, nprobe=3).collect()]
    idx = [(r.vec_id, r.cosine_sim)
           for r in ivf_probe(indexed, 0, cents, k=10, nprobe=3).collect()]
    assert mem == idx

    plan = ivf_probe(indexed, 0, cents, k=10, nprobe=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "dynamicpruning" in plan or "PartitionFilters: [isnotnull(cluster" in plan


def test_heavy_hitters_cms_finds_hot_keys_only(spark):
    from pyspark.sql import functions as F

    from model_audit_spark.operators.skew import heavy_hitters_cms

    df = spark.range(50_000).select(
        F.when(F.col("id") % 100 < 30, F.lit("hot_a"))
        .when(F.col("id") % 100 < 45, F.lit("hot_b"))
        .otherwise(F.concat(F.lit("cold"), F.col("id")))
        .alias("k")
    )
    rows = heavy_hitters_cms(df, "k", min_share=0.05).collect()
    got = {r.value: r.est_count for r in rows}
    assert set(got) == {"hot_a", "hot_b"}
    # CMS never undercounts; overcount bounded by eps*N = 50
    assert 15_000 * 0.3 <= got["hot_b"] <= 15_000 + 50 + 1
    assert got["hot_a"] >= got["hot_b"]
    # exact follow-up on survivors matches true counts
    exact = {
        r.k: r.n
        for r in df.filter(F.col("k").isin(list(got)))
        .groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert exact == {"hot_a": 15_000, "hot_b": 7_500} or exact == {
        "hot_a": 30 * 500, "hot_b": 15 * 500
    }


def test_heavy_hitters_cms_empty_and_uniform(spark):
    from pyspark.sql import functions as F

    from model_audit_spark.operators.skew import heavy_hitters_cms

    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters_cms(empty, "k").collect() == []
    uniform = spark.range(10_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("k")
    )
    # no value holds 1% of a uniform distribution
    assert heavy_hitters_cms(uniform, "k", min_share=0.01).collect() == []


def test_heavy_hitters_found_even_when_input_sorted_by_value(spark):
    """Candidate discovery must survive adversarial clustering: all
    occurrences of the hot value in the LAST partitions (sorted input) —
    the case a limit()-based sample would miss."""
    from pyspark.sql import functions as F

    from model_audit_spark.operators.skew import heavy_hitters_cms

    df = (
        spark.range(40_000)
        .select(
            F.when(F.col("id") >= 36_000, F.lit("zzz_hot"))
            .otherwise(F.concat(F.lit("a_cold"), F.col("id")))
            .alias("k")
        )
        .repartitionByRange(8, "k")  # hot value isolated in last range
    )
    rows = heavy_hitters_cms(df, "k", min_share=0.05).collect()
    assert [r.value for r in rows] == ["zzz_hot"]


def test_frequency_capped_explode_cms_drops_hot_elements(spark):
    from pyspark.sql import functions as F

    from model_audit_spark.operators.skew import (
        frequency_capped_explode,
        frequency_capped_explode_cms,
    )

    docs = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.array(
            F.lit("boiler"),  # in every doc -> hot
            F.concat(F.lit("rare"), F.col("id")),
        ).alias("els"),
    )
    out = frequency_capped_explode_cms(
        docs, "els", "doc_id", max_share=0.1
    )
    kept = {r.el for r in out.collect()}
    assert "boiler" not in kept
    assert len(kept) == 2_000  # every rare element survives
    # exact twin agrees on this clear-margin fixture
    exact = {
        r.el
        for r in frequency_capped_explode(
            docs, "els", "doc_id", max_doc_frequency=0.5
        ).collect()
    }
    assert kept == exact


def test_salted_join_equals_plain_join(spark):
    from model_audit_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(k, i) for k in ["hot", "a", "b"] for i in range(20 if k == "hot" else 3)],
        "k string, uid int",
    )
    right = spark.createDataFrame(
        [("hot", "H1"), ("hot", "H2"), ("a", "A"), ("c", "C")],
        "k string, payload string",
    )
    hot = spark.createDataFrame([("hot",)], "k string")
    out = salted_join(left, right, "k", n_salts=4, hot_keys=hot,
                      uid_col="uid")
    plain = left.join(right, "k")
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want  # lossless and duplicate-free, incl. 2-row hot build
    assert len(got) == 20 * 2 + 3  # hot fanout preserved, 'b'/'c' dropped


def test_salted_join_no_hot_keys_is_plain(spark):
    from model_audit_spark.operators.skew import salted_join

    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, uid int")
    right = spark.createDataFrame([("a", "A")], "k string, payload string")
    out = salted_join(left, right, "k")
    assert [tuple(r) for r in out.collect()] == [("a", 1, "A")]


def test_salted_join_empty_hot_relation(spark):
    from model_audit_spark.operators.skew import salted_join

    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, uid int")
    right = spark.createDataFrame(
        [("a", "A"), ("b", "B")], "k string, payload string"
    )
    hot = spark.createDataFrame([], "k string")
    out = salted_join(left, right, "k", hot_keys=hot, uid_col="uid")
    assert sorted(map(tuple, out.collect())) == [
        ("a", 1, "A"), ("b", 2, "B")]


def test_salted_join_spreads_hot_probe_rows(spark):
    """The salt column must actually split a hot key's probe rows across
    buckets (deterministically), not funnel them to one replica."""
    from pyspark.sql import functions as F

    n_salts = 4
    left = spark.range(100).select(
        F.lit("hot").alias("k"), F.col("id").alias("uid")
    )
    salts = left.select(
        F.pmod(F.xxhash64("uid"), F.lit(n_salts)).cast("int").alias("s")
    ).distinct()
    assert salts.count() == n_salts


def test_sq8_codes_bounded_and_reconstruction_error(spark):
    """Codes live in [0, 255]; per-dim reconstruction error is bounded
    by half a quantization step (rg/510); degenerate dims code to 0."""
    import random

    from pyspark.sql import functions as F

    from model_audit_spark.operators.similarity import (
        sq8_encode,
        sq8_params,
    )

    rng = random.Random(11)
    dim = 8
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(dim - 1)] + [7.0])
        for i in range(60)
    ]  # last dim constant -> degenerate
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = sq8_params(emb)
    p = params.collect()[0]
    codes = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, params).collect()}
    for i, vec in rows:
        cs = codes[i]
        assert all(0 <= c <= 255 for c in cs)
        assert cs[dim - 1] == 0  # degenerate dim
        for d in range(dim - 1):
            rg = p["rgs"][d]
            recon = p["mns"][d] + rg / 255.0 * cs[d]
            assert abs(recon - vec[d]) <= rg / 510.0 + 1e-9


def test_sq8_topk_recall_against_exact_dot(spark):
    """SQ8's 8-bit dot approximation recovers most of the exact top-k
    (tight quantization: recall@10 >= 0.8 on gaussian vectors)."""
    import random

    from model_audit_spark.operators.similarity import sq8_topk

    rng = random.Random(5)
    dim = 16
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r["vec_id"] for r in sq8_topk(emb, query_vec_id=0, k=10).collect()]
    q = rows[0][1]
    exact = sorted(
        ((i, sum(a * b for a, b in zip(q, v))) for i, v in rows),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    exact_ids = {i for i, _ in exact}
    assert len(set(got) & exact_ids) >= 8


def test_sq8_rerank_full_shortlist_equals_exact(spark):
    """With shortlist covering the whole corpus, SQ8 re-rank == the
    exact cosine top-k (the quantizer only prunes, never re-scores)."""
    import random

    from model_audit_spark.operators.similarity import (
        cosine_topk,
        sq8_rerank_topk,
    )

    rng = random.Random(9)
    dim = 12
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["vec_id"], r["cosine_sim"])
        for r in sq8_rerank_topk(
            emb, query_vec_id=0, k=10, shortlist=200
        ).collect()
    ]
    exact = [
        (r["vec_id"], r["cosine_sim"])
        for r in cosine_topk(emb, query_vec_id=0, k=10).collect()
    ]
    assert got == exact


def test_ivf_sq8_candidates_subset_of_probed_cells(spark):
    """IVF+SQ8 results come only from probed cells, and with nprobe
    covering every cell the hybrid equals plain SQ8 top-k (cell pruning
    is the ONLY difference between the two scorers)."""
    import random

    from model_audit_spark.operators.similarity import (
        ivf_centroids_seeded,
        ivf_assign,
        ivf_sq8_topk,
        sq8_topk,
    )
    from pyspark.sql import functions as F

    rng = random.Random(13)
    dim = 12
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_clusters = 4
    got = [
        r["vec_id"]
        for r in ivf_sq8_topk(
            emb, query_vec_id=0, k=10, n_clusters=n_clusters, nprobe=2
        ).collect()
    ]
    assert len(got) == 10
    # full-probe hybrid == plain SQ8
    full = [
        (r["vec_id"], r["approx_dot"])
        for r in ivf_sq8_topk(
            emb, query_vec_id=0, k=10,
            n_clusters=n_clusters, nprobe=n_clusters,
        ).collect()
    ]
    plain = [
        (r["vec_id"], r["approx_dot"])
        for r in sq8_topk(emb, query_vec_id=0, k=10).collect()
    ]
    assert full == plain


def test_ann_recall_report_floors(spark):
    """The measured-recall gate (r5): one row per ANN method, recall@10
    vs exact cosine on the sf0.001 fixture. Floors pinned from the
    DuckDB twin (ivf/ivf_sq8/sq8/sq8_rerank = 1.0, pq_rerank 0.7,
    lsh_multiprobe 0.4, pq 0.4, lsh 0.2) minus a margin of one hit —
    these are deterministic pipelines, so the pin is really equality,
    but the floor form keeps the test meaningful if the fixture grows."""
    from model_audit_spark.operators.similarity import ann_recall_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {
        r["method"]: r
        for r in ann_recall_report(emb, query_vec_id=0, k=10).collect()
    }
    assert set(rows) == {
        "ivf", "ivf_sq8", "lsh", "lsh_multiprobe",
        "pq", "pq_rerank", "sq8", "sq8_rerank",
    }
    floors = {
        "ivf": 1.0, "ivf_sq8": 1.0, "sq8": 1.0, "sq8_rerank": 1.0,
        "pq_rerank": 0.6, "lsh_multiprobe": 0.3, "pq": 0.3, "lsh": 0.1,
    }
    for m, floor in floors.items():
        assert rows[m]["recall_at_k"] >= floor, (m, rows[m])
    # the rerank stage must never hurt recall, and multiprobe must
    # dominate its single-bucket base (superset containment)
    assert rows["sq8_rerank"]["recall_at_k"] >= rows["sq8"]["recall_at_k"]
    assert rows["pq_rerank"]["recall_at_k"] >= rows["pq"]["recall_at_k"]
    assert (rows["lsh_multiprobe"]["recall_at_k"]
            >= rows["lsh"]["recall_at_k"])
    assert all(r["k_returned"] <= 10 for r in rows.values())


def test_ann_param_sweep_monotone_recall(spark):
    """Recall must be non-decreasing along every tunable axis: a larger
    probe radius / nprobe / shortlist probes a SUPERSET of candidates
    (r5 sweep operator)."""
    from model_audit_spark.operators.similarity import ann_param_sweep

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {
        (r["method"], r["param"]): r["recall_at_k"]
        for r in ann_param_sweep(emb, query_vec_id=0, k=10).collect()
    }
    assert len(rows) == 10
    assert (rows[("lsh_multiprobe", "radius=0")]
            <= rows[("lsh_multiprobe", "radius=1")]
            <= rows[("lsh_multiprobe", "radius=2")])
    assert (rows[("ivf", "nprobe=1")]
            <= rows[("ivf", "nprobe=2")]
            <= rows[("ivf", "nprobe=8")])
    assert (rows[("sq8_rerank", "shortlist=10")]
            <= rows[("sq8_rerank", "shortlist=50")])
    assert (rows[("pq_rerank", "shortlist=10")]
            <= rows[("pq_rerank", "shortlist=50")])
    # nprobe=8 of 8 cells probes everything -> exact
    assert rows[("ivf", "nprobe=8")] == 1.0


def test_ivf_sq8_persisted_index_probe(spark, tmp_path):
    """The persisted IVF+SQ8 index (r5): probe-from-disk output equals
    the in-memory (oracle-certified) ivf_sq8_topk, and the codes scan
    is dynamic-partition-pruned to the probed cells — the float corpus
    is never read on the probe path."""
    from model_audit_spark.operators.similarity import (
        as_double_array,
        ivf_sq8_index_probe,
        ivf_sq8_index_write,
        ivf_sq8_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_sq8_index")
    ivf_sq8_index_write(emb, path, n_clusters=8)

    # a real query service supplies the vector itself — a literal row,
    # so the probe plan below touches ONLY the index relations
    qvec = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("qv")
    ).collect()[0]["qv"]
    qv = spark.createDataFrame([(qvec,)], "qv ARRAY<DOUBLE>")
    got = ivf_sq8_index_probe(spark, path, qv, k=10, nprobe=3)
    want = ivf_sq8_topk(emb, query_vec_id=0, k=10, n_clusters=8, nprobe=3)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert (
        "dynamicpruning" in plan
        or "PartitionFilters: [isnotnull(cluster" in plan
    ), plan[:2000]
    # the probe plan reads the index only — no scan of the float table
    assert "embeddings.parquet" not in plan


def test_ivf_sq8_batched_probe_matches_single(spark, tmp_path):
    """Per-query rows of the batched index probe equal the single-query
    probe — the retrieval-service kernel is the same arithmetic."""
    from model_audit_spark.operators.similarity import (
        as_double_array,
        ivf_sq8_index_probe,
        ivf_sq8_index_probe_many,
        ivf_sq8_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "idx")
    ivf_sq8_index_write(emb, path, n_clusters=8)

    qids = [0, 3, 7]
    vecs = {
        r["vec_id"]: r["qv"]
        for r in emb.filter(F.col("vec_id").isin(qids))
        .select("vec_id", as_double_array("embedding").alias("qv"))
        .collect()
    }
    queries = spark.createDataFrame(
        [(qid, vecs[qid]) for qid in qids],
        "query_id LONG, qv ARRAY<DOUBLE>",
    )
    many = ivf_sq8_index_probe_many(
        spark, path, queries, k=5, nprobe=3
    ).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["approx_dot"])
        )
    assert set(by_q) == set(qids)
    for qid in qids:
        qv = spark.createDataFrame([(vecs[qid],)], "qv ARRAY<DOUBLE>")
        single = [
            (r["vec_id"], r["approx_dot"])
            for r in ivf_sq8_index_probe(
                spark, path, qv, k=5, nprobe=3
            ).collect()
        ]
        assert by_q[qid] == single, qid


def test_ivf_append_report_counts_and_share(spark):
    """Two obvious cells (±x axis): base trains the quantizer, the
    appended batch lands in the right cells without retraining;
    counts and ppm shares are hand-computed."""
    from model_audit_spark.operators.similarity import ivf_append_report

    base = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.9, 0.1]),
         (3, [-0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    new = spark.createDataFrame(
        [(10, [0.8, 0.0]), (11, [0.7, 0.1]), (12, [-0.8, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.cluster: r for r in
           ivf_append_report(base, new, n_clusters=2).collect()}
    # centroids = vectors 0 (+x) and 1 (−x): cell 0 holds {0,2}+{10,11},
    # cell 1 holds {1,3}+{12}
    assert (out[0].old_size, out[0].added, out[0].new_size) == (2, 2, 4)
    assert (out[1].old_size, out[1].added, out[1].new_size) == (2, 1, 3)
    assert out[0].share_ppm == 4 * 1000000 // 7
    assert out[1].share_ppm == 3 * 1000000 // 7


def test_ann_recall_report_sample_mode(spark):
    """sample_n keeps the query vector, bounds the corpus to a
    deterministic hash-ordered sample, and preserves schema/semantics;
    sample >= corpus degrades to the full report (the gate config)."""
    from model_audit_spark.operators.similarity import ann_recall_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = ann_recall_report(emb, query_vec_id=0, k=10)
    sampled = ann_recall_report(emb, query_vec_id=0, k=10, sample_n=40)
    assert sampled.schema == full.schema
    rows = {r["method"]: r for r in sampled.collect()}
    assert set(rows) == {
        "ivf", "ivf_sq8", "lsh", "lsh_multiprobe",
        "pq", "pq_rerank", "sq8", "sq8_rerank",
    }
    for r in rows.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_hits"] <= r["k_returned"]
    n = emb.count()
    assert sorted(map(tuple,
                  ann_recall_report(emb, query_vec_id=0, k=10,
                                    sample_n=n).collect())) == \
        sorted(map(tuple, full.collect()))
