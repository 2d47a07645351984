"""Skew stress pins (r5 verdict task 6): on a Zipf-heavy boilerplate
corpus — where the naive shingle inverted index generates near-all-pairs
candidates — the documented 100 TB skew hedges must keep candidate /
wedge fan-out bounded. These pin RATIOS against the all-pairs count at a
larger N than the unit tests (400 docs / thousands of graph edges), so a
regression that silently re-introduces a quadratic blowup fails here
even though results stay correct."""

import pyspark.sql.functions as F

from model_audit_spark.operators.cluster import _oriented_edges
from model_audit_spark.operators.dedup import (
    _rare_prefix_postings,
    shingles_df,
)


def _bucket_pairs(postings):
    """Σ C(|bucket|, 2) — distinct-pair upper bound a bucketed candidate
    generator expands (the quantity that blows up under skew)."""
    return (
        postings.filter(F.size("ids") > 1)
        .select(
            (F.size("ids") * (F.size("ids") - 1) / 2).alias("p")
        )
        .agg(F.sum("p").cast("long").alias("n"))
        .first()["n"]
        or 0
    )


def test_prefix_filter_candidates_bounded_under_skew(spark, zipf_docs):
    n = zipf_docs.count()
    all_pairs = n * (n - 1) // 2
    shing = shingles_df(zipf_docs, "text", "doc_id")

    naive = shing.select(
        F.col("doc_id"), F.explode("sh").alias("s")
    ).groupBy("s").agg(F.collect_set("doc_id").alias("ids"))
    naive_pairs = _bucket_pairs(naive)
    # the fixture IS pathological: boilerplate shingles alone put the
    # naive index within a small factor of all-pairs
    assert naive_pairs > 0.5 * all_pairs, (naive_pairs, all_pairs)

    pre = _rare_prefix_postings(shing, "doc_id", 0.5)
    pref = pre.groupBy("s").agg(F.collect_set("doc_id").alias("ids"))
    prefix_pairs = _bucket_pairs(pref)
    # rare-first prefixes exclude the boilerplate: candidate expansion
    # collapses by >10x vs naive and stays a small fraction of all-pairs
    # (measured on this fixture: naive 888k ≈ 11x all-pairs, prefix ~12k)
    assert prefix_pairs * 10 < naive_pairs, (prefix_pairs, naive_pairs)
    assert prefix_pairs < 0.2 * all_pairs, (prefix_pairs, all_pairs)


def test_max_df_caps_posting_blowup(spark, zipf_docs):
    shing = shingles_df(zipf_docs, "text", "doc_id")
    naive = shing.select(
        F.col("doc_id"), F.explode("sh").alias("s")
    ).groupBy("s").agg(F.collect_set("doc_id").alias("ids"))
    max_df = 20
    capped = naive.filter(F.size("ids") <= max_df)
    capped_pairs = _bucket_pairs(capped)
    naive_pairs = _bucket_pairs(naive)
    assert capped_pairs * 10 < naive_pairs
    # hard bound: every surviving bucket expands at most C(max_df, 2)
    worst = (
        capped.filter(F.size("ids") > 1)
        .agg(F.max(F.size("ids")).alias("m"))
        .first()["m"]
    )
    assert worst is None or worst <= max_df


def test_degree_ordered_wedges_bounded_on_skewed_graph(spark):
    """Hub-star at stress scale: 3 hubs with ~500 spokes each plus a
    random sparse remainder. Id-oriented wedges are ~hubdeg² per hub;
    degree-ordered orientation keeps total wedge fan-out near-linear
    (every star edge points INTO its hub), far under the m^1.5 bound."""
    import random

    rng = random.Random(11)
    edges = []
    for hub, base in ((0, 100), (1, 700), (2, 1300)):
        for i in range(base, base + 500):
            edges.append((hub, i))
    for _ in range(600):
        a, b = rng.randrange(100, 1900), rng.randrange(100, 1900)
        if a != b:
            edges.append((a, b))
    e = spark.createDataFrame(edges, "src long, dst long")
    und = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    m = und.count()

    def wedge_count(oriented, u_col):
        return (
            oriented.groupBy(u_col)
            .agg(F.count("*").alias("d"))
            .select((F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .agg(F.sum("w").cast("long").alias("n"))
            .first()["n"]
            or 0
        )

    id_oriented = und.select(F.col("a").alias("u"), F.col("b").alias("v"))
    w_id = wedge_count(id_oriented, "u")
    w_deg = wedge_count(_oriented_edges(und), "u")
    # hubs 0/1/2 have the LOW ids: id-orientation fans every hub out,
    # ~3 * C(500,2) wedges; degree-orientation must collapse that
    assert w_id > 300_000, w_id
    assert w_deg * 50 < w_id, (w_deg, w_id)
    assert w_deg < 2 * m ** 1.5, (w_deg, m)


def test_heavy_hitters_exact_hand_computed(spark):
    """a×5, b×3, c×1, d×1 (10 rows... 5+3+1+1=10): ranks, counts and
    floor ppm shares by hand; tie between c and d breaks on key asc."""
    from model_audit_spark.operators.skew import heavy_hitters_exact

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r.rank, r.key, r.cnt, r.share_ppm)
        for r in heavy_hitters_exact(df, "k", k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [
        (1, "a", 5, 500_000),
        (2, "b", 3, 300_000),
        (3, "c", 1, 100_000),
    ]
