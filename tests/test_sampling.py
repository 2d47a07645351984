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


def test_budget_select_greedy_prefix(spark):
    from model_audit_spark.operators.sampling import budget_select

    docs = spark.createDataFrame(
        [
            # quality differs via length adequacy: longer prose scores
            # higher; tiny budget keeps only the best-first prefix
            (1, "word " * 120 + "sentence ends here. " * 10),
            (2, "short text."),
            (3, "word " * 120 + "another longer document ends. " * 10),
        ],
        "doc_id int, text string",
    )
    out = budget_select(docs, budget_tokens=1, id_col="doc_id")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 3
    # exactly one doc crosses the 1-token budget: the global best
    assert sum(r.selected for r in rows.values()) == 1
    # cumulative sums are a permutation-consistent global prefix
    cums = sorted(r.cum_tokens for r in rows.values())
    total = sum(r.n_tokens for r in rows.values())
    assert cums[-1] == total

    big = budget_select(docs, budget_tokens=10**9, id_col="doc_id")
    assert all(r.selected for r in big.collect())


def test_budget_select_matches_single_partition_window(spark):
    """Sharded prefix offsets == the naive global window on real data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from model_audit_spark.operators.sampling import budget_select
    from model_audit_spark.operators.text_analysis import (
        doc_stats,
        token_count_bpe,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r.doc_id: (r.cum_tokens, r.selected)
        for r in budget_select(docs, budget_tokens=1500).collect()
    }
    stats = doc_stats(docs, "text", "doc_id").select(
        "doc_id", "quality_score"
    )
    naive = (
        docs.select(
            "doc_id", token_count_bpe("text").cast("bigint").alias("n")
        )
        .join(stats, "doc_id")
        .select(
            "doc_id",
            F.sum("n")
            .over(
                Window.orderBy(
                    F.col("quality_score").desc(), F.col("doc_id").asc()
                ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cum"),
            "n",
        )
    )
    for r in naive.collect():
        assert got[r.doc_id][0] == r.cum
        assert got[r.doc_id][1] == ((r.cum - r.n) < 1500)


def test_contrastive_triplets_properties(spark):
    import random

    from model_audit_spark.operators.sampling import contrastive_triplets
    from model_audit_spark.operators.similarity import knn_graph

    rng = random.Random(3)
    dim = 16
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(40)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    pos = knn_graph(emb, k=3, n_bands=4, planes_per_band=4, dim=dim)
    trip = contrastive_triplets(emb, pos, n_neg=2, n_buckets=4)
    rows = trip.collect()
    assert rows
    known = {(r.src, r.dst) for r in pos.collect()}
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor, []).append(r)
        # a negative is never the anchor itself, its positive, or any
        # known neighbor in either direction
        assert r.negative != r.anchor and r.negative != r.positive
        assert (r.anchor, r.negative) not in known
        assert (r.negative, r.anchor) not in known
    for a, rs in by_anchor.items():
        assert sorted(r.neg_rank for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
    # deterministic: a second run draws the same triplets
    again = {
        (r.anchor, r.positive, r.negative, r.neg_rank)
        for r in contrastive_triplets(
            emb, pos, n_neg=2, n_buckets=4
        ).collect()
    }
    assert again == {
        (r.anchor, r.positive, r.negative, r.neg_rank) for r in rows
    }


def test_assign_splits_fractions_and_determinism(spark):
    from model_audit_spark.operators.sampling import assign_splits

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = assign_splits(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed("count", "n")
              .collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    # deterministic: same assignment on re-evaluation
    again = {r["doc_id"]: r["split"] for r in
             assign_splits(df, {"train": 0.8, "val": 0.1, "test": 0.1})
             .collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_assign_splits_cluster_keyed_is_leakage_safe(spark):
    from pyspark.sql import Row
    from model_audit_spark.operators.sampling import assign_splits

    rows = [Row(doc_id=i, cluster_id=i % 7) for i in range(70)]
    out = assign_splits(
        spark.createDataFrame(rows),
        {"train": 0.5, "val": 0.25, "test": 0.25},
        key_col="cluster_id",
    )
    per_cluster = (
        out.groupBy("cluster_id")
        .agg({"split": "approx_count_distinct"})
        .collect()
    )
    # every near-dup cluster maps to exactly ONE split
    assert all(r[1] == 1 for r in per_cluster)


def test_assign_splits_single_split_and_empty_fracs(spark):
    import pytest as _pytest
    from model_audit_spark.operators.sampling import assign_splits

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    only = assign_splits(df, {"all": 1.0})
    assert {r["split"] for r in only.collect()} == {"all"}
    with _pytest.raises(ValueError):
        assign_splits(df, {})


def test_quota_sample_exact_counts_and_two_stage_equality(spark):
    """Quota sample keeps exactly min(quota, |stratum|) rows, ranks are
    dense 1..n, and a SAME-DRAW threshold pre-filter that keeps >= quota
    rows selects EXACTLY the same set (the documented two-stage skew
    hedge — a different-hash pre-filter would NOT have this property)."""
    from pyspark.sql import functions as F

    from model_audit_spark.operators.sampling import quota_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = quota_sample(
        df, {"a": 10, "b": 100}, stratum_col="source",
        id_col="doc_id", salt="s9",
    )
    got = out.groupBy("source").agg(
        F.count("*").alias("n"), F.max("smp_rank").alias("mx")
    ).collect()
    sizes = {r["source"]: (r["n"], r["mx"]) for r in got}
    assert sizes["a"] == (10, 10)
    assert sizes["b"] == (30, 30)  # only 30 'b' rows exist

    # two-stage: a SAME-DRAW prefix threshold keeps the final selection
    draw = F.md5(
        F.concat_ws("|", F.lit("s9"), F.col("doc_id").cast("string"))
    )
    pre = df.filter(draw < "e0")  # ~7/8 of draws survive
    assert pre.filter(F.col("source") == "a").count() >= 10
    two = quota_sample(
        pre, {"a": 10, "b": 100}, stratum_col="source",
        id_col="doc_id", salt="s9",
    )
    one_ids = {r["doc_id"] for r in out.filter(F.col("source") == "a").collect()}
    two_ids = {r["doc_id"] for r in two.filter(F.col("source") == "a").collect()}
    assert one_ids == two_ids


def test_weighted_sample_es_matches_bruteforce_and_skews_to_weight(spark):
    """The Spark selection equals the brute-force ES computation row for
    row, zero-weight rows never appear, and a 100x-weight stratum wins
    far more slots than its row share."""
    import hashlib
    import math

    from model_audit_spark.operators.sampling import weighted_sample_es

    rows = [(i, 1000 if i < 20 else 10) for i in range(200)] + [(500, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["es_key"])
        for r in weighted_sample_es(
            df, weight_col="w", k=30, id_col="doc_id", salt="t1"
        ).collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(f"t1|{i}".encode()).hexdigest()[:8], 16)
        lnq = round(math.log(2.0 ** 32 / (h + 1)) * 1e9)
        return lnq / float(w)

    brute = sorted(
        ((i, key(i, w)) for i, w in rows if w > 0),
        key=lambda t: (t[1], t[0]),
    )[:30]
    assert [i for i, _ in got] == [i for i, _ in brute]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, brute))
    assert 500 not in {i for i, _ in got}
    heavy = sum(1 for i, _ in got if i < 20)
    assert heavy >= 10  # 20 rows at 100x weight dominate 180 light rows


def test_weighted_sample_es_fractional_weights(spark):
    """Fractional weights (quality scores) are first-class: selection
    matches the brute-force computation and high-quality rows dominate
    — the truncate-to-long regression would zero them all out."""
    import hashlib
    import math

    from model_audit_spark.operators.sampling import weighted_sample_es

    rows = [(i, 0.9 if i < 10 else 0.01) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    got = [
        r["doc_id"]
        for r in weighted_sample_es(
            df, weight_col="q", k=8, id_col="doc_id", salt="f1"
        ).collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(f"f1|{i}".encode()).hexdigest()[:8], 16)
        return round(math.log(2.0 ** 32 / (h + 1)) * 1e9) / w

    brute = sorted(
        ((i, key(i, w)) for i, w in rows), key=lambda t: (t[1], t[0])
    )[:8]
    assert got == [i for i, _ in brute]
    assert sum(1 for i in got if i < 10) >= 5


def test_epoch_shuffle_is_a_partition_per_epoch(spark):
    """Every doc appears exactly once per epoch; positions within an
    (epoch, shard) are contiguous 1..n; epochs permute differently;
    the order is stable under repartitioning (no RNG state)."""
    from model_audit_spark.operators.sampling import epoch_shuffle

    docs = spark.range(0, 97).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(docs, "doc_id", n_epochs=2, n_shards=4)
    rows = out.collect()
    assert len(rows) == 2 * 97
    for e in (0, 1):
        ids = sorted(r.doc_id for r in rows if r.epoch == e)
        assert ids == list(range(97))
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r.epoch, r.shard), []).append(r.position)
    for pos in by_shard.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))
    # epochs are independent permutations: shard assignment must differ
    # for at least one doc between epoch 0 and epoch 1
    sh = {(r.epoch, r.doc_id): r.shard for r in rows}
    assert any(sh[(0, d)] != sh[(1, d)] for d in range(97))
    # repartition-stable
    again = epoch_shuffle(
        docs.repartition(7), "doc_id", n_epochs=2, n_shards=4
    ).collect()
    key = lambda r: (r.epoch, r.shard, r.position, r.doc_id)
    assert sorted(map(key, again)) == sorted(map(key, rows))
