"""Repetition/boilerplate quality filters (operators/quality.py)."""

from model_audit_spark.operators.quality import repetition_stats


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0]


def test_clean_prose_passes(spark):
    r = _stats(
        spark,
        "The quick brown fox jumps over a lazy dog.\n"
        "It then trots away into the quiet green forest.",
    )
    assert r["repetition_pass"]
    assert r["dup_line_frac"] == 0.0
    assert r["n_lines"] == 2


def test_duplicate_lines_fail(spark):
    r = _stats(spark, "buy now\nbuy now\nbuy now\nbuy now\nunique line")
    assert r["dup_line_frac"] == 0.6  # 5 lines, 2 distinct -> 3/5
    assert not r["repetition_pass"]


def test_top_2gram_dominance(spark):
    r = _stats(spark, "win cash " * 30 + "now")
    assert r["top_2gram"] in ("cash win", "win cash")
    assert r["top_2gram_char_frac"] > 0.2
    assert not r["repetition_pass"]


def test_bullet_and_ellipsis_fractions(spark):
    r = _stats(spark, "- item one\n- item two\nread more...\nplain line")
    assert r["bullet_line_frac"] == 0.5
    assert r["ellipsis_line_frac"] == 0.25
    # bullets alone only fail above 0.9
    assert r["repetition_pass"]


def test_blank_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for r in rows.values():
        assert r["n_lines"] == 0
        assert r["top_2gram"] == ""
        assert r["repetition_pass"]


def test_duplicate_paragraphs(spark):
    para = "same paragraph here"
    r = _stats(spark, f"{para}\n\n{para}\n\n{para}")
    assert r["dup_para_frac"] == round(2 / 3, 6)
    # three identical single-line paragraphs are also duplicate lines
    assert not r["repetition_pass"]


def test_cardinality_profile_exact_vs_sketch(spark):
    """HLL estimate within the documented error band of exact, and the
    shard-merge path returns EXACTLY the one-shot estimate (sketch merge
    is deterministic, unlike a sampled estimate)."""
    from pyspark.sql import functions as F

    from model_audit_spark.operators.stats import (
        cardinality_profile,
        merge_cardinality_sketches,
    )

    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 30_011)).alias("v"),
        (F.col("id") % 7).alias("shard"),
    )
    exact = {
        r.g: r.n_distinct
        for r in cardinality_profile(df, "v", ["g"], exact=True).collect()
    }
    approx = {
        r.g: r.n_distinct
        for r in cardinality_profile(df, "v", ["g"], lg_k=12).collect()
    }
    assert set(exact) == set(approx) == {0, 1, 2, 3}
    for g in exact:
        # 2^12 registers -> rse ~1.6%; 5 sigma = 8%
        assert abs(approx[g] - exact[g]) <= 0.08 * exact[g], (g, approx, exact)

    shards = df.groupBy("g", "shard").agg(
        F.hll_sketch_agg("v", F.lit(12)).alias("sketch")
    )
    merged = {
        r.g: r.n_distinct
        for r in merge_cardinality_sketches(shards, "sketch", ["g"]).collect()
    }
    assert merged == approx


def test_quantile_sketch_rollup_near_exact(spark):
    """Shard KLL sketches merged per group estimate quantiles within the
    documented rank error of the exact per-group percentiles."""
    from pyspark.sql import functions as F

    from model_audit_spark.operators.stats import (
        quantile_sketch_profile,
        quantiles_from_sketches,
    )

    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 1000).cast("double").alias("v"),
        (F.col("id") % 7).alias("shard"),
    )
    sk = quantile_sketch_profile(df, "v", ["g", "shard"], k=200)
    est = {
        r.g: (r.q50, r.q90)
        for r in quantiles_from_sketches(
            sk, [0.5, 0.9], group_cols=["g"]
        ).collect()
    }
    exact = {
        r.g: (r.p50, r.p90)
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.9)").alias("p90"),
        )
        .collect()
    }
    # k=200 -> rank error ~0.8%; values span 0..999 so 3% of range is
    # a generous but meaningful band
    for g in exact:
        assert abs(est[g][0] - exact[g][0]) <= 30, (g, est[g], exact[g])
        assert abs(est[g][1] - exact[g][1]) <= 30, (g, est[g], exact[g])


def test_source_data_card_signals(spark):
    from pyspark.sql import Row
    from model_audit_spark.operators.text_analysis import source_data_card

    docs = spark.createDataFrame([
        Row(doc_id=1, text="dup", lang="en", source="a", n_chars=3),
        Row(doc_id=2, text="dup", lang="en", source="a", n_chars=3),
        Row(doc_id=3, text="uniq", lang="zh", source="a", n_chars=4),
        Row(doc_id=4, text=None, lang="en", source="b", n_chars=0),
    ])
    out = {r["source"]: r for r in source_data_card(docs).collect()}
    a = out["a"]
    assert a["n_docs"] == 3 and a["total_chars"] == 10
    assert a["exact_dup_frac"] == round(1 - 2 / 3, 6)
    assert a["en_frac"] == round(2 / 3, 6)
    b = out["b"]
    assert b["n_docs"] == 1 and b["exact_dup_frac"] == 0.0
    assert 0.0 <= b["mean_quality"] <= 1.0


def test_robust_outlier_profile_hand_computed(spark):
    """Median/MAD by hand on three tiny groups: odd count, even count
    (fractional median and MAD), and the MAD=0 degenerate case."""
    from model_audit_spark.operators.stats import robust_outlier_profile

    rows = (
        # g1 odd: [1,2,3,4,100] -> med 3, devs [2,1,0,1,97], MAD 1
        [("g1", v) for v in (1, 2, 3, 4, 100)]
        # g2 even: [1,2,3,10] -> med 2.5, devs [1.5,.5,.5,7.5], MAD 1.0
        + [("g2", v) for v in (1, 2, 3, 10)]
        # g3 MAD=0: [5,5,5,9] -> med 5, MAD 0 -> any deviation flags
        + [("g3", v) for v in (5, 5, 5, 9)]
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {
        r.source: r
        for r in robust_outlier_profile(
            df, "n_chars", "source", k_num=3
        ).collect()
    }
    g1 = out["g1"]
    assert (g1.n_rows, g1.median, g1.mad) == (5, 3.0, 1.0)
    assert (g1.n_low_outliers, g1.n_high_outliers) == (0, 1)  # only 100
    g2 = out["g2"]
    assert (g2.n_rows, g2.median, g2.mad) == (4, 2.5, 1.0)
    assert (g2.n_low_outliers, g2.n_high_outliers) == (0, 1)  # only 10
    g3 = out["g3"]
    assert (g3.median, g3.mad) == (5.0, 0.0)
    assert (g3.n_low_outliers, g3.n_high_outliers) == (0, 1)  # only 9


def test_interarrival_deltas_feed_robust_profile(spark):
    """The inter-arrival composition: lag deltas -> histogram-exact
    median/MAD (MAD=0 caveat: any deviation is an outlier)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from model_audit_spark.operators.stats import robust_outlier_profile

    ev = spark.createDataFrame(
        [
            (1, 1, "A", "2024-01-01 00:00:00"),
            (2, 1, "A", "2024-01-01 00:00:10"),
            (3, 1, "A", "2024-01-01 00:00:20"),
            (4, 1, "A", "2024-01-01 00:02:00"),
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = ev.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    row = robust_outlier_profile(deltas, "delta", by="event_type").collect()[0]
    # deltas 10, 10, 100 -> median 10, MAD 0, the 100 is a high outlier
    assert row.n_rows == 3 and row.median == 10.0 and row.mad == 0.0
    assert row.n_high_outliers == 1 and row.n_low_outliers == 0


def test_histogram_quantiles_type1_exact(spark):
    from model_audit_spark.operators.stats import histogram_quantiles

    # values 1..10 for one group: type-1 lower quantile at rank
    # ceil(p*n): p500 -> rank 5 -> 5; p100 -> rank 1 -> 1;
    # p900 -> rank 9 -> 9; p250 -> rank ceil(2.5)=3 -> 3
    df = spark.createDataFrame(
        [("g", v) for v in range(1, 11)], "grp string, val long"
    )
    row = histogram_quantiles(
        df, "val", by="grp", permilles=(100, 250, 500, 900)
    ).collect()[0]
    assert row.n_rows == 10
    assert (row.q_p100, row.q_p250, row.q_p500, row.q_p900) == (1, 3, 5, 9)
    # heavy ties: 9x value 7 + 1x value 100 -> every quantile <= p900 is 7
    df2 = spark.createDataFrame(
        [("g", 7)] * 9 + [("g", 100)], "grp string, val long"
    )
    r2 = histogram_quantiles(
        df2, "val", by="grp", permilles=(500, 900, 1000)
    ).collect()[0]
    assert (r2.q_p500, r2.q_p900, r2.q_p1000) == (7, 7, 100)


def test_histogram_quantiles_ignores_nulls(spark):
    """NULL values must not inflate n or shift ranks: 1..10 plus four
    NULLs gives the same quantiles (and n_rows) as 1..10 alone."""
    from model_audit_spark.operators.stats import histogram_quantiles

    df = spark.createDataFrame(
        [("g", v) for v in range(1, 11)] + [("g", None)] * 4,
        "grp string, val long",
    )
    row = histogram_quantiles(
        df, "val", by="grp", permilles=(100, 500, 900)
    ).collect()[0]
    assert row.n_rows == 10
    assert (row.q_p100, row.q_p500, row.q_p900) == (1, 5, 9)


def test_robust_outlier_profile_ignores_nulls(spark):
    """Same NULL contract as histogram_quantiles: NULL values must not
    inflate n or shift the median/MAD ranks."""
    from model_audit_spark.operators.stats import robust_outlier_profile

    base = [("g", v) for v in [10, 10, 10, 100]]
    clean = spark.createDataFrame(base, "grp string, val long")
    dirty = spark.createDataFrame(
        base + [("g", None)] * 5, "grp string, val long"
    )
    a = robust_outlier_profile(clean, "val", by="grp").collect()[0]
    b = robust_outlier_profile(dirty, "val", by="grp").collect()[0]
    assert tuple(a) == tuple(b)
    assert b.n_rows == 4 and b.median == 10.0
