"""Corpus drift via Population Stability Index (scale extension, no
reference counterpart — the standard ops metric for "did this snapshot /
source shift?" over feature distributions).

PSI(feature) = Σ_buckets (p_A − p_B) · ln(p_A / p_B), with add-1
smoothing on bucket counts so empty buckets are defined. Rule of thumb:
< 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action.

One corpus scan: each row emits an array of (feature, bucket) structs
that explodes into the count aggregate — k features cost one pass, not
k. Determinism (DETERMINISM.md rule 3): the smoothed ratio
((cA+1)(TB+n)) / ((cB+1)(TA+n)) has exact-integer operands (identical
IEEE division in every engine), ln is quantized to 9dp per bucket, each
contribution is rounded at 15dp and cast DECIMAL(38,15), and the
per-feature sum is exact decimal arithmetic. The emitted psi is that
exact decimal cast DOUBLE at the final projection (rule 4: identical
decimals → identical doubles; comparators that canonicalize Decimal vs
float asymmetrically — the round-3 driver hash failures — then agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["psi_drift", "bucket_counts", "psi_from_counts"]


def _feature_bucket_structs(
    feature_buckets: dict[str, Column],
) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(name).alias("feature"),
                F.coalesce(b.cast("long"), F.lit(-1)).alias("bucket"),
            )
            for name, b in feature_buckets.items()
        ]
    )


def bucket_counts(
    df: DataFrame, feature_buckets: dict[str, Column]
) -> DataFrame:
    """(feature, bucket, n): one-pass bucket histogram for k features —
    the materializable half of PSI. Compute it per snapshot / per split
    (or keep it RUNNING under Structured Streaming via
    streaming.streaming_bucket_counts) and compare any two relations
    with psi_from_counts without rescanning either corpus."""
    return (
        df.select(F.explode(_feature_bucket_structs(feature_buckets)).alias("fb"))
        .select("fb.feature", "fb.bucket")
        .groupBy("feature", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_from_counts(
    counts_a: DataFrame, counts_b: DataFrame
) -> DataFrame:
    """PSI from two pre-aggregated (feature, bucket, n) relations —
    bit-identical arithmetic to psi_drift (same smoothing, the same
    9dp-quantized ln and DECIMAL(38,15) exact summation), so
    psi_from_counts(bucket_counts(A), bucket_counts(B)) hash-matches
    psi_drift over the union. The join is over bucket histograms
    (report-sized), never the corpora."""
    a = counts_a.select(
        "feature", "bucket", F.col("n").alias("ca")
    )
    b = counts_b.select(
        "feature", "bucket", F.col("n").alias("cb")
    )
    counts = (
        a.join(b, ["feature", "bucket"], "full_outer")
        .select(
            "feature",
            "bucket",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    totals = counts.groupBy("feature").agg(
        F.sum("ca").alias("ta"),
        F.sum("cb").alias("tb"),
        F.count(F.lit(1)).alias("nb"),
    )
    j = counts.join(totals, "feature")
    pa = (F.col("ca") + 1) / (F.col("ta") + F.col("nb"))
    pb = (F.col("cb") + 1) / (F.col("tb") + F.col("nb"))
    lnq = F.round(
        F.ln(
            ((F.col("ca") + 1) * (F.col("tb") + F.col("nb")))
            / ((F.col("cb") + 1) * (F.col("ta") + F.col("nb")))
        ),
        9,
    )
    contrib = F.round((pa - pb) * lnq, 15).cast("decimal(38,15)")
    return (
        j.select(
            "feature", F.col("nb").alias("n_buckets"), contrib.alias("_c")
        )
        .groupBy("feature", "n_buckets")
        .agg(F.sum("_c").cast("double").alias("psi"))
    )


def psi_drift(
    df: DataFrame,
    is_a: Column,
    feature_buckets: dict[str, Column],
) -> DataFrame:
    """(feature, n_buckets, psi): distribution shift of split A (rows
    where `is_a`) vs split B (the rest), per bucketed feature.

    `feature_buckets` maps feature name → integer bucket expression
    (fixed, data-independent bucketing — quantile bucketing would make
    the metric depend on the union distribution). NULL buckets count as
    their own bucket via coalesce to -1."""
    structs = _feature_bucket_structs(feature_buckets)
    base = df.select(
        is_a.alias("_a"), F.explode(structs).alias("fb")
    ).select("_a", "fb.feature", "fb.bucket")
    counts = base.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("cb"),
    )
    totals = counts.groupBy("feature").agg(
        F.sum("ca").alias("ta"),
        F.sum("cb").alias("tb"),
        F.count(F.lit(1)).alias("nb"),
    )
    j = counts.join(totals, "feature")
    pa = (F.col("ca") + 1) / (F.col("ta") + F.col("nb"))
    pb = (F.col("cb") + 1) / (F.col("tb") + F.col("nb"))
    lnq = F.round(
        F.ln(
            ((F.col("ca") + 1) * (F.col("tb") + F.col("nb")))
            / ((F.col("cb") + 1) * (F.col("ta") + F.col("nb")))
        ),
        9,
    )
    contrib = F.round((pa - pb) * lnq, 15).cast("decimal(38,15)")
    return (
        j.select("feature", F.col("nb").alias("n_buckets"), contrib.alias("_c"))
        .groupBy("feature", "n_buckets")
        .agg(F.sum("_c").cast("double").alias("psi"))
    )
