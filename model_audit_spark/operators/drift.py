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


def ks_two_sample(
    df: DataFrame,
    side_a,
    side_b,
    value_col: str = "value",
    quant: int = 10000,
) -> DataFrame:
    """One-row (n_a, n_b, ks_stat, ks_at_value): the two-sample
    Kolmogorov-Smirnov statistic — max ECDF gap between two cohorts of
    `value_col` — the distribution-shape drift test that complements
    PSI (PSI sees mass moved between fixed buckets; KS sees WHERE the
    curves diverge, with no binning choice beyond the quantization).

    `side_a` / `side_b` are boolean Columns selecting the cohorts
    (e.g. event_type filters, or a ts split for before/after).

    Determinism + scale: values quantize to q = floor(v·quant + 0.5)
    BIGINT (the portable half-up — an engine round() on an arbitrary
    double is not, DETERMINISM.md mode 2); counts aggregate per
    DISTINCT q (map-side combined — the one corpus-sized shuffle);
    the ECDF gap is |cum_a/n_a − cum_b/n_b| from exact-integer
    cumulative sums, emitted raw (identical doubles both engines). The
    global-order cumulative window runs over DISTINCT quantized values
    — bounded by value-range · quant, the same fixed-resolution
    contract as the PSI bucketing; at 100 TB lower `quant` (or
    pre-bucket) rather than window over billions of distinct doubles.
    The argmax tie-breaks to the LOWEST quantized value."""
    from pyspark.sql import Window

    q = F.floor(
        F.col(value_col).cast("double") * quant + F.lit(0.5)
    ).cast("long")
    tagged = df.select(
        q.alias("_q"),
        F.when(side_a, 1).otherwise(0).alias("_a"),
        F.when(side_b, 1).otherwise(0).alias("_b"),
    ).filter((F.col("_a") == 1) | (F.col("_b") == 1))
    counts = tagged.groupBy("_q").agg(
        F.sum("_a").cast("long").alias("ca"),
        F.sum("_b").cast("long").alias("cb"),
    )
    w = Window.orderBy("_q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = counts.select(
        "_q",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    totals = counts.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    gap = F.abs(
        F.col("cuma") / F.greatest(F.col("n_a"), F.lit(1))
        - F.col("cumb") / F.greatest(F.col("n_b"), F.lit(1))
    )
    return (
        cums.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            gap.alias("_gap"),
            F.col("_q"),
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.max("_gap").alias("ks_stat"),
            F.min_by(
                F.col("_q"), F.struct(-F.col("_gap"), F.col("_q"))
            ).alias("_qmax"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_stat",
            (F.col("_qmax") / F.lit(float(quant))).alias("ks_at_value"),
        )
    )


def hourly_anomaly_zscore(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    trailing: int = 24,
    min_history: int = 12,
    z_threshold: float = 2.0,
) -> DataFrame:
    """(key, hour, n_events, mean_trailing, z): hours whose event count
    deviates ≥ `z_threshold` standard deviations from the trailing
    `trailing` OBSERVED hours of the same key — the volume-anomaly
    monitor over the event stream (traffic spikes, outages, bot bursts).

    Exact-integer dynamics: hourly counts, their trailing sums and
    sums-of-squares are BIGINTs; mean and population variance are
    exact-integer divisions; z = (n − mean)/sqrt(var) on identical
    doubles in every engine (sqrt of an identical double is identical —
    correctly rounded), emitted raw. Hours with fewer than
    `min_history` trailing observations, or zero variance, are not
    judged. Window is ROWS over observed hours (a silent-gap hour is
    absent from the relation — it contributes no row; densify upstream
    if calendar-hour semantics are needed)."""
    from pyspark.sql import Window

    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .groupBy("key", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("key").orderBy("hour").rowsBetween(
        -trailing, -1
    )
    stats = hourly.select(
        "key",
        "hour",
        "n_events",
        F.sum("n_events").over(w).cast("long").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .over(w)
        .cast("long")
        .alias("_ss"),
        F.count("n_events").over(w).cast("long").alias("_c"),
    ).filter(F.col("_c") >= min_history)
    mean = F.col("_s") / F.col("_c")
    var = F.col("_ss") / F.col("_c") - mean * mean
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        stats.select(
            "key",
            "hour",
            "n_events",
            mean.alias("mean_trailing"),
            F.when(var > 0, z).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= z_threshold)
        .orderBy("key", "hour")
    )
