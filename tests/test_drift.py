"""PSI corpus drift: zero for identical splits, large for disjoint ones,
invariant to partitioning."""

from __future__ import annotations

import pyspark.sql.functions as F

from model_audit_spark.operators.drift import psi_drift


def _psi(rows):
    return {r.feature: float(r.psi) for r in rows}


def test_psi_near_zero_for_identical_distributions(spark):
    df = spark.range(2000).select(
        (F.col("id") % 2 == 0).alias("a"),
        # bucket independent of the split parity
        ((F.col("id") / 2).cast("long") % 10).alias("bucket_src"),
    )
    out = _psi(
        psi_drift(df, F.col("a"), {"f": F.col("bucket_src")}).collect()
    )
    assert abs(out["f"]) < 1e-6  # identical per-split distributions


def test_psi_large_for_disjoint_distributions(spark):
    df = spark.range(2000).select(
        (F.col("id") < 1000).alias("a"),
        F.when(F.col("id") < 1000, F.col("id") % 5)
        .otherwise(5 + F.col("id") % 5)
        .alias("b"),
    )
    out = _psi(psi_drift(df, F.col("a"), {"f": F.col("b")}).collect())
    assert out["f"] > 1.0  # completely disjoint buckets


def test_psi_partitioning_independent_and_null_bucket(spark):
    base = spark.range(999).select(
        (F.col("id") % 3 == 0).alias("a"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") % 4)
        .alias("b"),
    )
    r1 = _psi(psi_drift(base.coalesce(1), F.col("a"), {"f": F.col("b")}).collect())
    r2 = _psi(
        psi_drift(base.repartition(16), F.col("a"), {"f": F.col("b")}).collect()
    )
    assert r1 == r2  # decimal sum → bit-stable
    # NULL bucket participates (coalesced to -1), so both splits' NULL
    # rows are compared rather than dropped
    rows = psi_drift(base, F.col("a"), {"f": F.col("b")}).collect()
    assert rows[0].n_buckets == 5


def test_psi_from_counts_matches_psi_drift(spark):
    from pyspark.sql import functions as F
    from model_audit_spark.operators.drift import (
        bucket_counts,
        psi_drift,
        psi_from_counts,
    )

    df = spark.range(500).select(
        (F.col("id") % 2 == 0).alias("_a"),
        (F.col("id") % 7).alias("v"),
        (F.col("id") % 3).alias("w"),
    )
    buckets = {"v": F.col("v"), "w": F.col("w")}
    whole = {(r["feature"]): (r["n_buckets"], r["psi"])
             for r in psi_drift(df, F.col("_a"), buckets).collect()}
    split = psi_from_counts(
        bucket_counts(df.filter("_a"), buckets),
        bucket_counts(df.filter("NOT _a"), buckets),
    )
    got = {(r["feature"]): (r["n_buckets"], r["psi"])
           for r in split.collect()}
    assert got == whole  # bit-identical decimal PSI


def test_bucket_counts_disjoint_buckets_survive_outer_join(spark):
    from pyspark.sql import functions as F
    from model_audit_spark.operators.drift import (
        bucket_counts,
        psi_from_counts,
    )

    a = spark.range(10).select((F.col("id") % 2).alias("v"))
    b = spark.range(10).select((F.col("id") % 2 + 5).alias("v"))
    out = psi_from_counts(
        bucket_counts(a, {"v": F.col("v")}),
        bucket_counts(b, {"v": F.col("v")}),
    ).collect()
    assert out[0]["n_buckets"] == 4  # union of disjoint bucket sets
    assert float(out[0]["psi"]) > 0.25  # total shift flagged


def test_ks_two_sample_identical_and_shifted(spark):
    """KS = 0 for identical cohorts; a constant shift produces a large
    statistic at the crossing point; statistic bounded in [0, 1]."""
    import pyspark.sql.functions as F

    from model_audit_spark.operators.drift import ks_two_sample

    rows = [("a", float(i % 50)) for i in range(500)] + [
        ("b", float(i % 50)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    same = ks_two_sample(
        df, F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert same["n_a"] == same["n_b"] == 500
    assert same["ks_stat"] == 0.0

    shifted = df.withColumn(
        "value",
        F.when(F.col("g") == "b", F.col("value") + 25.0).otherwise(
            F.col("value")
        ),
    )
    r = ks_two_sample(
        shifted, F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    # values 0..49 vs 25..74: ECDF gap peaks at 0.5 just below 25
    assert r["ks_stat"] == 0.5
    assert 24.0 <= r["ks_at_value"] <= 25.0
    assert 0.0 <= r["ks_stat"] <= 1.0


def test_hourly_anomaly_zscore_flags_injected_spike(spark):
    """A 10x traffic spike after a flat day must be flagged with a
    large positive z; the flat hours must not be."""
    import datetime

    from model_audit_spark.operators.drift import hourly_anomaly_zscore

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):
        # jittered baseline (zero-variance history is not judged — the
        # z denominator would be 0; documented operator behavior)
        n = 100 + (h % 5) if h != 27 else 1000  # spike at hour 27
        for _ in range(n):
            rows.append(
                ("click", base + datetime.timedelta(hours=h), eid)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    flagged = hourly_anomaly_zscore(df, z_threshold=2.0).collect()
    hours = [(r["hour"].hour + (r["hour"].day - 1) * 24, r["z"])
             for r in flagged]
    spike = [z for h, z in hours if h == 27]
    assert len(spike) == 1 and spike[0] > 10
    # the constant-rate warmup hours are never flagged; the hour right
    # AFTER the spike may flag low (the spike inflates its trailing
    # mean), which is correct monitor behavior
    assert all(h >= 27 for h, _ in hours)
