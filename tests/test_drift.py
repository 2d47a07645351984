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
