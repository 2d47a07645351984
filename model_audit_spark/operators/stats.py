"""Distribution statistics over corpus columns (scale extension; the
reference reports only means/counts — percentiles are standard corpus-QA
tooling for training-data pipelines: length cutoffs, token budgets,
truncation thresholds).

Two forms:
- exact=True: Spark's `percentile` — exact linear-interpolated quantiles
  (identical definition to ANSI percentile_cont / DuckDB quantile_cont, so
  it is oracle-checkable bit-for-bit). It buffers each group's values in the
  aggregation state, so it is for |group| that fits an executor — fine for
  per-source/per-lang groups up to ~10^8 rows of one numeric column.
- exact=False: `percentile_approx` (t-digest sketch, bounded memory,
  mergeable map-side partials) — the 100 TB path. Same output schema; the
  sketch error is the documented tradeoff, so the oracle gate runs the exact
  form and the approx form is property-tested against it.

All requested probabilities for a column are computed in ONE aggregate
buffer (array form), not one buffer per quantile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_percentiles(
    df: DataFrame,
    value_cols: dict[str, "F.Column | str"],
    probs: list[float],
    group_cols: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles: one output column `{name}_p{prob%}` per
    (value column, probability).

    value_cols maps output-name prefix -> source column/expression; the
    expression is projected first so the aggregate input is a plain
    attribute (keeps the agg buffer off the expression tree)."""
    group_cols = group_cols or []
    proj = [F.col(g) for g in group_cols] + [
        (F.col(c) if isinstance(c, str) else c).cast("double").alias(f"_v_{n}")
        for n, c in value_cols.items()
    ]
    base = df.select(*proj)
    arr = ",".join(f"{p}D" for p in probs)
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {accuracy}"
    aggs = [
        F.expr(f"{fn}(_v_{n}, array({arr}){extra})").alias(f"_q_{n}")
        for n in value_cols
    ]
    agged = base.groupBy(*group_cols).agg(*aggs)
    out = [F.col(g) for g in group_cols]
    for n in value_cols:
        for i, p in enumerate(probs):
            label = f"{n}_p{str(p * 100).rstrip('0').rstrip('.').replace('.', '_')}"
            out.append(
                F.round(F.element_at(F.col(f"_q_{n}"), i + 1), 6).alias(label)
            )
    return agged.select(*out)


def cardinality_profile(
    df: DataFrame,
    distinct_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
    exact: bool = False,
) -> DataFrame:
    """Per-group distinct counts: (group..., n_rows, n_distinct).

    exact=False (the 100 TB path) uses the Apache DataSketches HLL
    aggregate built into Spark (`hll_sketch_agg`): fixed 2^lg_k-register
    state per group, map-side partial merge, ~1.6%/sqrt(2^lg_k) relative
    standard error — one pass, no distinct shuffle of the values
    themselves. exact=True is `count_distinct`, whose aggregation state
    is the distinct value set — the small-SF verification twin (the
    property test pins the approx estimate within a 5-sigma band of it,
    and partition-merge == one-shot determinism).
    """
    keys = group_cols or []
    agg = (
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.count_distinct(F.col(distinct_col))
            if exact
            else F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k))
            )
        ).cast("long").alias("n_distinct"),
    )
    if keys:
        return df.groupBy(*keys).agg(*agg)
    return df.agg(*agg)


def merge_cardinality_sketches(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union per-shard HLL sketches into (group..., n_distinct) — the
    re-aggregation leg: daily shards keep their binary sketch column and
    any coarser rollup is a cheap `hll_union_agg`, never a re-scan of
    the raw data (the same cascade shape as rollup.py, applied to
    distinct counts)."""
    keys = group_cols or []
    est = (
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias("n_distinct")
    )
    if keys:
        return sketches.groupBy(*keys).agg(est)
    return sketches.agg(est)


def quantile_sketch_profile(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """(group..., sketch): per-group KLL quantile sketch over a DOUBLE
    column — the mergeable form of a percentile profile. Fixed ~k·log(n)
    state per group, map-side mergeable; keep the binary column in shard
    tables and roll up with merge_quantile_sketches instead of
    re-scanning raw data (the HLL-cascade shape, applied to quantiles).
    """
    keys = group_cols or []
    agg = F.kll_sketch_agg_double(
        F.col(value_col).cast("double"), F.lit(k)
    ).alias("sketch")
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def quantiles_from_sketches(
    sketches: DataFrame,
    probs: list[float],
    sketch_col: str = "sketch",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge per-shard KLL sketches and emit `q{prob%}` columns — the
    rollup leg of quantile_sketch_profile. Estimates carry the KLL rank
    error (~1.65/k for k=200 ≈ 0.8%); the exact twin for verification is
    column_percentiles(exact=True)."""
    keys = group_cols or []
    # kll_sketch_merge_double is a BINARY scalar (no aggregate form):
    # collect the per-shard sketches (bounded: one per shard, not per
    # row) and fold them pairwise
    lst = F.collect_list(F.col(sketch_col)).alias("_l")
    base = sketches.groupBy(*keys).agg(lst) if keys else sketches.agg(lst)
    merged = F.aggregate(
        F.slice(F.col("_l"), 2, F.greatest(F.size("_l") - 1, F.lit(0))),
        F.element_at(F.col("_l"), 1),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )
    with_m = base.select(*keys, merged.alias("_m"))
    # label from the full prob, not int(p*100): 0.999 and 0.99 must not
    # both become q99, and 0.125 is q12_5 rather than a lying q12
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(float(p)))
        .alias("q" + f"{p * 100:g}".replace(".", "_"))
        for p in probs
    ]
    return with_m.select(*keys, *qcols)


def robust_outlier_profile(
    df: DataFrame,
    value_col: str,
    by: str,
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Median/MAD robust-outlier profile of an integer column per group
    — the standard "drop absurdly short/long documents" QA gate, with
    EXACT medians computed from the value HISTOGRAM, not the rows.

    Scale shape: ONE corpus scan builds the (group, value) histogram
    (map-side combine; |histogram| is bounded by the value domain, not
    the row count — document lengths, token counts and similar QA
    columns have at most ~1e6 distinct values no matter how many rows).
    Everything after — both medians, the outlier tally — runs on the
    compact histogram with window cumulative sums, so the 100 TB cost
    is the one aggregate. Spark's `percentile` would instead buffer
    every group's raw values in executor memory.

    Integer-exact arithmetic end to end (DETERMINISM.md rule 5):
    med2 = lower+upper median values (2× the interpolated median),
    dev2 = |2v - med2|, mad4 = sum of dev2's two medians (4× MAD).
    A row is an outlier iff dev > (k_num/k_den)·MAD, evaluated as
    2·dev2·k_den > k_num·mad4 — no floats until the final projection,
    which emits median = med2/2 and mad = mad4/4 as exact doubles.
    MAD = 0 (over half the group shares one value) keeps the standard
    caveat: any deviation counts as an outlier.

    Returns per group: n rows, median, mad, n_low / n_high outliers.
    """
    v = F.col(value_col).cast("bigint")
    hist = df.groupBy(F.col(by).alias(by), v.alias("v")).agg(
        F.count("*").alias("cnt")
    )

    def _med2(h: DataFrame, key: str) -> DataFrame:
        wo = (
            Window.partitionBy(key)
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy(key)
        cum = F.sum("cnt").over(wo)
        n = F.sum("cnt").over(wall)
        ranked = h.select(
            key,
            "v",
            "cnt",
            cum.alias("cum"),
            n.alias("n"),
        ).select(
            key,
            "v",
            "cnt",
            "cum",
            "n",
            F.expr("(n - 1) DIV 2").alias("lo"),
            F.expr("n DIV 2").alias("hi"),
        )
        return ranked.groupBy(key).agg(
            (
                F.min(F.when(F.col("cum") >= F.col("lo") + 1, F.col("v")))
                + F.min(F.when(F.col("cum") >= F.col("hi") + 1, F.col("v")))
            ).alias("med2"),
            F.max("n").alias("n_rows"),
        )

    med = _med2(hist, by)
    dev_hist = (
        hist.join(F.broadcast(med.select(by, "med2")), by)
        .select(
            by,
            F.abs(2 * F.col("v") - F.col("med2")).alias("v"),
            "cnt",
        )
        .groupBy(by, "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = _med2(dev_hist, by).select(
        by, F.col("med2").alias("mad4")
    )
    stats = med.join(F.broadcast(mad), by)
    flagged = hist.join(F.broadcast(stats), by).select(
        by,
        "cnt",
        (2 * F.col("v") < F.col("med2")).alias("is_low"),
        (
            2 * F.abs(2 * F.col("v") - F.col("med2")) * k_den
            > k_num * F.col("mad4")
        ).alias("is_out"),
    )
    tallies = flagged.groupBy(by).agg(
        F.sum(
            F.when(F.col("is_out") & F.col("is_low"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("n_low_outliers"),
        F.sum(
            F.when(
                F.col("is_out") & ~F.col("is_low"), F.col("cnt")
            ).otherwise(F.lit(0))
        ).alias("n_high_outliers"),
    )
    return stats.join(tallies, by).select(
        by,
        F.col("n_rows"),
        (F.col("med2") / 2.0).alias("median"),
        (F.col("mad4") / 4.0).alias("mad"),
        "n_low_outliers",
        "n_high_outliers",
    )
