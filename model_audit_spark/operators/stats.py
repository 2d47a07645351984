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

    NULL values are excluded before the histogram (same r6 fix as
    histogram_quantiles: NULLs inflated n and shifted both median
    ranks, and the engines order NULLs at opposite window ends) —
    n_rows counts non-NULL values only.

    Returns per group: n rows, median, mad, n_low / n_high outliers.
    """
    v = F.col(value_col).cast("bigint")
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(by).alias(by), v.alias("v"))
        .agg(F.count("*").alias("cnt"))
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


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_str, max_str,
    min_num, max_num): the Deequ-style per-column data-quality profile —
    null rates, cardinalities, and ranges for every requested column, the
    first thing a release gate reads off a new corpus drop.

    Numeric (incl. timestamp-free) extremes land in min_num/max_num as
    doubles; string extremes in min_str/max_str; timestamps are formatted
    to 'yyyy-MM-dd HH:mm:ss' strings (both engines format identically) —
    double extremes are NOT stringified (engine float-formatting
    diverges), stored doubles pass through min/max unchanged so the
    numeric fields compare exactly.

    Shape at scale: one aggregate PER COLUMN, unioned — deliberately not
    a single multi-countDistinct aggregate, which Catalyst plans as an
    EXPAND (row-count × column-count blowup before the shuffle). Each
    per-column pass prunes the parquet scan to that one column
    (ReadSchema shows a single field), so a 100-column profile reads each
    column stripe once — embarrassingly parallel across columns and the
    per-pass shuffle carries one partial-agg row per partition.
    """
    from pyspark.sql import types as T

    cols = columns or [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    parts: list[DataFrame] = []
    for name in cols:
        dt = by_name[name]
        c = F.col(name)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            s = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
            min_s, max_s = F.min(s), F.max(s)
            min_n = F.lit(None).cast("double")
            max_n = F.lit(None).cast("double")
        elif isinstance(dt, (T.StringType,)):
            min_s, max_s = F.min(c), F.max(c)
            min_n = F.lit(None).cast("double")
            max_n = F.lit(None).cast("double")
        elif isinstance(dt, T.NumericType):
            min_s = F.lit(None).cast("string")
            max_s = F.lit(None).cast("string")
            min_n = F.min(c).cast("double")
            max_n = F.max(c).cast("double")
        else:  # arrays/structs/binary: counts only
            min_s = F.lit(None).cast("string")
            max_s = F.lit(None).cast("string")
            min_n = F.lit(None).cast("double")
            max_n = F.lit(None).cast("double")
        parts.append(
            df.select(c).agg(
                F.lit(name).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                min_s.alias("min_str"),
                max_s.alias("max_str"),
                min_n.alias("min_num"),
                max_n.alias("max_num"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column_name")


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    by: str,
    permilles: list[int] = (100, 250, 500, 750, 900),
) -> DataFrame:
    """Per-group EXACT type-1 (lower) quantiles of an integer column,
    computed from the value histogram — the scalable exact companion
    to the KLL sketches: `percentile()` buffers every group's raw rows
    in executor memory, while this costs one map-side-combining
    aggregate bounded by the VALUE DOMAIN (doc lengths, token counts,
    latencies — at most ~1e6 distinct values at any corpus size).

    Quantile definition: q_p = the smallest value whose cumulative
    count reaches rank ⌈p·n⌉ (1-indexed) — pure integers, identical in
    every engine (no interpolation, no floats). Probabilities are
    integer PERMILLES so the rank arithmetic stays exact:
    rank = (permille·n + 999) DIV 1000.

    NULL values are excluded before the histogram is built (they could
    never be selected by the min-over-threshold step but would inflate
    n and shift every rank; and the two engines order NULLs at opposite
    window ends, so keeping them would also diverge cross-engine).
    n_rows therefore counts non-NULL values only.

    Output: one row per group with q_p{permille} columns plus n_rows.
    Same cumsum-over-histogram shape as robust_outlier_profile: the
    window runs over the compact histogram, never the corpus."""
    v = F.col(value_col).cast("bigint")
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(by).alias(by), v.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wo = (
        Window.partitionBy(by)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(by)
    ranked = hist.select(
        by,
        "v",
        F.sum("cnt").over(wo).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_rows")]
    for p in permilles:
        p = int(p)
        rank = F.expr(f"({p} * n + 999) DIV 1000")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("v"))).alias(
                f"q_p{p}"
            )
        )
    return ranked.groupBy(by).agg(*aggs).orderBy(by)
