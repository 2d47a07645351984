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

from pyspark.sql import DataFrame
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
