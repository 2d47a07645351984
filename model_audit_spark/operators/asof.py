"""As-of and range joins — time-series operators Spark's DataFrame API
lacks natively (scale extension; DuckDB has native ASOF JOIN, which makes
both oracle-checkable).

`asof_join` uses the union-window formulation, NOT a per-key inequality
join: tag both sides, sort each key's rows once by (ts, side), and carry
the last-seen right row forward with an unbounded-preceding window. One
shuffle on the key, one sort — O(n log n) per key versus the O(n_l × n_r)
per-key blowup of a naive `l.ts >= r.ts` join condition. This is the same
plan shape Spark uses for sessionization, so it scales with AQE skew
handling like any windowed aggregate.

`range_join` (bounded interval, e.g. "clicks in the 10 minutes before each
purchase") stays a declarative inequality join + aggregate: with the
equi-key (user) in the join condition Spark executes SortMergeJoin on the
key and filters the bounded range inside each key group — fine when per-key
× per-window cardinality is moderate; for hot keys, salt the key first
(operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: the latest right row with right.ts <= left.ts
    in the same `by` group (backward as-of, DuckDB `ASOF LEFT JOIN ...
    ON l.by = r.by AND l.ts >= r.ts`). Unmatched left rows keep NULLs.

    Equal timestamps match (right sorts before left at the same instant).
    Output = every left column + `right_cols` renamed with `suffix`.
    """
    rc = [c for c in right_cols] or [
        c for c in right.columns if c not in (by, ts_col)
    ]
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        F.col(by),
        F.col(ts_col),
        F.struct(*[F.col(c) for c in [ts_col, *rc]]).alias("_rstruct"),
        F.lit(0).alias("_side"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_last_r", F.last("_rstruct", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col(f"_last_r.{ts_col}").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in rc],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    lookback: str = "10 minutes",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) row pairs in the same `by` group with
    right.ts in [left.ts - lookback, left.ts). Declarative — Catalyst
    plans SortMergeJoin on `by` plus the range filter. Output = every
    left column + right's ts and `right_cols`, renamed with `suffix`."""
    rc = [c for c in right_cols] or [
        c for c in right.columns if c not in (by, ts_col)
    ]
    rhs = right.select(
        F.col(by).alias("_rby"),
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rc],
    )
    cond = (
        (left[by] == rhs["_rby"])
        & (
            rhs[f"{ts_col}{suffix}"]
            >= left[ts_col] - F.expr(f"INTERVAL {lookback}")
        )
        & (rhs[f"{ts_col}{suffix}"] < left[ts_col])
    )
    return left.join(rhs, cond, "inner").drop("_rby")


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion counts: how many users reached step i
    having passed steps 0..i-1 IN TIME ORDER (greedy earliest-match
    subsequence — the standard product-analytics funnel).

    Per user, t_0 = min ts of step 0; t_i = min ts of step i with
    ts > t_{i-1}. Output one row per step: (step_idx, step, n_users),
    n_users monotonically non-increasing.

    Plan shape: ONE aggregate per funnel step over the (user, type, ts)
    projection — step i's conditional min depends on step i-1's result,
    so each stage is a groupBy(user) agg joined back (funnel depth is
    small and fixed; each join is user-keyed and the per-user state is
    one timestamp). No collect_list of per-user event arrays — a hot
    user's events never materialize as one row.
    """
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    reached = None  # (u, prev_ts) of users who reached the previous step
    counts = []
    for i, step in enumerate(steps):
        if reached is None:
            cur = base.filter(F.col("t") == step).groupBy("u").agg(
                F.min("ts").alias("step_ts")
            )
        else:
            cur = (
                base.filter(F.col("t") == step)
                .join(reached, "u")
                .filter(F.col("ts") > F.col("prev_ts"))
                .groupBy("u")
                .agg(F.min("ts").alias("step_ts"))
            )
        reached = cur.select("u", F.col("step_ts").alias("prev_ts")).persist()
        counts.append(
            reached.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count("*").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
