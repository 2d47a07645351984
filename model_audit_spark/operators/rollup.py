"""Hierarchical time rollups (the hypertable "continuous aggregate"
cascade): materialize the finest grain ONCE, derive every coarser grain
by RE-AGGREGATING the pre-aggregate — never re-scanning raw events.

At 100 TB/day of events, the minute rollup is the only pass over raw
data; hour = groupBy(date_trunc(hour)) over minute rows (1/60th the
input), day over hour rows (1/24th), and so on. Counts and DECIMAL sums
re-aggregate exactly (both are associative and exact), so the cascade is
bit-identical to aggregating each grain from raw — which is exactly what
the DuckDB oracle does, proving the equivalence on every run.

Plan shape: one shuffle per level, each over the previous level's
(already tiny) output; the minute level is the only aggregate whose
input is corpus-sized. Persist the minute level when serving multiple
grains in one job (rollup_cascade does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rollup_cascade", "LEVELS", "gapfill_locf"]

# coarse ordering of supported date_trunc levels
LEVELS = ["minute", "hour", "day"]


def rollup_cascade(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    levels: list[str] | None = None,
) -> DataFrame:
    """(level, bucket, *key_cols, n_events, total_value) for each grain.

    total_value is summed as DECIMAL(18,6) (exact, order-independent)
    and emitted as a double with no engine-side rounding hazards (the
    decimal has <= 6dp, so the nearest double round-trips identically in
    every engine).
    """
    if key_cols is None:
        key_cols = ["event_type"]
    if levels is None:
        levels = list(LEVELS)
    base = df.select(
        F.col(ts_col).alias("_ts"),
        *[F.col(k) for k in key_cols],
        F.col(value_col).cast("decimal(18,6)").alias("_v"),
    )
    finest = levels[0]
    cur = (
        base.groupBy(
            F.date_trunc(finest, F.col("_ts")).alias("bucket"), *key_cols
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("_v").alias("_sv"),
        )
        .persist()
    )
    out = cur.select(
        F.lit(finest).alias("level"), "bucket", *key_cols,
        "n_events", "_sv",
    )
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(lvl, F.col("bucket")).alias("bucket"),
                *key_cols,
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_sv").alias("_sv"),
            )
        )
        out = out.unionByName(
            cur.select(
                F.lit(lvl).alias("level"), "bucket", *key_cols,
                "n_events", "_sv",
            )
        )
    return out.select(
        "level",
        "bucket",
        *key_cols,
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("_sv").cast("double").alias("total_value"),
    )


def decayed_counts(
    df,
    ref_time: str,
    half_life_minutes: int = 1440,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
):
    """(key..., n_events, decayed_count): exponentially time-decayed
    event counts at `ref_time` — the trending/recency signal
    (half-life-weighted popularity: an event h minutes old contributes
    2^(−h/half_life)).

    Scale shape: events pre-aggregate to (key, age-minute) counts FIRST
    — the one corpus-sized hash aggregate, map-side combined — so the
    transcendental is evaluated once per DISTINCT (key, minute) row
    (bounded by keys × minutes of history, not events). Determinism
    (DETERMINISM.md rule 3): age = floor((epoch(ref) − epoch(ts)) / 60)
    — both epochs are exact BIGINTs and the diff is non-negative (future
    events filtered), so floor-of-double-division equals the oracle's
    integer DIV 60 (diff an exact multiple of 60 divides exactly in
    double; otherwise the quotient is non-integral and the sub-ulp
    division error cannot cross an integer boundary). Built from bound
    columns — `ref_time` is never spliced into a SQL string, so quote
    characters in it cannot produce a parse error; the weight quantizes
    to integer nanonats
    (round(2^(−age/hl)·1e9)); the weighted sum is exact BIGINT; the
    emitted decayed_count is nanonats/1e9 — an exact-integer division,
    identical doubles in every engine. Events after `ref_time` are
    excluded (negative ages would be future events)."""
    if key_cols is None:
        key_cols = ["event_type"]
    ref = F.lit(ref_time).cast("timestamp")
    age_min = F.floor(
        (F.unix_timestamp(ref) - F.unix_timestamp(F.col(ts_col)))
        / F.lit(60)
    ).cast("long")
    per_minute = (
        df.filter(F.col(ts_col) <= ref)
        .groupBy(*key_cols, age_min.alias("_age"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w9 = F.round(
        F.exp(
            F.lit(-0.6931471805599453)
            * (F.col("_age").cast("double") / F.lit(float(half_life_minutes)))
        )
        * 1e9
    ).cast("long")
    return (
        per_minute.groupBy(*key_cols)
        .agg(
            F.sum("_n").cast("long").alias("n_events"),
            (F.sum(F.col("_n") * w9) / F.lit(1e9)).alias("decayed_count"),
        )
        .orderBy(*key_cols)
    )


def gapfill_locf(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    grain_sec: int = 3600,
) -> DataFrame:
    """Dense time-grid gap-fill with last-observation-carried-forward —
    the time_bucket_gapfill + locf() pair of the hypertable world:
      (key, bucket, n_obs, filled, is_gap)
    per key, every `grain_sec` bucket from its first to its last
    observation; `n_obs` is NULL on buckets with no events, `filled`
    carries the last observed count forward (LOCF), `is_gap` flags the
    filled rows. The report a monitoring query reads to distinguish
    "source went quiet" from "source was never sampled".

    Plan shape at scale: the observed aggregate is the only
    corpus-sized pass; the grid is sequence(min,max) exploded from the
    k-row span relation — output is time-span-bound (keys × buckets),
    not data-bound, so a year of minutes is ~0.5M rows per key
    regardless of corpus size. LOCF is one per-key ordered window over
    the grid. Integer epoch arithmetic end to end (bucket =
    unix_seconds DIV grain — the fractional-second floor cannot move
    an integer-second boundary, mirrored with epoch() in the twin)."""
    sec = F.unix_timestamp(F.col(ts_col))
    obs = (
        events.select(
            F.col(key_col),
            F.floor(sec / grain_sec).cast("bigint").alias("bucket"),
        )
        .groupBy(key_col, "bucket")
        .agg(F.count("*").alias("n_obs"))
    )
    spans = obs.groupBy(key_col).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        F.col(key_col), F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    j = grid.join(obs, [key_col, "bucket"], "left")
    w = Window.partitionBy(key_col).orderBy("bucket")
    return j.select(
        F.col(key_col),
        F.col("bucket"),
        F.col("n_obs"),
        F.last("n_obs", ignorenulls=True)
        .over(w)
        .cast("bigint")
        .alias("filled"),
        F.col("n_obs").isNull().alias("is_gap"),
    )


def lateness_profile(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Out-of-orderness audit — the measurement behind every watermark
    choice: replaying the log in ARRIVAL order (arrival_col) per key,
    an event's lateness is how far its event time sits behind the
    latest event time already seen on that key. The p50/p95/max of
    that distribution is what `withWatermark(delay)` must cover;
    events later than the chosen delay are the ones streaming will
    drop (DETERMINISM: integer epoch-second arithmetic end to end,
    exact percentiles).

    One key-hash window pass (running max over arrival order) then a
    per-type exact-percentile aggregate. Returns per event type:
    n_events, n_late (lateness > 0), max and exact p50/p95 lateness
    in seconds.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sec = F.unix_timestamp(F.col(ts_col))
    late = events.select(
        F.col(type_col).alias("event_type"),
        (F.max(sec).over(w) - sec).cast("bigint").alias("late_s"),
    )
    return late.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max("late_s").alias("max_late_s"),
        F.expr("percentile(late_s, 0.5)").alias("p50_late_s"),
        F.expr("percentile(late_s, 0.95)").alias("p95_late_s"),
    )
