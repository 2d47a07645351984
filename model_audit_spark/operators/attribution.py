"""Multi-touch conversion attribution over an event log.

U-shaped (position-based) attribution: every conversion distributes one
unit of credit over the user's qualifying touch events inside a
lookback window — 40% to the first touch, 40% to the last, the
remaining 20% split across the middles. The workhorse report behind
"which channel earns the budget", here with deterministic integer
credit so the result is engine-exact (DETERMINISM.md rule 5).

Credit is computed in parts-per-million (BIGINT):
  n = 1           -> the only touch gets 1_000_000
  n = 2           -> first 400_000, last 600_000 (middle pool rolls
                     into the last touch)
  n > 2           -> first/last 400_000 each; middles get
                     200_000 DIV (n-2) each, the integer remainder
                     goes to the LAST touch (deterministic, sums to
                     exactly 1_000_000 per conversion)

Scale shape: one stream-style interval join (touch strictly before the
conversion, within the lookback) keyed by user — bounded state, the
same shape as asof.range_join — then two window ranks over
(conversion, touch-ts) and a pure credit projection; the final rollup
is one hash aggregate keyed by channel. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000
FIRST_PPM = 400_000
LAST_PPM = 400_000
MID_POOL = PPM - FIRST_PPM - LAST_PPM


def utouch_attribution(
    events: DataFrame,
    touch_type: str = "view",
    conversion_type: str = "purchase",
    lookback_minutes: int = 7 * 24 * 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    channel_col=None,
) -> DataFrame:
    """Per-touch U-shaped credit (ppm) for every conversion.

    `channel_col` is an optional Column computed from the TOUCH row
    (e.g. a JSON-extracted campaign id); defaults to the touch's
    event_type. Returns one row per (conversion, touch):
    (user, conv_id, conv_ts, touch_id, channel, n_touches, credit_ppm).
    """
    t = events.filter(F.col("event_type") == touch_type).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("t_ts"),
        F.col(order_col).alias("touch_id"),
        (
            channel_col if channel_col is not None else F.col("event_type")
        ).alias("channel"),
    )
    c = events.filter(F.col("event_type") == conversion_type).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("c_ts"),
        F.col(order_col).alias("conv_id"),
    )
    joined = t.join(
        c,
        (t.user_id == c.user_id)
        & (F.col("t_ts") < F.col("c_ts"))
        & (
            F.col("t_ts")
            >= F.col("c_ts") - F.expr(f"INTERVAL {lookback_minutes} MINUTE")
        ),
        "inner",
    ).select(
        t.user_id.alias("user_id"),
        "conv_id",
        "c_ts",
        "touch_id",
        "t_ts",
        "channel",
    )
    w_asc = Window.partitionBy("conv_id").orderBy("t_ts", "touch_id")
    w_desc = Window.partitionBy("conv_id").orderBy(
        F.desc("t_ts"), F.desc("touch_id")
    )
    ranked = joined.select(
        "user_id",
        "conv_id",
        "c_ts",
        "touch_id",
        "channel",
        F.row_number().over(w_asc).alias("pos"),
        F.row_number().over(w_desc).alias("rpos"),
        F.count("*").over(Window.partitionBy("conv_id")).alias("n_touches"),
    )
    n = F.col("n_touches")
    mid_each = F.expr(f"{MID_POOL} DIV (n_touches - 2)")
    mid_rem = F.expr(f"{MID_POOL} % (n_touches - 2)")
    credit = (
        F.when(n == 1, F.lit(PPM))
        .when(F.col("pos") == 1, F.lit(FIRST_PPM))
        .when(
            F.col("rpos") == 1,
            F.when(n == 2, F.lit(LAST_PPM + MID_POOL)).otherwise(
                F.lit(LAST_PPM) + mid_rem
            ),
        )
        .otherwise(mid_each)
    )
    return ranked.select(
        "user_id",
        "conv_id",
        F.col("c_ts").alias("conv_ts"),
        "touch_id",
        "channel",
        "n_touches",
        credit.cast("bigint").alias("credit_ppm"),
    )


def channel_attribution_report(per_touch: DataFrame) -> DataFrame:
    """Roll per-touch credit up to channels: conversions touched,
    touches, exact total credit (ppm sums are BIGINT-exact; one
    conversion's credits always total 1_000_000)."""
    return per_touch.groupBy("channel").agg(
        F.countDistinct("conv_id").alias("n_conversions"),
        F.count("*").alias("n_touches"),
        F.sum("credit_ppm").cast("bigint").alias("credit_ppm"),
    )
