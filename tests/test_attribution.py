"""Hand-computed pins for U-shaped multi-touch attribution
(operators/attribution.py): credit shares, integer remainders,
lookback bounds, and per-conversion conservation."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from model_audit_spark.operators.attribution import (
    PPM,
    channel_attribution_report,
    utouch_attribution,
)

T0 = datetime(2024, 1, 10, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_utouch_credit_split_by_touch_count(spark):
    rows = [
        # user 1: 1 touch -> 1_000_000
        (1, T0 - timedelta(hours=1), 1, "view"),
        (2, T0, 1, "purchase"),
        # user 2: 2 touches -> 400_000 first, 600_000 last
        (3, T0 - timedelta(hours=2), 2, "view"),
        (4, T0 - timedelta(hours=1), 2, "view"),
        (5, T0, 2, "purchase"),
        # user 3: 5 touches -> 400k, 66_666, 66_666, 66_666+2 rem?,
        # mid pool 200_000 DIV 3 = 66_666 each, remainder 2 -> last
        (6, T0 - timedelta(hours=5), 3, "view"),
        (7, T0 - timedelta(hours=4), 3, "view"),
        (8, T0 - timedelta(hours=3), 3, "view"),
        (9, T0 - timedelta(hours=2), 3, "view"),
        (10, T0 - timedelta(hours=1), 3, "view"),
        (11, T0, 3, "purchase"),
        # user 4: touch outside the 7-day lookback + touch AT the
        # conversion instant (not strictly before) -> no credit rows
        (12, T0 - timedelta(days=8), 4, "view"),
        (13, T0, 4, "view"),
        (14, T0, 4, "purchase"),
    ]
    per = utouch_attribution(_events(spark, rows)).collect()
    by_touch = {r.touch_id: r.credit_ppm for r in per}
    assert by_touch[1] == PPM
    assert by_touch[3] == 400_000 and by_touch[4] == 600_000
    assert by_touch[6] == 400_000
    assert by_touch[7] == 66_666 and by_touch[8] == 66_666
    assert by_touch[9] == 66_666
    assert by_touch[10] == 400_000 + 2  # last + integer remainder
    assert 12 not in by_touch and 13 not in by_touch
    # conservation: every conversion's credits total exactly 1M
    totals = {}
    for r in per:
        totals[r.conv_id] = totals.get(r.conv_id, 0) + r.credit_ppm
    assert set(totals.values()) == {PPM}


def test_channel_report_rollup(spark):
    rows = [
        (1, T0 - timedelta(hours=2), 1, "view"),
        (2, T0 - timedelta(hours=1), 1, "view"),
        (3, T0, 1, "purchase"),
    ]
    per = utouch_attribution(
        _events(spark, rows),
        channel_col=F.concat(F.lit("c"), (F.col("event_id") % 2).cast("string")),
    )
    rep = {r.channel: r for r in channel_attribution_report(per).collect()}
    assert rep["c1"].credit_ppm == 400_000  # touch 1 (first)
    assert rep["c0"].credit_ppm == 600_000  # touch 2 (last, n=2)
    assert rep["c0"].n_conversions == 1 and rep["c1"].n_conversions == 1
