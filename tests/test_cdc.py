"""Hand-computed pins for the CDC / SCD2 operators (operators/cdc.py).

DETERMINISM.md process rule: hash-matching the oracle proves Spark ==
DuckDB, not that either is right — these tests pin the semantics on a
tiny log computed by hand.
"""

from datetime import datetime

from model_audit_spark.operators.cdc import scd2_current, scd2_history


def _log(spark):
    # user 1: A A B A  (runs: A×2, B×1, A×1)
    # user 2: C        (single open run)
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "A"),
        (1, datetime(2024, 1, 1, 0, 5, 0), 2, "A"),
        (1, datetime(2024, 1, 1, 0, 10, 0), 3, "B"),
        (1, datetime(2024, 1, 1, 0, 20, 0), 4, "A"),
        (2, datetime(2024, 1, 2, 12, 0, 0), 5, "C"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_scd2_history_runs_and_intervals(spark):
    out = scd2_history(_log(spark)).orderBy("user_id", "version").collect()
    got = [
        (
            r.user_id,
            r.version,
            r.event_type,
            r.valid_from,
            r.valid_to,
            r.n_events,
            r.is_current,
        )
        for r in out
    ]
    assert got == [
        (1, 1, "A", "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2, False),
        (1, 2, "B", "2024-01-01 00:10:00", "2024-01-01 00:20:00", 1, False),
        (1, 3, "A", "2024-01-01 00:20:00", None, 1, True),
        (2, 1, "C", "2024-01-02 12:00:00", None, 1, True),
    ]


def test_scd2_equal_ts_breaks_on_order_col(spark):
    from datetime import datetime as dt

    rows = [
        (9, dt(2024, 3, 1), 2, "Y"),
        (9, dt(2024, 3, 1), 1, "X"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = scd2_history(df).orderBy("version").collect()
    assert [(r.version, r.event_type) for r in out] == [(1, "X"), (2, "Y")]


def test_scd2_current_is_latest_state(spark):
    cur = scd2_current(scd2_history(_log(spark)))
    got = {(r.user_id, r.event_type) for r in cur.collect()}
    assert got == {(1, "A"), (2, "C")}


def test_scd2_null_attr_coalesces_to_empty(spark):
    from datetime import datetime as dt

    rows = [(5, dt(2024, 1, 1), 1, None), (5, dt(2024, 1, 2), 2, None)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = scd2_history(df).collect()
    assert len(out) == 1 and out[0].event_type == "" and out[0].n_events == 2
