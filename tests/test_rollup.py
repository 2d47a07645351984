"""Hierarchical rollup cascade: pre-aggregate reuse equals raw grouping."""

from decimal import Decimal

from pyspark.sql import functions as F

from model_audit_spark.operators.rollup import rollup_cascade


def test_cascade_equals_direct_aggregation(spark):
    from model_audit_spark.sources.readers import normalize_event_ts

    ev = normalize_event_ts(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    out = rollup_cascade(ev, "ts", ["event_type"], "value")
    got = {
        (r.level, r.bucket, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in out.collect()
    }
    for lvl in ("minute", "hour", "day"):
        direct = (
            ev.groupBy(
                F.date_trunc(lvl, "ts").alias("bucket"), "event_type"
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
            )
            .collect()
        )
        for r in direct:
            key = (lvl, r.bucket, r.event_type)
            assert got[key][0] == r.n
            assert got[key][1] == round(float(r.sv), 6)
    # every grain present, coarser grains strictly smaller
    n_by_level = {}
    for (lvl, _, _), _v in got.items():
        n_by_level[lvl] = n_by_level.get(lvl, 0) + 1
    assert n_by_level["minute"] > n_by_level["hour"] > n_by_level["day"]


def test_cascade_scans_raw_once(spark):
    from model_audit_spark.sources.readers import normalize_event_ts

    ev = normalize_event_ts(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    df = rollup_cascade(ev, "ts", ["event_type"], "value")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the minute level is persisted: coarser grains re-aggregate the
    # cached pre-aggregate instead of re-scanning raw events
    assert final.count("FileScan parquet") <= 1
    assert "InMemoryTableScan" in final


def test_streaming_minute_rollup_equals_batch(spark, tmp_path):
    """The streaming minute grain (availableNow, complete mode) must equal
    the batch cascade's minute level row for row."""
    import shutil

    from model_audit_spark.sources.readers import normalize_event_ts
    from model_audit_spark.streaming import streaming_rollup_minute

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", src_dir / "p0.parquet"
    )
    src = str(src_dir)
    raw_schema = spark.read.parquet(src).schema
    stream = normalize_event_ts(
        spark.readStream.schema(raw_schema).parquet(src)
    )
    agg = streaming_rollup_minute(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("minute_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.bucket, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.table("minute_rollup").collect()
    }
    batch = rollup_cascade(
        normalize_event_ts(spark.read.parquet(src)), "ts", ["event_type"],
        "value",
    ).filter(F.col("level") == "minute")
    expected = {
        (r.bucket, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == expected and len(got) > 100


def test_events_pivot_unpivot_roundtrip(spark):
    """Pivot (explicit values) → unpivot must reproduce the long-form
    conditional counts; pins both reshaping directions."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    wide = entrymod.queries()["events_pivot"](spark, sf)
    long = wide.unpivot(
        "user_id",
        [f"n_{t}" for t in ("view", "click", "purchase", "error")],
        "event_type",
        "n",
    ).withColumn("event_type", F.expr("substring(event_type, 3)"))
    e = entrymod._t(spark, sf, "events")
    direct = (
        e.filter(F.col("event_type").isin("view", "click", "purchase", "error"))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.user_id, r.event_type): r.n for r in long.filter("n > 0").collect()}
    want = {(r.user_id, r.event_type): r.n for r in direct.collect()}
    assert got == want


def test_decayed_counts_hand_computed(spark):
    """Hand-computed decay weights: events at exactly 0, half-life, and
    2x half-life minutes before ref contribute 1, 0.5, 0.25; future
    events are excluded."""
    from model_audit_spark.operators.rollup import decayed_counts

    rows = [
        (1, "2024-01-02 00:00:00", "a"),   # age 0      -> 1.0
        (2, "2024-01-01 12:00:00", "a"),   # age 720    -> 0.5
        (3, "2024-01-01 00:00:00", "a"),   # age 1440   -> 0.25
        (4, "2024-01-02 00:00:01", "a"),   # future     -> excluded
        (5, "2024-01-02 00:00:00", "b"),   # age 0      -> 1.0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))
    got = {
        r["event_type"]: (r["n_events"], r["decayed_count"])
        for r in decayed_counts(
            df, ref_time="2024-01-02 00:00:00", half_life_minutes=720
        ).collect()
    }
    assert got["a"][0] == 3
    assert abs(got["a"][1] - 1.75) < 1e-9
    assert got["b"] == (1, 1.0)


def test_lateness_profile_hand_computed(spark):
    """Arrival order 1..4 with event times 10:00, 10:05, 10:01, 10:06:
    the third event arrives 240s behind the running max; all others on
    time."""
    from datetime import datetime

    from model_audit_spark.operators.rollup import lateness_profile

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 7, "view"),
        (2, datetime(2024, 1, 1, 10, 5, 0), 7, "view"),
        (3, datetime(2024, 1, 1, 10, 1, 0), 7, "view"),   # 240s late
        (4, datetime(2024, 1, 1, 10, 6, 0), 7, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = lateness_profile(df).collect()[0]
    assert (r.n_events, r.n_late, r.max_late_s) == (4, 1, 240)
    # lateness values: [0, 0, 240, 0] -> p50 = 0, p95 = 204.0
    assert r.p50_late_s == 0.0
    assert abs(r.p95_late_s - 204.0) < 1e-9


def test_gapfill_locf_dense_grid_and_fill(spark):
    """Key A observes buckets 0,1,3 (gap at 2); key B only bucket 5.
    Grid is per-key min..max; the gap row carries bucket 1's count
    forward and is flagged."""
    from model_audit_spark.operators.rollup import gapfill_locf

    rows = [
        # (ts seconds, key): grain 60 -> bucket = sec DIV 60
        (0, "A"), (30, "A"),          # bucket 0: 2 events
        (70, "A"),                    # bucket 1: 1 event
        (190, "A"), (200, "A"),       # bucket 3: 2 events
        (330, "B"),                   # bucket 5: 1 event
    ]
    df = spark.createDataFrame(
        [(i, s, k) for i, (s, k) in enumerate(rows)],
        "event_id long, sec long, event_type string",
    ).selectExpr(
        "event_id", "timestamp_seconds(sec) AS ts", "event_type"
    )
    out = {(r.event_type, r.bucket): r for r in
           gapfill_locf(df, grain_sec=60).collect()}
    assert set(out) == {("A", 0), ("A", 1), ("A", 2), ("A", 3), ("B", 5)}
    a2 = out[("A", 2)]
    assert a2.n_obs is None and a2.filled == 1 and a2.is_gap
    assert out[("A", 0)].n_obs == 2 and not out[("A", 0)].is_gap
    assert out[("A", 3)].filled == 2
    assert out[("B", 5)].n_obs == 1 and out[("B", 5)].filled == 1
