"""Structured Streaming detect tests — file source, availableNow trigger,
memory sink; asserts streaming output equals the batch expression output."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from model_audit_spark.operators.detect import detect
from model_audit_spark.streaming import (
    detect_stream_from_files,
    streaming_detect,
    windowed_detection_counts,
)

SCHEMA = "doc_id BIGINT, ts TIMESTAMP, text STRING"


@pytest.fixture()
def doc_dir(spark, tmp_path):
    rows = [
        (1, "2026-01-01 00:00:10", "Certainly! Here's a comprehensive "
         "breakdown. It's important to note the following."),
        (2, "2026-01-01 00:00:40", "你好！这是一个测试文本。"),
        (3, "2026-01-01 00:01:20", "I cannot help with that request."),
        (4, "2026-01-01 00:01:30", "Certainly! Here's another breakdown "
         "with 1) lists 2) structure. Let me know if you'd like more."),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, ts STRING, text STRING")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(path)
    return path


def test_streaming_detect_matches_batch(spark, doc_dir, tmp_path):
    stream = detect_stream_from_files(spark, doc_dir, SCHEMA)
    q = (
        stream.writeStream.format("memory")
        .queryName("det_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.predicted_model, r.confidence)
        for r in spark.sql("select * from det_stream").collect()
    }
    batch = spark.read.parquet(doc_dir)
    expected = {
        r.doc_id: (r.predicted_model, r.confidence)
        for r in detect(batch, spark, "text", "doc_id").collect()
    }
    assert got == expected and len(got) == 4


def test_windowed_counts(spark, doc_dir, tmp_path):
    stream = spark.readStream.format("parquet").schema(SCHEMA).load(doc_dir)
    windowed = windowed_detection_counts(stream, "ts", "1 minute")
    q = (
        windowed.writeStream.format("memory")
        .queryName("det_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from det_windows order by window_start, predicted_model"
    ).collect()
    # append mode only emits windows the watermark has passed; with
    # availableNow the final watermark closes the first window at least
    assert all(r.n_texts >= 1 for r in rows)
    total_batch = (
        streaming_detect(spark.read.parquet(doc_dir), "text", "doc_id")
        .groupBy("predicted_model")
        .count()
        .count()
    )
    assert total_batch >= 1
