"""Structured Streaming extension (SURVEY.md §2.10 — beyond the reference's
batch-only surface, reusing the identical batch expressions).

The whole feature/scoring layer is pure Column expressions, so streaming
detect is the SAME projection applied to a readStream relation:

- streaming_detect: per-event family detection (append mode, no state).
- windowed_detection_counts: tumbling event-time windows + watermark over
  (window, predicted_model) — the streaming form of A5's source
  distribution. Late data beyond the watermark is dropped by Spark.
- detect_stream_from_files: file-source convenience (new parquet/json files
  in a directory become micro-batches) — at scale swap for Kafka with the
  same downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_audit_spark.functions.text import text_preview
from model_audit_spark.operators.detect import detection_columns


def streaming_detect(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stateless per-row detection — append-mode safe (pure projection)."""
    cols = detection_columns(text_col)
    return stream.select(
        F.col(id_col),
        *([F.col("ts")] if "ts" in stream.columns else []),
        text_preview(text_col).alias("text_preview"),
        cols["predicted_model"].alias("predicted_model"),
        cols["confidence"].alias("confidence"),
    )


def windowed_detection_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Tumbling-window counts per predicted family with late-data bound."""
    cols = detection_columns(text_col)
    detected = stream.select(
        F.col(ts_col).alias("ts"),
        cols["predicted_model"].alias("predicted_model"),
    )
    return (
        detected.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "predicted_model")
        .agg(F.count("*").alias("n_texts"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "predicted_model",
            "n_texts",
        )
    )


def detect_stream_from_files(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    stream = (
        spark.readStream.format(fmt).schema(schema).load(path)
    )
    return streaming_detect(stream, text_col, id_col)
