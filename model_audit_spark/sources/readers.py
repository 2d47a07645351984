"""Text-corpus readers (SURVEY.md §2.1 S1-S5; reference cli.py:462-521).

Each reader returns a DataFrame with a single `text` column (plus whatever
source columns survive), mirroring the reference's `_load_texts`:
- JSONL: one JSON object (or bare string) per line; blank and corrupt lines
  are skipped (PERMISSIVE mode + corrupt-record drop) — the native scale
  path, splittable by line.
- JSON array: a top-level array of strings or objects. multiLine JSON is NOT
  splittable — fine for config-sized inputs, use JSONL for corpora.
- CSV: header row; if no text column is found the error lists the available
  columns (reference cli.py:497-505).
- Plain text: split on blank lines into paragraph rows.
- extract_text: explicit field, else first non-empty of text/content/output
  (reference cli.py:515-521) — implemented as coalesce over NULLIFed empties
  so Python's falsy-"" semantics carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEXT_FIELD_CANDIDATES = ("text", "content", "output")


def extract_text(df: DataFrame, field: str | None = None) -> DataFrame:
    """Project a `text` column per reference field-coalesce rules (S5)."""
    if field:
        if field not in df.columns:
            raise ValueError(
                f"field '{field}' not found; available: {', '.join(df.columns)}"
            )
        picked = F.col(field)
    else:
        present = [c for c in TEXT_FIELD_CANDIDATES if c in df.columns]
        if not present:
            raise ValueError(
                "no text/content/output column found; available: "
                f"{', '.join(df.columns)} — pass field= explicitly"
            )
        # Python `a or b` skips empty strings, not just nulls.
        picked = F.coalesce(
            *[F.nullif(F.col(c).cast("string"), F.lit("")) for c in present]
        )
    out = df.withColumn("text", picked)
    return out.filter(F.col("text").isNotNull() & (F.col("text") != ""))


def read_jsonl(
    spark: SparkSession, path: str, field: str | None = None
) -> DataFrame:
    """S1: line-delimited JSON -> text rows; corrupt/blank lines skipped."""
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull()).drop(
            "_corrupt_record"
        )
    return extract_text(df, field)


def read_json_array(
    spark: SparkSession, path: str, field: str | None = None
) -> DataFrame:
    """S2: top-level JSON array of strings or objects."""
    df = spark.read.option("multiLine", True).json(path)
    if df.columns == ["_corrupt_record"]:
        # array of bare strings: Spark can't infer object rows; parse manually
        raw = spark.read.text(path, wholetext=True)
        arr = raw.select(
            F.explode(
                F.from_json(F.col("value"), "array<string>")
            ).alias("text")
        )
        return arr.filter(F.col("text").isNotNull() & (F.col("text") != ""))
    return extract_text(df, field)


def read_csv_texts(
    spark: SparkSession, path: str, field: str | None = None
) -> DataFrame:
    """S3: header CSV; missing text column error lists available columns."""
    df = spark.read.option("header", True).csv(path)
    return extract_text(df, field)


def read_text_paragraphs(spark: SparkSession, path: str) -> DataFrame:
    """S4: whole file split on blank lines into trimmed paragraph rows."""
    raw = spark.read.text(path, wholetext=True)
    para = raw.select(
        F.explode(F.split(F.col("value"), r"\n\s*\n")).alias("text")
    )
    return para.select(F.trim("text").alias("text")).filter(
        F.col("text") != ""
    )


def read_texts(
    spark: SparkSession, path: str, field: str | None = None
) -> DataFrame:
    """Suffix-dispatched loader mirroring reference cli.py:462-512."""
    lower = path.lower()
    if lower.endswith((".jsonl", ".ndjson")):
        return read_jsonl(spark, path, field)
    if lower.endswith(".json"):
        return read_json_array(spark, path, field)
    if lower.endswith(".csv"):
        return read_csv_texts(spark, path, field)
    if lower.endswith(".parquet"):
        return extract_text(spark.read.parquet(path), field)
    if lower.endswith(".orc"):
        return extract_text(spark.read.orc(path), field)
    if lower.endswith(".avro"):
        # spark-avro is an external module; surface a clear error when the
        # connector jar is absent instead of a raw ClassNotFound
        try:
            return extract_text(
                spark.read.format("avro").load(path), field
            )
        except Exception as e:  # pragma: no cover - depends on packaging
            raise RuntimeError(
                "Avro input needs the spark-avro package "
                "(org.apache.spark:spark-avro); underlying error: "
                f"{e}"
            ) from e
    return read_text_paragraphs(spark, path)

def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-TZ TIMESTAMP regardless of
    how the parquet writer encoded it. The driver's events.parquet has
    shipped as TIMESTAMP(NANOS) (readable only as long via
    spark.sql.legacy.parquet.nanosAsLong) and as TIMESTAMP(MICROS)
    (read as TIMESTAMP_NTZ) across rounds; queries must not care.

    long (epoch nanos) -> integer-DIV to micros (float division loses
    ~256ns, a visible off-by-one in microsecond-exact as-of lags);
    TIMESTAMP_NTZ -> cast to TIMESTAMP (same wall time under the UTC
    session zone); TIMESTAMP -> unchanged.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
        )
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
