"""Bucketed-table layout for shuffle-free co-located joins (SCALE.md rule:
big joins shuffle on their keys unless the layout already co-locates them).

At 100 TB the dominant join cost is the exchange of both sides; writing the
corpus bucketed by its join key (`doc_id` for per-document feature tables,
`source` for per-model rollups) pays that shuffle ONCE at ingest and every
later join reads co-located buckets — the join plan keeps its SortMergeJoin
but drops BOTH Exchange nodes (pinned in test_sources).

Spark only honors bucketing through the catalog (`saveAsTable`), not bare
parquet paths — the bucket spec lives in the table metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally per-bucket sorted) table.

    `n_buckets` should be sized so one bucket of the LARGEST co-located
    table fits an executor's task memory (100 TB / 32k buckets ≈ 3 GB);
    every table joined on `bucket_col` must use the SAME bucket count, or
    Spark re-shuffles the mismatched side."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Open a bucketed table; joins/aggregations on the bucket column skip
    their Exchange when `spark.sql.sources.bucketing.enabled` (default on)."""
    return spark.table(table)
