"""Parquet-lake maintenance: keyed upsert without a table format.

Plain parquet has no MERGE INTO; the standard recipe is
read → anti-join out the replaced keys → union the updates → atomic-ish
directory swap. At 100 TB you do this per PARTITION (only directories
whose keys appear in the update batch are rewritten), which is exactly
what `upsert_parquet` does when the layout is partitioned: it computes
the touched partition values from the updates and leaves every other
directory untouched.

This is deliberately a maintenance utility, not a query operator: the
rewrite cost is proportional to touched partitions, the swap is
rename-based (atomic per directory on HDFS/local; eventually-consistent
object stores need a manifest layer instead — documented limitation).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["upsert_parquet"]


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> dict:
    """Upsert `updates` into the parquet directory at `path` by key.

    Rows whose key matches an update are replaced; new keys are
    appended. With `partition_col` (the layout's partitionBy column),
    only partitions containing updated keys are rewritten — the update
    batch's partition values are collected (bounded by the batch, not
    the table) and pushed as a partition-pruning filter on the read.
    Returns {"touched_partitions": n | None, "rows_written": n}.

    The swap writes to a sibling temp dir then renames over the target
    (per-partition when partitioned) — crash-safe up to the final
    renames on rename-atomic filesystems."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    jvm, target, fs = _fs(spark, path)
    existing = spark.read.parquet(path)
    missing = [c for c in updates.columns if c not in existing.columns]
    if missing:
        raise ValueError(f"updates carry unknown columns: {missing}")
    updates = updates.select(*existing.columns)

    if partition_col is None:
        keep = existing.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(updates)
        tmp = f"{path}__upsert_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(tmp)
        n = spark.read.parquet(tmp).count()
        fs.delete(target, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), target)
        return {"touched_partitions": None, "rows_written": n}

    parts = [
        r[0]
        for r in updates.select(partition_col).distinct().collect()
    ]
    touched = existing.filter(F.col(partition_col).isin(parts))
    keep = touched.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = keep.unionByName(updates)
    tmp = f"{path}__upsert_{uuid.uuid4().hex[:8]}"
    merged.write.partitionBy(partition_col).parquet(tmp)
    n = spark.read.parquet(tmp).count()
    for p in parts:
        sub = f"{partition_col}={p}"
        src = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{sub}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
        if fs.exists(dst):
            fs.delete(dst, True)
        if fs.exists(src):
            fs.rename(src, dst)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    return {"touched_partitions": len(parts), "rows_written": n}
