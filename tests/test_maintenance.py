"""Parquet upsert maintenance: keyed replace + append, partition-scoped
rewrites."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F
import pytest

from model_audit_spark.sources.maintenance import upsert_parquet


def test_upsert_unpartitioned_replaces_and_appends(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, name string, v long",
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "id long, name string, v long"
    )
    out = upsert_parquet(spark, path, updates, ["id"])
    assert out == {"touched_partitions": None, "rows_written": 4}
    back = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert back == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_upsert_partitioned_touches_only_update_partitions(spark, tmp_path):
    import os

    path = str(tmp_path / "ptbl")
    spark.createDataFrame(
        [(1, "p0", 10), (2, "p0", 20), (3, "p1", 30), (4, "p2", 40)],
        "id long, part string, v long",
    ).write.partitionBy("part").parquet(path)
    before = {
        p: sorted(os.listdir(f"{path}/part={p}")) for p in ("p0", "p1", "p2")
    }
    updates = spark.createDataFrame(
        [(2, "p0", 99), (5, "p0", 50)], "id long, part string, v long"
    )
    out = upsert_parquet(spark, path, updates, ["id"], partition_col="part")
    assert out["touched_partitions"] == 1 and out["rows_written"] == 3
    back = {r.id: (r.part, r.v) for r in spark.read.parquet(path).collect()}
    assert back == {
        1: ("p0", 10), 2: ("p0", 99), 3: ("p1", 30),
        4: ("p2", 40), 5: ("p0", 50),
    }
    # untouched partitions keep their exact files
    assert sorted(os.listdir(f"{path}/part=p1")) == before["p1"]
    assert sorted(os.listdir(f"{path}/part=p2")) == before["p2"]
    assert sorted(os.listdir(f"{path}/part=p0")) != before["p0"]


def test_upsert_rejects_bad_inputs(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.createDataFrame([(1, 1)], "id long, v long").write.parquet(path)
    with pytest.raises(ValueError):
        upsert_parquet(spark, path, spark.createDataFrame([(1, 1)], "id long, v long"), [])
    with pytest.raises(ValueError):
        upsert_parquet(
            spark,
            path,
            spark.createDataFrame([(1, 1, 2)], "id long, v long, extra long"),
            ["id"],
        )
