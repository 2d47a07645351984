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


def test_minhash_index_append_extends_probe_surface(spark, tmp_path):
    from model_audit_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_append,
        minhash_index_read,
        minhash_index_write,
    )

    first = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string",
    )
    second = spark.createDataFrame(
        [(2, "completely different content about distributed engines")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    minhash_index_write(first, path)
    minhash_index_append(second, path)
    idx = minhash_index_read(spark, path)
    assert idx.count() == 2 * 4

    # a copy of the APPENDED doc is now found by the probe
    batch = second.withColumn("doc_id", F.col("doc_id") + 100)
    corpus = first.unionByName(second)
    got = incremental_dedup_pairs(batch, idx, corpus, min_jaccard=0.5)
    assert [(r.id_new, r.id_idx) for r in got.collect()] == [(102, 2)]


def test_stream_upsert_sink_converges_to_latest_rows(spark, tmp_path):
    from model_audit_spark.streaming import stream_upsert_sink

    src_dir = tmp_path / "batches"
    src_dir.mkdir()
    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, v long"
    )
    b1.coalesce(1).write.parquet(str(src_dir / "f1"))
    # second file: replaces key 2, adds key 3
    b2 = spark.createDataFrame(
        [(2, "B", 99), (3, "c", 30)], "id long, name string, v long"
    )
    b2.coalesce(1).write.parquet(str(src_dir / "f2"))

    stream = (
        spark.readStream.schema("id LONG, name STRING, v LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*/")
    )
    out = str(tmp_path / "sink")
    q = stream_upsert_sink(
        stream, out, ["id"], str(tmp_path / "ckpt"), availableNow=True
    )
    q.awaitTermination(120)
    back = {r.id: (r.name, r.v) for r in spark.read.parquet(out).collect()}
    assert back == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30)}


def test_snapshot_diff_statuses(spark):
    from pyspark.sql import Row
    from model_audit_spark.operators.snapshot import (
        corpus_snapshot_diff,
        snapshot_diff_summary,
    )

    old = spark.createDataFrame([
        Row(doc_id=1, text="a"),
        Row(doc_id=2, text="b"),
        Row(doc_id=3, text="same"),
        Row(doc_id=5, text=None),
    ])
    new = spark.createDataFrame([
        Row(doc_id=2, text="b-edited"),
        Row(doc_id=3, text="same"),
        Row(doc_id=4, text="new doc"),
        Row(doc_id=5, text=""),
    ])
    rows = {r["doc_id"]: r["status"]
            for r in corpus_snapshot_diff(old, new).collect()}
    # NULL -> '' is NOT a change (repo NULL convention); unchanged absent
    assert rows == {1: "removed", 2: "changed", 4: "added"}
    summary = {r["status"]: r["n"]
               for r in snapshot_diff_summary(old, new).collect()}
    assert summary == {"added": 1, "changed": 1, "removed": 1}
