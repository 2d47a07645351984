"""Reader/sink/cache tests (SURVEY.md §2.1; reference tests/test_cli.py and
tests/test_cache.py semantics)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from model_audit_spark.sources import (
    FingerprintCache,
    cache_key,
    read_csv_texts,
    read_json_array,
    read_jsonl,
    read_text_paragraphs,
    read_texts,
    write_csv,
    write_json,
)


def test_read_jsonl_skips_blank_and_corrupt(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"text": "hello"}\n'
        "\n"
        "not json at all\n"
        '{"content": "from content"}\n'
        '{"other": "no text field"}\n'
        '{"text": ""}\n'
    )
    got = sorted(r.text for r in read_jsonl(spark, str(p)).collect())
    assert got == ["from content", "hello"]


def test_read_jsonl_explicit_field(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"body": "alpha"}\n{"body": "beta"}\n')
    got = sorted(
        r.text for r in read_jsonl(spark, str(p), field="body").collect()
    )
    assert got == ["alpha", "beta"]


def test_read_json_array_of_strings(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(json.dumps(["one", "two", ""]))
    got = sorted(r.text for r in read_json_array(spark, str(p)).collect())
    assert got == ["one", "two"]


def test_read_json_array_of_objects(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(json.dumps([{"text": "a"}, {"output": "b"}, {"x": "c"}]))
    got = sorted(r.text for r in read_json_array(spark, str(p)).collect())
    assert got == ["a", "b"]


def test_read_csv_and_missing_column_error(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("text,label\nhello,x\n\"with,comma\",y\n")
    got = sorted(r.text for r in read_csv_texts(spark, str(p)).collect())
    assert got == ["hello", "with,comma"]

    p2 = tmp_path / "bad.csv"
    p2.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="available: a, b"):
        read_csv_texts(spark, str(p2))


def test_read_text_paragraphs(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("para one\nstill one\n\npara two\n\n\n  \n\npara three")
    got = sorted(r.text for r in read_text_paragraphs(spark, str(p)).collect())
    assert got == ["para one\nstill one", "para three", "para two"]


def test_read_texts_dispatch(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"text": "t"}\n')
    assert read_texts(spark, str(p)).count() == 1


def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'quote " and, comma'), (2, "plain")], ["id", "text"]
    )
    cdir = tmp_path / "c"
    jdir = tmp_path / "j"
    write_csv(df, str(cdir), single_file=True)
    write_json(df, str(jdir), single_file=True)
    back_c = spark.read.option("header", True).option("escape", '"').csv(
        str(cdir)
    )
    back_j = spark.read.json(str(jdir))
    assert sorted(r.text for r in back_c.collect()) == sorted(
        r.text for r in df.collect()
    )
    assert back_j.count() == 2


def test_cache_key_matches_reference_format(spark):
    import hashlib

    df = spark.range(1).select(
        cache_key(
            F.lit("openai/gpt-4:latest x"), F.lit("llmmap"), F.lit("openai")
        ).alias("k")
    )
    got = df.first().k
    digest = hashlib.sha256(
        "llmmap:openai/gpt-4:latest x:openai".encode()
    ).hexdigest()[:16]
    assert got == f"llmmap_openai_gpt-4_latest_x_{digest}"


def test_cache_put_get_miss_clear(spark, tmp_path):
    cdir = str(tmp_path / "fp_cache")
    cache = FingerprintCache(spark, cdir, ttl=0)
    assert cache.get("m1", "llmmap", "openai") is None

    rows = spark.createDataFrame(
        [("llmmap", "m1", "openai", "blackbox", '{"v": 1}')],
        ["method", "model_id", "provider", "fingerprint_type", "data_json"],
    )
    cache.put(rows)
    hit = cache.get("m1", "llmmap", "openai")
    assert hit is not None and hit.first().data_json == '{"v": 1}'
    assert cache.get("m2", "llmmap", "openai") is None

    wanted = spark.createDataFrame(
        [("llmmap", "m1", "openai"), ("llmmap", "m2", "openai")],
        ["method", "model_id", "provider"],
    )
    miss = cache.misses(wanted).collect()
    assert [r.model_id for r in miss] == ["m2"]

    entries = cache.list_entries().collect()
    assert len(entries) == 1 and entries[0].model_id == "m1"
    assert cache.clear() == 1
    assert cache.get("m1", "llmmap", "openai") is None


def test_cache_ttl_expiry(spark, tmp_path):
    cdir = str(tmp_path / "fp_cache_ttl")
    rows = spark.createDataFrame(
        [("llmmap", "m1", "openai", "blackbox", "{}")],
        ["method", "model_id", "provider", "fingerprint_type", "data_json"],
    )
    # forge an old cached_at (reference tests/test_cache.py TTL forging)
    stamped = rows.withColumn(
        "cached_at",
        F.current_timestamp() - F.expr("INTERVAL 3600 SECONDS"),
    )
    stamped.write.mode("append").partitionBy("method").parquet(cdir)

    assert FingerprintCache(spark, cdir, ttl=60).get(
        "m1", "llmmap", "openai"
    ) is None
    assert FingerprintCache(spark, cdir, ttl=0).get(
        "m1", "llmmap", "openai"
    ) is not None


def test_bucketed_join_skips_both_exchanges(spark):
    """Co-located bucketed tables: the doc_id join keeps SortMergeJoin but
    neither side shuffles — the ingest-time bucket layout replaced both
    Exchange nodes (the 100 TB join story, SCALE.md)."""
    from model_audit_spark.sources.bucketing import read_table, write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = docs.select("doc_id", F.length("text").alias("n_chars"))
    try:
        write_bucketed(docs.select("doc_id", "source", "text"),
                       "b_docs", "doc_id", n_buckets=8)
        write_bucketed(feats, "b_feats", "doc_id", n_buckets=8)
        # merge hint: at test scale AQE would broadcast the tiny side; at
        # 100 TB neither side is broadcastable and SMJ is what runs
        joined = read_table(spark, "b_docs").hint("merge").join(
            read_table(spark, "b_feats"), "doc_id"
        )
        assert len(joined.collect()) == docs.count()
        plan = joined._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        # bucket pruning metadata present on both scans
        assert plan.count("Bucketed: true") == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_feats")


def test_orc_roundtrip_and_suffix_dispatch(spark, tmp_path):
    from model_audit_spark.sources.readers import read_texts
    from model_audit_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(1, "orc row one."), (2, "orc row two.")], "doc_id int, text string"
    )
    path = str(tmp_path / "docs.orc")
    write_orc(df, path, single_file=True)
    back = read_texts(spark, path)
    assert sorted(r.text for r in back.collect()) == [
        "orc row one.", "orc row two.",
    ]


def test_normalize_event_ts_handles_all_encodings(spark, tmp_path):
    """The driver's events.parquet has shipped as TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across rounds; the loader must normalize long
    (epoch nanos), TIMESTAMP_NTZ, and TIMESTAMP to the same session-TZ
    timestamps."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from model_audit_spark.sources.readers import normalize_event_ts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    wall = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    micros = int(wall.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)

    ns_path = str(tmp_path / "ev_ns.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([micros * 1000], pa.timestamp("ns"))}),
        ns_path,
    )
    us_path = str(tmp_path / "ev_us.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([micros], pa.timestamp("us"))}), us_path
    )

    got = set()
    for path in (ns_path, us_path):
        df = normalize_event_ts(spark.read.parquet(path))
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        got.add(df.first()["ts"])
    assert got == {wall}
