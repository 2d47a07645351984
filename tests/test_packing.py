"""Sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from model_audit_spark.operators.packing import pack_chunks


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_offsets_are_contiguous_per_shard(spark):
    docs = _df(spark, [(i, " ".join(["word"] * 10)) for i in range(40)])
    rows = pack_chunks(docs, context_len=16, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1  # hash actually spreads docs
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in shard_rows:
            assert r["start_off"] == off
            off += r["n_tokens"]


def test_chunk_ids_and_boundary_span(spark):
    # single shard => a pure token stream; 10 tokens/doc, context 16:
    # doc0 [0,10) chunk 0; doc1 [10,20) spans 0-1; doc2 [20,30) chunk 1
    docs = _df(spark, [(i, " ".join(["word"] * 10)) for i in range(3)])
    rows = {
        r["doc_id"]: r
        for r in pack_chunks(docs, context_len=16, n_shards=1).collect()
    }
    assert rows[0]["chunk_first"] == 0 and not rows[0]["spans_boundary"]
    assert rows[1]["chunk_first"] == 0 and rows[1]["chunk_last"] == 1
    assert rows[1]["spans_boundary"]
    assert rows[2]["chunk_first"] == 1 and rows[2]["chunk_last"] == 1


def test_empty_doc_zero_width(spark):
    docs = _df(spark, [(1, "one two three"), (2, ""), (3, None)])
    rows = {
        r["doc_id"]: r
        for r in pack_chunks(docs, context_len=8, n_shards=1).collect()
    }
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["chunk_first"] == rows[d]["chunk_last"]
        assert not rows[d]["spans_boundary"]


def test_precomputed_token_column(spark):
    docs = spark.createDataFrame(
        [(1, 5), (2, 7)], "doc_id long, true_tokens long"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_chunks(
            docs, context_len=8, n_shards=1, tokens_col="true_tokens"
        ).collect()
    }
    assert rows[1]["n_tokens"] == 5 and rows[2]["n_tokens"] == 7


def test_plan_is_shard_partitioned_not_global(spark):
    """The window must hash-partition on shard — a global single-partition
    sort (empty partitionBy) would serialize the whole corpus through one
    task at scale."""
    docs = _df(spark, [(i, "w") for i in range(10)])
    plan = pack_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_length_bucketed_batches_invariants(spark):
    """Batches are exact batch_size groups (except each shard's tail),
    ordered by length within a shard, and padding = batch max − own."""
    import pyspark.sql.functions as F

    from model_audit_spark.operators.packing import length_bucketed_batches

    docs = spark.createDataFrame(
        [(i, "w " * (i % 37)) for i in range(200)],
        "doc_id long, text string",
    )
    rows = length_bucketed_batches(docs, batch_size=8, n_shards=4).collect()
    assert len(rows) == 200
    by_batch = {}
    for r in rows:
        by_batch.setdefault((r.shard, r.batch_id), []).append(r)
    for (shard, bid), members in by_batch.items():
        assert len(members) <= 8
        mx = max(m.n_tokens for m in members)
        for m in members:
            assert m.pad_tokens == mx - m.n_tokens
    # only the LAST batch of a shard may be short
    for shard in {r.shard for r in rows}:
        bids = sorted(b for s, b in by_batch if s == shard)
        for b in bids[:-1]:
            assert len(by_batch[(shard, b)]) == 8
    # length-sorted within shard: batch b's max <= batch b+1's min
    for shard in {r.shard for r in rows}:
        bids = sorted(b for s, b in by_batch if s == shard)
        for a, b in zip(bids, bids[1:]):
            assert max(m.n_tokens for m in by_batch[(shard, a)]) <= min(
                m.n_tokens for m in by_batch[(shard, b)]
            )
