"""Sequence packing: map documents to fixed-length training contexts.

LLM pre-training consumes fixed-length token blocks (e.g. 2048); the
standard "concat-and-chunk" packing concatenates documents in a
deterministic order and slices the token stream every `context_len`
tokens, letting documents span block boundaries. This module computes the
doc → chunk assignment relationally:

- `shard`: a deterministic md5 hash bucket (same keyed-hash family as
  sampling.sample_bucket) — the unit of packing parallelism. At 100 TB
  you pick n_shards ≈ the number of output files; each shard's token
  stream is independent, so the job is one hash-partition shuffle plus an
  in-partition sort, never a global single-partition window (the naive
  "ORDER BY doc_id over everything" formulation collapses to one task and
  cannot scale).
- Within a shard, docs are ordered by doc_id and assigned
  [start_off, start_off + n_tokens) in the shard's token stream; chunk
  ids are integer division by `context_len`. All-integer arithmetic →
  bit-stable under any partitioning.

Token counts use the BPE-ish regexp proxy (text_analysis.token_count_bpe);
swap in true tokenizer counts by providing a precomputed `n_tokens`
column via `tokens_col`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from model_audit_spark.operators.sampling import BUCKETS
from model_audit_spark.operators.text_analysis import token_count_bpe

__all__ = ["pack_chunks"]


def pack_chunks(
    df: DataFrame,
    context_len: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-doc packing assignment.

    Output: (id, shard, n_tokens, start_off, chunk_first, chunk_last,
    spans_boundary). Empty docs occupy zero tokens: chunk_last ==
    chunk_first and spans_boundary is false.
    """
    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    shard = (h32 % BUCKETS) % n_shards
    if tokens_col is None:
        n_tokens = token_count_bpe(
            F.coalesce(F.col(text_col), F.lit(""))
        ).cast("long")
    else:
        n_tokens = F.col(tokens_col).cast("long")

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        n_tokens.alias("n_tokens"),
    ).select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
    )
    first = F.expr(f"start_off DIV {context_len}")
    last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_off + n_tokens - 1) DIV {context_len}"),
    ).otherwise(first)
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        "start_off",
        first.alias("chunk_first"),
        last.alias("chunk_last"),
        (last > first).alias("spans_boundary"),
    )


def length_bucketed_batches(
    df: DataFrame,
    batch_size: int = 32,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "batch",
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, shard, n_tokens, batch_id, pad_tokens): deterministic
    length-bucketed batch assignment — the dynamic-batching layout that
    minimizes padding waste (a batch pads every member to its longest;
    grouping similar lengths makes max≈mean).

    Same sharded-window discipline as pack_chunks: docs hash to shards
    (hash-mod, partitioning-independent), then WITHIN each shard are
    ordered by (n_tokens, id) — unique, so the row_number is bit-stable
    — and cut into consecutive `batch_size` groups. pad_tokens is the
    per-row padding cost under the batch's running max via a bounded
    window over the batch partition members. No global sort; the only
    shuffles are the shard window and the batch-keyed max."""
    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    shard = (h32 % BUCKETS) % n_shards
    if tokens_col is None:
        n_tokens = token_count_bpe(
            F.coalesce(F.col(text_col), F.lit(""))
        ).cast("long")
    else:
        n_tokens = F.col(tokens_col).cast("long")
    w = Window.partitionBy("shard").orderBy("n_tokens", id_col)
    base = df.select(
        F.col(id_col), shard.alias("shard"), n_tokens.alias("n_tokens")
    ).select(
        id_col,
        "shard",
        "n_tokens",
        ((F.row_number().over(w) - 1) / batch_size)
        .cast("long")
        .alias("batch_id"),
    )
    wb = Window.partitionBy("shard", "batch_id")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        "batch_id",
        (F.max("n_tokens").over(wb) - F.col("n_tokens")).alias("pad_tokens"),
    )
