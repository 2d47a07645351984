"""Distributed BPE merge learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"; scale
extension, no reference counterpart — learning the tokenizer IS a
training-data-pipeline job, and the classic algorithm distributes
cleanly because it iterates over the WORD-FREQUENCY relation, not the
corpus).

Algorithm: collapse the corpus to (word, freq) once — the only
corpus-sized pass; represent each word as a symbol sequence (initially
characters); then per merge step
  1. count adjacent symbol pairs weighted by word freq,
  2. pick the most frequent pair (count desc, left asc, right asc —
     a total order, so the choice is engine-independent),
  3. rewrite every word's sequence replacing that pair LEFT-TO-RIGHT
     NON-OVERLAPPING with the concatenated symbol,
and emit the merge table (step, left, right, pair_count) — the actual
artifact a BPE tokenizer ships.

Scale shape: after the word-count aggregate, every step touches only
the vocabulary relation (|V| rows, ≪ corpus; Zipf makes it nearly
corpus-size-independent). Pair counting is one explode + hash aggregate
over it; the winning pair is an in-DAG 1-row argmax broadcast (never a
driver round-trip); the rewrite is a pure per-row fold (F.aggregate).
Each step's vocabulary localCheckpoints lazily, so Catalyst sees a
one-step plan while the per-step eager jobs collapse into the final
materialization (the pagerank discipline, cluster.py).

Determinism: pair counts are exact integers; the argmax's
(count desc, left asc, right asc) tuple is unique; the left-to-right
greedy rewrite is mirrored in the SQL twin as an island-parity
selection over candidate positions (see oracle.bpe_merges) — unrolled
per step, so even this iterative algorithm is hash-certified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from model_audit_spark.functions.text import word_tokens

__all__ = [
    "word_freqs",
    "apply_merge",
    "learn_bpe_merges",
    "bpe_vocab_segments",
]


def word_freqs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq): the corpus collapsed to its word-frequency relation
    — BPE's working set. NULL text behaves as empty (repo convention)."""
    return (
        df.select(
            F.explode(
                word_tokens(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def apply_merge(seq: Column, left: Column, right: Column) -> Column:
    """Rewrite a symbol array replacing adjacent (left, right) with
    left||right, greedy LEFT-TO-RIGHT NON-OVERLAPPING (the BPE rewrite:
    'l l l' with (l,l) becomes ['ll','l'], not ['l','ll']).

    Implemented as a one-pass fold with a {out, pend} accumulator: hold
    one symbol back; when the held symbol is `left` and the incoming is
    `right`, emit the merge and clear the hold (so the merged symbol is
    never reused as a new left — exactly the non-overlap rule). NULL
    left/right (no winning pair this step) folds as a no-op because the
    null-equals comparison fails into the shift branch."""
    out_t = "array<string>"
    init = F.struct(
        F.array().cast(out_t).alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        merged = acc["pend"].isNotNull() & (acc["pend"] == left) & (x == right)
        return F.when(
            acc["pend"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("pend")),
        ).otherwise(
            F.when(
                merged,
                F.struct(
                    F.concat(
                        acc["out"], F.array(F.concat(left, right))
                    ).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    return F.aggregate(
        seq,
        init,
        step,
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )


def _merge_chain(
    df: DataFrame,
    n_merges: int,
    text_col: str,
    min_pair_count: int,
) -> tuple[list[DataFrame], DataFrame]:
    """Run the merge loop; return (per-step 1-row merge relations, final
    vocabulary relation (word, seq, freq))."""
    vocab = word_freqs(df, text_col).select(
        "word", F.split(F.col("word"), "").alias("seq"), "freq"
    ).localCheckpoint(eager=False)

    spark = df.sparkSession
    merge_rows = []
    for step_no in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(seq, 1, size(seq) - 1), "
                        "(s, i) -> struct(s as l, seq[i + 1] as r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .filter(F.col("cnt") >= min_pair_count)
        )
        # in-DAG argmax: a 1-row (nullable when exhausted) broadcast —
        # max of (cnt, reversed-order strings) needs a proper tuple
        # argmax, so order-limit instead of max(struct) (string asc
        # inside a max needs inversion; TakeOrdered keeps it direct)
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .select(
                F.col("l").alias("_bl"),
                F.col("r").alias("_br"),
                F.col("cnt").alias("_bc"),
            )
        )
        # left outer against a 1-row range so an empty best still yields
        # one row with nulls (keeps the lazy chain alive without a
        # driver round-trip per step)
        best1 = (
            spark.range(1)
            .join(F.broadcast(best), F.lit(True), "left")
            .select("_bl", "_br", "_bc")
        )
        merge_rows.append(
            best1.filter(F.col("_bl").isNotNull()).select(
                F.lit(step_no).cast("int").alias("step"),
                F.col("_bl").alias("left"),
                F.col("_br").alias("right"),
                F.col("_bc").alias("pair_count"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best1))
            .select(
                "word",
                apply_merge(
                    F.col("seq"), F.col("_bl"), F.col("_br")
                ).alias("seq"),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
    return merge_rows, vocab


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """(step, left, right, pair_count): the first `n_merges` BPE merges
    learned from the corpus (step 1-based). Stops early (emits fewer
    rows) when no adjacent pair reaches `min_pair_count` — mirrored in
    the SQL twin, so early exhaustion is hash-checked too."""
    if n_merges <= 0:
        return df.sparkSession.createDataFrame(
            [], "step INT, left STRING, right STRING, pair_count LONG"
        )
    merge_rows, _ = _merge_chain(df, n_merges, text_col, min_pair_count)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def bpe_vocab_segments(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    min_pair_count: int = 2,
    top_k: int | None = None,
) -> DataFrame:
    """(word, freq, segments, n_subwords): the APPLICATION half of BPE —
    how the learned merges segment every corpus word, i.e. the actual
    subword tokenization plus the per-word fertility (n_subwords; its
    freq-weighted mean is the tokenizer-fertility metric that prices
    training compute). `top_k` bounds output to the most frequent words
    ((freq desc, word asc) — deterministic)."""
    _, vocab = _merge_chain(df, n_merges, text_col, min_pair_count)
    out = vocab.select(
        "word",
        "freq",
        F.array_join("seq", " ").alias("segments"),
        F.size("seq").cast("int").alias("n_subwords"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("freq"), F.asc("word")
        ).limit(int(top_k))
    return out
