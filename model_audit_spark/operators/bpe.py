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
over it; the rewrite is a pure per-row fold (F.aggregate). Two argmax
shapes (identical output, both hash-certified by the same SQL twin):
the in-DAG chain (_merge_chain — 1-row min_by aggregate broadcast into
the rewrite; fully lazy, composes into larger plans) and the
driver-argmax loop (_merge_chain_driver — the winning pair returns to
the driver, the rewrite is a literal projection, checkpoints every few
steps; ~2x faster per step, the shape for production merge counts).
Each step's vocabulary localCheckpoints so Catalyst sees a bounded
plan. In the in-DAG chain the checkpoints are EAGER (r12): the step
broadcast racing the scheduler over an un-materialized lazy checkpoint
is a live JVM deadlock (persistence.lazy_checkpoint_scope documents the
lock ordering); the driver-argmax loop keeps lazy checkpoints because
its per-step `.first()` is the single-threaded materializing action.

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
    "learn_bpe_merges_driver",
    "learn_bpe_merges_collected",
    "bpe_vocab_segments",
    "bpe_vocab_segments_collected",
    "bpe_fertility",
    "bpe_fertility_collected",
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
    # EAGER checkpoints throughout this in-DAG chain (r12): each step
    # broadcasts best1 — a subtree over the previous vocabulary — and a
    # broadcast-exchange thread computing an UN-materialized lazy
    # checkpoint deadlocks against the DAG scheduler (the pagerank
    # deadlock, persistence.lazy_checkpoint_scope). Eager materializes
    # each step's vocab from the driver thread before any broadcast can
    # touch it. The bench/gate paths use the collected learner; this
    # chain is the fully-lazy-composition variant.
    vocab = word_freqs(df, text_col).select(
        "word", F.split(F.col("word"), "").alias("seq"), "freq"
    ).localCheckpoint()

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
        # in-DAG argmax in ONE aggregate (r5; replaces the r4
        # orderBy-limit + 1-row-range join): min_by over the sortable
        # struct (-cnt, l, r) encodes (count desc, left asc, right asc)
        # directly — negating the count is legal (exact BIGINT), string
        # asc order rides the struct comparison. A global agg always
        # emits exactly one row (null fields when exhausted), so the
        # null-safe range(1) join disappears — one fewer join + exchange
        # per merge step.
        best1 = (
            pairs.agg(
                F.min_by(
                    F.struct(F.col("l"), F.col("r"), F.col("cnt")),
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("l"),
                        F.col("r"),
                    ),
                ).alias("b")
            )
            .select(
                F.col("b.l").alias("_bl"),
                F.col("b.r").alias("_br"),
                F.col("b.cnt").alias("_bc"),
            )
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
            .localCheckpoint()
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


def bpe_vocab_segments_collected(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    min_pair_count: int = 2,
    top_k: int | None = None,
    memo_key=None,
    collect_max_rows: int | None = None,
) -> DataFrame:
    """bpe_vocab_segments in the collected-chain shape (r12): the merge
    chain is learned driver-side over the collapsed vocabulary
    (_collected_chain — ONE corpus pass; memo-shared with
    learn_bpe_merges_collected when `memo_key` matches), then applied
    as n_merges LITERAL apply_merge folds in one projection — no
    per-step broadcast joins, no per-step checkpoints, no per-step AQE
    stage materialization. Output is identical to bpe_vocab_segments:
    the learned chain is pinned equal across all three learner shapes,
    and composing the same ordered rewrites over the same initial
    character sequences is exactly what the in-DAG chain's per-step
    vocab rewrite computes (equality pinned in tests; the same
    unrolled-CTE oracle twin hash-certifies both). Vocabulary-size
    gated like learn_bpe_merges_collected (r13): above
    `collect_max_rows` the chain is learned by the distributed
    driver-argmax loop and its final vocabulary IS the segmentation —
    identical output either path."""
    # ONE corpus pass: the persisted word-frequency relation feeds the
    # gating count, the learner's collect (or the fallback loop) AND
    # the segmentation projection
    wf, fits = _gated_wf(df, text_col, collect_max_rows)
    if not fits:
        _merges, vocab = _merge_chain_driver(
            df, n_merges, text_col, min_pair_count, wf=wf
        )
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
    merges, _, _, _ = _collected_chain(
        df, n_merges, text_col, min_pair_count, memo_key, wf=wf
    )
    vocab = wf.select(
        "word", F.split(F.col("word"), "").alias("seq"), "freq"
    )
    seq = F.col("seq")
    for _step, left, right, _cnt in merges:
        seq = apply_merge(seq, F.lit(left), F.lit(right))
    out = vocab.select(
        "word",
        "freq",
        F.array_join(seq, " ").alias("segments"),
        F.size(seq).cast("int").alias("n_subwords"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("freq"), F.asc("word")
        ).limit(int(top_k))
    return out


MERGE_SCHEMA = "step INT, left STRING, right STRING, pair_count LONG"


def _merge_chain_driver(
    df: DataFrame,
    n_merges: int,
    text_col: str,
    min_pair_count: int,
    ckpt_every: int = 6,
    vocab_partitions: int | None = None,
    wf: DataFrame | None = None,
) -> tuple[list[tuple], DataFrame]:
    """Driver-argmax merge loop (r5): per step, the winning pair comes
    back to the driver as ONE row (the same O(rounds) tiny-action
    discipline as pagerank's convergence count, cluster.py) and the
    rewrite becomes a LITERAL-parameterized projection — no broadcast
    exchange, no join, and checkpoints only every `ckpt_every` steps
    (a projection chain between checkpoints is re-analyzed, not
    re-shuffled). At 64 merges this halves wall-clock vs the in-DAG
    chain (measured 14.7 s vs 29 s, sf0.1 local[32]).

    Trade-off vs _merge_chain (in-DAG): 1 driver round-trip per step —
    O(n_merges) blocking actions, each returning 24 bytes — versus one
    broadcast-join exchange per step. At any scale the rewrites between
    checkpoints re-evaluate ≤ ckpt_every-1 fold layers during the next
    step's aggregate; vocabulary-sized, no extra shuffle. Early
    exhaustion exits the loop directly (the driver sees the null row),
    so no null-safe plumbing survives into the plan.

    `vocab_partitions` coalesces the vocabulary relation once after the
    corpus-sized word-count aggregate — on a toy fixture 1 partition
    kills per-step scheduling overhead; at real scale leave None (the
    vocabulary keeps the aggregate's AQE-coalesced layout).

    `wf`: an already-built (word, freq) relation (typically the
    persisted one the vocabulary-size gate counted) so the fallback
    path reuses its cached blocks instead of re-aggregating the
    corpus."""
    vocab = (
        wf if wf is not None else word_freqs(df, text_col)
    ).select(
        "word", F.split(F.col("word"), "").alias("seq"), "freq"
    )
    if vocab_partitions:
        vocab = vocab.coalesce(vocab_partitions)
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple] = []
    for step_no in range(1, n_merges + 1):
        best = (
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
            .agg(
                F.min_by(
                    F.struct(F.col("l"), F.col("r"), F.col("cnt")),
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("l"),
                        F.col("r"),
                    ),
                ).alias("b")
            )
            .select("b.l", "b.r", "b.cnt")
        ).first()
        if best is None or best["l"] is None:
            break
        merges.append(
            (step_no, best["l"], best["r"], int(best["cnt"]))
        )
        vocab = vocab.select(
            "word",
            apply_merge(
                F.col("seq"), F.lit(best["l"]), F.lit(best["r"])
            ).alias("seq"),
            "freq",
        )
        if step_no % ckpt_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges, vocab


def learn_bpe_merges_driver(
    df: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    min_pair_count: int = 2,
    ckpt_every: int = 6,
    vocab_partitions: int | None = None,
) -> DataFrame:
    """learn_bpe_merges at production merge counts: identical output
    (equality pinned in tests and by the shared hash oracle — the SQL
    twin certifies BOTH implementations), driver-argmax loop shape.
    Use this for n_merges ≳ 16; the in-DAG variant for fully-lazy
    composition."""
    merges, _ = _merge_chain_driver(
        df, n_merges, text_col, min_pair_count, ckpt_every,
        vocab_partitions,
    )
    return df.sparkSession.createDataFrame(merges, MERGE_SCHEMA)


def _rewrite_py(seq: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping rewrite — the Python twin
    of apply_merge's fold ('l l l' with (l,l) -> ['ll','l'])."""
    out, i, n = [], 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _learn_merges_py(
    vocab: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
) -> tuple[list[tuple], int, int, int]:
    """Incremental Sennrich learner over the collapsed (word, freq)
    relation: pair->count map + pair->words inverted index + a
    lazy-deletion heap, so each merge step touches only the words that
    CONTAIN the winning pair (the original learn_bpe optimization) —
    total work is O(affected symbols), not O(|V| · n_merges).

    Semantics are bit-identical to the distributed chain (and therefore
    to the unrolled SQL twin): adjacent pairs are POSITION-counted
    (overlaps included, matching the transform-slice enumerator),
    the argmax order is (count desc, left asc, right asc) — the heap
    key (-count, left, right) encodes it directly, and Python's
    code-point string order equals Spark's UTF8 binary order — and the
    rewrite is greedy left-to-right non-overlapping.

    Returns (merges, n_words, total_freq, total_subwords) — the merge
    table plus the final-state totals bpe_fertility reports."""
    import heapq

    seqs = [list(w) for w, _ in vocab]
    freqs = [int(f) for _, f in vocab]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, seq in enumerate(seqs):
        f = freqs[idx]
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
            where.setdefault((a, b), set()).add(idx)
    heap = [(-c, a, b) for (a, b), c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple] = []
    for step_no in range(1, n_merges + 1):
        # lazy deletion: every CURRENT count has a live heap entry
        # (pushed at its last update), and any entry above it claims a
        # higher count than its pair actually has — pop those stale
        # entries until the top is current; that top is the argmax
        # under (count desc, left asc, right asc).
        best = None
        while heap:
            nc, a, b = heap[0]
            cur = counts.get((a, b), 0)
            if -nc != cur:
                heapq.heappop(heap)
                continue
            if cur >= min_pair_count:
                best = (a, b, cur)
            break
        if best is None:
            break
        left, right, cnt = best
        merges.append((step_no, left, right, cnt))

        touched: dict[tuple[str, str], int] = {}
        for idx in sorted(where.get((left, right), ())):
            seq, f = seqs[idx], freqs[idx]
            for p in zip(seq, seq[1:]):
                touched[p] = touched.get(p, 0) - f
                s = where.get(p)
                if s is not None:
                    s.discard(idx)
            new_seq = _rewrite_py(seq, left, right)
            for p in zip(new_seq, new_seq[1:]):
                touched[p] = touched.get(p, 0) + f
                where.setdefault(p, set()).add(idx)
            seqs[idx] = new_seq
        for p, delta in touched.items():
            if delta == 0:
                continue
            c = counts.get(p, 0) + delta
            if c <= 0:
                counts.pop(p, None)
            else:
                counts[p] = c
                heapq.heappush(heap, (-c, p[0], p[1]))

    total_freq = sum(freqs)
    total_subwords = sum(len(s) * f for s, f in zip(seqs, freqs))
    return merges, len(seqs), total_freq, total_subwords


def _collect_max_rows(override: int | None = None) -> int:
    """Vocabulary-row ceiling for the collected-chain learner (r13,
    VERDICT #4). Above this, the collected shape would pull an
    unbounded relation to the driver — at 100 TB of noisy text the
    "Heaps-bounded" vocabulary can plausibly reach 1e8+ rows and OOM
    the driver — so the public *_collected entry points COUNT the
    word-frequency relation first and fall back to the distributed
    driver-argmax loop (1 row per step to the driver) when it exceeds
    this. Default 20M rows ≈ a few GB of driver working set for the
    Python learner (collect + char-seq index); override per call or
    via $SPARK_GRAFT_BPE_COLLECT_MAX for bigger drivers."""
    if override is not None:
        return int(override)
    import os

    return int(
        os.environ.get("SPARK_GRAFT_BPE_COLLECT_MAX", str(20_000_000))
    )


def _gated_wf(
    df: DataFrame,
    text_col: str,
    collect_max_rows: int | None,
    wf: DataFrame | None = None,
) -> tuple[DataFrame, bool]:
    """(persisted word-frequency relation, fits_driver): the shared
    vocabulary-size gate. ONE corpus pass: the persist is filled by the
    gating count(), and both the collected learner's collect() and any
    fallback loop then scan cached vocabulary-sized blocks."""
    from model_audit_spark.persistence import track

    if wf is None:
        wf = track(word_freqs(df, text_col).persist())
    return wf, wf.count() <= _collect_max_rows(collect_max_rows)


def _collected_chain(
    df: DataFrame,
    n_merges: int,
    text_col: str,
    min_pair_count: int,
    memo_key=None,
    wf: DataFrame | None = None,
) -> tuple[list[tuple], int, int, int]:
    """Distributed corpus collapse + bounded-relation driver learner.

    The ONLY corpus-sized work is the word_freqs aggregate; the
    vocabulary it emits is Heaps-law bounded (~1e6-1e7 rows at 100 TB,
    tens of MB as (word, freq) pairs), so collecting it is the same
    bounded-collect discipline as the k-means centroid and PQ codebook
    collects (similarity.py) — and learning merges over the collapsed
    relation driver-side is how production tokenizer trainers work.
    This replaces 64 sequential Spark jobs (pure scheduling latency at
    any data size — the per-step DATA is vocabulary-sized) with one.

    `memo_key`: when set, the learned chain is memoized via
    persistence.memo_obj keyed (table-key, n_merges, text_col,
    min_pair_count), so bpe_fertility_collected reuses the chain
    learn_bpe_merges_collected already ran in the same session batch;
    release_all() (the bench isolation hook) clears it."""
    def build():
        rows = (
            wf if wf is not None else word_freqs(df, text_col)
        ).collect()
        return _learn_merges_py(
            [(r["word"], r["freq"]) for r in rows],
            n_merges,
            min_pair_count,
        )

    if memo_key is None:
        return build()
    from model_audit_spark import persistence

    return persistence.memo_obj(
        ("bpe_chain", memo_key, n_merges, text_col, min_pair_count),
        build,
    )


def learn_bpe_merges_collected(
    df: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    min_pair_count: int = 2,
    memo_key=None,
    collect_max_rows: int | None = None,
) -> DataFrame:
    """learn_bpe_merges at production merge counts, collected-vocabulary
    shape: identical output to the in-DAG and driver-argmax variants
    (equality pinned in tests; the same SQL twin hash-certifies all
    three), one distributed corpus pass + a driver-side incremental
    learner over the Heaps-bounded vocabulary.

    r13 (VERDICT #4): the "fits the driver" decision is now MEASURED,
    not assumed — the word-frequency relation is persisted and counted
    first, and above `collect_max_rows` (default 20M, see
    _collect_max_rows) the query falls back to the distributed
    driver-argmax loop (learn_bpe_merges_driver's shape, reusing the
    counted relation's cached blocks; 1 row per merge step to the
    driver) instead of collecting an unbounded vocabulary."""
    wf, fits = _gated_wf(df, text_col, collect_max_rows)
    if not fits:
        merges, _ = _merge_chain_driver(
            df, n_merges, text_col, min_pair_count, wf=wf
        )
        return df.sparkSession.createDataFrame(merges, MERGE_SCHEMA)
    merges, _, _, _ = _collected_chain(
        df, n_merges, text_col, min_pair_count, memo_key, wf=wf
    )
    return df.sparkSession.createDataFrame(merges, MERGE_SCHEMA)


def bpe_fertility_collected(
    df: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    min_pair_count: int = 2,
    memo_key=None,
    collect_max_rows: int | None = None,
) -> DataFrame:
    """bpe_fertility in the collected-vocabulary shape — same one-row
    final-state certificate, computed from the SAME learned chain as
    learn_bpe_merges_collected when `memo_key` matches (the chain is a
    deterministic function of (table, n_merges); re-learning it was the
    r5 perf finding). The division/round runs through the same Spark
    expression as the distributed variant so rounding is
    engine-identical. Vocabulary-size gated like
    learn_bpe_merges_collected (r13): above `collect_max_rows` the
    certificate computes through the distributed driver-argmax loop
    over the counted relation's cached blocks — identical output
    (the final aggregate IS bpe_fertility's)."""
    wf, fits = _gated_wf(df, text_col, collect_max_rows)
    if not fits:
        merges_l, vocab = _merge_chain_driver(
            df, n_merges, text_col, min_pair_count, wf=wf
        )
        return (
            vocab.agg(
                F.count(F.lit(1)).cast("long").alias("n_words"),
                F.sum("freq").cast("long").alias("total_freq"),
                F.sum(F.size("seq") * F.col("freq"))
                .cast("long")
                .alias("total_subwords"),
            )
            .select(
                F.lit(len(merges_l)).cast("int").alias("n_merges_done"),
                "n_words",
                "total_freq",
                "total_subwords",
                F.round(
                    F.col("total_subwords")
                    / F.greatest(F.col("total_freq"), F.lit(1)),
                    6,
                ).alias("mean_fertility"),
            )
        )
    merges, n_words, total_freq, total_subwords = _collected_chain(
        df, n_merges, text_col, min_pair_count, memo_key, wf=wf
    )
    if n_words == 0:
        # empty corpus: match the distributed shape exactly — SQL
        # sum() over zero rows is NULL, not 0 (DETERMINISM.md rule 7)
        total_freq = total_subwords = None
    spark = df.sparkSession
    return spark.createDataFrame(
        [(len(merges), n_words, total_freq, total_subwords)],
        "n_merges_done INT, n_words LONG, total_freq LONG, "
        "total_subwords LONG",
    ).select(
        "n_merges_done",
        "n_words",
        "total_freq",
        "total_subwords",
        F.round(
            F.col("total_subwords")
            / F.greatest(F.col("total_freq"), F.lit(1)),
            6,
        ).alias("mean_fertility"),
    )


def bpe_fertility(
    df: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    min_pair_count: int = 2,
    ckpt_every: int = 6,
    vocab_partitions: int | None = None,
) -> DataFrame:
    """One-row FINAL-STATE certificate of a long merge chain:
    (n_merges_done, n_words, total_freq, total_subwords,
    mean_fertility) — the freq-weighted token-per-word ratio that
    prices training compute, plus exact-integer state totals. A hash
    match on this row certifies the end state of all n_merges rewrites
    without emitting the vocabulary (the r4 concern that certifying 64
    unrolls needs 64-step output rows: it doesn't — the totals pin the
    final state)."""
    merges, vocab = _merge_chain_driver(
        df, n_merges, text_col, min_pair_count, ckpt_every,
        vocab_partitions,
    )
    return (
        vocab.agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("total_freq"),
            F.sum(F.size("seq") * F.col("freq"))
            .cast("long")
            .alias("total_subwords"),
        )
        .select(
            F.lit(len(merges)).cast("int").alias("n_merges_done"),
            "n_words",
            "total_freq",
            "total_subwords",
            F.round(
                F.col("total_subwords")
                / F.greatest(F.col("total_freq"), F.lit(1)),
                6,
            ).alias("mean_fertility"),
        )
    )
