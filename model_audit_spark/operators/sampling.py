"""Deterministic corpus sampling and mixture rebalancing (scale extension;
no reference counterpart — training-data pipeline tooling).

Sampling at 100 TB must be (a) a pure per-row projection — no shuffle, no
driver-side randomness, (b) reproducible across runs and engines, and
(c) stable under repartitioning. rand()-based sampling fails all three, so
membership here is a hash decision: a row is kept iff

    bucket(id, salt) = int(md5(id || ':' || salt)[:8 hex]) % BUCKETS < rate·BUCKETS

The same row always lands in the same bucket for a given salt; disjoint
salts give independent samples (held-out splits, repeated trials); and the
decision is reproducible in any engine with md5 (the DuckDB oracle runs the
identical formula). This is the standard hash-mod sampling used by
large-corpus pipelines for train/val splits.

corpus_mix rebalances a corpus toward target stratum proportions (e.g. 40%
code, 30% web, 30% books) by converting targets into per-stratum keep-rates
against observed counts — one tiny aggregate (|strata| rows) collected to
the driver, then a single stratified pass. Downsampling only: a stratum
below its target is kept whole (rate capped at 1), mirroring the usual
"mix by downsampling the overrepresented sources" practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Basis-point granularity: rates are exact multiples of 1/10000.
BUCKETS = 10_000


def sample_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(id ':' salt)."""
    key = F.concat_ws(
        ":", F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"),
        F.lit(salt),
    )
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (h32 % BUCKETS).alias("bucket")


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample: keep rows with bucket < rate·BUCKETS."""
    return df.filter(sample_bucket(id_col, salt) < int(round(rate * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: stratum k keeps rate_k of its rows.

    The rate lookup is a literal CASE chain (strata counts are small —
    languages, sources), so the whole operator stays a zero-shuffle
    projection + filter that pushes down to the scan."""
    threshold = F.lit(int(round(default_rate * BUCKETS)))
    for k, r in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == k, F.lit(int(round(r * BUCKETS)))
        ).otherwise(threshold)
    return df.filter(sample_bucket(id_col, salt) < threshold)


def quota_sample(
    df: DataFrame,
    quotas: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_quota: int = 0,
) -> DataFrame:
    """EXACT-COUNT stratified sample: stratum k keeps exactly
    min(quota_k, |stratum k|) rows — the "exactly 100k docs per
    language" contract a training-mix spec states in counts, which the
    fractional stratified_sample cannot honor (hash thresholds only
    approximate a count). Emits the input columns + smp_rank (1-based
    within stratum).

    Deterministic: rank = row_number per stratum ordered by
    (md5(salt|id), id) — a seeded shuffle order that is reproducible
    across engines and runs, never data order. One window per stratum
    partition; if one stratum dominates the corpus at 100 TB, the skew
    hedge is a draw-threshold pre-filter using the SAME seeded draw:
    `df.filter(F.md5(F.concat_ws("|", F.lit(salt),
    F.col(id).cast("string"))) < "20")` keeps the ~1/8 smallest draws,
    and as long as ≥ quota rows survive per stratum the two-stage cut
    is EXACTLY the one-stage cut (a prefix threshold on the draw can
    only drop rows ranked AFTER the winners). A pre-filter with a
    different hash (e.g. hash_sample's bucket) does NOT have this
    property — it drops an unrelated subset.
    """
    threshold = F.lit(int(default_quota))
    for k, q in sorted(quotas.items()):
        threshold = F.when(
            F.col(stratum_col) == k, F.lit(int(q))
        ).otherwise(threshold)
    draw = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(draw, F.col(id_col))
    return (
        df.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= threshold)
    )


def weighted_sample_es(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement via exponential keys
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): each row draws key = −ln(u)/w and the k SMALLEST keys
    win — exactly equivalent to sequential weighted draws without
    replacement, but embarrassingly parallel: a pure projection plus a
    global top-k (TakeOrdered — never a full sort). The quality-weighted
    corpus subsample ("sample 1M docs ∝ quality") in one pass.

    Deterministic and cross-engine exact: u = (h+1)/2³², h = the first
    8 md5 hex digits of salt|id — a seeded uniform both engines compute
    identically; ln(1/u) is quantized to integer nanonats (the ONE
    transcendental, DETERMINISM.md rule 3); the sort key is
    nanonats/weight — the exact integer divided by the weight DOUBLE
    (fractional weights like quality scores are first-class; the
    stored double is bit-identical in every engine, so the quotient
    is too) — with the id as tie-break. Emits (input columns…,
    es_key)."""
    if k <= 0:
        raise ValueError("k must be positive")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(salt), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # u in (0, 1]; ln(1/u) = ln(2^32) - ln(h+1), quantized in one shot
    lnq = F.round(
        F.log((2.0 ** 32) / (h + F.lit(1)).cast("double")) * 1e9
    ).cast("long")
    # PORTABILITY INVARIANT (pinned by test_properties::
    # test_weighted_sample_es_long_mantissa_weights): the emitted es_key
    # is the IEEE-754 quotient of an exact integer (lnq, nanonats) by
    # the STORED weight double. Division of two identical doubles is
    # correctly rounded on every engine, so the quotient — and therefore
    # the (es_key, id) order and the emitted value — is bit-identical in
    # Spark, DuckDB, and Python REGARDLESS of the weight's mantissa
    # length. This holds only while weights are read from storage; if a
    # caller ever passes a COMPUTED weight expression, the computation
    # itself must be engine-portable too (same DETERMINISM.md rule 3
    # discipline), or the quotient may differ in the last ulp and flip a
    # near-tie.
    key = lnq / F.col(weight_col).cast("double")
    return (
        # weight <= 0 ⇒ selection probability 0 (ES semantics); dropping
        # the rows also keeps the key division NaN/inf-free
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.asc("es_key"), F.asc(id_col))
        .limit(int(k))
    )


def mix_rates(
    df: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "source",
) -> dict[str, float]:
    """Per-stratum keep-rates that move observed counts toward the target
    mix by downsampling overrepresented strata.

    The binding stratum (largest observed/target ratio) is kept whole; every
    other stratum keeps target_k · (binding_count / binding_target) / count_k
    rows. One |strata|-row aggregate is collected (report-sized; SCALE.md
    rule 9). Strata absent from `targets` get rate 0."""
    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count("*").alias("n")).collect()
    }
    # strata missing from the corpus can't be downsampled toward a target;
    # they are skipped when finding the binding stratum (mix renormalizes
    # over the strata that exist)
    ratios = [counts[k] / t for k, t in targets.items() if t > 0 and counts.get(k)]
    scale = min(ratios) if ratios else 0.0
    return {
        k: min(1.0, (t * scale) / counts[k]) if counts.get(k) else 0.0
        for k, t in targets.items()
    }


def assign_splits(
    df: DataFrame,
    fracs: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """df + `split`: deterministic multi-way split assignment (train /
    val / test / ...) from the md5 bucket of `key_col`.

    `fracs` is an ORDERED {name: fraction} (basis-point granularity,
    should sum to 1; the last split absorbs rounding residue). A pure
    projection — no shuffle, pushes to the scan, and reassigning a
    grown corpus never moves an existing key between splits.

    Leakage-safe variant: pass the CLUSTER id (cluster_documents
    output) as `key_col` — every member of a near-dup cluster lands in
    the same split by construction, so near-duplicate leakage across
    train/eval is structurally impossible instead of probabilistically
    rare.
    """
    if not fracs:
        raise ValueError("fracs must name at least one split")
    b = sample_bucket(key_col, salt)
    cum = 0
    thresholds = []
    for name, frac in fracs.items():
        cum += int(round(frac * BUCKETS))
        thresholds.append((name, cum))
    names = list(fracs)
    col = F.when(b < thresholds[0][1], F.lit(names[0]))
    for name, thr in thresholds[1:-1]:
        col = col.when(b < thr, F.lit(name))
    col = (
        col.otherwise(F.lit(names[-1]))
        if len(names) > 1
        else F.lit(names[0])
    )
    return df.withColumn("split", col)


def temperature_mix_weights(
    df: DataFrame,
    stratum_col: str = "source",
    alpha: float = 0.7,
    size_col: str | None = None,
) -> DataFrame:
    """(stratum, n_docs, size, share, weight): temperature-scaled
    sampling weights w_s ∝ size_s^alpha — the T5/mT5 mixing rule that
    flattens the head of a skewed source distribution (alpha=1 keeps
    natural proportions, alpha→0 approaches uniform).

    `size` is row count, or Σ size_col (e.g. n_chars) when given, so the
    temperature can act on token mass rather than document count. One
    |strata|-row hash aggregate over the corpus; the normalizing window
    runs over that report-sized relation only (never the corpus), so the
    single-partition window exchange moves |strata| rows — fine at any
    corpus scale. Distributed end-to-end: nothing is collected; feed the
    weights into `mix_rates`-style keep-rate planning or a weighted
    sampler join.
    """
    size = (
        F.count("*") if size_col is None else F.sum(size_col)
    ).alias("size")
    agg = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"), size
    )
    w = Window.partitionBy()
    powed = F.pow(F.col("size").cast("double"), F.lit(float(alpha)))
    return agg.select(
        "stratum",
        "n_docs",
        "size",
        F.round(
            F.col("size").cast("double") / F.sum("size").over(w), 6
        ).alias("share"),
        F.round(powed / F.sum(powed).over(w), 6).alias("weight"),
    ).orderBy("stratum")


def corpus_mix(
    df: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Downsample strata so the kept corpus approximates the target mix."""
    return stratified_sample(
        df, mix_rates(df, targets, stratum_col), stratum_col, id_col, salt
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select best-first documents until a global token budget is spent —
    the "data selection under a token budget" step of pre-training corpus
    assembly: rank documents by prose quality (doc_stats.quality_score
    desc, id asc — a UNIQUE key), walk the ranking, keep documents while
    the running token total stays under `budget_tokens` (the document
    that CROSSES the budget is the last one kept — greedy selection).

    Output: (id, n_tokens, cum_tokens, selected) for every document,
    selected = (cum_tokens - n_tokens) < budget.

    Scale shape: the naive `sum() OVER (ORDER BY rank)` global window
    collapses to ONE task. Instead:
      1. range-partition on the ranking key (the normal distributed-sort
         shuffle) and localCheckpoint — PINNING the materialized blocks
         so the offset pass and the output pass see the very same
         partition contents (persist() alone can silently recompute on
         block eviction, and a recomputed range shuffle may resample
         boundaries while the collected offsets are stale);
      2. per-partition token totals -> O(partitions) rows to the driver
         -> exclusive prefix offsets broadcast back (the sharded
         running-offset trick of packing.pack_chunks, upgraded to a true
         global prefix);
      3. within-partition running sum + partition offset = the exact
         global running sum, with every core busy.
    Because the ranking key is unique, the prefix sums (and therefore the
    output) are identical under ANY boundary placement — the checkpoint
    is for internal consistency, not determinism of the result.
    """
    from pyspark.sql import Window

    from model_audit_spark.operators.text_analysis import (
        doc_stats,
        token_count_bpe,
    )

    stats = doc_stats(df, text_col, id_col).select(id_col, "quality_score")
    scored = (
        df.select(
            F.col(id_col),
            token_count_bpe(text_col).cast("bigint").alias("n_tokens"),
        )
        .join(stats, id_col)
    )
    order = [F.col("quality_score").desc(), F.col(id_col).asc()]
    ranked = (
        scored.repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        ranked.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_t"))
        .orderBy("_pid")
        .collect()
    )
    offsets, run = [], 0
    for r in totals:
        offsets.append((r["_pid"], run))
        run += r["_t"]
    off_df = ranked.sparkSession.createDataFrame(
        offsets, "_pid int, _off bigint"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranked.join(F.broadcast(off_df), "_pid")
        .withColumn("_cum_local", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "n_tokens",
            (F.col("_cum_local") + F.col("_off")).alias("cum_tokens"),
            (
                (F.col("_cum_local") + F.col("_off") - F.col("n_tokens"))
                < F.lit(budget_tokens)
            ).alias("selected"),
        )
    )


def contrastive_triplets(
    emb: DataFrame,
    positives: DataFrame,
    n_neg: int = 2,
    n_buckets: int = 16,
    salt: str = "neg",
    id_col: str = "vec_id",
) -> DataFrame:
    """(anchor, positive, negative, neg_rank): training triplets for
    contrastive embedding objectives. Each anchor keeps its best positive
    (lowest rank in `positives` — e.g. knn_graph output) and `n_neg`
    deterministic pseudo-random negatives.

    Negative sampling at scale cannot be "pick uniformly from everything"
    (that is a cross join). Instead every vector gets a deterministic
    md5 bucket in [0, n_buckets); an anchor draws candidates from the
    NEXT bucket ((b+1) mod n_buckets — disjoint from its own, so an
    anchor never draws itself), anti-joins its known neighbors (the
    positives relation) to avoid false negatives, and keeps the n_neg
    candidates with the smallest md5(anchor:candidate:salt) — an
    unbiased, partitioning-independent draw. Work is one equi-join of
    |anchors| x (N / n_buckets) candidate rows: pick n_buckets ≈
    N / (64·n_neg) to bound the per-anchor candidate set.
    """
    from pyspark.sql import Window

    # positives feeds best_pos AND both directions of the known-neighbor
    # anti-join — unpersisted, the whole upstream plan (typically a kNN
    # graph: bands, joins, cosine) would execute three times
    positives = positives.persist()
    ids = emb.select(F.col(id_col).alias("_nid")).withColumn(
        "_nb", bucket_for("_nid", salt, n_buckets)
    )
    w = Window.partitionBy("src").orderBy("rank")
    best_pos = (
        positives.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("src").alias("anchor"), F.col("dst").alias("positive")
        )
    )
    anchors = best_pos.withColumn(
        "_ab", (bucket_for("anchor", salt, n_buckets) + 1) % n_buckets
    )
    cand = anchors.join(ids, F.col("_ab") == F.col("_nb")).select(
        "anchor", "positive", F.col("_nid").alias("negative")
    )
    # anti-join known neighbors of the anchor (either direction)
    known = positives.select(
        F.col("src").alias("anchor"), F.col("dst").alias("negative")
    ).unionByName(
        positives.select(
            F.col("dst").alias("anchor"), F.col("src").alias("negative")
        )
    )
    cand = cand.join(known, ["anchor", "negative"], "left_anti")
    draw = F.md5(
        F.concat_ws(
            ":", F.col("anchor").cast("string"),
            F.col("negative").cast("string"), F.lit(salt),
        )
    )
    wn = Window.partitionBy("anchor").orderBy(draw, F.col("negative"))
    return (
        cand.withColumn("neg_rank", F.row_number().over(wn))
        .filter(F.col("neg_rank") <= n_neg)
        .select("anchor", "positive", "negative", "neg_rank")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 3,
    n_shards: int = 8,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic multi-epoch training-order shuffle with sharding.

    For every (row, epoch) pair: draw = md5(id:epoch:salt) (the same
    hash family as sample_bucket — engine-portable, seeded, stable
    under repartitioning), shard = draw % n_shards, position = rank of
    the draw within (epoch, shard). A data loader reading shard files
    in position order sees an independent pseudo-random permutation per
    epoch — reproducible on resume, no driver-side RNG state.

    Scale shape: the epoch relation is a broadcast cross join (n_epochs
    rows); the only shuffle is the (epoch, shard)-keyed window sort,
    which IS the physical work an epoch shuffle must do — each shard's
    sort is one task's partition-local sort, so parallelism = n_epochs
    × n_shards and no task ever sees more than one shard. Returns one
    row per (epoch, shard, position): the materialized training order.
    """
    epochs = F.explode(
        F.array(*[F.lit(e) for e in range(n_epochs)])
    ).alias("epoch")
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col(id_col).cast("string"),
                    F.col("epoch").cast("string"),
                    F.lit(salt),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("epoch", "shard").orderBy("draw", id_col)
    return (
        df.select(id_col, epochs)
        .withColumn("draw", draw)
        .withColumn("shard", (F.col("draw") % n_shards).cast("int"))
        .withColumn("position", F.row_number().over(w).cast("bigint"))
        .select("epoch", "shard", "position", id_col, "draw")
    )


def bucket_for(col: str, salt: str, n_buckets: int) -> Column:
    """Deterministic md5 bucket in [0, n_buckets) — the negative-sampling
    hash family (same construction as sample_bucket, parameterized
    modulus)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(col).cast("string"),
                                  F.lit(salt))), 1, 8),
            16, 10,
        ).cast("long") % n_buckets
    )


def mixing_plan(
    df: DataFrame,
    budget_tokens: int,
    stratum_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """(stratum, n_docs, n_tokens, weight, planned_tokens, epochs): the
    actionable form of temperature_mix_weights — given a training token
    budget, how many tokens to draw from each source under the
    T5-style w_s ∝ tokens_s^alpha rule, and how many passes over the
    source that implies (epochs > 1 = the source will repeat; the
    standard over-sampling red flag for small high-weight sources).

    Token mass is the exact integer Σ whitespace-token counts
    (functions.text.words — the split() the docstring promises, not the
    \\w+ DLI tokenizer: they differ on any punctuated corpus); the only
    doubles are the pow/normalize/round-6 steps temperature_mix_weights
    already certifies cross-engine. Zero-token strata emit NULL
    weight/planned/epochs deterministically (pow(0,alpha)=0 would
    otherwise make epochs 0/0 = engine-dependent NaN). One corpus
    aggregate; the normalizing window moves |strata| rows."""
    from model_audit_spark.functions.text import words

    agg = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(words(F.coalesce(F.col(text_col), F.lit(""))))
        ).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    powed = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    weight = powed / F.sum(powed).over(w)
    planned = weight * F.lit(float(int(budget_tokens)))
    nonzero = F.col("n_tokens") > 0
    return agg.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.when(nonzero, F.round(weight, 6)).alias("weight"),
        F.when(nonzero, F.round(planned, 6)).alias("planned_tokens"),
        F.when(
            nonzero,
            F.round(planned / F.col("n_tokens").cast("double"), 6),
        ).alias("epochs"),
    ).orderBy("stratum")
