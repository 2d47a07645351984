"""DSIR — data selection with importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"; scale
extension, no reference counterpart — the standard published method for
steering a raw web corpus toward a target domain).

Each document's importance weight is the log-likelihood ratio of its
hashed-bigram features under the target vs raw distributions:

    log w(d) = Σ_{bigram g ∈ d} [ ln p_target(bucket(g)) − ln p_raw(bucket(g)) ]

with bucket(g) = int(md5(g)[:8 hex]) mod n_buckets (the paper's hashed
n-gram generative model; md5-hex bucketing is the repo's portable hash,
sampling.py:34-41) and add-1 smoothing on both distributions.

Scale shape (one scan, one tokenize, fixed-width shuffles):
1. tokenize once per row (named-attribute projection — the
   CollapseProject discipline of dedup.py:18-21), explode bigrams to
   (doc, is_target, bucket) and aggregate to per-doc bucket counts —
   the ONLY corpus-sized shuffle, carrying (id, bool, int, count).
   That relation is persisted (fixed-width, far smaller than text).
2. global bucket counts by target flag re-aggregate it (conditional
   sums — one pass, no second scan); the two corpus totals ride along
   as a single-partition window over that ≤ n_buckets-row relation —
   one lazy DAG end to end, no mid-pipeline driver round-trip (the
   same in-DAG pattern as principal_direction's adaptive scale).
3. the ≤ n_buckets-row log-ratio table broadcasts back and the per-doc
   weight is one more keyed aggregate.

Determinism (DETERMINISM.md rule 3 — transcendental quantization): the
smoothed ratio ((ct+1)(Tr+B)) / ((cr+1)(Tt+B)) has exact-integer
operands, multiplied in DOUBLE (identical IEEE conversions and products
in every engine; BIGINT multiply could overflow at corpus scale), one
ln per DISTINCT BUCKET quantized to integer nanonats (round(x·1e9)),
and every later step is exact BIGINT arithmetic. The emitted
dsir_logweight = nanonats/1e9 is an exact-integer division — identical
doubles cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from model_audit_spark.functions.text import ngrams, word_tokens

__all__ = ["dsir_weights", "hashed_bucket"]

NANO = 1_000_000_000


def hashed_bucket(col: Column, n_buckets: int) -> Column:
    """int(md5(x)[:8 hex]) mod n_buckets — portable feature hashing."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """(id, is_target, n_feats, dsir_nanonats, dsir_logweight) for every
    document. is_target marks the rows defining the target distribution
    (e.g. F.col("source") == "wiki"); raw = the rest. Documents with no
    bigrams get weight 0 (left join back, NULL-text-as-empty
    convention). Higher weight = more target-like; callers resample or
    top-k on (dsir_logweight desc, id) downstream."""
    base = df.select(
        F.col(id_col),
        is_target.alias("_t"),
        word_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    )
    per_doc = (
        base.select(
            F.col(id_col),
            F.col("_t"),
            F.explode(ngrams("_w", 2)).alias("g"),
        )
        .select(id_col, "_t", hashed_bucket(F.col("g"), n_buckets).alias("b"))
        .groupBy(id_col, "_t", "b")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    glob = per_doc.groupBy("b").agg(
        F.sum(F.when(F.col("_t"), F.col("n")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("_t"), F.col("n")).otherwise(0)).alias("cr"),
    ).select(
        "b", "ct", "cr",
        # corpus totals in-DAG: single-partition window over the
        # <= n_buckets-row bucket relation — free at any corpus scale
        F.sum("ct").over(wall).alias("_tt"),
        F.sum("cr").over(wall).alias("_tr"),
    )
    # one ln per distinct bucket, quantized to nanonats; operands widen
    # to double BEFORE multiplying (BIGINT products overflow at scale,
    # and identical int->double conversions keep engines bit-equal)
    r9 = F.round(
        F.log(
            ((F.col("ct") + 1).cast("double")
             * (F.col("_tr") + n_buckets).cast("double"))
            / ((F.col("cr") + 1).cast("double")
               * (F.col("_tt") + n_buckets).cast("double"))
        )
        * NANO
    ).cast("long")
    ratio = glob.select("b", r9.alias("r9"))
    weights = (
        per_doc.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_feats"),
            F.sum(F.col("n") * F.col("r9")).cast("bigint").alias(
                "dsir_nanonats"
            ),
        )
    )
    return (
        df.select(F.col(id_col), is_target.alias("is_target"))
        .join(weights, id_col, "left")
        .select(
            id_col,
            "is_target",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce("dsir_nanonats", F.lit(0)).cast("bigint").alias(
                "dsir_nanonats"
            ),
            (
                F.coalesce("dsir_nanonats", F.lit(0)).cast("double")
                / F.lit(float(NANO))
            ).alias("dsir_logweight"),
        )
    )


def dsir_select(
    weights: DataFrame,
    keep_frac: float = 0.25,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """The selection leg of DSIR: keep the most target-like `keep_frac`
    of the RAW pool per group (target rows pass through untouched — they
    define the distribution, they are not candidates).

    The paper resamples with Gumbel noise; this is the deterministic
    rank variant (the paper's own top-k ablation): percent_rank over
    (dsir_logweight desc, id) WITHIN each group — partitioned like
    quality_calibrated, never a global single-partition window (for a
    truly global budget use sampling.budget_select's sharded
    prefix-sum pattern on the weight-ranked relation). keep is
    strict-< on the UNROUNDED rank (the displayed rank is rounded 6dp
    for cross-engine hashing; thresholding on the rounded value flips
    boundary rows in million-row pools). One window over the weight
    relation — no second text scan. `weights` must carry `group_col`
    (join it back from the corpus if needed)."""
    from pyspark.sql import Window

    raw = weights.filter(~F.col("is_target"))
    w = Window.partitionBy(group_col).orderBy(
        F.desc("dsir_logweight"), F.asc(id_col)
    )
    pr = F.percent_rank().over(w)
    return raw.select(
        id_col,
        group_col,
        "dsir_logweight",
        F.round(pr, 6).alias("w_rank"),
        (pr < keep_frac).alias("keep"),
    )
