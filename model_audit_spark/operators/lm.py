"""Character-bigram language-model quality scoring (the CCNet idea —
Wenzek et al. 2020 score documents by LM perplexity and keep the
low-perplexity head — with the Spark-friendly twist that the LM is a
char-bigram table trained on the corpus itself, so "unusual" means
unusual relative to this corpus: binary junk, encoding garbage, and
exotic boilerplate score high).

Model: P(b) = count(b) / total over all character bigrams of the lowered
text. Score(doc) = mean over the doc's bigrams of -ln P(b) — the
cross-entropy of the doc against the corpus unigram-of-bigrams model.
Every scored bigram was seen in training (same corpus), so P(b) > 0 and
no smoothing term is needed.

Bit-stability (the driver compares value hashes across engines and
partitionings): ln(count) is quantized to integer NANONATS
(round(ln·1e9) as BIGINT) before the weighted sum, so the whole per-doc
reduction is exact integer arithmetic — immune to float addition order —
and the mean uses integer half-up division. The only float steps are ln
over exact integer counts (engines agree to ~1e-6 nanonats) and one
final exact-int → double division by 1e9, which is bit-identical across
engines; crucially there is NO engine-side round() on a double, the
classic source of last-digit hash flips. Bound: s9 ≤ n·36e9, so docs up
to ~2.5e8 bigrams (≈250 MB of text) fit in BIGINT.

Plan shape at scale:
- Training: one scan -> per-row bigram multiset (sequence+transform, no
  explode of raw chars) -> explode -> ONE hash aggregate keyed on the
  bigram (map-side combine; vocabulary is bounded by charset², so the
  aggregate output is tiny no matter the corpus size).
- Scoring: per-(doc, bigram) counts (second scan + aggregate keyed
  doc×bigram), then a BROADCAST join against the LM table (bounded size)
  and a per-doc aggregate. No corpus-sized shuffle carries text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "char_bigrams",
    "char_entropy_scores",
    "char_lm_table",
    "char_lm_scores",
]


def char_bigrams(col: Column) -> Column:
    """Array of adjacent character pairs of lower(col); [] below 2 chars."""
    c = F.lower(F.coalesce(col, F.lit("")))
    n = F.length(c)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: c.substr(i, F.lit(2)))


def char_lm_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(bigram, cnt): corpus-wide char-bigram counts — the trained LM."""
    return (
        df.select(F.explode(char_bigrams(F.col(text_col))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


def char_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, lm_score): corpus cross-entropy per document.

    lm_score ≈ ln(total) - (Σ m_b · ln cnt_b) / n  in nats, higher = more
    unusual, computed entirely in integer nanonats (see module docstring).
    Docs with < 2 characters score NULL with n_bigrams = 0. Pass a
    pre-built ``lm`` (char_lm_table output) to score one corpus against
    another's model.
    """
    if lm is None:
        lm = char_lm_table(df, text_col)
    lm = lm.persist()
    total = lm.agg(F.sum("cnt").alias("t"))  # 1 row

    doc_counts = (
        df.select(
            F.col(id_col),
            F.explode_outer(char_bigrams(F.col(text_col))).alias("bigram"),
        )
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("m"))
    )
    ln9 = F.round(F.ln("cnt") * F.lit(1000000000.0), 0).cast("long")
    scored = (
        doc_counts.join(F.broadcast(lm), "bigram", "left")
        .groupBy(id_col)
        .agg(
            # count model-covered bigrams only: unseen bigrams (possible
            # when scoring against an external lm) carry no probability
            # and are excluded from the mean; the explode_outer NULL row
            # of empty docs never joins, so it is excluded the same way
            F.sum(
                F.when(F.col("cnt").isNotNull(), F.col("m")).otherwise(0)
            ).cast("long").alias("n_bigrams"),
            F.sum(F.col("m") * ln9).alias("_s9"),
        )
    )
    lnt9 = F.round(F.ln("t") * F.lit(1000000000.0), 0).cast("long")
    return (
        scored.crossJoin(F.broadcast(total.select(lnt9.alias("_lnt9"))))
        .withColumn(
            "_mean9",
            F.expr("_lnt9 - ((_s9 + n_bigrams DIV 2) DIV n_bigrams)"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.when(
                F.col("n_bigrams") > 0,
                F.col("_mean9").cast("double") / F.lit(1000000000.0),
            ).alias("lm_score"),
        )
    )


def char_entropy_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_chars, char_entropy): per-document Shannon entropy of the
    lowered character distribution, in nats — the classic low-entropy
    junk detector (aaaaaa..., base64 walls score ~4.1, natural English
    ~2.9; single-char spam ~0). H = ln(n) - (Σ c·ln c)/n over the doc's
    character counts c.

    Bit-stability follows char_lm_scores: ln over exact integer counts is
    quantized to integer nanonats, the per-doc reduction is exact integer
    arithmetic with one final int → double division — no engine-side
    float rounding (see module docstring). Docs with no characters score
    NULL with n_chars = 0 (NULL text behaves as empty, repo convention).

    Plan shape at scale: ZERO-SHUFFLE scan — the per-doc char counts are
    run lengths over the doc's SORTED char array, computed entirely in
    staged expression projections (sort → boundary indices → zip_with
    run lengths → integer-nanonat fold). Output rows = docs; no
    corpus-char-sized relation ever leaves the row. (The r1-r8 shape
    exploded every character into a (doc, char) hash aggregate —
    correct, but it pushed O(total chars) rows through an aggregate
    operator, and its transform lambda re-evaluated the lowered text
    per element; measured 8.6 s → 1.5 s at 500k-doc scale, values
    bit-identical.) Each non-cheap array is materialized as a named
    column in its own projection so CollapseProject keeps it computed
    once — the watermark-fusion discipline.

    Portability note: the `F.split(col, "")` char explosion relies on
    Spark >= 3.4 semantics (SPARK-40194: no trailing empty element).
    On older Spark the split appends one "" per row, inflating n_chars
    by 1 and breaking the bit-identical entropy contract; use
    `F.split(col, "(?!$)")` there. Verified correct on the pinned
    PySpark 4.1.2.
    """
    lc = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    staged = df.withColumn("_lc", lc).withColumn(
        "_a",
        F.when(
            F.length("_lc") >= 1, F.array_sort(F.split(F.col("_lc"), ""))
        ).otherwise(F.array().cast("array<string>")),
    )
    a = F.col("_a")
    n = F.size(a)
    # run boundaries: 1-based positions where the sorted char changes
    bounds = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1)
        | (F.element_at(a, i) != F.element_at(a, i - 1)),
    )
    staged = staged.withColumn(
        "_b",
        F.when(n >= 1, bounds).otherwise(F.array().cast("array<int>")),
    ).withColumn("_nc", n.cast("long"))
    b = F.col("_b")
    ends = F.concat(
        F.slice(b, 2, F.greatest(F.size(b) - 1, F.lit(0))),
        F.array(F.size(a) + 1),
    )
    counts = F.zip_with(b, ends, lambda s, e: (e - s).cast("long"))
    ln9 = lambda x: F.round(  # noqa: E731 — local nanonat quantizer
        F.ln(x) * F.lit(1000000000.0), 0
    ).cast("long")
    s9 = F.aggregate(
        counts,
        F.lit(0).cast("long"),
        lambda acc, cnt: acc + cnt * ln9(cnt),
    )
    staged = staged.withColumn("_s9", s9).withColumn(
        "_lnn9", ln9(F.col("_nc"))
    )
    return staged.select(
        id_col,
        F.col("_nc").alias("n_chars"),
        F.when(
            F.col("_nc") > 0,
            F.expr("_lnn9 - ((_s9 + _nc DIV 2) DIV _nc)").cast("double")
            / F.lit(1000000000.0),
        ).alias("char_entropy"),
    )
