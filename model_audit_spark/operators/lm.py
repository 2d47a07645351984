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

Plan shape at scale (char_lm_scores):
- One scan -> per-row INTEGER bigram-key array (split('') -> ascii
  codepoints -> zip_with cp1·2^21+cp2; bijective over Unicode, so int
  counts == string counts exactly), persisted once.
- Training: explode_outer -> ONE hash aggregate keyed on the int
  (map-side combine; vocabulary is bounded by charset², so the
  aggregate output is tiny no matter the corpus size).
- Scoring: the SAME occurrence explode (no per-doc counting, no sort —
  Σ_b m_b·ln9(cnt_b) is computed as Σ over raw occurrences of ln9, which
  is the identical integer sum), a BROADCAST hash join of each occurrence
  against the LM table (bounded size, O(1) int probe), and a per-doc hash
  aggregate whose map-side combine emits ~1 row per doc per partition.
  No corpus-sized exchange anywhere: the only shuffles carry the
  charset²-bounded LM rows and the one-combined-row-per-doc partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from model_audit_spark.persistence import track

__all__ = [
    "char_bigrams",
    "char_entropy_scores",
    "char_lm_table",
    "char_lm_scores",
]


def char_bigrams(col: Column) -> Column:
    """Array of adjacent character pairs of lower(col); [] below 2 chars.

    WARNING — O(n²) when `col` is an expression: the transform lambda
    embeds `col`'s lowered tree, and per-element lambda evaluation
    re-lowers the WHOLE string for every bigram (measured 2x the whole
    char_lm wall at the 100x tier). Hot paths must stage the lowered
    text as a named column first and call _bigrams_of_lowered on the
    attribute (char_lm_scores does); this inline form is kept for small
    inputs and API compatibility."""
    return _bigrams_of_lowered(F.lower(F.coalesce(col, F.lit(""))))


def _bigrams_of_lowered(lc: Column) -> Column:
    """char_bigrams over an ALREADY-LOWERED column (ideally a named
    attribute, so the per-element substr reads a cheap reference)."""
    n = F.length(lc)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: lc.substr(i, F.lit(2)))


def char_lm_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(bigram, cnt): corpus-wide char-bigram counts — the trained LM.
    The lowered text is staged as a named column so the bigram lambda
    reads an attribute (see char_bigrams warning). explode_outer + an
    explicit isNotNull on the GENERATED attribute instead of a plain
    explode: InferFiltersFromGenerate would otherwise push a
    size(arr) > 0 filter below the staging with the alias substituted,
    re-building the bigram array once per row inside the Filter (the
    r10 pushed-filter rebuild, applied here in r11)."""
    lc = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.select(lc.alias("_lc"))
        .select(
            F.explode_outer(_bigrams_of_lowered(F.col("_lc"))).alias("bigram")
        )
        .filter(F.col("bigram").isNotNull())
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

    Plan shape (r11 rebuild — integer bigram keys, no sort, no per-doc
    counting at all):
    Σ_b m_b·ln9(cnt_b) over a doc's distinct bigrams is the SAME integer
    sum as Σ over the doc's raw bigram occurrences of ln9(cnt) — so the
    per-doc multiset (the r10 array_sort + run-length machinery, and the
    r1-r9 groupBy(id, bigram) exchange before it) is pure overhead. And
    the bigram needn't be a STRING: materializing ~224M two-char substr
    objects measured 11.7 s a pass at the 100x tier, vs 4.3 s for
    split('') -> ascii() -> zip_with integer keys cp1·2^21 + cp2 —
    BIJECTIVE over all Unicode (max codepoint 0x10FFFF < 2^21), so
    counts per key equal counts per bigram string exactly and the
    oracle twin (which keys on the string) stays bit-identical with no
    collision caveat. The persisted mid-relation is the (id, key-array)
    frame — training explodes it into ONE hash aggregate keyed on the
    int (map-side combine, charset²-bounded output), scoring explodes
    it again through a BROADCAST hash join (O(1) int probe, no
    exchange) into the per-doc aggregate whose map-side combine emits
    ~1 row per doc per partition. No corpus-sized exchange anywhere.
    explode_outer keeps empty docs as a NULL-key row (misses the join:
    n_bigrams = 0, lm_score NULL) and starves InferFiltersFromGenerate
    (no pushed size()>0 filter re-building the array per row); the
    training leg filters isNotNull on the GENERATED attribute. _cps is
    staged as a named column so the two zip_with slices read an
    attribute, not two rebuilds of the lambda-bearing split+ascii tree
    (subexpression elimination skips LambdaVariable trees). An external
    `lm` (char_lm_table output, string bigrams — the public contract)
    is mapped to int keys on its charset²-bounded model rows, never the
    corpus. Values are bit-identical to the r10 shape; the oracle twin
    is unchanged. Measured at the Heaps/Zipf 100x tier (splittable
    fixture): 34.6 s (string-occurrence shape) -> see SCALE.md row.
    """
    lc = F.col("_lc")
    cps = F.col("_cps")
    n1 = F.greatest(F.size(cps) - 1, F.lit(0))
    key = lambda a, b: a.cast("long") * F.lit(2097152) + b  # noqa: E731
    staged = (
        df.select(
            F.col(id_col),
            F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_lc"),
        )
        .withColumn(
            "_cps",
            F.when(
                F.length(lc) >= 2,
                F.transform(F.split(lc, ""), lambda ch: F.ascii(ch)),
            ).otherwise(F.array().cast("array<int>")),
        )
        .select(
            F.col(id_col),
            F.zip_with(
                F.slice(cps, 1, n1), F.slice(cps, 2, n1), key
            ).alias("_k"),
        )
    )
    if lm is None:
        # training and scoring each explode this relation; persist the
        # int key arrays ONCE (8 B/occurrence; the r10 shape persisted
        # sorted STRING arrays, and re-building keys per leg would cost
        # a full split+ascii pass each).
        staged = track(staged.persist())
    occ = staged.select(F.col(id_col), F.explode_outer("_k").alias("_bk"))
    if lm is None:
        lm_keys = (
            occ.filter(F.col("_bk").isNotNull())
            .groupBy("_bk")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
    else:
        # public lm contract is (bigram STRING, cnt); int-key it on the
        # charset²-bounded model rows
        lm_keys = lm.select(
            key(
                F.ascii(F.substring("bigram", 1, 1)),
                F.ascii(F.substring("bigram", 2, 1)),
            ).alias("_bk"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    lm_keys = track(lm_keys.persist())
    total = lm_keys.agg(F.sum("cnt").alias("t"))  # 1 row
    ln9 = F.round(F.ln("cnt") * F.lit(1000000000.0), 0).cast("long")
    scored = (
        occ.join(
            F.broadcast(lm_keys.select("_bk", ln9.alias("_ln9"))),
            "_bk",
            "left",
        )
        .groupBy(id_col)
        .agg(
            # count model-covered occurrences only: unseen bigrams
            # (possible when scoring against an external lm) carry no
            # probability and are excluded from the mean; the
            # explode_outer NULL row of empty docs never joins, so it
            # is excluded the same way
            F.sum(
                F.when(F.col("_ln9").isNotNull(), F.lit(1)).otherwise(0)
            ).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("_ln9"), F.lit(0))).cast("long")
            .alias("_s9"),
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
    # run boundaries: 1-based positions where the sorted char changes.
    # The predecessor index is clamped to 1 (i == 1 compares a[1] with
    # itself, and the `i == 1` arm keeps the position regardless) so the
    # predicate NEVER produces element_at(a, 0) — which always errors in
    # Spark — instead of relying on Or short-circuit evaluation order,
    # which the optimizer is free to rewrite.
    bounds = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1)
        | (
            F.element_at(a, i)
            != F.element_at(a, F.greatest(i - 1, F.lit(1)))
        ),
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
