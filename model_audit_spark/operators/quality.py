"""Repetition / boilerplate quality filters over a document corpus.

Gopher-style (Rae et al. 2021, "Scaling Language Models") repetition
signals re-expressed as Spark built-in expressions, plus a composite
pass/fail verdict. These complement the length/stopword/punctuation
quality score in text_analysis.doc_stats: that one scores *prose
healthiness*, this one catches *repetitive or listy boilerplate* (nav
bars, SEO spam, log dumps) that length-based scores miss.

Plan shape at scale:
- Every line/paragraph/symbol signal is a pure per-row projection over one
  parquet scan of the `text` column — no shuffle, fully codegen'd.
- The top-2-gram signal needs per-(doc, ngram) counts: explode → two-level
  aggregate → per-doc argmax, then an equi-join back to the projection
  side. That is 2 shuffles keyed on doc_id/(doc_id, ngram); the text
  column is scanned twice, which beats carrying every scalar feature
  through the explode (narrow shuffle rows win at 100 TB).
- Tie-break for the most frequent 2-gram is max(struct(count, ngram)) —
  count first, then lexicographically-largest ngram — so the result is
  deterministic under any partitioning and hash-matches the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from model_audit_spark.functions.text import (
    count_substr,
    ngrams,
    word_tokens,
    words,
)

__all__ = ["repetition_stats", "REPETITION_THRESHOLDS"]

# Composite-verdict thresholds (Gopher-inspired; a doc FAILS when any
# signal exceeds its bound).
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "top_2gram_char_frac": 0.20,
    "symbol_word_ratio": 0.10,
    "bullet_line_frac": 0.90,
    "ellipsis_line_frac": 0.30,
}


def _nonblank(parts: Column) -> Column:
    trimmed = F.transform(parts, lambda x: F.trim(x))
    return F.filter(trimmed, lambda x: x != F.lit(""))


def _dup_frac(items: Column) -> Column:
    n = F.size(items)
    return (n - F.size(F.array_distinct(items))) / F.greatest(n, F.lit(1))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition signals + composite `repetition_pass` verdict.

    Output: (id, n_lines, dup_line_frac, dup_para_frac, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, top_2gram, top_2gram_char_frac,
    repetition_pass). NULL text behaves as empty (repo-wide convention).
    """
    # `lines` is a lambda-bearing array referenced ~8x (sizes, dup_frac,
    # bullet/ellipsis filters, denominators); Spark's subexpression
    # elimination skips LambdaVariable trees, so the inline form re-split
    # and re-trimmed every row per reference (the watermark-fusion
    # defect). Staged as named columns, each producer is computed once
    # per row — still one scan, no shuffle added.
    clash = [n for n in df.columns if n.startswith("_rs_")]
    if clash:
        raise ValueError(
            "repetition_stats: input frame already has reserved "
            f"column(s): {clash}"
        )
    c = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.withColumns(
        {
            "_rs_lines": _nonblank(F.split(c, "\n")),
            "_rs_paras": _nonblank(F.split(c, r"\n{2,}")),
        }
    )
    lines = F.col("_rs_lines")
    paras = F.col("_rs_paras")
    n_lines = F.size(lines)
    n_words = F.size(words(c))
    n_chars = F.length(c)

    bullet = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("-")
            | x.startswith("*")
            | x.startswith("•"),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines, lambda x: x.endswith("...") | x.endswith("…")
        )
    )
    symbol_hits = (
        count_substr(c, "#") + count_substr(c, "...") + count_substr(c, "…")
    )

    feats = staged.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        F.round(_dup_frac(lines), 6).alias("dup_line_frac"),
        F.round(_dup_frac(paras), 6).alias("dup_para_frac"),
        F.round(
            symbol_hits / F.greatest(n_words, F.lit(1)), 6
        ).alias("symbol_word_ratio"),
        F.round(bullet / F.greatest(n_lines, F.lit(1)), 6).alias(
            "bullet_line_frac"
        ),
        F.round(ellipsis / F.greatest(n_lines, F.lit(1)), 6).alias(
            "ellipsis_line_frac"
        ),
        n_chars.alias("_n_chars"),
    )

    top2 = (
        df.select(
            F.col(id_col), F.explode(ngrams(word_tokens(c), 2)).alias("ng")
        )
        .groupBy(id_col, "ng")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max(F.struct("cnt", "ng")).alias("_top"))
        .select(
            id_col,
            F.col("_top.ng").alias("top_2gram"),
            (F.col("_top.cnt") * F.length("_top.ng")).alias("_top_chars"),
        )
    )

    t = REPETITION_THRESHOLDS
    out = feats.join(top2, id_col, "left")
    top_frac = F.round(
        F.least(
            F.coalesce(F.col("_top_chars"), F.lit(0))
            / F.greatest(F.col("_n_chars"), F.lit(1)),
            F.lit(1.0),
        ),
        6,
    )
    return out.select(
        id_col,
        "n_lines",
        "dup_line_frac",
        "dup_para_frac",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        F.coalesce(F.col("top_2gram"), F.lit("")).alias("top_2gram"),
        top_frac.alias("top_2gram_char_frac"),
        (
            (F.col("dup_line_frac") <= t["dup_line_frac"])
            & (F.col("dup_para_frac") <= t["dup_para_frac"])
            & (top_frac <= t["top_2gram_char_frac"])
            & (F.col("symbol_word_ratio") <= t["symbol_word_ratio"])
            & (F.col("bullet_line_frac") <= t["bullet_line_frac"])
            & (F.col("ellipsis_line_frac") <= t["ellipsis_line_frac"])
        ).alias("repetition_pass"),
    )
