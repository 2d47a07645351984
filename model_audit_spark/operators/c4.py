"""C4-style heuristic corpus cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", Appendix — the public C4 cleaning rules),
re-expressed as Spark built-in expressions.

Line tier (applied to every non-blank line):
- keep only lines ending in a terminal punctuation mark (. ! ? " ”)
- drop lines with fewer than 3 whitespace words
- drop lines mentioning javascript / cookie / privacy-policy / terms-of-use
  boilerplate (case-insensitive substring)

Document tier (applied to the line-filtered text):
- fail documents with fewer than 5 sentences remaining
- fail documents containing "lorem ipsum" (any case) or a curly brace

The reference bad-word list is deliberately omitted (policy list, not an
operator shape); plug any phrase list into ``BOILERPLATE_PHRASES``.

Plan shape at scale: one projection over one parquet scan of the text
column — every rule is an array/lambda expression, no shuffle, no UDF,
fully codegen'd. The cleaned text itself is emitted as md5 + length so the
wide string never has to survive the aggregate boundary in callers that
only want verdicts; use ``keep_text=True`` to materialize it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from model_audit_spark.functions.text import sentences

__all__ = ["c4_clean_stats", "BOILERPLATE_PHRASES", "TERMINAL_SUFFIXES"]

# C4 drops lines that carry web boilerplate; matched lowercase, substring.
BOILERPLATE_PHRASES = [
    "javascript",
    "cookie",
    "privacy policy",
    "terms of use",
]

# A line survives only when it ends in one of these (C4's "terminal
# punctuation mark, including the end-quotation mark").
TERMINAL_SUFFIXES = ['.', '!', '?', '"', '”']

MIN_LINE_WORDS = 3
MIN_SENTENCES = 5


def _line_kept(x: Column) -> Column:
    ends_ok = F.lit(False)
    for s in TERMINAL_SUFFIXES:
        ends_ok = ends_ok | x.endswith(s)
    lower = F.lower(x)
    boiler = F.lit(False)
    for p in BOILERPLATE_PHRASES:
        boiler = boiler | lower.contains(p)
    n_words = F.size(F.split(x, r"\s+"))
    return ends_ok & (n_words >= MIN_LINE_WORDS) & ~boiler


def c4_clean_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Per-doc C4 cleaning outcome.

    Output: (id, n_lines, n_kept_lines, kept_frac, n_sentences,
    has_lorem_ipsum, has_brace, kept_len, kept_md5, c4_pass
    [, kept_text]). NULL text behaves as empty (repo-wide convention).
    """
    # The line/kept/kept_text producers are lambda-bearing arrays each
    # referenced 3x downstream; Spark's subexpression elimination skips
    # LambdaVariable trees, so the inline form re-split and re-filtered
    # every line up to 9x per row (the watermark-fusion defect,
    # functions/text.with_watermark_signals). Staged as named columns,
    # CollapseProject keeps each computed once per row in one
    # WholeStageCodegen — still one scan, one projection chain.
    clash = [n for n in df.columns if n.startswith("_c4_")]
    if clash:
        raise ValueError(
            "c4_clean_stats: input frame already has reserved "
            f"column(s): {clash}"
        )
    c = F.coalesce(F.col(text_col), F.lit(""))
    staged = (
        df.withColumn(
            "_c4_lines",
            F.filter(
                F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
                lambda x: x != F.lit(""),
            ),
        )
        .withColumn("_c4_kept", F.filter(F.col("_c4_lines"), _line_kept))
        .withColumn("_c4_kt", F.array_join(F.col("_c4_kept"), "\n"))
        .withColumn("_c4_ns", F.size(sentences(F.col("_c4_kt"))))
    )
    lines = F.col("_c4_lines")
    kept = F.col("_c4_kept")
    kept_text = F.col("_c4_kt")
    n_sent = F.col("_c4_ns")
    lower_all = F.lower(c)
    has_lorem = lower_all.contains("lorem ipsum")
    has_brace = c.contains("{")

    cols = [
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.round(
            F.size(kept) / F.greatest(F.size(lines), F.lit(1)), 6
        ).alias("kept_frac"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        F.length(kept_text).alias("kept_len"),
        F.md5(kept_text).alias("kept_md5"),
        (
            (n_sent >= MIN_SENTENCES) & ~has_lorem & ~has_brace
        ).alias("c4_pass"),
    ]
    if keep_text:
        cols.append(kept_text.alias("kept_text"))
    return staged.select(*cols)
