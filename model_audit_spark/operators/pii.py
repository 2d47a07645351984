"""PII detection and redaction over a document corpus.

Training-data pipelines scrub personally-identifiable information before
the corpus ships; this module provides the standard regex tier — emails,
phone numbers, IPv4 addresses — as pure built-in expressions (one scan,
no shuffle, no UDF). An ML-based NER tier (names, addresses) would slot
behind the same output contract as a mapInPandas stage; the regex tier is
the one that must run on every byte at 100 TB, so it stays JVM-side.

Pattern notes: everything is written in the syntax subset shared by Java
regex (Spark) and RE2 (the DuckDB oracle) — no lookaround, no
backreferences — so both engines tokenize identically and the oracle
hash-check is meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "k_anonymity_profile", "pii_scan"]

# Order matters for redaction: emails first (their local part can contain
# digits), then IPv4 (dotted digit runs), then phones (bare digit runs).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
}

_REDACTION = {"email": "[EMAIL]", "ipv4": "[IP]", "phone": "[PHONE]"}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII hit counts + redacted text.

    Output: (id, n_emails, n_phones, n_ipv4, has_pii, redacted). Counts
    are computed on the ORIGINAL text per pattern (independent of
    redaction order); `redacted` applies the replacements in the
    documented order. NULL text behaves as empty.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        k: F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0)))
        for k, p in PII_PATTERNS.items()
    }
    redacted = c
    for k in ("email", "ipv4", "phone"):
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[k], _REDACTION[k]
        )
    return df.select(
        F.col(id_col),
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ipv4"].alias("n_ipv4"),
        (
            (counts["email"] + counts["phone"] + counts["ipv4"]) > 0
        ).alias("has_pii"),
        redacted.alias("redacted"),
    )


def k_anonymity_profile(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity histogram over a quasi-identifier combination: how
    many equivalence classes (distinct quasi-id tuples) exist at each
    group size, and which sit below the k threshold — the release-
    readiness check run before publishing per-group statistics or
    sharing a corpus slice keyed by demographic-ish columns.

    Two stacked aggregations (quasi-tuple counts, then the size
    histogram); the second input is |distinct tuples| rows, so the
    100 TB cost is the first map-side-combining groupBy. Returns
    (group_size, n_groups, n_rows, below_k) — rows in below_k groups
    are the re-identification exposure.
    """
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("group_size"))
    return (
        groups.groupBy("group_size")
        .agg(F.count("*").alias("n_groups"))
        .select(
            "group_size",
            "n_groups",
            (F.col("group_size") * F.col("n_groups")).alias("n_rows"),
            (F.col("group_size") < k).alias("below_k"),
        )
    )


def l_diversity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity histogram — k-anonymity's companion gate: a released
    slice can be k-anonymous yet still leak when every row of an
    equivalence class shares ONE sensitive value. Counts, for each
    diversity level d (distinct sensitive values within a quasi-id
    tuple's class), how many classes and rows sit there; classes below
    the l threshold are the attribute-disclosure exposure.

    Same two-stacked-aggregate shape as k_anonymity_profile: the first
    groupBy (quasi tuple → row count + distinct-sensitive count) is the
    only corpus-sized pass; the histogram aggregates |distinct tuples|
    rows. Returns (diversity, n_groups, n_rows, below_l)."""
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_rows"),
        F.countDistinct(F.col(sensitive_col)).alias("diversity"),
    )
    return (
        groups.groupBy("diversity")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("_rows").cast("long").alias("n_rows"),
        )
        .select(
            "diversity",
            "n_groups",
            "n_rows",
            (F.col("diversity") < l).alias("below_l"),
        )
    )
