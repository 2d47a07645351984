"""Corpus snapshot diff (scale extension, no reference counterpart —
the data-versioning primitive every recurring ingest needs: what changed
between yesterday's corpus and today's?).

Shape at scale: each side is projected to (id, md5(text)) — 16 bytes of
content identity per row — before the full-outer join, so the shuffle
carries fixed-width rows regardless of document size. On a bucketed
layout (sources/bucketing.py, bucketBy(id)) both exchanges disappear and
the diff is a zero-shuffle merge. Output is delta-only (added / removed /
changed); unchanged rows — the overwhelming majority of a real snapshot
pair — are filtered before anything downstream materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_snapshot_diff", "snapshot_diff_summary"]


def corpus_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_md5, new_md5) for every id whose content
    differs between snapshots: status ∈ {'added', 'removed', 'changed'}.

    Content identity is md5 over NULL-coalesced text (the repo-wide
    NULL-behaves-as-empty convention), so a NULL→''-text transition is
    NOT reported as a change."""
    o = old.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("old_md5"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("new_md5"),
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
    )
    return (
        j.select(
            F.col(id_col),
            status.alias("status"),
            F.coalesce("old_md5", F.lit("")).alias("old_md5"),
            F.coalesce("new_md5", F.lit("")).alias("new_md5"),
        )
        .filter(F.col("status").isNotNull())
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(status, n): delta counts — the report row a nightly ingest logs."""
    return (
        corpus_snapshot_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )
