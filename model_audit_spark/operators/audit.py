"""Full distillation audit over a responses table (reference engine.py:175-337).

Input is the long `responses(model_id, probe_seq, probe_id, category, response)`
relation (produced by a live probe source or injected in tests, exactly like
the reference mocks `_call_model_api_once`). The audit derives:

1. llmmap comparison — fingerprint aggregate + normalized cosine (J1/A1/V1/V2)
2. dli comparison   — behavior signatures from the SAME responses (the
   reference's common-subexpression reuse, engine.py:231-245): we persist the
   responses DataFrame once and both pipelines read the cached plan.
3. per-probe style consistency (J2+J5+T1, engine.py:267-292): each model's
   response styled independently; is_consistent = same argmax family.
4. verdict vote (A7, engine.py:294-306): likely_derived if majority of methods
   vote derived; independent if avg similarity < 0.5; else inconclusive.
   confidence = min(|avg_sim - 0.85| / 0.15, 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_audit_spark.operators.detect import style_scores
from model_audit_spark.operators.dli import behavior_compare
from model_audit_spark.operators.fingerprint import (
    LLMMAP_CONFIDENCE_K,
    LLMMAP_THRESHOLD,
    cosine_compare,
    fingerprint_vectors,
)


def method_comparisons(
    responses: DataFrame,
    spark: SparkSession,
    group_col: str = "model_id",
    text_col: str = "response",
) -> DataFrame:
    """llmmap + dli comparison rows for every unordered model pair."""
    fp = fingerprint_vectors(responses, group_col, text_col)
    llmmap = cosine_compare(fp, group_col).select(
        "model_a", "model_b", F.lit("llmmap").alias("method"),
        "similarity", "is_derived", "threshold", "confidence",
    )
    dli = behavior_compare(responses, group_col, text_col).select(
        "model_a", "model_b", F.lit("dli").alias("method"),
        "similarity", "is_derived", "threshold", "confidence",
    )
    return llmmap.unionByName(dli)


def probe_style_consistency(
    responses: DataFrame,
    spark: SparkSession,
    teacher: str,
    student: str,
    group_col: str = "model_id",
    text_col: str = "response",
) -> DataFrame:
    """Per-probe teacher/student style agreement (engine.py:267-292).

    Output: (probe_seq, probe_id, category, teacher_style, student_style,
    is_consistent). Empty responses style to 'unknown' like the reference
    (engine.py:280-284 skips scoring for empty strings).
    """
    both = responses.filter(F.col(group_col).isin([teacher, student]))
    keyed = both.select(
        group_col, "probe_seq", "probe_id", "category",
        F.col(text_col).alias("text"),
        F.concat_ws("#", group_col, F.col("probe_seq").cast("string")).alias(
            "pk"
        ),
    )
    nonempty = keyed.filter(F.length(F.coalesce(F.col("text"), F.lit(""))) > 0)
    scored = style_scores(nonempty, spark, "text", "pk")
    best = scored.groupBy("pk").agg(
        F.expr("max_by(family, struct(score, -family_rank))").alias("style")
    )
    styled = keyed.join(best, "pk", "left").withColumn(
        "style", F.coalesce(F.col("style"), F.lit("unknown"))
    )
    t = styled.filter(F.col(group_col) == teacher).select(
        "probe_seq", "probe_id", "category",
        F.col("style").alias("teacher_style"),
    )
    s = styled.filter(F.col(group_col) == student).select(
        "probe_seq", F.col("style").alias("student_style")
    )
    return (
        t.join(s, "probe_seq", "full")
        .withColumn(
            "teacher_style", F.coalesce("teacher_style", F.lit("unknown"))
        )
        .withColumn(
            "student_style", F.coalesce("student_style", F.lit("unknown"))
        )
        .withColumn(
            "is_consistent", F.col("teacher_style") == F.col("student_style")
        )
        .orderBy("probe_seq")
    )


def audit_verdict(comparisons: DataFrame) -> DataFrame:
    """A7: single-row verdict from the method comparison rows."""
    agg = comparisons.agg(
        F.avg("similarity").alias("avg_similarity"),
        F.sum(F.col("is_derived").cast("int")).alias("derived_votes"),
        F.count("*").alias("total_votes"),
    )
    verdict = (
        F.when(
            F.col("derived_votes") > F.col("total_votes") / 2,
            "likely_derived",
        )
        .when(F.col("avg_similarity") < 0.5, "independent")
        .otherwise("inconclusive")
    )
    confidence = F.least(
        F.abs(F.col("avg_similarity") - F.lit(LLMMAP_THRESHOLD))
        / LLMMAP_CONFIDENCE_K,
        F.lit(1.0),
    )
    return agg.select(
        "avg_similarity",
        "derived_votes",
        "total_votes",
        verdict.alias("verdict"),
        F.round(confidence, 4).alias("confidence"),
    )


def consistency_rate(probe_details: DataFrame) -> DataFrame:
    """A9: probes where teacher and student styles agree, count + pct."""
    return probe_details.agg(
        F.sum(F.col("is_consistent").cast("int")).alias("consistent"),
        F.count("*").alias("total"),
        F.round(
            F.sum(F.col("is_consistent").cast("int")) / F.count("*") * 100.0, 0
        ).alias("pct"),
    )
