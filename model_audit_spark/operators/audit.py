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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    """llmmap + dli comparison rows for every unordered model pair.

    r13 (guide §2.6): the two method legs are independent end to end
    (llmmap: fingerprint vectors + cosine; dli: behavioral features) —
    submitted as one union plan their stage waves ran leg-after-leg, so
    each leg's pair-row relation is persisted and cache-filled from a
    thread pool; the union then scans caches. Output identical (the
    persisted relations ARE the legs); released by
    persistence.release_all like every tracked relation."""
    from model_audit_spark.persistence import (
        fill_caches_concurrently,
        track,
    )

    fp = fingerprint_vectors(responses, group_col, text_col)
    llmmap = track(
        cosine_compare(fp, group_col).select(
            "model_a", "model_b", F.lit("llmmap").alias("method"),
            "similarity", "is_derived", "threshold", "confidence",
        ).persist()
    )
    dli = track(
        behavior_compare(responses, group_col, text_col).select(
            "model_a", "model_b", F.lit("dli").alias("method"),
            "similarity", "is_derived", "threshold", "confidence",
        ).persist()
    )
    fill_caches_concurrently(
        [llmmap, dli],
        labels=["method_comparisons: llmmap", "method_comparisons: dli"],
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


def style_count_distribution(probe_details: DataFrame) -> DataFrame:
    """A11: Counter of student styles across probes (report.py:548-558).

    (student_style, n, pct) ordered by count desc then style asc (Counter
    .most_common ties resolve first-seen; style asc is the deterministic
    stand-in — both sides of the oracle sort identically)."""
    total = Window.partitionBy()
    return (
        probe_details.groupBy("student_style")
        .agg(F.count("*").alias("n"))
        .select(
            "student_style",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(total) * 100.0, 2
            ).alias("pct"),
        )
        .orderBy(F.desc("n"), F.asc("student_style"))
    )


def claimed_families(
    models: DataFrame, spark: SparkSession, model_col: str = "model_id"
) -> DataFrame:
    """J8: first style family (signature-definition order) whose name is a
    substring of the lowercased model name (engine.py:140-145); NULL when no
    family matches. Broadcast theta-join against the 12-row catalog."""
    from model_audit_spark.catalogs import style_signatures_df

    sigs = style_signatures_df(spark).select("family", "family_rank")
    joined = models.join(
        F.broadcast(sigs),
        F.lower(F.col(model_col)).contains(F.col("family")),
        "left",
    )
    return (
        joined.groupBy(model_col)
        .agg(
            F.expr("min_by(family, family_rank)").alias("claimed_family")
        )
    )


def is_teacher_style(style, teacher) -> Column:
    """report.py:783-788: style ⊆ teacher-name ∨ teacher-name ⊆ style."""
    s = F.lower(style if isinstance(style, Column) else F.col(style))
    t = F.lower(teacher if isinstance(teacher, Column) else F.col(teacher))
    return t.contains(s) | s.contains(t)


# V8 difference-judgment buckets (report.py:735-780). Exact reference
# strings including the markdown bold the renderer relies on.
_BUCKETS = ("**完全一致**", "**高度一致**", "接近", "显著不同")


def _bucket(diff, thresholds) -> F.Column:
    t1, t2, t3 = thresholds
    return (
        F.when(diff < t1, _BUCKETS[0])
        .when(diff < t2, _BUCKETS[1])
        .when(diff < t3, _BUCKETS[2])
        .otherwise(_BUCKETS[3])
    )


def fingerprint_diff_buckets(
    fp: DataFrame, model_a: str, model_b: str, group_col: str = "source"
) -> DataFrame:
    """V8: per-dimension |a−b| plus the reference's judgment bucket.

    Output: (feature, value_a, value_b, diff, judgment) for one model pair,
    one row per fingerprint dimension in catalog order."""
    from model_audit_spark.catalogs import FEATURE_RANGES, FINGERPRINT_DIMS

    a = fp.filter(F.col(group_col) == model_a)
    b = fp.filter(F.col(group_col) == model_b)
    pair = a.crossJoin(
        b.select(*[F.col(d).alias(f"_b_{d}") for d in FINGERPRINT_DIMS])
    )
    rows = []
    for seq, d in enumerate(FINGERPRINT_DIMS):
        diff = F.abs(F.col(d) - F.col(f"_b_{d}"))
        if d in FEATURE_RANGES:
            lo, hi = FEATURE_RANGES[d]
            norm = diff / (hi - lo) if hi > lo else F.lit(0.0)
            judgment = _bucket(norm, (0.02, 0.1, 0.2))
        elif d.startswith("ratio_"):
            judgment = _bucket(diff, (0.01, 0.05, 0.1))
        elif d.startswith("style_"):
            judgment = _bucket(diff, (0.001, 0.003, 0.005))
        else:
            judgment = _bucket(diff, (0.01, 0.05, 0.1))
        rows.append(
            F.struct(
                F.lit(seq).alias("feature_seq"),
                F.lit(d).alias("feature"),
                F.round(F.col(d), 6).alias("value_a"),
                F.round(F.col(f"_b_{d}"), 6).alias("value_b"),
                F.round(diff, 6).alias("diff"),
                judgment.alias("judgment"),
            )
        )
    return pair.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")
