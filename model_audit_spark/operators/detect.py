"""Text-source detection (the reference `detect` pipeline, SURVEY.md §3.1).

Spark shape: one projection for per-text flags -> broadcast cross join with the
12-row signature dimension -> pure-expression score (F20) -> one hash
aggregate for argmax (T1). One job, one shuffle.

Semantics mirror reference methods/style.py:241-339:
  score = 0.20 * lang-match (0.10 if signature lang == 'both')
        + 0.50 * min(marker_hits / 3, 1)
        + struct(+0.05 per matching flag the text exhibits, -0.02 mismatch)
        + 0.10 * refusal_hit_ratio (only when the text has a refusal hint)
  rounded to 4 decimals; argmax ties resolve to catalog order (family_rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_audit_spark.catalogs import style_signatures_df
from model_audit_spark.functions.text import style_flag_columns, text_preview


def style_scores(
    df: DataFrame,
    spark: SparkSession,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Long-format (id, family, family_rank, score) — one row per text × family."""
    flags = style_flag_columns(text_col)
    texts = df.select(
        F.col(id_col), *[c.alias(n) for n, c in flags.items()]
    )
    sigs = F.broadcast(style_signatures_df(spark))
    joined = texts.crossJoin(sigs)

    lang_score = (
        F.when(F.col("text_lang") == F.col("lang"), 0.20)
        .when(F.col("lang") == "both", 0.10)
        .otherwise(0.0)
    )
    marker_hits = F.size(
        F.filter(F.col("markers"), lambda m: F.col("text_lower").contains(m))
    )
    marker_score = F.least(marker_hits / 3.0, F.lit(1.0)) * 0.50

    def _struct_term(text_has: str, tends: str):
        return (
            F.when(F.col(text_has) & F.col(tends), 0.05)
            .when(F.col(text_has) & ~F.col(tends), -0.02)
            .otherwise(0.0)
        )

    struct_score = (
        _struct_term("has_md", "tends_markdown")
        + _struct_term("has_numbered", "tends_numbered_lists")
        + _struct_term("has_code_blocks", "tends_code_blocks")
        + _struct_term("is_verbose", "verbose")
    )
    refusal_hits = F.size(
        F.filter(
            F.col("refusal_patterns"), lambda p: F.col("text_lower").contains(p)
        )
    )
    refusal_score = F.when(
        F.col("has_refusal_hint"),
        refusal_hits
        / F.greatest(F.size(F.col("refusal_patterns")), F.lit(1))
        * 0.10,
    ).otherwise(0.0)

    score = F.round(lang_score + marker_score + struct_score + refusal_score, 4)
    return joined.select(
        F.col(id_col), "family", "family_rank", score.alias("score")
    )


def detection_columns(text_col: str = "text") -> dict[str, "F.Column"]:
    """Per-ROW detection: the 12 family scores as literal-parameterized
    expressions + argmax via array_max over (score, -rank, family) structs.

    No cross join, no aggregate, no shuffle — a pure projection, so it runs
    identically in batch and Structured Streaming and keeps whole-stage
    codegen. Semantics match style_scores/detect exactly (same formula,
    same catalog-order tie-break)."""
    from model_audit_spark.catalogs import STYLE_SIGNATURES

    flags = style_flag_columns(text_col)
    lower = flags["text_lower"]
    lang = flags["text_lang"]

    entries = []
    for rank, (fam, markers, refusals, md, num, code, verb, sig_lang) in (
        enumerate(STYLE_SIGNATURES)
    ):
        lang_score = (
            F.when(lang == sig_lang, 0.20)
            .when(F.lit(sig_lang) == "both", 0.10)
            .otherwise(0.0)
        )
        marker_hits = sum(
            (lower.contains(m).cast("int") for m in markers), F.lit(0)
        )
        marker_score = F.least(marker_hits / 3.0, F.lit(1.0)) * 0.50

        def _term(has, tends: bool):
            if tends:
                return F.when(has, 0.05).otherwise(0.0)
            return F.when(has, -0.02).otherwise(0.0)

        struct_score = (
            _term(flags["has_md"], md)
            + _term(flags["has_numbered"], num)
            + _term(flags["has_code_blocks"], code)
            + _term(flags["is_verbose"], verb)
        )
        refusal_hits = sum(
            (lower.contains(p).cast("int") for p in refusals), F.lit(0)
        )
        refusal_score = F.when(
            flags["has_refusal_hint"],
            refusal_hits / max(len(refusals), 1) * 0.10,
        ).otherwise(0.0)
        score = F.round(
            lang_score + marker_score + struct_score + refusal_score, 4
        )
        entries.append(
            F.struct(
                score.alias("score"),
                F.lit(-rank).alias("neg_rank"),
                F.lit(fam).alias("family"),
            )
        )
    best = F.array_max(F.array(*entries))
    return {
        "predicted_model": best["family"],
        "confidence": best["score"],
    }


def detect(
    df: DataFrame,
    spark: SparkSession,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_scores_map: bool = False,
) -> DataFrame:
    """Per-text detection result: (id, text_preview, predicted_model, confidence).

    Argmax tie-break = catalog definition order. Default path is the
    zero-shuffle per-row expression (detection_columns); the scores-map
    variant keeps the long-format aggregate since it must materialize all
    12 scores anyway."""
    if with_scores_map:
        scored = style_scores(df, spark, text_col, id_col)
        out = scored.groupBy(id_col).agg(
            F.expr("max_by(family, struct(score, -family_rank))").alias(
                "predicted_model"
            ),
            F.max("score").alias("confidence"),
            F.map_from_entries(
                F.collect_list(F.struct("family", "score"))
            ).alias("scores"),
        )
        previews = df.select(
            F.col(id_col), text_preview(text_col).alias("text_preview")
        )
        return out.join(previews, id_col)
    cols = detection_columns(text_col)
    return df.select(
        F.col(id_col),
        text_preview(text_col).alias("text_preview"),
        cols["predicted_model"].alias("predicted_model"),
        cols["confidence"].alias("confidence"),
    )


def detection_distribution(detections: DataFrame) -> DataFrame:
    """Source distribution (A5): counts + percentage per predicted family."""
    from pyspark.sql import Window

    total = F.sum("n_texts").over(Window.partitionBy())
    return (
        detections.groupBy("predicted_model")
        .agg(F.count("*").alias("n_texts"))
        .select(
            "predicted_model",
            "n_texts",
            F.round(F.col("n_texts") / total * 100.0, 2).alias("pct"),
        )
        .orderBy(F.desc("n_texts"), "predicted_model")
    )


def evaluate_accuracy(pred_df: DataFrame) -> DataFrame:
    """Accuracy evaluation (A6, reference benchmark.py:264-300).

    Input: (predicted_model, label). Output: one row with overall accuracy +
    per-class accuracy map.
    """
    per_class = (
        pred_df.groupBy("label")
        .agg(
            F.count("*").alias("class_total"),
            F.sum((F.col("predicted_model") == F.col("label")).cast("int")).alias(
                "class_correct"
            ),
        )
        .select(
            "label",
            "class_total",
            "class_correct",
            (F.col("class_correct") / F.col("class_total")).alias("class_accuracy"),
        )
    )
    overall = per_class.agg(
        F.sum("class_total").alias("total"),
        F.sum("class_correct").alias("correct"),
        (F.sum("class_correct") / F.sum("class_total")).alias("accuracy"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("label", "class_accuracy")))
        ).alias("per_class"),
    )
    return overall
