"""AuditEngine facade — the four reference entry points on Spark relations
(reference engine.py:14-337).

detect / verify / compare / audit with the same method composition as the
reference: llmmap compare + DLI reuse of the SAME responses (persist once —
engine.py:231-245's common-subexpression reuse), per-probe style
consistency, and the multi-method verdict vote. The probe step is a
ProbeSource (probing.py); tests and offline runs inject responses.

Every return value is a DataFrame (or a small dict of DataFrames for
audit) — nothing is collected except by the caller/report renderer, so the
same engine runs a 20-probe audit or a corpus-scale detect unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_audit_spark.operators.audit import (
    audit_verdict,
    consistency_rate,
    probe_style_consistency,
    style_count_distribution,
)
from model_audit_spark.operators.detect import detect as detect_op
from model_audit_spark.operators.detect import style_scores
from model_audit_spark.registry import get_fingerprinter
from model_audit_spark.sources.cache import FingerprintCache


@dataclass
class AuditResultData:
    """AuditResult analog (models.py:43-52): relations, not nested dicts."""

    model_a: str
    model_b: str
    comparisons: DataFrame
    verdict: DataFrame  # 1 row: avg_similarity, votes, verdict, confidence
    probe_details: DataFrame  # per-probe style consistency (J2/A9)
    consistency: DataFrame  # 1 row: consistent, total, pct
    style_distribution: DataFrame  # A11
    fingerprints: DataFrame | None = None
    skipped_methods: list[str] = field(default_factory=list)


class AuditEngine:
    def __init__(
        self,
        spark: SparkSession,
        probe_source=None,
        cache_dir: str | None = None,
        cache_ttl: int = 0,
    ):
        self.spark = spark
        self.probe_source = probe_source
        self.cache = (
            FingerprintCache(spark, cache_dir, ttl=cache_ttl)
            if cache_dir
            else None
        )

    # -- responses ---------------------------------------------------------

    def _responses(self, models: list[str]) -> DataFrame:
        if self.probe_source is None:
            raise ValueError(
                "no probe source configured — pass probe_source= or use the "
                "relation-level operators directly"
            )
        return self.probe_source.probe(self.spark, models)

    # -- the four entry points --------------------------------------------

    def detect(
        self,
        texts: DataFrame,
        text_col: str = "text",
        id_col: str = "text_id",
    ) -> DataFrame:
        """engine.py:165-173 — style-detect each row's source family."""
        return detect_op(texts, self.spark, text_col, id_col)

    def verify(self, model: str) -> DataFrame:
        """engine.py:107-163 — probe the model, style-score the combined
        responses, compare best-match family vs the family claimed in the
        model name. One-row DataFrame."""
        if not model or not model.strip():
            raise ValueError("model name must be non-empty")
        responses = self._responses([model])
        combined = responses.orderBy("probe_seq").agg(
            F.concat_ws("\n", F.collect_list("response")).alias("text")
        ).withColumn("text_id", F.lit(0))
        if combined.filter(F.length("text") > 0).isEmpty():
            return self.spark.createDataFrame(
                [(model, False, "no responses")],
                "model STRING, verified BOOLEAN, reason STRING",
            )
        # 12 score rows — driver-side argmax/claimed logic like the
        # reference (engine.py:128-163); the heavy lifting (scoring the
        # combined text) already ran distributed.
        scored = style_scores(
            combined, self.spark, "text", "text_id"
        ).orderBy("family_rank").collect()
        best = max(scored, key=lambda r: (r.score, -r.family_rank))
        model_lower = model.lower()
        claimed = next(
            (r for r in scored if r.family in model_lower), None
        )
        verified = claimed is not None and claimed.family == best.family
        return self.spark.createDataFrame(
            [
                (
                    model,
                    verified,
                    claimed.family if claimed else "unknown",
                    best.family,
                    round(claimed.score, 4) if claimed else 0.0,
                    round(best.score, 4),
                )
            ],
            "model STRING, verified BOOLEAN, claimed_family STRING, "
            "best_match STRING, claimed_score DOUBLE, best_score DOUBLE",
        )

    def compare(
        self,
        model_a: str,
        model_b: str,
        method: str = "llmmap",
        responses: DataFrame | None = None,
    ) -> DataFrame:
        """engine.py:87-105 — one comparison row for one method."""
        resp = responses if responses is not None else self._responses(
            [model_a, model_b]
        )
        strategy = get_fingerprinter(method)
        if method == "llmmap":
            fp = strategy.fingerprint(resp)
            cmp_ = strategy.compare(fp)
        elif method == "dli":
            cmp_ = strategy.compare(resp)
        else:  # reef: resp is the hidden-states relation
            return strategy.compare(resp, model_a, model_b)
        return cmp_.filter(
            (F.col("model_a") == F.least(F.lit(model_a), F.lit(model_b)))
            & (F.col("model_b") == F.greatest(F.lit(model_a), F.lit(model_b)))
        )

    def audit(
        self,
        teacher: str,
        student: str,
        responses: DataFrame | None = None,
    ) -> AuditResultData:
        """engine.py:175-337 — llmmap + dli + per-probe style + vote."""
        resp = responses if responses is not None else self._responses(
            [teacher, student]
        )
        # Common-subexpression reuse: both methods + the style loop read
        # the SAME responses; persist once (engine.py:231-245).
        resp = resp.persist()
        skipped: list[str] = []

        llmmap = get_fingerprinter("llmmap")
        fp = llmmap.fingerprint(resp)
        comps = llmmap.compare(fp)

        if resp.filter(F.length(F.coalesce("response", F.lit(""))) > 0).isEmpty():
            skipped.append("dli")
        else:
            dli = get_fingerprinter("dli").compare(resp)
            comps = comps.select(
                "model_a", "model_b", "method",
                "similarity", "is_derived", "threshold", "confidence",
            ).unionByName(
                dli.select(
                    "model_a", "model_b", "method",
                    "similarity", "is_derived", "threshold", "confidence",
                )
            )

        details = probe_style_consistency(resp, self.spark, teacher, student)
        return AuditResultData(
            model_a=teacher,
            model_b=student,
            comparisons=comps,
            verdict=audit_verdict(comps),
            probe_details=details,
            consistency=consistency_rate(details),
            style_distribution=style_count_distribution(details),
            fingerprints=fp,
            skipped_methods=skipped,
        )
