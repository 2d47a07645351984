"""Fingerprint method strategies as DataFrame transforms (reference
methods/__init__.py:6 registers llmmap, dli, reef; base.py:9-38 defines the
prepare/get_fingerprint/compare contract).

Spark-first reshaping of that contract:
- fingerprint(responses) -> fingerprint relation (one row per model)
- compare(fingerprints | responses) -> comparison rows (model_a, model_b,
  method, similarity, is_derived, threshold, confidence)
The live-probe step is factored out into probing.ProbeSource — strategies
stay pure relational transforms, so tests inject a responses DataFrame the
same way the reference patches `_call_model_api_once`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from model_audit_spark.operators.dli import (
    behavior_compare,
    behavior_features,
)
from model_audit_spark.operators.fingerprint import (
    cosine_compare,
    fingerprint_vectors,
)
from model_audit_spark.operators.reef import reef_compare
from model_audit_spark.registry import register


@register("llmmap")
class LLMmapMethod:
    """18-dim style-feature vector + min-max-normalized cosine (llmmap.py)."""

    name = "llmmap"
    fingerprint_type = "blackbox"

    def fingerprint(
        self,
        responses: DataFrame,
        group_col: str = "model_id",
        text_col: str = "response",
    ) -> DataFrame:
        return fingerprint_vectors(responses, group_col, text_col)

    def compare(
        self, fingerprints: DataFrame, group_col: str = "model_id"
    ) -> DataFrame:
        return cosine_compare(fingerprints, group_col).withColumn(
            "method", F.lit("llmmap")
        )


@register("dli")
class DLIMethod:
    """Bigram distribution + 8 behavior features; 0.4·JS-sim + 0.6·cosine
    (dli.py:60-140)."""

    name = "dli"
    fingerprint_type = "blackbox"

    def fingerprint(
        self,
        responses: DataFrame,
        group_col: str = "model_id",
        text_col: str = "response",
    ) -> DataFrame:
        return behavior_features(responses, group_col, text_col)

    def compare(
        self,
        responses: DataFrame,
        group_col: str = "model_id",
        text_col: str = "response",
    ) -> DataFrame:
        # DLI similarity needs the bigram distributions, not just the
        # 8-feature rows, so compare() runs from the responses relation
        # (the engine persists it once — reference engine.py:231-245 reuse).
        return behavior_compare(responses, group_col, text_col).withColumn(
            "method", F.lit("dli")
        )


@register("reef")
class REEFMethod:
    """Whitebox per-layer linear CKA (reef.py:37-69, 184-225)."""

    name = "reef"
    fingerprint_type = "whitebox"

    def fingerprint(
        self,
        hidden: DataFrame,
        group_col: str = "model_id",
        text_col: str | None = None,
    ) -> DataFrame:
        return hidden  # the long hidden-states relation IS the fingerprint

    def compare(
        self,
        hidden: DataFrame,
        model_a: str,
        model_b: str,
        group_col: str = "model_id",
    ) -> DataFrame:
        return reef_compare(hidden, model_a, model_b, group_col)
