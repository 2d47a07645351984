"""model_audit_spark — a PySpark-native LLM-forensics analytics engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference `liuxiaotong/model-audit` (knowlyr-modelaudit):
statistical model fingerprinting (llmmap / dli / reef / style), text-source
detection, distillation audits — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
a 100 TB corpus needs.

Layering (SURVEY.md §7.1):
  functions/   pure Column-builder expression library (zero UDFs on hot path)
  operators/   DataFrame -> DataFrame transforms (agg/join/topk/similarity)
  sources/     readers, probe sources (mockable), fingerprint cache store
  streaming/   Structured Streaming variants of the batch pipelines
  engine.py    detect/verify/compare/audit facade
"""

__version__ = "0.1.0"

from model_audit_spark.session import get_spark  # noqa: F401
