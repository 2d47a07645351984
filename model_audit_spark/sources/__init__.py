from model_audit_spark.sources.cache import FingerprintCache, cache_key
from model_audit_spark.sources.hidden_states import extract_hidden_states
from model_audit_spark.sources.readers import (
    extract_text,
    read_csv_texts,
    read_json_array,
    read_jsonl,
    read_text_paragraphs,
    read_texts,
)
from model_audit_spark.sources.sinks import write_csv, write_json

__all__ = [
    "FingerprintCache",
    "cache_key",
    "extract_hidden_states",
    "extract_text",
    "read_csv_texts",
    "read_json_array",
    "read_jsonl",
    "read_text_paragraphs",
    "read_texts",
    "write_csv",
    "write_json",
]
