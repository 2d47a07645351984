"""MCP stdio adapter (reference mcp_server.py:19-516).

Exposes the engine's audit tools over the Model Context Protocol's stdio
transport: newline-delimited JSON-RPC 2.0 on stdin/stdout, implementing
`initialize`, `tools/list`, and `tools/call`. Written against the public
MCP wire format with no SDK dependency (none is available here), so the
server is fully testable in-process via `handle_message`.

Tool surface mirrors the reference server:
- detect_text_source  — style-detect a list of texts (offline)
- audit_watermark     — watermark signals for a list of texts (offline)
- audit_memorization  — verbatim/levenshtein overlap between candidate
                        texts and completions (offline variant: both
                        sides provided; the live prefix-completion path
                        needs a probe transport)
- audit_report        — format a results dict into a markdown report
- verify_model        — probe a live model and check claimed identity
                        (needs httpx + credentials)
- compare_models      — two-model fingerprint comparison (live probes)
- compare_models_whitebox — REEF CKA over local models (needs torch)
- audit_distillation  — full teacher/student audit (live probes)

Live-API tools surface their missing-dependency errors as JSON-RPC tool
errors instead of crashing the server.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "model-audit-spark", "version": "0.2.0"}


def _texts_df(spark: SparkSession, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "text_id INT, text STRING"
    )


def _rows_to_text(df) -> str:
    return json.dumps([r.asDict(recursive=True) for r in df.collect()],
                      ensure_ascii=False, default=str)


def tool_specs() -> list[dict[str, Any]]:
    """tools/list payload — names and schemas match the reference server's
    surface (mcp_server.py:27-226)."""
    text_list = {
        "type": "array",
        "items": {"type": "string"},
        "description": "list of texts",
    }
    return [
        {
            "name": "detect_text_source",
            "description": "Detect which LLM family likely wrote each text",
            "inputSchema": {
                "type": "object",
                "properties": {"texts": text_list},
                "required": ["texts"],
            },
        },
        {
            "name": "audit_watermark",
            "description": "Detect AI watermark signals in texts",
            "inputSchema": {
                "type": "object",
                "properties": {"texts": text_list},
                "required": ["texts"],
            },
        },
        {
            "name": "audit_memorization",
            "description": (
                "Verbatim/levenshtein memorization check between candidate "
                "training texts and model completions"
            ),
            "inputSchema": {
                "type": "object",
                "properties": {
                    "text_samples": text_list,
                    "completions": text_list,
                },
                "required": ["text_samples", "completions"],
            },
        },
        {
            "name": "audit_report",
            "description": "Format audit tool results into a report",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "results": {"type": "object"},
                    "model_name": {"type": "string"},
                },
                "required": ["results", "model_name"],
            },
        },
        {
            "name": "verify_model",
            "description": "Verify a live model's claimed identity",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "model": {"type": "string"},
                    "api_base": {"type": "string"},
                    "api_key": {"type": "string"},
                },
                "required": ["model"],
            },
        },
        {
            "name": "compare_models",
            "description": "Fingerprint similarity between two live models",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "model_a": {"type": "string"},
                    "model_b": {"type": "string"},
                    "method": {
                        "type": "string",
                        "enum": ["llmmap", "dli"],
                    },
                    "api_base": {"type": "string"},
                    "api_key": {"type": "string"},
                },
                "required": ["model_a", "model_b"],
            },
        },
        {
            "name": "compare_models_whitebox",
            "description": "REEF CKA similarity between two local models",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "model_a": {"type": "string"},
                    "model_b": {"type": "string"},
                    "texts": text_list,
                },
                "required": ["model_a", "model_b"],
            },
        },
        {
            "name": "audit_distillation",
            "description": "Full teacher/student distillation audit",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "teacher": {"type": "string"},
                    "student": {"type": "string"},
                    "format": {"type": "string", "enum": ["markdown", "json"]},
                    "api_base": {"type": "string"},
                    "api_key": {"type": "string"},
                },
                "required": ["teacher", "student"],
            },
        },
    ]


def _probe_engine(spark: SparkSession, args: dict[str, Any]):
    from model_audit_spark.engine import AuditEngine
    from model_audit_spark.probing import HTTPProbeSource

    source = HTTPProbeSource(
        api_base=args.get("api_base", "https://api.openai.com"),
        api_key=args.get("api_key", ""),
    )
    return AuditEngine(spark, probe_source=source)


def call_tool(spark: SparkSession, name: str, args: dict[str, Any]) -> str:
    """Dispatch one tools/call; returns the text content payload."""
    if name == "detect_text_source":
        from model_audit_spark.operators.detect import detect

        df = detect(_texts_df(spark, args["texts"]), spark, "text", "text_id")
        return _rows_to_text(
            df.select("text_id", "predicted_model", "confidence")
            .orderBy("text_id")
        )
    if name == "audit_watermark":
        from model_audit_spark.functions.text import with_watermark_signals

        df = _texts_df(spark, args["texts"])
        out = with_watermark_signals(df, "text").drop("text")
        return _rows_to_text(out.orderBy("text_id"))
    if name == "audit_memorization":
        from model_audit_spark.operators.memorization import (
            levenshtein_similarity,
            verbatim_phrase_fraction,
        )

        samples = args["text_samples"]
        completions = args["completions"]
        if len(samples) != len(completions):
            raise ValueError("text_samples and completions must align")
        df = spark.createDataFrame(
            list(zip(range(len(samples)), samples, completions)),
            "pair_id INT, sample STRING, completion STRING",
        )
        lev = df.select(
            "pair_id",
            F.round(
                levenshtein_similarity("sample", "completion"), 6
            ).alias("levenshtein_sim"),
        )
        verb = verbatim_phrase_fraction(
            df, "sample", "completion", "pair_id"
        ).select("pair_id", F.col("score").alias("verbatim_fraction"))
        return _rows_to_text(lev.join(verb, "pair_id").orderBy("pair_id"))
    if name == "audit_report":
        lines = [f"# Audit report — {args['model_name']}", ""]
        for tool, result in sorted(args["results"].items()):
            lines += [f"## {tool}", "", str(result), ""]
        return "\n".join(lines)
    if name == "verify_model":
        return _rows_to_text(
            _probe_engine(spark, args).verify(args["model"])
        )
    if name == "compare_models":
        return _rows_to_text(
            _probe_engine(spark, args).compare(
                args["model_a"], args["model_b"],
                method=args.get("method", "llmmap"),
            )
        )
    if name == "compare_models_whitebox":
        from model_audit_spark.methods import REEFMethod
        from model_audit_spark.sources.hidden_states import (
            extract_hidden_states,
        )

        texts = args.get("texts") or ["The quick brown fox."]
        rows = [
            (m, s, t)
            for m in (args["model_a"], args["model_b"])
            for s, t in enumerate(texts)
        ]
        tdf = spark.createDataFrame(
            rows, "model_id STRING, sample INT, text STRING"
        )
        hidden = extract_hidden_states(tdf)
        return _rows_to_text(
            REEFMethod().compare(hidden, args["model_a"], args["model_b"])
        )
    if name == "audit_distillation":
        from model_audit_spark.report import generate_report

        result = _probe_engine(spark, args).audit(
            args["teacher"], args["student"]
        )
        return generate_report(result, fmt=args.get("format", "markdown"))
    raise ValueError(f"unknown tool: {name}")


class MCPServer:
    """Minimal MCP stdio server: JSON-RPC 2.0, newline-delimited."""

    def __init__(self, spark: SparkSession,
                 dispatch: Callable[..., str] | None = None):
        self.spark = spark
        self.dispatch = dispatch or call_tool

    def handle_message(self, msg: dict[str, Any]) -> dict[str, Any] | None:
        """One request -> one response dict (None for notifications)."""
        mid = msg.get("id")
        method = msg.get("method", "")
        if method.startswith("notifications/"):
            return None
        try:
            if method == "initialize":
                result: dict[str, Any] = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": SERVER_INFO,
                }
            elif method == "tools/list":
                result = {"tools": tool_specs()}
            elif method == "tools/call":
                params = msg.get("params", {})
                text = self.dispatch(
                    self.spark,
                    params.get("name", ""),
                    params.get("arguments", {}) or {},
                )
                result = {
                    "content": [{"type": "text", "text": text}],
                    "isError": False,
                }
            elif method == "ping":
                result = {}
            else:
                return {
                    "jsonrpc": "2.0",
                    "id": mid,
                    "error": {
                        "code": -32601,
                        "message": f"method not found: {method}",
                    },
                }
        except Exception as e:  # noqa: BLE001 — tool errors go to the client
            return {
                "jsonrpc": "2.0",
                "id": mid,
                "result": {
                    "content": [
                        {"type": "text",
                         "text": f"{type(e).__name__}: {e}"}
                    ],
                    "isError": True,
                },
            }
        return {"jsonrpc": "2.0", "id": mid, "result": result}

    def serve(self, stdin=None, stdout=None) -> None:
        """Blocking stdio loop (one JSON-RPC message per line)."""
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            resp = self.handle_message(msg)
            if resp is not None:
                stdout.write(json.dumps(resp, ensure_ascii=False) + "\n")
                stdout.flush()


def main() -> None:
    from model_audit_spark.session import get_spark

    MCPServer(get_spark(app_name="model-audit-mcp")).serve()


if __name__ == "__main__":
    main()
