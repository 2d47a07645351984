"""MCP stdio adapter tests — in-process JSON-RPC, no network."""

from __future__ import annotations

import io
import json

from model_audit_spark.mcp_server import MCPServer, call_tool, tool_specs


def _call(server, method, params=None, mid=1):
    return server.handle_message(
        {"jsonrpc": "2.0", "id": mid, "method": method,
         "params": params or {}}
    )


def test_initialize_and_tools_list(spark):
    s = MCPServer(spark)
    init = _call(s, "initialize")
    assert init["result"]["serverInfo"]["name"] == "model-audit-spark"
    assert "tools" in init["result"]["capabilities"]
    tools = _call(s, "tools/list")["result"]["tools"]
    names = {t["name"] for t in tools}
    # reference server surface (mcp_server.py:27-226)
    assert names == {
        "detect_text_source",
        "verify_model",
        "compare_models",
        "compare_models_whitebox",
        "audit_distillation",
        "audit_memorization",
        "audit_report",
        "audit_watermark",
    }
    assert all("inputSchema" in t for t in tools)
    # notifications produce no response; unknown methods error
    assert s.handle_message(
        {"jsonrpc": "2.0", "method": "notifications/initialized"}
    ) is None
    assert _call(s, "bogus/method")["error"]["code"] == -32601


def test_detect_and_watermark_tools(spark):
    s = MCPServer(spark)
    resp = _call(
        s, "tools/call",
        {"name": "detect_text_source",
         "arguments": {"texts": ["Hello there.", "I cannot help with that."]}},
    )
    assert resp["result"]["isError"] is False
    rows = json.loads(resp["result"]["content"][0]["text"])
    assert len(rows) == 2
    assert {"text_id", "predicted_model", "confidence"} <= set(rows[0])

    wm = _call(
        s, "tools/call",
        {"name": "audit_watermark", "arguments": {"texts": ["some text"]}},
    )
    assert wm["result"]["isError"] is False
    assert len(json.loads(wm["result"]["content"][0]["text"])) == 1


def test_memorization_and_report_tools(spark):
    s = MCPServer(spark)
    mem = _call(
        s, "tools/call",
        {"name": "audit_memorization",
         "arguments": {
             "text_samples": ["the cat sat on the mat and looked around"],
             "completions": ["the cat sat on the mat and looked around"],
         }},
    )
    rows = json.loads(mem["result"]["content"][0]["text"])
    assert rows[0]["levenshtein_sim"] == 1.0
    assert rows[0]["verbatim_fraction"] == 1.0

    rep = _call(
        s, "tools/call",
        {"name": "audit_report",
         "arguments": {"results": {"detect": "ok"}, "model_name": "m1"}},
    )
    text = rep["result"]["content"][0]["text"]
    assert "# Audit report — m1" in text and "## detect" in text


def test_live_tools_surface_errors_not_crashes(spark):
    """A live-probe failure (here: a loopback server answering 401, so
    the retry matrix fail-fasts with an auth ValueError inside the
    Spark probe stage) must come back as an isError tool result, and
    the server must stay usable. (Until r7 this pinned an ImportError
    from the missing httpx; the stdlib wire fallback means live calls
    now reach a real socket and fail with transport/auth errors
    instead.)"""
    from tests.test_engine import _WireServer

    srv = _WireServer({"/v1/chat/completions": [(401, {})]})
    try:
        s = MCPServer(spark)
        resp = _call(
            s, "tools/call",
            {"name": "verify_model",
             "arguments": {"model": "gpt-x", "api_base": srv.base}},
        )
    finally:
        srv.close()
    assert resp["result"]["isError"] is True
    assert "auth" in resp["result"]["content"][0]["text"].lower()
    # still serving
    assert _call(s, "ping")["result"] == {}


def test_stdio_loop_roundtrip(spark):
    stdin = io.StringIO(
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"})
        + "\n"
        + json.dumps({"jsonrpc": "2.0",
                      "method": "notifications/initialized"})
        + "\nnot-json\n"
        + json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        + "\n"
    )
    stdout = io.StringIO()
    MCPServer(spark).serve(stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert [l["id"] for l in lines] == [1, 2]
    assert lines[1]["result"]["tools"]


def test_call_tool_unknown_name(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown tool"):
        call_tool(spark, "nope", {})
    assert len(tool_specs()) == 8
