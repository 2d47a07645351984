"""Report renderer parity checklist vs reference tests/test_report.py:131-308.

Every golden substring the reference pins has a twin here: the 6-section
detailed structure, footer, verdict/confidence wording, the per-probe
table with probe ids + category labels + teacher-style bolding, the
feature table with the per-feature difference judgment, the consistency
rate line, the provider display, the basic-report fallback, and the
_judge_difference / _is_teacher_style helper matrices.
"""

from __future__ import annotations

import json

import pytest

from model_audit_spark.engine import AuditEngine, AuditResultData
from model_audit_spark.probing import StaticResponseSource
from model_audit_spark.report import (
    _is_teacher_style,
    _judge_difference,
    generate_report,
)


@pytest.fixture()
def audit_result(spark):
    rows = []
    for seq in range(1, 5):
        for model in ("teacher-gpt-4", "student-model"):
            rows.append(
                (
                    model,
                    seq,
                    f"p{seq}",
                    ["self_awareness", "safety_boundary", "reasoning",
                     "creative"][seq - 1],
                    "Certainly! Here's a comprehensive breakdown. It's "
                    "important to note that 1) first 2) second. Let me "
                    "know if you'd like more detail.",
                )
            )
    responses = spark.createDataFrame(
        rows,
        "model_id STRING, probe_seq INT, probe_id STRING, "
        "category STRING, response STRING",
    )
    eng = AuditEngine(spark, StaticResponseSource(responses))
    return eng.audit("teacher-gpt-4", "student-model")


def test_json_format(audit_result):
    data = json.loads(generate_report(audit_result, fmt="json"))
    assert data["model_a"] == "teacher-gpt-4"
    assert data["model_b"] == "student-model"
    assert data["verdict"]["verdict"] == "likely_derived"


def test_six_sections_and_footer(audit_result):
    md = generate_report(audit_result)
    for header in [
        "## 1. 审计对象",
        "## 2. 审计方法",
        "## 3. 审计结果",
        "## 4. 关键发现",
        "## 5. 结论",
        "## 6. 局限性声明",
    ]:
        assert header in md
    assert "由 model-audit-spark 生成" in md
    assert "可能存在蒸馏关系" in md


def test_probe_table_lists_probe_ids_and_category_labels(audit_result):
    md = generate_report(audit_result)
    # per-probe rows (reference test_probe_table / test_category_labels)
    for pid in ("p1", "p2", "p3", "p4"):
        assert f"| {pid} " in md
    assert "自我认知" in md
    assert "安全边界" in md
    assert "推理测试" in md
    # category dimension table with explanations
    assert "| 自我认知 | 模型身份、创建者 |" in md


def test_style_consistency_rate(audit_result):
    md = generate_report(audit_result)
    assert "风格一致率: 4/4 (100%)" in md


def test_feature_table_has_difference_judgment(audit_result):
    md = generate_report(audit_result)
    assert "| 特征 | 教师 | 学生 | 差异 | 判定 |" in md
    # identical responses -> every feature row judges 完全一致
    assert "**完全一致**" in md
    assert "avg_length_chars" in md


def test_teacher_style_bolded_in_probe_rows(audit_result):
    md = generate_report(audit_result)
    # the gpt-4 style label matches "teacher-gpt-4" -> bolded in the table
    assert "| **gpt-4** " in md


def test_provider_display(audit_result):
    md = generate_report(
        audit_result,
        provider_info={
            "teacher": {"provider": "anthropic"},
            "student": {"provider": "custom", "api_base": "api.moonshot.cn"},
        },
    )
    assert "Anthropic" in md
    assert "api.anthropic.com" in md
    assert "api.moonshot.cn" in md
    assert "| 角色 | 模型 | Provider | API |" in md


def test_confidence_bands(spark, audit_result):
    md = generate_report(audit_result)
    assert "置信度: 高" in md or "置信度: 中" in md or "置信度: 低" in md


def _basic_result(spark, with_comparisons=True):
    comps = spark.createDataFrame(
        [("a", "b", "llmmap", 0.95, True, 0.85, 0.9)]
        if with_comparisons
        else [],
        "model_a STRING, model_b STRING, method STRING, similarity DOUBLE, "
        "is_derived BOOLEAN, threshold DOUBLE, confidence DOUBLE",
    )
    verdict = spark.createDataFrame(
        [(0.95, 1, 1, "likely_derived", 0.9)],
        "avg_similarity DOUBLE, derived_votes INT, total_votes INT, "
        "verdict STRING, confidence DOUBLE",
    )
    empty_details = spark.createDataFrame(
        [],
        "probe_seq INT, probe_id STRING, category STRING, "
        "teacher_style STRING, student_style STRING, is_consistent BOOLEAN",
    )
    cons = spark.createDataFrame(
        [(0, 0, 0.0)], "consistent LONG, total LONG, pct DOUBLE"
    )
    dist = spark.createDataFrame([], "student_style STRING, n LONG, pct DOUBLE")
    return AuditResultData(
        model_a="a",
        model_b="b",
        comparisons=comps,
        verdict=verdict,
        probe_details=empty_details,
        consistency=cons,
        style_distribution=dist,
        fingerprints=None,
    )


def test_basic_report_structure(spark):
    md = generate_report(_basic_result(spark))
    # no numbered 6-section structure (reference
    # test_markdown_without_details_uses_basic)
    assert "## 1. 审计对象" not in md
    assert "# 模型蒸馏审计报告" in md
    assert "判定结果" in md
    # comparison table (reference test_comparison_table)
    assert "llmmap" in md
    assert "0.9500" in md
    assert "派生" in md


def test_basic_report_no_comparisons(spark):
    md = generate_report(_basic_result(spark, with_comparisons=False))
    assert "# 模型蒸馏审计报告" in md


# -- helper matrices (reference TestJudgeDifference / TestIsTeacherStyle) --


def test_judge_difference_length_bands():
    assert "完全一致" in _judge_difference("avg_length_chars", 5)
    assert "高度一致" in _judge_difference("avg_length_chars", 200)
    assert _judge_difference("avg_length_chars", 500) == "接近"
    assert _judge_difference("avg_length_chars", 1000) == "显著不同"


def test_judge_difference_ratio_bands():
    assert "完全一致" in _judge_difference("ratio_has_bullet_points", 0.005)
    assert _judge_difference("ratio_has_bullet_points", 0.2) == "显著不同"


def test_judge_difference_style_bands():
    assert "完全一致" in _judge_difference("style_helpful", 0.0005)
    assert _judge_difference("style_helpful", 0.01) == "显著不同"


def test_judge_difference_default_range():
    assert "完全一致" in _judge_difference("unknown_feature", 0.005)


def test_is_teacher_style_matrix():
    assert _is_teacher_style("claude", "claude-opus") is True
    assert _is_teacher_style("gpt", "gpt-4o") is True
    assert _is_teacher_style("gpt", "claude-opus") is False
    assert _is_teacher_style("Claude", "claude-opus") is True
