"""Markdown audit report (SURVEY.md §2.1 S17; reference report.py:33-788).

Driver-side template over small collected aggregates — the only collect()s
in the audit path, all over ≤ dozens of rows (comparison rows, 18
fingerprint dims, per-probe details). Mirrors the reference's renderer
surface: detailed 6-section report when fingerprints exist, basic report
otherwise (reference report.py:98-105), the per-probe style table with
teacher-style bolding (report.py:360-397), the per-feature difference
judgment with per-feature normalization ranges (report.py:735-781), the
category label/explanation dimension table (report.py:42-71), and the
provider display row (report.py:73-80, 216-228).
"""

from __future__ import annotations

from datetime import datetime, timezone

from model_audit_spark.catalogs import FINGERPRINT_DIMS

VERDICT_MAP = {
    "likely_derived": ("⚠️", "可能存在蒸馏关系"),
    "independent": ("✓", "两个模型独立"),
    "inconclusive": ("?", "无法确定"),
}

# Per-feature normalization ranges for the difference judgment
# (reference report.py:33-39 — catalog data, same provenance note as
# catalogs.py: these constants ARE the spec the report twin mirrors).
_FEATURE_RANGES: dict[str, tuple[float, float]] = {
    "avg_length_chars": (50, 3000),
    "avg_length_words": (10, 500),
    "avg_length_sentences": (1, 20),
    "avg_avg_word_length": (3, 8),
    "avg_avg_sentence_length": (5, 40),
}

# Probe dimension display names / explanations (reference report.py:42-71).
_CATEGORY_LABELS: dict[str, str] = {
    "self_awareness": "自我认知",
    "safety_boundary": "安全边界",
    "injection": "注入测试",
    "knowledge": "知识立场",
    "reasoning": "推理测试",
    "style": "风格测试",
    "creative": "创意写作",
    "multilingual": "多语言",
    "format": "格式控制",
    "roleplay": "角色扮演",
    "code": "代码生成",
    "summarization": "摘要能力",
}

_CATEGORY_EXPLANATIONS: dict[str, str] = {
    "self_awareness": "模型身份、创建者",
    "safety_boundary": "拒绝策略、措辞差异",
    "injection": "Prompt injection 响应",
    "knowledge": "知识立场",
    "reasoning": "逻辑推理、伦理判断",
    "style": "风格差异",
    "creative": "叙事风格、类比能力",
    "multilingual": "中文响应、多语翻译",
    "format": "JSON 输出、Markdown 表格",
    "roleplay": "角色一致性",
    "code": "编码风格",
    "summarization": "信息压缩",
}

# Provider display names / default API hosts (reference report.py:73-80).
_PROVIDER_LABELS: dict[str, str] = {
    "openai": "OpenAI",
    "anthropic": "Anthropic",
    "custom": "Custom API",
}

_PROVIDER_APIS: dict[str, str] = {
    "openai": "api.openai.com",
    "anthropic": "api.anthropic.com",
}


def _confidence_text(confidence: float) -> str:
    if confidence > 0.7:
        return "高"
    if confidence > 0.4:
        return "中"
    return "低"


def _judge_difference(key: str, diff: float) -> str:
    """Per-feature difference judgment (reference report.py:735-781):
    numeric features normalize by their catalog range; ratio_ features
    judge on the raw 0-1 difference; style_ features use the tight
    marker-rate bands; everything else falls back to the 0-1 bands."""
    if key in _FEATURE_RANGES:
        lo, hi = _FEATURE_RANGES[key]
        norm = diff / (hi - lo) if hi > lo else 0
        if norm < 0.02:
            return "**完全一致**"
        if norm < 0.1:
            return "**高度一致**"
        if norm < 0.2:
            return "接近"
        return "显著不同"
    if key.startswith("ratio_"):
        bands = (0.01, 0.05, 0.1)
    elif key.startswith("style_"):
        bands = (0.001, 0.003, 0.005)
    else:
        bands = (0.01, 0.05, 0.1)
    if diff < bands[0]:
        return "**完全一致**"
    if diff < bands[1]:
        return "**高度一致**"
    if diff < bands[2]:
        return "接近"
    return "显著不同"


def _is_teacher_style(style: str, teacher_name: str) -> bool:
    """Bidirectional case-insensitive substring match between a style
    label and the teacher model name (reference report.py:783-788)."""
    style_lower = style.lower()
    teacher_lower = teacher_name.lower()
    return style_lower in teacher_lower or teacher_lower in style_lower


def generate_report(
    result, fmt: str = "markdown", provider_info: dict | None = None
) -> str:
    """Render an AuditResultData (engine.audit output) to markdown/JSON.

    provider_info (optional): {"teacher": {"provider": ..., "api_base":
    ...}, "student": {...}} — rendered into the audit-subject table like
    the reference's details display (report.py:216-228).

    Markdown picks the detailed 6-section report when fingerprint data
    exists, else the basic report (reference report.py:98-105)."""
    if fmt == "json":
        import json

        verdict = result.verdict.first().asDict()
        comps = [r.asDict() for r in result.comparisons.collect()]
        return json.dumps(
            {
                "model_a": result.model_a,
                "model_b": result.model_b,
                "verdict": verdict,
                "comparisons": comps,
                "skipped_methods": result.skipped_methods,
            },
            ensure_ascii=False,
            indent=2,
            default=str,
        )
    if result.fingerprints is not None:
        return _generate_detailed_report(result, provider_info)
    return _generate_basic_report(result)


def _provider_cols(info: dict | None) -> str:
    if not info:
        return ""
    provider = info.get("provider", "openai")
    api = info.get("api_base", "") or _PROVIDER_APIS.get(provider, "")
    return f" {_PROVIDER_LABELS.get(provider, provider)} | {api} |"


def _generate_detailed_report(result, provider_info: dict | None) -> str:
    v = result.verdict.first()
    comps = result.comparisons.orderBy("method").collect()
    details = result.probe_details.orderBy("probe_seq").collect()
    cons = result.consistency.first()
    dist = result.style_distribution.collect()
    icon, verdict_text = VERDICT_MAP.get(v.verdict, ("", v.verdict))
    now = datetime.now(timezone.utc).strftime("%Y-%m-%d")
    total = len(details)

    lines: list[str] = []
    lines.append(
        f"# 模型蒸馏审计报告：{result.model_b} vs {result.model_a}"
    )
    lines.append("")
    lines.append(f"**审计时间**: {now}")
    lines.append("**审计工具**: model-audit-spark")
    lines.append("**审计方法**: LLMmap 黑盒指纹 + DLI 行为签名 + 风格分析")
    lines.append("")
    lines.append("---")
    lines.append("")

    lines.append("## 1. 审计对象")
    lines.append("")
    if provider_info:
        lines.append("| 角色 | 模型 | Provider | API |")
        lines.append("|------|------|----------|-----|")
        lines.append(
            f"| 被审计模型 | **{result.model_b}** |"
            + _provider_cols(provider_info.get("student"))
        )
        lines.append(
            f"| 参考模型 | **{result.model_a}** |"
            + _provider_cols(provider_info.get("teacher"))
        )
    else:
        lines.append(f"- 教师模型: {result.model_a}")
        lines.append(f"- 学生模型: {result.model_b}")
    lines.append("")

    lines.append("## 2. 审计方法")
    lines.append("")
    lines.append(f"- 行为探测数: {total}")
    for c in comps:
        lines.append(
            f"- {c.method}: 阈值 {c.threshold}, 相似度判定 sim ≥ 阈值"
        )
    lines.append("")
    cats_seen: list[str] = []
    for d in details:
        if d.category not in cats_seen:
            cats_seen.append(d.category)
    if cats_seen:
        lines.append("探测维度：")
        lines.append("")
        lines.append("| 维度 | 说明 |")
        lines.append("|------|------|")
        for cat in cats_seen:
            label = _CATEGORY_LABELS.get(cat, cat)
            expl = _CATEGORY_EXPLANATIONS.get(cat, "")
            lines.append(f"| {label} | {expl} |")
        lines.append("")

    lines.append("## 3. 审计结果")
    lines.append("")
    lines.append("| 方法 | 相似度 | 阈值 | 判定 | 置信度 |")
    lines.append("|------|--------|------|------|--------|")
    for c in comps:
        mark = "⚠️ 超过阈值" if c.is_derived else "低于阈值"
        lines.append(
            f"| {c.method} | {c.similarity:.4f} | {c.threshold} "
            f"| {mark} | {c.confidence:.4f} |"
        )
    lines.append("")
    if total:
        lines.append("### 逐条探测结果")
        lines.append("")
        lines.append(
            f"| # | 探测维度 | Probe ID | {result.model_b} 风格匹配 "
            f"| {result.model_a} 风格匹配 | 一致 |"
        )
        lines.append(
            "|---|---------|----------|--------------|----------------|------|"
        )
        for i, d in enumerate(details):
            cat_label = _CATEGORY_LABELS.get(d.category, d.category)
            s_style, t_style = d.student_style, d.teacher_style
            s_disp = (
                f"**{s_style}**"
                if _is_teacher_style(s_style, result.model_a)
                else s_style
            )
            t_disp = (
                f"**{t_style}**"
                if _is_teacher_style(t_style, result.model_a)
                else t_style
            )
            mark = "✓" if d.is_consistent else ""
            lines.append(
                f"| {i + 1} | {cat_label} | {d.probe_id} "
                f"| {s_disp} | {t_disp} | {mark} |"
            )
        lines.append("")
        lines.append(
            f"**风格一致率: {cons.consistent}/{cons.total} "
            f"({cons.pct:.0f}%)** 的探测中教师/学生风格一致"
        )
        lines.append("")

    lines.append("## 4. 关键发现")
    lines.append("")
    if result.fingerprints is not None:
        fps = {
            r[0]: r
            for r in result.fingerprints.orderBy(
                result.fingerprints.columns[0]
            ).collect()
        }
        if result.model_a in fps and result.model_b in fps:
            lines.append("| 特征 | 教师 | 学生 | 差异 | 判定 |")
            lines.append("|------|------|------|------|------|")
            for d in FINGERPRINT_DIMS:
                ta, tb = fps[result.model_a][d], fps[result.model_b][d]
                diff = abs(ta - tb)
                lines.append(
                    f"| {d} | {ta:.4f} | {tb:.4f} | {diff:.4f} "
                    f"| {_judge_difference(d, diff)} |"
                )
            lines.append("")
    if dist:
        lines.append(f"{result.model_b} 的风格分布：")
        lines.append("")
        lines.append("| 风格 | 出现次数 | 占比 |")
        lines.append("|------|---------|------|")
        for r in dist:
            lines.append(f"| {r.student_style} | {r.n} | {r.pct:.0f}% |")
        lines.append("")

    lines.append("## 5. 结论")
    lines.append("")
    lines.append(
        f"{icon} **{verdict_text}** "
        f"(平均相似度 {v.avg_similarity:.4f}, "
        f"{v.derived_votes}/{v.total_votes} 方法判定为派生, "
        f"置信度: {_confidence_text(v.confidence)})"
    )
    lines.append("")
    if result.skipped_methods:
        lines.append(
            "> **注意**: 以下方法被跳过: "
            + ", ".join(result.skipped_methods)
        )
        lines.append("")

    lines.append("## 6. 局限性声明")
    lines.append("")
    lines.append(
        f"- 基于 {total} 个行为探测的统计推断，不构成法律意义上的证明。"
    )
    lines.append("- 黑盒指纹对提示工程和采样温度敏感。")
    lines.append("")
    lines.append("---")
    lines.append("")
    lines.append("由 model-audit-spark 生成")
    lines.append("")
    return "\n".join(lines)


def _generate_basic_report(result) -> str:
    """Unnumbered short report for results without fingerprint data
    (reference report.py:666-731)."""
    v = result.verdict.first()
    comps = result.comparisons.orderBy("method").collect()
    icon, verdict_text = VERDICT_MAP.get(v.verdict, ("", v.verdict))
    now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")

    lines = [
        "# 模型蒸馏审计报告",
        "",
        "**审计工具**: model-audit-spark",
        f"**生成时间**: {now}",
        "",
        "## 审计对象",
        "",
        "| 角色 | 模型 |",
        "|------|------|",
        f"| 教师模型 (Teacher) | {result.model_a} |",
        f"| 学生模型 (Student) | {result.model_b} |",
        "",
        "## 判定结果",
        "",
        f"**{icon} {verdict_text}**",
        "",
        f"- 置信度: {v.confidence:.2%}",
        "",
    ]
    if comps:
        lines.extend(
            [
                "## 指纹比对详情",
                "",
                "| 方法 | 相似度 | 阈值 | 判定 |",
                "|------|--------|------|------|",
            ]
        )
        for c in comps:
            derived_text = "派生" if c.is_derived else "独立"
            lines.append(
                f"| {c.method} | {c.similarity:.4f} "
                f"| {c.threshold} | {derived_text} |"
            )
        lines.append("")
    lines.extend(
        [
            "## 说明",
            "",
            "- **相似度 > 0.85**: 两个模型的行为模式高度相似，可能存在蒸馏关系",
            "- **相似度 0.5-0.85**: 部分相似，可能共享训练数据或架构",
            "- **相似度 < 0.5**: 两个模型行为差异较大，可能是独立模型",
            "",
            "---",
            "",
            "由 model-audit-spark 生成",
        ]
    )
    return "\n".join(lines)
