"""Markdown audit report (SURVEY.md §2.1 S17; reference report.py:87-205).

Driver-side template over small collected aggregates — the only collect()s
in the audit path, all over ≤ dozens of rows (comparison rows, 18
fingerprint dims, per-probe details). Mirrors the reference's 6-section
structure and verdict/confidence wording; section bodies are trimmed to the
quantitative content (the reference's prose is renderer detail, not
operator semantics).
"""

from __future__ import annotations

from datetime import datetime, timezone

from model_audit_spark.catalogs import FINGERPRINT_DIMS

VERDICT_MAP = {
    "likely_derived": ("⚠️", "可能存在蒸馏关系"),
    "independent": ("✓", "两个模型独立"),
    "inconclusive": ("?", "无法确定"),
}


def _confidence_text(confidence: float) -> str:
    if confidence > 0.7:
        return "高"
    if confidence > 0.4:
        return "中"
    return "低"


def generate_report(result, fmt: str = "markdown") -> str:
    """Render an AuditResultData (engine.audit output) to markdown/JSON."""
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
        lines.append(
            f"风格一致性: {cons.consistent}/{cons.total} "
            f"({cons.pct:.0f}%) 的探测中教师/学生风格一致"
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
            lines.append("| 特征 | 教师 | 学生 |")
            lines.append("|------|------|------|")
            for d in FINGERPRINT_DIMS:
                lines.append(
                    f"| {d} | {fps[result.model_a][d]:.4f} "
                    f"| {fps[result.model_b][d]:.4f} |"
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
