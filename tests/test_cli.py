"""CLI subcommand smoke tests through main(argv) — pipeline surface."""

from __future__ import annotations

import json

from model_audit_spark.cli import main


def test_cli_dedup_writes_keep_list(spark, tmp_path, capsys):
    src = tmp_path / "docs.jsonl"
    rows = [
        {"text": "the quick brown fox jumps over the lazy dog today"},
        {"text": "the quick brown fox jumps over the lazy dog today"},
        {"text": "an entirely different document about spark pipelines"},
    ]
    src.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "keep.json"
    rc = main(["dedup", str(src), "--output", str(out)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "documents: 3" in printed and "kept: 2" in printed
    kept_rows = [
        json.loads(l)
        for p in out.iterdir() if p.name.startswith("part-")
        for l in p.read_text().splitlines()
    ]
    assert sum(1 for r in kept_rows if r["keep"]) == 2


def test_cli_rollup_levels(spark, tmp_path, capsys):
    rc = main(["rollup", "/root/testdata/sf0.001/events.parquet"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "minute" in printed and "hour" in printed and "day" in printed


def test_cli_verify_with_responses_parquet(spark, tmp_path, capsys):
    rows = [
        (
            model, seq, f"p{seq}", "qa",
            "Certainly! Here's a comprehensive breakdown. It's "
            "important to note that 1) first 2) second. Let me know "
            "if you'd like more detail.",
        )
        for seq in range(1, 5)
        for model in ("teacher-gpt-4", "mystery-model")
    ]
    resp = tmp_path / "responses.parquet"
    spark.createDataFrame(
        rows,
        "model_id STRING, probe_seq INT, probe_id STRING, "
        "category STRING, response STRING",
    ).write.parquet(str(resp))
    rc = main(["verify", "teacher-gpt-4", "--responses", str(resp)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "✓ identity verified" in out
    assert "family: gpt" in out
    # responses exist but no family substring in the name -> NOT verified
    rc2 = main(["verify", "mystery-model", "--responses", str(resp)])
    assert rc2 == 1
    assert "NOT verified" in capsys.readouterr().out
    # no responses at all -> reason path on stderr, exit 1
    rc3 = main(["verify", "not-probed", "--responses", str(resp)])
    cap = capsys.readouterr()
    assert rc3 == 1 and "no responses" in cap.err
