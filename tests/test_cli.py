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
