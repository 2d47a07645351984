"""The LEAKCHECK history-elision clean filter (round-9 task 3): the
blob committed to git must carry per-category counts but never the hit
strings themselves (committing them verbatim is what fed the measured
+50%/round self-quotation cascade, 145 -> 214 hits r7 -> r8). The
working-tree file is untouched by design — only `git add` content is
rewritten. Any surprise input must pass through byte-identical."""

from __future__ import annotations

import importlib.util
import json
import subprocess
from pathlib import Path

REPO = Path("/root/repo")

spec = importlib.util.spec_from_file_location(
    "leak_elide", str(REPO / "scripts" / "leak_elide.py")
)
le = importlib.util.module_from_spec(spec)
spec.loader.exec_module(le)


def test_elides_hit_strings_keeps_counts():
    raw = json.dumps({
        "round": 8,
        "n_hits": 3,
        "hits": {
            "cat-a": ["secret-ish line 1", "secret-ish line 2"],
            "cat-b": ["another"],
            "cat-empty": [],
        },
    })
    out = json.loads(le.elide(raw))
    assert out["round"] == 8 and out["n_hits"] == 3
    assert out["hits"]["cat-empty"] == []
    assert len(out["hits"]["cat-a"]) == 1
    assert "2 hit string(s) elided" in out["hits"]["cat-a"][0]
    assert "1 hit string(s) elided" in out["hits"]["cat-b"][0]
    blob = json.dumps(out)
    assert "secret-ish" not in blob and "another" not in blob


def test_passthrough_on_surprise_input():
    for raw in ("not json {", "[1, 2, 3]", '{"no_hits": 1}',
                '{"hits": "not-a-dict"}', ""):
        assert le.elide(raw) == raw


def test_elide_is_idempotent_preserving_counts():
    # A fresh clone checks out the ELIDED blob (no smudge filter), so
    # the clean filter re-runs over already-elided content at the next
    # `git add`. It must be a fixed point — otherwise every category's
    # recorded count collapses to 1 and the file reads as perpetually
    # modified after clone.
    raw = json.dumps({
        "n_hits": 5,
        "hits": {"cat-a": ["h1", "h2", "h3"], "cat-b": ["h4", "h5"]},
    })
    once = le.elide(raw)
    assert le.elide(once) == once
    d = json.loads(once)
    assert "3 hit string(s) elided" in d["hits"]["cat-a"][0]
    assert "2 hit string(s) elided" in d["hits"]["cat-b"][0]


def test_filter_is_wired():
    # .gitattributes routes LEAKCHECK.json through the filter; the
    # local config defines the clean command. install_filters.sh is
    # idempotent, so the test wires it itself — a fresh clone must be
    # green without manual setup.
    subprocess.run(
        ["bash", "scripts/install_filters.sh"],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    attr = subprocess.run(
        ["git", "check-attr", "filter", "LEAKCHECK.json"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout
    assert "leakelide" in attr
    clean = subprocess.run(
        ["git", "config", "filter.leakelide.clean"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout
    assert "leak_elide.py" in clean
    # end-to-end: the blob hash git computes for the working-tree
    # LEAKCHECK.json under --path (clean filter applied) must equal
    # the hash of elide(content) — proof the wiring actually rewrites
    # `git add` content. No -w: don't litter .git/objects with
    # dangling test blobs.
    if (REPO / "LEAKCHECK.json").exists():
        content = (REPO / "LEAKCHECK.json").read_text()

        def _hash(args: list[str], data: str) -> str:
            return subprocess.run(
                ["git", "hash-object", "--stdin", *args],
                cwd=REPO, capture_output=True, text=True, input=data,
            ).stdout.strip()

        filtered_by_git = _hash(["--path", "LEAKCHECK.json"], content)
        filtered_by_us = _hash([], le.elide(content))
        assert filtered_by_git == filtered_by_us
        d = json.loads(le.elide(content))
        for lst in d.get("hits", {}).values():
            for s in lst:
                assert "elided from git history" in s
