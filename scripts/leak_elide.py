#!/usr/bin/env python
"""Git clean filter for LEAKCHECK.json (round-9 verdict task 3).

The per-round scanner writes LEAKCHECK.json quoting every hit line
verbatim — including GITLOG hits that are themselves quotes of earlier
hit lists. The file is then committed, so each round's diff re-inserts
the quoted strings into `git log -p`, which the next scan re-matches:
a self-quotation cascade measured at ~+50%/round (145 -> 214 hits
between r7 and r8) carrying zero new information — 208 of r8's 214
hits were echoes of prior hit lists.

This filter elides the hit STRINGS from the blob stored in git
history, keeping the per-category counts. The working-tree file (what
the judge and humans read) is untouched — a git clean filter only
rewrites content at `git add` time. On ANY parse/shape surprise the
input passes through byte-identical: a commit must never break or
silently lose data because of this hygiene layer.

Wiring (idempotent, done by scripts/install_filters.sh or manually):
    .gitattributes:  LEAKCHECK.json filter=leakelide
    git config filter.leakelide.clean "python3 scripts/leak_elide.py"
`filter.leakelide.required` stays false, so a missing interpreter or
a crash degrades to committing the unfiltered content, never an error.

Idempotency: a fresh clone checks out the ELIDED blob (no smudge
filter), so the clean filter re-runs over already-elided content on
the next `git add`. Elided placeholder lists pass through UNCHANGED —
otherwise every category's recorded count would collapse to 1 and the
file would read as perpetually modified after clone.
"""

from __future__ import annotations

import json
import sys

_MARKER = " hit string(s) elided from git history "


def elide(raw: str) -> str:
    try:
        d = json.loads(raw)
        hits = d.get("hits")
        if not isinstance(hits, dict):
            return raw
        for cat, lst in hits.items():
            if not (isinstance(lst, list) and lst):
                continue
            if (
                len(lst) == 1
                and isinstance(lst[0], str)
                and _MARKER in lst[0]
            ):
                continue  # already elided — keep the original count
            hits[cat] = [
                f"<{len(lst)}{_MARKER}to damp the self-quotation "
                f"cascade; see the working-tree LEAKCHECK.json>"
            ]
        return json.dumps(d, indent=1) + "\n"
    except Exception:
        return raw


if __name__ == "__main__":
    sys.stdout.write(elide(sys.stdin.read()))
