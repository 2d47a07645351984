#!/bin/sh
# Idempotent local-config wiring for the LEAKCHECK history-elision
# filter (scripts/leak_elide.py). .gitattributes is tracked; the
# filter command itself lives in .git/config, so re-run this after a
# fresh clone. required stays false: a broken filter must degrade to
# committing unfiltered content, never fail the commit.
cd "$(dirname "$0")/.." || exit 1
git config filter.leakelide.clean "python3 scripts/leak_elide.py"
git config filter.leakelide.smudge cat
git config filter.leakelide.required false
echo "leakelide filter wired"
