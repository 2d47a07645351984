"""Driver-evidence freshness invariant (r5 verdict task 1).

The driver's correctness gate checks only the FIRST 50 entries of
__spark_entry__.queries(). scripts/evidence_ledger.py computes, per
query, whether its newest green driver row still certifies the CURRENT
code (unit-level dependency fingerprint vs that round's tree). The
standing invariant: every STALE query must sit inside the 50-slot
window, so the next driver run refreshes its evidence. This test runs
the ledger and fails when a code change has silently invalidated an
unwindowed query's evidence — the rotation then has to be updated
BEFORE the round ships, turning the r1-r4 hand-argued rotation into an
automated check.

No Spark session needed; ~20 s of git + AST work.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path("/root/repo")


@pytest.mark.skipif(
    not (REPO / ".git").exists(), reason="needs the git history"
)
def test_every_stale_query_is_inside_the_driver_window():
    proc = subprocess.run(
        [sys.executable, "scripts/evidence_ledger.py"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, (
        "stale queries outside the 50-slot driver window — rotate them "
        "into the first 50 entries of queries():\n" + proc.stdout
    )
