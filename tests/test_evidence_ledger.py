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


def _fp(files: dict[str, str], roots):
    """closure_fingerprint over an in-memory file set."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "evidence_ledger", str(REPO / "scripts" / "evidence_ledger.py")
    )
    el = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(el)
    return el.closure_fingerprint(roots, lambda p: files.get(p))


_BASE = {
    "__spark_entry__.py": (
        "from model_audit_spark.operators.alpha import work\n"
        "from model_audit_spark import oracle as ora\n"
        "def _q(spark, sf):\n"
        "    return work(spark, sf)\n"
        "def _other(spark, sf):\n"
        "    return 2\n"
    ),
    "model_audit_spark/operators/alpha.py": (
        "from model_audit_spark.functions.beta import helper\n"
        "CONST = 3\n"
        "def work(spark, sf):\n"
        "    return helper(sf) + CONST\n"
        "def unrelated():\n"
        "    return 9\n"
    ),
    "model_audit_spark/functions/beta.py": (
        "def helper(sf):\n"
        '    """docstring v1"""\n'
        "    return 1\n"
    ),
}
_ROOTS = [("__spark_entry__.py", "_q")]


def test_closure_tracer_follows_imports_and_constants():
    """The unit tracer that decides rotation staleness must change the
    fingerprint for edits anywhere in the TRUE closure (entry fn,
    imported operator, transitively imported helper, a read constant,
    and — the r6 lesson — docstrings), and must NOT change it for
    edits outside the closure (sibling functions at every level)."""
    base = _fp(_BASE, _ROOTS)
    assert base is not None

    def edited(path, old, new):
        files = dict(_BASE)
        assert old in files[path]
        files[path] = files[path].replace(old, new)
        return _fp(files, _ROOTS)

    # in-closure edits: all change the fingerprint
    assert edited("__spark_entry__.py",
                  "return work(spark, sf)",
                  "return work(spark,   sf)") != base
    # ...but a trailing comment after a unit's LAST statement lies
    # outside ast.get_source_segment's span, so it does NOT re-stale —
    # cheap annotations are rotation-free (pinned as a feature)
    assert edited("__spark_entry__.py",
                  "return work(spark, sf)",
                  "return work(spark, sf)  # note") == base
    assert edited("model_audit_spark/operators/alpha.py",
                  "helper(sf) + CONST", "helper(sf) + CONST + 0") != base
    assert edited("model_audit_spark/functions/beta.py",
                  "return 1", "return int(1)") != base
    assert edited("model_audit_spark/operators/alpha.py",
                  "CONST = 3", "CONST = 4") != base
    # docstring-only edit IS a closure change (fingerprints hash source)
    assert edited("model_audit_spark/functions/beta.py",
                  "docstring v1", "docstring v2") != base

    # out-of-closure edits: fingerprint is stable
    assert edited("__spark_entry__.py",
                  "return 2", "return 22") == base
    assert edited("model_audit_spark/operators/alpha.py",
                  "return 9", "return 99") == base


def test_closure_tracer_missing_root_returns_none():
    files = dict(_BASE)
    del files["__spark_entry__.py"]
    assert _fp(files, _ROOTS) is None


def _ledger_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "evidence_ledger", str(REPO / "scripts" / "evidence_ledger.py")
    )
    el = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(el)
    return el


def test_materialized_membership_bit_stales_only_the_edited_query():
    """The _MATERIALIZED_TWINS coupling fix (r7): a query's fingerprint
    carries its own membership BIT, so adding one member to the set
    stales that query alone — hashing the whole set literal re-staled
    every member (measured in r7: one addition would have invalidated
    ~20 certified queries whose SQL never changed)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "evidence_ledger", str(REPO / "scripts" / "evidence_ledger.py")
    )
    el = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(el)

    def entry_text(members):
        lits = ", ".join(f'"{m}"' for m in members)
        return (
            "def _qa(spark, sf):\n    return 1\n"
            "def _qb(spark, sf):\n    return 2\n"
            "_MATERIALIZED_TWINS = {" + lits + "}\n"
        )

    def fp(query, members):
        files = {"__spark_entry__.py": entry_text(members)}
        roots = [
            ("__spark_entry__.py", f"_q{query}"),
            (el.VIRTUAL, f"materialized:q{query}"),
        ]
        return el.closure_fingerprint(roots, lambda p: files.get(p))

    base_a = fp("a", ["qa"])
    # adding ANOTHER query to the set must not move qa's fingerprint...
    assert fp("a", ["qa", "qb"]) == base_a
    # ...but flipping qa's own membership must
    assert fp("a", []) != base_a
    # and qb's fingerprint flips exactly when qb joins
    assert fp("b", ["qa"]) != fp("b", ["qa", "qb"])


def test_affinity_order_groups_memo_chains():
    """--rotate's window ordering must pull memo-chain members adjacent
    (in chain order, at the first member's priority position) while
    leaving standalone queries in priority order."""
    el = _ledger_module()
    window = [
        "community_source_nmi",   # chain member, appears first
        "zipf_slope",             # standalone
        "dedup_communities",      # same chain, earlier in chain order
        "bpe_fertility64",        # bpe chain
        "corpus_stats",           # standalone
        "bpe_merges64",
    ]
    got = el.affinity_order(window)
    assert got == [
        "dedup_communities",      # chain emitted at first-member slot,
        "community_source_nmi",   # in chain order
        "zipf_slope",
        "bpe_merges64",           # bpe chain in chain order
        "bpe_fertility64",
        "corpus_stats",
    ]
    # permutation, nothing dropped or invented
    assert sorted(got) == sorted(window)


def test_affinity_chains_name_real_queries():
    """Every chain member must be a registry query — a typo here would
    silently stop grouping that member."""
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    el = _ledger_module()
    names = set(entry.queries())
    for chain in el.AFFINITY_CHAINS:
        unknown = [q for q in chain if q not in names]
        assert not unknown, f"AFFINITY_CHAINS names unknown queries: {unknown}"


def test_check_window_is_50_registry_names_and_heads_queries():
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    assert len(entry._CHECK_WINDOW) == 50
    assert len(set(entry._CHECK_WINDOW)) == 50
    order = list(entry.queries())
    assert order[:50] == entry._CHECK_WINDOW
    assert len(order) == len(set(order))
