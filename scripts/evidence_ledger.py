#!/usr/bin/env python
"""Driver-evidence freshness ledger (round-5 verdict task 1).

For every query in __spark_entry__.queries(), answers: "does the NEWEST
green driver row still certify the CURRENT code?" A query is STALE when
code in its dependency closure changed after the round that produced its
newest green CORRECTNESS_r0N.json row — its driver evidence predates the
code it would run today. Stale queries must rotate into the next round's
50-slot check window (the driver checks only the first 50 entries of
queries()).

Dependency closure — UNIT-level (function / class / top-level constant),
traced across modules through import bindings:

- roots: the query's entry function in __spark_entry__.py and its oracle
  twin (`ora.<fn>`) in model_audit_spark/oracle.py;
- from each unit, every referenced name that resolves to (a) another
  unit in the same file, (b) a `from model_audit_spark.x import y`
  binding (top-level or in-body) → unit `y` of module x, or (c) an
  attribute access `m.y` where `m` is a bound package module → unit `y`
  of that module — is followed, to a fixpoint.

Unit granularity (not file) is the point: the r4 ledger prototype used
file-level closure and flagged 111/142 queries stale because ANY edit to
a shared module (e.g. adding one new operator to dedup.py) invalidated
every query importing it. Unit tracing only flags queries whose actually
executed code (or a constant it reads) changed. Limitations, accepted
and documented: references that resolve to nothing trackable (dynamic
getattr, names injected by decorators) are ignored — under-approximation
is possible in principle, but the package has no star imports and the
operators are plain module-level defs.

The closure fingerprint is sha256 over sorted (path:unit, source
segment). Historic fingerprints come from `git show <round-commit>:` of
each involved file, where <round-commit> is the commit that added
CORRECTNESS_r0N.json (the driver commits evidence on top of the round's
final tree); units are re-resolved per historic tree, so a unit that
moved between files is followed correctly.

Output: EVIDENCE_LEDGER.json + a human summary; exit 1 if any STALE
query is NOT in the first-50 window (the pre-driver invariant: every
stale query must be windowed so the next driver run refreshes it).
The invariant is deposit-stable (r6): a window is also accepted when
it is priority-correct under the evidence state with the newest
CORRECTNESS file removed — the state it was built for — so pytest is
green both before and after the driver deposits a round's evidence.

Usage: python scripts/evidence_ledger.py [--json-only]
"""

from __future__ import annotations

import ast
import functools
import hashlib
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path("/root/repo")
sys.path.insert(0, str(REPO))

PKG = "model_audit_spark"
ENTRY = "__spark_entry__.py"
ORACLE = f"{PKG}/oracle.py"


# ---------------------------------------------------------------- git layer

def round_commits() -> dict[int, str]:
    out = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", p.name).group(1))
        commits = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", p.name],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.split()
        if commits:
            out[n] = commits[-1]
    return out


def green_rounds() -> dict[str, list[int]]:
    g: dict[str, list[int]] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", p.name).group(1))
        for q, row in json.loads(p.read_text()).items():
            if (row.get("hash_match") and row.get("rows_match")
                    and not row.get("err")):
                g.setdefault(q, []).append(n)
    return g


@functools.lru_cache(maxsize=8192)
def git_show(commit: str, path: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{commit}:{path}"],
        cwd=REPO, capture_output=True, text=True,
    )
    return r.stdout if r.returncode == 0 else None


# ------------------------------------------------------------- parse layer

class Unit:
    __slots__ = ("segment", "names", "attrs", "imports")

    def __init__(self, segment, names, attrs, imports):
        self.segment = segment      # source text
        self.names = names          # referenced bare names
        self.attrs = attrs          # {(base_name, attr)}
        self.imports = imports      # {bound: (module, orig|None)}


def _imports_in(node) -> dict[str, tuple[str, str | None]]:
    out: dict[str, tuple[str, str | None]] = {}
    for n in ast.walk(node):
        if isinstance(n, ast.ImportFrom) and n.module:
            for a in n.names:
                out[a.asname or a.name] = (n.module, a.name)
        elif isinstance(n, ast.Import):
            for a in n.names:
                out[a.asname or a.name] = (a.name, None)
    return out


class PySource:
    """Unit-granular view of one python file: top-level functions,
    classes, and simple constant assignments, each with the names /
    attribute accesses / import bindings it references."""

    def __init__(self, text: str):
        self.text = text
        tree = ast.parse(text)
        self.units: dict[str, Unit] = {}
        self.top_imports = _imports_in(
            ast.Module(
                body=[n for n in tree.body
                      if isinstance(n, (ast.Import, ast.ImportFrom))],
                type_ignores=[],
            )
        )
        for node in tree.body:
            names = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [t.id for t in node.targets
                         if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(
                    node.target, ast.Name):
                names = [node.target.id]
            if not names:
                continue
            seg = ast.get_source_segment(text, node) or ""
            refs = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
            attrs = {
                (n.value.id, n.attr)
                for n in ast.walk(node)
                if isinstance(n, ast.Attribute)
                and isinstance(n.value, ast.Name)
            }
            imps = _imports_in(node)
            u = Unit(seg, refs, attrs, imps)
            for nm in names:
                self.units[nm] = u


_TEXTS: dict[str, str] = {}


@functools.lru_cache(maxsize=256)
def _parse(key: str) -> PySource:
    return PySource(_TEXTS[key])


def parse_cached(text: str) -> PySource:
    k = hashlib.sha256(text.encode()).hexdigest()
    _TEXTS[k] = text
    return _parse(k)


# ----------------------------------------------------------- closure layer

def module_paths(mod: str) -> list[str]:
    p = mod.replace(".", "/")
    return [f"{p}.py", f"{p}/__init__.py"]


VIRTUAL = "__virtual__"


def _materialized_members(file_text) -> frozenset[str]:
    """The _MATERIALIZED_TWINS membership at one tree state."""
    t = file_text(ENTRY)
    if t is None:
        return frozenset()
    try:
        tree = ast.parse(t)
    except SyntaxError:
        return frozenset()
    out: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            isinstance(tg, ast.Name) and tg.id == "_MATERIALIZED_TWINS"
            for tg in node.targets
        ):
            for c in ast.walk(node.value):
                if isinstance(c, ast.Constant) and isinstance(c.value, str):
                    out.add(c.value)
    return frozenset(out)


def closure_fingerprint(
    roots: list[tuple[str, str]], file_text
) -> str | None:
    """sha256 over the unit closure's sources at one tree state.
    `roots`: [(path, unit_name)]. Returns None when a root is missing
    (tree predates the query).

    A (VIRTUAL, "materialized:<q>") root contributes the query's
    _MATERIALIZED_TWINS MEMBERSHIP bit instead of a source unit: adding
    or removing ONE member must stale only that query, not every other
    member (hashing the whole set literal did exactly that — adding
    contrastive_triplets in r7 would have re-staled ~20 certified
    queries whose SQL never changed)."""
    virtual = [(p, n) for p, n in roots if p == VIRTUAL]
    roots = [r for r in roots if r[0] != VIRTUAL]
    sources: dict[str, PySource | None] = {}

    def src_of(path: str) -> PySource | None:
        if path not in sources:
            t = file_text(path)
            try:
                sources[path] = parse_cached(t) if t is not None else None
            except SyntaxError:
                sources[path] = None
        return sources[path]

    def resolve_module(mod: str) -> str | None:
        for cand in module_paths(mod):
            if src_of(cand) is not None:
                return cand
        return None

    seen: set[tuple[str, str]] = set()
    parts: dict[str, str] = {}
    todo = list(roots)
    for path, name in roots:
        s = src_of(path)
        if s is None or name not in s.units:
            return None
    while todo:
        path, name = todo.pop()
        if (path, name) in seen:
            continue
        seen.add((path, name))
        s = src_of(path)
        if s is None or name not in s.units:
            continue
        u = s.units[name]
        parts[f"{path}:{name}"] = u.segment

        def binding(nm: str):
            return u.imports.get(nm) or s.top_imports.get(nm)

        for nm in u.names:
            if nm in s.units:
                todo.append((path, nm))
                continue
            b = binding(nm)
            if b and b[0].startswith(PKG) and b[1]:
                # `from pkg.mod import orig` — orig may itself be a
                # submodule (`from model_audit_spark import oracle`)
                sub = resolve_module(f"{b[0]}.{b[1]}")
                if sub is None:
                    mp = resolve_module(b[0])
                    if mp:
                        todo.append((mp, b[1]))
        for base, attr in u.attrs:
            b = binding(base)
            if not b or not b[0].startswith(PKG):
                continue
            mod = b[0] if b[1] is None else f"{b[0]}.{b[1]}"
            mp = resolve_module(mod)
            if mp:
                todo.append((mp, attr))

    if virtual:
        members = _materialized_members(file_text)
        for _, name in virtual:
            q = name.split(":", 1)[1]
            parts[f"{VIRTUAL}:{name}"] = "1" if q in members else "0"

    h = hashlib.sha256()
    for key in sorted(parts):
        h.update(key.encode())
        h.update(b"\0")
        h.update(parts[key].encode())
        h.update(b"\1")
    return h.hexdigest()


# -------------------------------------------------------------- query maps

def query_roots() -> dict[str, list[tuple[str, str]]]:
    entry = parse_cached((REPO / ENTRY).read_text())
    qfn: dict[str, str] = {}
    tree = ast.parse(entry.text)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "_query_registry", "queries"):
            for d in ast.walk(node):
                if isinstance(d, ast.Dict):
                    for k, v in zip(d.keys, d.values):
                        if isinstance(k, ast.Constant) and isinstance(
                                v, ast.Name):
                            qfn[k.value] = v.id
    # the oracle dict may live in oracle_sql() or a helper it delegates
    # to (_oracle_sql_raw since r5) — scan EVERY module function for the
    # `"name": ora.fn(` shape (it appears nowhere else)
    ofn: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            src = ast.get_source_segment(entry.text, node)
            for m in re.finditer(r'"(\w+)":\s*ora\.(\w+)\(', src):
                ofn[m.group(1)] = m.group(2)
    # queries whose twin is post-processed by ora.materialized (the
    # _MATERIALIZED_TWINS set, r5): the wrapper function AND the set
    # membership are part of those queries' dependency closure — adding
    # or removing a member changes its generated SQL
    mat: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "_MATERIALIZED_TWINS"
            for t in node.targets
        ):
            for c in ast.walk(node.value):
                if isinstance(c, ast.Constant) and isinstance(
                        c.value, str):
                    mat.add(c.value)
    roots = {}
    for q, fn in qfn.items():
        r = [(ENTRY, fn)]
        if q in ofn:
            r.append((ORACLE, ofn[q]))
            # membership BIT, not the set literal: adding one member
            # stales that query alone (see closure_fingerprint)
            r.append((VIRTUAL, f"materialized:{q}"))
        if q in mat:
            r.append((ORACLE, "materialized"))
        roots[q] = r
    return roots


# Memo-sharing families (see __spark_entry__._dup_shingles /
# _dup_verified / _dup_communities_rel and bpe.py's memo_obj): when
# several members land in the same window, keep them adjacent and in
# chain order so a driver session executing the window sequentially
# reuses the session memos (communities trio measured 25.4 s isolated
# -> 11.8 s as a shared batch at sf0.1).
AFFINITY_CHAINS = [
    ["bpe_merges64", "bpe_fertility64"],
    ["bpe_merges", "bpe_segments"],
    # the _dup_shingles -> _dup_verified -> _dup_communities_rel chain
    ["dedup_minhash_signatures", "dedup_minhash_pairs",
     "dedup_clusters", "dedup_clusters_incremental", "dedup_incremental",
     "dedup_containment", "dedup_jaccard_prefix", "dedup_ngram_jaccard",
     "dedup_threshold_sweep", "dedup_recall_report", "dedup_decisions",
     "dup_graph_stats", "knn_triangles", "pagerank_dupgraph",
     "dedup_kcore", "dedup_communities", "community_modularity",
     "community_source_nmi", "cluster_retention", "source_overlap",
     "leakage_safe_splits", "curate_corpus"],
]


def affinity_order(window: list[str]) -> list[str]:
    """Reorder a window so memo-chain members are adjacent: each chain
    is emitted in chain order at the position of its first member;
    everything else keeps its priority position."""
    members = {q: i for i, chain in enumerate(AFFINITY_CHAINS)
               for q in chain}
    out: list[str] = []
    emitted: set[str] = set()
    wset = set(window)
    for q in window:
        if q in emitted:
            continue
        if q in members:
            for m in AFFINITY_CHAINS[members[q]]:
                if m in wset and m not in emitted:
                    out.append(m)
                    emitted.add(m)
        else:
            out.append(q)
            emitted.add(q)
    return out


def rewrite_window(expected: list[str]) -> bool:
    """Rewrite the _CHECK_WINDOW literal in __spark_entry__.py with
    `expected` (affinity-ordered). Returns True when the file changed."""
    path = REPO / ENTRY
    text = path.read_text()
    body = "".join(f'    "{q}",\n' for q in affinity_order(expected))
    new_block = f"_CHECK_WINDOW = [\n{body}]"
    pat = re.compile(r"_CHECK_WINDOW = \[\n(?:    \"\w+\",\n)*\]")
    new_text, n = pat.subn(lambda _: new_block, text, count=1)
    if n != 1:
        raise SystemExit("could not locate the _CHECK_WINDOW literal")
    if new_text == text:
        return False
    path.write_text(new_text)
    return True


def main() -> int:
    json_only = "--json-only" in sys.argv
    commits = round_commits()
    greens = green_rounds()
    roots = query_roots()

    def head_text(p: str) -> str | None:
        f = REPO / p
        return f.read_text() if f.exists() else None

    import importlib

    import __spark_entry__ as entry_mod

    # --rotate re-enters main() after rewriting the window literal;
    # reload so queries() reflects the file, not the import cache
    entry_mod = importlib.reload(entry_mod)

    order = list(entry_mod.queries().keys())
    window = set(order[:50])

    cur_fps = {
        q: (closure_fingerprint(roots[q], head_text)
            if roots.get(q) else None)
        for q in order
    }

    def fresh_at(q: str, newest: int | None) -> bool:
        r, cur_fp = roots.get(q, []), cur_fps.get(q)
        if newest is None or newest not in commits or not cur_fp:
            return False
        c = commits[newest]
        return cur_fp == closure_fingerprint(
            r, lambda p, c=c: git_show(c, p)
        )

    def evidence_state(exclude: int | None):
        """(newest_by_query, stale_list) under the evidence set with
        round `exclude` removed (None = full evidence)."""
        newest_by_q, stale = {}, []
        for q in order:
            rounds = [n for n in greens.get(q, []) if n != exclude]
            newest = max(rounds) if rounds else None
            newest_by_q[q] = newest
            if not fresh_at(q, newest):
                stale.append(q)
        return newest_by_q, stale

    newest_full, stale = evidence_state(None)
    stale_set = set(stale)
    ledger = {
        q: {
            "rounds_green": greens.get(q, []),
            "newest_green_round": newest_full[q],
            "fresh": q not in stale_set,
            "in_next_window": q in window,
            "fingerprint": cur_fps[q],
        }
        for q in order
    }

    (REPO / "EVIDENCE_LEDGER.json").write_text(
        json.dumps(ledger, indent=1, sort_keys=True) + "\n"
    )

    # Priority-aware window invariant. The driver checks exactly 50
    # slots, and a round that ADDS queries can leave more than 50 stale
    # (every new query is stale by definition — it has no driver row).
    # The invariant is therefore not "zero stale outside the window"
    # (impossible at overflow) but "the window IS the 50 highest-
    # priority stale queries": never-driver-certified first, then
    # oldest driver evidence; any spare slots go to the fresh queries
    # with the oldest rows (opportunistic refresh). Overflowed stale
    # queries keep their mirror evidence and rotate next round.
    def make_expected(newest_by_q, stale_list):
        def prio(q: str):
            n = newest_by_q[q]
            return (0 if n is None else n, q)

        expected = sorted(stale_list, key=prio)[:50]
        if len(expected) < 50:
            stale_s = set(stale_list)
            fresh_pool = sorted(
                (q for q in order if q not in stale_s),
                key=prio,
            )
            expected += fresh_pool[: 50 - len(expected)]
        return expected, prio

    expected, prio = make_expected(newest_full, stale)
    violation = full_mismatch = set(order[:50]) != set(expected)

    # Deposit stability (r6): the window is built against the evidence
    # state BEFORE the next driver run; when the driver then deposits
    # CORRECTNESS_r0N.json certifying exactly that window, the
    # just-refreshed queries drop out of the priority set and the
    # full-evidence expectation shifts to the NEXT rotation — which is
    # r(N+1) work, not a broken invariant. So also accept a window that
    # is priority-correct under the evidence state with the newest
    # round removed (the state the window was built for). A mid-round
    # code edit that silently stales an unwindowed high-priority query
    # fails BOTH states, so the detection property is preserved.
    newest_round = max(
        (int(re.search(r"r(\d+)", p.name).group(1))
         for p in REPO.glob("CORRECTNESS_r*.json")),
        default=None,
    )
    if violation and newest_round is not None:
        alt_expected, _ = make_expected(*evidence_state(newest_round))
        if set(order[:50]) == set(alt_expected):
            violation = False
            if not json_only:
                print(
                    f"window matches the pre-r{newest_round} evidence "
                    "state (deposit-stable pass); rotate before the "
                    "next driver run"
                )
    overflow = [q for q in sorted(stale, key=prio)[50:]]
    if "--emit-window" in sys.argv:
        print("_CHECK_WINDOW = [")
        for q in affinity_order(expected):
            print(f'    "{q}",')
        print("]")
    if "--rotate" in sys.argv:
        # rotate whenever the window diverges from the FULL-evidence
        # expectation — including the deposit-stable case, where the
        # plain invariant passes but the window still reflects the
        # previous round's rotation
        if full_mismatch:
            changed = rewrite_window(expected)
            print("rotated: _CHECK_WINDOW rewritten"
                  if changed else "rotated: no textual change")
            # re-run on the rewritten tree so the exit code and the
            # EVIDENCE_LEDGER.json reflect the post-rotation state
            sys.argv = [a for a in sys.argv if a != "--rotate"]
            return main()
        print("rotate: window already priority-correct; nothing to do")
    if not json_only:
        print(f"queries: {len(order)}  stale: {len(stale)}  "
              f"window-matches-priority: {not violation}  "
              f"stale-overflow (rotate next round): {len(overflow)}")
        for q in stale:
            mark = "windowed" if q in window else (
                "overflow" if q in overflow else "** MISPLACED **"
            )
            print(f"  stale  {q:<34} newest_green="
                  f"r{ledger[q]['newest_green_round']}  {mark}")
        if violation:
            missing = [q for q in expected if q not in set(order[:50])]
            extra = [q for q in order[:50] if q not in set(expected)]
            print(f"window should add: {missing}")
            print(f"window should drop: {extra}")
    return 1 if violation else 0


if __name__ == "__main__":
    sys.exit(main())
