"""Executed-plan regression pins for the scale-critical properties.

SCALE.md's plan-audit table records WHY each plan is the one we want at
100 TB; these tests keep the properties from silently regressing:

- corpus hot paths stay pure projections (no hash-partition shuffle),
- whole-stage codegen stays ON for the 12-family score expressions
  (the inlined form used to trip janino's 64KB limit -> interpreted),
- dimension joins stay broadcast (no SortMergeJoin),
- filters reach the parquet scans (PushedFilters),
- scans read only the projected columns (ReadSchema pruning),
- persisted pair-join subtrees are reused (InMemoryTableScan), not
  recomputed from a second FileScan.

All at sf0.001 on the shared local[4] session — these pin plan SHAPE,
which is scale-invariant, not timings.
"""
from __future__ import annotations

import re

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def final_plan(spark, name: str) -> str:
    """Executed plan string AFTER running the query (AQE final plan)."""
    df = entrymod.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints the pre-AQE plan after this marker; only
    # the final (actually executed) section above it is pinned here.
    return plan.split("== Initial Plan ==")[0]


def test_detect_hot_path_is_pure_projection(spark):
    plan = final_plan(spark, "detect_documents")
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    # column pruning: the documents scan reads only (doc_id, text)
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert sorted(f.split(":")[0] for f in m.group(1).split(",")) == [
        "doc_id", "text",
    ]


def test_style_explode_keeps_wholestage_codegen(spark):
    plan = final_plan(spark, "style_scores_long")
    gen = next(l for l in plan.splitlines() if "Generate explode" in l)
    # `*(n)` prefix == inside a WholeStageCodegen stage; the inlined
    # expression form lost it (janino 64KB fallback)
    assert re.search(r"\*\(\d+\) Generate explode", gen.strip()), gen[:120]
    assert "Exchange hashpartitioning" not in plan


def test_q1_filters_pushed_to_lineitem_scan(spark):
    plan = final_plan(spark, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert re.search(r"PushedFilters: \[[^\]]*LessThanOrEqual", scan), scan[:200]
    assert "SortMergeJoin" not in plan


def test_q5_all_dimension_joins_broadcast(spark):
    plan = final_plan(spark, "q5_regional_revenue")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_benchmark_detect_broadcasts_fixture(spark):
    plan = final_plan(spark, "benchmark_detect")
    assert "SortMergeJoin" not in plan


def test_simhash_pairs_reuse_persisted_aggregate(spark):
    plan = final_plan(spark, "dedup_simhash_pairs")
    # both self-join sides come from the persisted simhash aggregate: the
    # only documents.parquet FileScan sits inside the cache-build subtree
    # (unpersisted, each side re-ran the full tokenize+hash agg: 2 scans)
    assert plan.count("documents.parquet") == 1, plan.count("documents.parquet")
    assert "InMemoryTableScan" in plan


def test_minhash_pairs_reuse_persisted_candidates(spark):
    plan = final_plan(spark, "dedup_minhash_pairs")
    assert "InMemoryTableScan" in plan


def test_asof_join_is_one_shuffle_no_join(spark):
    """The union-window as-of formulation: ONE hash exchange on the key,
    a sort, a window — and no join operator at all (a naive inequality
    join would plan a per-key nested-loop/cartesian product)."""
    plan = final_plan(spark, "q_events_asof")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
