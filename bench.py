#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion via a noop-format write (evaluates
EVERY output column — count() would let Catalyst prune computed columns and
undercount the work) after a shared warm-up that triggers JVM/codegen warm
paths; per-query time is wall-clock of the action. Row counts reported per
query come from a separate cheap count().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_regional_revenue",
    "q_window_orders",
    "q_events_hourly",
    "q_events_sessionize",
    "detect_documents",
    "detect_distribution",
    "llmmap_fingerprints_by_source",
    "llmmap_compare_sources",
    "dli_compare_sources",
    "text_stats",
    "watermark_documents",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "doc_fingerprints",
    "similarity_topk",
    "embedding_near_dups",
    "cka_labels",
    "audit_verdict_sources",
    "benchmark_accuracy",
    "style_fingerprint",
    "probe_style_consistency",
    "fingerprint_diff_buckets",
    "memorization_verbatim",
    "memorization_levenshtein",
    "cache_keys",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from model_audit_spark.session import get_spark

    spark = get_spark(app_name="model-audit-bench")
    qs = entrymod.queries()

    # Warm-up: run every benched query once at the smallest SF so the timed
    # pass measures execution + planning, not first-call JVM/janino codegen
    # compilation (which is amortized away in any long-running deployment).
    warm_sf = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        try:
            qs[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # pragma: no cover — warm-up best effort
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
