#!/usr/bin/env python
"""Physical-plan audit for the SCALE.md evidence table.

For each queries() entry (or the names passed on argv), executes the
query at sf0.01 and reports plan-shape counters from the FINAL (AQE)
executed plan:

  exchanges   Exchange hashpartitioning nodes (shuffles)
  bcast       BroadcastHashJoin nodes
  scans       FileScan parquet nodes
  pushed      scans with a non-empty PushedFilters list
  wscg        WholeStageCodegen spans (JVM-compiled pipelines)
  inmem       InMemoryTableScan nodes (persisted-relation reuse)

Usage:
  python scripts/plan_audit.py [query ...] [--sf=DIR] [--cpus=N]
"""

from __future__ import annotations

import re
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def audit_plan(plan: str) -> dict[str, int]:
    final = plan.split("== Initial Plan ==")[0]
    scans = [
        line for line in final.splitlines() if "FileScan parquet" in line
    ]
    pushed = [
        line
        for line in scans
        if re.search(r"PushedFilters: \[[^\]]", line)
    ]
    return {
        "exchanges": final.count("Exchange hashpartitioning"),
        "bcast": final.count("BroadcastHashJoin"),
        "scans": len(scans),
        "pushed": len(pushed),
        "wscg": len(set(re.findall(r"\*\((\d+)\)", final))),
        "inmem": final.count("InMemoryTableScan"),
    }


def main() -> int:
    import os

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        if a.startswith("--cpus="):
            cpus = a.split("=", 1)[1]

    import __spark_entry__ as entry
    from model_audit_spark.session import get_spark

    spark = get_spark(
        app_name="plan-audit",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args or list(qs)
    hdr = f"{'query':34s} {'exch':>4} {'bcast':>5} {'scans':>5} {'pushed':>6} {'wscg':>4} {'inmem':>5} {'sec':>6}"
    print(hdr)
    for name in names:
        if name not in qs:
            print(f"{name:34s} UNKNOWN")
            continue
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            df = qs[name](spark, sf)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            c = audit_plan(plan)
            print(
                f"{name:34s} {c['exchanges']:4d} {c['bcast']:5d} "
                f"{c['scans']:5d} {c['pushed']:6d} {c['wscg']:4d} "
                f"{c['inmem']:5d} {time.time() - t0:6.1f}"
            )
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
