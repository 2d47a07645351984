#!/usr/bin/env python
"""Profile one or more declared queries: split wall-clock into DataFrame
construction (driver-side, incl. any internal collect()s) vs noop-write
execution, and count the Spark jobs/stages each launched.

Usage: python scripts/profile_query.py q1 q2 ...   [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from model_audit_spark import persistence
    from model_audit_spark.session import get_spark

    import json as _json

    extra = _json.loads(os.environ.get("PROFILE_EXTRA_CONF", "{}"))
    spark = get_spark(app_name="profile-query", extra_conf=extra)
    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm-up once at sf0.001 (codegen/JVM) like bench.py
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    persistence.release_all()
    spark.catalog.clearCache()

    print(f"{'query':34s} {'build':>7s} {'exec':>7s} {'total':>7s} "
          f"{'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in names:
        best = None
        for _ in range(2):
            jobs0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            jobs1 = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(jobs1 - jobs0)
            stages = 0
            tasks = 0
            for jid in new_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        stages += 1
                        tasks += si.numTasks
            rec = (t1 - t0, t2 - t1, t2 - t0, len(new_jobs), stages,
                   tasks)
            if best is None or rec[2] < best[2]:
                best = rec
            del df
            gc.collect()
            persistence.release_all()
            spark.catalog.clearCache()
        b, e, tt, nj, nst, ntk = best
        print(f"{name:34s} {b:7.2f} {e:7.2f} {tt:7.2f} {nj:5d} {nst:6d} "
              f"{ntk:6d}")


if __name__ == "__main__":
    main()
