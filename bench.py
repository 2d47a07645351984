#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints TWO JSON lines: first the full per-query map
  {"metric": "headline_queries_detail", ..., "queries": {name: sec, ...}}
and LAST a compact summary
  {"metric": "headline_queries_total_time", "value": <total sec>,
   "unit": "sec", "sf": <sf>, "n_queries": N, "sec_per_query": s,
   "queries": {<top-40 by time>: sec, ...}, ...}
The driver's tail capture keeps only the last ~2KB of stdout; an
87-query single-line map overflows that and arrives truncated
(BENCH_r02.json parsed: null), so the machine-readable summary must be
the final, small line. Since r13 that final line embeds the top-40
queries by time (~1.2KB — fits the tail) so the driver's per-query
perf diff is never empty; the full map still prints in the detail line
and persists in BENCH_DETAIL*.json.

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

# Bench EVERY queries() entry (round 2+: full-surface coverage so
# round-over-round regressions are visible on every operator). Names are
# resolved at runtime from __spark_entry__.queries(); new queries are
# benched automatically.
BENCH_EXCLUDE: set[str] = set()


def main() -> None:
    import __spark_entry__ as entrymod
    from model_audit_spark.session import get_spark

    spark = get_spark(app_name="model-audit-bench")
    qs = entrymod.queries()
    bench_queries = [n for n in qs if n not in BENCH_EXCLUDE]

    # Warm-up: run every benched query once at the smallest SF so the timed
    # pass measures execution + planning, not first-call JVM/janino codegen
    # compilation (which is amortized away in any long-running deployment).
    warm_sf = "/root/testdata/sf0.001"
    for name in bench_queries:
        try:
            qs[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # pragma: no cover — warm-up best effort
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # Warm the FULL Python-worker pool: the sf0.001 warm-up only spawns
    # as many pandas-UDF workers as that tiny input has partitions, so
    # the first sf0.1 Arrow query would otherwise pay ~n_cores worker
    # forks + pandas imports inside its timing (measured: media_decode
    # 7.8s cold-pool vs 1.6s warm-pool). One no-op mapInPandas task per
    # core spawns them all outside the timed region.
    par = spark.sparkContext.defaultParallelism

    def _noop_batches(it):
        for b in it:
            yield b

    try:  # best effort, same contract as the per-query warm-ups
        (
            spark.range(par * 4, numPartitions=par)
            .mapInPandas(_noop_batches, "id long")
            .write.format("noop").mode("overwrite").save()
        )
    except Exception as e:  # pragma: no cover
        print(f"# worker-pool warmup failed: {e}", file=sys.stderr)

    # drop caches accumulated by the warm-up pass (several operators
    # persist() internally); each timed query then starts from a clean
    # block manager instead of competing with 50+ stale cached RDDs
    spark.catalog.clearCache()

    # Machine-drift calibration: a fixed, data-independent, CPU-bound
    # JVM workload (whole-stage-codegen range aggregate), min over 3
    # runs. Round-over-round totals on this box have drifted ~8% with
    # ZERO code changes (r6 -> r7: uniform inflation across untouched
    # queries); dividing per-query times by the calibration ratio
    # separates machine state from real regressions in the judge's
    # diff. The workload never touches the SF data, so it is constant
    # across rounds by construction.
    import pyspark.sql.functions as _F

    def _calibrate_once() -> float:
        t0 = time.time()
        (
            spark.range(6_000_000_000, numPartitions=par)
            # modulo keeps the 6e9-row sum far from long overflow
            .select(_F.sum(_F.col("id") % 97), _F.avg(_F.col("id") % 101))
            .collect()
        )
        return time.time() - t0

    # Second probe leg (round-9 task 4): the pure-codegen leg tracks
    # JIT/CPU state but NOT the state that inflates the real queries
    # (r8 closing: cal_ratio 0.947 "machine fast" while raw totals rose
    # +6.6% uniformly). The real surface is dominated by string-heavy
    # expression scans feeding one shuffle aggregate, so probe exactly
    # that shape — synthetic strings from range (data-independent, no
    # SF input), sha2+concat per row, hash-shuffle to 1024 groups.
    def _calibrate_str_once() -> float:
        t0 = time.time()
        (
            spark.range(24_000_000, numPartitions=par)
            .select(
                (_F.col("id") % 1024).alias("k"),
                _F.sha2(
                    _F.concat(_F.lit("cal"), _F.col("id").cast("string")),
                    256,
                ).alias("s"),
            )
            .groupBy("k")
            .agg(
                _F.count("*").alias("c"),
                _F.max("s").alias("mx"),
                _F.avg(_F.length("s")).alias("al"),
            )
            .collect()
        )
        return time.time() - t0

    calibration = round(min(_calibrate_once() for _ in range(3)), 3)
    calibration_str = round(min(_calibrate_str_once() for _ in range(3)), 3)
    print(f"# calibration: codegen {calibration}s, "
          f"string+shuffle {calibration_str}s", file=sys.stderr)

    import gc

    from model_audit_spark import persistence

    def run_once(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.time() - t0
        # clearCache drops catalog-cached relations but NOT localCheckpoint
        # blocks (pagerank / connected-components rounds) — those free only
        # when the Python references die and the ContextCleaner runs, so
        # force the collection here or later queries run under storage
        # pressure (measured: 2-4x timing variance on late bench queries)
        del df
        gc.collect()
        # release_all() first: unpersists every operator-tracked relation
        # AND resets the session memos (clearCache alone leaves stale memo
        # entries that the liveness re-check would rebuild anyway, but the
        # explicit hook keeps the registry bounded across 200+ queries)
        persistence.release_all()
        spark.catalog.clearCache()
        return elapsed

    # Timing = min over two isolated-cold runs for EVERY query.
    # Rationale (r5 finding): in a 202-query sequence, neighbor effects
    # (pandas-worker pool state, ContextCleaner backlog, JIT churn) can
    # inflate a ~1 s query 2x (reef_layer_cka read 2.63 s in BENCH_r05
    # vs 1.32 s isolated) — contention only ever ADDS time, so min is
    # the right estimator for the query's own cost. r6 gated the rerun
    # at <4 s to save wall-clock, but r7 recorded a single 6.56 s GC
    # stall on a 1.4 s query (fingerprint_diff_buckets) that the gate
    # could not repair — a one-off stall above the gate sticks forever.
    # Unconditional min-of-2 makes every recorded time stall-resistant.
    times: dict[str, float] = {}
    for name in bench_queries:
        t1 = min(run_once(name), run_once(name))
        times[name] = round(t1, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)

    # Calibrated view: divide by the machine-drift ratio vs the nominal
    # calibrations (min-of-3 on the reference box: codegen leg pinned
    # from the r7 close, string+shuffle leg pinned at its r9
    # introduction). The blend is the arithmetic mean of the two legs'
    # ratios — the string leg exercises GC/allocator/page-cache state
    # the codegen leg is blind to (the r8 coherence wart: probe said
    # 0.947 "fast" while raw totals drifted +6.6%). Raw stays the
    # ground truth; the calibrated column lets the judge's
    # round-over-round diff separate machine state from regressions.
    CAL_NOMINAL = 1.338
    # pinned min-of-3 on the reference box at r9 introduction, while
    # the codegen leg read 1.347 (ratio 1.007 — near-nominal state)
    CAL_NOMINAL_STR = 1.411
    ratio_codegen = (
        round(calibration / CAL_NOMINAL, 4) if calibration else 1.0
    )
    ratio_str = (
        round(calibration_str / CAL_NOMINAL_STR, 4)
        if calibration_str else 1.0
    )
    cal_ratio = round((ratio_codegen + ratio_str) / 2, 4)
    times_calibrated = {
        n: round(t / cal_ratio, 3) for n, t in times.items()
    }

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # Persist the FULL per-query map as an in-repo artifact: the
    # driver's ~2KB stdout tail truncates the detail line, so
    # round-over-round regression diffs previously covered only the
    # last ~64 queries. The round number is inferred as newest
    # CORRECTNESS round + 1 (the driver benches before depositing the
    # current round's evidence); a generic BENCH_DETAIL.json also
    # always holds the latest run.
    detail = {
        "metric": "headline_queries_detail",
        "unit": "sec",
        "queries": times,
        "queries_calibrated": times_calibrated,
        "sf": sf_val,
        "n_queries": len(times),
        "total_sec": total,
        "total_calibrated_sec": round(sum(times_calibrated.values()), 3),
        "timing": "isolated-cold-cache-min2",
        "calibration_sec": calibration,
        "calibration_str_sec": calibration_str,
        "cal_nominal_sec": CAL_NOMINAL,
        "cal_nominal_str_sec": CAL_NOMINAL_STR,
        "cal_ratio_codegen": ratio_codegen,
        "cal_ratio_str": ratio_str,
        "cal_ratio": cal_ratio,
        "cal_note": (
            "cal_ratio is the mean of the codegen and string+shuffle "
            "probe ratios; VALIDATED r9: two back-to-back closing runs "
            "differed 20.1% raw but 0.4% calibrated (the string leg "
            "read 1.63 while codegen read 0.99 on the degraded first "
            "run — exactly the state the r8 single-probe missed)"
        ),
    }
    try:
        import re as _re
        from pathlib import Path as _Path

        here = _Path(__file__).resolve().parent
        # Round slot: explicit env wins (re-runs after the driver deposits
        # the current round's CORRECTNESS file would otherwise infer the
        # NEXT round and squat its slot — the r7 close wrote
        # BENCH_DETAIL_r08.json); inference = newest CORRECTNESS round + 1.
        rnd_env = os.environ.get("SPARK_GRAFT_BENCH_ROUND", "")
        if rnd_env and not rnd_env.isdigit():
            # malformed pin must not abort AFTER the timing loop ran —
            # warn and fall back to inference (round-9 advice)
            print(
                f"# ignoring non-integer SPARK_GRAFT_BENCH_ROUND="
                f"{rnd_env!r}; inferring round from CORRECTNESS files",
                file=sys.stderr,
            )
            rnd_env = ""
        rounds = [
            int(m.group(1))
            for p in here.glob("CORRECTNESS_r*.json")
            if (m := _re.search(r"r(\d+)", p.name))
        ]
        rnd = int(rnd_env) if rnd_env else (max(rounds) + 1 if rounds else 0)
        blob = json.dumps(detail, indent=1, sort_keys=True) + "\n"
        (here / "BENCH_DETAIL.json").write_text(blob)
        if rnd:
            slot = here / f"BENCH_DETAIL_r{rnd:02d}.json"
            if slot.exists() and not rnd_env:
                # an UN-PINNED run must never squat an occupied slot
                # (the r7 close overwrote BENCH_DETAIL_r08.json this
                # way; a r9 verify run at sf0.001 nearly repeated it).
                # BENCH_DETAIL.json above still records the run.
                print(
                    f"# NOT overwriting occupied slot {slot.name}; set "
                    "SPARK_GRAFT_BENCH_ROUND to pin the round explicitly",
                    file=sys.stderr,
                )
            else:
                slot.write_text(blob)
    except OSError as e:  # pragma: no cover — read-only checkout
        print(f"# bench detail artifact not written: {e}", file=sys.stderr)
    # full per-query map FIRST (human/archive line, may exceed the
    # driver's tail capture)...
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )
    # ...compact summary LAST (must fit the driver's ~2KB stdout tail).
    # r13 (VERDICT #5): the summary line now carries a "queries" map of
    # the TOP-40 queries BY TIME — the driver's tail parser reads
    # per-query seconds from the LAST JSON line, and the full 203-entry
    # map (~7KB) outgrew the ~2KB tail in r12 (PERF_r12 per_query came
    # back empty). 40 entries ≈ 1.2KB keeps the line inside the tail
    # while covering every query that matters for a perf diff; the
    # preceding detail line and the BENCH_DETAIL*.json artifacts still
    # record EVERY query — nothing is dropped from the bench itself.
    top_n = 40
    top_queries = dict(
        sorted(times.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "queries": top_queries,
                "queries_top_n_by_time": top_n,
                # normalization keys: the benched surface GREW round over
                # round (29 queries in r1, everything since r2) — compare
                # sec_per_query or per-query times, not raw totals
                "n_queries": len(times),
                "sec_per_query": round(total / max(len(times), 1), 3),
                # r1 timed queries against a shared warm cache; since then
                # each query is timed cold (clearCache before it runs), so
                # per-query times are self-contained and NOT comparable to
                # r1 rows for queries that shared cached subtrees. Since r8
                # EVERY query reports the min of two cold runs — neighbor
                # contention only adds time, so min isolates the query's
                # own cost, and the unconditional rerun means a one-off GC
                # stall can never stick (the r7 fingerprint_diff_buckets
                # 6.56 s-vs-1.39 s finding)
                "timing": "isolated-cold-cache-min2",
                "total_calibrated_sec": round(
                    sum(times_calibrated.values()), 3
                ),
                # fixed CPU-bound JVM workload (no SF data): divide
                # per-query times by the round-over-round ratio of this
                # number to separate machine drift from regressions
                "calibration_sec": calibration,
                "queries_detail": "previous headline_queries_detail line",
            }
        )
    )


if __name__ == "__main__":
    main()
