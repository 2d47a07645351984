#!/usr/bin/env python
"""Micro-batch census for the streaming gate queries (r13, VERDICT #7).

For each probed stream: run the SAME availableNow pipeline the gate
query runs, then read StreamingQuery.recentProgress and print the
batch count and the per-phase durationMs breakdown (triggerExecution,
getBatch, addBatch, walCommit, commitOffsets, queryPlanning) — the
direct measurement of where the family's fixed ~2-4 s/query goes,
after the r12 RocksDB and tmpfs levers both measured out.

Usage: python scripts/streaming_probe.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    from pyspark.sql import functions as F

    from model_audit_spark.session import get_spark
    from model_audit_spark.streaming import (
        streaming_interval_join,
        streaming_sessionize,
    )
    from __spark_entry__ import normalize_event_ts

    spark = get_spark(app_name="streaming-probe")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{SF_DIR}/events.parquet"
    batch_schema = spark.read.parquet(path).schema
    stage = tempfile.mkdtemp(prefix="ma_probe_")
    os.symlink(path, os.path.join(stage, "part-0.parquet"))

    def stream():
        return normalize_event_ts(
            spark.readStream.schema(batch_schema).parquet(stage)
        )

    def side(event_type, alias):
        return stream().filter(
            F.col("event_type") == event_type
        ).select("user_id", F.col("ts").alias(alias))

    probes = {
        "attribution(interval_join)": lambda: streaming_interval_join(
            side("view", "l_ts"), side("click", "r_ts"),
            max_delay="10 minutes", watermark="1 hour",
        ),
        "sessionize": lambda: streaming_sessionize(
            stream(), gap="30 minutes", within="1 hour"
        ),
    }
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for name, build in probes.items():
            for p in range(PASSES):
                ckpt = tempfile.mkdtemp(prefix="ma_probe_ckpt_")
                t0 = time.time()
                q = (
                    build().writeStream.format("memory")
                    .queryName(f"probe_{abs(hash((name, p))) % 10**8}")
                    .outputMode(
                        "complete" if name == "sessionize" else "append"
                    )
                    .trigger(availableNow=True)
                    .option("checkpointLocation", ckpt)
                    .start()
                )
                q.awaitTermination(300)
                wall = time.time() - t0
                prog = [
                    x if isinstance(x, dict) else json.loads(str(x))
                    for x in q.recentProgress
                ]
                batches = [
                    x for x in prog if x.get("numInputRows", 0) >= 0
                ]
                phases: dict[str, int] = {}
                for b in batches:
                    for k, v in (b.get("durationMs") or {}).items():
                        phases[k] = phases.get(k, 0) + int(v)
                n_rows = sum(b.get("numInputRows", 0) for b in batches)
                print(
                    f"{name} pass{p}: wall={wall:.2f}s "
                    f"batches={len(batches)} rows={n_rows} "
                    f"durationMs={json.dumps(phases, sort_keys=True)}"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()


if __name__ == "__main__":
    main()
