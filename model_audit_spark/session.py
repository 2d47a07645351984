"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster but testable on local[N]:
- AQE on (runtime partition coalescing, skew-join splitting)
- Arrow on (fast pandas interchange for the few pandas-UDF kernels)
- shuffle partitions sized from env (local) — on a real cluster leave to AQE
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "model-audit-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # static conf, default 100: with a 70+-query surface the generated
        # -class cache thrashes and every query pays whole-stage codegen
        # compile (measured: benchmark_detect 6.9s in a long session vs
        # 2.0s steady-state standalone)
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g")
        )
        # r13 (guide §1.2 step 2 — driver-side per-query work): Spark 4
        # wraps EVERY PySpark DataFrame/Column API call in a call-site
        # capture for richer error context — a conf read + a
        # PySparkCurrentOrigin.set + .clear (3 extra py4j round-trips,
        # ~1.5 ms each on this harness) plus a Python stack walk, PER
        # CALL. On construction-heavy plans this dominates driver time:
        # measured same-session A/B, pq_rerank_topk construction
        # 3.0-3.8 s -> 1.7-2.2 s, lsh_multiprobe_topk 1.2-1.5 s ->
        # 0.49 s. Cost is error-message call-site metadata only — plans,
        # results and hashes are identical. Overridable via extra_conf
        # for debugging sessions.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver's parquet tables (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
