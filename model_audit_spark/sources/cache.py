"""Fingerprint cache as a partitioned Parquet table (SURVEY.md §2.1 S12-S14,
F23, J7; reference cache.py:18-108).

The reference keeps one JSON file per (model, method, provider) with a
`_cached_at` epoch and a TTL check on read. Here the cache is a Parquet
table partitioned by `method` — lookups are partition-pruned point reads,
TTL is a filter predicate, and batch audits find misses with a left-anti
join instead of N point lookups.

Schema: (method, model_id, provider, fingerprint_type, data_json STRING,
cached_at TIMESTAMP). The open `data` dict rides as canonical JSON — each
method's typed table is the real analytical store; the cache only needs
round-tripping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def sanitize_model(model: Column | str) -> Column:
    """model name with /, :, space -> _ then truncated to 40 chars."""
    c = F.col(model) if isinstance(model, str) else model
    return F.substring(F.translate(c, "/: ", "___"), 1, 40)


def cache_key(
    model: Column | str, method: Column | str, provider: Column | str
) -> Column:
    """F23: '{method}_{sanitized_model}_{sha256(method:model:provider)[:16]}'

    Byte-compatible with reference cache.py:101-108."""
    m = F.col(model) if isinstance(model, str) else model
    me = F.col(method) if isinstance(method, str) else method
    p = F.col(provider) if isinstance(provider, str) else provider
    digest = F.substring(
        F.sha2(F.concat_ws(":", me, m, p), 256), 1, 16
    )
    return F.concat_ws("_", me, sanitize_model(m), digest)


class FingerprintCache:
    """S12-S14: get/put/list/clear over a partitioned Parquet table."""

    def __init__(self, spark: SparkSession, cache_dir: str, ttl: int = 0):
        self.spark = spark
        self.cache_dir = cache_dir
        self.ttl = ttl  # seconds; 0 = never expires (reference config.py:30)

    def _read(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.cache_dir)
        except Exception:
            return None  # empty cache == missing table (corrupt-tolerance)

    def _fresh(self, df: DataFrame) -> DataFrame:
        if self.ttl > 0:
            cutoff = F.current_timestamp() - F.expr(
                f"INTERVAL {int(self.ttl)} SECONDS"
            )
            return df.filter(F.col("cached_at") >= cutoff)
        return df

    def put(self, fingerprints: DataFrame) -> None:
        """S13: upsert rows (method, model_id, provider, fingerprint_type,
        data_json); stamps cached_at. Latest write wins on re-read."""
        stamped = fingerprints.withColumn(
            "cached_at", F.current_timestamp()
        )
        (
            stamped.write.mode("append")
            .partitionBy("method")
            .parquet(self.cache_dir)
        )

    def get(
        self, model: str, method: str, provider: str
    ) -> DataFrame | None:
        """S12: point lookup; None on miss/expired. Partition-pruned scan +
        keep only the newest row for the key (append-based upsert)."""
        df = self._read()
        if df is None:
            return None
        hit = self._fresh(
            df.filter(
                (F.col("method") == method)
                & (F.col("model_id") == model)
                & (F.col("provider") == provider)
            )
        ).orderBy(F.desc("cached_at")).limit(1)
        return hit if not hit.isEmpty() else None

    def misses(self, wanted: DataFrame) -> DataFrame:
        """J7 batch form: rows of `wanted` (method, model_id, provider)
        with no fresh cache entry — one left-anti join, not N lookups."""
        df = self._read()
        if df is None:
            return wanted
        return wanted.join(
            self._fresh(df).select("method", "model_id", "provider"),
            ["method", "model_id", "provider"],
            "left_anti",
        )

    def list_entries(self) -> DataFrame | None:
        """S14: metadata listing with deterministic order."""
        df = self._read()
        if df is None:
            return None
        return df.select(
            cache_key("model_id", "method", "provider").alias("key"),
            "model_id",
            "method",
            "fingerprint_type",
            "cached_at",
        ).orderBy("key", F.desc("cached_at"))

    def clear(self) -> int:
        """S14: drop everything; returns number of entries removed."""
        df = self._read()
        if df is None:
            return 0
        n = df.count()
        import shutil

        shutil.rmtree(self.cache_dir, ignore_errors=True)
        return n
