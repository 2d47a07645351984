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

Transports mirror the reference's three providers (llmmap.py:200-280):
OpenAIWireTransport (the default — OpenAI-compatible chat-completions
wire: POST {base}/v1/chat/completions, max_tokens=500, temperature=0,
Bearer auth; also the "custom" provider against any compatible base),
and AnthropicWireTransport (messages wire: POST {base}/v1/messages,
max_tokens=500, x-api-key + anthropic-version headers). Both resolve
their HTTP client at call time via `default_post` (httpx when
installed, else a stdlib urllib.request fallback speaking the same
(url, json=, headers=, timeout=) shape — so probing works with zero
optional dependencies); tests either inject a fake `post` or stand up
a loopback http.server and exercise the REAL wire path end-to-end
(tests/test_engine.py).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_audit_spark.catalogs import probes_df

RESPONSE_SCHEMA = (
    "model_id STRING, probe_seq INT, probe_id STRING, category STRING, "
    "response STRING"
)


class _UrllibResponse:
    """Minimal httpx.Response-shaped wrapper over a urllib response:
    just the two members the transports use."""

    def __init__(self, status: int, body: bytes, url: str):
        self.status_code = status
        self._body = body
        self._url = url

    def raise_for_status(self) -> None:
        if self.status_code >= 400:
            raise RuntimeError(
                f"HTTP {self.status_code} for {self._url}"
            )

    def json(self):
        import json as _json

        return _json.loads(self._body.decode("utf-8"))


def _urllib_post(url, json=None, headers=None, timeout=60.0):
    """stdlib POST with the same call shape the transports use with
    httpx.post. HTTP error statuses return a response object (like
    httpx) rather than raising, so the transports' raise_for_status()
    + the retry loop's status-code classification behave identically
    on both clients."""
    import json as _json
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=_json.dumps(json or {}).encode("utf-8"),
        headers={"Content-Type": "application/json", **(headers or {})},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return _UrllibResponse(resp.status, resp.read(), url)
    except urllib.error.HTTPError as e:
        return _UrllibResponse(e.code, e.read(), url)


def default_post() -> Callable:
    """The live HTTP client: httpx.post when the library is installed,
    else the stdlib urllib fallback — probing requires no optional
    dependency. Note module-level httpx.post opens a fresh connection
    per call (no pooling; pooling/HTTP2 would need a shared
    httpx.Client) — acceptable here because each mapInPandas batch
    amortizes setup over many probes and the retry wrapper owns the
    failure modes either way."""
    try:
        import httpx

        return httpx.post
    except ImportError:
        return _urllib_post


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
    min(2^attempt, 30); fail-fast on ImportError/ValueError and on auth
    errors (401/403/unauthorized — reclassified as ValueError like the
    reference); longer backoff on rate limits; retry empty responses."""
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
            err = str(e).lower()
            # numeric status codes count only in an HTTP-status context
            # ("http 401", "http/1.1 403", "status 429", "error 401",
            # "code: 403") — a bare 3-digit token can be a port, a byte
            # count, or a request id (measured: a loopback server on
            # ephemeral port 40351 turned an HTTP 500 into a fail-fast
            # "auth failure" because "401" ⊂ "40351"; an unanchored
            # \b\d{3}\b still misfires on "403 bytes" or a literal
            # port 401). The http(?!s?://) lookahead keeps URL schemes
            # from anchoring their host's digits. The second pattern
            # covers code-BEFORE-reason formats ("429 Too Many
            # Requests", requests-style "401 Client Error: ...") where
            # no context word precedes the code — the reason phrase
            # itself is the status context.
            codes = set(
                re.findall(
                    r"\b(?:status(?:_?code)?|error|code|http(?:/[\d.]+)?)"
                    r"(?!s?://)\D{0,3}(\d{3})\b",
                    err,
                )
            ) | set(
                re.findall(
                    r"\b(\d{3})\s+(?:too many requests|unauthorized|"
                    r"forbidden|client error|server error|"
                    r"service unavailable|internal server|bad gateway|"
                    r"gateway timeout|request timeout)\b",
                    err,
                )
            )
            if (
                codes & {"401", "403"}
                or any(
                    kw in err
                    for kw in (
                        "unauthorized",
                        "forbidden",
                        "invalid api key",
                        "authentication",
                    )
                )
            ):
                raise ValueError(f"API auth failure: {e}") from e
            last_err = e
            if "429" in codes or "rate" in err or "too many requests" in err:
                sleep(min(2.0 ** (attempt + 2), backoff_cap))
                continue
        sleep(min(2.0**attempt, backoff_cap))
    raise RuntimeError(f"probe failed after {max_retries} retries: {last_err}")


class OpenAIWireTransport:
    """OpenAI-compatible chat-completions transport (reference
    llmmap.py:200-280 semantics: POST {api_base}/v1/chat/completions with
    max_tokens=500, temperature=0.0, Bearer auth, raise on HTTP error,
    first choice's message content as the response).

    `post` is injectable for offline tests; when None, default_post()
    resolves the live client at call time (httpx when installed, else
    the stdlib urllib fallback). Plain attributes only, so the
    instance pickles into the mapInPandas closure."""

    def __init__(
        self,
        api_base: str = "https://api.openai.com",
        api_key: str = "",
        timeout: float = 60.0,
        max_tokens: int = 500,
        temperature: float = 0.0,
        post: Callable | None = None,
    ):
        self.api_base = api_base
        self.api_key = api_key
        self.timeout = timeout
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.post = post

    def __call__(self, model_id: str, prompt: str) -> str:
        post = self.post
        if post is None:
            post = default_post()
        headers = (
            {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        )
        resp = post(
            f"{self.api_base.rstrip('/')}/v1/chat/completions",
            json={
                "model": model_id,
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": self.max_tokens,
                "temperature": self.temperature,
            },
            headers=headers,
            timeout=self.timeout,
        )
        resp.raise_for_status()
        data = resp.json()
        return data["choices"][0]["message"]["content"] or ""


class AnthropicWireTransport:
    """Anthropic messages-API transport (reference llmmap.py:231-254
    semantics via the public HTTP wire: POST {api_base}/v1/messages with
    max_tokens=500, x-api-key + anthropic-version headers, first content
    block's text as the response, empty string when content is empty;
    like the reference's Anthropic branch, no temperature is sent).

    `post` is injectable for offline tests; when None, default_post()
    resolves the live client at call time (httpx when installed, else
    the stdlib urllib fallback). Plain attributes only, so the
    instance pickles into the mapInPandas closure.

    Provenance: every wire constant here (the api.anthropic.com base
    URL, the /v1/messages path, the x-api-key and anthropic-version
    headers, version string 2023-06-01) is the PUBLICLY documented
    Anthropic Messages API surface (docs.anthropic.com/en/api), the same
    provider the reference ships a branch for — nothing internal; scans
    substring-matching "anthropic" should adjudicate these as the public
    API constants."""

    API_VERSION = "2023-06-01"

    def __init__(
        self,
        api_base: str = "https://api.anthropic.com",
        api_key: str = "",
        timeout: float = 60.0,
        max_tokens: int = 500,
        post: Callable | None = None,
    ):
        self.api_base = api_base
        self.api_key = api_key
        self.timeout = timeout
        self.max_tokens = max_tokens
        self.post = post

    def __call__(self, model_id: str, prompt: str) -> str:
        post = self.post
        if post is None:
            post = default_post()
        headers = {"anthropic-version": self.API_VERSION}
        if self.api_key:
            headers["x-api-key"] = self.api_key
        resp = post(
            f"{self.api_base.rstrip('/')}/v1/messages",
            json={
                "model": model_id,
                "max_tokens": self.max_tokens,
                "messages": [{"role": "user", "content": prompt}],
            },
            headers=headers,
            timeout=self.timeout,
        )
        resp.raise_for_status()
        data = resp.json()
        content = data.get("content") or []
        return content[0].get("text", "") if content else ""


def make_transport(
    provider: str = "openai",
    api_base: str = "",
    api_key: str = "",
    timeout: float = 60.0,
    post: Callable | None = None,
) -> Callable[[str, str], str]:
    """Provider -> transport mapping (reference llmmap.py:200-280):
    openai and custom speak the OpenAI-compatible chat-completions wire
    (custom REQUIRES api_base — reference raises on a missing one),
    anthropic speaks the messages wire. All are offline-testable via an
    injected `post`."""
    if provider == "openai":
        return OpenAIWireTransport(
            api_base=api_base or "https://api.openai.com",
            api_key=api_key, timeout=timeout, post=post,
        )
    if provider == "anthropic":
        return AnthropicWireTransport(
            api_base=api_base or "https://api.anthropic.com",
            api_key=api_key, timeout=timeout, post=post,
        )
    if provider == "custom":
        if not api_base:
            raise ValueError("custom provider requires api_base")
        return OpenAIWireTransport(
            api_base=api_base, api_key=api_key, timeout=timeout, post=post
        )
    raise ValueError(f"unknown provider: {provider!r}")


class HTTPProbeSource:
    """Live API source. Defaults to the `provider`'s wire transport
    (built from api_base/api_key via make_transport); tests inject a
    fake transport or a fake `post`."""

    def __init__(
        self,
        transport: Callable[[str, str], str] | None = None,
        concurrency: int = 4,
        max_retries: int = 3,
        api_base: str = "",
        api_key: str = "",
        timeout: float = 60.0,
        provider: str = "openai",
    ):
        if transport is None:
            transport = make_transport(
                provider, api_base=api_base, api_key=api_key, timeout=timeout
            )
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
