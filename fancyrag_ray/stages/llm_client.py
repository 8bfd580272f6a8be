"""Shared model-client machinery for LLM/embedding actor stages.

Parity (A1, reference ``src/cli/openai_client.py:95-396``):
  * retry policy: max 3 attempts, 0.5 s base backoff ×2 per attempt,
    retryable statuses {408, 409, 425, 429, 500, 502, 503, 504}
    (``openai_client.py:58,323-387``, ``src/config/settings.py:27-28``);
  * Retry-After honored — digits (seconds) or HTTP-date
    (``openai_client.py:445-481``), capped;
  * deterministic fallback model on rate limit
    (``openai_client.py:136-141,178-198``);
  * telemetry counters per actor (A6 analogue) merged into run manifests.

No network exists in this sandbox: the transport is injectable; tests
drive the policy with scripted failures, and the real HTTP transport is
a drop-in. An actor stage composes this as
``map_batches(LlmExtractor, fn_constructor_kwargs={...}, concurrency=N)``
with the client built once per actor.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from email.utils import parsedate_to_datetime


RETRYABLE_STATUSES = frozenset({408, 409, 425, 429, 500, 502, 503, 504})


class TransportError(Exception):
    def __init__(self, status: int, message: str = "", retry_after: str | None = None):
        super().__init__(f"status {status}: {message}")
        self.status = status
        self.retry_after = retry_after


def parse_retry_after(value: str | None, now: float | None = None, cap: float = 30.0) -> float | None:
    """Digits → seconds; HTTP-date → delta from now; invalid → None.
    (reference ``openai_client.py:445-481``)"""
    if not value:
        return None
    v = value.strip()
    if v.isdigit():
        return min(float(v), cap)
    try:
        dt = parsedate_to_datetime(v)
    except (TypeError, ValueError):
        return None
    now = time.time() if now is None else now
    delta = dt.timestamp() - now
    return min(max(delta, 0.0), cap) if delta == delta else None


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    base_backoff_s: float = 0.5
    backoff_multiplier: float = 2.0
    max_backoff_s: float = 5.0  # cap (reference embeddings.py retry cap)
    retryable_statuses: frozenset = RETRYABLE_STATUSES

    def backoff(self, attempt: int, retry_after: float | None = None) -> float:
        if retry_after is not None:
            return retry_after
        return min(self.base_backoff_s * self.backoff_multiplier**attempt, self.max_backoff_s)


@dataclass
class ClientMetrics:
    """Per-actor telemetry (A6): aggregated into the run manifest."""

    calls: int = 0
    retries: int = 0
    failures: int = 0
    fallbacks: int = 0
    latency_ms_total: float = 0.0

    def as_dict(self) -> dict:
        return {
            "calls": self.calls,
            "retries": self.retries,
            "failures": self.failures,
            "fallbacks": self.fallbacks,
            "latency_ms_total": round(self.latency_ms_total, 3),
        }


class SharedModelClient:
    """Retrying, fallback-capable model client. ``transport(model,
    payload) -> result`` raises TransportError on failure. Construct once
    per actor (``__init__``), call per item/batch."""

    def __init__(
        self,
        transport,
        model: str,
        fallback_model: str | None = None,
        policy: RetryPolicy | None = None,
        sleep=time.sleep,
    ):
        self.transport = transport
        self.model = model
        self.fallback_model = fallback_model
        self.policy = policy or RetryPolicy()
        self.metrics = ClientMetrics()
        self._sleep = sleep
        self._active_model = model
        # One client is shared by the actor's in-flight threads (the
        # reference overlaps 4-5 calls per document under an asyncio
        # semaphore, pipeline.py:703-736). Only the counter mutations
        # are locked — transport calls run outside the lock, which is
        # the entire point of the concurrency.
        self._lock = threading.Lock()

    def call(self, payload):
        policy = self.policy
        last_exc: Exception | None = None
        for attempt in range(policy.max_attempts):
            t0 = time.perf_counter()
            try:
                result = self.transport(self._active_model, payload)
                with self._lock:
                    self.metrics.calls += 1
                    self.metrics.latency_ms_total += (time.perf_counter() - t0) * 1000
                return result
            except TransportError as exc:
                last_exc = exc
                with self._lock:
                    self.metrics.calls += 1
                    self.metrics.latency_ms_total += (time.perf_counter() - t0) * 1000
                    if exc.status in policy.retryable_statuses:
                        # rate limit → deterministic fallback model
                        # (reference openai_client.py:178-198), then
                        # keep retrying
                        if (
                            exc.status == 429
                            and self.fallback_model
                            and self._active_model != self.fallback_model
                        ):
                            self._active_model = self.fallback_model
                            self.metrics.fallbacks += 1
                if exc.status not in policy.retryable_statuses:
                    break
                if attempt + 1 < policy.max_attempts:
                    with self._lock:
                        self.metrics.retries += 1
                    self._sleep(policy.backoff(attempt, parse_retry_after(exc.retry_after)))
        with self._lock:
            self.metrics.failures += 1
        raise last_exc if last_exc else RuntimeError("model call failed")
