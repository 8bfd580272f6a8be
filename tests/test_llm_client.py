"""Retry / backoff / fallback policy tests (no network — scripted
transport), mirroring the reference's client semantics."""

import pytest

from fancyrag_ray.stages.llm_client import (
    RetryPolicy,
    SharedModelClient,
    TransportError,
    parse_retry_after,
)


def make_client(script, **kw):
    """script: list of (status or None); None → success."""
    calls = []

    def transport(model, payload):
        i = len(calls)
        calls.append(model)
        step = script[min(i, len(script) - 1)]
        if step is None:
            return {"model": model, "payload": payload}
        status, retry_after = step if isinstance(step, tuple) else (step, None)
        raise TransportError(status, retry_after=retry_after)

    sleeps = []
    c = SharedModelClient(transport, model="big", sleep=sleeps.append, **kw)
    return c, calls, sleeps


class TestRetryPolicy:
    def test_success_first_try(self):
        c, calls, sleeps = make_client([None])
        assert c.call("x")["model"] == "big"
        assert c.metrics.calls == 1 and c.metrics.retries == 0

    def test_retries_then_succeeds(self):
        c, calls, sleeps = make_client([500, 503, None])
        assert c.call("x")["payload"] == "x"
        assert c.metrics.retries == 2
        assert sleeps == [0.5, 1.0]  # base 0.5 ×2 per attempt

    def test_exhausts_attempts(self):
        c, calls, sleeps = make_client([500, 500, 500])
        with pytest.raises(TransportError):
            c.call("x")
        assert len(calls) == 3
        assert c.metrics.failures == 1

    def test_non_retryable_fails_fast(self):
        c, calls, sleeps = make_client([401])
        with pytest.raises(TransportError):
            c.call("x")
        assert len(calls) == 1 and sleeps == []

    def test_retry_after_honored(self):
        c, calls, sleeps = make_client([(429, "7"), None], fallback_model="small")
        c.call("x")
        assert sleeps == [7.0]

    def test_rate_limit_falls_back(self):
        c, calls, sleeps = make_client([429, None], fallback_model="small")
        out = c.call("x")
        assert out["model"] == "small"
        assert calls == ["big", "small"]
        assert c.metrics.fallbacks == 1

    def test_backoff_capped(self):
        p = RetryPolicy(max_attempts=10)
        assert p.backoff(8) == 5.0


class TestParseRetryAfter:
    def test_digits(self):
        assert parse_retry_after("3") == 3.0

    def test_digits_capped(self):
        assert parse_retry_after("300") == 30.0

    def test_http_date(self):
        import time as _t
        from email.utils import formatdate

        v = parse_retry_after(formatdate(_t.time() + 10, usegmt=True))
        assert v is not None and 5 <= v <= 12

    def test_garbage_none(self):
        assert parse_retry_after("soon") is None
        assert parse_retry_after(None) is None
