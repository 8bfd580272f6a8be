"""S8/S9 index provisioning: create-or-validate semantics, mismatch
errors, retry/backoff and readiness loop — driven through a fake
backend (Lance absent in this sandbox; the gated LanceIndexBackend
raises cleanly)."""

from __future__ import annotations

import pytest

from fancyrag_ray.sources.indexes import (
    FulltextIndexSpec,
    IndexMismatchError,
    LanceIndexBackend,
    VectorIndexSpec,
    provision_fulltext_index,
    provision_vector_index,
)


class FakeBackend:
    def __init__(self, dims=1024, indexes=None, fail_times=0):
        self.dims = dims
        self.indexes = list(indexes or [])
        self.fail_times = fail_times
        self.create_calls = 0

    def list_indexes(self):
        return list(self.indexes)

    def column_dimensions(self, column):
        return self.dims

    def create_vector_index(self, spec):
        self.create_calls += 1
        if self.fail_times > 0:
            self.fail_times -= 1
            raise ConnectionError("transient sink failure")
        self.indexes.append({"column": spec.column, "type": spec.index_type})

    def create_fulltext_index(self, spec):
        self.create_calls += 1
        self.indexes.append({"column": spec.column, "type": spec.index_type})


class TestVectorProvisioning:
    def test_creates_when_absent(self):
        b = FakeBackend()
        assert provision_vector_index(b, VectorIndexSpec(), sleep=lambda s: None) == "created"
        assert b.indexes and b.indexes[0]["column"] == "embedding"

    def test_idempotent_when_present(self):
        b = FakeBackend(indexes=[{"column": "embedding", "type": "IVF_PQ"}])
        assert provision_vector_index(b, VectorIndexSpec(), sleep=lambda s: None) == "exists"
        assert b.create_calls == 0

    def test_dim_mismatch_raises(self):
        b = FakeBackend(dims=512)
        with pytest.raises(IndexMismatchError, match="512"):
            provision_vector_index(b, VectorIndexSpec(dimensions=1024), sleep=lambda s: None)

    def test_retries_transient_then_succeeds(self):
        b = FakeBackend(fail_times=2)
        waits = []
        assert provision_vector_index(b, VectorIndexSpec(), sleep=waits.append) == "created"
        assert b.create_calls == 3
        assert waits == [0.5, 1.0]  # exponential backoff

    def test_exhausted_retries_raise(self):
        b = FakeBackend(fail_times=10)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            provision_vector_index(b, VectorIndexSpec(), sleep=lambda s: None)

    def test_bad_spec_rejected(self):
        with pytest.raises(ValueError, match="metric"):
            provision_vector_index(FakeBackend(), VectorIndexSpec(metric="hamming"))


class TestFulltextProvisioning:
    def test_readiness_loop_then_create(self):
        b = FakeBackend()
        state = {"n": 0}

        def ready():
            state["n"] += 1
            return state["n"] >= 3

        waits = []
        out = provision_fulltext_index(b, FulltextIndexSpec(), ready_check=ready, sleep=waits.append)
        assert out == "created" and state["n"] == 3 and len(waits) == 2

    def test_never_ready_raises(self):
        with pytest.raises(RuntimeError, match="not ready"):
            provision_fulltext_index(
                FakeBackend(), FulltextIndexSpec(), wait_attempts=4,
                ready_check=lambda: False, sleep=lambda s: None,
            )

    def test_idempotent(self):
        b = FakeBackend(indexes=[{"column": "text", "type": "INVERTED"}])
        assert provision_fulltext_index(b, FulltextIndexSpec()) == "exists"


class TestLanceGate:
    def test_backend_gated_without_lance(self, tmp_path):
        from fancyrag_ray.sources.io import HAVE_LANCE

        if HAVE_LANCE:
            pytest.skip("Lance installed — gate not applicable")
        with pytest.raises(RuntimeError, match="Lance"):
            LanceIndexBackend(str(tmp_path))
