"""Vector / fulltext index provisioning at the sink (S8/S9).

Parity: the reference idempotently creates-or-validates a Neo4j vector
index (name/label/property/dims/similarity, mismatch → error, 3 retries
with exponential backoff — ``scripts/create_vector_index.py:334-421``)
and a fulltext index behind a readiness wait loop
(``scripts/create_fulltext_index.py:128-217``). Here the sink is a Lance
dataset: ANN and FTS indexes are built post-write with
``lance.dataset(...).create_index`` / ``create_scalar_index``. Lance is
absent in this sandbox, so the build call is gated on ``HAVE_LANCE`` —
but the full code path (spec validation, existing-index discovery,
mismatch detection, retry loop) is real and unit-tested through an
injectable backend; the serving-side brute-force fallbacks live in
``pipelines.retrieval``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from .io import HAVE_LANCE


class IndexMismatchError(RuntimeError):
    """Existing index disagrees with the requested spec (reference
    ``create_vector_index.py:385-405`` raises rather than clobbering)."""


@dataclass(frozen=True)
class VectorIndexSpec:
    column: str = "embedding"
    dimensions: int = 1024
    metric: str = "cosine"  # reference default (create_vector_index.py:56)
    index_type: str = "IVF_PQ"
    num_partitions: int = 256

    def validate(self) -> None:
        if self.dimensions <= 0:
            raise ValueError("dimensions must be positive")
        if self.metric not in ("cosine", "l2", "dot"):
            raise ValueError(f"unsupported metric {self.metric!r}")


@dataclass(frozen=True)
class FulltextIndexSpec:
    column: str = "text"
    index_type: str = "INVERTED"


class LanceIndexBackend:
    """Real backend: builds indexes on a Lance dataset. Only importable
    when Lance is installed (at-scale deployments); the provisioning
    logic above it is backend-agnostic and tested with a fake."""

    def __init__(self, uri: str):
        if not HAVE_LANCE:
            raise RuntimeError("Lance is not installed — vector/FTS index build unavailable")
        import lance

        self.ds = lance.dataset(uri)

    def list_indexes(self) -> list[dict]:
        return [
            {"column": idx["fields"][0] if idx.get("fields") else None, "type": idx.get("type")}
            for idx in self.ds.list_indices()
        ]

    def column_dimensions(self, column: str) -> int:
        import pyarrow as pa

        field = self.ds.schema.field(column)
        if pa.types.is_fixed_size_list(field.type):
            return field.type.list_size
        raise IndexMismatchError(f"column {column!r} is not a fixed-size vector column")

    def create_vector_index(self, spec: VectorIndexSpec) -> None:
        self.ds.create_index(
            spec.column,
            index_type=spec.index_type,
            metric=spec.metric,
            num_partitions=spec.num_partitions,
        )

    def create_fulltext_index(self, spec: FulltextIndexSpec) -> None:
        self.ds.create_scalar_index(spec.column, index_type=spec.index_type)


def provision_vector_index(
    backend,
    spec: VectorIndexSpec,
    max_attempts: int = 3,
    base_backoff_s: float = 0.5,
    sleep=time.sleep,
) -> str:
    """Create-or-validate, idempotent (reference semantics):
      * index already present on the column → validate dims/metric spec
        against the stored column; mismatch → IndexMismatchError;
      * absent → create, retrying ``max_attempts`` times with exponential
        backoff (transient sink errors — ``create_vector_index.py:406-421``).
    Returns "exists" | "created".
    """
    spec.validate()
    dims = backend.column_dimensions(spec.column)
    if dims != spec.dimensions:
        raise IndexMismatchError(
            f"vector column {spec.column!r} has {dims} dims, spec wants {spec.dimensions}"
        )
    existing = [i for i in backend.list_indexes() if i.get("column") == spec.column]
    if existing:
        return "exists"
    last: Exception | None = None
    for attempt in range(max_attempts):
        try:
            backend.create_vector_index(spec)
            return "created"
        except IndexMismatchError:
            raise
        except Exception as exc:  # transient sink failure → retry
            last = exc
            if attempt + 1 < max_attempts:
                sleep(base_backoff_s * (2**attempt))
    raise RuntimeError(f"vector index creation failed after {max_attempts} attempts") from last


def provision_fulltext_index(
    backend,
    spec: FulltextIndexSpec,
    wait_attempts: int = 10,
    wait_delay_s: float = 3.0,
    ready_check=None,
    sleep=time.sleep,
) -> str:
    """Readiness-gated idempotent FTS index creation (reference
    ``create_fulltext_index.py:100-113,186-217``): poll ``ready_check``
    up to ``wait_attempts`` × ``wait_delay_s``, then create-or-skip."""
    if ready_check is not None:
        for attempt in range(wait_attempts):
            if ready_check():
                break
            if attempt + 1 < wait_attempts:
                sleep(wait_delay_s)
        else:
            raise RuntimeError(f"sink not ready after {wait_attempts} attempts")
    existing = [i for i in backend.list_indexes() if i.get("column") == spec.column]
    if existing:
        return "exists"
    backend.create_fulltext_index(spec)
    return "created"
