"""Chunking profiles and pipeline configuration.

Parity: the reference's profile presets (text 600/100, markdown 800/120,
code 400/40 chars) at ``src/fancyrag/kg/pipeline.py:328-359`` and the QA
gate thresholds (all default 0) at ``pipeline.py:362-370``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ChunkProfile:
    """Fixed-size chunking preset.

    ``approximate=True`` nudges chunk boundaries off mid-word (semantics of
    the pinned library splitter's ``approximate: true``,
    ``pipelines/kg_ingest.yaml:44-46``); ``False`` gives exact character
    boundaries (used where a SQL oracle must reproduce the split).
    """

    name: str
    chunk_size: int
    chunk_overlap: int
    approximate: bool = True

    def __post_init__(self) -> None:
        if self.chunk_size <= 0:
            raise ValueError("chunk_size must be positive")
        if not (0 <= self.chunk_overlap < self.chunk_size):
            raise ValueError("chunk_overlap must be in [0, chunk_size)")

    @property
    def stride(self) -> int:
        return self.chunk_size - self.chunk_overlap


PROFILES: dict[str, ChunkProfile] = {
    "text": ChunkProfile("text", 600, 100),
    "markdown": ChunkProfile("markdown", 800, 120),
    "code": ChunkProfile("code", 400, 40),
    # exact-boundary variant of "text" for DuckDB-oracle comparability
    "text-exact": ChunkProfile("text-exact", 600, 100, approximate=False),
}


@dataclass(frozen=True)
class QaThresholds:
    """QA gate limits (reference defaults: everything must be 0,
    ``pipeline.py:362-370``)."""

    max_missing_embeddings: int = 0
    max_orphan_chunks: int = 0
    max_checksum_mismatches: int = 0
    max_duplicate_uids: int = 0
    max_semantic_failures: int = 0


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for the flagship KG-construction pipeline.

    Sized for a multi-node cluster: per-stage actor-pool ``concurrency``
    and ``batch_size`` are explicit so no stage starves the others; the
    shuffle partition count is chosen once and reused for every keyed
    exchange so co-partitioning is preserved.
    """

    profile: ChunkProfile = PROFILES["text"]
    embed_dim: int = 1024  # reference default, src/config/settings.py:26
    embed_seed: int = 42
    chunk_batch_size: int = 1024  # docs per chunker batch
    embed_batch_size: int = 2048  # chunks per embedder batch
    extract_batch_size: int = 2048
    embed_concurrency: int = 4  # actor-pool size; scaled by caller to node
    extract_concurrency: int = 4
    shuffle_partitions: int = 64
    qa: QaThresholds = field(default_factory=QaThresholds)
