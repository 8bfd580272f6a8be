"""Chunk embedder — stateful actor-pool stage.

Parity: the reference's embedding stage (``TextChunkEmbedder`` wired at
``pipelines/kg_ingest.yaml:47-52``; retrying client
``src/fancyrag/embeddings.py:34-103``) produces one 1024-d vector per
chunk with a dimension guardrail (``src/cli/utils.py:14-69``). Networked
embedding APIs don't exist in this sandbox, so the default backend is a
deterministic seeded feature-hashing projection: each token is hashed to
a bucket with a ±1 sign, counts are accumulated and L2-normalized. This
is the test/conformance backend; a real model client drops into the same
actor signature (built once in ``__init__``, batched in ``__call__``).

Usage (actor pool — state constructed once per actor, not per batch):

    chunks.map_batches(HashEmbedder, fn_constructor_kwargs={"dim": 1024},
                       batch_format="pyarrow", batch_size=2048,
                       concurrency=4, num_cpus=1)
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa


class HashEmbedder:
    """Deterministic feature-hashing embedder (no network, seed-stable)."""

    _MEMO_LIMIT = 1 << 20  # bound per-actor memo (real corpora: Zipf ⇒ high hit rate)

    def __init__(self, dim: int = 1024, seed: int = 42, text_col: str = "text", keep_cols: tuple[str, ...] = ("chunk_uid",)):
        if dim <= 0:
            raise ValueError("dim must be positive")
        self.dim = dim
        self.seed = seed
        self.text_col = text_col
        self.keep_cols = keep_cols
        self.token_re = re.compile(r"[A-Za-z0-9]+")  # compiled once per actor
        self._memo: dict[str, tuple[int, float]] = {}  # token → (bucket, sign)

    def _tok_feature(self, tok: str) -> tuple[int, float]:
        f = self._memo.get(tok)
        if f is None:
            h = zlib.crc32(f"{self.seed}:{tok}".encode())
            f = (h % self.dim, 1.0 if (h >> 16) & 1 else -1.0)
            if len(self._memo) < self._MEMO_LIMIT:
                self._memo[tok] = f
        return f

    def _embed_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float32)
        feats = [self._tok_feature(t) for t in self.token_re.findall(text.lower())]
        if feats:
            idx = np.fromiter((f[0] for f in feats), dtype=np.int64, count=len(feats))
            sign = np.fromiter((f[1] for f in feats), dtype=np.float32, count=len(feats))
            np.add.at(v, idx, sign)
            n = float(np.linalg.norm(v))
            if n > 0:
                v /= n
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        mat = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            mat[i] = self._embed_one(t or "")
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.reshape(-1), type=pa.float32()), self.dim)
        cols = {c: batch.column(c) for c in self.keep_cols if c in batch.column_names}
        cols["embedding"] = emb
        return pa.table(cols)


def validate_embedding_dim(batch: pa.Table, expected: int, col: str = "embedding") -> pa.Table:
    """Dimension guardrail (reference ``src/cli/utils.py:14-69``): raise if
    any vector's length differs from the declared dimensionality."""
    typ = batch.schema.field(col).type
    if pa.types.is_fixed_size_list(typ):
        if typ.list_size != expected:
            raise ValueError(f"embedding dim {typ.list_size} != expected {expected}")
        return batch
    import pyarrow.compute as pc

    lengths = pc.list_value_length(batch.column(col))
    bad = pc.any(pc.not_equal(lengths, pa.scalar(expected, type=lengths.type))).as_py()
    if bad:
        raise ValueError(f"found embeddings with dim != {expected}")
    return batch
