"""In-process serving shell over the provisioned stores.

Parity (§2.11): the reference's serving surface is an MCP runtime that
holds its retriever/driver state once at startup (``create_state``,
``src/fancyrag/mcp/runtime.py:77-111``) and answers
``search`` (hybrid vector ∪ fulltext with normalized scores + semantic
context, ``runtime.py:172-233``), ``fetch`` (one node by id, minus its
embedding, ``runtime.py:236-272`` / ``_node_metadata`` :63-74) and a
``health`` endpoint (``servers/mcp_hybrid_google.py:57-70``). HTTP and
OAuth are transport plumbing this engine does not replicate; the
serving SEMANTICS live here as a library object a thin route layer (or
a Ray Serve deployment) can wrap 1:1.

Every lookup is index-backed — nothing scans the corpus per query:
  * vector side: IVF cell store (reads only the probed cells);
  * fulltext side: posting-bucket store (reads only the terms' buckets);
  * node fetch / semantic context: hash-bucketed tables (reads only the
    keys' buckets).
"""

from __future__ import annotations

import os

import pandas as pd

from ..sources.indexes import FtsChunkIndex, IvfChunkIndex
from ..state.kvstore import BucketedTable
from .retrieval import hybrid_search, validate_top_k


class KgServer:
    """Serving state loaded once (the reference builds its retriever
    stack once per process); queries are cheap index probes."""

    def __init__(self, root: str, embed_dim: int = 1024, embed_seed: int = 42):
        self.root = root
        self.vector_index = IvfChunkIndex.load(os.path.join(root, "ivf"))
        self.fts_index = FtsChunkIndex.load(os.path.join(root, "fts"))
        self.nodes = BucketedTable.load(os.path.join(root, "nodes_by_id"))
        self.triples = BucketedTable.load(os.path.join(root, "triples_by_chunk"))
        self.embed_dim = embed_dim
        self.embed_seed = embed_seed

    # -- provisioning -------------------------------------------------------

    @classmethod
    def provision(
        cls,
        chunks,
        embeddings,
        linked,
        nodes,
        out_dir: str,
        embed_dim: int = 1024,
        embed_seed: int = 42,
        n_cells: int = 16,
        n_buckets: int = 16,
    ) -> "KgServer":
        """Build every serving store from the pipeline's output tables
        (S7/S8/S9 provisioning, done once at ingest time)."""
        IvfChunkIndex.build(embeddings, os.path.join(out_dir, "ivf"), n_cells=n_cells)
        FtsChunkIndex.build(chunks, os.path.join(out_dir, "fts"), n_buckets=n_buckets)
        BucketedTable.build(nodes, os.path.join(out_dir, "nodes_by_id"),
                            key_col="entity_id", n_buckets=n_buckets)
        BucketedTable.build(linked, os.path.join(out_dir, "triples_by_chunk"),
                            key_col="chunk_uid", n_buckets=n_buckets)
        return cls(out_dir, embed_dim=embed_dim, embed_seed=embed_seed)

    # -- endpoints ----------------------------------------------------------

    def search(
        self,
        query_text: str,
        top_k: int = 5,
        effective_search_ratio: float = 1.0,
        include_context: bool = True,
    ) -> dict:
        """Hybrid retrieval + optional semantic context (reference
        ``search_sync``, runtime.py:172-233): hits carry the combined
        score and the max-normalized per-list scores; context is the
        deduplicated entity/relation neighborhood of the hit chunks."""
        validate_top_k(top_k, effective_search_ratio)
        hits = hybrid_search(
            None, None, query_text, k=top_k,
            embed_dim=self.embed_dim, embed_seed=self.embed_seed,
            effective_search_ratio=effective_search_ratio,
            vector_index=self.vector_index, fts_index=self.fts_index,
        )
        out = {"hits": hits}
        if include_context:
            uids = hits["chunk_uid"].tolist()
            ctx = self.triples.lookup(uids).to_pandas() if uids else pd.DataFrame()
            if len(ctx) and {"subj_id", "pred", "obj_id"} <= set(ctx.columns):
                ctx = (
                    ctx.drop_duplicates(subset=["subj_id", "pred", "obj_id"])
                    .sort_values(["subj_id", "pred", "obj_id"])
                    .reset_index(drop=True)
                )
            out["context"] = ctx
        return out

    def fetch(self, entity_id: str) -> dict | None:
        """One node by id (runtime.py:236-272), embedding-free
        projection (M13 ``_node_metadata``)."""
        tbl = self.nodes.lookup([entity_id])
        df = tbl.to_pandas() if tbl is not None else pd.DataFrame()
        df = df[df.get("entity_id", pd.Series(dtype=object)) == entity_id] if len(df) else df
        if not len(df):
            return None
        row = df.iloc[0].to_dict()
        row.pop("embedding", None)
        row.pop("bucket", None)
        return row

    def health(self) -> dict:
        """Liveness + store inventory (servers/mcp_hybrid_google.py:57-70)."""
        stores = {
            "ivf": os.path.isdir(os.path.join(self.root, "ivf", "cells")),
            "fts": os.path.isdir(os.path.join(self.root, "fts", "postings")),
            "nodes_by_id": os.path.isdir(os.path.join(self.root, "nodes_by_id", "data")),
            "triples_by_chunk": os.path.isdir(os.path.join(self.root, "triples_by_chunk", "data")),
        }
        return {"status": "ok" if all(stores.values()) else "degraded", "stores": stores}
