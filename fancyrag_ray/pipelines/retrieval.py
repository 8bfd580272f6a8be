"""Retrieval / serving surface over the emitted tables.

Parity (SURVEY §2.11): the reference's hybrid retriever joins vector
top-k with fulltext top-k per element id, max-normalizes each score list
(0-safe, ``runtime.py:53-60``), combines, and enriches hits with the
semantic entity neighborhood (``ask_qdrant.py:248-367``). Here the same
queries run against the pipeline's chunk/embedding/node/edge tables:

  vector_topk    O3 — brute-force cosine (exact; per-block partial top-k,
                 tiny global sort); the LSH/IVF path lives in
                 functions.similarity
  fulltext_topk  O4 — deterministic term-frequency scoring (no index)
  hybrid_search  J4 — outer join of the two k-row score tables on
                 chunk_uid, missing side → 0.0, driver-side (k rows)
  semantic_context J5 — semi-join of linked triples against hit uids
                 (broadcast small side)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.embedder import HashEmbedder


def validate_top_k(top_k: int, effective_search_ratio: float = 1.0) -> None:
    """O5 parity (reference ``runtime.py:366-375,397-408``): top_k must be
    a positive integer; the over-fetch ratio must be ≥ 1."""
    if not isinstance(top_k, int) or isinstance(top_k, bool) or top_k < 1:
        raise ValueError(f"top_k must be a positive integer, got {top_k!r}")
    if effective_search_ratio < 1:
        raise ValueError(f"effective_search_ratio must be >= 1, got {effective_search_ratio!r}")


def vector_topk(
    embeddings: rd.Dataset,
    query: np.ndarray,
    k: int = 5,
    id_col: str = "chunk_uid",
    effective_search_ratio: float = 1.0,
) -> pd.DataFrame:
    """O3 parity incl. the reference's over-fetch semantics
    (``runtime.py:30-33``): the vector search retrieves
    ``k * effective_search_ratio`` candidates so the downstream hybrid
    join has a deeper pool to re-rank, and the FINAL top-k cut happens
    after score combination (see :func:`hybrid_search`)."""
    validate_top_k(k, effective_search_ratio)
    fetch = int(np.ceil(k * effective_search_ratio))
    qn = query.astype(np.float64)
    n = np.linalg.norm(qn)
    if n > 0:
        qn /= n

    from ..functions.similarity import _embedding_matrix

    def local(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        scores = (m @ qn) / norms
        take = min(fetch, len(scores))
        sel = np.argpartition(-scores, take - 1)[:take] if take else np.array([], dtype=int)
        return pa.table({id_col: t.column(id_col).take(pa.array(sel)), "score_vector": pa.array(scores[sel])})

    out = (
        embeddings.map_batches(local, batch_format="pyarrow", batch_size=4096)
        .sort(["score_vector", id_col], descending=[True, False])
        .limit(fetch)
    )
    return _ensure_cols(out.to_pandas(), id_col, "score_vector")


def fulltext_topk(chunks: rd.Dataset, query_text: str, k: int = 5, id_col: str = "chunk_uid") -> pd.DataFrame:
    validate_top_k(k)
    terms = [t for t in re.findall(r"[a-z0-9]+", query_text.lower()) if len(t) > 1]
    if not terms:
        return pd.DataFrame({id_col: pd.Series(dtype=object), "score_fulltext": pd.Series(dtype=float)})
    patterns = [rf"\b{re.escape(t)}\b" for t in terms]

    def local(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # columnar TF scoring: one count_substring_regex kernel per query
        # term over the lowercased batch — no per-row Python regex loop
        lowered = pc.utf8_lower(t.column("text"))
        scores = np.zeros(t.num_rows, dtype=np.float64)
        for p in patterns:
            c = pc.count_substring_regex(lowered, p).cast(pa.int64()).to_numpy(zero_copy_only=False)
            scores += np.nan_to_num(c.astype(np.float64))
        keep = scores > 0
        take = min(k, int(keep.sum()))
        if take == 0:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type), "score_fulltext": pa.array([], pa.float64())})
        idx = np.flatnonzero(keep)
        # local cut under the SAME total order as the global sort
        # (score desc, id asc) — integer tf scores tie often, and an
        # argpartition that breaks ties arbitrarily can evict the
        # globally-winning id inside its own block
        ids_np = np.asarray(t.column(id_col).to_pylist(), dtype=object)[idx]
        order = np.lexsort((ids_np, -scores[idx]))[:take]
        sel = idx[order]
        return pa.table({id_col: t.column(id_col).take(pa.array(sel)), "score_fulltext": pa.array(scores[sel])})

    out = (
        chunks.select_columns([id_col, "text"])
        .map_batches(local, batch_format="pyarrow", batch_size=4096)
        .sort(["score_fulltext", id_col], descending=[True, False])
        .limit(k)
    )
    return _ensure_cols(out.to_pandas(), id_col, "score_fulltext")


def _ensure_cols(df: pd.DataFrame, id_col: str, score_col: str) -> pd.DataFrame:
    """A 0-row Ray dataset loses its schema through to_pandas(); restore
    the contract columns so downstream merges don't KeyError."""
    if id_col not in df.columns:
        df = pd.DataFrame({id_col: pd.Series(dtype=object), score_col: pd.Series(dtype=float)})
    return df


def _max_normalize(s: pd.Series) -> pd.Series:
    """0-safe max normalization (reference runtime.py:53-60)."""
    m = s.max()
    return s / m if m and m > 0 else s * 0.0


def hybrid_search(
    chunks: rd.Dataset | None,
    embeddings: rd.Dataset | None,
    query_text: str,
    k: int = 5,
    embed_dim: int = 1024,
    embed_seed: int = 42,
    alpha: float = 0.5,
    effective_search_ratio: float = 1.0,
    vector_index=None,
    fts_index=None,
) -> pd.DataFrame:
    """Vector ∪ fulltext hybrid with per-list max normalization and a
    weighted combined score; returns the top-k hit rows. A ratio > 1
    over-fetches the vector side (``k*ratio`` candidates) and applies
    the final top-k AFTER the hybrid join — reference O3 semantics
    (``runtime.py:30-33,114-140``).

    When ``vector_index`` (an ``IvfChunkIndex``) / ``fts_index`` (an
    ``FtsChunkIndex``) are provided, the corresponding side is served
    from the PROVISIONED index — only the probed IVF cells / posting
    buckets are read, reference serving behavior (``runtime.py:30-38``)
    — and the ``embeddings`` / ``chunks`` datasets may be None. Without
    an index the brute-force scan fallbacks run."""
    validate_top_k(k, effective_search_ratio)
    q = HashEmbedder(dim=embed_dim, seed=embed_seed)._embed_one(query_text)
    fetch = int(np.ceil(k * effective_search_ratio))
    if vector_index is not None:
        v = vector_index.search(q, k=fetch)
        v = _ensure_cols(v, "chunk_uid", "score_vector")
    else:
        v = vector_topk(embeddings, q, k=k, effective_search_ratio=effective_search_ratio)
    if fts_index is not None:
        f = _ensure_cols(fts_index.search(query_text, k=k), "chunk_uid", "score_fulltext")
    else:
        f = fulltext_topk(chunks, query_text, k=k)
    v["score_vector"] = _max_normalize(v["score_vector"]) if len(v) else v.get("score_vector")
    f["score_fulltext"] = _max_normalize(f["score_fulltext"]) if len(f) else f.get("score_fulltext")
    merged = pd.merge(v, f, on="chunk_uid", how="outer").fillna(0.0)
    merged["score"] = alpha * merged["score_vector"] + (1 - alpha) * merged["score_fulltext"]
    merged = merged.sort_values(["score", "chunk_uid"], ascending=[False, True]).head(k).reset_index(drop=True)
    return merged


def hybrid_search_rrf(
    chunks: rd.Dataset | None,
    embeddings: rd.Dataset | None,
    query_text: str,
    k: int = 5,
    rrf_k: int = 60,
    embed_dim: int = 1024,
    embed_seed: int = 42,
    effective_search_ratio: float = 1.0,
) -> pd.DataFrame:
    """Reciprocal-Rank-Fusion hybrid (Cormack et al. 2009) — the
    rank-based alternative to :func:`hybrid_search`'s score-space
    max-normalization: each side contributes ``⌊10⁹/(rrf_k + rank)⌋``
    per hit, summed. Working in integer micro-score space makes the
    fused ordering EXACTLY reproducible across engines/accumulation
    orders (no float normalization); ties break on ascending chunk_uid.
    Same two distributed branches as :func:`hybrid_search` (vector
    top-k over-fetched by ``effective_search_ratio``, fulltext top-k);
    fusion touches only the ≤2k candidate rows on the driver."""
    validate_top_k(k, effective_search_ratio)
    q = HashEmbedder(dim=embed_dim, seed=embed_seed)._embed_one(query_text)
    v = vector_topk(embeddings, q, k=k, effective_search_ratio=effective_search_ratio)
    f = fulltext_topk(chunks, query_text, k=k)
    v = _ensure_cols(v, "chunk_uid", "score_vector")
    f = _ensure_cols(f, "chunk_uid", "score_fulltext")

    def rank_scores(df: pd.DataFrame, score_col: str) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"chunk_uid": pd.Series(dtype=object),
                                 "rrf_micro": pd.Series(dtype="int64")})
        df = df.sort_values([score_col, "chunk_uid"], ascending=[False, True]).reset_index(drop=True)
        rank = np.arange(1, len(df) + 1, dtype=np.int64)
        return pd.DataFrame(
            {"chunk_uid": df["chunk_uid"],
             "rrf_micro": (10**9 // (rrf_k + rank)).astype(np.int64)}
        )

    both = pd.concat([rank_scores(v, "score_vector"), rank_scores(f, "score_fulltext")])
    fused = both.groupby("chunk_uid", as_index=False)["rrf_micro"].sum()
    fused = fused.sort_values(["rrf_micro", "chunk_uid"], ascending=[False, True])
    return fused.head(k).reset_index(drop=True)


def semantic_context(linked: rd.Dataset, hit_chunk_uids: list[str]) -> pd.DataFrame:
    """Entities + relations contributed by the hit chunks (semi-join with
    broadcast hit set; dedup by (subj_id, pred, obj_id))."""
    hits = pa.array(sorted(set(hit_chunk_uids)), pa.string())

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("chunk_uid"), value_set=hits))

    df = linked.map_batches(f, batch_format="pyarrow").to_pandas()
    if df.empty:
        return df
    return (
        df.drop_duplicates(subset=["subj_id", "pred", "obj_id"])
        .sort_values(["subj_id", "pred", "obj_id"])
        .reset_index(drop=True)
    )


def fetch_node(nodes: rd.Dataset, entity_id: str) -> pd.DataFrame:
    """MCP ``fetch`` parity (runtime.py:236-272): one node by id."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("entity_id"), pa.scalar(entity_id)))

    return nodes.map_batches(f, batch_format="pyarrow").to_pandas()
