"""Fixed-size chunker over interleaved text+media documents.

Stateless ``map_batches`` stage (Arrow in / Arrow out). One input row
(``doc_id, spans: list<struct<kind,text,media_ref,offset>>``) flattens to
N chunk rows.

Semantics (parity with the reference, re-expressed for interleaved docs):
  * fixed-size split with overlap over the concatenation of the doc's
    *text* spans, in span order — reference splitter wiring
    ``pipelines/kg_ingest.yaml:41-46``, defaults
    ``src/fancyrag/kg/pipeline.py:319-320``;
  * ``approximate=True`` nudges a non-final chunk boundary back to the
    nearest whitespace so no word is cut (library ``approximate: true``);
  * 1-based ``seq`` / 0-based ``index`` per doc (``pipeline.py:544``);
  * ``checksum`` = sha256 hex of chunk text (``pipeline.py:516-517``);
  * ``chunk_uid`` = sha256 hex of ``f"{doc_id}:{seq}:{text}"`` — a
    deterministic content hash replacing the reference's per-run uuid4
    (``caching_fixed_size.py:205-214``), required for idempotent
    partition retries / resume;
  * span carry-through: every chunk row records the kinds and media_refs
    of the input spans overlapping its character range, in input order —
    this is what makes the per-row span-sequence invariant checkable
    downstream (kind, text, media_ref, order preserved vs input).

Media spans occupy a zero-width position at their cumulative text offset;
a media span at position p belongs to chunks whose [start, end) contains
p (trailing media attaches to the final chunk).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..config import ChunkProfile

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_uid", pa.string()),
        ("seq", pa.int32()),
        ("index", pa.int32()),
        ("text", pa.string()),
        ("checksum", pa.string()),
        ("span_kinds", pa.list_(pa.string())),
        ("media_refs", pa.list_(pa.string())),
        ("offset_start", pa.int32()),
        ("offset_end", pa.int32()),
    ]
)


def split_boundaries(n: int, size: int, overlap: int, approximate: bool, text: str = "") -> list[tuple[int, int]]:
    """Chunk [start, end) ranges for a text of length ``n``.

    Exact mode: starts at i*stride for i*stride < max(1, n-overlap) —
    i.e. ``n_chunks = ceil(max(1, n-overlap) / stride)`` (reproducible in
    SQL; see oracle for the ``chunk_documents`` query). Approximate mode
    nudges each non-final end back (≤ overlap//2 chars) to the nearest
    whitespace boundary; the next chunk starts ``overlap`` before that
    nudged end, so coverage and overlap are preserved.
    """
    stride = size - overlap
    if n == 0:
        return [(0, 0)]
    if not approximate:
        last_start = max(1, n - overlap)
        return [(s, min(s + size, n)) for s in range(0, last_start, stride)]
    out: list[tuple[int, int]] = []
    start = 0
    max_nudge = max(1, overlap // 2)
    while True:
        end = start + size
        if end >= n:
            out.append((start, n))
            break
        e = end
        lo = end - max_nudge
        while e > lo and not (text[e - 1].isspace() or text[e].isspace()):
            e -= 1
        if e <= lo:
            e = end  # no boundary found inside the nudge window: keep exact
        out.append((start, e))
        start = max(start + 1, e - overlap)
    return out


def _hash_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def chunk_batch(batch: pa.Table, profile: ChunkProfile) -> pa.Table:
    """Flatten a batch of interleaved docs into chunk rows (1 → N)."""
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    # zero-copy access to the flattened struct children + list offsets
    list_offsets = spans_col.offsets.to_numpy()
    values = spans_col.values
    kinds = values.field("kind").to_pylist()
    texts = values.field("text").to_pylist()
    refs = values.field("media_ref").to_pylist()
    doc_id_arr = batch.column("doc_id")
    doc_ids = doc_id_arr.to_pylist()

    o_doc, o_uid, o_seq, o_idx, o_text, o_ck = [], [], [], [], [], []
    o_kinds, o_refs, o_s, o_e = [], [], [], []

    for r, doc_id in enumerate(doc_ids):
        lo, hi = int(list_offsets[r]), int(list_offsets[r + 1])
        # positions of each span in the concatenated text
        parts: list[str] = []
        span_pos: list[tuple[int, int, int]] = []  # (span_idx, start, end) — media: start==end
        cum = 0
        for j in range(lo, hi):
            t = texts[j] or ""
            if kinds[j] == "text":
                span_pos.append((j, cum, cum + len(t)))
                parts.append(t)
                cum += len(t)
            else:
                span_pos.append((j, cum, cum))
        doc_text = "".join(parts)
        n = len(doc_text)
        did = str(doc_id)
        for idx, (s, e) in enumerate(split_boundaries(n, profile.chunk_size, profile.chunk_overlap, profile.approximate, doc_text)):
            ctext = doc_text[s:e]
            seq = idx + 1
            sk: list[str] = []
            mr: list[str] = []
            for j, a, b in span_pos:
                if a == b:  # media span: point position
                    if s <= a < e or (a == n and e == n):
                        sk.append(kinds[j])
                        if refs[j]:
                            mr.append(refs[j])
                elif a < e and b > s:  # text span: range overlap
                    sk.append(kinds[j])
            o_doc.append(doc_id)
            o_uid.append(_hash_hex(f"{did}:{seq}:{ctext}"))
            o_seq.append(seq)
            o_idx.append(idx)
            o_text.append(ctext)
            o_ck.append(_hash_hex(ctext))
            o_kinds.append(sk)
            o_refs.append(mr)
            o_s.append(s)
            o_e.append(e)

    return pa.table(
        {
            "doc_id": pa.array(o_doc, type=doc_id_arr.type),
            "chunk_uid": pa.array(o_uid, type=pa.string()),
            "seq": pa.array(np.asarray(o_seq, dtype=np.int32)),
            "index": pa.array(np.asarray(o_idx, dtype=np.int32)),
            "text": pa.array(o_text, type=pa.string()),
            "checksum": pa.array(o_ck, type=pa.string()),
            "span_kinds": pa.array(o_kinds, type=pa.list_(pa.string())),
            "media_refs": pa.array(o_refs, type=pa.list_(pa.string())),
            "offset_start": pa.array(np.asarray(o_s, dtype=np.int32)),
            "offset_end": pa.array(np.asarray(o_e, dtype=np.int32)),
        }
    )


def make_chunker(profile: ChunkProfile):
    """Return a ``map_batches``-ready function bound to ``profile``."""

    def _chunk(batch: pa.Table) -> pa.Table:
        return chunk_batch(batch, profile)

    return _chunk
