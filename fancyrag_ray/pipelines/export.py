"""Vector-store export — the reference's Qdrant exporter re-expressed.

Parity (S7, ``scripts/export_to_qdrant.py:32-269``): read chunks with
embeddings ordered by chunk index, validate dimensionality, coerce point
ids (int if digits else string, M12 ``:86-109``), and upsert in batches
of 256 through a stateful client. Here the "vector store" is a pluggable
sink actor — the default writes partitioned parquet (one part per batch
group), a real Qdrant/Lance client drops into the same ``__call__``.

Scale notes: the global (doc_id, seq) sort is the only all-to-all
exchange and exists for O2 export-ordering parity; the upsert stage is
an actor pool with the client built once per actor.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..stages.embedder import validate_embedding_dim


def coerce_point_id(chunk_id: str, fallback: int) -> int | str:
    """chunk_id → int if all digits else str (reference M12)."""
    if chunk_id is None:
        return fallback
    s = str(chunk_id)
    return int(s) if s.isdigit() else s


class ParquetUpsertSink:
    """Batched 'upsert' writer: one part file per received batch, named
    by content hash → idempotent re-runs overwrite identically."""

    def __init__(self, out_dir: str, expected_dim: int):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.expected_dim = expected_dim
        self._counter = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        validate_embedding_dim(batch, self.expected_dim)
        ids = [coerce_point_id(u, i) for i, u in enumerate(batch.column("chunk_uid").to_pylist())]
        batch = batch.append_column("point_id", pa.array([str(x) for x in ids], pa.string()))
        key = hashlib.sha256("".join(str(x) for x in ids[:16]).encode()).hexdigest()[:12]
        pq.write_table(batch, os.path.join(self.out_dir, f"part-{key}.parquet"))
        return pa.table({"points_upserted": pa.array([batch.num_rows], pa.int64())})


def export_embeddings(
    chunks: rd.Dataset,
    embeddings: rd.Dataset,
    out_dir: str,
    expected_dim: int,
    batch_size: int = 256,
) -> int:
    """Attach chunk metadata to embeddings, order by (doc_id, seq) (O2),
    validate dims, and push through the batched sink. Returns the total
    points upserted.

    Fully distributed: metadata attaches via a hash-partitioned
    ``Dataset.join`` on ``chunk_uid`` — no driver-side materialization
    of either side. The hash join rejects ``fixed_size_list`` payload
    columns, so each vector rides through the join as a binary blob
    (dim × 4 bytes, zero-copy numpy view on both ends) and is restored
    to ``fixed_size_list<float32>`` after."""
    import numpy as np

    from ..util import adaptive_partitions

    width = expected_dim * 4

    def pack(batch: pa.Table) -> pa.Table:
        validate_embedding_dim(batch, expected_dim)
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
        n = batch.num_rows
        offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * width).tobytes())
        blob_arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, pa.py_buffer(flat.tobytes())])
        return pa.table({"chunk_uid": batch.column("chunk_uid"), "emb_blob": blob_arr})

    packed = embeddings.map_batches(pack, batch_format="pyarrow")
    meta = chunks.select_columns(["chunk_uid", "doc_id", "seq", "text"])
    joined = packed.join(
        meta, join_type="inner", num_partitions=adaptive_partitions(16),
        on=("chunk_uid",), right_suffix="_m",
    )

    def unpack(batch: pa.Table) -> pa.Table:
        blob = batch.column("emb_blob")
        if isinstance(blob, pa.ChunkedArray):
            blob = blob.combine_chunks()
        n = len(blob)
        if n:
            # vectorized gather honoring offsets (rows may be non-contiguous
            # after the join's row re-ordering)
            off = np.frombuffer(blob.buffers()[1], dtype=np.int32)[blob.offset : blob.offset + n + 1]
            raw = np.frombuffer(blob.buffers()[2], dtype=np.uint8)
            idx = (off[:-1].astype(np.int64)[:, None] + np.arange(width, dtype=np.int64)[None, :]).reshape(-1)
            mat = raw[idx].view(np.float32)
        else:
            mat = np.empty(0, np.float32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat, type=pa.float32()), expected_dim)
        out = batch.drop_columns(["emb_blob"])
        return out.append_column("embedding", emb)

    ordered = joined.map_batches(unpack, batch_format="pyarrow").sort(["doc_id", "seq"])
    counts = ordered.map_batches(
        ParquetUpsertSink,
        fn_constructor_kwargs={"out_dir": out_dir, "expected_dim": expected_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
        num_cpus=1,
    )
    import pyarrow.compute as pc

    total = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b.column("points_upserted")).as_py() or 0)
    return total
