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

    The metadata side is broadcast (``ray.put`` once, dict probe per
    batch) rather than joined: pyarrow's hash join rejects
    ``fixed_size_list`` payload columns, and the metadata map is small
    relative to the vectors. At a scale where it isn't, bucket both
    sides by ``hash(chunk_uid)`` and zip buckets pairwise."""
    import ray

    meta_df = chunks.select_columns(["chunk_uid", "doc_id", "seq", "text"]).to_pandas()
    meta_ref = ray.put(
        {
            u: (d, int(s), t)
            for u, d, s, t in zip(meta_df["chunk_uid"], meta_df["doc_id"], meta_df["seq"], meta_df["text"])
        }
    )
    doc_id_type = pa.array(meta_df["doc_id"].head(1)).type if len(meta_df) else pa.string()

    def attach(batch: pa.Table) -> pa.Table:
        meta = ray.get(meta_ref)
        uids = batch.column("chunk_uid").to_pylist()
        rows = [meta.get(u, (None, -1, "")) for u in uids]
        return (
            batch.append_column("doc_id", pa.array([r[0] for r in rows], doc_id_type))
            .append_column("seq", pa.array([r[1] for r in rows], pa.int32()))
            .append_column("text", pa.array([r[2] for r in rows], pa.string()))
        )

    ordered = embeddings.map_batches(attach, batch_format="pyarrow").sort(["doc_id", "seq"])
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
