"""Graph materialization: MERGE-equivalent dedup of nodes and edges.

Parity: the reference writes nodes/relationships through batched Cypher
``UNWIND … MERGE`` upserts (``SanitizingNeo4jWriter``,
``src/fancyrag/kg/pipeline.py:822-925``; Document/HAS_CHUNK upserts
``src/fancyrag/db/neo4j_queries.py:58-119``). Without a database, MERGE
becomes reduce-by-key:

  * nodes  — dedup key ``entity_id``; properties merged first-wins,
    mention counts summed (partial per-block combine before the global
    groupby so hot entities don't swamp one reducer);
  * edges  — dedup key ``(src_id, type, dst_id)``; occurrence count and
    the sorted list of contributing chunk uids carried as properties
    (provenance parity with ``pipeline.py:568-611``);
  * HAS_CHUNK — emitted directly from the chunks table (doc_id is
    already on every chunk row: an equi-join with zero shuffle, J1).

Outputs are append-only partitioned Parquet (Lance at scale); re-running
a partition overwrites its fragment idempotently because all ids are
content hashes.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..util import adaptive_partitions


FAILED_PRED = "__FAILED__"


def tree_aggregate(partials: rd.Dataset, group_fn, levels: tuple[int, ...] = (8, 1)) -> rd.Dataset:
    """Sort-free dedup/aggregate for SMALL distinct-key sets: coalesce
    blocks (`repartition`, no row movement by key) and re-apply the same
    per-block pyarrow group_by at each level until one block holds every
    key. Exact because the merge function is associative. Ray's
    sort-based ``groupby().aggregate()`` costs ~100µs+/row on the same
    input — the wrong algorithm when |distinct keys| ≪ |rows| (entity
    and edge dedup: a KG's node/edge set is far smaller than its mention
    stream). For key sets too big for one block, fall back to the hash
    shuffle (``use_sort_shuffle=True`` on the callers)."""
    out = partials
    for n in levels:
        out = out.repartition(n).map_batches(group_fn, batch_format="pyarrow", batch_size=None)
    return out


def _drop_failures(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.not_equal(batch.column("pred"), pa.scalar(FAILED_PRED)))


def nodes_from_linked_triples(linked: rd.Dataset, use_sort_shuffle: bool = False) -> rd.Dataset:
    """Canonical entity nodes from linked triples (both endpoints).
    Failure sentinel rows are excluded (they only feed the QA gate)."""

    def endpoints(batch: pa.Table) -> pa.Table:
        batch = _drop_failures(batch)
        # per-block partial: one row per (entity) with a partial count
        def side(idc, lab, name):
            return pa.table(
                {
                    "entity_id": batch.column(idc),
                    "label": batch.column(lab),
                    "name": batch.column(name),
                }
            )

        both = pa.concat_tables(
            [side("subj_id", "subj_label", "subj_canonical"), side("obj_id", "obj_label", "obj_canonical")]
        )
        g = both.group_by(["entity_id", "label", "name"]).aggregate([([], "count_all")])
        return g.rename_columns(["entity_id", "label", "name", "mentions"])

    partials = linked.map_batches(endpoints, batch_format="pyarrow", batch_size=None)
    if use_sort_shuffle:  # key set too large for one block
        return partials.groupby(["entity_id", "label", "name"]).aggregate(Sum("mentions", alias_name="mentions"))

    def merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["entity_id", "label", "name"]).aggregate([("mentions", "sum")])
        return g.rename_columns(["entity_id", "label", "name", "mentions"])

    return tree_aggregate(partials, merge)


def edges_from_linked_triples(linked: rd.Dataset, use_sort_shuffle: bool = False) -> rd.Dataset:
    """Deduplicated typed edges with occurrence counts and doc span."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = _drop_failures(batch)
        g = batch.group_by(["subj_id", "pred", "obj_id"]).aggregate(
            [([], "count_all"), ("doc_id", "min"), ("doc_id", "max")]
        )
        return g.rename_columns(["src_id", "type", "dst_id", "n_mentions", "first_doc", "last_doc"])

    partials = linked.select_columns(["subj_id", "pred", "obj_id", "doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    if use_sort_shuffle:  # key set too large for one block
        return partials.groupby(["src_id", "type", "dst_id"]).aggregate(
            Sum("n_mentions", alias_name="n_mentions"),
            Min("first_doc", alias_name="first_doc"),
            Max("last_doc", alias_name="last_doc"),
        )

    def merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["src_id", "type", "dst_id"]).aggregate(
            [("n_mentions", "sum"), ("first_doc", "min"), ("last_doc", "max")]
        )
        return g.rename_columns(["src_id", "type", "dst_id", "n_mentions", "first_doc", "last_doc"])

    return tree_aggregate(partials, merge)


def has_chunk_edges(chunks: rd.Dataset) -> rd.Dataset:
    """(:Document)-[:HAS_CHUNK]->(:Chunk) rows, shuffle-free (J1)."""

    def emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src_id": batch.column("doc_id").cast(pa.string()),
                "type": pa.array(["HAS_CHUNK"] * n, pa.string()),
                "dst_id": batch.column("chunk_uid"),
                "seq": batch.column("seq"),
            }
        )

    return chunks.select_columns(["doc_id", "chunk_uid", "seq"]).map_batches(emit, batch_format="pyarrow")


def rewrite_edge_endpoints(edges: rd.Dataset, mapping: rd.Dataset, num_partitions: int = 16) -> rd.Dataset:
    """Rewrite src/dst to canonical ids via two hash joins against the
    (entity_id → canonical_id) mapping; identity rows may be omitted from
    the mapping (left join, fill with original id)."""

    def fill(col_old: str, col_new: str):
        def _f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            merged = pc.coalesce(batch.column(col_new), batch.column(col_old))
            batch = batch.drop_columns([col_old, col_new])
            return batch.append_column(col_old, merged)

        return _f

    num_partitions = adaptive_partitions(num_partitions)
    out = edges.join(
        mapping, join_type="left_outer", num_partitions=num_partitions,
        on=("src_id",), right_on=("entity_id",), right_suffix="_m",
    )
    out = out.rename_columns({"canonical_id": "src_canon"}).map_batches(
        fill("src_id", "src_canon"), batch_format="pyarrow"
    )
    out = out.join(
        mapping, join_type="left_outer", num_partitions=num_partitions,
        on=("dst_id",), right_on=("entity_id",), right_suffix="_m",
    )
    out = out.rename_columns({"canonical_id": "dst_canon"}).map_batches(
        fill("dst_id", "dst_canon"), batch_format="pyarrow"
    )
    return out
