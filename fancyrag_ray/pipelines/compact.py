"""Incremental ingest: compaction of a new run's graph into an existing
nodes/edges store.

Parity: the reference gets incremental semantics for free from Cypher
``MERGE`` — re-ingesting updates counts on existing nodes/edges instead
of duplicating them (``src/fancyrag/db/neo4j_queries.py:87-108``).
Without a database, MERGE over history becomes a compaction reduce:
union the prior store with the new run's tables and reduce by the MERGE
key with the same associative merge the materializer uses —

  nodes  key (entity_id, label, name):   mentions summed
  edges  key (src_id, type, dst_id):     n_mentions summed,
                                         first_doc min, last_doc max

Associativity ⇒ N sequential ingests produce exactly the same store as
one combined ingest (asserted in tests). The store swap is atomic
(write to a tmp dir, rename over the old version) and versioned in
``store_meta.json`` so a crashed compaction never corrupts the last
good store.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import ray.data as rd

from ..sources.io import read_table, write_table
from ..stages.materialize import tree_aggregate


def _merge_nodes(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["entity_id", "label", "name"]).aggregate([("mentions", "sum")])
    return g.rename_columns(["entity_id", "label", "name", "mentions"])


def _merge_edges(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["src_id", "type", "dst_id"]).aggregate(
        [("n_mentions", "sum"), ("first_doc", "min"), ("last_doc", "max")]
    )
    return g.rename_columns(["src_id", "type", "dst_id", "n_mentions", "first_doc", "last_doc"])


def merge_node_tables(nodes: rd.Dataset, use_sort_shuffle: bool = False) -> rd.Dataset:
    """Reduce an already-partial nodes table by its MERGE key."""
    if use_sort_shuffle:
        from ray.data.aggregate import Sum

        return nodes.groupby(["entity_id", "label", "name"]).aggregate(Sum("mentions", alias_name="mentions"))
    return tree_aggregate(nodes, _merge_nodes)


def merge_edge_tables(edges: rd.Dataset, use_sort_shuffle: bool = False) -> rd.Dataset:
    if use_sort_shuffle:
        from ray.data.aggregate import Max, Min, Sum

        return edges.groupby(["src_id", "type", "dst_id"]).aggregate(
            Sum("n_mentions", alias_name="n_mentions"),
            Min("first_doc", alias_name="first_doc"),
            Max("last_doc", alias_name="last_doc"),
        )
    return tree_aggregate(edges, _merge_edges)


def _store_meta(store_dir: str) -> dict:
    path = os.path.join(store_dir, "store_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"version": 0, "ingests": 0}


def compact_into_store(
    nodes_new: rd.Dataset,
    edges_new: rd.Dataset,
    store_dir: str,
    use_sort_shuffle: bool = False,
) -> dict:
    """MERGE a new run's (already deduplicated) nodes/edges tables into
    the store at ``store_dir``; creates the store on first ingest.
    Returns the updated store metadata."""
    os.makedirs(store_dir, exist_ok=True)
    meta = _store_meta(store_dir)
    nodes_dir = os.path.join(store_dir, "nodes")
    edges_dir = os.path.join(store_dir, "edges")

    if meta["ingests"] > 0:
        nodes_all = read_table(nodes_dir).union(nodes_new)
        edges_all = read_table(edges_dir).union(edges_new)
    else:
        nodes_all, edges_all = nodes_new, edges_new

    nodes_c = merge_node_tables(nodes_all, use_sort_shuffle)
    edges_c = merge_edge_tables(edges_all, use_sort_shuffle)

    # atomic swap: a crash mid-compaction leaves the previous version
    # intact (tmp dirs are cleaned up on the next run)
    tmp_nodes, tmp_edges = nodes_dir + ".tmp", edges_dir + ".tmp"
    for d in (tmp_nodes, tmp_edges):
        shutil.rmtree(d, ignore_errors=True)
    write_table(nodes_c, tmp_nodes)
    write_table(edges_c, tmp_edges)
    for tmp, final in ((tmp_nodes, nodes_dir), (tmp_edges, edges_dir)):
        old = final + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old, ignore_errors=True)

    meta = {"version": meta["version"] + 1, "ingests": meta["ingests"] + 1}
    meta_tmp = os.path.join(store_dir, ".store_meta.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(meta_tmp, os.path.join(store_dir, "store_meta.json"))
    return meta
