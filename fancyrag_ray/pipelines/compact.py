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
from ..state.versioned import VersionedStore


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


# ---------------------------------------------------------------------------
# O(delta) incremental compaction (VERDICT r2 #10).
#
# ``compact_into_store`` re-reduces the FULL store every ingest — the
# union grows monotonically, so at 100 TB the Nth ingest pays for all
# N-1 before it. The bucketed store hash-partitions both tables by
# their MERGE key (``bucket = crc32(key) % n_buckets``, a stable
# function of the key — NOT of the data distribution), so an ingest
# only has to re-reduce the buckets its delta actually touches;
# untouched buckets are carried into the new store version as hardlinks
# (metadata-only). Crash-safety is unchanged: the new version is staged
# completely, then swapped with the same rename dance as the full path.
# ---------------------------------------------------------------------------

import zlib as _zlib


def _bucket_column(t: pa.Table, key_cols: list[str], n_buckets: int) -> pa.Table:
    import pyarrow.compute as _pc

    # idempotent: re-reading hive-partitioned part files can re-infer a
    # `bucket` column from the path on SOME blocks — always recompute
    # from the key so every block carries exactly one, consistently typed
    if "bucket" in t.schema.names:
        t = t.drop_columns(["bucket"])
    joined = _pc.binary_join_element_wise(
        *[t.column(c).cast(pa.string()) for c in key_cols], "\x1f"
    )
    buckets = [(_zlib.crc32(v.encode()) % n_buckets) for v in joined.to_pylist()]
    return t.append_column("bucket", pa.array(buckets, pa.int32()))


_NODE_KEYS = ["entity_id", "label", "name"]
_EDGE_KEYS = ["src_id", "type", "dst_id"]


def _merge_nodes_b(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["bucket"] + _NODE_KEYS).aggregate([("mentions", "sum")])
    return g.rename_columns(["bucket"] + _NODE_KEYS + ["mentions"])


def _merge_edges_b(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["bucket"] + _EDGE_KEYS).aggregate(
        [("n_mentions", "sum"), ("first_doc", "min"), ("last_doc", "max")]
    )
    return g.rename_columns(["bucket"] + _EDGE_KEYS + ["n_mentions", "first_doc", "last_doc"])


def _hardlink_tree(src: str, dst: str) -> None:
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            os.link(os.path.join(root, f), os.path.join(out, f))


def _compact_table_incremental(
    ds_new: rd.Dataset,
    table_dir: str,
    key_cols: list[str],
    merge_fn,
    n_buckets: int,
    next_dir: str | None = None,
) -> dict:
    """Stage ``next_dir`` (default ``{table_dir}.next``): merged touched
    buckets + hardlinked untouched buckets from ``table_dir``. Returns
    {"touched": n, "untouched": n}."""
    new_b = ds_new.map_batches(
        lambda t: _bucket_column(t, key_cols, n_buckets), batch_format="pyarrow"
    ).materialize()
    touched = sorted(int(b) for b in new_b.unique("bucket"))
    next_dir = next_dir or (table_dir + ".next")
    shutil.rmtree(next_dir, ignore_errors=True)
    os.makedirs(next_dir, exist_ok=True)

    existing = set()
    if os.path.isdir(table_dir):
        existing = {d for d in os.listdir(table_dir) if d.startswith("bucket=")}
    touched_names = {f"bucket={b}" for b in touched}
    # untouched buckets: hardlink into the next version (O(#files) metadata)
    for name in sorted(existing - touched_names):
        _hardlink_tree(os.path.join(table_dir, name), os.path.join(next_dir, name))

    # touched buckets: union old rows (re-derive bucket from the key —
    # hive writes strip the partition column) with the delta, reduce once
    import glob as _glob

    old_files: list[str] = []
    for name in sorted(existing & touched_names):
        old_files.extend(sorted(_glob.glob(os.path.join(table_dir, name, "*.parquet"))))
    merged_src = new_b
    if old_files:
        old_ds = read_table(old_files).map_batches(
            lambda t: _bucket_column(t, key_cols, n_buckets), batch_format="pyarrow"
        )
        merged_src = new_b.union(old_ds)
    merged = tree_aggregate(merged_src, merge_fn)
    write_table(merged, next_dir, partition_cols=["bucket"])
    return {"touched": len(touched), "untouched": len(existing - touched_names)}


def compact_incremental(
    nodes_new: rd.Dataset,
    edges_new: rd.Dataset,
    store_dir: str,
    n_buckets: int = 64,
) -> dict:
    """MERGE a new run into a BUCKETED store, re-reducing only the key
    buckets the delta touches. Same associative merge as
    :func:`compact_into_store` ⇒ N incremental ingests produce exactly
    the store one combined ingest would (asserted in tests); the swap is
    the same versioned atomic rename."""
    os.makedirs(store_dir, exist_ok=True)
    meta = _store_meta(store_dir)
    if meta["ingests"] > 0 and meta.get("n_buckets") not in (None, n_buckets):
        raise ValueError(
            f"store was bucketed with n_buckets={meta.get('n_buckets')}; "
            f"got {n_buckets} — bucket count is part of the store layout"
        )
    nodes_dir = os.path.join(store_dir, "nodes")
    edges_dir = os.path.join(store_dir, "edges")
    stats_n = _compact_table_incremental(nodes_new, nodes_dir, _NODE_KEYS, _merge_nodes_b, n_buckets)
    stats_e = _compact_table_incremental(edges_new, edges_dir, _EDGE_KEYS, _merge_edges_b, n_buckets)

    for final in (nodes_dir, edges_dir):
        nxt, old = final + ".next", final + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(nxt, final)
        shutil.rmtree(old, ignore_errors=True)

    meta = {
        "version": meta["version"] + 1,
        "ingests": meta["ingests"] + 1,
        "n_buckets": n_buckets,
        "layout": "bucketed",
    }
    meta_tmp = os.path.join(store_dir, ".store_meta.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(meta_tmp, os.path.join(store_dir, "store_meta.json"))
    return {**meta, "nodes": stats_n, "edges": stats_e}


def read_store_table(store_dir: str, table: str) -> rd.Dataset:
    """Read a store table regardless of layout (flat or bucketed)."""
    return read_table(os.path.join(store_dir, table))


# ---------------------------------------------------------------------------
# Transactionally versioned store (CURRENT-pointer semantics).
#
# ``compact_incremental`` swaps nodes/ and edges/ with two renames — a
# crash between them (or between the swap and the meta write) leaves a
# state a resuming caller cannot classify, so an orchestrator replaying
# a partition could double-count its mentions. ``IncrementalStore``
# closes that: every ingest stages a COMPLETE new version directory
# (untouched buckets hardlinked, touched buckets re-reduced, plus a
# journal of every ingest key applied so far) and then commits it with
# ONE atomic os.replace of the CURRENT pointer file. Any crash before
# the pointer flip leaves CURRENT on the previous version; replaying an
# already-journaled ingest key is a no-op — which is exactly what the
# resumable build needs (each partition compacts exactly once).
# ---------------------------------------------------------------------------


class IncrementalStore(VersionedStore):
    """Hash-bucketed node/edge store on the shared crash-safe
    versioned-store protocol (``state/versioned.py``)."""

    def __init__(self, store_dir: str, n_buckets: int = 64):
        super().__init__(store_dir)
        meta = self.journal()
        if meta is not None and meta.get("n_buckets") != n_buckets:
            raise ValueError(
                f"store was bucketed with n_buckets={meta.get('n_buckets')}; "
                f"got {n_buckets} — bucket count is part of the store layout"
            )
        self.n_buckets = n_buckets

    # back-compat alias (pre-refactor private name)
    def _current_journal(self) -> dict | None:
        return self.journal()

    # -- tables -------------------------------------------------------------

    def table(self, name: str) -> rd.Dataset | None:
        d = self.current_dir()
        if d is None:
            return None
        return read_table(os.path.join(d, name))

    # -- ingest -------------------------------------------------------------

    def ingest(self, nodes_new: rd.Dataset, edges_new: rd.Dataset, key: str) -> dict:
        """Apply one run's (already partially-reduced) nodes/edges under
        an idempotency ``key``. Re-ingesting a journaled key is a no-op."""
        meta = self.journal()
        if meta and key in meta["ingests"]:
            return {**meta, "status": "already_ingested"}
        version = (meta["version"] + 1) if meta else 1
        cur = self.current_dir()
        stage = self.begin(version)
        stats = {}
        for name, ds_new, keys, merge in (
            ("nodes", nodes_new, _NODE_KEYS, _merge_nodes_b),
            ("edges", edges_new, _EDGE_KEYS, _merge_edges_b),
        ):
            src = os.path.join(cur, name) if cur else os.path.join(stage, "_absent")
            stats[name] = _compact_table_incremental(
                ds_new, src, keys, merge, self.n_buckets,
                next_dir=os.path.join(stage, name),
            )
        journal = {
            "version": version,
            "n_buckets": self.n_buckets,
            "ingests": (meta["ingests"] if meta else []) + [key],
        }
        self.commit(stage, version, journal)
        return {**journal, "status": "ingested", "stats": stats}
