"""Cross-run incremental exact dedup against a persistent seen-key store.

Reference parity: FancyRAG makes re-ingesting the same source a no-op at
the GRAPH store — every chunk upsert is a Cypher ``MERGE`` keyed on the
content checksum (reference ``src/fancyrag/db/neo4j_queries.py:87-108``),
so duplicates are absorbed after the expensive work (embed, extract) has
already been paid for. At 100 TB the dedup must happen BEFORE those
stages: a crawl re-visit or an overlapping dump should cost O(delta), not
O(corpus), and definitely not an embedding call per already-seen row.

Design (all Ray-Data, no driver loops over rows):

* ``SeenKeyStore`` — a versioned parquet store of every key ever
  ingested, hive-partitioned by ``crc32(key) % n_buckets`` (the same
  bucket function as the incremental graph store in ``compact.py``, so
  one layout convention serves both). Versions are immutable; an ingest
  stages ``v{N+1}`` with only the delta-touched buckets rewritten and
  every untouched bucket HARDLINKED from ``v{N}`` (O(#files) metadata,
  zero data copy), then commits with one atomic ``CURRENT`` pointer
  flip — crash mid-ingest leaves the old version live.
* ``filter_fresh`` — the read side prunes at the bucket level: the
  delta's keys hash to a set of buckets, and ONLY those bucket
  directories of the store are read (O(|delta| × corpus/n_buckets) IO).
  Within-delta duplicates collapse to the first occurrence (min
  ``order_col``) via one hash co-partition by bucket (same-key rows
  co-locate because key → bucket) and a vectorized per-block
  sort + adjacent-shift mask — no per-row Python.
* Store-side anti-join tiers by the shared byte budget
  (``util.fits_broadcast``): small touched-key sets broadcast as an
  Arrow ``value_set`` probed with ``pc.is_in``; larger ones take a hash
  ``left_anti`` join.

At scale: ``n_buckets`` should be sized so one bucket of keys fits a
worker block (keys are ~16-64 B; 4096 buckets hold ~10^12 keys at
~4 GB/bucket of raw key bytes — set ``n_buckets`` at store creation,
it is part of the on-disk layout and cannot change afterwards).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import (
    adaptive_partitions,
    dataset_mean_row_bytes,
    fits_broadcast,
    hash_partitioned_combine,
)
from ..state.versioned import VersionedStore
from .compact import _bucket_column, _hardlink_tree


def _keep_first_per_key(key_col: str, order_col: str):
    """Per-block combine: one row per key, the one with min(order_col).
    Runs after a hash co-partition by ``bucket`` so every occurrence of a
    key is in exactly one block — the block-local first IS the global
    first. Vectorized: sort by (key, order), keep rows whose key differs
    from the previous row's."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), (order_col, "ascending")]
        )
        t2 = t.take(idx)
        k = t2.column(key_col).combine_chunks()
        neq = pc.not_equal(k.slice(1), k.slice(0, t2.num_rows - 1))
        mask = pa.chunked_array([pa.array([True]), neq])
        return t2.filter(mask)

    return f


class SeenKeyStore(VersionedStore):
    """Versioned, hash-bucketed store of already-ingested keys on the
    shared crash-safe versioned-store protocol (``state/versioned.py``,
    same machinery as ``compact.IncrementalStore``)."""

    def __init__(self, root: str, key_col: str, n_buckets: int = 64):
        super().__init__(root)
        meta = self.journal()
        if meta is not None:
            if meta["n_buckets"] != n_buckets or meta["key_col"] != key_col:
                raise ValueError(
                    f"store layout is key_col={meta['key_col']!r}, "
                    f"n_buckets={meta['n_buckets']}; got {key_col!r}/{n_buckets} "
                    "— both are part of the on-disk layout"
                )
        self.key_col = key_col
        self.n_buckets = n_buckets
        self.last_stats: dict = {}

    # back-compat alias (pre-refactor private name)
    def _journal(self) -> dict | None:
        return self.journal()

    # -- read side ----------------------------------------------------------

    def filter_fresh(self, delta: rd.Dataset, order_col: str) -> rd.Dataset:
        """Rows of ``delta`` whose key was never ingested, one row per
        key (first by ``order_col``). Reads only the store buckets the
        delta's keys hash into."""
        key = self.key_col
        delta_b = delta.map_batches(
            lambda t: _bucket_column(t, [key], self.n_buckets),
            batch_format="pyarrow",
        ).materialize()
        n_delta = delta_b.count()
        if n_delta == 0:
            self.last_stats = {"buckets_read": 0, "buckets_total": self.n_buckets}
            return delta_b
        firsts = hash_partitioned_combine(
            delta_b,
            ["bucket"],
            _keep_first_per_key(key, order_col),
            adaptive_partitions(16, n_rows=n_delta),
        ).materialize()

        cur = self.current_dir()
        touched = sorted(int(b) for b in firsts.unique("bucket"))
        files: list[str] = []
        dirs_read = 0
        if cur is not None:
            for b in touched:
                d = os.path.join(cur, "keys", f"bucket={b}")
                if os.path.isdir(d):
                    dirs_read += 1
                    files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        self.last_stats = {"buckets_read": dirs_read, "buckets_total": self.n_buckets}
        out = firsts
        if files:
            seen = rd.read_parquet(files, columns=[key]).materialize()
            n_seen = seen.count()
            if fits_broadcast(n_seen, dataset_mean_row_bytes(seen, n_seen)):
                value_set = pa.array(seen.unique(key))

                def anti(t: pa.Table) -> pa.Table:
                    col = t.column(key)
                    return t.filter(
                        pc.invert(pc.is_in(col, value_set=value_set.cast(col.type)))
                    )

                out = firsts.map_batches(anti, batch_format="pyarrow")
            else:
                out = firsts.join(
                    seen,
                    join_type="left_anti",
                    num_partitions=adaptive_partitions(16, n_rows=n_delta),
                    on=(key,),
                )
        return out.drop_columns(["bucket"])

    def _merge_touched_buckets(self, keys_new: rd.Dataset, old_dir: str | None, next_dir: str) -> dict:
        """Stage ``next_dir``: distinct(old ∪ new) for delta-touched
        buckets, hardlinks for the rest. Unlike the graph store's
        ``tree_aggregate`` merge (right when |distinct keys| ≪ |rows|),
        the seen-key set IS the corpus — so the distinct runs as a hash
        co-partition by bucket and no block ever exceeds one bucket."""
        key = self.key_col
        new_b = keys_new.map_batches(
            lambda t: _bucket_column(t, [key], self.n_buckets), batch_format="pyarrow"
        ).materialize()
        touched = sorted(int(b) for b in new_b.unique("bucket")) if new_b.count() else []
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)
        existing = set()
        if old_dir and os.path.isdir(old_dir):
            existing = {d for d in os.listdir(old_dir) if d.startswith("bucket=")}
        touched_names = {f"bucket={b}" for b in touched}
        for name in sorted(existing - touched_names):
            _hardlink_tree(os.path.join(old_dir, name), os.path.join(next_dir, name))
        if not touched:  # zero fresh keys: the new version is all hardlinks
            return {"touched": 0, "untouched": len(existing)}

        old_files: list[str] = []
        for name in sorted(existing & touched_names):
            old_files.extend(sorted(glob.glob(os.path.join(old_dir, name, "*.parquet"))))
        merged_src = new_b
        if old_files:
            old_ds = rd.read_parquet(old_files, columns=[key]).map_batches(
                lambda t: _bucket_column(t, [key], self.n_buckets), batch_format="pyarrow"
            )
            merged_src = new_b.union(old_ds)
        n_rows = merged_src.count() if old_files else new_b.count()

        def distinct(t: pa.Table) -> pa.Table:
            return t.group_by(["bucket", key]).aggregate([])

        merged = hash_partitioned_combine(
            merged_src, ["bucket"], distinct, adaptive_partitions(16, n_rows=n_rows)
        )
        merged.write_parquet(next_dir, partition_cols=["bucket"])
        return {"touched": len(touched), "untouched": len(existing - touched_names)}

    # -- write side ---------------------------------------------------------

    def ingest(self, fresh: rd.Dataset, ingest_key: str) -> dict:
        """Commit ``fresh``'s keys under an idempotency ``ingest_key``;
        re-ingesting a journaled key is a no-op. Only delta-touched
        buckets are rewritten; the rest hardlink into the new version."""
        meta = self.journal()
        if meta and ingest_key in meta["ingests"]:
            return {**meta, "status": "already_ingested"}
        version = (meta["version"] + 1) if meta else 1
        cur = self.current_dir()
        stage = self.begin(version)

        stats = self._merge_touched_buckets(
            fresh.select_columns([self.key_col]),
            old_dir=os.path.join(cur, "keys") if cur else None,
            next_dir=os.path.join(stage, "keys"),
        )
        journal = {
            "version": version,
            "n_buckets": self.n_buckets,
            "key_col": self.key_col,
            "ingests": (meta["ingests"] if meta else []) + [ingest_key],
        }
        self.commit(stage, version, journal)
        return {**journal, "status": "ingested", "stats": stats}


# DuckDB oracle for the driver's `dedup_incremental_documents` query:
# run A = even doc_ids (ingested), run B = odd doc_ids (filtered).
# Mirrors filter_fresh exactly: within-delta keep-first by min(doc_id),
# then anti-join against run A's distinct checksums.
INGEST_DEDUP_SQL = """
WITH seen AS (
  SELECT DISTINCT md5(text) AS checksum FROM documents WHERE doc_id % 2 = 0
), delta AS (
  SELECT doc_id, md5(text) AS checksum FROM documents WHERE doc_id % 2 = 1
), firsts AS (
  SELECT min(doc_id) AS doc_id, checksum FROM delta GROUP BY checksum
)
SELECT f.doc_id, f.checksum
FROM firsts f LEFT JOIN seen s USING (checksum)
WHERE s.checksum IS NULL
"""


def dedup_against_store(
    delta: rd.Dataset,
    store_dir: str,
    key_col: str,
    order_col: str,
    ingest_key: str | None = None,
    n_buckets: int = 64,
) -> tuple[rd.Dataset, dict]:
    """One-call form: fresh rows of ``delta`` vs the store at
    ``store_dir``; when ``ingest_key`` is given the fresh keys are
    committed so the next run skips them. Returns (fresh, stats)."""
    store = SeenKeyStore(store_dir, key_col=key_col, n_buckets=n_buckets)
    fresh = store.filter_fresh(delta, order_col=order_col)
    stats = dict(store.last_stats)
    if ingest_key is not None:
        fresh = fresh.materialize()  # consumed twice: ingest + caller
        stats["ingest"] = store.ingest(fresh, ingest_key)
    return fresh, stats
