"""Hash-bucketed parquet table for serving-side point lookups.

The serving shell (reference MCP runtime, ``src/fancyrag/mcp/
runtime.py:236-272`` ``fetch``; semantic-context semi-join
``scripts/ask_qdrant.py:248-367``) needs key→rows lookups over tables
that do not fit the driver. A ``BucketedTable`` is written ONCE,
hive-partitioned by ``crc32(key) % n_buckets``; a lookup reads only the
bucket directories its keys hash to — O(total/n_buckets) IO per query
instead of a full scan, the same partitioned-parquet idiom as the IVF /
FTS index stores (``sources/indexes.py``). At 100 TB the buckets are
Lance fragments and lookups become indexed takes.
"""

from __future__ import annotations

import glob
import json
import os
import zlib

import pyarrow as pa


def _bucket_of(key: str, n_buckets: int) -> int:
    return zlib.crc32(str(key).encode()) % n_buckets


class BucketedTable:
    def __init__(self, root: str, key_col: str, n_buckets: int):
        self.root = root
        self.key_col = key_col
        self.n_buckets = n_buckets
        self.last_stats: dict = {}

    @classmethod
    def build(cls, ds, out_dir: str, key_col: str, n_buckets: int = 64) -> "BucketedTable":
        def add_bucket(t: pa.Table) -> pa.Table:
            # crc32 per key is required (the read side prunes with the
            # same _bucket_of), but the string materialization is one
            # vectorized cast, not a per-row str() call
            import pyarrow.compute as pc

            keys = pc.cast(t.column(key_col), pa.string()).to_pylist()
            buckets = [zlib.crc32(k.encode()) % n_buckets for k in keys]
            return t.append_column("bucket", pa.array(buckets, pa.int32()))

        os.makedirs(out_dir, exist_ok=True)
        ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
            os.path.join(out_dir, "data"), partition_cols=["bucket"]
        )
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"key_col": key_col, "n_buckets": int(n_buckets)}, f, sort_keys=True)
        return cls(out_dir, key_col, n_buckets)

    @classmethod
    def load(cls, root: str) -> "BucketedTable":
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        return cls(root, meta["key_col"], meta["n_buckets"])

    def lookup(self, keys: list) -> pa.Table:
        """All rows whose key is in ``keys`` — reads only the buckets
        those keys hash to (file list, not dirs: hive expansion over a
        mixed dir list is unreliable)."""
        import pyarrow.parquet as pq

        want = {str(k) for k in keys}
        buckets = sorted({_bucket_of(k, self.n_buckets) for k in want})
        files: list[str] = []
        n_dirs = 0
        for b in buckets:
            d = os.path.join(self.root, "data", f"bucket={b}")
            if os.path.isdir(d):
                n_dirs += 1
                files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        self.last_stats = {"buckets_read": n_dirs, "buckets_total": self.n_buckets}
        if not files:
            # schema-stable empty result: borrow the schema from any
            # part file of the store
            any_file = sorted(glob.glob(os.path.join(self.root, "data", "bucket=*", "*.parquet")))
            if not any_file:
                return pa.table({self.key_col: pa.array([], pa.string())})
            return pq.read_table(any_file[0]).slice(0, 0)
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        import pyarrow.compute as pc

        keys_str = pc.cast(tbl.column(self.key_col), pa.string())
        mask = pc.is_in(keys_str, value_set=pa.array(sorted(want), pa.string()))
        return tbl.filter(mask)
