"""Near-duplicate detection over text: MinHash+LSH, SimHash, and n-gram
Jaccard verification — the training-data-pipeline dedup suite.

Shapes (all streaming, shuffle only on band/bucket keys):
  MinHash-LSH: shingle → minhash signature per batch (vectorized numpy)
  → explode to (band_id, band_hash, doc_id) rows → groupby the band key
  → candidate pairs per bucket → exact Jaccard verify → connected
  components → keep min doc per component.
  SimHash: 64-bit weighted token fingerprint; near-dup iff Hamming
  distance ≤ k, found by banding the 64 bits into 4 tables (any match on
  a 16-bit band ⇒ candidate; guaranteed for hd ≤ 3 by pigeonhole).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.canonicalize import connected_components

_M61 = (1 << 61) - 1


def _shingles(text: str, n: int = 3) -> np.ndarray:
    """Hashed word n-gram shingle set (crc32 — fast, deterministic)."""
    words = text.split()
    if len(words) < n:
        joined = " ".join(words)
        return np.array([zlib.crc32(joined.encode())], dtype=np.uint64)
    out = {zlib.crc32(" ".join(words[i : i + n]).encode()) for i in range(len(words) - n + 1)}
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """Vectorized minhash: sig[i] = min over shingles of (a_i*x+b_i mod p).
    Parameters are seeded once per actor."""

    def __init__(self, n_hashes: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=n_hashes, dtype=np.uint64)
        self.n_hashes = n_hashes

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        # (n_shingles, n_hashes) universal hashing in uint64 (mod 2^64
        # wraparound is fine for min-comparison purposes)
        vals = shingles[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)


def minhash_lsh_duplicates(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    n_bands: int = 16,
    jaccard_threshold: float = 0.8,
    shingle_n: int = 3,
) -> rd.Dataset:
    """Returns (doc_id, keep) rows: one row per doc in a near-dup cluster,
    with ``keep`` = the cluster's canonical (minimum) doc id."""
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands

    class BandEmitter:
        def __init__(self):
            self.hasher = MinHasher(n_hashes=n_hashes)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            o_band, o_hash, o_id, o_sig = [], [], [], []
            for d, x in zip(ids, texts):
                sig = self.hasher.signature(_shingles(x or "", shingle_n))
                sig_bytes = sig.tobytes()
                for b in range(n_bands):
                    band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    o_band.append(b)
                    o_hash.append(hashlib.sha1(band.tobytes()).hexdigest()[:16])
                    o_id.append(d)
                    o_sig.append(sig_bytes)
            return pa.table(
                {
                    "band": pa.array(o_band, pa.int32()),
                    "band_hash": pa.array(o_hash, pa.string()),
                    id_col: pa.array(o_id),
                    "sig": pa.array(o_sig, pa.binary()),
                }
            )

    bands = docs.select_columns([id_col, text_col]).map_batches(
        BandEmitter, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    ).materialize()  # consumed twice: bucket-size scan + filtered pair walk

    # Bucket-size prefilter: near-dup buckets are sparse, so find the
    # multi-member (band, band_hash) keys with a cheap count aggregate,
    # broadcast that small set, and run the O(n²) pair verification ONLY
    # on rows in those buckets. Without this, map_groups pays a Python
    # call per bucket across millions of singleton buckets.
    from ray.data.aggregate import Count as _Count

    counts = (
        bands.select_columns(["band", "band_hash"])
        .groupby(["band", "band_hash"])
        .aggregate(_Count(alias_name="n"))
    )
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t.column("n"), pa.scalar(1))).select(["band", "band_hash"]),
        batch_format="pyarrow",
    ).to_pandas()
    hot_keys = set(zip(hot["band"].tolist(), hot["band_hash"].tolist()))
    if not hot_keys:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.string()), "keep": pa.array([], pa.string())})
        )

    def only_hot(t: pa.Table) -> pa.Table:
        b = t.column("band").to_pylist()
        h = t.column("band_hash").to_pylist()
        mask = pa.array([(x, y) in hot_keys for x, y in zip(b, h)], pa.bool_())
        return t.filter(mask)

    bands = bands.map_batches(only_hot, batch_format="pyarrow")

    def candidate_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"src": pd.Series(dtype=object), "dst": pd.Series(dtype=object)})
        df = df.sort_values(id_col)
        ids = df[id_col].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in df["sig"]]
        src, dst = [], []
        # verify candidates by estimated Jaccard from full signatures
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                est = float((sigs[i] == sigs[j]).mean())
                if est >= jaccard_threshold:
                    src.append(str(ids[i]))
                    dst.append(str(ids[j]))
        return pd.DataFrame({"src": src, "dst": dst}).astype({"src": object, "dst": object})

    edges = bands.groupby(["band", "band_hash"]).map_groups(candidate_pairs, batch_format="pandas")
    comps = connected_components(edges, src_col="src", dst_col="dst")
    return comps.rename_columns({"node": "doc_id", "component": "keep"})


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard (the verification metric)."""
    sa, sb = set(_shingles(a, n).tolist()), set(_shingles(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class SimHasher:
    """64-bit SimHash over word tokens (weight = term frequency)."""

    BITS = 64

    def fingerprint(self, text: str) -> int:
        acc = np.zeros(self.BITS, dtype=np.int64)
        shifts = np.arange(self.BITS, dtype=np.uint64)
        for w in text.split():
            h = np.uint64(int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))


def simhash_duplicates(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> rd.Dataset:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.
    4-way banding: any pair within distance 3 shares at least one intact
    16-bit quarter (pigeonhole), so grouping on (band, quarter-value)
    surfaces every candidate; exact Hamming check inside the bucket."""

    class Emit:
        def __init__(self):
            self.h = SimHasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            o_band, o_key, o_id, o_fp = [], [], [], []
            for d, x in zip(ids, texts):
                fp = self.h.fingerprint(x or "")
                for b in range(4):
                    o_band.append(b)
                    o_key.append((fp >> (16 * b)) & 0xFFFF)
                    o_id.append(d)
                    o_fp.append(fp)
            return pa.table(
                {
                    "band": pa.array(o_band, pa.int32()),
                    "key": pa.array(o_key, pa.int64()),
                    id_col: pa.array(o_id),
                    "fp": pa.array(o_fp, pa.uint64()),
                }
            )

    bands = docs.select_columns([id_col, text_col]).map_batches(
        Emit, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    ).materialize()

    # same bucket-size prefilter as MinHash-LSH: only multi-member
    # (band, key) buckets reach the per-bucket pair check
    from ray.data.aggregate import Count as _Count

    counts = bands.select_columns(["band", "key"]).groupby(["band", "key"]).aggregate(_Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t.column("n"), pa.scalar(1))).select(["band", "key"]),
        batch_format="pyarrow",
    ).to_pandas()
    hot_keys = set(zip(hot["band"].tolist(), hot["key"].tolist()))
    if not hot_keys:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.string()),
                    "doc_b": pa.array([], pa.string()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )

    def only_hot(t: pa.Table) -> pa.Table:
        b = t.column("band").to_pylist()
        k = t.column("key").to_pylist()
        mask = pa.array([(x, y) in hot_keys for x, y in zip(b, k)], pa.bool_())
        return t.filter(mask)

    bands = bands.map_batches(only_hot, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        if len(df) >= 2:
            df = df.sort_values(id_col)
            ids = df[id_col].tolist()
            fps = df["fp"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    d = bin(int(fps[i]) ^ int(fps[j])).count("1")
                    if d <= max_hamming:
                        out_a.append(str(ids[i]))
                        out_b.append(str(ids[j]))
                        out_d.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_d}).astype(
            {"doc_a": object, "doc_b": object, "hamming": "int64"}
        )

    pair_ds = bands.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")

    # a pair can match in several bands → dedup on (doc_a, doc_b)
    def dedup(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_a", "doc_b"]).aggregate([("hamming", "min")])
        return g.rename_columns(["doc_a", "doc_b", "hamming"])

    from ray.data.aggregate import Min

    return (
        pair_ds.map_batches(dedup, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )
