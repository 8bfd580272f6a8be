"""Near-duplicate detection over text: MinHash+LSH, SimHash, and n-gram
Jaccard verification — the training-data-pipeline dedup suite.

Shapes (all streaming, shuffle only on band/bucket keys; nothing
corpus-sized reaches the driver):
  MinHash-LSH: shingle → minhash signature ONCE per doc → explode to
  slim (band_id, band_hash, doc_id) rows → semi-join to multi-member
  buckets → signatures fetched by join → candidate pairs per bucket
  (signature-estimate prefilter) → EXACT n-gram Jaccard verification on
  text fetched by join → connected components → keep min doc per
  component.
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
from ..util import (
    BROADCAST_BUDGET_BYTES,
    adaptive_partitions,
    dataset_mean_row_bytes,
    fits_broadcast,
    hash_partitioned_combine,
)

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
    all_pairs_bucket_limit: int = 64,
    est_margin: float = 0.1,
    broadcast_budget_bytes: int = BROADCAST_BUDGET_BYTES,
) -> rd.Dataset:
    """Returns (doc_id, keep) rows: one row per doc in a near-dup cluster,
    with ``keep`` = the cluster's canonical (minimum) doc id.

    Scale shape (everything stays a Dataset — nothing corpus-sized ever
    reaches the driver):
      1. signatures computed ONCE per doc → small (doc_id, sig) table;
      2. band rows carry only (band, band_hash, doc_id) — the 8×-bigger
         signature is NOT duplicated into every band row;
      3. multi-member buckets found by a count aggregate and applied as
         a BOUNDED broadcast filter when the key set fits the BYTE
         budget (``fits_broadcast`` — rows × mean width, not a row
         count) / a semi-join on (band, band_hash) above it — never an
         unbounded driver set;
      4. signatures for surviving candidates attached from a
         byte-budgeted broadcast map, by join above it;
      5. per-bucket candidate pairs: all pairs for buckets ≤
         ``all_pairs_bucket_limit`` members, star pairs (each member vs
         the bucket minimum) above it — duplicate-heavy crawls produce
         huge near-identical buckets where the star + connected
         components recovers the cluster at O(m) instead of O(m²);
      6. candidate pairs pass a signature-estimate prefilter at
         ``threshold - est_margin`` and are then verified with EXACT
         word-``shingle_n``-gram Jaccard on the two texts — endpoint
         texts come from a bounded shuffle-free filter + broadcast below
         500k pairs, from two hash joins above;
      7. connected components over verified edges.
    """
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands

    class SigEmitter:
        def __init__(self):
            self.hasher = MinHasher(n_hashes=n_hashes)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            sigs = [self.hasher.signature(_shingles(x or "", shingle_n)).tobytes() for x in texts]
            return pa.table({id_col: pa.array([str(i) for i in ids], pa.string()),
                             "sig": pa.array(sigs, pa.binary())})

    # NOT materialized: the only lineage above is the pruned read + id
    # cast, and paying a barrier here adds a whole execution round
    # (re-reading two parquet columns later is cheaper than persisting
    # the corpus text through the object store twice)
    texts = docs.select_columns([id_col, text_col]).map_batches(
        lambda t: pa.table({id_col: t.column(id_col).cast(pa.string()), text_col: t.column(text_col)}),
        batch_format="pyarrow",
    )
    sigs = texts.map_batches(
        SigEmitter, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    ).materialize()  # small: one 8·n_hashes-byte row per doc

    # band keys by a vectorized multiply-xor mix over the (n, n_bands,
    # rows_per_band) signature cube — one numpy pass per batch instead
    # of n_bands sha1 calls per doc. A mixed 63-bit int is a weaker hash
    # than sha1, but band keys only PROPOSE candidates: false-positive
    # collisions are discarded by the signature-estimate prefilter and
    # the exact Jaccard verify, so the output is identical. One odd
    # constant per signature row, generated for WHATEVER band geometry
    # the caller picked (a fixed 4-entry list crashed rows_per_band > 4).
    _mix_rng = np.random.default_rng(0x9E3779B9)
    _mix = (
        _mix_rng.integers(1, 1 << 63, size=rows_per_band, dtype=np.uint64) * np.uint64(2)
        + np.uint64(1)
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat = np.frombuffer(b"".join(t.column("sig").to_pylist()), dtype=np.uint64)
        cube = flat.reshape(n, n_bands, rows_per_band)
        with np.errstate(over="ignore"):
            mixed = cube * _mix[None, None, :]
        keys = mixed[:, :, 0]
        for k in range(1, rows_per_band):
            keys = keys ^ mixed[:, :, k]
            keys = keys * np.uint64(0x100000001B3)
        keys = (keys >> np.uint64(1)).astype(np.int64)  # 63-bit for Arrow int64
        band_ids = np.tile(np.arange(n_bands, dtype=np.int32), n)
        ids = t.column(id_col).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
        )
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(keys.reshape(-1), pa.int64()),
                id_col: ids,
            }
        )

    bands = sigs.map_batches(explode_bands, batch_format="pyarrow").materialize()

    # Bucket-size prefilter: count members per (band, band_hash) via the
    # hash-partitioned combine (sum of per-block partial counts — Ray's
    # sort-based groupby pays a global sort for what is a pure hash
    # aggregation) and keep multi-member buckets. Applied as a bounded
    # broadcast below the byte budget / a semi-join above it — never an
    # unbounded driver set.
    def _count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["band", "band_hash"]).group_by(["band", "band_hash"]).aggregate([([], "count_all")])
        return g.rename_columns(["band", "band_hash", "n"])

    def _count_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["band", "band_hash"]).aggregate([("n", "sum")])
        g = g.rename_columns(["band", "band_hash", "n"])
        t2 = g.filter(pa.compute.greater(g.column("n"), pa.scalar(1)))
        return pa.table(
            {"band": t2.column("band").cast(pa.int32()), "band_hash": t2.column("band_hash").cast(pa.int64())}
        )

    n_band_rows = bands.count()
    multi = hash_partitioned_combine(
        bands.map_batches(_count_partial, batch_format="pyarrow", batch_size=None),
        ["band", "band_hash"],
        _count_combine,
        adaptive_partitions(16, n_rows=n_band_rows),
    ).materialize()  # consumed twice (count + broadcast/semi-join)
    n_multi = multi.count()
    if n_multi == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.string()), "keep": pa.array([], pa.string())})
        )

    # Tiered semi-join + sig fetch (same pattern as qa._anti_count): a
    # byte-BUDGETED broadcast below the limit — each join here costs a
    # full hash shuffle whose fixed overhead dwarfs small inputs — and
    # the hash join above it, so nothing unbounded ever reaches the
    # driver (rows × mean width, not a row count: 5M narrow keys fit,
    # 500k wide rows do not).
    parts = adaptive_partitions(16, n_rows=n_multi)
    if fits_broadcast(n_multi, dataset_mean_row_bytes(multi, n_multi), broadcast_budget_bytes):
        import ray as _ray

        hot_keys: set = set()
        for b in multi.iter_batches(batch_format="pyarrow"):
            hot_keys.update(zip(b.column("band").to_pylist(), b.column("band_hash").to_pylist()))
        hot_keys_ref = _ray.put(hot_keys)

        def only_hot(t: pa.Table) -> pa.Table:
            keys = _ray.get(hot_keys_ref)
            mask = pa.array(
                [(b, h) in keys for b, h in zip(t.column("band").to_pylist(), t.column("band_hash").to_pylist())],
                pa.bool_(),
            )
            return t.filter(mask)

        hot_rows = bands.map_batches(only_hot, batch_format="pyarrow")
    else:
        hot_rows = bands.join(multi, join_type="inner", num_partitions=parts, on=("band", "band_hash"))

    n_docs_total = sigs.count()
    if fits_broadcast(n_docs_total, dataset_mean_row_bytes(sigs, n_docs_total), broadcast_budget_bytes):
        import ray as _ray

        sig_map: dict = {}
        for b in sigs.iter_batches(batch_format="pyarrow"):
            sig_map.update(zip(b.column(id_col).to_pylist(), b.column("sig").to_pylist()))
        sig_ref = _ray.put(sig_map)

        def attach_sig(t: pa.Table) -> pa.Table:
            m = _ray.get(sig_ref)
            return t.append_column("sig", pa.array([m[d] for d in t.column(id_col).to_pylist()], pa.binary()))

        cand = hot_rows.map_batches(attach_sig, batch_format="pyarrow")
    else:
        cand = hot_rows.join(sigs, join_type="inner", num_partitions=parts, on=(id_col,))

    lo = jaccard_threshold - est_margin

    def block_pairs(t: pa.Table) -> pa.Table:
        """Whole-block pair generation: the block holds every row of its
        hash partition, so each (band, band_hash) bucket is complete —
        a pandas groupby inside the block replaces Ray's sort-based
        map_groups (one Python call per block instead of per bucket,
        and the signature-estimate check is one vectorized numpy
        compare per bucket instead of per pair)."""
        empty = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        if t.num_rows < 2:
            return empty
        df = t.to_pandas()
        out_src: list = []
        out_dst: list = []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col)
            m = len(g)
            if m < 2:
                continue
            ids = g[id_col].to_numpy(dtype=object)
            S = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
            if m <= all_pairs_bucket_limit:
                ai, bi = np.triu_indices(m, k=1)
            else:  # duplicate-heavy bucket: star around the minimum member
                ai = np.zeros(m - 1, dtype=np.int64)
                bi = np.arange(1, m, dtype=np.int64)
            est = (S[ai] == S[bi]).mean(axis=1)
            keep = est >= lo
            out_src.append(ids[ai[keep]])
            out_dst.append(ids[bi[keep]])
        if not out_src:
            return empty
        return pa.table(
            {
                "src": pa.array(np.concatenate(out_src), pa.string()),
                "dst": pa.array(np.concatenate(out_dst), pa.string()),
            }
        )

    # candidate rows ≤ band rows; sizing the partition count off the
    # upper bound avoids an extra counting execution
    raw_pairs = hash_partitioned_combine(
        cand, ["band", "band_hash"], block_pairs, adaptive_partitions(16, n_rows=n_band_rows)
    )

    # a pair surfaces in up to n_bands buckets → dedup before the text
    # join (distinct via per-block Arrow group_by after a pair-key hash
    # partition); materialized because it is consumed several times
    # (count, endpoint scan, verify) and each consumption would
    # otherwise re-execute the whole bucket chain
    def _pair_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["src", "dst"]).aggregate([])

    pairs = hash_partitioned_combine(
        raw_pairs.map_batches(_pair_distinct, batch_format="pyarrow", batch_size=None),
        ["src", "dst"],
        _pair_distinct,
        adaptive_partitions(16, n_rows=n_band_rows),
    ).materialize()

    # exact verification on text (advice parity: the docstring's "exact
    # Jaccard verify" is now true — estimates only prefilter)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.string()), "keep": pa.array([], pa.string())})
        )
    # endpoint-text broadcast is budgeted in BYTES of the documents it
    # would pull (2 texts per pair at the corpus mean width) — long
    # documents blow a row-count limit long before 500k pairs
    n_texts_total = texts.count()
    est_text_bytes = dataset_mean_row_bytes(texts, n_texts_total)
    if fits_broadcast(2 * n_pairs, est_text_bytes, broadcast_budget_bytes):
        # bounded: fetch ONLY the pair-endpoint texts (≤ 2·n_pairs docs,
        # selected by a shuffle-free filter) and verify map-side
        import ray as _ray

        endpoint_ids: set = set()
        for b in pairs.iter_batches(batch_format="pyarrow"):
            endpoint_ids.update(b.column("src").to_pylist())
            endpoint_ids.update(b.column("dst").to_pylist())
        ids_ref = _ray.put(endpoint_ids)

        def pick(t: pa.Table) -> pa.Table:
            wanted = _ray.get(ids_ref)
            mask = pa.array([d in wanted for d in t.column(id_col).to_pylist()], pa.bool_())
            return t.filter(mask)

        text_map: dict = {}
        for b in texts.map_batches(pick, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            text_map.update(zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()))
        text_ref = _ray.put(text_map)

        def verify_b(t: pa.Table) -> pa.Table:
            m = _ray.get(text_ref)
            keep = [
                ngram_jaccard(m.get(a) or "", m.get(b) or "", shingle_n) >= jaccard_threshold
                for a, b in zip(t.column("src").to_pylist(), t.column("dst").to_pylist())
            ]
            return t.filter(pa.array(keep, pa.bool_()))

        edges = pairs.map_batches(verify_b, batch_format="pyarrow").materialize()
    else:
        pparts = adaptive_partitions(16, n_rows=n_pairs)
        with_src = pairs.join(
            texts, join_type="inner", num_partitions=pparts, on=("src",), right_on=(id_col,)
        ).rename_columns({text_col: "_text_src"})
        with_both = with_src.join(
            texts, join_type="inner", num_partitions=pparts, on=("dst",), right_on=(id_col,)
        ).rename_columns({text_col: "_text_dst"})

        def verify(t: pa.Table) -> pa.Table:
            keep = [
                ngram_jaccard(a or "", b or "", shingle_n) >= jaccard_threshold
                for a, b in zip(t.column("_text_src").to_pylist(), t.column("_text_dst").to_pylist())
            ]
            return t.filter(pa.array(keep, pa.bool_())).select(["src", "dst"])

        edges = with_both.map_batches(verify, batch_format="pyarrow").materialize()
    comps = connected_components(edges, src_col="src", dst_col="dst")
    return comps.rename_columns({"node": "doc_id", "component": "keep"})


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard (the verification metric)."""
    sa, sb = set(_shingles(a, n).tolist()), set(_shingles(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class SimHasher:
    """64-bit SimHash over word tokens (weight = term frequency).

    Per-actor word→±1-bit-vector cache + one (unique-tokens × 64)
    matmul per doc: natural text reuses a small vocabulary, so the
    blake2b + bit-unpack cost is paid once per DISTINCT word per actor
    instead of once per token occurrence (same fingerprints as the
    per-token loop — the weight is still the term frequency)."""

    BITS = 64
    _CACHE_CAP = 1_000_000  # ~64 MB of int8 rows; reset beyond (web-scale vocab)

    def __init__(self):
        self._shifts = np.arange(self.BITS, dtype=np.uint64)
        self._cache: dict[str, np.ndarray] = {}

    def _bits(self, w: str) -> np.ndarray:
        v = self._cache.get(w)
        if v is None:
            if len(self._cache) >= self._CACHE_CAP:
                self._cache.clear()
            h = np.uint64(int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"))
            bits = (h >> self._shifts) & np.uint64(1)
            self._cache[w] = v = np.where(bits == 1, 1, -1).astype(np.int8)
        return v

    def fingerprint(self, text: str) -> int:
        toks = text.split()
        if not toks:
            acc = np.zeros(self.BITS, dtype=np.int64)
        else:
            from collections import Counter

            counts = Counter(toks)
            m = np.stack([self._bits(w) for w in counts]).astype(np.int64)
            w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            acc = (m * w[:, None]).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << self._shifts).sum(dtype=np.uint64))


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (np.bitwise_count when the
    numpy build has it, byte-table fallback otherwise)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    return _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.int64)


def simhash_duplicates(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    all_pairs_bucket_limit: int = 64,
) -> rd.Dataset:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.
    4-way banding: any pair within distance 3 shares at least one intact
    16-bit quarter (pigeonhole), so grouping on (band, quarter-value)
    surfaces every candidate; exact Hamming check inside the bucket.

    Scale shape: 16-bit band keys SATURATE around ~10M docs (every
    (band, key) bucket holds ~n/65536 members), so the in-bucket check
    must not be O(m²) Python. Two defenses:
      * the Hamming check is one vectorized uint64 XOR + popcount over
        the candidate index arrays — no per-pair Python;
      * buckets above ``all_pairs_bucket_limit`` members emit STAR pairs
        only (each member vs the bucket's minimum id) — O(m) instead of
        O(m²). Duplicate-heavy buckets are near-cliques, so the star
        plus a transitive pass (``connected_components`` on the pairs)
        recovers the full cluster; pairs NOT involving the bucket
        minimum are intentionally not enumerated above the cap."""

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

    # same bucket-size prefilter as MinHash-LSH, applied as a semi-join
    # (a driver-side hot-key set is unbounded on duplicate-heavy crawls);
    # counts via partial-per-block + hash-partitioned combine — Ray's
    # sort-based groupby pays a global sort for a pure hash aggregation
    def _count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["band", "key"]).group_by(["band", "key"]).aggregate([([], "count_all")])
        return g.rename_columns(["band", "key", "n"])

    def _count_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["band", "key"]).aggregate([("n", "sum")])
        g = g.rename_columns(["band", "key", "n"])
        t2 = g.filter(pa.compute.greater(g.column("n"), pa.scalar(1)))
        # join needs matching key dtypes on both sides
        return pa.table({"band": t2.column("band").cast(pa.int32()), "key": t2.column("key").cast(pa.int64())})

    n_band_rows = bands.count()
    multi = hash_partitioned_combine(
        bands.map_batches(_count_partial, batch_format="pyarrow", batch_size=None),
        ["band", "key"],
        _count_combine,
        adaptive_partitions(16, n_rows=n_band_rows),
    ).materialize()
    n_multi = multi.count()
    if n_multi == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.string()),
                    "doc_b": pa.array([], pa.string()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    bands = bands.join(
        multi, join_type="inner", num_partitions=adaptive_partitions(16, n_rows=n_multi),
        on=("band", "key"),
    )

    def block_pairs(t: pa.Table) -> pa.Table:
        """Whole-block pair generation after a (band, key) hash
        partition: every bucket is complete inside its block, so one
        pandas groupby per BLOCK replaces Ray's sort-based per-bucket
        map_groups; the Hamming check stays a vectorized XOR+popcount."""
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.string()),
                "doc_b": pa.array([], pa.string()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        df = t.to_pandas()
        out = []
        for _, g in df.groupby(["band", "key"], sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col)
            m = len(g)
            if m < 2:
                continue
            ids = g[id_col].astype(str).to_numpy(dtype=object)
            fps = g["fp"].to_numpy(dtype=np.uint64)
            if m <= all_pairs_bucket_limit:
                ai, bi = np.triu_indices(m, k=1)
            else:  # saturated bucket: star around the minimum id — O(m)
                ai = np.zeros(m - 1, dtype=np.int64)
                bi = np.arange(1, m, dtype=np.int64)
            d = _popcount64(fps[ai] ^ fps[bi])
            keep = d <= max_hamming
            out.append((ids[ai[keep]], ids[bi[keep]], d[keep]))
        if not out:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate([x[0] for x in out]), pa.string()),
                "doc_b": pa.array(np.concatenate([x[1] for x in out]), pa.string()),
                "hamming": pa.array(np.concatenate([x[2] for x in out]), pa.int64()),
            }
        )

    pair_ds = hash_partitioned_combine(
        bands, ["band", "key"], block_pairs, adaptive_partitions(16, n_rows=n_band_rows)
    )

    # a pair can match in several bands → dedup on (doc_a, doc_b)
    def dedup(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_a", "doc_b"]).aggregate([("hamming", "min")])
        return g.rename_columns(["doc_a", "doc_b", "hamming"])

    return hash_partitioned_combine(
        pair_ds.map_batches(dedup, batch_format="pyarrow", batch_size=None),
        ["doc_a", "doc_b"],
        dedup,
        adaptive_partitions(16, n_rows=n_band_rows),
    )


def ngram_jaccard_duplicates(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    df_cap: int = 256,
) -> rd.Dataset:
    """EXACT word n-gram Jaccard near-dup pairs (doc_a, doc_b, jaccard)
    via a shingle inverted index — the deterministic, SQL-reproducible
    member of the dedup family (minhash/simhash are probabilistic and
    only pytest-checkable; this one is DuckDB-oracled end to end).

    Semantics (mirrored exactly by the oracle SQL): shingle = distinct
    word ``shingle_n``-gram string (whitespace tokens; docs shorter than
    ``shingle_n`` words contribute their joined text as one shingle);
    shingles appearing in more than ``df_cap`` docs are dropped from the
    inverted index (stop-shingles) BEFORE pair generation, while each
    doc's shingle-count denominator still counts all its shingles —
    i.e. the reported metric is the df-capped Jaccard, a lower bound of
    true Jaccard. Reference metric: ``ngram_jaccard`` above, which
    minhash_lsh_duplicates uses for verification
    (/root/reference/src/fancyrag has no dedup — this is the
    training-data-pipeline extension suite).

    Scale shape: pair generation is a SELF EQUI-JOIN on the 8-byte
    shingle hash (raw shingle strings never shuffle) — a vectorized hash
    join, not a per-group Python callback (a ``map_groups`` over the
    shingle key pays a Python+pandas call per DISTINCT shingle, which is
    the corpus's whole vocabulary; measured 50× slower than the join on
    the same input). Join fan-out per shingle is bounded at df_cap² by
    dropping stop-shingles and singletons BEFORE the join, then one
    shuffle on the pair key with an associative (count, max, max)
    aggregate. ``n_doc`` rides every index row (constant per doc) so no
    doc-level join is needed at the end. Nothing corpus-sized reaches
    the driver.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ..util import hash_partitioned_combine

    def explode(t: pa.Table) -> pa.Table:
        idx, keys, nsh = [], [], []
        for i, txt in enumerate(t.column(text_col).to_pylist()):
            words = (txt or "").split()
            if len(words) < shingle_n:
                grams = {" ".join(words)}
            else:
                grams = {
                    " ".join(words[j : j + shingle_n])
                    for j in range(len(words) - shingle_n + 1)
                }
            n = len(grams)
            for g in grams:
                idx.append(i)
                # 63-bit blake2b of the shingle STRING: the shuffle key is
                # 8 bytes however long the shingle is; collision odds are
                # birthday(2^63) and only ever inflate one intersection
                # count. int64 (not uint64) — Ray's groupby round-trips
                # uint64 keys through a pickled-object extension type,
                # which the downstream Arrow hash join can't key on.
                h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
                keys.append(h & 0x7FFF_FFFF_FFFF_FFFF)
                nsh.append(n)
        return pa.table(
            {
                "sh": pa.array(keys, pa.int64()),
                "doc": t.column(id_col).take(pa.array(idx, pa.int64())),
                "n_doc": pa.array(nsh, pa.int64()),
            }
        )

    index = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=1024
    ).materialize()  # consumed twice (df counts + both join sides)

    sch = docs.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    # keep only shingles with 2..df_cap member docs: singletons produce
    # no pairs and stop-shingles are dropped by contract (see above)
    def usable(t: pa.Table) -> pa.Table:
        n = t.column("n")
        keep = pc.and_(
            pc.greater(n, pa.scalar(1)), pc.less_equal(n, pa.scalar(df_cap))
        )
        return t.filter(keep).select(["sh"])

    multi = (
        index.select_columns(["sh"])
        .groupby("sh")
        .aggregate(Count(alias_name="n"))
        .map_batches(usable, batch_format="pyarrow")
    ).materialize()  # consumed by both join sides below
    n_multi = multi.count()
    if n_multi == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], id_type),
                    "doc_b": pa.array([], id_type),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    parts = adaptive_partitions(16, n_rows=n_multi)
    # materialized: consumed as BOTH sides of the self-join (an
    # unmaterialized Dataset re-executes its whole lineage per consumer)
    idx = index.join(
        multi, join_type="inner", num_partitions=parts, on=("sh",)
    ).materialize()

    def local_combine(t: pa.Table) -> pa.Table:
        # order + partial-combine inside the join output block: a pair
        # sharing k shingles within one shingle partition collapses to
        # one row with inter=k before anything shuffles again
        t = t.filter(pc.less(t.column("doc_a"), t.column("doc_b")))
        g = t.group_by(["doc_a", "doc_b"]).aggregate(
            [("sh", "count"), ("na", "max"), ("nb", "max")]
        )
        return g.rename_columns(["doc_a", "doc_b", "inter", "na", "nb"])

    def final_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_a", "doc_b"]).aggregate(
            [("inter", "sum"), ("na", "max"), ("nb", "max")]
        )
        return g.rename_columns(["doc_a", "doc_b", "inter", "na", "nb"])

    partials = (
        idx.join(
            idx.rename_columns({"doc": "doc_b", "n_doc": "nb"}),
            join_type="inner",
            num_partitions=parts,
            on=("sh",),
        )
        .rename_columns({"doc": "doc_a", "n_doc": "na"})
        .map_batches(local_combine, batch_format="pyarrow")
    )
    # groups ≈ rows here (one group per candidate pair), where Ray's
    # sort-based groupby measured 6× slower than hash repartition +
    # per-block Arrow combine (33 s vs 5 s at sf0.1)
    pair_counts = hash_partitioned_combine(
        partials, ["doc_a", "doc_b"], final_combine, parts
    )

    def finish(t: pa.Table) -> pa.Table:
        inter = t.column("inter").cast(pa.float64())
        union = pc.subtract(
            pc.add(t.column("na"), t.column("nb")).cast(pa.float64()), inter
        )
        jac = pc.divide(inter, union)
        t = t.append_column("jaccard", jac)
        return t.filter(pc.greater_equal(jac, pa.scalar(jaccard_threshold))).select(
            ["doc_a", "doc_b", "jaccard"]
        )

    # pairs surviving the threshold are tiny; materialize so the count
    # check doesn't re-execute the join lineage for the caller
    out = pair_counts.map_batches(finish, batch_format="pyarrow").materialize()
    if out.count() == 0:  # keep the declared Dataset return type + schema
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], id_type),
                    "doc_b": pa.array([], id_type),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    return out


# DuckDB mirror of ngram_jaccard_duplicates (word trigrams, df_cap=256,
# threshold 0.8). Same tokenizer contract as the Ray path: whitespace-run
# split of the trimmed text; <3-word docs contribute their joined text as
# a single shingle. Float math is IEEE double on identical integer
# inputs on both sides, so the value hash matches bit-for-bit.
NGRAM_JACCARD_SQL = """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
    CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
         ELSE array_to_string(w[g.i:g.i+2], ' ') END AS shingle
  FROM words, LATERAL (SELECT unnest(range(1, greatest(len(w)-1, 2))) AS i) g
  WHERE len(w) < 3 OR g.i <= len(w)-2
), nd AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), df AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 256
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (shingle) JOIN df USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter::DOUBLE / (na.n + nb.n - inter) AS jaccard
FROM pairs
JOIN nd na ON na.doc_id = doc_a
JOIN nd nb ON nb.doc_id = doc_b
WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.8
"""


def dedup_clusters(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    df_cap: int = 256,
) -> rd.Dataset:
    """Near-duplicate CLUSTER assignment — the step every corpus dedup
    pipeline runs after pair generation: exact df-capped n-gram Jaccard
    pairs (``ngram_jaccard_duplicates``) → connected components →
    ``(doc_id, cluster_id, cluster_size)`` with cluster_id = the
    cluster's minimum doc id, i.e. the canonical keeper (``keep`` ≡
    ``doc_id == cluster_id``). Completes the dedup family end-to-end:
    pairs tell you WHO matches, clusters tell you WHAT TO DROP — and the
    transitive closure matters (A~B, B~C ⇒ {A,B,C} is ONE cluster even
    when A≁C directly). DuckDB-oracled: the mirror recomputes the exact
    pairs and closes them with a recursive CTE.

    Scale shape: the component pass runs over the PAIR table (bounded by
    dup density × df_cap², ≪ corpus — the tiered ``connected_components``
    takes its contraction/labelprop path beyond driver memory). Doc ids
    ride the component pass as zero-padded fixed-width strings so the
    components' lexicographic hash-min equals the numeric min
    (non-negative ids), then cast back to int64. ``cluster_size`` is a
    block-local Arrow group-count after ONE hash co-partition on
    cluster_id (clusters land whole per block) — no join, no second
    shuffle."""
    import pyarrow.compute as pc

    pairs = ngram_jaccard_duplicates(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        df_cap=df_cap,
    )

    def pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.utf8_lpad(t.column("doc_a").cast(pa.string()), 20, padding="0"),
                "b": pc.utf8_lpad(t.column("doc_b").cast(pa.string()), 20, padding="0"),
            }
        )

    comp = connected_components(
        pairs.map_batches(pad, batch_format="pyarrow"), src_col="a", dst_col="b"
    )

    def unpad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("node").cast(pa.int64()),
                "cluster_id": t.column("component").cast(pa.int64()),
            }
        )

    comp_int = comp.map_batches(unpad, batch_format="pyarrow").materialize()
    n = comp_int.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                }
            )
        )

    def add_size(t: pa.Table) -> pa.Table:
        g = t.group_by(["cluster_id"]).aggregate([([], "count_all")])
        idx = pc.index_in(t.column("cluster_id"), g.column("cluster_id"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "cluster_id": t.column("cluster_id"),
                "cluster_size": pc.take(g.column("count_all"), idx).cast(pa.int64()),
            }
        )

    return hash_partitioned_combine(
        comp_int, ["cluster_id"], add_size, adaptive_partitions(8, n_rows=n)
    )


DEDUP_CLUSTERS_SQL = (
    "WITH RECURSIVE pairs AS (\n"
    + NGRAM_JACCARD_SQL
    + """),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b
),
comp AS (
  SELECT a AS doc_id, LEAST(a, MIN(b))::BIGINT AS cluster_id FROM reach GROUP BY a
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
FROM comp
"""
)


def decontaminate_documents(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    benchmark_rate_bp: int = 500,
) -> rd.Dataset:
    """Benchmark DECONTAMINATION — the LLM-training hygiene op: flag
    corpus documents that share any ``shingle_n``-word shingle with a
    held-out benchmark set, so evaluation data can be scrubbed from the
    training corpus. (The classic recipe checks 8-13-gram overlap
    against published eval sets; here the benchmark is the
    deterministic md5-prefix sample of the corpus itself — the same
    SQL-reproducible rule as ``sample_documents_hash`` — which makes
    the whole operator DuckDB-oracle-checkable.)

    Returns (doc_id, n_hit_shingles): non-benchmark docs sharing ≥1
    shingle with any benchmark doc, with the count of their DISTINCT
    contaminated shingles.

    Scale shape: both sides explode to (shingle-hash, doc) rows —
    8-byte keys, raw shingle strings never shuffle; the benchmark side
    is the small side by construction (a few % sample) and semi-joins
    the corpus side through the byte-budgeted broadcast tier
    (``fits_broadcast``) or a hash join above it; per-doc hit counts
    partial-combine. Nothing corpus-sized reaches the driver.
    """
    import pyarrow.compute as pc

    thresh = format((65536 * benchmark_rate_bp) // 10000, "04x")

    def explode(t: pa.Table) -> pa.Table:
        ids, keys, bench = [], [], []
        texts_l = t.column(text_col).to_pylist()
        for d, txt in zip(t.column(id_col).to_pylist(), texts_l):
            is_bench = hashlib.md5(str(d).encode()).hexdigest()[:4] < thresh
            words = (txt or "").split()
            if len(words) < shingle_n:
                grams = {" ".join(words)} if words else set()
            else:
                grams = {
                    " ".join(words[j : j + shingle_n])
                    for j in range(len(words) - shingle_n + 1)
                }
            for g in grams:
                h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
                ids.append(d)
                keys.append(h & 0x7FFF_FFFF_FFFF_FFFF)
                bench.append(is_bench)
        return pa.table(
            {
                "doc": pa.array(ids),
                "sh": pa.array(keys, pa.int64()),
                "is_bench": pa.array(bench, pa.bool_()),
            }
        )

    sch = docs.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    exploded = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=1024
    ).materialize()  # consumed by both sides

    bench_sh = exploded.map_batches(
        lambda t: pa.table({"sh": pc.unique(t.filter(t.column("is_bench")).column("sh"))}),
        batch_format="pyarrow",
    )
    corpus_sh = exploded.map_batches(
        lambda t: t.filter(pc.invert(t.column("is_bench"))).select(["doc", "sh"]),
        batch_format="pyarrow",
    )

    # distinct benchmark shingles (partial unique above; final combine)
    n_b = bench_sh.count()
    if n_b == 0:
        return rd.from_arrow(
            pa.table({id_col: pa.array([], id_type), "n_hit_shingles": pa.array([], pa.int64())})
        )
    parts = adaptive_partitions(16, n_rows=n_b)
    bench_u = hash_partitioned_combine(
        bench_sh, ["sh"], lambda t: pa.table({"sh": pc.unique(t.column("sh"))}), parts
    ).materialize()
    n_bu = bench_u.count()

    if fits_broadcast(n_bu, 8.0):
        import ray as _ray

        vs_tbl = pa.concat_tables(list(bench_u.iter_batches(batch_format="pyarrow")))
        vs_ref = _ray.put(vs_tbl.column("sh").combine_chunks())

        def hit(t: pa.Table) -> pa.Table:
            vs = _ray.get(vs_ref)
            return t.filter(pc.is_in(t.column("sh"), value_set=vs))

        hits = corpus_sh.map_batches(hit, batch_format="pyarrow")
    else:
        hits = corpus_sh.join(bench_u, join_type="inner", num_partitions=parts, on=("sh",))

    # the semi-join may split a doc's shingles across blocks — one doc
    # co-partition makes the (doc, sh) distinct AND the per-doc count
    # block-final in a single combine
    def distinct_and_count(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc", "sh"]).aggregate([])
        g = g.group_by(["doc"]).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "n_hit_shingles"])

    return hash_partitioned_combine(
        hits.select_columns(["doc", "sh"]), ["doc"], distinct_and_count, parts
    )


def _decontaminate_sql(shingle_n: int = 8, benchmark_rate_bp: int = 500) -> str:
    thresh = format((65536 * benchmark_rate_bp) // 10000, "04x")
    return f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
         SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) < '{thresh}' AS is_bench
  FROM documents
  WHERE trim(text) <> ''
), sh AS (
  SELECT DISTINCT doc_id, is_bench,
    CASE WHEN len(w) < {shingle_n} THEN array_to_string(w, ' ')
         ELSE array_to_string(w[g.i:g.i+{shingle_n - 1}], ' ') END AS shingle
  FROM words, LATERAL (SELECT unnest(range(1, greatest(len(w)-{shingle_n - 2}, 2))) AS i) g
  WHERE len(w) < {shingle_n} OR g.i <= len(w)-{shingle_n - 1}
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE is_bench
)
SELECT s.doc_id, COUNT(DISTINCT s.shingle)::BIGINT AS n_hit_shingles
FROM sh s JOIN bench b USING (shingle)
WHERE NOT s.is_bench
GROUP BY s.doc_id
"""


DECONTAMINATE_SQL = _decontaminate_sql()


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (Dolma-style)
# ---------------------------------------------------------------------------
def dedup_paragraphs(sf_dir: str, broadcast_budget_bytes: int = BROADCAST_BUDGET_BYTES) -> rd.Dataset:
    """Corpus-wide exact paragraph dedup: a paragraph (non-empty
    newline-delimited line) occurring more than once ANYWHERE in the
    corpus is removed from every document — the Dolma/CCNet boilerplate
    scrub (nav bars, cookie banners, licence footers repeat across
    pages; dropping every occurrence of a repeated paragraph is the
    standard rule). Emits per doc: paragraph total, duplicated-instance
    count, and the cleaned text (survivors joined by newline, original
    order).

    Plan (two passes, docs never shuffled in the common tier):
      1. per-block Arrow group_by partials of paragraph counts →
         ``hash_partitioned_combine`` sum → the count>1 set. Duplicate-
         heavy blocks collapse before the shuffle, so each block ships
         at most its DISTINCT paragraphs. (At 10^12 docs the shuffle key
         would be a 128-bit fingerprint, not the string — documented
         trade: strings keep the SQL mirror exact.)
      2. tiered mark+rebuild:
         * dup set within ``fits_broadcast`` → ``ray.put`` once, one
           vectorized ``pc.index_in`` probe per block, and the rebuild
           is block-local (docs arrive whole from the read, so
           paragraph order never crosses a boundary);
         * above budget → explode to (doc_id, pos, para) rows UNIONed
           with inner-join dup marks, one hash co-partition by doc_id,
           per-block rebuild (the full-text shuffle is the price of a
           boilerplate set too big to broadcast).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _explode(t: pa.Table):
        """(doc_ids, pos, paras) numpy/arrow views of the non-empty
        paragraphs of each doc, order-preserving, fully vectorized."""
        text = pc.coalesce(t.column("text"), pa.scalar("", pa.string()))
        ls = pc.split_pattern(text, "\n")
        lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(ls).combine_chunks()
        ids = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        ids, flat = ids[keep], flat.filter(pa.array(keep))
        # 1-based position among the kept paragraphs of each doc:
        # contiguous-by-construction segments ⇒ arange minus seg starts
        n = len(ids)
        if n:
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            seg = np.repeat(starts, np.diff(np.r_[starts, n]))
            pos = np.arange(n, dtype=np.int64) - seg + 1
        else:
            pos = np.zeros(0, np.int64)
        return ids, pos, flat

    def count_partial(t: pa.Table) -> pa.Table:
        _, _, paras = _explode(t)
        pt = pa.table({"para": paras, "ones": pa.array(np.ones(len(paras), np.int64))})
        out = pt.group_by(["para"]).aggregate([("ones", "sum")])
        return out.rename_columns(["para", "c"])

    def count_combine(t: pa.Table) -> pa.Table:
        out = t.group_by(["para"]).aggregate([("c", "sum")])
        return out.rename_columns(["para", "c"])

    n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    parts = adaptive_partitions(16, n_rows=n_rows)
    counts = hash_partitioned_combine(
        docs.map_batches(count_partial, batch_format="pyarrow", batch_size=None),
        ["para"], count_combine, parts,
    )
    dups = (
        counts.map_batches(
            lambda t: t.filter(pc.greater(t.column("c"), pa.scalar(1, pa.int64()))),
            batch_format="pyarrow", batch_size=None,
        )
        .select_columns(["para"])
        .materialize()
    )
    n_dups = dups.count()

    def _rebuild(ids: np.ndarray, pos: np.ndarray, paras: pa.Array, is_dup: np.ndarray,
                 all_ids: pa.Array) -> pa.Table:
        """Per-doc aggregates + cleaned text from exploded rows (ids must
        be grouped contiguously; pos gives the original order)."""
        df = pd.DataFrame({
            "doc_id": ids, "pos": pos,
            "para": paras.to_pandas().to_numpy(dtype=object, copy=False),
            "dup": is_dup,
        })
        df.sort_values(["doc_id", "pos"], inplace=True, kind="mergesort")
        g = df.groupby("doc_id", sort=False)
        agg = g.agg(
            n_paragraphs=("pos", "size"),
            n_dup_paragraphs=("dup", "sum"),
        )
        kept = df[~df["dup"]].groupby("doc_id", sort=False)["para"].agg("\n".join)
        agg["text_clean"] = kept.reindex(agg.index, fill_value="")
        out = agg.reindex(all_ids.to_numpy(zero_copy_only=False), fill_value=0)
        out.index.name = "doc_id"
        out = out.reset_index()
        out["text_clean"] = out["text_clean"].replace(0, "")  # docs with zero paragraphs
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_paragraphs": pa.array(out["n_paragraphs"].to_numpy(dtype=np.int64), pa.int64()),
            "n_dup_paragraphs": pa.array(out["n_dup_paragraphs"].to_numpy(dtype=np.int64), pa.int64()),
            "text_clean": pa.array(out["text_clean"].astype(str).to_numpy(dtype=object), pa.string()),
        })

    if fits_broadcast(n_dups, dataset_mean_row_bytes(dups, n_dups), broadcast_budget_bytes):
        import ray as _ray

        batches = list(dups.iter_batches(batch_format="pyarrow"))
        dup_arr = (
            pa.concat_tables(batches).column("para").combine_chunks()
            if batches else pa.array([], pa.string())
        )
        dup_ref = _ray.put(dup_arr)

        def clean_block(t: pa.Table) -> pa.Table:
            dup_set = _ray.get(dup_ref)
            ids, pos, paras = _explode(t)
            is_dup = pc.is_valid(pc.index_in(paras, value_set=dup_set)).to_numpy(zero_copy_only=False)
            return _rebuild(ids, pos, paras, is_dup, t.column("doc_id").combine_chunks())

        return docs.map_batches(clean_block, batch_format="pyarrow", batch_size=None)

    # join tier: exploded rows ∪ dup marks, co-partitioned by doc_id
    def explode_block(t: pa.Table) -> pa.Table:
        ids, pos, paras = _explode(t)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()), "pos": pa.array(pos, pa.int64()),
            "para": paras, "mark": pa.array(np.zeros(len(ids), np.int64)),
        })

    exploded = docs.map_batches(explode_block, batch_format="pyarrow", batch_size=None).materialize()
    n_paras = exploded.count()
    jparts = adaptive_partitions(16, n_rows=n_paras)
    marks = (
        exploded.select_columns(["doc_id", "pos", "para"])
        .join(dups, join_type="inner", num_partitions=jparts, on=("para",))
        .map_batches(
            lambda t: pa.table({
                "doc_id": t.column("doc_id"), "pos": t.column("pos"),
                "para": pa.array([""] * t.num_rows, pa.string()),
                "mark": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow", batch_size=None,
        )
    )
    both = exploded.union(marks)

    def rebuild_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()), "n_paragraphs": pa.array([], pa.int64()),
                "n_dup_paragraphs": pa.array([], pa.int64()), "text_clean": pa.array([], pa.string()),
            })
        df = t.to_pandas()
        mk = df.loc[df["mark"] == 1, ["doc_id", "pos"]].assign(_d=1)
        rows = df[df["mark"] == 0].merge(mk, on=["doc_id", "pos"], how="left")
        is_dup = rows["_d"].notna().to_numpy()
        ids = rows["doc_id"].to_numpy()
        return _rebuild(
            ids, rows["pos"].to_numpy(), pa.array(rows["para"], pa.string()), is_dup,
            pa.array(pd.unique(ids), pa.int64()),
        )

    cleaned = hash_partitioned_combine(both, ["doc_id"], rebuild_block, jparts)

    # docs whose text had no paragraphs at all never exploded — restore
    # them with zero counts so the output is one row per input doc. A
    # doc has no paragraphs iff its text minus newlines is empty.
    def empty_docs(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t.column("text"), pa.scalar("", pa.string()))
        no_nl = pc.replace_substring(text, "\n", "")
        keep = pc.equal(no_nl, pa.scalar(""))
        ids = t.column("doc_id").filter(keep)
        z = pa.array(np.zeros(len(ids), np.int64))
        return pa.table({
            "doc_id": ids, "n_paragraphs": z, "n_dup_paragraphs": z,
            "text_clean": pa.array([""] * len(ids), pa.string()),
        })

    return cleaned.union(docs.map_batches(empty_docs, batch_format="pyarrow", batch_size=None))


DEDUP_PARAGRAPHS_SQL = """
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
),
l AS (
  SELECT doc_id, list_filter(string_split(text, chr(10)), x -> x <> '') AS ls FROM base
),
p AS (
  SELECT doc_id, ls[i] AS para, i
  FROM l, UNNEST(generate_series(1, len(ls))) AS t(i)
),
c AS (
  SELECT para, COUNT(*)::BIGINT AS c FROM p GROUP BY para
),
m AS (
  SELECT p.doc_id,
         COUNT(*)::BIGINT AS n_paragraphs,
         SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_paragraphs,
         COALESCE(string_agg(CASE WHEN c.c = 1 THEN p.para END, chr(10) ORDER BY p.i), '') AS text_clean
  FROM p JOIN c USING (para)
  GROUP BY p.doc_id
)
SELECT b.doc_id,
       COALESCE(m.n_paragraphs, 0) AS n_paragraphs,
       COALESCE(m.n_dup_paragraphs, 0) AS n_dup_paragraphs,
       COALESCE(m.text_clean, '') AS text_clean
FROM base b LEFT JOIN m USING (doc_id)
"""


def dedup_substrings(
    sf_dir: str,
    gram_chars: int = 50,
    stride: int = 25,
    broadcast_budget_bytes: int = BROADCAST_BUDGET_BYTES,
) -> rd.Dataset:
    """Exact SUBSTRING-level duplication census (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" family):
    fixed-length character grams sampled at a stride are fingerprinted,
    and every doc reports how many of its distinct grams also occur in
    ANOTHER doc — the signal the substring-removal pass acts on. Emits
    (doc_id, n_grams, n_dup_grams) for every doc with at least one full
    gram; DRIVER-ORACLED (the fingerprint is ``SUBSTR(MD5(gram),1,16)``,
    computable identically in DuckDB — at 10^12 docs the key would be a
    raw 8-byte blake2b as in ``decontaminate_documents``; the md5-hex
    choice keeps the mirror exact and is documented as the only delta).

    Scale shape: gram slicing is one vectorized ``utf8_slice_codeunits``
    per offset (≤ maxlen/stride kernel calls per batch, not per row);
    raw gram text never shuffles — only 16-char fingerprints; per-batch
    (doc, gid) distinct + per-gid partials bound the count shuffle by
    the distinct-gram domain; the duplicated-gram set probes back via
    the broadcast tier under ``fits_broadcast`` (one ``pc.is_in`` per
    block) or a hash join above it.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t.column("text"), pa.scalar("", pa.string()))
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        max_off = int((lens.max() - gram_chars) // stride) if len(lens) and lens.max() >= gram_chars else -1
        out_doc: list[np.ndarray] = []
        out_gid: list[str] = []
        for i in range(max_off + 1):
            start = i * stride
            keep = lens >= start + gram_chars
            if not keep.any():
                continue
            grams = pc.utf8_slice_codeunits(text.filter(pa.array(keep)), start, start + gram_chars)
            # md5 per sampled gram: the same bounded per-batch hashing
            # loop decontaminate_documents uses for its shingles
            out_gid.extend(hashlib.md5(g.encode()).hexdigest()[:16] for g in grams.to_pylist())
            out_doc.append(ids[keep])
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()), "gid": pa.array([], pa.string())})
        pairs = pa.table(
            {"doc_id": pa.array(np.concatenate(out_doc)), "gid": pa.array(out_gid, pa.string())}
        )
        # a doc lives in exactly one batch → per-batch distinct is exact
        return pairs.group_by(["doc_id", "gid"]).aggregate([])

    pairs = docs.map_batches(explode, batch_format="pyarrow", batch_size=1024).materialize()

    def gid_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["gid"]).aggregate([([], "count_all")])
        return g.rename_columns(["gid", "nd"])

    def gid_combine(t: pa.Table) -> pa.Table:
        return t.group_by(["gid"]).aggregate([("nd", "sum")]).rename_columns(["gid", "nd"])

    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_grams": pa.array([], pa.int64()),
                      "n_dup_grams": pa.array([], pa.int64())})
        )
    counts = hash_partitioned_combine(
        pairs.map_batches(gid_partial, batch_format="pyarrow", batch_size=None),
        ["gid"], gid_combine, adaptive_partitions(16, n_rows=n_pairs),
    )
    dups = (
        counts.map_batches(
            lambda t: t.filter(pc.greater(t.column("nd"), pa.scalar(1, pa.int64()))),
            batch_format="pyarrow", batch_size=None,
        )
        .select_columns(["gid"])
        .materialize()
    )
    n_dup = dups.count()

    if n_dup == 0 or fits_broadcast(n_dup, dataset_mean_row_bytes(dups, n_dup), broadcast_budget_bytes):
        dup_set = pa.array(dups.unique("gid"), pa.string()) if n_dup else pa.array([], pa.string())
        dup_ref = ray.put(dup_set)

        def per_doc(t: pa.Table) -> pa.Table:
            vs = ray.get(dup_ref)
            is_dup = pc.is_in(t.column("gid"), value_set=vs).cast(pa.int64())
            pt = pa.table({"doc_id": t.column("doc_id"), "ones": pa.array(np.ones(t.num_rows, np.int64)), "dup": is_dup})
            g = pt.group_by(["doc_id"]).aggregate([("ones", "sum"), ("dup", "sum")])
            return g.rename_columns(["doc_id", "n_grams", "n_dup_grams"])

        marked = pairs.map_batches(per_doc, batch_format="pyarrow", batch_size=None)
    else:
        joined = pairs.join(
            dups.map_batches(
                lambda t: t.append_column("__dup", pa.array(np.ones(t.num_rows, np.int64))),
                batch_format="pyarrow",
            ),
            join_type="left_outer",
            num_partitions=adaptive_partitions(16, n_rows=n_pairs),
            on=("gid",), right_on=("gid",),
        )

        def per_doc_joined(t: pa.Table) -> pa.Table:
            dup = pc.coalesce(t.column("__dup"), pa.scalar(0, pa.int64()))
            pt = pa.table({"doc_id": t.column("doc_id"), "ones": pa.array(np.ones(t.num_rows, np.int64)), "dup": dup})
            g = pt.group_by(["doc_id"]).aggregate([("ones", "sum"), ("dup", "sum")])
            return g.rename_columns(["doc_id", "n_grams", "n_dup_grams"])

        marked = joined.map_batches(per_doc_joined, batch_format="pyarrow", batch_size=None)

    from ray.data.aggregate import Sum as _Sum

    return (
        marked.groupby("doc_id")
        .aggregate(_Sum("n_grams", alias_name="n_grams"), _Sum("n_dup_grams", alias_name="n_dup_grams"))
    )


def _dedup_substrings_sql(gram_chars: int = 50, stride: int = 25) -> str:
    return f"""
WITH e AS (
  SELECT doc_id, text,
         CAST((LENGTH(text) - {gram_chars}) // {stride} AS INTEGER) AS max_off
  FROM documents WHERE LENGTH(text) >= {gram_chars}
), g AS (
  SELECT DISTINCT doc_id,
         SUBSTR(MD5(SUBSTR(text, i * {stride} + 1, {gram_chars})), 1, 16) AS gid
  FROM e, LATERAL (SELECT unnest(generate_series(0, max_off)) AS i) s
), c AS (
  SELECT gid, COUNT(*)::BIGINT AS nd FROM g GROUP BY gid
)
SELECT g.doc_id, COUNT(*)::BIGINT AS n_grams,
       SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams
FROM g JOIN c USING (gid)
GROUP BY g.doc_id
"""


DEDUP_SUBSTRINGS_SQL = _dedup_substrings_sql()
