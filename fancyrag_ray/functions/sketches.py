"""Mergeable sketches for approximate metrics at scale.

SURVEY §2.5 flags approximate distinct (HLL) as the extension the
reference lacks: at 10^12-doc scale, exact entity-cardinality metrics
for QA dashboards are an unnecessary shuffle. HyperLogLog registers are
computed per block (vectorized numpy), merged associatively (elementwise
max) through a tiny tree — one 2^p-byte array per block crosses the
wire, never the keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


class HllSketch:
    """Standard HLL (dense registers, numpy)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (exact for the top 53 bits, and the
        # sentinel bit above bounds the rank below that)
        rank = np.where(rest == 0, np.uint64(64 - self.p + 1), np.uint64(0))
        nz = rest != 0
        bits = np.frexp(rest[nz].astype(np.float64))[1]
        rank_nz = (64 - bits + 1).astype(np.uint64)
        out = np.zeros(len(h), dtype=np.uint64)
        out[nz] = rank_nz
        out[~nz] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, out.astype(np.uint8))

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert other.p == self.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(e)


def _hash_strings(values: list) -> np.ndarray:
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "little")
    return out


class MisraGries:
    """Misra–Gries heavy-hitters summary of width k: after any stream,
    every item with true frequency > n/(k+1) is present, and each
    reported count undercounts by at most n/(k+1). Mergeable: combine
    counters, then decrement-all by the (k+1)-th largest and drop
    non-positives — so one small dict per block crosses the wire."""

    def __init__(self, k: int = 64):
        self.k = k
        self.counters: dict = {}

    def add_many(self, values: list) -> None:
        c = self.counters
        k = self.k
        for v in values:
            if v in c:
                c[v] += 1
            elif len(c) < k:
                c[v] = 1
            else:
                # decrement-all; drop zeros (batch form of the classic step)
                drop = [key for key in c if c[key] == 1]
                for key in c:
                    c[key] -= 1
                for key in drop:
                    del c[key]
        self.counters = c

    def merge(self, other: "MisraGries") -> "MisraGries":
        c = dict(self.counters)
        for v, n in other.counters.items():
            c[v] = c.get(v, 0) + n
        if len(c) > self.k:
            cut = sorted(c.values(), reverse=True)[self.k]
            c = {v: n - cut for v, n in c.items() if n - cut > 0}
        self.counters = c
        return self


def approx_heavy_hitters(ds: rd.Dataset, col: str, k: int = 64, top: int = 10) -> list[tuple]:
    """Approximate top-``top`` most frequent values of ``col``: one
    width-k Misra–Gries summary per block, merged associatively on the
    driver (≤ num_blocks summaries of ≤ k entries — the keys never
    shuffle). Guaranteed to contain every value with frequency >
    n/(k+1). Per-block summaries travel as parallel key/count Arrow
    columns in the column's NATIVE type — a JSON dict would stringify
    int/date keys and silently merge distinct values that stringify
    identically (1 vs "1")."""

    def sketch_block(t: pa.Table) -> pa.Table:
        s = MisraGries(k)
        s.add_many(t.column(col).to_pylist())
        keys = list(s.counters.keys())
        # ONE row per block summary (list-typed), so downstream batch
        # coalescing can never interleave two summaries' rows
        return pa.table(
            {
                "keys": pa.array([keys], type=pa.list_(t.schema.field(col).type)),
                "counts": pa.array([[s.counters[x] for x in keys]], type=pa.list_(pa.int64())),
            }
        )

    merged = MisraGries(k)
    for b in ds.select_columns([col]).map_batches(
        sketch_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for keys, counts in zip(b.column("keys").to_pylist(), b.column("counts").to_pylist()):
            other = MisraGries(k)
            other.counters = dict(zip(keys, counts))
            merged.merge(other)
    return sorted(merged.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))[:top]


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one serialized sketch per block →
    driver-side merge of ≤ num_blocks tiny register arrays."""

    def sketch_block(t: pa.Table) -> pa.Table:
        s = HllSketch(p)
        s.add_hashes(_hash_strings(t.column(col).to_pylist()))
        return pa.table({"registers": pa.array([s.registers.tobytes()], pa.binary())})

    merged = HllSketch(p)
    for b in ds.select_columns([col]).map_batches(
        sketch_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for raw in b.column("registers").to_pylist():
            other = HllSketch(p)
            other.registers = np.frombuffer(raw, dtype=np.uint8).copy()
            merged.merge(other)
    return merged.estimate()


class KllSketch:
    """KLL-style quantile sketch (Karnin–Lang–Liberty compactor stack):
    level ``i`` holds items of weight ``2^i``; an over-capacity level is
    sorted and every other item (seeded random offset) promotes to the
    next level. One sketch is O(k·levels) floats regardless of stream
    length, and merge is level-wise concat + re-compact — associative,
    so per-block sketches combine through the same tiny-summary path as
    HLL/Misra–Gries. Total weight is conserved exactly (odd buffers
    leave one survivor in place), so ``total_weight == n`` always; exact
    min/max are tracked so q=0 / q=1 are exact. Expected rank error is
    ~1/k with the random offsets (asserted empirically in tests).

    This is the 100-TB quantile path for CONTINUOUS value domains:
    ``grouped_quantile_exact`` bounds its exchange by the distinct-value
    domain, which is the wrong shape when values are doubles — here the
    exchange is one ≤(k·levels)-float summary per block, never the rows.
    """

    def __init__(self, k: int = 256, seed: int = 42):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.total_weight = 0
        self.v_min = np.inf
        self.v_max = -np.inf
        self._rng = np.random.default_rng(seed)

    def extend(self, values: np.ndarray) -> None:
        values = np.asarray(values, np.float64)
        values = values[~np.isnan(values)]
        if not len(values):
            return
        self.total_weight += len(values)
        self.v_min = min(self.v_min, float(values.min()))
        self.v_max = max(self.v_max, float(values.max()))
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) > self.k:
                buf = np.sort(buf)
                off = int(self._rng.integers(2))
                if len(buf) % 2:  # odd: one survivor stays (weight conserved)
                    keep, body = (buf[-1:], buf[:-1]) if off == 0 else (buf[:1], buf[1:])
                else:
                    keep, body = buf[:0], buf
                self.levels[i] = keep
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], body[off::2]])
            i += 1

    def merge(self, other: "KllSketch") -> "KllSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for i, buf in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self.total_weight += other.total_weight
        self.v_min = min(self.v_min, other.v_min)
        self.v_max = max(self.v_max, other.v_max)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        if not self.total_weight:
            return float("nan")
        if q <= 0.0:
            return self.v_min
        if q >= 1.0:
            return self.v_max
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(buf), 1 << i, np.int64) for i, buf in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[order])
        idx = int(np.searchsorted(cum, q * self.total_weight, side="left"))
        return float(np.clip(vals[order][min(idx, len(vals) - 1)], self.v_min, self.v_max))


def approx_quantiles(
    ds: rd.Dataset, col: str, quantiles: list[float], k: int = 256, seed: int = 42
) -> dict[float, float]:
    """Approximate quantiles of a numeric column: one KLL summary per
    block (vectorized bulk insert) → driver merge of ≤ num_blocks
    summaries. Exchange volume is O(blocks · k · levels) floats — the
    rows never shuffle."""

    def sketch_block(t: pa.Table) -> pa.Table:
        s = KllSketch(k, seed)
        s.extend(t.column(col).to_numpy(zero_copy_only=False))
        flat = np.concatenate(s.levels) if s.total_weight else np.empty(0, np.float64)
        lvls = np.concatenate(
            [np.full(len(buf), i, np.int32) for i, buf in enumerate(s.levels)]
        ) if s.total_weight else np.empty(0, np.int32)
        return pa.table(
            {
                "values": pa.array([flat], pa.list_(pa.float64())),
                "lvls": pa.array([lvls], pa.list_(pa.int32())),
                "n": pa.array([s.total_weight], pa.int64()),
                "v_min": pa.array([s.v_min if s.total_weight else None], pa.float64()),
                "v_max": pa.array([s.v_max if s.total_weight else None], pa.float64()),
            }
        )

    merged = KllSketch(k, seed)
    for b in ds.select_columns([col]).map_batches(
        sketch_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for vals, lvls, n, vmin, vmax in zip(
            b.column("values").to_pylist(), b.column("lvls").to_pylist(),
            b.column("n").to_pylist(), b.column("v_min").to_pylist(),
            b.column("v_max").to_pylist(),
        ):
            if not n:
                continue
            other = KllSketch(k, seed)
            arr = np.asarray(vals, np.float64)
            lv = np.asarray(lvls, np.int32)
            other.levels = [arr[lv == i] for i in range(int(lv.max()) + 1)] if len(lv) else [arr]
            other.total_weight = int(n)
            other.v_min, other.v_max = float(vmin), float(vmax)
            merged.merge(other)
    return {float(q): merged.quantile(float(q)) for q in quantiles}


from ..util import mix64 as _mix64  # single shared splitmix64 finalizer


def _hash_column(arr) -> np.ndarray:
    """uint64 hashes of an Arrow column: vectorized splitmix64 for
    integer types, blake2b per value otherwise."""
    if pa.types.is_integer(arr.type):
        return _mix64(arr.to_numpy(zero_copy_only=False))
    return _hash_strings(arr.to_pylist())


class BloomFilter:
    """Standard Bloom filter over a power-of-two bitmap with double
    hashing (h1 + i·h2). At ``bits_per_key=10`` the false-positive rate
    is ~1% — and ~50× smaller than broadcasting the keys themselves, so
    it covers key sets two orders of magnitude past the value-set
    broadcast budget. Mergeable: bitwise OR, so per-block partials
    combine associatively like the other sketches."""

    def __init__(self, n_keys: int, bits_per_key: int = 10):
        want = max(64, int(n_keys) * int(bits_per_key))
        self.m = 1 << int(np.ceil(np.log2(want)))  # pow2 → mask, not mod
        self.k = max(1, int(round(0.693 * bits_per_key)))
        self.bits = np.zeros(self.m // 8, np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h.astype(np.uint64)
        h2 = _mix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & np.uint64(self.m - 1)  # (k, n)

    def add_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def might_contain_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, bool)
        pos = self._positions(h)  # (k, n)
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = (pos & np.uint64(7)).astype(np.uint8)
        return ((self.bits[byte] >> bit) & 1).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert other.m == self.m and other.k == self.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(ds: rd.Dataset, col: str, n_keys: int, bits_per_key: int = 10) -> BloomFilter:
    """Distributed Bloom build: one bitmap partial per block (vectorized
    add), OR-merged on the driver one block at a time (the accumulator
    plus a single in-flight partial — never all partials at once)."""

    def sketch_block(t: pa.Table) -> pa.Table:
        b = BloomFilter(n_keys, bits_per_key)
        b.add_hashes(_hash_column(t.column(col)))
        return pa.table({"bits": pa.array([b.bits.tobytes()], pa.binary())})

    merged = BloomFilter(n_keys, bits_per_key)
    for batch in ds.select_columns([col]).map_batches(
        sketch_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for raw in batch.column("bits").to_pylist():
            np.bitwise_or(merged.bits, np.frombuffer(raw, np.uint8), out=merged.bits)
    return merged


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows of ``width`` int64 counters. Point queries
    NEVER underestimate; overestimate ≤ 2N/width with probability
    1 − 2^-depth. Merge is elementwise addition — associative and
    commutative, so per-block partials tree-reduce like the HLL/Bloom
    members of this family (one depth×width int64 grid per block crosses
    the wire, never the keys)."""

    # distinct odd 64-bit multipliers (splitmix64-derived constants)
    _MULTS = np.array(
        [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
         0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5 | 1, 0xC2B2AE3D27D4EB4F],
        dtype=np.uint64,
    )

    def __init__(self, width: int = 2048, depth: int = 4):
        assert depth <= len(self._MULTS)
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _rows(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64)
        # one multiplicative re-hash per row; top bits via modulo width
        return np.stack(
            [((h * self._MULTS[i]) >> np.uint64(17)) % np.uint64(self.width)
             for i in range(self.depth)]
        ).astype(np.int64)  # (depth, n)

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> None:
        if not len(h):
            return
        c = np.ones(len(h), np.int64) if counts is None else counts.astype(np.int64)
        pos = self._rows(h)
        for i in range(self.depth):
            np.add.at(self.table[i], pos[i], c)

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, np.int64)
        pos = self._rows(h)
        return np.min(
            np.stack([self.table[i][pos[i]] for i in range(self.depth)]), axis=0
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert other.width == self.width and other.depth == self.depth
        self.table += other.table
        return self


def approx_term_counts(
    ds: rd.Dataset,
    text_col: str = "text",
    terms: tuple[str, ...] = ("data", "model", "graph", "pipeline", "entity"),
    width: int = 1 << 14,
    depth: int = 4,
) -> "pa.Table":
    """Approximate corpus-wide term frequencies from ONE streaming pass:
    per block, tokenize (the shared lowercase word RE2) and pre-reduce to
    (token, count) before sketching — the CMS absorbs the distinct-token
    domain so the point-query table for any ad-hoc term list costs O(1)
    per term instead of a corpus groupby. Per-block partial = one
    depth×width grid; driver folds one grid at a time (accumulator +
    single in-flight partial)."""
    import pyarrow.compute as pc

    def sketch_block(t: pa.Table) -> pa.Table:
        s = CountMinSketch(width, depth)
        lowered = pc.utf8_lower(t.column(text_col))
        flat = pc.list_flatten(pc.split_pattern_regex(lowered, "[^a-z0-9]+"))
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        if len(flat):
            g = (
                pa.table({"tok": flat})
                .group_by(["tok"])
                .aggregate([([], "count_all")])
                .rename_columns(["tok", "n"])
            )
            s.add_hashes(
                _hash_strings(g.column("tok").to_pylist()),
                g.column("n").to_numpy(zero_copy_only=False).astype(np.int64),
            )
        return pa.table({"grid": pa.array([s.table.tobytes()], pa.binary())})

    merged = CountMinSketch(width, depth)
    for b in ds.select_columns([text_col]).map_batches(
        sketch_block, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for raw in b.column("grid").to_pylist():
            merged.table += np.frombuffer(raw, np.int64).reshape(depth, width)

    q = merged.query_hashes(_hash_strings(list(terms)))
    return pa.table(
        {"term": pa.array(list(terms), pa.string()),
         "approx_count": pa.array(q, pa.int64())}
    )


def keyed_hll_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    p: int = 10,
    key_fn=None,
) -> rd.Dataset:
    """KEYED approximate distinct — the sketch-by-key aggregate (per
    tumbling window / per tenant / per source), distinct from this
    module's whole-corpus sketches: per block ONE HLL register array per
    key present (vectorized build), then a hash co-partition by key and
    an elementwise-max reduce per group. The shuffle moves
    O(keys-per-block × 2^p bytes) — at 10^12 rows a keyed exact
    COUNT(DISTINCT) shuffles every (key, value) pair, while this ships
    fixed 1-KiB registers regardless of group size. Returns
    ``(key, approx_distinct)`` with the standard HLL small-range linear
    counting (near-exact for small groups).

    ``key_fn`` (optional) maps the raw key column (Arrow) to the
    grouping key per batch — e.g. ``pc.floor_temporal`` for tumbling
    windows."""
    from ..util import adaptive_partitions, hash_partitioned_combine

    def sketch_block(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if key_fn is not None:
            keys = key_fn(keys)
        kt = pa.table({"k": keys, "v": t.column(value_col)})
        out_k, out_r = [], []
        h = _hash_column(kt.column("v").combine_chunks())
        karr = kt.column("k").to_numpy(zero_copy_only=False)
        order = np.argsort(karr, kind="stable")
        karr_s, h_s = karr[order], h[order]
        starts = np.flatnonzero(np.r_[True, karr_s[1:] != karr_s[:-1]])
        ends = np.r_[starts[1:], len(karr_s)]
        for s, e in zip(starts, ends):
            sk = HllSketch(p)
            sk.add_hashes(h_s[s:e])
            out_k.append(karr_s[s])
            out_r.append(sk.registers.tobytes())
        ktype = kt.schema.field("k").type
        return pa.table(
            {"k": pa.array(out_k, ktype), "regs": pa.array(out_r, pa.binary())}
        )

    partials = ds.map_batches(sketch_block, batch_format="pyarrow", batch_size=None)
    n_keys_hint = partials.count()  # ≤ keys × blocks — sized for the combine

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ks, est = [], []
        for k, g in df.groupby("k", sort=False):
            regs = np.stack([np.frombuffer(r, np.uint8) for r in g["regs"]]).max(axis=0)
            sk = HllSketch(p)
            sk.registers = regs.copy()
            ks.append(k)
            est.append(int(round(sk.estimate())))
        ktype = t.schema.field("k").type
        return pa.table(
            {"k": pa.array(ks, ktype), "approx_distinct": pa.array(est, pa.int64())}
        )

    return hash_partitioned_combine(
        partials, ["k"], combine, adaptive_partitions(8, n_rows=n_keys_hint)
    )


def approx_hourly_distinct_users(sf_dir: str, p: int = 10) -> rd.Dataset:
    """Per tumbling-hour approximate distinct users over events — the
    streaming-analytics keyed-cardinality view (exact per-window
    COUNT(DISTINCT) at corpus scale shuffles every (window, user) pair;
    this ships one 1-KiB register array per window per block).
    Approximate by design ⇒ rows-only driver check; the per-window
    relative-error bound vs exact is pinned in tests."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    out = keyed_hll_distinct(
        ds, "ts", "user_id", p=p, key_fn=lambda c: pc.floor_temporal(c, unit="hour")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["hour", "approx_users"]), batch_format="pyarrow"
    )
