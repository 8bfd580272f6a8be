"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# Heap share one broadcast lookup structure may claim on the driver (and
# on every worker that ray.gets it). 256 MiB raw-bytes: with the Python
# dict/set overhead factor below that is ~1 GiB resident — conservative
# for a 128 GiB box, survivable on a small cluster head node.
BROADCAST_BUDGET_BYTES = 256 * 1024 * 1024

# Arrow bytes → Python dict/set resident bytes multiplier (measured:
# str→bytes dicts land 3-5× their Arrow footprint once PyObject headers
# and hash-table slack are counted).
_PY_OVERHEAD = 4.0


def fits_broadcast(
    n_rows: int, mean_row_bytes: float, budget_bytes: int = BROADCAST_BUDGET_BYTES
) -> bool:
    """Tier decision for broadcast-vs-join: True iff a driver-side lookup
    structure of ``n_rows`` entries averaging ``mean_row_bytes`` fits the
    byte budget. Row-count limits alone are wrong in both directions — 5M
    narrow keys fit easily while 500k wide documents do not."""
    return n_rows * mean_row_bytes * _PY_OVERHEAD <= budget_bytes


def dataset_mean_row_bytes(ds: rd.Dataset, n_rows: int) -> float:
    """Mean serialized row width of a (preferably materialized) dataset;
    falls back to a conservative 64 B when size metadata is unavailable."""
    try:
        sz = ds.size_bytes()
    except Exception:
        sz = None
    if not sz or not n_rows:
        return 64.0
    return sz / n_rows


def hash_partitioned_combine(ds: rd.Dataset, keys: list[str], combine_fn, num_partitions: int) -> rd.Dataset:
    """High-cardinality grouped aggregate: hash-repartition by ``keys``
    (every row of a key lands in exactly one block), then run
    ``combine_fn`` (a whole-block pyarrow.Table → Table grouped combine)
    once per block.

    Ray's default groupby().aggregate() is a sort-based shuffle — fine at
    thousands of groups, but measured ~33 s for a 1.25M-row / 1.13M-group
    aggregate at sf0.1 where this path takes ~5 s: hashing avoids the
    global sort entirely and the per-block combine is one vectorized
    Arrow group_by. Use when groups ≈ rows (pair counting, per-entity
    rollups); keep the default groupby for low-cardinality keys.

    HASH_SHUFFLE is enabled on THIS dataset's context copy only
    (``ds.context`` is per-dataset — verified isolated), with aggregator
    actors clamped to ``num_partitions`` so a small cluster can't be
    wedged by per-partition actor spawn.
    """
    from ray.data.context import ShuffleStrategy

    if num_partitions <= 1:
        # one partition ⇒ every key co-locates anyway; a plain coalesce
        # skips the hash-shuffle aggregator-actor spawn (~5 s cold cost
        # that dwarfs tiny inputs)
        rep = ds.repartition(1)
    else:
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ds.context.max_hash_shuffle_aggregators = num_partitions
        rep = ds.repartition(num_partitions, keys=keys)
    # batch_size=None ⇒ combine sees each block whole, so the per-block
    # group_by is the FINAL combine for every key in that block
    return rep.map_batches(combine_fn, batch_format="pyarrow", batch_size=None)


ROWS_PER_PARTITION = 1 << 20  # scale-up target: ~1M rows per combine block
MIN_ROWS_PER_PARTITION = 1 << 15  # don't spawn an aggregator actor for less


def adaptive_partitions(requested: int, minimum: int = 2, n_rows: int | None = None) -> int:
    """Size a shuffle/join partition count to the cluster's CPU budget
    and (when known) the data size — in BOTH directions.

    Down-clamps (observed failure modes):
      * aggregator actors are spawned per partition — a count far above
        the available CPUs can wedge a small cluster (16-partition join
        deadlocks a 4-CPU local node);
      * a partition that receives ZERO rows yields a schema-less empty
        table inside the join finalizer and pyarrow's key FieldRef
        lookup fails ("No match or multiple matches for key field…") —
        so tiny inputs must collapse to one partition;
      * below ~32k rows/partition the fixed per-aggregator spawn cost
        dwarfs the work (measured: a 100k-row shuffle at 16 partitions
        spends seconds spawning actors for milliseconds of combine).

    Up-scale: when ``n_rows`` says the data is big, the count grows
    toward ~1M rows per partition (capped by CPUs — which on a real
    multi-node cluster is the large number), so a caller's small
    default (16) never becomes the all-to-all bottleneck at 1000× the
    data. Partition counts must come through here, not be hardcoded.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", minimum))
    except Exception:
        cpus = minimum
    parts = max(minimum, min(requested, cpus))
    if n_rows is not None:
        if n_rows < 4096:
            return 1
        want = -(-n_rows // ROWS_PER_PARTITION)  # ceil
        parts = min(max(parts, want), max(cpus, minimum))
        parts = min(parts, max(1, n_rows // MIN_ROWS_PER_PARTITION))
    return parts


def mix64(x) -> "object":
    """Vectorized splitmix64 finalizer over a uint64 numpy array —
    THE shared partition-hash mixer (sessionization bucketing, Bloom
    probe hashing, …). One definition: tiered paths that hash the same
    keys in two places stay consistent only if both import this."""
    import numpy as np

    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def to_cents(values) -> "object":
    """float currency → int64 cents with HALF-AWAY-FROM-ZERO rounding —
    matching SQL ROUND so integer-cents oracles are hash-exact on exact
    .5 inputs too (np.rint / pc.round are half-to-even and disagree with
    DuckDB by one cent there)."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64) * 100.0
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int64)


def tiered_anti_join(
    left: rd.Dataset,
    left_key: str,
    right: rd.Dataset,
    right_key: str,
    broadcast_budget_bytes: int | None = None,
    bits_per_key: int = 10,
) -> rd.Dataset:
    """Left rows with no right-key match — EXACT at every tier, sized to
    the right side:

    1. right keys fit the broadcast byte budget → Arrow value_set probed
       with ``pc.is_in`` inside map_batches; nothing shuffles.
    2. keys don't fit but their Bloom bitmap does (~50× smaller at 10
       bits/key, so this tier reaches ~2 orders of magnitude further) →
       bloom-NEGATIVE left rows are definite non-matches and never
       shuffle; only the ~fp·|left| + true-match remainder takes the
       exact ``left_anti`` join that removes false positives.
    3. both over budget → plain hash ``left_anti`` join.

    In anti-join-heavy shapes (dedup against a store, orphan checks)
    most of the left side is a definite negative, so tier 2 removes most
    of the all-to-all exchange that tier 3 would pay.
    """
    budget = BROADCAST_BUDGET_BYTES if broadcast_budget_bytes is None else broadcast_budget_bytes
    keys_ds = right.select_columns([right_key]).materialize()
    n_right = keys_ds.count()
    if n_right == 0:
        return left
    n_left = left.count()

    if fits_broadcast(n_right, dataset_mean_row_bytes(keys_ds, n_right), budget):
        value_set = pa.array(keys_ds.unique(right_key))

        def anti(t: pa.Table) -> pa.Table:
            col = t.column(left_key)
            return t.filter(pc.invert(pc.is_in(col, value_set=value_set.cast(col.type))))

        return left.map_batches(anti, batch_format="pyarrow")

    # budget the ROUNDED bitmap (BloomFilter sizes to the next power of
    # two, up to ~2× the raw bits/key estimate), not the estimate
    want_bits = max(64, n_right * bits_per_key)
    bloom_bytes = (1 << int(want_bits - 1).bit_length()) // 8
    if bloom_bytes <= budget:
        from .functions.sketches import BloomFilter, _hash_column, build_bloom

        bloom = build_bloom(keys_ds, right_key, n_right, bits_per_key)
        bits_ref = ray.put(bloom.bits)
        m, k = bloom.m, bloom.k

        def flag(t: pa.Table) -> pa.Table:
            b = BloomFilter.__new__(BloomFilter)
            b.m, b.k, b.bits = m, k, ray.get(bits_ref)
            maybe = b.might_contain_hashes(_hash_column(t.column(left_key)))
            return t.append_column("__maybe", pa.array(maybe, pa.bool_()))

        flagged = left.map_batches(flag, batch_format="pyarrow").materialize()
        definite = flagged.map_batches(
            lambda t: t.filter(pc.invert(t.column("__maybe"))).drop_columns(["__maybe"]),
            batch_format="pyarrow",
        )
        maybe_rows = flagged.map_batches(
            lambda t: t.filter(t.column("__maybe")).drop_columns(["__maybe"]),
            batch_format="pyarrow",
        ).materialize()
        if maybe_rows.count() == 0:
            return definite
        verified = maybe_rows.join(
            keys_ds, join_type="left_anti",
            num_partitions=adaptive_partitions(16, n_rows=maybe_rows.count()),
            on=(left_key,), right_on=(right_key,),
        )
        return definite.union(verified)

    return left.join(
        keys_ds, join_type="left_anti",
        num_partitions=adaptive_partitions(16, n_rows=n_left),
        on=(left_key,), right_on=(right_key,),
    )
