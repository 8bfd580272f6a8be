"""Small shared helpers."""

from __future__ import annotations

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
