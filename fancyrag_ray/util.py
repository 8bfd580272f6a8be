"""Small shared helpers."""

from __future__ import annotations

import ray


def adaptive_partitions(requested: int, minimum: int = 2, n_rows: int | None = None) -> int:
    """Clamp a shuffle/join partition count to the cluster's CPU budget
    and (when known) the data size.

    Two observed failure modes motivate this:
      * aggregator actors are spawned per partition — a count far above
        the available CPUs can wedge a small cluster (16-partition join
        deadlocks a 4-CPU local node);
      * a partition that receives ZERO rows yields a schema-less empty
        table inside the join finalizer and pyarrow's key FieldRef
        lookup fails ("No match or multiple matches for key field…") —
        so tiny inputs must collapse to one partition.
    At real scale (rows ≫ partitions) both clamps are no-ops.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", minimum))
    except Exception:
        cpus = minimum
    parts = max(minimum, min(requested, cpus))
    if n_rows is not None:
        if n_rows < 4096:
            return 1
        parts = min(parts, max(1, n_rows // 2048))
    return parts
