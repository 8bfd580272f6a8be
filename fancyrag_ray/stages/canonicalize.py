"""Entity canonicalization: exact-match resolution + connected components.

Parity: the reference's entire canonicalization is
``SinglePropertyExactMatchResolver`` — merge entity nodes sharing
(label, name) — run inside Neo4j (``pipelines/kg_ingest.yaml:69-77``).
Here it is the canonicalization *shuffle*: ``groupby(label,
normalized_name)`` with the minimum stable id as canonical. The north
rule extends it with a distributed union-find (min-label propagation)
over alias/similarity edges, with hot-key handling.

Scale notes:
  * the exact resolver pre-aggregates per batch (one row per key per
    block) before the global groupby — partial/final combine, so a hot
    name (Zipf skew) contributes one row per block, not one per mention;
  * label propagation runs ``hash-min`` rounds: each round is two hash
    joins (edge endpoints × current labels) + a groupby-min; rounds are
    bounded by graph diameter (alias graphs are near-star ⇒ 2-3 rounds);
  * for candidate graphs that are provably small (post-LSH / alias
    tables), ``connected_components`` uses a driver-side union-find
    below ``driver_threshold`` edges — the distributed path is the same
    result, verified in tests.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..util import adaptive_partitions


def exact_resolution_mapping(nodes: rd.Dataset, id_col: str = "entity_id", label_col: str = "label", name_col: str = "name_norm") -> rd.Dataset:
    """entity_id → canonical_id where canonical = min(entity_id) over the
    (label, normalized-name) group. Emits only rows that change identity."""

    def partial(batch: pa.Table) -> pa.Table:
        # per-block combine: one candidate row per (label, name, min id)
        grouped = batch.group_by([label_col, name_col]).aggregate([(id_col, "min")])
        return grouped.rename_columns([label_col, name_col, id_col])

    candidates = nodes.select_columns([id_col, label_col, name_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    canon = candidates.groupby([label_col, name_col]).aggregate(Min(id_col, alias_name="canonical_id"))
    # join members back to their group's canonical id
    members = nodes.select_columns([id_col, label_col, name_col])
    joined = members.join(
        canon,
        join_type="inner",
        num_partitions=adaptive_partitions(64),
        on=(label_col, name_col),
    )
    return joined.select_columns([id_col, "canonical_id"])


def _driver_union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def _local_forest_fn(src_col: str, dst_col: str):
    """Per-block union-find → spanning-forest edges (node, min-of-local-
    component). Connectivity-preserving and deterministic; a block of E
    edges over V distinct nodes collapses to ≤ V-1 forest edges."""

    def local_forest(batch: pa.Table) -> pa.Table:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(batch.column(src_col).to_pylist(), batch.column(dst_col).to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        src_out, dst_out = [], []
        for node in parent:
            root = find(node)
            if root != node:
                src_out.append(node)
                dst_out.append(root)
        return pa.table({src_col: pa.array(src_out, pa.string()), dst_col: pa.array(dst_out, pa.string())})

    return local_forest


def connected_components(
    edges: rd.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 25,
    driver_threshold: int = 2_000_000,
    num_partitions: int = 16,
    algorithm: str = "contract",
    driver_node_limit: int = 20_000_000,
) -> rd.Dataset:
    """Return (node, component) with component = min node id reachable.

    Three tiers:
      * edge set ≤ ``driver_threshold`` → driver-side union-find
        (post-LSH candidate graphs are tiny);
      * ``algorithm="contract"`` (default) — iterative LOCAL SPANNING
        FOREST contraction: one ``map_batches`` union-find pass per
        level collapses every block of E edges over V nodes to ≤ V-1
        forest edges (connectivity-preserving), blocks are coalesced
        8-fold between levels, and the final forest (≤ |nodes| rows,
        bounded by ``driver_node_limit``) is resolved by a driver
        union-find. No shuffle, no hot-key straggler — a degree-10⁶ hub
        costs one block-local pass, not a skewed reducer. This is the
        scale path whenever the NODE count fits the driver (the edge
        stream may be arbitrarily larger).
      * ``algorithm="labelprop"`` — distributed hash-min label
        propagation with POINTER DOUBLING (``L(v) ← L(L(v))`` each
        round ⇒ O(log diameter) rounds) for graphs whose node set
        exceeds the driver; raises RuntimeError if the round budget is
        exhausted before convergence instead of silently returning
        wrong labels. Hot keys are blunted by a per-block partial
        min-combine before every groupby.
    """
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()), "component": pa.array([], pa.string())}))
    if n_edges <= driver_threshold:
        pairs = [(r[src_col], r[dst_col]) for r in edges.take_all()]
        mapping = _driver_union_find(pairs)
        nodes = sorted({x for p in pairs for x in p})
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.string()),
                    "component": pa.array([mapping.get(n, n) for n in nodes], pa.string()),
                }
            )
        )
    if algorithm == "contract":
        return _cc_contract(edges, src_col, dst_col, driver_node_limit)
    return _cc_labelprop(edges, src_col, dst_col, max_rounds, num_partitions)


def _cc_contract(edges: rd.Dataset, src_col: str, dst_col: str, driver_node_limit: int) -> rd.Dataset:
    forest = edges.select_columns([src_col, dst_col]).map_batches(
        lambda t: pa.table({src_col: t.column(src_col).cast(pa.string()),
                            dst_col: t.column(dst_col).cast(pa.string())}),
        batch_format="pyarrow",
    )
    local_forest = _local_forest_fn(src_col, dst_col)
    m_prev = None
    m = None
    for _level in range(8):
        forest = forest.map_batches(local_forest, batch_format="pyarrow", batch_size=None).materialize()
        m = forest.count()
        if m <= driver_node_limit:
            break
        if m_prev is not None and m >= m_prev:
            raise RuntimeError(
                f"connected_components: contracted forest has {m} edges ≥ node "
                f"driver limit {driver_node_limit} and stopped shrinking — "
                "use algorithm='labelprop' for node sets beyond driver memory"
            )
        m_prev = m
        nblocks = forest.num_blocks() if hasattr(forest, "num_blocks") else 8
        forest = forest.repartition(max(1, nblocks // 8))
    if m is not None and m > driver_node_limit:
        # Level budget exhausted while still above the documented driver
        # bound: refusing beats a silent driver OOM on the final resolve.
        raise RuntimeError(
            f"connected_components: forest still has {m} edges after 8 "
            f"contraction levels (> driver_node_limit {driver_node_limit}) — "
            "use algorithm='labelprop' for node sets beyond driver memory"
        )
    # final resolve on the driver: ≤ |distinct nodes| forest edges
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    all_nodes: set = set()
    for b in forest.iter_batches(batch_format="pyarrow"):
        srcs = b.column(src_col).to_pylist()
        dsts = b.column(dst_col).to_pylist()
        all_nodes.update(srcs)
        all_nodes.update(dsts)
        for a, c in zip(srcs, dsts):
            ra, rb = find(a), find(c)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    nodes = sorted(all_nodes)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "component": pa.array([find(n) for n in nodes], pa.string()),
            }
        )
    )


def _cc_labelprop(
    edges: rd.Dataset, src_col: str, dst_col: str, max_rounds: int, num_partitions: int
) -> rd.Dataset:

    # Distributed path: undirected closure, labels start as node id.
    def to_pairs(batch: pa.Table) -> pa.Table:
        a, b = batch.column(src_col), batch.column(dst_col)
        return pa.table({"node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                         "nbr": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])})

    und = edges.map_batches(to_pairs, batch_format="pyarrow")
    labels = und.groupby("node").aggregate(Min("nbr", alias_name="component"))

    def keep_min(batch: pa.Table) -> pa.Table:
        comp = pc.min_element_wise(batch.column("component"), batch.column("node"))
        return pa.table({"node": batch.column("node"), "component": comp})

    labels = labels.map_batches(keep_min, batch_format="pyarrow").materialize()
    parts = adaptive_partitions(num_partitions, n_rows=labels.count())

    def partial_min(t: pa.Table) -> pa.Table:
        # per-block combine: a hot node's messages collapse to one row
        # per block before the shuffle
        g = t.group_by(["node"]).aggregate([("component", "min")])
        return g.rename_columns(["node", "component"])

    converged = False
    for _ in range(max_rounds):
        # message pass: neighbor's current component → each node
        msgs = und.join(
            labels, join_type="inner", num_partitions=parts,
            on=("nbr",), right_on=("node",), right_suffix="_r",
        ).select_columns(["node", "component"])
        new_labels = (
            msgs.union(labels)
            .map_batches(partial_min, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .aggregate(Min("component", alias_name="component"))
        )
        # pointer doubling: L(v) ← min(L(v), L(L(v))). Every component
        # value is itself a node in `labels`, so the inner join is total.
        new_labels = (
            new_labels.join(
                new_labels, join_type="left_outer", num_partitions=parts,
                on=("component",), right_on=("node",), left_suffix="", right_suffix="_hop",
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "component": pc.min_element_wise(
                            t.column("component"),
                            pc.coalesce(t.column("component_hop"), t.column("component")),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # convergence: stop when no label shrank this round
        changed = (
            new_labels.join(
                labels, join_type="inner", num_partitions=parts,
                on=("node",), left_suffix="", right_suffix="_old",
            )
            .map_batches(
                lambda t: t.filter(pc.not_equal(t.column("component"), t.column("component_old"))),
                batch_format="pyarrow",
            )
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds 2^rounds — raise max_rounds)"
        )
    return labels
