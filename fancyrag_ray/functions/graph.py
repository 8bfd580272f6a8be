"""Graph analytics over the materialized KG edge table.

The reference stops at materialization (Cypher MERGE writes,
``src/fancyrag/kg/pipeline.py``) and delegates any graph analytics to
Neo4j. A Lance/parquet-native engine has no database to lean on, so the
two standard KG health analytics — the degree distribution QA check and
a PageRank-style entity importance score — are implemented here as
Dataset compositions:

- :func:`entity_degree_hist` is pure partial-aggregate → tiny combine
  (no driver materialization, keys never leave workers un-reduced) and
  is ORACLE-CHECKED end-to-end (flagship SQL as a CTE → degree CTE →
  histogram), making it a second hash-checked derivative of the full
  chunk→extract→link→merge DAG.
- :func:`pagerank` is the iterative-algorithm showcase: per iteration
  one edge traversal (map_batches) + one hash-partitioned combine, with
  the rank vector either broadcast (``ray.put`` once per iteration,
  byte-budgeted via ``fits_broadcast``) or hash-joined above the budget
  — the same two-tier shape the dedup/anti-join paths use. Dangling
  mass is redistributed uniformly (standard PageRank correction).

Scale notes: the degree histogram's first aggregate is block-local, so
the only shuffle is over (node → partial deg) pairs, ≪ edges for skewed
graphs; PageRank's per-iteration state is O(nodes), never O(edges), and
the driver holds at most one O(nodes) vector in the broadcast tier
(documented bound, same contract as canonicalize's contraction tier).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..util import (
    adaptive_partitions,
    dataset_mean_row_bytes,
    fits_broadcast,
    hash_partitioned_combine,
)


_EDGES_CACHE: dict[tuple, rd.Dataset] = {}


def _flagship_edges(sf_dir: str) -> rd.Dataset:
    """Edge table of the full flagship DAG with the SQL-reproducible
    ``text-exact`` chunk profile (same contract as ``kg_flagship_edges``).

    MATERIALIZED and memoized per (documents snapshot, Ray job): every
    graph query over one corpus shares the same edge table, so the
    first caller pays the chunk→extract→link→merge build once and the
    rest read the object-store blocks — the query-suite equivalent of
    writing the edge table to storage and reading it back (which is
    exactly what the at-scale deployment does via the resumable build's
    persisted edges). Keyed on the Ray job id so a fresh ``ray.init``
    in the same process can never see another session's object refs."""
    import os

    from ..config import PROFILES, PipelineConfig
    from ..pipelines.kg_build import run_kg_build
    from ..sources.io import interleave_documents

    p = f"{sf_dir}/documents.parquet"
    st = os.stat(p)
    try:
        import ray

        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    fp = (os.path.realpath(p), st.st_mtime_ns, st.st_size, job)
    hit = _EDGES_CACHE.get(fp)
    if hit is not None:
        return hit
    docs = rd.read_parquet(p, columns=["doc_id", "text"])
    inter = docs.map_batches(interleave_documents, batch_format="pyarrow")
    cfg = PipelineConfig(profile=PROFILES["text-exact"])
    edges = run_kg_build(
        inter, alias_table=None, cfg=cfg, emit_cooccurrence=True
    ).edges.materialize()
    _EDGES_CACHE[fp] = edges
    return edges


def degree_hist(edges: rd.Dataset, src_col: str = "src_id", dst_col: str = "dst_id") -> rd.Dataset:
    """(degree, n_nodes) histogram over edge endpoints.

    Both aggregations are partial-first: per-block endpoint counts
    reduce inside ``map_batches`` before the small (node, deg) shuffle,
    and the final histogram groups the ≪ nodes distinct degree values.
    """

    def ends(t: pa.Table) -> pa.Table:
        nodes = pa.chunked_array(
            [t.column(src_col).combine_chunks(), t.column(dst_col).combine_chunks()]
        )
        g = pa.table({"node": nodes}).group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "deg"])

    partial = edges.map_batches(ends, batch_format="pyarrow", batch_size=None)

    def combine(t: pa.Table) -> pa.Table:
        return t.group_by(["node"]).aggregate([("deg", "sum")]).rename_columns(["node", "deg"])

    deg = hash_partitioned_combine(partial, ["node"], combine, adaptive_partitions(8))

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["deg"]).aggregate([([], "count_all")])
        return g.rename_columns(["degree", "n_nodes"])

    hp = deg.map_batches(hist_partial, batch_format="pyarrow", batch_size=None)
    return hp.groupby("degree").aggregate(Sum("n_nodes", alias_name="n_nodes"))


def entity_degree_hist(sf_dir: str) -> rd.Dataset:
    """Degree distribution of the flagship KG — the orphan/hub QA view
    (reference G1/G3 count queries, ``evaluator.py``) as a full
    histogram, oracle-checked through the entire DAG."""
    return degree_hist(_flagship_edges(sf_dir))


ENTITY_DEGREE_HIST_SQL_TEMPLATE = """
WITH edges AS ({edges_sql}),
ends AS (
  SELECT src_id AS node FROM edges
  UNION ALL
  SELECT dst_id AS node FROM edges
),
deg AS (SELECT node, COUNT(*)::BIGINT AS degree FROM ends GROUP BY node)
SELECT degree, COUNT(*)::BIGINT AS n_nodes FROM deg GROUP BY degree
"""


def entity_degree_hist_sql() -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_DEGREE_HIST_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL)


def pagerank(
    edges: rd.Dataset,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    damping: float = 0.85,
    iters: int = 10,
    symmetric: bool = True,
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Distributed PageRank over an edge Dataset → (node, rank).

    Per iteration: one edge-traversal ``map_batches`` producing partial
    per-destination contribution sums, one hash-partitioned combine over
    nodes. The rank vector rides as a broadcast dict (``ray.put`` once
    per iteration) when it fits the byte budget, else as a hash join —
    tier chosen by :func:`fits_broadcast`. Dangling-node mass (out-degree
    0 — impossible when ``symmetric``) is redistributed uniformly.

    ``symmetric=True`` unions both edge directions first (the flagship's
    CO_OCCURS edges are stored once per unordered pair).
    """
    ed = edges.select_columns([src_col, dst_col]).map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col).cast(pa.string()), "dst": t.column(dst_col).cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    if symmetric:
        ed = ed.union(
            ed.map_batches(
                lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
                batch_format="pyarrow",
            )
        )
    ed = ed.materialize()

    # out-degree per source (partial → combine), then per-edge weight 1/outdeg
    def od_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([([], "count_all")])
        return g.rename_columns(["src", "outdeg"])

    def od_combine(t: pa.Table) -> pa.Table:
        return t.group_by(["src"]).aggregate([("outdeg", "sum")]).rename_columns(["src", "outdeg"])

    nparts = adaptive_partitions(8, n_rows=ed.count())
    outdeg = hash_partitioned_combine(
        ed.map_batches(od_partial, batch_format="pyarrow", batch_size=None),
        ["src"], od_combine, nparts,
    ).materialize()

    # node universe = sources ∪ destinations
    def nodes_partial(t: pa.Table) -> pa.Table:
        arr = pa.chunked_array([t.column("src").combine_chunks(), t.column("dst").combine_chunks()])
        return pa.table({"node": pc.unique(arr)})

    nodes = hash_partitioned_combine(
        ed.map_batches(nodes_partial, batch_format="pyarrow", batch_size=None),
        ["node"],
        lambda t: pa.table({"node": pc.unique(t.column("node"))}),
        nparts,
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )

    use_broadcast = fits_broadcast(
        n_nodes,
        dataset_mean_row_bytes(nodes, n_nodes) + 8.0,
        **({"budget_bytes": broadcast_budget} if broadcast_budget is not None else {}),
    )
    base = (1.0 - damping) / n_nodes

    if use_broadcast:
        # O(nodes) driver state — same documented bound as the CC
        # contraction tier; edge traversal stays distributed and fully
        # vectorized (index_in against the broadcast node array, no
        # per-row dict lookups).
        node_tbl = pa.concat_tables(list(nodes.iter_batches(batch_format="pyarrow")))
        col = node_tbl.column("node")
        node_arr = pc.take(col, pc.array_sort_indices(col)).combine_chunks()
        od_vec = np.zeros(n_nodes, np.float64)
        for b in outdeg.iter_batches(batch_format="pyarrow"):
            idx = pc.index_in(b.column("src"), value_set=node_arr).to_numpy(zero_copy_only=False)
            od_vec[idx] = b.column("outdeg").to_numpy(zero_copy_only=False)
        rank_vec = np.full(n_nodes, 1.0 / n_nodes)
        node_ref = ray.put(node_arr)
        for _ in range(iters):
            with np.errstate(divide="ignore", invalid="ignore"):
                weight_vec = np.where(od_vec > 0, rank_vec / np.maximum(od_vec, 1.0), 0.0)
            dangling = float(rank_vec[od_vec == 0].sum())
            w_ref = ray.put(weight_vec)

            def contrib(t: pa.Table, _n=node_ref, _w=w_ref) -> pa.Table:
                na, wv = ray.get(_n), ray.get(_w)
                idx = pc.index_in(t.column("src"), value_set=na).to_numpy(zero_copy_only=False)
                out = pa.table({"dst": t.column("dst"), "c": pa.array(wv[idx], type=pa.float64())})
                g = out.group_by(["dst"]).aggregate([("c", "sum")])
                return g.rename_columns(["dst", "c"])

            sums = hash_partitioned_combine(
                ed.map_batches(contrib, batch_format="pyarrow", batch_size=None),
                ["dst"],
                lambda t: t.group_by(["dst"]).aggregate([("c", "sum")]).rename_columns(["dst", "c"]),
                nparts,
            )
            new_vec = np.full(n_nodes, base + damping * dangling / n_nodes)
            for b in sums.iter_batches(batch_format="pyarrow"):
                idx = pc.index_in(b.column("dst"), value_set=node_arr).to_numpy(zero_copy_only=False)
                new_vec[idx] += damping * b.column("c").to_numpy(zero_copy_only=False)
            rank_vec = new_vec
        return rd.from_arrow(
            pa.table({"node": node_arr, "rank": pa.array(rank_vec, type=pa.float64())})
        )

    # join tier: rank vector larger than the broadcast budget — keep it
    # as a Dataset keyed by node and hash-join per iteration.
    ed2 = ed.join(outdeg, join_type="inner", num_partitions=nparts, on=("src",))
    ed2 = ed2.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "w": pc.divide(pa.scalar(1.0), pc.cast(t.column("outdeg"), pa.float64())),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    ranks_ds = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(np.full(t.num_rows, 1.0 / n_nodes))),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(iters):
        contribs = ed2.join(
            ranks_ds.map_batches(
                lambda t: t.rename_columns(["src", "rank"]), batch_format="pyarrow"
            ),
            join_type="inner", num_partitions=nparts, on=("src",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("dst"),
                    "c": pc.multiply(t.column("w"), t.column("rank")),
                }
            ),
            batch_format="pyarrow",
        )
        summed = hash_partitioned_combine(
            contribs,
            ["node"],
            lambda t: t.group_by(["node"]).aggregate([("c", "sum")]).rename_columns(["node", "c"]),
            nparts,
        )
        # left join back onto the node universe; missing → 0 incoming.
        # No dangling correction needed in the join tier only when the
        # graph is symmetric; otherwise compute the dangling mass with a
        # small anti-join aggregate.
        dangling = 0.0
        if not symmetric:
            # rank mass on nodes with no out-edges: left-join outdeg,
            # keep null-outdeg rows, and reduce to ONE scalar with a
            # distributed sum — this is the over-budget tier, so the
            # driver must never iterate O(nodes) rows
            d_ds = (
                ranks_ds.map_batches(
                    lambda t: t.rename_columns(["src", "rank"]), batch_format="pyarrow"
                )
                .join(outdeg, join_type="left_outer", num_partitions=nparts, on=("src",))
                .map_batches(
                    lambda t: t.filter(pc.is_null(t.column("outdeg"))).select(["rank"]),
                    batch_format="pyarrow",
                )
            )
            dangling = d_ds.sum("rank") or 0.0
        joined = nodes.join(summed, join_type="left_outer", num_partitions=nparts, on=("node",))
        extra = damping * dangling / n_nodes
        ranks_ds = joined.map_batches(
            lambda t, _e=extra: pa.table(
                {
                    "node": t.column("node"),
                    "rank": pc.add(
                        pa.scalar(base + _e),
                        pc.multiply(
                            pa.scalar(damping), pc.fill_null(pc.cast(t.column("c"), pa.float64()), 0.0)
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return ranks_ds


def triangle_counts(
    edges: rd.Dataset,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Per-node triangle participation counts → (node, n_triangles).

    Degree-oriented wedge counting (the standard distributed algorithm):
    orient every undirected edge from its lower-(degree, id) endpoint to
    the higher one, so each out-adjacency has O(√m) neighbors even at
    hub nodes; wedges are out-neighbor pairs per pivot (complete inside
    one block after a hash partition on the pivot); a wedge closes into
    a triangle iff its (b1, b2) pair is itself an oriented edge — one
    hash join. Each triangle is found exactly once (at its lowest-order
    corner) and then credited to all three corners with a partial-first
    count combine. Nothing corpus-sized reaches the driver: the
    (node → degree) map used for orientation is broadcast only when it
    passes :func:`fits_broadcast` (same byte budget as pagerank's
    broadcast tier); above the budget the orientation becomes two hash
    joins on the edge endpoints.
    """
    # normalize to undirected unique (lo, hi) pairs
    def norm(t: pa.Table) -> pa.Table:
        a = t.column(src_col).cast(pa.string())
        b = t.column(dst_col).cast(pa.string())
        a_lo = pc.less_equal(a, b)  # min/max_element_wise don't take strings
        lo = pc.if_else(a_lo, a, b)
        hi = pc.if_else(a_lo, b, a)
        out = pa.table({"a": lo, "b": hi})
        out = out.filter(pc.not_equal(out.column("a"), out.column("b")))  # drop self-loops
        return out.group_by(["a", "b"]).aggregate([])

    _empty = pa.table(
        {"node": pa.array([], pa.string()), "n_triangles": pa.array([], pa.int64())}
    )
    # row-bounded partition counts throughout: a hash-shuffle partition
    # that receives ZERO rows finalizes a schema-less table and fails —
    # tiny or empty stages must collapse to one partition (documented in
    # adaptive_partitions), and the triangle set below can legitimately
    # be empty even on a big graph
    n_raw = edges.count()
    if n_raw == 0:
        return rd.from_arrow(_empty)
    und = hash_partitioned_combine(
        edges.map_batches(norm, batch_format="pyarrow", batch_size=None),
        ["a", "b"],
        lambda t: t.group_by(["a", "b"]).aggregate([]),
        adaptive_partitions(8, n_rows=n_raw),
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return rd.from_arrow(_empty)

    # endpoint degrees (partial-first); the (node → degree) map is
    # O(nodes) narrow rows — broadcast when it fits the byte budget,
    # else orient via two endpoint hash joins (pagerank's tier switch).
    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.chunked_array([t.column("a").combine_chunks(), t.column("b").combine_chunks()])
        g = pa.table({"node": nodes}).group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "deg"])

    deg = hash_partitioned_combine(
        und.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["node"],
        lambda t: t.group_by(["node"]).aggregate([("deg", "sum")]).rename_columns(["node", "deg"]),
        adaptive_partitions(8, n_rows=2 * n_edges),
    ).materialize()
    n_nodes = deg.count()
    use_broadcast = fits_broadcast(
        n_nodes,
        dataset_mean_row_bytes(deg, n_nodes) + 8.0,
        **({"budget_bytes": broadcast_budget} if broadcast_budget is not None else {}),
    )

    if use_broadcast:
        deg_tbl = pa.concat_tables(list(deg.iter_batches(batch_format="pyarrow")))
        node_arr = deg_tbl.column("node").combine_chunks()
        deg_vec = deg_tbl.column("deg").to_numpy(zero_copy_only=False)
        node_ref = ray.put(node_arr)
        deg_ref = ray.put(deg_vec)

        def orient(t: pa.Table) -> pa.Table:
            """src = lower-(degree, id) endpoint, dst = the other."""
            na, dv = ray.get(node_ref), ray.get(deg_ref)
            ia = pc.index_in(t.column("a"), value_set=na).to_numpy(zero_copy_only=False)
            ib = pc.index_in(t.column("b"), value_set=na).to_numpy(zero_copy_only=False)
            da, db = dv[ia], dv[ib]
            # a < b lexically already, so ties on degree keep a as source
            a_first = (da < db) | (da == db)
            src = pc.if_else(pa.array(a_first), t.column("a").combine_chunks(), t.column("b").combine_chunks())
            dst = pc.if_else(pa.array(a_first), t.column("b").combine_chunks(), t.column("a").combine_chunks())
            return pa.table({"src": src, "dst": dst})

        oriented = und.map_batches(orient, batch_format="pyarrow").materialize()
    else:
        # join tier: degrees ride onto each endpoint via hash joins, the
        # driver never holds the node set
        jparts = adaptive_partitions(8, n_rows=n_edges)
        deg_a = deg.map_batches(
            lambda t: t.rename_columns(["a", "deg_a"]), batch_format="pyarrow"
        )
        deg_b = deg.map_batches(
            lambda t: t.rename_columns(["b", "deg_b"]), batch_format="pyarrow"
        )
        j = und.join(deg_a, join_type="inner", num_partitions=jparts, on=("a",)).join(
            deg_b, join_type="inner", num_partitions=jparts, on=("b",)
        )

        def orient_joined(t: pa.Table) -> pa.Table:
            da = t.column("deg_a").to_numpy(zero_copy_only=False)
            db = t.column("deg_b").to_numpy(zero_copy_only=False)
            a_first = da <= db  # a < b lexically, so ties keep a as source
            src = pc.if_else(pa.array(a_first), t.column("a").combine_chunks(), t.column("b").combine_chunks())
            dst = pc.if_else(pa.array(a_first), t.column("b").combine_chunks(), t.column("a").combine_chunks())
            return pa.table({"src": src, "dst": dst})

        oriented = j.map_batches(orient_joined, batch_format="pyarrow").materialize()

    def wedges(t: pa.Table) -> pa.Table:
        """All out-neighbor pairs per pivot (block holds each pivot's
        full adjacency after the hash partition); pairs emitted in
        canonical (w1 < w2) order so the closing join hits the oriented
        edge in whichever direction the degree order stored it — join
        both orders below."""
        empty = pa.table(
            {
                "pivot": pa.array([], pa.string()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
            }
        )
        if t.num_rows < 2:
            return empty
        df = t.to_pandas()
        pv, w1, w2 = [], [], []
        for pivot, g in df.groupby("src", sort=False):
            nb = np.sort(g["dst"].to_numpy(dtype=object))
            m = len(nb)
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            pv.append(np.full(len(ai), pivot, dtype=object))
            w1.append(nb[ai])
            w2.append(nb[bi])
        if not pv:
            return empty
        return pa.table(
            {
                "pivot": pa.array(np.concatenate(pv), pa.string()),
                "w1": pa.array(np.concatenate(w1), pa.string()),
                "w2": pa.array(np.concatenate(w2), pa.string()),
            }
        )

    wedge_ds = hash_partitioned_combine(
        oriented, ["src"], wedges, adaptive_partitions(8, n_rows=n_edges)
    ).materialize()
    if wedge_ds.count() == 0:  # a zero-row join side crashes the hash join
        return rd.from_arrow(_empty)
    # closing edge may be oriented either way relative to (w1 < w2)
    closing = oriented.union(
        oriented.map_batches(
            lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
            batch_format="pyarrow",
        )
    )
    parts = adaptive_partitions(8, n_rows=n_edges)
    tri = wedge_ds.join(
        closing, join_type="inner", num_partitions=parts, on=("w1", "w2"), right_on=("src", "dst")
    ).materialize()
    n_tri = tri.count()
    if n_tri == 0:
        return rd.from_arrow(_empty)

    def credit(t: pa.Table) -> pa.Table:
        nodes = pa.chunked_array(
            [
                t.column("pivot").combine_chunks(),
                t.column("w1").combine_chunks(),
                t.column("w2").combine_chunks(),
            ]
        )
        g = pa.table({"node": nodes}).group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "n_triangles"])

    return hash_partitioned_combine(
        tri.map_batches(credit, batch_format="pyarrow", batch_size=None),
        ["node"],
        lambda t: t.group_by(["node"]).aggregate([("n_triangles", "sum")]).rename_columns(
            ["node", "n_triangles"]
        ),
        adaptive_partitions(8, n_rows=3 * n_tri),
    )


def entity_triangles(sf_dir: str) -> rd.Dataset:
    """Per-entity triangle counts over the flagship KG — oracle-checked
    end-to-end (flagship SQL as a CTE → normalized undirected edges →
    three-way self-join → per-corner counts)."""
    return triangle_counts(_flagship_edges(sf_dir))


ENTITY_TRIANGLES_SQL_TEMPLATE = """
WITH edges AS ({edges_sql}),
norm AS (
  SELECT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
  FROM edges WHERE src_id <> dst_id GROUP BY 1, 2
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM norm e1
  JOIN norm e2 ON e2.a = e1.b
  JOIN norm e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
)
SELECT node, COUNT(*)::BIGINT AS n_triangles FROM corners GROUP BY node
"""


def entity_triangles_sql() -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_TRIANGLES_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL)


def entity_components(sf_dir: str) -> rd.Dataset:
    """Connected components over the flagship KG edges → (node,
    component) with component = the component's minimum node id — the
    same hash-min contract the canonicalizer and the near-dup cluster
    reducers rely on, here surfaced as a driver query and
    ORACLE-CHECKED end-to-end: the DuckDB mirror computes the
    transitive closure with a recursive CTE (fine at oracle scale; the
    Ray side is the production tiered CC — driver union-find /
    contraction / label propagation)."""
    from ..stages.canonicalize import connected_components

    edges = _flagship_edges(sf_dir)
    return connected_components(edges, src_col="src_id", dst_col="dst_id")


ENTITY_COMPONENTS_SQL_TEMPLATE = """
WITH RECURSIVE edges AS ({edges_sql}),
und AS (
  SELECT src_id AS a, dst_id AS b FROM edges
  UNION
  SELECT dst_id AS a, src_id AS b FROM edges
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b
)
SELECT a AS node, LEAST(a, MIN(b)) AS component
FROM reach GROUP BY a
"""


def entity_components_sql() -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_COMPONENTS_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL)


def entity_pagerank(sf_dir: str, top: int = 20) -> rd.Dataset:
    """Entity importance over the flagship KG: symmetric PageRank on the
    CO_OCCURS edge table; top-``top`` nodes by rank (rank desc, node asc
    tiebreak). Iterative/float — no SQL oracle; equivalence to dense
    power iteration is pinned in tests/test_graph.py."""
    ranks = pagerank(_flagship_edges(sf_dir))
    # descending rank, ascending node tiebreak (Ray sorts all keys with
    # one flag list; ranks are distinct enough that node order only
    # matters on exact float ties, where ascending-node is what the
    # docstring promises — use a two-key sort with per-key flags)
    return ranks.sort(["rank", "node"], descending=[True, False]).limit(top)


def pagerank_int(
    edges: rd.Dataset,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    iters: int = 5,
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Integer-arithmetic PageRank over a SYMMETRIC edge Dataset →
    (node, rank_micro) — the oracle-exact member of the iterative
    family. Rank mass is 10¹² integer micro-units; the update is

        r'[v] = (150000000000 // n)  +  Σ_{u→v} (r[u]·85) // (100·od[u])

    i.e. damping 85/100 with every operation an int64 multiply/floor-
    divide/sum. Integer sums are associative-exact (no float rounding to
    order), and floor division of positive int64 is engine-independent,
    so after any fixed number of iterations the ranks are bit-identical
    to the chained-CTE SQL mirror — unlike the float :func:`pagerank`,
    whose accumulation order drifts across engines.

    Same two-tier state transport as :func:`pagerank` (per-iteration
    byte-budgeted broadcast of the O(nodes) rank vector, else hash
    joins). Symmetric input is required (both directions are unioned
    here): every node then has out-degree ≥ 1, so there is no dangling
    mass and the GROUP BY over destinations covers the node universe —
    the invariant that keeps the integer mirror exactly mirrorable."""
    ed = edges.select_columns([src_col, dst_col]).map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col).cast(pa.string()), "dst": t.column(dst_col).cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    ed = ed.union(
        ed.map_batches(
            lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
            batch_format="pyarrow",
        )
    ).materialize()

    def od_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([([], "count_all")])
        return g.rename_columns(["src", "od"])

    def od_combine(t: pa.Table) -> pa.Table:
        return t.group_by(["src"]).aggregate([("od", "sum")]).rename_columns(["src", "od"])

    nparts = adaptive_partitions(8, n_rows=ed.count())
    outdeg = hash_partitioned_combine(
        ed.map_batches(od_partial, batch_format="pyarrow", batch_size=None),
        ["src"], od_combine, nparts,
    ).materialize()
    n_nodes = outdeg.count()  # symmetric ⇒ sources ARE the node universe
    _empty = pa.table({"node": pa.array([], pa.string()), "rank_micro": pa.array([], pa.int64())})
    if n_nodes == 0:
        return rd.from_arrow(_empty)
    start = 1_000_000_000_000 // n_nodes
    base = 150_000_000_000 // n_nodes

    use_broadcast = fits_broadcast(
        n_nodes,
        dataset_mean_row_bytes(outdeg, n_nodes) + 8.0,
        **({"budget_bytes": broadcast_budget} if broadcast_budget is not None else {}),
    )
    if use_broadcast:
        od_tbl = pa.concat_tables(list(outdeg.iter_batches(batch_format="pyarrow")))
        order = pc.array_sort_indices(od_tbl.column("src"))
        node_arr = pc.take(od_tbl.column("src"), order).combine_chunks()
        od_vec = pc.take(od_tbl.column("od"), order).to_numpy(zero_copy_only=False).astype(np.int64)
        rank_vec = np.full(n_nodes, start, np.int64)
        node_ref = ray.put(node_arr)
        for _ in range(iters):
            w_vec = (rank_vec * 85) // (100 * od_vec)
            w_ref = ray.put(w_vec)

            def contrib(t: pa.Table, _n=node_ref, _w=w_ref) -> pa.Table:
                na, wv = ray.get(_n), ray.get(_w)
                idx = pc.index_in(t.column("src"), value_set=na).to_numpy(zero_copy_only=False)
                out = pa.table({"dst": t.column("dst"), "c": pa.array(wv[idx], type=pa.int64())})
                g = out.group_by(["dst"]).aggregate([("c", "sum")])
                return g.rename_columns(["dst", "c"])

            sums = hash_partitioned_combine(
                ed.map_batches(contrib, batch_format="pyarrow", batch_size=None),
                ["dst"],
                lambda t: t.group_by(["dst"]).aggregate([("c", "sum")]).rename_columns(["dst", "c"]),
                nparts,
            )
            new_vec = np.full(n_nodes, base, np.int64)
            for b in sums.iter_batches(batch_format="pyarrow"):
                idx = pc.index_in(b.column("dst"), value_set=node_arr).to_numpy(zero_copy_only=False)
                new_vec[idx] += b.column("c").to_numpy(zero_copy_only=False)
            rank_vec = new_vec
        return rd.from_arrow(
            pa.table({"node": node_arr, "rank_micro": pa.array(rank_vec, type=pa.int64())})
        )

    # join tier: O(nodes) rank state stays distributed
    ed2 = ed.join(outdeg, join_type="inner", num_partitions=nparts, on=("src",)).materialize()
    ranks_ds = outdeg.map_batches(
        lambda t: pa.table(
            {"src": t.column("src"), "r": pa.array(np.full(t.num_rows, start, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(iters):
        contribs = ed2.join(
            ranks_ds, join_type="inner", num_partitions=nparts, on=("src",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": t.column("dst"),
                    "c": pc.divide(
                        pc.multiply(t.column("r"), pa.scalar(85, pa.int64())),
                        pc.multiply(t.column("od"), pa.scalar(100, pa.int64())),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        summed = hash_partitioned_combine(
            contribs,
            ["dst"],
            lambda t: t.group_by(["dst"]).aggregate([("c", "sum")]).rename_columns(["dst", "c"]),
            nparts,
        )
        # symmetric ⇒ every node receives ≥ 1 contribution: inner join
        ranks_ds = summed.map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("dst"),
                    "r": pc.add(pa.scalar(base, pa.int64()), pc.cast(t.column("c"), pa.int64())),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return ranks_ds.map_batches(
        lambda t: t.rename_columns(["node", "rank_micro"]), batch_format="pyarrow"
    )


def entity_pagerank_exact(sf_dir: str, iters: int = 5) -> rd.Dataset:
    """Integer PageRank over the flagship CO_OCCURS graph, every node's
    rank in micro-units — oracle-checked end-to-end against the chained-
    CTE mirror (one CTE per iteration; no recursive aggregation, which
    engines disallow in recursive terms)."""
    return pagerank_int(_flagship_edges(sf_dir), iters=iters)


def entity_pagerank_exact_sql(iters: int = 5) -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    parts = [
        f"WITH edges0 AS ({KG_FLAGSHIP_EDGES_SQL})",
        "ed AS (SELECT src_id AS src, dst_id AS dst FROM edges0"
        " UNION ALL SELECT dst_id AS src, src_id AS dst FROM edges0)",
        "outdeg AS (SELECT src, COUNT(*)::BIGINT AS od FROM ed GROUP BY src)",
        "nn AS (SELECT COUNT(*)::BIGINT AS n FROM outdeg)",
        "r0 AS (SELECT src AS node, (1000000000000 // nn.n)::BIGINT AS r FROM outdeg CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT e.dst AS node,"
            " ((SELECT 150000000000 // n FROM nn)"
            " + SUM((p.r * 85) // (100 * o.od)))::BIGINT AS r"
            f" FROM ed e JOIN r{i - 1} p ON e.src = p.node"
            " JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
    ctes = ",\n".join(parts)
    return f"{ctes}\nSELECT node, r AS rank_micro FROM r{iters}"


def common_neighbor_scores(
    edges: rd.Dataset,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    top: int = 100,
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Link-prediction pair scores: for every node pair sharing ≥1
    neighbor, the common-neighbor count, endpoint degrees, and the
    neighborhood Jaccard ``n_common / (deg_u + deg_v − n_common)``;
    top-``top`` by (n_common desc, u, v).

    Composition (the triangle machinery without the degree orientation —
    here EVERY pair of a pivot's neighbors is a candidate, not just the
    oriented wedge): normalize undirected → adjacency both directions →
    hash-partition by pivot so each pivot's full neighbor list sits in
    one block → per-block vectorized pair generation → pair-count
    combine. The (node → degree) map rides in via the same
    broadcast-or-join tier as :func:`triangle_counts`; jaccard is one
    IEEE division over exact integer operands, so the doubles are
    bit-identical to the SQL mirror.

    Scale bound (documented per the custom-operator contract): pair
    generation is O(Σ deg(w)²) — a hub pivot of degree d emits d²/2
    pairs. Real link-prediction deployments cap pivot degree (drop
    pivots above ~10⁴ neighbors: their evidence is weakest by the very
    PMI/Adamic-Adar logic this feeds); the exact-oracle driver query
    runs uncapped on the bounded-vocabulary flagship graph."""
    _empty = pa.table(
        {
            "u": pa.array([], pa.string()),
            "v": pa.array([], pa.string()),
            "n_common": pa.array([], pa.int64()),
            "deg_u": pa.array([], pa.int64()),
            "deg_v": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(src_col).cast(pa.string())
        b = t.column(dst_col).cast(pa.string())
        a_lo = pc.less_equal(a, b)
        lo = pc.if_else(a_lo, a, b)
        hi = pc.if_else(a_lo, b, a)
        out = pa.table({"a": lo, "b": hi})
        out = out.filter(pc.not_equal(out.column("a"), out.column("b")))
        return out.group_by(["a", "b"]).aggregate([])

    n_raw = edges.count()
    if n_raw == 0:
        return rd.from_arrow(_empty)
    und = hash_partitioned_combine(
        edges.map_batches(norm, batch_format="pyarrow", batch_size=None),
        ["a", "b"],
        lambda t: t.group_by(["a", "b"]).aggregate([]),
        adaptive_partitions(8, n_rows=n_raw),
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return rd.from_arrow(_empty)

    adj = und.map_batches(
        lambda t: pa.table({"pivot": t.column("a"), "nbr": t.column("b")}),
        batch_format="pyarrow",
    ).union(
        und.map_batches(
            lambda t: pa.table({"pivot": t.column("b"), "nbr": t.column("a")}),
            batch_format="pyarrow",
        )
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"node": t.column("pivot")}).group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "deg"])

    deg = hash_partitioned_combine(
        adj.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["node"],
        lambda t: t.group_by(["node"]).aggregate([("deg", "sum")]).rename_columns(["node", "deg"]),
        adaptive_partitions(8, n_rows=2 * n_edges),
    ).materialize()

    def nbr_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], pa.string()), "v": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows < 2:
            return empty
        df = t.to_pandas()
        us, vs = [], []
        for _, g in df.groupby("pivot", sort=False):
            nb = np.sort(g["nbr"].to_numpy(dtype=object))
            m = len(nb)
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            us.append(nb[ai])
            vs.append(nb[bi])
        if not us:
            return empty
        pt = pa.table(
            {"u": pa.array(np.concatenate(us), pa.string()), "v": pa.array(np.concatenate(vs), pa.string())}
        )
        g = pt.group_by(["u", "v"]).aggregate([([], "count_all")])
        return g.rename_columns(["u", "v", "n"])

    pair_partials = hash_partitioned_combine(
        adj, ["pivot"], nbr_pairs, adaptive_partitions(8, n_rows=2 * n_edges)
    )
    cn = hash_partitioned_combine(
        pair_partials,
        ["u", "v"],
        lambda t: t.group_by(["u", "v"]).aggregate([("n", "sum")]).rename_columns(["u", "v", "n_common"]),
        adaptive_partitions(8, n_rows=2 * n_edges),
    ).materialize()
    if cn.count() == 0:
        return rd.from_arrow(_empty)

    n_nodes = deg.count()
    use_broadcast = fits_broadcast(
        n_nodes,
        dataset_mean_row_bytes(deg, n_nodes) + 8.0,
        **({"budget_bytes": broadcast_budget} if broadcast_budget is not None else {}),
    )
    if use_broadcast:
        deg_tbl = pa.concat_tables(list(deg.iter_batches(batch_format="pyarrow")))
        node_ref = ray.put(deg_tbl.column("node").combine_chunks())
        deg_ref = ray.put(deg_tbl.column("deg").to_numpy(zero_copy_only=False))

        def attach(t: pa.Table) -> pa.Table:
            na, dv = ray.get(node_ref), ray.get(deg_ref)
            iu = pc.index_in(t.column("u"), value_set=na).to_numpy(zero_copy_only=False)
            iv = pc.index_in(t.column("v"), value_set=na).to_numpy(zero_copy_only=False)
            return (
                t.append_column("deg_u", pa.array(dv[iu], pa.int64()))
                .append_column("deg_v", pa.array(dv[iv], pa.int64()))
            )

        scored = cn.map_batches(attach, batch_format="pyarrow")
    else:
        jparts = adaptive_partitions(8, n_rows=cn.count())
        scored = cn.join(
            deg.map_batches(lambda t: t.rename_columns(["u", "deg_u"]), batch_format="pyarrow"),
            join_type="inner", num_partitions=jparts, on=("u",),
        ).join(
            deg.map_batches(lambda t: t.rename_columns(["v", "deg_v"]), batch_format="pyarrow"),
            join_type="inner", num_partitions=jparts, on=("v",),
        )

    def jaccard(t: pa.Table) -> pa.Table:
        ncm = t.column("n_common").to_numpy(zero_copy_only=False)
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        jac = ncm.astype(np.float64) / (du + dv - ncm).astype(np.float64)
        return pa.table(
            {
                "u": t.column("u"),
                "v": t.column("v"),
                "n_common": t.column("n_common").cast(pa.int64()),
                "deg_u": t.column("deg_u").cast(pa.int64()),
                "deg_v": t.column("deg_v").cast(pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    def prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n_common", "descending"), ("u", "ascending"), ("v", "ascending")]
        )
        return t.take(idx[:top])

    return (
        scored.map_batches(jaccard, batch_format="pyarrow")
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
    )


def entity_common_neighbors(sf_dir: str) -> rd.Dataset:
    """Common-neighbor / neighborhood-Jaccard link-prediction scores over
    the flagship KG — oracle-checked end-to-end (flagship SQL as a CTE →
    adjacency self-join on the shared neighbor → degree join)."""
    return common_neighbor_scores(_flagship_edges(sf_dir))


ENTITY_COMMON_NEIGHBORS_SQL_TEMPLATE = """
WITH edges AS ({edges_sql}),
norm AS (
  SELECT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
  FROM edges WHERE src_id <> dst_id GROUP BY 1, 2
),
adj AS (SELECT a AS node, b AS nbr FROM norm UNION ALL SELECT b, a FROM norm),
deg AS (SELECT node, COUNT(*)::BIGINT AS deg FROM adj GROUP BY node),
pairs AS (
  SELECT a1.node AS u, a2.node AS v, COUNT(*)::BIGINT AS n_common
  FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
  GROUP BY 1, 2
)
SELECT u, v, n_common, d1.deg AS deg_u, d2.deg AS deg_v,
       CAST(n_common AS DOUBLE) / (d1.deg + d2.deg - n_common) AS jaccard
FROM pairs JOIN deg d1 ON d1.node = u JOIN deg d2 ON d2.node = v
ORDER BY n_common DESC, u, v LIMIT 100
"""


def entity_common_neighbors_sql() -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_COMMON_NEIGHBORS_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL)


def entity_clustering_coefficient(sf_dir: str) -> rd.Dataset:
    """GLOBAL clustering coefficient of the flagship KG — triangles vs
    wedges, the standard graph-cohesion summary: one row
    (n_triangles, n_wedges, clustering_micro_floor) where the
    coefficient is the all-integer floor of ``3·T·10⁶ / W`` (both
    operands exact BIGINTs, so the mirror is hash-exact with no float
    division). Triangle side reuses ``triangle_counts`` (degree-oriented
    wedge check, each triangle credited to 3 corners → ΣnT = 3T);
    wedge side is the normalized simple graph's Σ d·(d−1)/2 with
    per-block degree partials."""
    edges = _flagship_edges(sf_dir)

    def norm_partial(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t.column("src_id"), t.column("dst_id"))
        b = pc.max_element_wise(t.column("src_id"), t.column("dst_id"))
        keep = pc.invert(pc.equal(a, b))
        return (
            pa.table({"a": a.filter(keep), "b": b.filter(keep)})
            .group_by(["a", "b"]).aggregate([])
        )

    norm = hash_partitioned_combine(
        edges.map_batches(norm_partial, batch_format="pyarrow", batch_size=None),
        ["a", "b"], lambda t: t.group_by(["a", "b"]).aggregate([]), adaptive_partitions(8),
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.chunked_array([t.column("a").combine_chunks(), t.column("b").combine_chunks()])
        g = pa.table({"node": nodes}).group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "d"])

    deg = hash_partitioned_combine(
        norm.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["node"], lambda t: t.group_by(["node"]).aggregate([("d", "sum")]).rename_columns(["node", "d"]),
        adaptive_partitions(8),
    )

    def wedge_partial(t: pa.Table) -> pa.Table:
        d = t.column("d").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())})

    w_row = deg.map_batches(wedge_partial, batch_format="pyarrow", batch_size=None).aggregate(
        Sum("w", alias_name="w")
    )
    n_wedges = int(w_row["w"] or 0)

    tri = triangle_counts(edges)
    t_row = tri.aggregate(Sum("n_triangles", alias_name="t3"))
    t3 = int(t_row["t3"] or 0)  # ΣnT = 3·T

    micro = (t3 * 1_000_000) // n_wedges if n_wedges > 0 else 0
    return rd.from_arrow(
        pa.table(
            {
                "n_triangles": pa.array([t3 // 3], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
                "clustering_micro_floor": pa.array([micro], pa.int64()),
            }
        )
    )


ENTITY_CLUSTERING_SQL_TEMPLATE = """
WITH edges AS ({edges_sql}),
norm AS (
  SELECT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
  FROM edges WHERE src_id <> dst_id GROUP BY 1, 2
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM norm e1
  JOIN norm e2 ON e2.a = e1.b
  JOIN norm e3 ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
  SELECT node, COUNT(*)::BIGINT AS d
  FROM (SELECT a AS node FROM norm UNION ALL SELECT b FROM norm)
  GROUP BY node
),
w AS (SELECT COALESCE(SUM(d * (d - 1) // 2), 0)::BIGINT AS n_wedges FROM deg),
t AS (SELECT COUNT(*)::BIGINT AS n_triangles FROM tri)
SELECT t.n_triangles, w.n_wedges,
       CASE WHEN w.n_wedges > 0
            THEN (3 * t.n_triangles * 1000000) // w.n_wedges ELSE 0 END AS clustering_micro_floor
FROM t, w
"""


def entity_clustering_coefficient_sql() -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_CLUSTERING_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL)


def entity_bfs_distances(sf_dir: str, max_depth: int = 8) -> rd.Dataset:
    """Single-source BFS shortest-path distances over the flagship KG
    (source = the globally minimal node id, depth-capped) — the
    iterative-frontier graph primitive (Pregel superstep shape), and the
    iterative family's SECOND hash-exact oracle after integer PageRank:
    distances are small exact integers, mirrored by a depth-capped
    recursive CTE with MIN(d) per node.

    Per superstep the EDGES stay distributed: the frontier ships once
    (``ray.put``) and every adjacency block is probed with one
    vectorized ``pc.is_in``; only the frontier's DISTINCT neighbor set
    returns to the driver (``Dataset.unique``). Frontier + visited state
    is O(nodes) on the driver — the same documented bound as
    :func:`pagerank`'s broadcast tier and the canonicalizer's
    contraction tier. (A join-per-superstep variant would avoid the
    driver state, but Ray's hash-join cannot currently consume the
    SCHEMA-LESS empty blocks its own shuffles emit, so the broadcast
    tier is also the robust one.)"""
    edges = _flagship_edges(sf_dir)

    def und_partial(t: pa.Table) -> pa.Table:
        a, b = t.column("src_id"), t.column("dst_id")
        keep = pc.invert(pc.equal(a, b))
        fwd = pa.table({"a": a.filter(keep), "b": b.filter(keep)})
        rev = pa.table({"a": b.filter(keep), "b": a.filter(keep)})
        return pa.concat_tables([fwd, rev]).group_by(["a", "b"]).aggregate([])

    und = edges.map_batches(und_partial, batch_format="pyarrow", batch_size=None).materialize()
    src_row = und.aggregate(Min("a", alias_name="m"))
    source = None if src_row is None else src_row.get("m")
    if source is None:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "dist": pa.array([], pa.int64())})
        )
    node_type = und.schema().types[0]

    visited: dict = {source: 0}
    frontier = [source]
    for d in range(1, max_depth + 1):
        f_ref = ray.put(pa.array(frontier, node_type))

        def probe(t: pa.Table) -> pa.Table:
            hit = pc.is_in(t.column("a"), value_set=ray.get(f_ref))
            return pa.table({"b": pc.unique(t.column("b").filter(hit))})

        cand = und.map_batches(probe, batch_format="pyarrow", batch_size=None).unique("b")
        new = [n for n in cand if n not in visited]
        if not new:
            break
        for n in new:
            visited[n] = d
        frontier = new

    return rd.from_arrow(
        pa.table(
            {"node": pa.array(list(visited.keys()), node_type),
             "dist": pa.array(list(visited.values()), pa.int64())}
        )
    )


def kcore_subgraph(
    edges: rd.Dataset,
    k: int = 3,
    max_rounds: int = 8,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> rd.Dataset:
    """k-core peeling (iteratively drop nodes with degree < ``k``) over an
    undirected view of ``edges`` — the standard graph-density QA primitive
    the reference delegates to Neo4j/GDS. Returns ``(node, core_degree)``
    for nodes surviving ``max_rounds`` peel rounds (peeling is monotone,
    so once a round removes nothing the result is the true k-core and the
    engine stops early; the bounded-round definition is what makes the
    chained-CTE SQL mirror EXACT even on adversarial graphs that need
    more rounds than the cap).

    Per round the EDGES stay distributed: degrees reduce per block before
    an O(nodes) combine, the survivor set ships once (``ray.put``) and
    every edge block is filtered with two vectorized ``pc.is_in`` probes.
    Driver state is one O(nodes) degree vector per round — the same
    documented bound as :func:`pagerank`'s broadcast tier and
    :func:`entity_bfs_distances`' frontier."""

    def und_partial(t: pa.Table) -> pa.Table:
        a, b = t.column(src_col), t.column(dst_col)
        keep = pc.invert(pc.equal(a, b))
        fwd = pa.table({"a": a.filter(keep), "b": b.filter(keep)})
        rev = pa.table({"a": b.filter(keep), "b": a.filter(keep)})
        return pa.concat_tables([fwd, rev]).group_by(["a", "b"]).aggregate([])

    cur = edges.map_batches(und_partial, batch_format="pyarrow", batch_size=None).materialize()
    schema = cur.schema()
    node_type = schema.types[0] if schema is not None and schema.names else pa.string()

    def empty() -> rd.Dataset:
        return rd.from_arrow(
            pa.table({"node": pa.array([], node_type), "core_degree": pa.array([], pa.int64())})
        )

    n_cur = cur.count()
    if n_cur == 0:
        return empty()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["a"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "deg"])

    def deg_combine(t: pa.Table) -> pa.Table:
        return t.group_by(["a"]).aggregate([("deg", "sum")]).rename_columns(["a", "deg"])

    for _ in range(max_rounds):
        deg = hash_partitioned_combine(
            cur.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
            ["a"],
            deg_combine,
            adaptive_partitions(8, n_rows=n_cur),
        ).to_pandas()  # O(nodes) — documented driver bound
        nodes = deg["a"].to_numpy()
        keep = deg["deg"].to_numpy() >= k
        if keep.all():
            break  # fixpoint: every further round is a no-op (== full-R SQL)
        surv = nodes[keep]
        if len(surv) == 0:
            return empty()
        s_ref = ray.put(pa.array(surv, node_type))

        def filt(t: pa.Table) -> pa.Table:
            s = ray.get(s_ref)
            m = pc.and_(
                pc.is_in(t.column("a"), value_set=s), pc.is_in(t.column("b"), value_set=s)
            )
            return t.filter(m)

        cur = cur.map_batches(filt, batch_format="pyarrow", batch_size=None).materialize()
        n_cur = cur.count()
        if n_cur == 0:
            return empty()

    final = hash_partitioned_combine(
        cur.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["a"],
        deg_combine,
        adaptive_partitions(8, n_rows=n_cur),
    )
    return final.map_batches(
        lambda t: t.rename_columns(["node", "core_degree"]).set_column(
            1, "core_degree", pc.cast(t.column("deg"), pa.int64())
        ),
        batch_format="pyarrow",
    )


def degree_assortativity_moments(
    edges: rd.Dataset,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Degree-assortativity moments (Newman 2002): over every DIRECTED
    adjacency pair (u,v) of the undirected graph, the exact integer
    second moments between x = deg(u) and y = deg(v), plus the
    covariance numerator ``n·Σxy − Σx·Σy`` whose sign IS the
    assortativity verdict (hub-hub vs hub-leaf wiring — the KG-health
    analogue of the clustering coefficient). The Pearson coefficient is
    one consumer-side float expression over the stored integers, same
    contract as ``events_hour_value_stats``.

    Shape: degree table (per-block partials → O(nodes) combine), then
    ONE pass over the distributed adjacency blocks with the (node→deg)
    map attached via the byte-budgeted broadcast tier (hash join above
    the budget), each block reducing to a single 6-integer row.
    int64 bound: n·Σxy ≤ (2|E|)²·max_deg² — document-scale graphs with
    |E| ≲ 10⁹ and hub degree ≲ 10³ stay exact; beyond that shard the
    moment accumulation (the sums stay mergeable)."""
    out_schema = pa.schema(
        [("n_pairs", pa.int64()), ("sum_x", pa.int64()), ("sum_y", pa.int64()),
         ("sum_xx", pa.int64()), ("sum_yy", pa.int64()), ("sum_xy", pa.int64()),
         ("cov_num", pa.int64())]
    )

    def und_partial(t: pa.Table) -> pa.Table:
        a = t.column(src_col).cast(pa.string())
        b = t.column(dst_col).cast(pa.string())
        a_lo = pc.less_equal(a, b)
        lo = pc.if_else(a_lo, a, b)
        hi = pc.if_else(a_lo, b, a)
        out = pa.table({"a": lo, "b": hi})
        out = out.filter(pc.not_equal(out.column("a"), out.column("b")))
        return out.group_by(["a", "b"]).aggregate([])

    n_raw = edges.count()
    if n_raw == 0:
        return rd.from_arrow(pa.table({f.name: pa.array([], f.type) for f in out_schema}))
    und = hash_partitioned_combine(
        edges.map_batches(und_partial, batch_format="pyarrow", batch_size=None),
        ["a", "b"],
        lambda t: t.group_by(["a", "b"]).aggregate([]),
        adaptive_partitions(8, n_rows=n_raw),
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({f.name: pa.array([], f.type) for f in out_schema}))

    adj = und.map_batches(
        lambda t: pa.table({"u": t.column("a"), "v": t.column("b")}),
        batch_format="pyarrow",
    ).union(
        und.map_batches(
            lambda t: pa.table({"u": t.column("b"), "v": t.column("a")}),
            batch_format="pyarrow",
        )
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"node": t.column("u")}).group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "deg"])

    deg = hash_partitioned_combine(
        adj.map_batches(deg_partial, batch_format="pyarrow", batch_size=None),
        ["node"],
        lambda t: t.group_by(["node"]).aggregate([("deg", "sum")]).rename_columns(["node", "deg"]),
        adaptive_partitions(8, n_rows=2 * n_edges),
    ).materialize()

    n_nodes = deg.count()
    use_broadcast = fits_broadcast(
        n_nodes,
        dataset_mean_row_bytes(deg, max(n_nodes, 1)) + 8.0,
        **({"budget_bytes": broadcast_budget} if broadcast_budget is not None else {}),
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("deg_u").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("deg_v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"n_pairs": pa.array([len(x)], pa.int64()),
             "sum_x": pa.array([int(x.sum())], pa.int64()),
             "sum_y": pa.array([int(y.sum())], pa.int64()),
             "sum_xx": pa.array([int((x * x).sum())], pa.int64()),
             "sum_yy": pa.array([int((y * y).sum())], pa.int64()),
             "sum_xy": pa.array([int((x * y).sum())], pa.int64())}
        )

    if use_broadcast:
        deg_tbl = pa.concat_tables(list(deg.iter_batches(batch_format="pyarrow")))
        node_ref = ray.put(deg_tbl.column("node").combine_chunks())
        deg_ref = ray.put(deg_tbl.column("deg").to_numpy(zero_copy_only=False))

        def attach_moments(t: pa.Table) -> pa.Table:
            na, dv = ray.get(node_ref), ray.get(deg_ref)
            iu = pc.index_in(t.column("u"), value_set=na).to_numpy(zero_copy_only=False)
            iv = pc.index_in(t.column("v"), value_set=na).to_numpy(zero_copy_only=False)
            return moments(
                pa.table({"deg_u": pa.array(dv[iu], pa.int64()),
                          "deg_v": pa.array(dv[iv], pa.int64())})
            )

        partials = adj.map_batches(attach_moments, batch_format="pyarrow", batch_size=None)
    else:
        jparts = adaptive_partitions(8, n_rows=2 * n_edges)
        joined = adj.join(
            deg.map_batches(lambda t: t.rename_columns(["u", "deg_u"]), batch_format="pyarrow"),
            join_type="inner", num_partitions=jparts, on=("u",),
        ).join(
            deg.map_batches(lambda t: t.rename_columns(["v", "deg_v"]), batch_format="pyarrow"),
            join_type="inner", num_partitions=jparts, on=("v",),
        )
        partials = joined.map_batches(moments, batch_format="pyarrow", batch_size=None)

    def combine(t: pa.Table) -> pa.Table:
        cols = {c: np.int64(t.column(c).to_numpy(zero_copy_only=False).sum()) for c in t.column_names}
        cov_num = cols["n_pairs"] * cols["sum_xy"] - cols["sum_x"] * cols["sum_y"]
        return pa.table(
            {**{c: pa.array([cols[c]], pa.int64()) for c in
                ["n_pairs", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]},
             "cov_num": pa.array([int(cov_num)], pa.int64())}
        )

    return partials.repartition(1).map_batches(combine, batch_format="pyarrow", batch_size=None)


def entity_degree_assortativity(sf_dir: str) -> rd.Dataset:
    """Degree-assortativity moments of the flagship KG — oracle-checked
    end-to-end (flagship SQL as a CTE → degree CTE → per-edge moment
    rollup), the graph family's covariance-statistics member."""
    return degree_assortativity_moments(_flagship_edges(sf_dir))


ENTITY_DEGREE_ASSORTATIVITY_SQL_TEMPLATE = """
WITH edges AS MATERIALIZED ({edges_sql}),
norm AS (
  SELECT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
  FROM edges WHERE src_id <> dst_id GROUP BY 1, 2
),
adj AS (SELECT a AS u, b AS v FROM norm UNION ALL SELECT b, a FROM norm),
deg AS (SELECT u AS node, COUNT(*)::BIGINT AS deg FROM adj GROUP BY u),
pairs AS (
  SELECT d1.deg AS x, d2.deg AS y
  FROM adj JOIN deg d1 ON d1.node = adj.u JOIN deg d2 ON d2.node = adj.v
)
SELECT COUNT(*)::BIGINT AS n_pairs,
       SUM(x)::BIGINT AS sum_x, SUM(y)::BIGINT AS sum_y,
       SUM(x * x)::BIGINT AS sum_xx, SUM(y * y)::BIGINT AS sum_yy,
       SUM(x * y)::BIGINT AS sum_xy,
       (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))::BIGINT AS cov_num
FROM pairs
"""


def entity_degree_assortativity_sql() -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_DEGREE_ASSORTATIVITY_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL)


def entity_kcore(sf_dir: str, k: int = 3, max_rounds: int = 8) -> rd.Dataset:
    """k-core of the flagship KG — oracle-checked end-to-end (flagship
    SQL as a CTE → symmetric edge CTE → ``max_rounds`` chained peel-round
    CTEs → surviving-degree rollup)."""
    return kcore_subgraph(_flagship_edges(sf_dir), k=k, max_rounds=max_rounds)


def entity_kcore_sql(k: int = 3, max_rounds: int = 8) -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    # every CTE is MATERIALIZED: round i references round i-1 three
    # times (r JOIN k JOIN k), so default inlining would expand the
    # flagship CTE 3^rounds times and exhaust file handles
    parts = [
        f"WITH edges AS MATERIALIZED ({KG_FLAGSHIP_EDGES_SQL}),",
        "r0 AS MATERIALIZED (",
        "  SELECT src_id AS a, dst_id AS b FROM edges WHERE src_id <> dst_id",
        "  UNION",
        "  SELECT dst_id AS a, src_id AS b FROM edges WHERE src_id <> dst_id",
        "),",
    ]
    for i in range(max_rounds):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT a FROM r{i} GROUP BY a HAVING COUNT(*) >= {k}),"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT r.a, r.b FROM r{i} r "
            f"JOIN k{i} x ON r.a = x.a JOIN k{i} y ON r.b = y.a),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT a AS node, COUNT(*)::BIGINT AS core_degree FROM r{max_rounds} GROUP BY a"
    )
    return "\n".join(parts)


ENTITY_BFS_SQL_TEMPLATE = """
WITH RECURSIVE edges AS ({edges_sql}),
und AS (
  SELECT src_id AS a, dst_id AS b FROM edges WHERE src_id <> dst_id
  UNION
  SELECT dst_id AS a, src_id AS b FROM edges WHERE src_id <> dst_id
),
src AS (SELECT MIN(a) AS s FROM und),
walk(node, d) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT u.b, w.d + 1 FROM walk w JOIN und u ON u.a = w.node WHERE w.d < {max_depth}
)
SELECT node, MIN(d)::BIGINT AS dist FROM walk GROUP BY node
"""


def entity_bfs_distances_sql(max_depth: int = 8) -> str:
    from .textops import KG_FLAGSHIP_EDGES_SQL

    return ENTITY_BFS_SQL_TEMPLATE.format(edges_sql=KG_FLAGSHIP_EDGES_SQL, max_depth=max_depth)
