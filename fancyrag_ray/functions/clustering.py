"""Distributed k-means over an embedding column — the clustering
primitive of a training-data pipeline (cluster-balanced sampling,
semantic dedup pre-bucketing) AND the scale-path trainer for the IVF
coarse quantizer (``sources/indexes.py`` trains its quantizer on a
driver-side sample, which skews at corpus scale; this trains on every
row with O(k·dim) driver state).

Shape per Lloyd iteration: ONE ``map_batches`` over the embeddings —
each block assigns its vectors to the broadcast centroids (vectorized
‖x−c‖² = x² − 2xᵀc + c² argmin) and emits k partial rows
(cluster → float64 sum-vector + count) — then a driver-side combine of
the tiny partials (blocks × k rows; at 256 nodes × 16 blocks × k=4096
that is ~16M narrow rows — still ≪ corpus — and the partial rows are
themselves hash-combinable if k grows beyond driver memory). Rows never
shuffle. Empty clusters keep their previous centroid (standard Lloyd
fallback).

Determinism: init is the k vectors with the SMALLEST ``vec_id``
(per-block partial min-k, then a driver merge — no sort shuffle, no
RNG), and accumulation is float64. Exact equality with a single-node
numpy Lloyd on the same init is asserted in tests at small scale;
at production scale float addition order across blocks can differ in
ulps — inherent to every distributed float reducer (same caveat as
pagerank, which this module mirrors).

No SQL oracle (iterative, argmin over floats): the driver records a
rows-only check; accuracy is pinned in tests/test_clustering.py
(planted well-separated clusters recovered exactly; numpy-Lloyd
equivalence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t.column(col)
    flat = arr.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(t.num_rows, -1).astype(np.float64, copy=False)


def _init_centroids(ds: rd.Dataset, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic seed centroids: vectors of the k ids with the
    SMALLEST splitmix64 hash. Hashing decorrelates the seeds from
    insertion order — real corpora are routinely id-sorted by source or
    crawl time, so "k smallest raw ids" would draw every seed from one
    region (observed: all seeds in one planted blob). Per-block partial
    min-k keeps the driver pull at O(blocks · k)."""
    from ..util import mix64

    def _hash_ids(ids: np.ndarray) -> np.ndarray:
        return mix64(ids.astype(np.uint64))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t.select([id_col, vec_col])
        h = _hash_ids(t.column(id_col).to_numpy(zero_copy_only=False))
        sel = np.argsort(h, kind="stable")[:k]
        return t.select([id_col, vec_col]).take(pa.array(sel))

    cand = pa.concat_tables(
        list(ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    h = _hash_ids(cand.column(id_col).to_numpy(zero_copy_only=False))
    order = np.argsort(h, kind="stable")[:k]
    return _matrix(cand.take(pa.array(order)), vec_col)


def kmeans_embeddings(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, rd.Dataset]:
    """Lloyd k-means → (centroids ``(k, dim)`` float64, assignment
    Dataset ``(id_col, cluster int32, dist2 float64)``). See module
    docstring for the distribution shape."""
    centroids = _init_centroids(ds, k, id_col, vec_col)
    kk, dim = centroids.shape
    ds = ds.materialize()  # consumed once per iteration + once for assignment

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partials(t: pa.Table, _c=c_ref) -> pa.Table:
            cents = ray.get(_c)
            m = _matrix(t, vec_col)
            # argmin ‖x−c‖² ≡ argmin (−2xᵀc + c²): x² is row-constant
            d = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
            assign = np.argmin(d, axis=1)
            sums = np.zeros((len(cents), m.shape[1]), np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(cents)), pa.int32()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        agg = pa.concat_tables(
            list(
                ds.map_batches(partials, batch_format="pyarrow", batch_size=None).iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        clusters = agg.column("cluster").to_numpy(zero_copy_only=False)
        vsums = (
            agg.column("vsum")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(len(clusters), dim)
        )
        ns = agg.column("n").to_numpy(zero_copy_only=False)
        # deterministic combine: partials summed in sorted-cluster order
        # (np.add.at over the sorted cluster ids)
        sums = np.zeros((kk, dim), np.float64)
        order = np.argsort(clusters, kind="stable")
        np.add.at(sums, clusters[order], vsums[order])
        counts = np.bincount(clusters, weights=ns, minlength=kk).astype(np.int64)
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = new

    c_ref = ray.put(centroids)

    def assign_fn(t: pa.Table, _c=c_ref) -> pa.Table:
        cents = ray.get(_c)
        m = _matrix(t, vec_col)
        d = ((m * m).sum(axis=1)[:, None] - 2.0 * (m @ cents.T)
             + (cents * cents).sum(axis=1)[None, :])
        a = np.argmin(d, axis=1)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(a.astype(np.int32), pa.int32()),
                "dist2": pa.array(d[np.arange(len(a)), a], pa.float64()),
            }
        )

    return centroids, ds.map_batches(assign_fn, batch_format="pyarrow")


def embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 10) -> rd.Dataset:
    """Driver query: k-means over the driver embeddings → per-cluster
    (cluster, n_members) sizes, every cluster emitted (zeros included),
    sorted by cluster. Iterative/float — rows-only driver check;
    recovery of planted clusters and numpy-Lloyd equivalence are pinned
    in tests/test_clustering.py."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    _, assigned = kmeans_embeddings(ds, k=k, iters=iters)

    def sizes(t: pa.Table) -> pa.Table:
        counts = np.bincount(
            t.column("cluster").to_numpy(zero_copy_only=False), minlength=k
        ).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k), pa.int32()),
                "n_members": pa.array(counts, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        assigned.map_batches(sizes, batch_format="pyarrow", batch_size=None)
        .groupby("cluster")
        .aggregate(Sum("n_members", alias_name="n_members"))
        .sort("cluster")
    )


def semdedup_embeddings(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 10,
    cos_threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public recipe):
    semantic dedup by k-means bucketing + WITHIN-cluster pairwise cosine.
    Returns the DROPPED rows ``(vec_id, kept_vec_id, cosine, cluster)``:
    a vector is dropped when some LOWER-id vector in its k-means cluster
    has cosine ≥ ``cos_threshold``; ``kept_vec_id`` is the most-similar
    such earlier vector (deterministic: ties break to the lowest index
    via argmax-first). Survivors = all ids not in the output.

    Scale shape — the whole point of the recipe: the O(n²) cosine work
    is bounded per CLUSTER, never corpus-wide. One Lloyd pass
    (``kmeans_embeddings``: blocks emit k partial rows, vectors never
    shuffle), one assignment ``map_batches`` that keeps the vector on
    the row, then ONE hash co-partition on ``cluster`` and a per-block
    dense gram per cluster group. Per-aggregator memory is
    max_cluster_rows × dim × 8 B — at corpus scale you grow ``k``
    proportionally (SemDeDup uses k ≈ n/10⁴) so cluster size, and with
    it both the gram and the block, stays constant. Exact duplicates
    always share an argmin cluster, so recall on true copies is 1.0;
    near-dups straddling a Voronoi boundary are the recipe's documented
    (small) miss, priced in the paper.

    Iterative/float (k-means + cosine) — rows-only driver check; planted
    copies/near-dups and the boundary-miss caveat are pinned in
    tests/test_clustering.py. On the driver's random gaussian
    embeddings the default threshold correctly yields 0 rows (same
    behavior and reasoning as ``embedding_near_duplicates``)."""
    from ..util import adaptive_partitions, hash_partitioned_combine

    ds = ds.materialize()
    n_rows = ds.count()
    centroids, _ = kmeans_embeddings(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    c_ref = ray.put(centroids)

    def assign_keep_vec(t: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        m = _matrix(t, vec_col)
        d = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        a = np.argmin(d, axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(a, pa.int32()),
                vec_col: t.column(vec_col),
            }
        )

    assigned = ds.map_batches(assign_keep_vec, batch_format="pyarrow")

    _empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "kept_vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "cluster": pa.array([], pa.int32()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        clusters = t.column("cluster").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = _matrix(t, vec_col)
        norms = np.linalg.norm(m, axis=1)
        normed = m / np.maximum(norms, 1e-30)[:, None]
        out_v, out_k, out_c, out_cl = [], [], [], []
        for cl in np.unique(clusters):
            sel = np.flatnonzero(clusters == cl)
            if len(sel) < 2:
                continue
            order = sel[np.argsort(ids[sel], kind="stable")]
            s, sid = normed[order], ids[order]
            g = s @ s.T
            gl = np.tril(g, -1)  # row j vs strictly-earlier ids only
            best = gl.argmax(axis=1)
            bestv = gl[np.arange(len(sid)), best]
            dup = bestv >= cos_threshold
            if dup.any():
                out_v.append(sid[dup])
                out_k.append(sid[best[dup]])
                out_c.append(bestv[dup])
                out_cl.append(np.full(int(dup.sum()), cl, dtype=np.int32))
        if not out_v:
            return _empty
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "kept_vec_id": pa.array(np.concatenate(out_k), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
                "cluster": pa.array(np.concatenate(out_cl), pa.int32()),
            }
        )

    return hash_partitioned_combine(
        assigned, ["cluster"], block, adaptive_partitions(8, n_rows=n_rows)
    )


def embedding_semdedup(sf_dir: str, k: int = 8, iters: int = 10, cos_threshold: float = 0.97) -> rd.Dataset:
    """Driver query: SemDeDup dropped-row report over the driver
    embeddings (see ``semdedup_embeddings``)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return semdedup_embeddings(ds, k=k, iters=iters, cos_threshold=cos_threshold)
