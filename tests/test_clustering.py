"""Distributed k-means (functions/clustering.py): planted-cluster
recovery, numpy-Lloyd equivalence on the same deterministic init, and
the driver query's shape."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _planted(k=4, per=60, dim=16, sep=50.0, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (k, dim)) * sep
    vecs = np.concatenate([centers[i] + rng.normal(0, 1, (per, dim)) for i in range(k)])
    ids = np.arange(k * per, dtype=np.int64)
    truth = np.repeat(np.arange(k), per)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
        }
    )
    return t, vecs.astype(np.float64), truth


def _numpy_lloyd(vecs, init, iters):
    cents = init.copy()
    for _ in range(iters):
        d = ((vecs * vecs).sum(1)[:, None] - 2 * vecs @ cents.T + (cents * cents).sum(1)[None, :])
        a = np.argmin(d, axis=1)
        new = cents.copy()
        for j in range(len(cents)):
            m = a == j
            if m.any():
                new[j] = vecs[m].mean(axis=0)
        cents = new
    d = ((vecs * vecs).sum(1)[:, None] - 2 * vecs @ cents.T + (cents * cents).sum(1)[None, :])
    return cents, np.argmin(d, axis=1)


class TestKmeans:
    def test_recovers_planted_clusters(self, ray_session):
        from fancyrag_ray.functions.clustering import kmeans_embeddings

        t, vecs, truth = _planted()
        # several blocks so the distributed combine actually merges
        ds = rd.from_arrow(t).repartition(5)
        cents, assigned = kmeans_embeddings(ds, k=4, iters=8)
        df = assigned.to_pandas().sort_values("vec_id")
        got = df["cluster"].to_numpy()
        # perfect recovery up to label permutation: every truth cluster
        # maps to exactly one predicted cluster
        for c in range(4):
            labels = set(got[truth == c])
            assert len(labels) == 1
        assert len({got[truth == c][0] for c in range(4)}) == 4

    def test_matches_numpy_lloyd_same_init(self, ray_session):
        """Same deterministic init (k smallest vec_ids) ⇒ identical
        centroids and assignments to a single-node numpy Lloyd (float64
        sums; small data so accumulation order cannot drift)."""
        from fancyrag_ray.functions.clustering import kmeans_embeddings

        t, vecs, _ = _planted(k=3, per=40, dim=8, sep=4.0, seed=11)  # overlapping
        ds = rd.from_arrow(t).repartition(4)
        cents, assigned = kmeans_embeddings(ds, k=3, iters=6)
        # reference over the STORED precision (embeddings are float32 on
        # disk; the operator upcasts after the storage rounding)
        vecs = vecs.astype(np.float32).astype(np.float64)
        # init = the 3 ids with the smallest splitmix64 hash
        from fancyrag_ray.util import mix64

        h = mix64(np.arange(len(vecs), dtype=np.uint64))
        init = vecs[np.argsort(h, kind="stable")[:3]]
        ref_c, ref_a = _numpy_lloyd(vecs, init, iters=6)
        assert np.allclose(cents, ref_c, rtol=1e-9, atol=1e-9)
        got = assigned.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
        assert (got == ref_a).all()

    def test_empty_cluster_keeps_centroid(self, ray_session):
        from fancyrag_ray.functions.clustering import kmeans_embeddings

        # k=3 over 2 point masses: at least two seeds coincide exactly,
        # so ties all go to the first (argmin) and a centroid goes empty
        vecs = np.concatenate([np.full((20, 4), 0.0), np.full((20, 4), 10.0)])
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(40, dtype=np.int64), pa.int64()),
                "embedding": pa.array([v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
            }
        )
        cents, assigned = kmeans_embeddings(rd.from_arrow(t), k=3, iters=5)
        sizes = assigned.to_pandas()["cluster"].value_counts()
        assert sizes.sum() == 40 and len(sizes) == 2  # third cluster empty
        assert np.isfinite(cents).all()  # kept its seed, no 0/0 NaN

    def test_driver_query_shape(self, ray_session):
        from fancyrag_ray.functions.clustering import embedding_kmeans

        out = embedding_kmeans("/root/testdata/sf0.001", k=8, iters=4).to_pandas()
        assert list(out["cluster"]) == list(range(8))
        n = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet").count()
        assert out["n_members"].sum() == n


class TestSemDeDup:
    def test_planted_copies_dropped_keep_min_id(self, ray_session):
        """Exact copies + a near-dup are dropped toward the lowest id in
        their semantic cluster; well-separated singletons survive."""
        from fancyrag_ray.functions.clustering import semdedup_embeddings

        # sep=3: same-cluster cosines top out ~0.98 < the 0.999 threshold,
        # so only the planted copies are dups (at sep=50 every cluster is
        # an angular near-clique and ALL members dedup — correct SemDeDup
        # behavior, wrong fixture for this assertion)
        t, vecs, _ = _planted(k=4, per=30, dim=16, sep=3.0, seed=9)
        base = vecs[5]
        extra = np.stack([base, base, base * 1.0001 + 0.001])  # ids 120,121,122
        allv = np.concatenate([vecs, extra])
        ids = np.arange(len(allv), dtype=np.int64)
        tbl = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([v.astype(np.float32) for v in allv], pa.list_(pa.float32())),
            }
        )
        out = semdedup_embeddings(rd.from_arrow(tbl), k=4, iters=5, cos_threshold=0.999).to_pandas()
        dropped = dict(zip(out["vec_id"], out["kept_vec_id"]))
        # 120/121/122 duplicate id 5 (all land in its argmin cluster)
        assert set(dropped) == {120, 121, 122}
        assert all(kept in {5, 120, 121} for kept in dropped.values())
        assert dropped[120] == 5 and dropped[121] in {5, 120}
        assert (out["cosine"] >= 0.999).all()

    def test_random_vectors_yield_no_drops(self, ray_session):
        """Pure gaussian vectors (pairwise cosine ~0) must survive —
        the driver-embedding geometry."""
        from fancyrag_ray.functions.clustering import semdedup_embeddings

        rng = np.random.default_rng(11)
        vecs = rng.normal(0, 1, (120, 16))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(120, dtype=np.int64), pa.int64()),
                "embedding": pa.array([v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
            }
        )
        out = semdedup_embeddings(rd.from_arrow(t), k=3, iters=4, cos_threshold=0.999)
        assert out.count() == 0
        assert out.schema().names == ["vec_id", "kept_vec_id", "cosine", "cluster"]
