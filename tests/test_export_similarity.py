"""Tests: vector-store export (S7/O2/M12 parity), IVF ANN recall,
LSH ANN recall vs brute force."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from fancyrag_ray.pipelines.export import coerce_point_id, export_embeddings

SF = "/root/testdata/sf0.001"


class TestPointId:
    def test_digits_to_int(self):
        assert coerce_point_id("123", 0) == 123

    def test_non_digits_stay_str(self):
        assert coerce_point_id("abc42", 0) == "abc42"

    def test_none_fallback(self):
        assert coerce_point_id(None, 7) == 7


class TestExport:
    def test_export_roundtrip(self, small_corpus, ray_session, tmp_path):
        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.pipelines.kg_build import build_chunks, build_embeddings

        corpus, _ = small_corpus
        cfg = PipelineConfig(embed_dim=32)
        docs = rd.from_arrow(corpus.documents).limit(100)
        chunks = build_chunks(docs, cfg).materialize()
        emb = build_embeddings(chunks, cfg).materialize()
        out = str(tmp_path / "vecstore")
        total = export_embeddings(chunks, emb, out, expected_dim=32)
        assert total == emb.count()
        back = rd.read_parquet(out).to_pandas()
        assert len(back) == total
        assert "point_id" in back.columns
        # every exported point carries text + provenance for the join side
        assert {"chunk_uid", "doc_id", "seq", "text", "embedding"} <= set(back.columns)

    def test_export_dim_mismatch_raises(self, small_corpus, ray_session, tmp_path):
        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.pipelines.kg_build import build_chunks, build_embeddings

        corpus, _ = small_corpus
        cfg = PipelineConfig(embed_dim=32)
        docs = rd.from_arrow(corpus.documents).limit(20)
        chunks = build_chunks(docs, cfg).materialize()
        emb = build_embeddings(chunks, cfg).materialize()
        with pytest.raises(Exception, match="dim"):
            export_embeddings(chunks, emb, str(tmp_path / "v2"), expected_dim=64)


class TestAnnRecall:
    def _brute(self, k=10):
        t = pq.read_table(f"{SF}/embeddings.parquet")
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        ids = np.array(t.column("vec_id").to_pylist())
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        q = mn[list(ids).index(0)]
        scores = mn @ q
        mask = ids != 0
        order = np.argsort(-scores[mask])
        return set(ids[mask][order[:k]].tolist())

    def test_ivf_recall(self, ray_session):
        from fancyrag_ray.functions.similarity import knn_cosine_ivf

        got = set(knn_cosine_ivf(SF, nprobe=8, n_cells=16).to_pandas()["vec_id"])
        truth = self._brute()
        assert len(got & truth) / len(truth) >= 0.6  # nprobe=8/16 cells

    def test_lsh_recall(self, ray_session):
        from fancyrag_ray.functions.similarity import knn_cosine_lsh

        got = set(knn_cosine_lsh(SF, n_planes=6).to_pandas()["vec_id"])
        truth = self._brute()
        assert len(got & truth) / len(truth) >= 0.4  # multi-probe Hamming-1

    def test_exact_matches_brute(self, ray_session):
        from fancyrag_ray.functions.similarity import knn_cosine

        got = set(knn_cosine(SF).to_pandas()["vec_id"])
        assert got == self._brute()

    def test_int8_rerank_exact(self, ray_session):
        """int8 candidate scan + exact float rerank: the top-C candidate
        stage's recall is ~1 at 8-bit error scale, and the rerank is
        exact float cosine, so the final top-k EQUALS the brute path —
        this backs the shared KNN_COSINE_SQL oracle registration."""
        from fancyrag_ray.functions.similarity import knn_cosine, knn_cosine_int8

        got = list(knn_cosine_int8(SF).to_pandas()["vec_id"])
        exact = list(knn_cosine(SF).to_pandas()["vec_id"])
        assert got == exact

    def test_int8_candidate_recall(self, ray_session):
        """The pure-quantized candidate stage alone (candidates=k, no
        over-fetch headroom) still recalls ≥0.9 of the true top-k —
        pins the quantization quality independent of the rerank."""
        from fancyrag_ray.functions.similarity import knn_cosine_int8

        got = set(knn_cosine_int8(SF, candidates=10).to_pandas()["vec_id"])
        truth = self._brute()
        assert len(got & truth) / len(truth) >= 0.9

    def test_int8_quantize_roundtrip_error(self):
        from fancyrag_ray.functions.similarity import quantize_int8

        rng = np.random.default_rng(3)
        m = rng.normal(size=(100, 64))
        codes, scales = quantize_int8(m)
        err = np.abs(codes.astype(np.float64) * scales[:, None].astype(np.float64) - m).max()
        assert err <= np.abs(m).max() / 127.0 + 1e-9  # ≤ half a quantization step rounded up
        assert codes.dtype == np.int8 and scales.dtype == np.float32


class TestEmbeddingNearDup:
    def _write(self, tmp_path, m):
        import pyarrow as pa

        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(m)), pa.int64()),
                "embedding": pa.array([row.tolist() for row in m]),
            }
        )
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_planted_duplicates_found(self, ray_session, tmp_path):
        from fancyrag_ray.functions.similarity import embedding_near_duplicates

        rng = np.random.default_rng(0)
        m = rng.standard_normal((400, 16))
        m[100] = m[7]                                      # exact duplicate
        m[200] = m[7] + 0.02 * rng.standard_normal(16)     # near duplicate
        sf = self._write(tmp_path, m)
        out = embedding_near_duplicates(sf, threshold=0.95).to_pandas()
        pairs = set(zip(out["vec_a"], out["vec_b"]))
        assert (7, 100) in pairs
        assert (7, 200) in pairs
        # random 16-d pairs at cos >= 0.95 are vanishingly rare
        assert len(pairs) < 20

    def test_duplicate_heavy_bucket_skew(self, ray_session, tmp_path):
        """A mega-cluster (1000 identical vectors) must complete via the
        star cap and keep every member connected to the cluster."""
        from fancyrag_ray.functions.similarity import embedding_near_duplicates

        rng = np.random.default_rng(1)
        base = rng.standard_normal(16)
        m = np.vstack([np.tile(base, (1000, 1)), rng.standard_normal((300, 16))])
        sf = self._write(tmp_path, m)
        out = embedding_near_duplicates(sf, threshold=0.99, pair_cap_per_bucket=32).to_pandas()
        members = set(out["vec_a"]) | set(out["vec_b"])
        assert set(range(1000)) <= members
        # star cap bounds pair count far below the 1000*999/2 clique
        assert len(out) < 40_000


class TestPq:
    def test_pq_recall_driver_vectors(self, ray_session):
        """Gaussian driver vectors are PQ's worst case; candidate
        over-fetch (C=100 ≈ 20% of this table) still recalls ≥0.8 of
        the exact top-k, and the rerank output is exact cosine order
        over the surviving candidates."""
        from fancyrag_ray.functions.similarity import knn_cosine, knn_cosine_pq

        got = list(knn_cosine_pq(SF).to_pandas()["vec_id"])
        exact = list(knn_cosine(SF).to_pandas()["vec_id"])
        assert len(got) == len(exact) == 10
        assert len(set(got) & set(exact)) >= 8

    def test_pq_exact_on_clusterable_geometry(self, ray_session, tmp_path):
        """On clusterable (real-embedding-like) geometry PQ candidates
        recall the full top-k and the rerank equals brute force."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(17)
        centers = rng.normal(0, 1, (8, 64)) * 6.0
        vecs = np.concatenate(
            [centers[i] + rng.normal(0, 0.3, (60, 64)) for i in range(8)]
        ).astype(np.float32)
        ids = np.arange(len(vecs), dtype=np.int64)
        d = str(tmp_path / "pq")
        import os

        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [v for v in vecs], pa.list_(pa.float32())
                    ),
                }
            ),
            f"{d}/embeddings.parquet",
        )
        from fancyrag_ray.functions.similarity import knn_cosine, knn_cosine_pq

        got = list(knn_cosine_pq(d).to_pandas()["vec_id"])
        exact = list(knn_cosine(d).to_pandas()["vec_id"])
        assert got == exact

    def test_codes_are_8_bytes(self, ray_session):
        """The compression claim: m=8 codes are one byte each."""
        import numpy as np

        from fancyrag_ray.functions.similarity import pq_encode, train_pq_codebooks

        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (256, 64))
        books = train_pq_codebooks(x, m=8, kc=16)
        codes = pq_encode(x, books)
        assert codes.shape == (256, 8) and codes.dtype == np.uint8
        assert codes.nbytes == 256 * 8  # vs 256*64*4 float32 = 32x


class TestMmr:
    def _write(self, tmp_path):
        """Planted geometry: query vec 0 = e1; vecs 1,2 are near-identical
        tilts toward e2 (the redundant cluster, highest relevance); vec 3
        is a diverse direction (e3 tilt) with slightly lower relevance;
        vec 4 is anti-correlated filler."""
        import pyarrow as pa

        dim = 8
        def v(*pairs):
            x = np.zeros(dim)
            for i, w in pairs:
                x[i] = w
            return x / np.linalg.norm(x)

        vecs = [
            v((0, 1.0)),                     # 0: query
            v((0, 0.95), (1, 0.31)),         # 1: rel~.95, dup of 2
            v((0, 0.949), (1, 0.315)),       # 2: rel~.949, dup of 1
            v((0, 0.90), (2, 0.44)),         # 3: rel~.90, diverse
            v((0, -1.0)),                    # 4: anti
        ]
        t = pa.table({
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array([list(map(float, x)) for x in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 5, pa.int32()),
        })
        pq.write_table(t, f"{tmp_path}/embeddings.parquet")
        return tmp_path

    def test_mmr_diversifies_second_pick(self, ray_session, tmp_path):
        from fancyrag_ray.functions.similarity import knn_cosine, knn_cosine_mmr

        self._write(tmp_path)
        plain = knn_cosine(str(tmp_path), k=2).to_pandas()["vec_id"].tolist()
        assert plain == [1, 2]  # pure relevance keeps the duplicate pair
        mmr = knn_cosine_mmr(str(tmp_path), k=2, fetch_ratio=2, lam=0.5).to_pandas()
        assert mmr["vec_id"].tolist() == [1, 3]  # diversity displaces the dup
        assert mmr["rank"].tolist() == [1, 2]

    def test_lambda_one_is_pure_relevance(self, ray_session, tmp_path):
        from fancyrag_ray.functions.similarity import knn_cosine, knn_cosine_mmr

        self._write(tmp_path)
        plain = knn_cosine(str(tmp_path), k=3).to_pandas()["vec_id"].tolist()
        mmr = knn_cosine_mmr(str(tmp_path), k=3, lam=1.0).to_pandas()["vec_id"].tolist()
        assert mmr == plain

    def test_k_exceeds_corpus(self, ray_session, tmp_path):
        from fancyrag_ray.functions.similarity import knn_cosine_mmr

        self._write(tmp_path)
        out = knn_cosine_mmr(str(tmp_path), k=50).to_pandas()
        assert set(out["vec_id"]) == {1, 2, 3, 4}
        assert out["rank"].tolist() == [1, 2, 3, 4]

    def test_deterministic_on_testdata(self, ray_session):
        from fancyrag_ray.functions.similarity import knn_cosine_mmr

        a = knn_cosine_mmr(SF, k=10).to_pandas()
        b = knn_cosine_mmr(SF, k=10).to_pandas()
        assert a.equals(b)
        assert len(a) == 10 and a["vec_id"].is_unique
