"""In-process serving shell (§2.11): provision-once stores, index-backed
search/fetch/health — no per-query corpus scans."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fancyrag_ray.config import PipelineConfig
from fancyrag_ray.pipelines.kg_build import run_kg_build
from fancyrag_ray.pipelines.serve import KgServer


@pytest.fixture(scope="module")
def server(small_corpus, ray_session, tmp_path_factory):
    corpus, _ = small_corpus
    cfg = PipelineConfig(embed_dim=64)
    res = run_kg_build(rd.from_arrow(corpus.documents), alias_table=corpus.aliases, cfg=cfg)
    chunks = res.chunks.materialize()
    emb = res.embeddings.materialize()
    linked = res.linked.materialize()
    nodes = res.nodes.materialize()
    root = str(tmp_path_factory.mktemp("serve"))
    srv = KgServer.provision(chunks, emb, linked, nodes, root, embed_dim=64, n_cells=4)
    return srv, chunks, emb, linked, nodes


class TestKgServer:
    def test_health(self, server):
        srv, *_ = server
        h = srv.health()
        assert h["status"] == "ok"
        assert all(h["stores"].values())

    def test_search_matches_brute_hybrid(self, server):
        from fancyrag_ray.pipelines.retrieval import hybrid_search

        srv, chunks, emb, linked, nodes = server
        some = linked.take(1)[0]
        query = f"{some['subj']} launched"
        out = srv.search(query, top_k=5)
        hits = out["hits"]
        assert len(hits) > 0
        brute = hybrid_search(chunks, emb, query, k=5, embed_dim=64)
        # nprobe=4 == all cells on this fixture ⇒ identical result
        assert hits["chunk_uid"].tolist() == brute["chunk_uid"].tolist()
        # context: deduped triples of the hit chunks only
        ctx = out["context"]
        if len(ctx):
            assert set(ctx["chunk_uid"]) <= set(hits["chunk_uid"])
            assert not ctx.duplicated(subset=["subj_id", "pred", "obj_id"]).any()

    def test_lookup_reads_only_key_buckets(self, server):
        srv, chunks, emb, linked, nodes = server
        some = linked.take(1)[0]
        srv.search(f"{some['subj']} launched", top_k=3)
        stats = srv.triples.last_stats
        assert stats["buckets_read"] <= 3 < stats["buckets_total"]

    def test_fetch_node(self, server):
        srv, chunks, emb, linked, nodes = server
        some = nodes.take(1)[0]
        row = srv.fetch(some["entity_id"])
        assert row is not None and row["entity_id"] == some["entity_id"]
        assert "embedding" not in row
        assert srv.nodes.last_stats["buckets_read"] == 1
        assert srv.fetch("x-no-such-entity") is None

    def test_load_from_disk(self, server):
        srv, *_ = server
        again = KgServer(srv.root, embed_dim=64)
        assert again.health()["status"] == "ok"
        out = again.search("launched product", top_k=3)
        assert len(out["hits"]) > 0
