"""Failure-injection tests (FIXTURES.md §8): binary/empty-doc skip,
flaky-extraction failure routing, QA gating of semantic failures."""

import pyarrow as pa
import ray.data as rd

from fancyrag_ray.config import PipelineConfig, QaThresholds
from fancyrag_ray.fixtures import FAIL_MARKER, generate_failure_corpus
from fancyrag_ray.sources.io import valid_interleaved_docs
from fancyrag_ray.stages.extractor import RuleExtractor


class TestInputHygiene:
    def test_skips_binary_and_empty(self, ray_session):
        docs = generate_failure_corpus()
        ds = rd.from_arrow(docs)
        valid = ds.map_batches(valid_interleaved_docs, batch_format="pyarrow")
        kept = valid.to_pandas()["doc_id"].tolist()
        assert "bad-binary-0" not in kept
        assert "bad-empty-0" not in kept
        assert "bad-empty-1" not in kept
        assert all(d.startswith(("good-", "flaky-")) for d in kept)
        # skip count for the lineage manifest
        assert ds.count() - valid.count() == 3


class TestFlakyExtraction:
    def test_failure_rows_routed_and_gated(self, ray_session):
        docs = rd.from_arrow(generate_failure_corpus()).map_batches(
            valid_interleaved_docs, batch_format="pyarrow"
        )
        from fancyrag_ray.pipelines.kg_build import build_chunks, link_triples
        from fancyrag_ray.pipelines.qa import evaluate
        from fancyrag_ray.stages.materialize import edges_from_linked_triples, nodes_from_linked_triples

        cfg = PipelineConfig(embed_dim=16)
        chunks = build_chunks(docs, cfg).materialize()
        triples = chunks.select_columns(["doc_id", "chunk_uid", "seq", "text"]).map_batches(
            RuleExtractor,
            fn_constructor_kwargs={"fail_marker": FAIL_MARKER, "emit_cooccurrence": True},
            batch_format="pyarrow",
            batch_size=512,
            concurrency=(1, 2),
        )
        linked = link_triples(triples, None, cfg).materialize()
        df = linked.to_pandas()
        failed = df[df["pred"] == RuleExtractor.FAILED_PRED]
        assert len(failed) == 5  # one per flaky doc
        assert set(failed["doc_id"]) == {f"flaky-{i}" for i in range(5)}

        # failure rows never reach the graph
        nodes = nodes_from_linked_triples(linked).to_pandas()
        edges = edges_from_linked_triples(linked).to_pandas()
        assert RuleExtractor.FAILED_PRED not in set(edges["type"]) if len(edges) else True
        assert not any(nodes["name"] == "") if len(nodes) else True

        # QA gate: default threshold 0 → fail; relaxed threshold → pass
        from fancyrag_ray.pipelines.kg_build import build_embeddings

        emb = build_embeddings(chunks, cfg).materialize()
        m = evaluate(docs, chunks, emb, rd.from_arrow(pa.table(nodes)) if len(nodes) else chunks.limit(0),
                     rd.from_arrow(pa.table(edges)) if len(edges) else chunks.limit(0),
                     linked=linked)
        assert m.semantic_failures == 5
        assert m.status == "fail"
        m2 = evaluate(docs, chunks, emb,
                      rd.from_arrow(pa.table(nodes)) if len(nodes) else chunks.limit(0),
                      rd.from_arrow(pa.table(edges)) if len(edges) else chunks.limit(0),
                      linked=linked, thresholds=QaThresholds(max_semantic_failures=10))
        assert m2.status == "pass", m2.failures
