"""End-to-end tests for the LLM-backed extractor stage (A3/M6/M7 + A6).

The scripted transports live in the package (``fancyrag_ray.stages.fake_llm``)
so Ray actors can import them; tests drive retries, model fallback,
failure-row routing and schema enforcement through REAL ``map_batches``
actor-pool runs, and assert the perfect-LLM path reproduces
``RuleExtractor``'s triples exactly.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pytest
import ray.data as rd

from fancyrag_ray.fixtures import generate_corpus
from fancyrag_ray.pipelines.kg_build import build_chunks, build_triples
from fancyrag_ray.config import PipelineConfig
from fancyrag_ray.stages.fake_llm import (
    DeterministicLlmTransport,
    ScriptedFailureTransport,
    ScriptedTransportFactory,
    make_perfect_transport,
    no_sleep,
)
from fancyrag_ray.stages.llm_client import RetryPolicy, TransportError
from fancyrag_ray.stages.llm_extractor import (
    LlmExtractor,
    SchemaViolation,
    build_graph_json_schema,
    build_triples_llm,
    collect_metrics,
    extract_content,
    reset_metrics,
    strict_schema,
    validate_structured,
)


_COLS = ["doc_id", "chunk_uid", "chunk_seq", "subj", "subj_label", "pred", "obj", "obj_label", "props"]


def _triple_set(ds) -> set:
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        out.update(zip(*[b.column(c).to_pylist() for c in _COLS]))
    return out


@pytest.fixture(scope="module")
def chunks():
    corpus = generate_corpus(80, seed=7)
    docs = rd.from_arrow(corpus.documents)
    return build_chunks(docs, PipelineConfig()).materialize()


class TestSchemaHelpers:
    def test_strict_schema_recursive(self):
        s = strict_schema(
            {"type": "object", "properties": {"a": {"type": "object", "properties": {"b": {"type": "string"}}}}}
        )
        assert s["additionalProperties"] is False
        assert s["properties"]["a"]["additionalProperties"] is False

    def test_strict_schema_no_properties_untouched(self):
        s = strict_schema({"type": "object"})
        assert "additionalProperties" not in s

    def test_validate_rejects_additional(self):
        schema = build_graph_json_schema()
        with pytest.raises(SchemaViolation, match="additional"):
            validate_structured({"nodes": [], "relationships": [], "x": 1}, schema)

    def test_validate_rejects_missing_required(self):
        schema = build_graph_json_schema()
        with pytest.raises(SchemaViolation, match="required"):
            validate_structured({"nodes": []}, schema)
        with pytest.raises(SchemaViolation, match="required"):
            validate_structured(
                {"nodes": [{"id": "a"}], "relationships": []}, schema
            )

    def test_validate_rejects_wrong_types(self):
        schema = build_graph_json_schema()
        with pytest.raises(SchemaViolation, match="array"):
            validate_structured({"nodes": {}, "relationships": []}, schema)
        with pytest.raises(SchemaViolation, match="string"):
            validate_structured(
                {"nodes": [{"id": 3, "label": "X"}], "relationships": []}, schema
            )

    def test_validate_accepts_good_graph(self):
        schema = build_graph_json_schema()
        validate_structured(
            {
                "nodes": [{"id": "a", "label": "Company", "properties": {"name": "A"}}],
                "relationships": [
                    {"start_node_id": "a", "end_node_id": "a", "type": "T", "properties": {}}
                ],
            },
            schema,
        )


class TestExtractContent:
    def test_responses_output_text(self):
        assert extract_content({"output_text": "hello"}) == "hello"

    def test_responses_nested_output(self):
        raw = {"output": [{"content": [{"type": "output_text", "text": "payload"}]}]}
        assert extract_content(raw) == "payload"

    def test_chat_string_content(self):
        raw = {"choices": [{"message": {"content": "chat"}}]}
        assert extract_content(raw) == "chat"

    def test_chat_part_list(self):
        raw = {"choices": [{"message": {"content": [{"text": "a"}, {"input_text": "b"}]}}]}
        assert extract_content(raw) == "ab"

    def test_empty_payload(self):
        assert extract_content({}) == ""
        assert extract_content({"choices": [{"message": {"content": None}}]}) == ""


class TestLlmExtractorE2E:
    def test_matches_rule_extractor_exactly(self, chunks):
        rule = build_triples(chunks, PipelineConfig())
        llm = build_triples_llm(
            chunks, make_perfect_transport, model="model-a", fallback_model="model-b",
            batch_size=64, concurrency=2, metrics_actor=None, sleep=no_sleep,
        )
        got_rule = _triple_set(rule)
        got_llm = _triple_set(llm)
        assert got_rule, "corpus must contain pattern facts"
        assert got_llm == got_rule

    def test_retry_and_fallback_then_success(self, chunks):
        # first pattern-bearing chunk: 429 twice (fallback on first 429),
        # then the perfect transport answers on the fallback model
        make = ScriptedTransportFactory({"launched": [429, 429]})
        reset_metrics()
        llm = build_triples_llm(
            chunks, make, model="model-a", fallback_model="model-b",
            batch_size=4096, concurrency=1, sleep=no_sleep,
        ).materialize()
        failed = [r for r in llm.take_all() if r["pred"] == LlmExtractor.FAILED_PRED]
        assert not failed
        rule = build_triples(chunks, PipelineConfig())
        assert _triple_set(llm) == _triple_set(rule)
        totals = collect_metrics()["llm_extractor"]
        assert totals["retries"] >= 2
        assert totals["fallbacks"] >= 1
        assert totals["failures"] == 0

    def test_permanent_failure_routes_failure_rows(self, chunks):
        make = ScriptedTransportFactory({"launched": [500] * 50})
        reset_metrics()
        llm = build_triples_llm(
            chunks, make, model="model-a", batch_size=4096, concurrency=1,
            policy=RetryPolicy(max_attempts=2), sleep=no_sleep,
        ).materialize()
        rows = llm.take_all()
        failed = [r for r in rows if r["pred"] == LlmExtractor.FAILED_PRED]
        assert failed, "chunks with scripted 500s must become failure rows"
        for r in failed:
            assert "TransportError" in json.loads(r["props"])["error"]
        totals = collect_metrics()["llm_extractor"]
        assert totals["failures"] == len(failed)

    def test_bad_json_and_schema_violation_fail_rows(self, chunks):
        make = ScriptedTransportFactory({"launched": ["badjson"], "ingested": ["extra"]})
        llm = build_triples_llm(
            chunks, make, model="model-a", batch_size=4096, concurrency=1,
            metrics_actor=None, sleep=no_sleep,
        ).materialize()
        failed = [json.loads(r["props"])["error"] for r in llm.take_all() if r["pred"] == LlmExtractor.FAILED_PRED]
        assert any("JSONDecodeError" in e for e in failed)
        assert any("SchemaViolation" in e for e in failed)

    def test_non_retryable_fails_without_retry(self):
        calls = []

        def transport(model, payload):
            calls.append(model)
            raise TransportError(400, "bad request")

        ex = LlmExtractor(lambda: transport, model="m", sleep=no_sleep)
        batch = pa.table(
            {"doc_id": ["d"], "chunk_uid": ["u"], "seq": [1],
             "text": ["Acme Corp launched Widget on January 1, 2024. x"]}
        )
        out = ex(batch)
        assert out.column("pred").to_pylist() == [LlmExtractor.FAILED_PRED]
        assert len(calls) == 1  # 400 is not retryable

    def test_json_schema_format_downgrade(self):
        seen_formats = []
        inner = DeterministicLlmTransport()

        def transport(model, payload):
            fmt = payload.get("response_format", {}).get("type")
            seen_formats.append(fmt)
            if fmt == "json_schema":
                raise TransportError(400, "response_format json_schema unsupported")
            return inner(model, payload)

        ex = LlmExtractor(lambda: transport, model="m", sleep=no_sleep)
        batch = pa.table(
            {"doc_id": ["d"], "chunk_uid": ["u"], "seq": [1],
             "text": ["Prefix. Acme Corp launched Widget Pro on January 1, 2024. tail"]}
        )
        out = ex(batch)
        assert LlmExtractor.FAILED_PRED not in out.column("pred").to_pylist()
        assert seen_formats[:2] == ["json_schema", "json_object"]
        # downgrade is remembered for subsequent chunks
        ex(batch)
        assert seen_formats[2] == "json_object"


class TestIntraActorConcurrency:
    """VERDICT r2 #8: the reference overlaps 4-5 in-flight model calls
    per document (asyncio semaphore); a serial actor would waste its
    pool on round-trip latency once a real transport is plugged in."""

    def _batch(self, chunks, n=32):
        import pyarrow as pa

        tbl = pa.concat_tables(list(chunks.limit(n).iter_batches(batch_format="pyarrow")))
        return tbl.select(["doc_id", "chunk_uid", "seq", "text"])

    def test_concurrency_speedup_identical_rows(self, chunks):
        import time

        from fancyrag_ray.stages.fake_llm import make_latency_transport
        from fancyrag_ray.stages.llm_extractor import LlmExtractor

        batch = self._batch(chunks, 32)
        delay = 0.05

        def run(max_conc):
            ex = LlmExtractor(
                transport_factory=lambda: make_latency_transport(delay),
                model="model-a",
                max_concurrency=max_conc,
            )
            t0 = time.time()
            out = ex(batch)
            return out, time.time() - t0

        serial, t_serial = run(1)
        conc, t_conc = run(4)
        assert serial.to_pydict() == conc.to_pydict()  # identical rows, same order
        speedup = t_serial / t_conc
        assert speedup >= 3.0, f"speedup {speedup:.2f} < 3x at concurrency 4"

    def test_failure_rows_preserved_under_concurrency(self, chunks):
        from fancyrag_ray.stages.fake_llm import ScriptedTransportFactory
        from fancyrag_ray.stages.llm_extractor import LlmExtractor
        from fancyrag_ray.stages.llm_client import RetryPolicy

        batch = self._batch(chunks, 16)
        # every chunk whose text contains the marker fails permanently
        marker = batch.column("text").to_pylist()[3][:20]
        factory = ScriptedTransportFactory({marker: ["boom"] * 99})
        for conc in (1, 4):
            ex = LlmExtractor(
                transport_factory=factory,
                model="model-a",
                policy=RetryPolicy(max_attempts=2, base_backoff_s=0.0),
                sleep=lambda s: None,
                max_concurrency=conc,
            )
            out = ex(batch)
            meta = out.schema.metadata or {}
            assert int(meta.get(b"n_failures", b"0")) >= 1
