"""Deterministic fake LLM transports for the ``LlmExtractor`` stage.

No network exists in this sandbox, so — like ``HashEmbedder`` for the
embedding stage — the default extraction backend is a deterministic fake
that exercises ALL the real plumbing: prompt construction, retry/backoff/
fallback in ``SharedModelClient``, Responses-payload parsing, code-fence
stripping, strict-schema validation, closed-world filtering and
failure-row routing. A real HTTP transport drops into the same
``transport(model, payload) -> raw_response`` signature.

``DeterministicLlmTransport`` is the "perfect LLM": it parses the chunk
text out of the prompt with the same closed-world rules as
``RuleExtractor`` and answers with a code-fenced JSON graph inside a
Responses-style payload — so ``LlmExtractor`` over it must produce
exactly the ``RuleExtractor`` triples (asserted in tests).

``ScriptedFailureTransport`` wraps any inner transport with a
per-marker schedule of failures (HTTP statuses, malformed JSON,
schema-violating output) to drive the retry/fallback/failure paths
(reference retry policy ``src/cli/openai_client.py:58,323-387``).
"""

from __future__ import annotations

import json
import re

from ..schema import DEFAULT_SCHEMA, GraphSchema
from .extractor import RuleExtractor
from .llm_client import TransportError

_DOC_RE = re.compile(r"DOC_ID: (.*)")
_SEQ_RE = re.compile(r"CHUNK_SEQ: (\d+)")


def _parse_prompt(payload) -> tuple[str, int, str]:
    user = payload["messages"][-1]["content"]
    doc_id = _DOC_RE.search(user).group(1).strip()
    seq = int(_SEQ_RE.search(user).group(1))
    text = user.split("TEXT:\n", 1)[1]
    return doc_id, seq, text


def _fenced(graph: dict) -> dict:
    content = "```json\n" + json.dumps(graph, sort_keys=True) + "\n```"
    return {"output": [{"content": [{"text": content}]}]}


class DeterministicLlmTransport:
    """Perfect-LLM fake: same facts as ``RuleExtractor``, delivered the
    way a structured-output model would deliver them."""

    def __init__(self, schema: GraphSchema = DEFAULT_SCHEMA, emit_cooccurrence: bool = False):
        self.rule = RuleExtractor(schema=schema, emit_cooccurrence=emit_cooccurrence)
        self.calls = 0

    def __call__(self, model: str, payload: dict) -> dict:
        self.calls += 1
        doc_id, seq, text = _parse_prompt(payload)
        triples = self.rule.extract_text(doc_id, "uid", seq, text)
        nodes: dict[str, dict] = {}
        rels = []
        for (_d, _u, _s, subj, subj_label, pred, obj, obj_label, props) in triples:
            sid, oid = f"{subj_label}:{subj}", f"{obj_label}:{obj}"
            nodes.setdefault(sid, {"id": sid, "label": subj_label, "properties": {"name": subj}})
            nodes.setdefault(oid, {"id": oid, "label": obj_label, "properties": {"name": obj}})
            rels.append(
                {"start_node_id": sid, "end_node_id": oid, "type": pred, "properties": json.loads(props)}
            )
        return _fenced({"nodes": list(nodes.values()), "relationships": rels})


class ScriptedFailureTransport:
    """Wraps ``inner`` with per-marker failure scripts.

    ``scripts`` maps a text substring to a list of steps consumed one
    per call on chunks containing that substring:
      * ``int``      — raise ``TransportError(status)`` (429 carries a
        Retry-After header value of "0");
      * ``"badjson"``— return unparseable content;
      * ``"extra"``  — return a graph violating the strict schema
        (additional property);
    When a marker's script is exhausted, calls delegate to ``inner``.
    """

    def __init__(self, inner, scripts: dict[str, list] | None = None):
        self.inner = inner
        self.scripts = {k: list(v) for k, v in (scripts or {}).items()}
        self.calls = 0

    def __call__(self, model: str, payload: dict) -> dict:
        self.calls += 1
        _, _, text = _parse_prompt(payload)
        for marker, steps in self.scripts.items():
            if marker in text and steps:
                step = steps.pop(0)
                if isinstance(step, int):
                    retry_after = "0" if step == 429 else None
                    raise TransportError(step, f"scripted failure for {marker!r}", retry_after=retry_after)
                if step == "badjson":
                    return _fenced_raw("{not json")
                if step == "extra":
                    return _fenced(
                        {"nodes": [], "relationships": [], "hallucinated": True}
                    )
                raise ValueError(f"unknown scripted step {step!r}")
        return self.inner(model, payload)


def _fenced_raw(content: str) -> dict:
    return {"output": [{"content": [{"text": "```json\n" + content + "\n```"}]}]}


# --- picklable factories for actor-pool stages -----------------------------
# Ray workers import these by reference; closures defined in test modules
# are NOT importable from workers and wedge the actor pool in a
# constructor-retry loop.

def make_perfect_transport():
    """transport_factory for ``build_triples_llm``: the perfect LLM."""
    return DeterministicLlmTransport()


def no_sleep(_seconds: float) -> None:
    """Zero-latency sleep injection for retry tests/benches."""
    return None


class ScriptedTransportFactory:
    """Picklable transport_factory wrapping the perfect transport with a
    failure script (fresh script state per actor)."""

    def __init__(self, scripts: dict[str, list], emit_cooccurrence: bool = False):
        self.scripts = scripts
        self.emit_cooccurrence = emit_cooccurrence

    def __call__(self):
        return ScriptedFailureTransport(
            DeterministicLlmTransport(emit_cooccurrence=self.emit_cooccurrence), self.scripts
        )


class LatencyTransport:
    """Wrap an inner transport with a fixed per-call sleep — models the
    network round-trip the sandbox lacks, so tests can assert the
    in-actor concurrency actually overlaps calls (reference overlaps
    4-5 in-flight calls per document, ``pipeline.py:703-736``)."""

    def __init__(self, inner, delay_s: float = 0.05):
        import time as _time

        self.inner = inner
        self.delay_s = delay_s
        self._sleep = _time.sleep

    def __call__(self, model: str, payload: dict) -> dict:
        self._sleep(self.delay_s)
        return self.inner(model, payload)


def make_latency_transport(delay_s: float = 0.05, emit_cooccurrence: bool = False):
    return LatencyTransport(DeterministicLlmTransport(emit_cooccurrence=emit_cooccurrence), delay_s)
