"""LLM-backed triple extractor — the reference's actual extraction engine
as a Ray actor-pool stage.

Parity map (all semantics re-implemented, no code copied):
  * per-chunk LLM call with retry/backoff/fallback — ``SharedModelClient``
    (reference ``src/cli/openai_client.py:95-396``), built ONCE per actor;
  * strict JSON schema for structured output — recursive
    ``additionalProperties: false`` on object schemas with explicit
    properties (reference ``src/fancyrag/kg/structured_output.py:8-36``),
    enforced client-side here (no OpenAI server exists to enforce it)
    via :func:`validate_structured`;
  * json_schema → json_object response-format downgrade when the
    transport rejects the schema format (reference
    ``src/fancyrag/kg/semantic_llm.py:75-78,135-155``);
  * tolerant payload parsing of Responses/Chat shapes —
    :func:`extract_content` (reference ``pipeline.py:988-1127``);
  * code-fence stripping before JSON parse (``pipeline.py:1130-1140``);
  * per-chunk failure routing: exhausted retries / bad JSON / schema
    violations become sentinel ``__FAILED__`` rows counted by the QA
    gate instead of aborting the run (reference ``pipeline.py:706-723``);
  * closed-world filtering: out-of-schema triples are dropped
    (``scripts/config/kg_schema.json:19-21``);
  * telemetry (A6): per-actor ``ClientMetrics`` deltas are pushed to a
    named zero-CPU aggregator actor after every batch and folded into
    the run log (reference ``src/cli/telemetry.py:78-228``).

Output schema is ``TRIPLE_SCHEMA`` — a drop-in for ``RuleExtractor`` in
``build_triples`` (same downstream linker/materializer).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.sanitize import sanitize_properties, strip_code_fence
from ..schema import DEFAULT_SCHEMA, GraphSchema
from .extractor import TRIPLE_SCHEMA, RuleExtractor
from .llm_client import RetryPolicy, SharedModelClient, TransportError

FAILED_PRED = RuleExtractor.FAILED_PRED

PROMPT_TEMPLATE = (
    "Extract entities and relationships from the text as JSON with keys "
    '"nodes" (id, label, properties) and "relationships" (start_node_id, '
    'end_node_id, type, properties). Emit only schema-conformant output.\n'
    "DOC_ID: {doc_id}\nCHUNK_SEQ: {seq}\nTEXT:\n{text}"
)

SYSTEM_INSTRUCTION = "You are a knowledge-graph extraction engine."


# ---------------------------------------------------------------------------
# Strict structured-output schema (structured_output.py:8-36 semantics)
# ---------------------------------------------------------------------------

def strict_schema(schema):
    """Recursively set ``additionalProperties: false`` on every object
    schema that declares explicit properties (reference
    ``structured_output.py:8-22``)."""
    if isinstance(schema, list):
        return [strict_schema(s) for s in schema]
    if not isinstance(schema, dict):
        return schema
    updated = {k: strict_schema(v) for k, v in schema.items()}
    if updated.get("type") == "object":
        if "properties" in updated:
            updated["additionalProperties"] = False
        if "additionalProperties" in updated:
            updated["additionalProperties"] = strict_schema(updated["additionalProperties"])
    return updated


def build_graph_json_schema() -> dict:
    """Strict JSON schema for the extraction payload — the shape the
    reference derives from ``Neo4jGraph.model_json_schema()`` (node =
    {id, label, properties}; relationship = {start_node_id, end_node_id,
    type, properties}; usage ``pipeline.py:578-611``)."""
    props_schema = {"type": "object"}  # free-form map; sanitized downstream
    base = {
        "type": "object",
        "properties": {
            "nodes": {
                "type": "array",
                "items": {
                    "type": "object",
                    "properties": {
                        "id": {"type": "string"},
                        "label": {"type": "string"},
                        "properties": props_schema,
                    },
                    "required": ["id", "label"],
                },
            },
            "relationships": {
                "type": "array",
                "items": {
                    "type": "object",
                    "properties": {
                        "start_node_id": {"type": "string"},
                        "end_node_id": {"type": "string"},
                        "type": {"type": "string"},
                        "properties": props_schema,
                    },
                    "required": ["start_node_id", "end_node_id", "type"],
                },
            },
        },
        "required": ["nodes", "relationships"],
    }
    return strict_schema(base)


class SchemaViolation(ValueError):
    pass


def validate_structured(payload, schema, path: str = "$") -> None:
    """Minimal strict JSON-schema validator for the subset emitted by
    :func:`build_graph_json_schema` (type / properties / required /
    additionalProperties / items). Raises :class:`SchemaViolation` with
    the offending path — the client-side stand-in for OpenAI's
    server-side ``strict: true`` enforcement (``semantic_llm.py:110-121``)."""
    t = schema.get("type")
    if t == "object":
        if not isinstance(payload, dict):
            raise SchemaViolation(f"{path}: expected object, got {type(payload).__name__}")
        props = schema.get("properties", {})
        for req in schema.get("required", []):
            if req not in payload:
                raise SchemaViolation(f"{path}: missing required key {req!r}")
        if schema.get("additionalProperties") is False:
            extra = set(payload) - set(props)
            if extra:
                raise SchemaViolation(f"{path}: additional properties {sorted(extra)}")
        for k, v in payload.items():
            if k in props:
                validate_structured(v, props[k], f"{path}.{k}")
    elif t == "array":
        if not isinstance(payload, list):
            raise SchemaViolation(f"{path}: expected array, got {type(payload).__name__}")
        items = schema.get("items")
        if items:
            for i, v in enumerate(payload):
                validate_structured(v, items, f"{path}[{i}]")
    elif t == "string":
        if not isinstance(payload, str):
            raise SchemaViolation(f"{path}: expected string, got {type(payload).__name__}")
    elif t == "number":
        if not isinstance(payload, (int, float)) or isinstance(payload, bool):
            raise SchemaViolation(f"{path}: expected number")
    elif t == "integer":
        if not isinstance(payload, int) or isinstance(payload, bool):
            raise SchemaViolation(f"{path}: expected integer")
    elif t == "boolean":
        if not isinstance(payload, bool):
            raise SchemaViolation(f"{path}: expected boolean")


# ---------------------------------------------------------------------------
# Tolerant response-content extraction (pipeline.py:988-1127 semantics)
# ---------------------------------------------------------------------------

def _coerce_text(value):
    if value is None:
        return None
    if isinstance(value, str):
        return value
    if isinstance(value, dict):
        for key in ("text", "input_text", "value", "content"):
            inner = value.get(key)
            if inner is not None:
                text = _coerce_text(inner)
                if text:
                    return text
        return None
    for attr in ("text", "input_text", "value"):
        if hasattr(value, attr):
            text = _coerce_text(getattr(value, attr))
            if text:
                return text
    return None


def _content_from_responses(payload) -> str:
    """Responses-API shape: top-level ``output_text`` or
    ``output[].content[].{text|content|output_text}``."""
    if not isinstance(payload, dict):
        return ""
    text = _coerce_text(payload.get("output_text"))
    if text:
        return text
    for output in payload.get("output") or []:
        contents = output.get("content") if isinstance(output, dict) else None
        for item in contents or []:
            if isinstance(item, dict):
                cand = item.get("text") or item.get("content") or item.get("output_text")
            else:
                cand = item
            text = _coerce_text(cand)
            if text:
                return text
    return ""


def _content_from_chat(payload) -> str:
    """Chat-completions shape: ``choices[].message.content`` — a string
    or a list of content parts."""
    if not isinstance(payload, dict):
        return ""
    for choice in payload.get("choices") or []:
        message = choice.get("message") if isinstance(choice, dict) else None
        if not message:
            continue
        content = message.get("content")
        if isinstance(content, str) and content:
            return content
        if isinstance(content, list):
            parts = [p for item in content if (p := _coerce_text(item))]
            if parts:
                return "".join(parts)
        text = _coerce_text(content)
        if text:
            return text
    return ""


def extract_content(raw) -> str:
    """Textual content from a Responses- or Chat-style payload; '' when
    nothing parseable is found (reference ``_extract_content``)."""
    payload = raw
    if hasattr(raw, "model_dump"):
        payload = raw.model_dump()
    elif hasattr(raw, "to_dict"):
        payload = raw.to_dict()
    return _content_from_responses(payload) or _content_from_chat(payload)


def _looks_like_format_error(exc: TransportError) -> bool:
    msg = str(exc).lower()
    return "response_format" in msg or "json_schema" in msg or "text.format" in msg


# ---------------------------------------------------------------------------
# Telemetry aggregation (A6)
# ---------------------------------------------------------------------------

METRICS_ACTOR_NAME = "fancyrag_llm_metrics"


def _metrics_actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class MetricsAggregator:
        """Named zero-CPU actor accumulating per-stage counter deltas."""

        def __init__(self):
            self._totals: dict[str, dict[str, float]] = {}

        def record(self, group: str, delta: dict) -> None:
            g = self._totals.setdefault(group, {})
            for k, v in delta.items():
                g[k] = g.get(k, 0) + v

        def totals(self) -> dict:
            return {g: dict(v) for g, v in self._totals.items()}

        def reset(self) -> None:
            self._totals = {}

    return MetricsAggregator


def get_metrics_actor(name: str = METRICS_ACTOR_NAME):
    """Get-or-create the named aggregator (detached within the session)."""
    return _metrics_actor_cls().options(name=name, get_if_exists=True).remote()


def collect_metrics(name: str = METRICS_ACTOR_NAME) -> dict:
    """Driver-side: read accumulated totals (empty dict if absent)."""
    import ray

    try:
        actor = ray.get_actor(name)
    except ValueError:
        return {}
    return ray.get(actor.totals.remote())


def reset_metrics(name: str = METRICS_ACTOR_NAME) -> None:
    import ray

    try:
        actor = ray.get_actor(name)
    except ValueError:
        return
    ray.get(actor.reset.remote())


# ---------------------------------------------------------------------------
# The actor stage
# ---------------------------------------------------------------------------

class LlmExtractor:
    """Actor-pool extraction stage driving an injected transport through
    ``SharedModelClient``. Drop-in for ``RuleExtractor`` (same output
    schema); usage::

        chunks.map_batches(
            LlmExtractor,
            fn_constructor_kwargs={"transport_factory": make_transport,
                                   "model": "model-a",
                                   "fallback_model": "model-b"},
            batch_format="pyarrow", batch_size=64,
            concurrency=(1, 8), num_cpus=1)

    ``transport_factory`` is a zero-arg callable returning
    ``transport(model, payload) -> raw_response`` so each actor builds
    its own client state once in ``__init__``.
    """

    FAILED_PRED = FAILED_PRED

    def __init__(
        self,
        transport_factory,
        model: str,
        fallback_model: str | None = None,
        schema: GraphSchema = DEFAULT_SCHEMA,
        policy: RetryPolicy | None = None,
        response_format: str = "json_schema",
        metrics_handle=None,
        sleep=None,
        max_concurrency: int = 4,
    ):
        kwargs = {"sleep": sleep} if sleep is not None else {}
        self.client = SharedModelClient(
            transport_factory(), model, fallback_model=fallback_model, policy=policy, **kwargs
        )
        # in-actor overlap of model calls (reference: 4-5 in-flight per
        # document under asyncio.Semaphore, pipeline.py:703-736 /
        # kg_ingest.yaml:59). With a real network transport a serial
        # actor wastes its whole pool on round-trip latency.
        self.max_concurrency = max(1, int(max_concurrency))
        if self.max_concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            # built once per actor (not per batch): threads live for the
            # actor's lifetime and batches reuse them
            self._executor = ThreadPoolExecutor(max_workers=self.max_concurrency)
        else:
            self._executor = None
        self.schema = schema
        self.json_schema = build_graph_json_schema()
        self.response_format = response_format
        self._schema_format_ok = True  # flips after a format-rejection downgrade
        # IMPORTANT: the handle must come from the DRIVER — a named actor
        # created inside a pool actor is owned by it and dies with it,
        # losing the totals.
        self._metrics_handle = metrics_handle
        self._reported = {}

    # -- per-chunk ---------------------------------------------------------

    def _format_payload(self):
        """response_format per ``semantic_llm.py:110-121``; downgraded to
        json_object after a transport format rejection."""
        if self.response_format == "off":
            return None
        if self.response_format == "json_object" or not self._schema_format_ok:
            return {"type": "json_object"}
        return {"type": "json_schema", "name": "graph", "schema": self.json_schema, "strict": True}

    def _call_model(self, text: str, doc_id: str, seq: int):
        messages = [
            {"role": "system", "content": SYSTEM_INSTRUCTION},
            {"role": "user", "content": PROMPT_TEMPLATE.format(doc_id=doc_id, seq=seq, text=text)},
        ]
        payload = {"messages": messages}
        fmt = self._format_payload()
        if fmt is not None:
            payload["response_format"] = fmt
        try:
            return self.client.call(payload)
        except TransportError as exc:
            # json_schema format rejected by the backend → one retry with
            # plain json_object, then remember (semantic_llm.py:135-155)
            if fmt is not None and fmt.get("type") == "json_schema" and _looks_like_format_error(exc):
                self._schema_format_ok = False
                payload["response_format"] = {"type": "json_object"}
                return self.client.call(payload)
            raise

    def _parse_graph(self, raw) -> dict:
        content = strip_code_fence(extract_content(raw))
        if not content:
            raise ValueError("model returned an empty response")
        graph = json.loads(content)
        validate_structured(graph, self.json_schema)
        return graph

    def _rows_from_graph(self, graph: dict, doc_id: str, chunk_uid: str, chunk_seq: int) -> list[tuple]:
        nodes = {}
        for n in graph.get("nodes", []):
            name = n.get("properties", {}).get("name") or n["id"]
            nodes[n["id"]] = (n["label"], str(name))
        rows = []
        for r in graph.get("relationships", []):
            s, o = nodes.get(r["start_node_id"]), nodes.get(r["end_node_id"])
            if s is None or o is None:
                continue  # dangling endpoint: drop (writer MATCH-miss parity)
            if not self.schema.allows(s[0], r["type"], o[0]):
                continue  # closed world (kg_schema.json:19-21)
            props = sanitize_properties(r.get("properties", {}) or {})
            rows.append(
                (doc_id, chunk_uid, chunk_seq, s[1], s[0], r["type"], o[1], o[0],
                 json.dumps(props, sort_keys=True))
            )
        return rows

    def _report_metrics(self):
        if self._metrics_handle is None:
            return
        cur = self.client.metrics.as_dict()
        delta = {k: v - self._reported.get(k, 0) for k, v in cur.items()}
        if any(delta.values()):
            self._metrics_handle.record.remote("llm_extractor", delta)
            self._reported = cur

    # -- per-batch ---------------------------------------------------------

    def _extract_one(self, doc_id, uid, seq, text) -> tuple[list[tuple], bool]:
        """(rows, failed) for one chunk — thread-safe: the shared client
        locks its counters; ``_schema_format_ok`` is a benign
        monotonic-downgrade flag (a race costs at most one extra
        json_object retry)."""
        try:
            raw = self._call_model(text or "", str(doc_id), int(seq))
            graph = self._parse_graph(raw)
            return self._rows_from_graph(graph, str(doc_id), uid, int(seq)), False
        except Exception as exc:  # exhausted retries / bad JSON / schema violation
            return (
                [(str(doc_id), uid, int(seq), str(doc_id), "Document", FAILED_PRED, "", "",
                  json.dumps({"error": f"{type(exc).__name__}: {str(exc)[:200]}"}))],
                True,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        uids = batch.column("chunk_uid").to_pylist()
        seqs = batch.column("seq").to_pylist()
        texts = batch.column("text").to_pylist()
        items = list(zip(doc_ids, uids, seqs, texts))
        if self._executor is not None and len(items) > 1:
            # executor.map preserves input order ⇒ identical row order
            # to the serial path
            results = list(self._executor.map(lambda it: self._extract_one(*it), items))
        else:
            results = [self._extract_one(*it) for it in items]
        rows: list[tuple] = []
        n_failures = 0
        for chunk_rows, failed in results:
            rows.extend(chunk_rows)
            n_failures += int(failed)
        self._report_metrics()
        cols = list(zip(*rows)) if rows else [[] for _ in TRIPLE_SCHEMA]
        tbl = pa.table(
            {f.name: pa.array(list(col), type=f.type) for f, col in zip(TRIPLE_SCHEMA, cols)}
        )
        if n_failures:
            tbl = tbl.replace_schema_metadata({b"n_failures": str(n_failures).encode()})
        return tbl


def build_triples_llm(
    chunks,
    transport_factory,
    model: str,
    fallback_model: str | None = None,
    schema: GraphSchema = DEFAULT_SCHEMA,
    policy: RetryPolicy | None = None,
    batch_size: int = 64,
    concurrency: int = 8,
    metrics_actor: str | None = METRICS_ACTOR_NAME,
    sleep=None,
    max_concurrency: int = 4,
):
    """Wire the LLM extractor as the A3 stage: actor pool (client built
    once per actor), autoscaling floor of half the pool so short phases
    still ramp — CLAMPED to leave ≥2 CPUs for the upstream read/chunk
    stages (a pool floor that reserves every CPU starves the upstream
    into a silent deadlock; observed live on a 4-CPU cluster)."""
    import ray

    projected = chunks.select_columns(["doc_id", "chunk_uid", "seq", "text"])
    handle = get_metrics_actor(metrics_actor) if metrics_actor else None
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    floor = max(1, min(concurrency // 2, cpus - 2))
    return projected.map_batches(
        LlmExtractor,
        fn_constructor_kwargs={
            "transport_factory": transport_factory,
            "model": model,
            "fallback_model": fallback_model,
            "schema": schema,
            "policy": policy,
            "metrics_handle": handle,
            "sleep": sleep,
            "max_concurrency": max_concurrency,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(floor, concurrency),
        num_cpus=1,
    )
