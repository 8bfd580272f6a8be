"""HTTP shell over :class:`KgServer` — the reference's transport layer.

Parity (§2.11): the reference exposes its serving state over HTTP — a
FastMCP app with ``search`` / ``fetch`` tools and a custom
``/mcp/health`` route that returns ``{"status": "ok"}`` on success and a
503 ``{"status": "unhealthy", "reason": ...}`` when the backing store is
unreachable (``src/fancyrag/mcp/runtime.py:275-417``,
``servers/mcp_hybrid_google.py:57-70``). This module is the
stdlib-``http.server`` equivalent: three GET routes mapping 1:1 onto the
in-process :class:`KgServer` methods, with the reference's payload
shapes (``search_sync`` runtime.py:172-233, ``fetch_sync`` :236-272).

The MCP protocol framing itself is implemented too (``POST /mcp``):
JSON-RPC 2.0 ``initialize`` / ``tools/list`` / ``tools/call`` / ``ping``
over plain HTTP, exposing the reference's two FastMCP tools —
``search(query, top_k=5, effective_search_ratio=1)`` and
``fetch(element_id)`` (runtime.py:396-417) — with the reference's
argument validation verbatim (its ``http_search`` checks,
runtime.py:355-380: ``type(top_k) is not int`` etc.). The reference's
POST custom routes (``/search``/``/fetch`` with a JSON body and those
same validation messages) are mirrored as POST siblings of the GET
routes. Auth is the static-token flavor (``StaticTokenVerifier``,
servers/mcp_hybrid_google.py:40-55) — a 401 carries the reference's
``www-authenticate`` Bearer challenge shape (runtime.py:302-325);
Google OAuth remains out of scope in this sandbox (no network).

Serving stays single-process by design — the heavy lifting happened at
provision time (IVF cells, posting buckets, hash-bucketed tables), so a
request is a handful of pruned parquet reads. At scale you run many
replicas behind a load balancer, each holding the same read-only store
root (or a Ray Serve deployment wrapping the same ``KgServer``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
import pandas as pd

from .serve import KgServer


def _json_default(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    raise TypeError(f"not JSON serializable: {type(v)}")


def _records(df: pd.DataFrame | None) -> list[dict]:
    if df is None or not len(df):
        return []
    return df.to_dict(orient="records")


def _search_payload(server: KgServer, q: str, top_k: int, ratio: float,
                    include_context: bool) -> dict:
    """Reference ``search_sync`` response shape: the query echo plus one
    result item per hit carrying the combined score and the
    max-normalized per-list scores (runtime.py:218-233)."""
    out = server.search(
        q, top_k=top_k, effective_search_ratio=ratio, include_context=include_context
    )
    hits = out["hits"]
    results = [
        {
            "chunk_uid": r["chunk_uid"],
            "score": float(r["score"]),
            "score_vector": float(r.get("score_vector", 0.0)),
            "score_fulltext": float(r.get("score_fulltext", 0.0)),
        }
        for r in _records(hits)
    ]
    payload = {
        "query": q,
        "top_k": top_k,
        "effective_search_ratio": ratio,
        "results": results,
    }
    if include_context:
        payload["context"] = _records(out.get("context"))
    return payload


def _fetch_payload(server: KgServer, entity_id: str) -> dict:
    """Reference ``fetch_sync`` response shape (runtime.py:255-272):
    found flag + embedding-free metadata + the text convenience copy."""
    row = server.fetch(entity_id)
    if row is None:
        return {"found": False, "element_id": entity_id}
    return {
        "found": True,
        "element_id": entity_id,
        "metadata": row,
        "text": row.get("text", "") or "",
    }


MCP_PROTOCOL_VERSION = "2025-06-18"


def mcp_tools() -> list[dict]:
    """MCP tool descriptors for the reference's two FastMCP tools
    (runtime.py:396-417): names, defaults and required args match the
    reference signatures exactly."""
    return [
        {
            "name": "search",
            "description": "Execute hybrid retrieval over the KG store.",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "query": {"type": "string"},
                    "top_k": {"type": "integer", "default": 5},
                    "effective_search_ratio": {"type": "integer", "default": 1},
                },
                "required": ["query"],
            },
        },
        {
            "name": "fetch",
            "description": "Fetch a node by its element id.",
            "inputSchema": {
                "type": "object",
                "properties": {"element_id": {"type": "string"}},
                "required": ["element_id"],
            },
        },
    ]


def _rpc_error(mid, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": mid, "error": {"code": code, "message": message}}


def _rpc_result(mid, result: dict) -> dict:
    return {"jsonrpc": "2.0", "id": mid, "result": result}


def _validated_search_args(args: dict) -> tuple[str, int, int]:
    """The reference's http_search validation, verbatim semantics
    (runtime.py:355-380) — including the strict ``type(x) is not int``
    checks (a float 3.0 or bool True is rejected, as FastMCP would)."""
    query = args.get("query")
    if not isinstance(query, str) or not query:
        raise ValueError("query is required")
    top_k = args.get("top_k", 5)
    ratio = args.get("effective_search_ratio", 1)
    if type(top_k) is not int:
        raise ValueError("top_k must be an integer")
    if type(ratio) is not int:
        raise ValueError("effective_search_ratio must be an integer")
    if top_k <= 0:
        raise ValueError("top_k must be greater than zero")
    if ratio <= 0:
        raise ValueError("effective_search_ratio must be greater than zero")
    return query, top_k, ratio


def mcp_dispatch(kg: KgServer, msg) -> dict | None:
    """One JSON-RPC 2.0 message → response dict (None for notifications,
    which get no response by protocol). Protocol errors use the JSON-RPC
    error member; tool EXECUTION failures ride a successful response
    with ``isError: true`` per the MCP tools spec — the same split the
    reference gets from FastMCP (a ValueError raised inside a tool
    becomes a tool error, not a protocol error)."""
    if not isinstance(msg, dict) or msg.get("jsonrpc") != "2.0" or not isinstance(msg.get("method"), str):
        return _rpc_error(msg.get("id") if isinstance(msg, dict) else None, -32600, "invalid request")
    method, mid = msg["method"], msg.get("id")
    if mid is None:  # notification (e.g. notifications/initialized)
        return None
    if method == "initialize":
        return _rpc_result(
            mid,
            {
                "protocolVersion": MCP_PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "fancyrag-ray-kg", "version": "1.0"},
            },
        )
    if method == "ping":
        return _rpc_result(mid, {})
    if method == "tools/list":
        return _rpc_result(mid, {"tools": mcp_tools()})
    if method == "tools/call":
        params = msg.get("params") or {}
        name, args = params.get("name"), params.get("arguments") or {}
        if name not in ("search", "fetch"):
            return _rpc_error(mid, -32602, f"unknown tool: {name}")
        try:
            if name == "search":
                query, top_k, ratio = _validated_search_args(args)
                out = _search_payload(kg, query, top_k, float(ratio), include_context=True)
            else:
                element_id = args.get("element_id")
                if not isinstance(element_id, str) or not element_id:
                    raise ValueError("element_id is required")
                out = _fetch_payload(kg, element_id)
        except ValueError as exc:
            return _rpc_result(mid, {"content": [{"type": "text", "text": str(exc)}], "isError": True})
        return _rpc_result(
            mid,
            {
                "content": [{"type": "text", "text": json.dumps(out, default=_json_default)}],
                "structuredContent": out,
                "isError": False,
            },
        )
    return _rpc_error(mid, -32601, f"method not found: {method}")


class KgHttpServer:
    """Threaded HTTP wrapper: ``start()`` binds and serves on a
    background thread (port 0 picks a free port), ``stop()`` shuts down.
    Also usable as a context manager.

    ``auth_token`` enables the reference's static-token mode
    (``StaticTokenVerifier``, servers/mcp_hybrid_google.py:40-55):
    ``/search`` and ``/fetch`` then require ``Authorization: Bearer
    <token>`` and answer 401 otherwise; ``/health`` stays open (the
    reference's health route is registered outside the auth provider).
    """

    def __init__(
        self,
        server: KgServer,
        host: str = "127.0.0.1",
        port: int = 0,
        auth_token: str | None = None,
    ):
        self.kg = server
        kg = server

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: tests/CI own the log
                pass

            def _send(self, code: int, payload: dict, headers: dict | None = None) -> None:
                body = json.dumps(payload, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self) -> bool:
                if auth_token is None:
                    return True
                got = self.headers.get("Authorization", "")
                return got == f"Bearer {auth_token}"

            def _send_auth_challenge(self) -> None:
                # reference _auth_error shape (runtime.py:302-325): 401
                # body {error, error_description} + www-authenticate
                # Bearer challenge header
                self._send(
                    401,
                    {"error": "invalid_token", "error_description": "Authentication required"},
                    headers={
                        "www-authenticate": 'Bearer error="invalid_token", '
                        'error_description="Authentication required"'
                    },
                )

            def _read_json_body(self):
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b""
                return json.loads(raw)

            def do_POST(self):  # noqa: N802 (stdlib handler contract)
                url = urlparse(self.path)
                try:
                    if not self._authorized():
                        self._send_auth_challenge()
                        return
                    if url.path == "/mcp":
                        try:
                            msg = self._read_json_body()
                        except (json.JSONDecodeError, ValueError):
                            self._send(200, _rpc_error(None, -32700, "parse error"))
                            return
                        resp = mcp_dispatch(kg, msg)
                        if resp is None:  # notification: accepted, no body
                            self.send_response(202)
                            self.send_header("Content-Length", "0")
                            self.end_headers()
                        else:
                            self._send(200, resp)
                    elif url.path in ("/search", "/fetch"):
                        # reference POST custom routes (runtime.py:355-394)
                        try:
                            payload = self._read_json_body()
                        except (json.JSONDecodeError, ValueError):
                            self._send(400, {"error": "Invalid JSON body"})
                            return
                        if not isinstance(payload, dict):
                            self._send(400, {"error": "Invalid JSON body"})
                            return
                        try:
                            if url.path == "/search":
                                q, top_k, ratio = _validated_search_args(payload)
                                self._send(200, _search_payload(kg, q, top_k, float(ratio), include_context=True))
                            else:
                                element_id = payload.get("element_id")
                                if not isinstance(element_id, str) or not element_id:
                                    raise ValueError("element_id is required")
                                self._send(200, _fetch_payload(kg, element_id))
                        except ValueError as exc:
                            self._send(400, {"error": str(exc)})
                    else:
                        self._send(404, {"error": f"unknown route: {url.path}"})
                except Exception as exc:  # defensive: surface as 500, keep serving
                    self._send(500, {"error": type(exc).__name__})

            def do_GET(self):  # noqa: N802 (stdlib handler contract)
                url = urlparse(self.path)
                qs = parse_qs(url.query)
                try:
                    if url.path != "/health" and not self._authorized():
                        self._send(401, {"error": "unauthorized"})
                    elif url.path == "/health":
                        h = kg.health()
                        self._send(200 if h["status"] == "ok" else 503, h)
                    elif url.path == "/search":
                        if "q" not in qs:
                            self._send(400, {"error": "missing required parameter: q"})
                            return
                        payload = _search_payload(
                            kg,
                            qs["q"][0],
                            top_k=int(qs.get("top_k", ["5"])[0]),
                            ratio=float(qs.get("effective_search_ratio", ["1.0"])[0]),
                            include_context=qs.get("include_context", ["true"])[0].lower()
                            != "false",
                        )
                        self._send(200, payload)
                    elif url.path == "/fetch":
                        if "id" not in qs:
                            self._send(400, {"error": "missing required parameter: id"})
                            return
                        self._send(200, _fetch_payload(kg, qs["id"][0]))
                    else:
                        self._send(404, {"error": f"unknown route: {url.path}"})
                except ValueError as exc:  # validate_top_k / bad number params
                    self._send(400, {"error": str(exc)})
                except Exception as exc:  # defensive: surface as 500, keep serving
                    self._send(500, {"error": type(exc).__name__})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    def start(self) -> tuple[str, int]:
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.address

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "KgHttpServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
