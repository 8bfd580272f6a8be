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
OAuth/MCP-protocol plumbing is out of scope for a data engine; the
routes and payloads are the user-visible surface.

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

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self) -> bool:
                if auth_token is None:
                    return True
                got = self.headers.get("Authorization", "")
                return got == f"Bearer {auth_token}"

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
