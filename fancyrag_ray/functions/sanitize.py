"""Property sanitization + log scrubbing scalar functions.

Parity (SURVEY §2.2 M7/M8/M10/M11, §2.8):
  * ``sanitize_property_value`` — reference ``pipeline.py:759-819``:
    None/str/int/float/bool pass through; homogeneous primitive lists
    pass; heterogeneous sequences, mappings and nested lists are
    JSON-stringified with sorted keys; everything else is str()-ed.
    Applied batch-wise before node/edge writes (Arrow columns are typed,
    so this normalizes only the overflow ``props`` map).
  * ``strip_code_fence`` — ``pipeline.py:1130-1140``: unwrap
    ```` ```lang … ``` ```` before JSON parsing.
  * ``scrub_object`` — ``src/cli/sanitizer.py:66-215``: deep redaction
    of secret-looking values by key-name heuristics + token regexes;
    cycle-safe. Driver-side (log/manifest payloads, not data plane).
  * ``fs_safe_name`` — ``pipeline.py:614-626``.
  * ``token_estimate`` — ``evaluator.py:352-358``.
"""

from __future__ import annotations

import json
import math
import re
from collections.abc import Mapping, Sequence

_PRIMITIVES = (str, int, float, bool)

_FENCE_RE = re.compile(r"^\s*```[A-Za-z0-9_-]*\s*\n(.*?)\n?\s*```\s*$", re.DOTALL)

_SECRET_KEY_RE = re.compile(r"(key|token|secret|password|credential|authorization)", re.IGNORECASE)
_SECRET_VALUE_RES = [
    re.compile(r"sk-[A-Za-z0-9_-]{8,}"),
    re.compile(r"(?i)bearer\s+[A-Za-z0-9._~+/=-]{8,}"),
    re.compile(r"(?i)basic\s+[A-Za-z0-9+/=]{8,}"),
    re.compile(r"(?i)(api[_-]?key|token|secret)\s*=\s*\S+"),
]
_FS_UNSAFE_RE = re.compile(r"[^A-Za-z0-9._-]+")


def sanitize_property_value(value):
    if value is None or isinstance(value, _PRIMITIVES):
        return value
    if isinstance(value, Sequence) and not isinstance(value, (str, bytes)):
        items = list(value)
        if items and all(isinstance(x, _PRIMITIVES) for x in items) and len({type(x) for x in items}) == 1:
            return items  # homogeneous primitive list passes through
        return json.dumps(items, sort_keys=True, default=str)
    if isinstance(value, Mapping):
        return json.dumps(dict(value), sort_keys=True, default=str)
    return str(value)


def sanitize_properties(props: dict) -> dict:
    return {str(k): sanitize_property_value(v) for k, v in props.items()}


def strip_code_fence(text: str) -> str:
    m = _FENCE_RE.match(text)
    return m.group(1) if m else text


def sanitize_text(text: str, replacement: str = "***") -> str:
    out = text
    for rx in _SECRET_VALUE_RES:
        out = rx.sub(replacement, out)
    return out


def scrub_object(obj, replacement: str = "***", _path: set | None = None):
    """Deep redaction by key-name heuristic + value regexes; cycle-safe.

    Cycle detection tracks ids on the *current recursion path* only
    (added on entry, discarded on exit), so a container shared in two
    places (a DAG, not a cycle) is scrubbed normally in both — only a
    true cycle is replaced."""
    path = _path if _path is not None else set()
    oid = id(obj)
    if isinstance(obj, (dict, list, tuple)):
        if oid in path:
            return replacement
        path.add(oid)
    try:
        if isinstance(obj, Mapping):
            return {
                k: (replacement if _SECRET_KEY_RE.search(str(k)) else scrub_object(v, replacement, path))
                for k, v in obj.items()
            }
        if isinstance(obj, (list, tuple)):
            return type(obj)(scrub_object(v, replacement, path) for v in obj)
    finally:
        path.discard(oid)
    if isinstance(obj, str):
        return sanitize_text(obj, replacement)
    return obj


def mask_base_url(url: str) -> str:
    """Keep scheme+host, mask path/query/userinfo (sanitizer.py:66-85)."""
    m = re.match(r"^([a-z][a-z0-9+.-]*://)(?:[^/@]*@)?([^/?#]+)(.*)$", url, re.IGNORECASE)
    if not m:
        return url
    scheme, host, rest = m.groups()
    return f"{scheme}{host}/***" if rest and rest not in ("", "/") else f"{scheme}{host}"


def fs_safe_name(name: str, max_len: int = 120) -> str:
    safe = _FS_UNSAFE_RE.sub("-", name).strip("-.")
    return (safe or "unnamed")[:max_len]


def token_estimate(text: str) -> int:
    """``max(1, ceil(len/4))``; empty text → 0 (reference
    ``evaluator.py:353-358``)."""
    if not text:
        return 0
    return max(1, math.ceil(len(text) / 4))
