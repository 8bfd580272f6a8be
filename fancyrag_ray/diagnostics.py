"""Workspace + model-readiness diagnostics (reference parity:
``src/cli/diagnostics.py:516-580`` — ``workspace`` validates importable
dependencies and writes ``artifacts/environment/versions.json``;
``openai-probe`` runs a chat + embedding readiness probe and writes
``artifacts/openai/probe.json`` + ``metrics.prom``).

Ray-native reshaping: the dependency list is this engine's stack (ray /
pyarrow / pandas / numpy / duckdb), the probe drives ``SharedModelClient``
(same retry/backoff/fallback policy the extraction stage uses) plus one
``HashEmbedder`` batch with the dim guardrail, and every artifact goes
through the sanitized run-log sink (S10). ``--skip-live`` is the default
transport choice in-sandbox: the deterministic fake exercises the whole
client path, and a real HTTP transport drops into the same
``transport(model, payload)`` slot.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import platform
import sys
import time
from typing import Any, Callable, Iterable

REQUIRED_MODULES: list[str] = ["ray", "pyarrow", "pandas", "numpy", "duckdb"]
OPTIONAL_MODULES: list[str] = ["polars", "pytest", "hypothesis", "lance", "PIL", "soundfile"]

DEFAULT_REPORT_PATH = os.path.join("artifacts", "environment", "versions.json")
DEFAULT_PROBE_DIR = os.path.join("artifacts", "model")

PROBE_TEXT = "Acme Corp launched Widget. DOC_ID: probe\nCHUNK_SEQ: 1\nTEXT:\nAcme Corp launched Widget."


class DependencyError(RuntimeError):
    """A required module cannot be imported (reference DependencyError)."""


def _module_status(name: str) -> dict[str, Any]:
    try:
        mod = importlib.import_module(name)
    except Exception as exc:  # noqa: BLE001 — report, don't crash
        return {"importable": False, "error": f"{type(exc).__name__}: {exc}"}
    version = getattr(mod, "__version__", None)
    if version is None:
        try:
            import importlib.metadata as md

            version = md.version(name)
        except Exception:
            version = "unknown"
    return {"importable": True, "version": str(version)}


def check_workspace(root: str = ".", write_report: bool = True, output: str | None = None) -> dict:
    """Validate the engine's dependency stack and runtime environment.

    Returns the report dict; raises DependencyError if any REQUIRED
    module is missing (after writing the report, so the artifact shows
    WHAT was missing — reference behavior: report then fail).
    """
    from .state.manifest import resolve_git_commit, write_run_log

    modules = {name: _module_status(name) for name in REQUIRED_MODULES}
    optional = {name: _module_status(name) for name in OPTIONAL_MODULES}
    missing = sorted(n for n, s in modules.items() if not s["importable"])

    cluster: dict[str, Any] = {"initialized": False}
    try:
        import ray

        if ray.is_initialized():
            res = ray.cluster_resources()
            cluster = {
                "initialized": True,
                "cpus": res.get("CPU"),
                "object_store_bytes": res.get("object_store_memory"),
                "nodes": len([n for n in ray.nodes() if n.get("Alive")]),
            }
    except Exception:
        pass

    report = {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "failed" if missing else "success",
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "git_commit": resolve_git_commit(root),
        "modules": modules,
        "optional_modules": optional,
        "missing": missing,
        "ray_cluster": cluster,
    }
    if write_report:
        path = output or os.path.join(root, DEFAULT_REPORT_PATH)
        write_run_log(path, report)
        report["report_path"] = path
    if missing:
        raise DependencyError(f"missing required modules: {', '.join(missing)}")
    return report


def run_model_probe(
    root: str = ".",
    artifacts_dir: str | None = None,
    transport: Callable | None = None,
    skip_live: bool = True,
    max_attempts: int = 3,
    backoff_seconds: float = 0.5,
    expected_dim: int = 64,
) -> dict:
    """Model readiness probe: one extraction-shaped chat call through
    ``SharedModelClient`` (full retry/backoff/fallback policy) and one
    embedding batch with the dim guardrail, summarized with latency and
    client telemetry. ``skip_live`` (always true in-sandbox — no
    network) routes the chat call through the deterministic fake
    transport; a caller with a real endpoint passes ``transport=`` and
    ``skip_live=False``.
    """
    import pyarrow as pa

    from .stages.embedder import HashEmbedder, validate_embedding_dim
    from .stages.llm_client import RetryPolicy, SharedModelClient, TransportError
    from .state.manifest import write_run_log

    art = artifacts_dir or os.path.join(root, DEFAULT_PROBE_DIR)
    if transport is None:
        if not skip_live:
            raise ValueError("no live transport available: pass transport= or skip_live=True")
        from .stages.fake_llm import DeterministicLlmTransport

        transport = DeterministicLlmTransport()

    policy = RetryPolicy(max_attempts=max_attempts, base_backoff_s=backoff_seconds)
    client = SharedModelClient(transport, model="probe-model", fallback_model="probe-fallback", policy=policy, sleep=lambda _s: None)

    chat: dict[str, Any]
    t0 = time.perf_counter()
    try:
        raw = client.call({"messages": [{"role": "user", "content": PROBE_TEXT}]})
        chat = {
            "status": "success",
            "latency_ms": round((time.perf_counter() - t0) * 1000, 3),
            "response_bytes": len(json.dumps(raw, default=str)),
        }
    except (TransportError, Exception) as exc:  # noqa: BLE001
        chat = {
            "status": "failed",
            "latency_ms": round((time.perf_counter() - t0) * 1000, 3),
            "error": f"{type(exc).__name__}: {exc}",
            "remediation": "check endpoint credentials / model name; the client already retried "
            f"{max_attempts} times with exponential backoff",
        }

    t1 = time.perf_counter()
    emb = HashEmbedder(dim=expected_dim, text_col="text", keep_cols=("chunk_uid",))
    batch = emb(pa.table({"chunk_uid": ["probe"], "text": ["probe embedding readiness"]}))
    validate_embedding_dim(batch, expected_dim)
    vec_len = len(batch.column("embedding")[0].as_py())
    embedding = {
        "status": "success",
        "expected_dimensions": expected_dim,
        "vector_length": vec_len,
        "latency_ms": round((time.perf_counter() - t1) * 1000, 3),
    }

    report = {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": chat["status"],
        "skip_live": skip_live,
        "chat": chat,
        "embedding": embedding,
        "client_metrics": client.metrics.as_dict(),
    }
    write_run_log(os.path.join(art, "probe.json"), report)

    # Prometheus text exposition of the client counters (reference
    # writes metrics.prom beside probe.json)
    m = client.metrics.as_dict()
    lines = []
    for key in ("calls", "retries", "failures", "fallbacks"):
        lines.append(f"# TYPE model_probe_{key}_total counter")
        lines.append(f"model_probe_{key}_total {m[key]}")
    lines.append("# TYPE model_probe_latency_ms_total counter")
    lines.append(f"model_probe_latency_ms_total {m['latency_ms_total']}")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "metrics.prom"), "w") as f:
        f.write("\n".join(lines) + "\n")
    report["artifacts_dir"] = art
    return report


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fancyrag_ray workspace diagnostics")
    sub = p.add_subparsers(dest="command", required=True)

    w = sub.add_parser("workspace", help="Validate engine dependencies")
    w.add_argument("--root", default=".")
    w.add_argument("--no-report", action="store_true")
    w.add_argument("--output", default=None)

    pr = sub.add_parser("model-probe", help="Model client readiness probe")
    pr.add_argument("--root", default=".")
    pr.add_argument("--artifacts-dir", default=None)
    # default: no live call (no network in this environment); --live
    # turns the real probe on when a transport exists
    pr.add_argument("--live", dest="skip_live", action="store_false", default=True,
                    help="attempt a live model call instead of the offline probe")
    pr.add_argument("--max-attempts", type=int, default=3)
    pr.add_argument("--backoff-seconds", type=float, default=0.5)
    return p


def main(argv: Iterable[str] | None = None) -> int:
    args = _build_parser().parse_args(list(argv) if argv is not None else None)
    try:
        if args.command == "workspace":
            report = check_workspace(args.root, write_report=not args.no_report, output=args.output)
        else:
            report = run_model_probe(
                args.root,
                artifacts_dir=args.artifacts_dir,
                skip_live=args.skip_live,
                max_attempts=args.max_attempts,
                backoff_seconds=args.backoff_seconds,
            )
    except DependencyError as exc:
        print(json.dumps({"status": "failed", "error": str(exc)}))
        return 1
    print(json.dumps(report, default=str))
    return 0 if report["status"] == "success" else 1


if __name__ == "__main__":
    raise SystemExit(main())
