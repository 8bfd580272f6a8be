"""Per-partition lineage manifests → checkpoint / resume.

Replaces the reference's transactional compensation (tag every row with
``ingest_run_key``, delete on failure — ``pipeline.py:1452,876-906``,
``neo4j_queries.py:122-180``) with the batch-native scheme: each input
partition writes its stage output to its own directory, then appends a
manifest record {partition_id, rows, checksum, status}. Resume = set
difference of input partitions vs completed manifest records; a failed
run simply never commits its record ("don't commit the manifest" instead
of rollback). Writes are atomic (tmp file + ``os.replace``).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionRecord:
    partition_id: str
    status: str  # "done" | "failed"
    rows: int = 0
    checksum: str = ""
    extra: dict = field(default_factory=dict)


def write_run_log(path: str, payload: dict) -> str:
    """Sanitized structured run log (reference S10, ``pipeline.py:1530-1534``):
    secrets scrubbed by key/value heuristics, written atomically."""
    from ..functions.sanitize import scrub_object

    clean = scrub_object(payload)
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".runlog-")
    with os.fdopen(fd, "w") as f:
        json.dump(clean, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, path)
    return path


def resolve_git_commit(repo_dir: str = ".") -> str:
    """Once-per-run provenance scalar (reference M5, ``pipeline.py:471-487``);
    broadcast as a constant column by ``annotate_provenance``."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir, capture_output=True, text=True, timeout=10
        )
        return out.stdout.strip() if out.returncode == 0 else "unknown"
    except Exception:
        return "unknown"


class Manifest:
    """JSONL manifest of completed partitions, one per output table dir."""

    def __init__(self, path: str):
        self.path = path
        self.records: dict[str, PartitionRecord] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = PartitionRecord(**json.loads(line))
                    self.records[rec.partition_id] = rec

    def completed(self) -> set[str]:
        return {p for p, r in self.records.items() if r.status == "done"}

    def pending(self, all_partitions: list[str]) -> list[str]:
        done = self.completed()
        return [p for p in all_partitions if p not in done]

    def commit(self, rec: PartitionRecord) -> None:
        """Atomically append a record (rewrite via tmp + rename)."""
        self.records[rec.partition_id] = rec
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-")
        try:
            with os.fdopen(fd, "w") as f:
                for r in self.records.values():
                    f.write(json.dumps(asdict(r), sort_keys=True) + "\n")
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
