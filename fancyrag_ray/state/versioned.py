"""Crash-safe versioned directory store — the ONE copy of the
commit protocol shared by the incremental graph store
(``pipelines/compact.IncrementalStore``) and the cross-run dedup
seen-key store (``pipelines/ingest_dedup.SeenKeyStore``).

Layout: ``<root>/versions/v00001, v00002, …`` (immutable once
committed) + ``<root>/CURRENT`` (the only mutable file — a one-line
pointer to the live version). Each version carries a
``journal.json`` with at least ``{"version": N, "ingests": [...]}``
(the idempotency log) plus store-specific layout fields.

Commit sequence (``commit()``), crash-safe at every step:
  1. caller fills a ``.staging-v{N}`` directory (``begin()``);
  2. ``journal.json`` is written INTO the staging dir;
  3. staging renames to ``v{N}`` (same filesystem, atomic);
  4. the ``CURRENT`` pointer flips via write-tmp + ``os.replace`` —
     THE commit point: a crash before it leaves the old version
     live and the half-built one unreferenced;
  5. unreferenced versions are garbage-collected.

Reference parity: this replaces the transactionality FancyRAG gets
for free from Neo4j (``ingest_run_key`` tagging + rollback,
``src/fancyrag/kg/pipeline.py:1452``, ``db/neo4j_queries.py:122-180``).
"""

from __future__ import annotations

import json
import os
import shutil


class VersionedStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "versions"), exist_ok=True)

    # -- pointer / journal --------------------------------------------------

    def _current_name(self) -> str | None:
        cur = os.path.join(self.root, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip() or None

    def current_dir(self) -> str | None:
        name = self._current_name()
        return os.path.join(self.root, "versions", name) if name else None

    def journal(self) -> dict | None:
        d = self.current_dir()
        if d is None:
            return None
        with open(os.path.join(d, "journal.json")) as f:
            return json.load(f)

    def ingested_keys(self) -> list[str]:
        meta = self.journal()
        return list(meta["ingests"]) if meta else []

    # -- two-phase commit ---------------------------------------------------

    def begin(self, version: int) -> str:
        """Fresh staging directory for ``version`` (clears any remnant
        of a crashed earlier attempt)."""
        stage = os.path.join(self.root, "versions", f".staging-v{version:05d}")
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        return stage

    def commit(self, stage: str, version: int, journal: dict) -> None:
        with open(os.path.join(stage, "journal.json"), "w") as f:
            json.dump(journal, f, sort_keys=True)
        final = os.path.join(self.root, "versions", f"v{version:05d}")
        shutil.rmtree(final, ignore_errors=True)  # stale crashed attempt
        os.rename(stage, final)
        tmp = os.path.join(self.root, ".CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"v{version:05d}")
            # fsync the pointer BEFORE the rename and the directory AFTER:
            # without both, a power loss can persist the old-version GC
            # below while the un-synced pointer flip does not, leaving
            # CURRENT referencing a deleted directory (process crashes
            # were already safe — this closes the power-loss window)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.root, "CURRENT"))  # THE commit point
        dir_fd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        self._gc(keep=f"v{version:05d}")

    def _gc(self, keep: str) -> None:
        vroot = os.path.join(self.root, "versions")
        for name in os.listdir(vroot):
            if name != keep:
                shutil.rmtree(os.path.join(vroot, name), ignore_errors=True)
