"""Entity linker — stateful actor pool holding a broadcast alias index.

Parity+extension: the reference resolves entities only by exact
single-property match (``SinglePropertyExactMatchResolver``,
``pipelines/kg_ingest.yaml:69-77``); the north rule extends this to an
alias/embedding index hosted on stateful actors. Design:

  * the alias table (canonical_id, label, name, aliases) is small
    relative to the corpus → ``ray.put`` ONCE on the driver; every actor
    materializes the lookup dict in ``__init__`` from the shared object
    (zero re-shipping per batch, no shuffle join);
  * lookup key is ``(label, casefolded whitespace-normalized surface)``;
  * unknown surfaces get a deterministic content-hash entity id from
    ``(label, normalized surface)`` — so exact-match resolution of
    unseen entities (same name ⇒ same id) is built into the id itself,
    and partition retries are idempotent.

Output adds: subj_id, subj_canonical, obj_id, obj_canonical, link_score
(1.0 exact canonical-name hit, 0.9 alias hit, 0.5 unknown/self-link).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray

_WS = re.compile(r"\s+")


def normalize_surface(s: str) -> str:
    return _WS.sub(" ", s.strip()).casefold()


def synth_entity_id(label: str, norm_name: str) -> str:
    return "x-" + hashlib.sha256(f"{label}\x00{norm_name}".encode()).hexdigest()[:16]


def build_alias_index(aliases: pa.Table) -> dict[tuple[str, str], tuple[str, str, float]]:
    """(label, norm_surface) → (canonical_id, canonical_name, score)."""
    idx: dict[tuple[str, str], tuple[str, str, float]] = {}
    ids = aliases.column("canonical_id").to_pylist()
    labels = aliases.column("label").to_pylist()
    names = aliases.column("name").to_pylist()
    al = aliases.column("aliases").to_pylist()
    for cid, label, name, alist in zip(ids, labels, names, al):
        idx[(label, normalize_surface(name))] = (cid, name, 1.0)
        for a in alist or []:
            key = (label, normalize_surface(a))
            idx.setdefault(key, (cid, name, 0.9))
    return idx


class AliasLinker:
    """map_batches actor: resolve triple subject/object surfaces."""

    def __init__(self, index_ref=None, index: dict | None = None):
        # index_ref: ray.ObjectRef of the prebuilt dict (broadcast once).
        if index is not None:
            self.index = index
        elif index_ref is not None:
            self.index = ray.get(index_ref)
        else:
            self.index = {}

    def _resolve(self, label: str, surface: str) -> tuple[str, str, float]:
        norm = normalize_surface(surface)
        hit = self.index.get((label, norm))
        if hit is not None:
            return hit
        return (synth_entity_id(label, norm), surface, 0.5)

    def __call__(self, batch: pa.Table) -> pa.Table:
        slabs = batch.column("subj_label").to_pylist()
        subjs = batch.column("subj").to_pylist()
        olabs = batch.column("obj_label").to_pylist()
        objs = batch.column("obj").to_pylist()
        s_id, s_canon, o_id, o_canon, score = [], [], [], [], []
        for sl, s, ol, o in zip(slabs, subjs, olabs, objs):
            sid, scan, ss = self._resolve(sl, s)
            oid, ocan, os_ = self._resolve(ol, o)
            s_id.append(sid)
            s_canon.append(scan)
            o_id.append(oid)
            o_canon.append(ocan)
            score.append(min(ss, os_))
        out = batch
        for name, vals, typ in (
            ("subj_id", s_id, pa.string()),
            ("subj_canonical", s_canon, pa.string()),
            ("obj_id", o_id, pa.string()),
            ("obj_canonical", o_canon, pa.string()),
            ("link_score", score, pa.float32()),
        ):
            out = out.append_column(name, pa.array(vals, type=typ))
        return out
