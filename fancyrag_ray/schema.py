"""Closed-world graph schema.

Parity: the reference's declarative JSON ``GraphSchema``
(``scripts/config/kg_schema.json:1-22``, validated at
``src/fancyrag/kg/pipeline.py:437-465``): fixed node labels, relationship
types and (subject_label, predicate, object_label) patterns, with
``additional_* : false`` (no out-of-schema output may survive extraction).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class GraphSchema:
    node_types: tuple[str, ...]
    relationship_types: tuple[str, ...]
    patterns: tuple[tuple[str, str, str], ...]  # (subj_label, pred, obj_label)
    additional_node_types: bool = False
    additional_relationship_types: bool = False
    additional_patterns: bool = False
    _pattern_set: frozenset = field(init=False, repr=False, default=None)

    def __post_init__(self) -> None:
        labels = set(self.node_types)
        for s, p, o in self.patterns:
            if p not in self.relationship_types:
                raise ValueError(f"pattern predicate {p!r} not a declared relationship type")
            if s not in labels or o not in labels:
                raise ValueError(f"pattern labels ({s!r},{o!r}) not declared node types")
        object.__setattr__(self, "_pattern_set", frozenset(self.patterns))

    def allows(self, subj_label: str, pred: str, obj_label: str) -> bool:
        """Closed-world pattern check applied to every extracted triple."""
        if (subj_label, pred, obj_label) in self._pattern_set:
            return True
        return bool(
            self.additional_patterns
            and (self.additional_relationship_types or pred in self.relationship_types)
            and (self.additional_node_types or (subj_label in self.node_types and obj_label in self.node_types))
        )

    @classmethod
    def from_json(cls, path: str | Path) -> "GraphSchema":
        raw = json.loads(Path(path).read_text())
        return cls(
            node_types=tuple(t["label"] if isinstance(t, dict) else t for t in raw["node_types"]),
            relationship_types=tuple(
                t["label"] if isinstance(t, dict) else t for t in raw["relationship_types"]
            ),
            patterns=tuple(tuple(p) for p in raw["patterns"]),
            additional_node_types=bool(raw.get("additional_node_types", False)),
            additional_relationship_types=bool(raw.get("additional_relationship_types", False)),
            additional_patterns=bool(raw.get("additional_patterns", False)),
        )


# The reference's shipped schema (scripts/config/kg_schema.json) re-declared.
DEFAULT_SCHEMA = GraphSchema(
    node_types=("Document", "Chunk", "Company", "Product", "Operator", "Term"),
    relationship_types=("HAS_CHUNK", "LAUNCHED", "INGESTED_BY", "CO_OCCURS"),
    patterns=(
        ("Document", "HAS_CHUNK", "Chunk"),
        ("Company", "LAUNCHED", "Product"),
        ("Document", "INGESTED_BY", "Operator"),
        ("Term", "CO_OCCURS", "Term"),
    ),
)
