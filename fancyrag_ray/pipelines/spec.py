"""Declarative pipeline spec — the user-extension surface.

Parity (SURVEY §2.10): the reference exposes (a) named chunking profiles,
(b) a dependency-injected phase API, and (c) a declarative YAML DAG of
components with dotted class paths (``pipelines/kg_ingest.yaml:40-94``).
Here the equivalent is a JSON/dict spec compiled onto Dataset stages:

    spec = {
      "profile": "text",
      "stages": [
        {"stage": "chunk"},
        {"stage": "extract", "options": {"emit_cooccurrence": true}},
        {"stage": "link"},
        {"stage": "materialize"},
      ],
    }
    result = run_spec(docs, spec, alias_table=aliases)

Custom stages register via ``register_stage`` (the "pipeline-step
plugin" surface): any callable ``(ctx, dataset, **options) -> dataset``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data as rd

from ..config import PROFILES, PipelineConfig
from ..schema import DEFAULT_SCHEMA, GraphSchema


@dataclass
class SpecContext:
    cfg: PipelineConfig
    schema: GraphSchema
    alias_table: pa.Table | None
    outputs: dict[str, Any] = field(default_factory=dict)


_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str):
    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = fn
        return fn

    return deco


@register_stage("filter_valid")
def _filter_valid(ctx: SpecContext, ds: rd.Dataset, **options) -> rd.Dataset:
    from ..sources.io import valid_interleaved_docs

    return ds.map_batches(valid_interleaved_docs, batch_format="pyarrow")


@register_stage("chunk")
def _chunk(ctx: SpecContext, ds: rd.Dataset, **options) -> rd.Dataset:
    from .kg_build import build_chunks

    out = build_chunks(ds, ctx.cfg)
    ctx.outputs["chunks"] = out
    return out


@register_stage("embed")
def _embed(ctx: SpecContext, ds: rd.Dataset, **options) -> rd.Dataset:
    from .kg_build import build_embeddings

    out = build_embeddings(ds, ctx.cfg)
    ctx.outputs["embeddings"] = out
    return ds  # embeddings are a side output; the main line continues


@register_stage("extract")
def _extract(ctx: SpecContext, ds: rd.Dataset, **options) -> rd.Dataset:
    from .kg_build import build_triples

    out = build_triples(ds, ctx.cfg, ctx.schema, emit_cooccurrence=bool(options.get("emit_cooccurrence")))
    ctx.outputs["triples"] = out
    return out


@register_stage("link")
def _link(ctx: SpecContext, ds: rd.Dataset, **options) -> rd.Dataset:
    from .kg_build import link_triples

    out = link_triples(ds, ctx.alias_table, ctx.cfg)
    ctx.outputs["linked"] = out
    return out


@register_stage("materialize")
def _materialize(ctx: SpecContext, ds: rd.Dataset, **options) -> rd.Dataset:
    from ..stages.materialize import edges_from_linked_triples, nodes_from_linked_triples

    linked = ds.materialize()
    ctx.outputs["linked"] = linked
    ctx.outputs["nodes"] = nodes_from_linked_triples(linked)
    ctx.outputs["edges"] = edges_from_linked_triples(linked)
    return linked


def run_spec(
    docs: rd.Dataset,
    spec: dict,
    alias_table: pa.Table | None = None,
    schema: GraphSchema = DEFAULT_SCHEMA,
) -> dict[str, Any]:
    """Compile and run a declarative spec; returns named stage outputs."""
    profile = PROFILES[spec.get("profile", "text")]
    cfg_kwargs = dict(spec.get("config", {}))
    cfg = PipelineConfig(profile=profile, **cfg_kwargs)
    ctx = SpecContext(cfg=cfg, schema=schema, alias_table=alias_table)
    ds = docs
    for step in spec.get("stages", []):
        name = step["stage"]
        if name not in _REGISTRY:
            raise ValueError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}")
        ds = _REGISTRY[name](ctx, ds, **step.get("options", {}))
    ctx.outputs.setdefault("result", ds)
    return ctx.outputs
