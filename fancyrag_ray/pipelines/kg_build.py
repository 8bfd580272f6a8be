"""Flagship KG-construction pipeline (the reference's
``splitter → embedder → extractor → writer → resolver_exact`` DAG,
``pipelines/kg_ingest.yaml:40-94``, re-expressed as a streaming
``ray.data.Dataset`` pipeline).

    documents ──chunker──► chunks ──┬─embedder──► chunk_embeddings
                                    └─extractor─► triples
    triples ──linker──► linked ──┬─► nodes   (groupby entity_id)
                                 └─► edges   (groupby (src,type,dst))
    chunks ────────────────────────► has_chunk edges (no shuffle)

Stages share ONE streaming execution per consumed output; nothing
materializes the full corpus on the driver. The resumable variant
processes the per-document phase partition-by-partition (at scale a
partition = a Lance fragment / input file) with lineage manifests, then
runs the global canonicalization + materialization over the union of
completed partition outputs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import ray
import ray.data as rd

from ..config import PipelineConfig
from ..schema import DEFAULT_SCHEMA, GraphSchema
from ..sources.io import read_table, write_table
from ..stages.chunker import make_chunker
from ..stages.embedder import HashEmbedder
from ..stages.extractor import RuleExtractor
from ..stages.linker import AliasLinker, build_alias_index
from ..stages.materialize import edges_from_linked_triples, has_chunk_edges, nodes_from_linked_triples
from ..state.manifest import Manifest, PartitionRecord


@dataclass
class KgBuildResult:
    chunks: rd.Dataset
    embeddings: rd.Dataset
    triples: rd.Dataset
    linked: rd.Dataset
    nodes: rd.Dataset
    edges: rd.Dataset


def build_chunks(docs: rd.Dataset, cfg: PipelineConfig) -> rd.Dataset:
    return docs.map_batches(
        make_chunker(cfg.profile), batch_format="pyarrow", batch_size=cfg.chunk_batch_size
    )


# Worker-global lazy state for task-mode stages: plain-function
# map_batches tasks reuse warm Ray worker processes, so state built once
# per process amortizes like actor state WITHOUT per-pipeline actor
# startup (~1-2 s × pool size × phase, the dominant fixed cost of short
# phases). Actor-pool mode remains for heavy backends (real models,
# rate-limited clients) where per-actor lifecycle control matters.
_WORKER_STATE: dict = {}


def build_embeddings(chunks: rd.Dataset, cfg: PipelineConfig, mode: str = "tasks") -> rd.Dataset:
    if mode == "actors":
        # Autoscaling pool with a warm floor of half the max: a floor of
        # 1 never ramps during short phases; a fixed pool of N can pin
        # every CPU while idle and starve the upstream read into a
        # deadlock (both observed live).
        return chunks.map_batches(
            HashEmbedder,
            fn_constructor_kwargs={"dim": cfg.embed_dim, "seed": cfg.embed_seed},
            batch_format="pyarrow",
            batch_size=cfg.embed_batch_size,
            concurrency=(max(1, cfg.embed_concurrency // 2), cfg.embed_concurrency),
            num_cpus=1,
        )
    dim, seed = cfg.embed_dim, cfg.embed_seed

    def embed(batch):
        key = ("embedder", dim, seed)
        st = _WORKER_STATE.get(key)
        if st is None:
            st = _WORKER_STATE[key] = HashEmbedder(dim=dim, seed=seed)
        return st(batch)

    return chunks.map_batches(embed, batch_format="pyarrow", batch_size=cfg.embed_batch_size)


def build_triples(
    chunks: rd.Dataset,
    cfg: PipelineConfig,
    schema: GraphSchema = DEFAULT_SCHEMA,
    emit_cooccurrence: bool = False,
    mode: str = "tasks",
) -> rd.Dataset:
    projected = chunks.select_columns(["doc_id", "chunk_uid", "seq", "text"])
    if mode == "actors":
        return projected.map_batches(
            RuleExtractor,
            fn_constructor_kwargs={"schema": schema, "emit_cooccurrence": emit_cooccurrence},
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=(max(1, cfg.extract_concurrency // 2), cfg.extract_concurrency),
            num_cpus=1,
        )

    def extract(batch):
        key = ("extractor", id(schema), emit_cooccurrence)
        st = _WORKER_STATE.get(key)
        if st is None:
            st = _WORKER_STATE[key] = RuleExtractor(schema=schema, emit_cooccurrence=emit_cooccurrence)
        return st(batch)

    return projected.map_batches(extract, batch_format="pyarrow", batch_size=cfg.extract_batch_size)


def link_triples(
    triples: rd.Dataset, alias_table: pa.Table | None, cfg: PipelineConfig, mode: str = "tasks"
) -> rd.Dataset:
    index = build_alias_index(alias_table) if alias_table is not None else {}
    index_ref = ray.put(index)  # broadcast ONCE; workers/actors read it once
    if mode == "actors":
        return triples.map_batches(
            AliasLinker,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=(1, cfg.extract_concurrency),
            num_cpus=1,
        )

    def link(batch):
        key = ("linker", index_ref.hex())
        st = _WORKER_STATE.get(key)
        if st is None:
            st = _WORKER_STATE[key] = AliasLinker(index_ref=index_ref)
        return st(batch)

    return triples.map_batches(link, batch_format="pyarrow", batch_size=cfg.extract_batch_size)


def run_kg_build(
    docs: rd.Dataset | str,
    alias_table: pa.Table | None = None,
    cfg: PipelineConfig | None = None,
    schema: GraphSchema = DEFAULT_SCHEMA,
    emit_cooccurrence: bool = False,
) -> KgBuildResult:
    """Single-pass flagship build. ``docs`` is a Dataset in the interleaved
    shape (doc_id, spans) or a path to one."""
    cfg = cfg or PipelineConfig()
    if isinstance(docs, str):
        docs = read_table(docs)
    chunks = build_chunks(docs, cfg)
    embeddings = build_embeddings(chunks, cfg)
    triples = build_triples(chunks, cfg, schema, emit_cooccurrence=emit_cooccurrence)
    linked = link_triples(triples, alias_table, cfg)
    nodes = nodes_from_linked_triples(linked)
    edges = edges_from_linked_triples(linked)
    return KgBuildResult(chunks, embeddings, triples, linked, nodes, edges)


def _append_doc_key(t: pa.Table) -> pa.Table:
    """Content key per document: sha256 over the ordered span sequence
    (kind, text, media_ref) — the per-row invariant fields — so a
    re-crawled doc with identical content keys identically regardless of
    which dump/partition it arrives in."""
    import hashlib

    keys = []
    for spans in t.column("spans").to_pylist():
        h = hashlib.sha256()
        for s in spans or []:
            h.update(f"{s.get('kind')}\x1f{s.get('text')}\x1f{s.get('media_ref')}\x1e".encode())
        keys.append(h.hexdigest())
    return t.append_column("doc_key", pa.array(keys, pa.string()))


def run_partition(
    docs_file: str | list[str],
    out_dir: str,
    partition_id: str,
    cfg: PipelineConfig,
    schema: GraphSchema = DEFAULT_SCHEMA,
    alias_table: pa.Table | None = None,
    seen_store=None,
) -> dict[str, int]:
    """Per-document phase for ONE input partition (file/fragment): chunk,
    embed, extract, link; outputs land under ``{out_dir}/{table}/{pid}/``.

    Crash-safe: all three tables are written under ``{out_dir}/_tmp/…``
    first, then renamed into place atomically (per table) immediately
    before the caller commits the manifest record. Ray's write_parquet
    APPENDS part files, so re-writing into a half-written directory from
    a previous crash would double rows — stale final dirs are removed
    before the rename, and the tmp root keeps partials out of the global
    phase's ``read_table(out_dir/linked)`` glob."""
    import shutil

    docs = read_table(docs_file)
    tmp_root = os.path.join(out_dir, "_tmp", partition_id)
    shutil.rmtree(tmp_root, ignore_errors=True)
    tables = ("chunks", "embeddings", "linked") + (("dockeys",) if seen_store is not None else ())
    tmp = {t: os.path.join(tmp_root, t) for t in tables}
    final = {t: os.path.join(out_dir, t, partition_id) for t in tmp}

    n_skipped = 0
    if seen_store is not None:
        # cross-run dedup BEFORE the expensive stages (embed/extract):
        # already-seen content costs a bucket-pruned key lookup, nothing
        # more. The fresh keys are persisted with the partition and
        # ingested by the caller AFTER the manifest commit (idempotent
        # under the partition id), so a crash between the two heals.
        n_in = docs.count()
        keyed = docs.map_batches(_append_doc_key, batch_format="pyarrow")
        fresh = keyed if n_in == 0 else seen_store.filter_fresh(keyed, order_col="doc_id").materialize()
        n_fresh = fresh.count()
        n_skipped = n_in - n_fresh
        if n_fresh == 0:
            # every doc already ingested: commit empty table dirs so the
            # rename/manifest protocol and the global-phase glob (which
            # tolerates file-less partition dirs) proceed unchanged
            for t in tables:
                os.makedirs(tmp[t], exist_ok=True)
            for t in tmp:
                shutil.rmtree(final[t], ignore_errors=True)
                os.makedirs(os.path.dirname(final[t]), exist_ok=True)
                os.rename(tmp[t], final[t])
            shutil.rmtree(tmp_root, ignore_errors=True)
            return {"chunks": 0, "linked": 0, "docs_skipped": n_skipped}
        write_table(fresh.select_columns(["doc_key"]), tmp["dockeys"])
        docs = fresh.drop_columns(["doc_key"])

    chunks = build_chunks(docs, cfg)
    write_table(chunks, tmp["chunks"])
    # re-read the partition's chunks so embed/extract stream from disk
    chunks_pq = read_table(tmp["chunks"])
    write_table(build_embeddings(chunks_pq, cfg), tmp["embeddings"])
    linked = link_triples(build_triples(chunks_pq, cfg, schema), alias_table, cfg)
    write_table(linked, tmp["linked"])
    counts = {
        "chunks": read_table(tmp["chunks"]).count(),
        "linked": read_table(tmp["linked"]).count(),
        "docs_skipped": n_skipped,
    }
    for t in tmp:
        shutil.rmtree(final[t], ignore_errors=True)  # stale partial from a crashed run
        os.makedirs(os.path.dirname(final[t]), exist_ok=True)
        os.rename(tmp[t], final[t])
    shutil.rmtree(tmp_root, ignore_errors=True)
    return counts


def annotate_provenance(ds: rd.Dataset, **constants) -> rd.Dataset:
    """Stamp constant provenance columns (git_commit, run profile, …) on
    every row — reference M5/M9 semantics (``pipeline.py:471-487,568-611``):
    provenance rides the row, no join needed downstream."""
    import pyarrow as _pa

    def stamp(batch: _pa.Table) -> _pa.Table:
        for k, v in constants.items():
            batch = batch.append_column(k, _pa.array([v] * batch.num_rows))
        return batch

    return ds.map_batches(stamp, batch_format="pyarrow")


def run_kg_build_incremental(
    docs_files: list[str],
    out_dir: str,
    cfg: PipelineConfig | None = None,
    schema: GraphSchema = DEFAULT_SCHEMA,
    alias_table: pa.Table | None = None,
    fail_after: int | None = None,
    n_buckets: int = 64,
) -> dict:
    """Resumable build whose global phase is O(delta): each completed
    partition's node/edge partials are MERGE-compacted into a
    transactionally versioned :class:`~fancyrag_ray.pipelines.compact.
    IncrementalStore` under its partition id as the idempotency key, so

      * a resume recompacts NOTHING already journaled (the plain
        ``run_kg_build_resumable`` re-reduces every partition's linked
        output on every run — O(total) per resume);
      * a crash anywhere leaves the store on its previous version
        (single atomic CURRENT-pointer flip per ingest) and the next
        run replays only the unjournaled partitions;
      * the final store equals the one-pass build exactly (associative
        merges; asserted in tests).
    """
    from ..stages.materialize import edges_from_linked_triples, nodes_from_linked_triples
    from .compact import IncrementalStore

    cfg = cfg or PipelineConfig()
    if not docs_files:
        raise ValueError("no source partitions matched — nothing to ingest")
    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    store = IncrementalStore(os.path.join(out_dir, "store"), n_buckets=n_buckets)
    partitions = [(f"p{idx:05d}", f) for idx, f in enumerate(docs_files)]
    pending = manifest.pending([p for p, _ in partitions])
    ingested = set(store.ingested_keys())
    done_count = 0
    for pid, path in partitions:
        if pid in ingested:
            continue
        if fail_after is not None and done_count >= fail_after:
            return {"status": "aborted", "ingested": len(ingested) + done_count,
                    "total": len(partitions)}
        if pid in pending:
            counts = run_partition(path, out_dir, pid, cfg, schema, alias_table)
            manifest.commit(PartitionRecord(partition_id=pid, status="done",
                                            rows=counts["chunks"], extra=counts))
        # the partition's linked output is on disk either way; compact
        # its partials under the pid key (idempotent on replay)
        linked_pid = read_table(os.path.join(out_dir, "linked", pid))
        store.ingest(
            nodes_from_linked_triples(linked_pid),
            edges_from_linked_triples(linked_pid),
            key=pid,
        )
        done_count += 1
    return {
        "status": "done",
        "ingested": len(ingested) + done_count,
        "total": len(partitions),
        "store_dir": os.path.join(out_dir, "store"),
        "store_version_dir": store.current_dir(),
    }


def run_kg_build_resumable(
    docs_files: list[str | list[str]],
    out_dir: str,
    cfg: PipelineConfig | None = None,
    schema: GraphSchema = DEFAULT_SCHEMA,
    alias_table: pa.Table | None = None,
    fail_after: int | None = None,
    seen_store_dir: str | None = None,
    graph_store_dir: str | None = None,
) -> dict:
    """Partitioned, checkpointed build: one partition per input file (at
    scale: per Lance fragment). Completed partitions are recorded in a
    lineage manifest and skipped on re-run; the global graph phase runs
    over the union of all partition outputs. ``fail_after`` aborts after
    that many partitions (test hook for kill/resume).

    ``seen_store_dir`` enables CROSS-RUN content dedup: each partition's
    docs are filtered against a persistent ``SeenKeyStore`` of span-
    sequence checksums before chunk/embed/extract, and the fresh keys
    are ingested under the partition id after its manifest commit (a
    crash between commit and ingest heals on resume — the un-journaled
    partition re-ingests its persisted dockeys, a no-op for the data).

    ``graph_store_dir`` makes the GLOBAL phase resumable too: each
    partition's node/edge partials ingest into a persistent
    ``IncrementalStore`` keyed by partition id (idempotent journal, same
    commit→ingest healing as the seen store), so a resumed run pays
    O(delta partitions × touched buckets) for the graph — not a full
    re-reduce of every completed partition's linked rows. The final
    ``out_dir/{nodes,edges}`` are hardlinked views of the store's
    current version. The merges are associative (sum / min / max), so N
    per-partition ingests equal the one-shot derivation exactly
    (pinned in tests/test_ingest_dedup.py)."""
    cfg = cfg or PipelineConfig()
    if not docs_files:
        # S4 parity (reference phases.py:117-177): discovering nothing is
        # an error, not an empty success
        raise ValueError("no source partitions matched — nothing to ingest")
    seen_store = None
    if seen_store_dir is not None:
        from .ingest_dedup import SeenKeyStore

        seen_store = SeenKeyStore(seen_store_dir, key_col="doc_key")
    graph_store = None
    if graph_store_dir is not None:
        from .compact import IncrementalStore

        graph_store = IncrementalStore(graph_store_dir)
    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    partitions = [(f"p{idx:05d}", f) for idx, f in enumerate(docs_files)]
    pending = manifest.pending([p for p, _ in partitions])
    done_count = 0
    skipped = len(partitions) - len(pending)
    import glob as _glob

    def _ingest_dockeys(pid: str) -> None:
        """Journal a completed partition's fresh keys (idempotent; also
        heals a crash that landed between manifest commit and ingest)."""
        if seen_store is None or pid in seen_store.ingested_keys():
            return
        keys_dir = os.path.join(out_dir, "dockeys", pid)
        if _glob.glob(os.path.join(keys_dir, "**", "*.parquet"), recursive=True):
            keys_ds = read_table(keys_dir)
        else:  # zero-fresh partition: journal the pid with no data
            keys_ds = rd.from_arrow(pa.table({"doc_key": pa.array([], pa.string())}))
        seen_store.ingest(keys_ds, ingest_key=pid)

    _EMPTY_NODES = pa.table(
        {
            "entity_id": pa.array([], pa.string()),
            "label": pa.array([], pa.string()),
            "name": pa.array([], pa.string()),
            "mentions": pa.array([], pa.int64()),
        }
    )
    _EMPTY_EDGES = pa.table(
        {
            "src_id": pa.array([], pa.string()),
            "type": pa.array([], pa.string()),
            "dst_id": pa.array([], pa.string()),
            "n_mentions": pa.array([], pa.int64()),
            "first_doc": pa.array([], pa.string()),
            "last_doc": pa.array([], pa.string()),
        }
    )

    def _ingest_graph(pid: str) -> dict | None:
        """Apply one completed partition's node/edge partials to the
        incremental graph store (idempotent under the partition id;
        heals a commit→ingest crash the same way the seen store does)."""
        if graph_store is None or pid in graph_store.ingested_keys():
            return None
        linked_dir = os.path.join(out_dir, "linked", pid)
        if _glob.glob(os.path.join(linked_dir, "**", "*.parquet"), recursive=True):
            linked_p = read_table(linked_dir)
            nodes_p = nodes_from_linked_triples(linked_p).materialize()
            edges_p = edges_from_linked_triples(linked_p).materialize()
        else:  # zero-fresh partition: journal the pid with no data
            nodes_p = rd.from_arrow(_EMPTY_NODES)
            edges_p = rd.from_arrow(_EMPTY_EDGES)
        return graph_store.ingest(nodes_p, edges_p, key=pid)

    ingest_stats: list[dict] = []
    for pid, path in partitions:
        if pid not in pending:
            _ingest_dockeys(pid)  # heal commit→ingest crash on resume
            _ingest_graph(pid)
            continue
        if fail_after is not None and done_count >= fail_after:
            return {"status": "aborted", "completed": skipped + done_count, "total": len(partitions)}
        counts = run_partition(path, out_dir, pid, cfg, schema, alias_table, seen_store=seen_store)
        manifest.commit(PartitionRecord(partition_id=pid, status="done", rows=counts["chunks"], extra=counts))
        _ingest_dockeys(pid)
        st = _ingest_graph(pid)
        if st is not None:
            ingest_stats.append({"pid": pid, **st.get("stats", {})})
        done_count += 1

    # Global phase over all completed partition outputs. The global
    # tables are derived, so clear them first — write_parquet APPENDS
    # part files and a re-run would otherwise double every node/edge row.
    import shutil

    for t in ("nodes", "edges"):
        shutil.rmtree(os.path.join(out_dir, t), ignore_errors=True)
    if graph_store is not None:
        # O(delta): every partition is already merged into the versioned
        # store; the final tables are hardlinked views of CURRENT
        from .compact import _hardlink_tree

        cur = graph_store.current_dir()
        for t in ("nodes", "edges"):
            src = os.path.join(cur, t) if cur else None
            if src and os.path.isdir(src):
                _hardlink_tree(src, os.path.join(out_dir, t))
            else:
                os.makedirs(os.path.join(out_dir, t), exist_ok=True)
    elif _glob.glob(os.path.join(out_dir, "linked", "**", "*.parquet"), recursive=True):
        linked = read_table(os.path.join(out_dir, "linked"))
        nodes = nodes_from_linked_triples(linked)
        edges = edges_from_linked_triples(linked)
        write_table(nodes, os.path.join(out_dir, "nodes"))
        write_table(edges, os.path.join(out_dir, "edges"))
    else:
        # a seen-store run where EVERY doc was already ingested: the
        # graph phase has no rows — commit empty table dirs, not a crash
        for t in ("nodes", "edges"):
            os.makedirs(os.path.join(out_dir, t), exist_ok=True)
    result = {
        "status": "done",
        "completed": skipped + done_count,
        "recomputed": done_count,
        "total": len(partitions),
        "nodes_dir": os.path.join(out_dir, "nodes"),
        "edges_dir": os.path.join(out_dir, "edges"),
    }
    if graph_store is not None:
        # per-partition incremental merge evidence: which pids this RUN
        # ingested and how many buckets each touched (already-journaled
        # pids are absent — they cost nothing on resume)
        result["graph_ingests"] = ingest_stats
    from ..stages.llm_extractor import collect_metrics
    from ..state.manifest import resolve_git_commit, write_run_log

    write_run_log(
        os.path.join(out_dir, "run_log.json"),
        {**result, "git_commit": resolve_git_commit(), "profile": cfg.profile.name,
         "partitions": [p for p, _ in partitions],
         # A6: per-actor model-client counters aggregated by the named
         # metrics actor (empty when no model-backed stage ran)
         "model_metrics": collect_metrics()},
    )
    return result
