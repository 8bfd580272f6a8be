"""QA gate: distributed integrity metrics + threshold gating + report.

Parity: the reference's ``IngestionQaEvaluator.evaluate()``
(``src/fancyrag/qa/evaluator.py:115-268``) and its Neo4j count queries
(``src/fancyrag/db/neo4j_queries.py:183-297``):
  G1  graph counts (documents / chunks / relationships)
  G2  missing-embedding count        → anti-join chunks ⋉̸ embeddings
  G3  orphan-chunk count             → anti-join chunks ⋉̸ documents
  G4  checksum-mismatch count        → join on uid + filter(neq)
  G5  semantic counts (nodes / edges / orphan entities)
  G6  totals (docs, chunks, token estimate total/max/mean)
  G7  token histogram (reference bin edges)
  D1  duplicate-uid count            → groupby(uid) count > 1
On failure the reference rolls back via ingest_run_key deletes; here a
failed gate simply leaves the manifest uncommitted (the caller decides).

All counts are Ray aggregations; anti-joins are broadcast key-set
filters when the key side is small, ``Dataset.join(left_anti)``
otherwise (threshold documented per call).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..util import adaptive_partitions

from ..config import QaThresholds


@dataclass
class QaMetrics:
    documents: int
    chunks: int
    relationships: int
    missing_embeddings: int
    orphan_chunks: int
    checksum_mismatches: int
    duplicate_uids: int
    semantic_nodes: int
    semantic_edges: int
    orphan_entities: int
    token_total: int
    token_max: int
    token_mean: float
    token_histogram: dict
    semantic_failures: int = 0
    status: str = "unknown"
    failures: tuple = ()


def _anti_count(left: rd.Dataset, left_key: str, right: rd.Dataset, right_key: str,
                broadcast_budget_bytes: int | None = None) -> int:
    """Count left rows with no right match, via the shared three-tier
    anti-join (broadcast value_set → Bloom prefilter + exact verify →
    hash left_anti join), sized by ``util.fits_broadcast``'s byte budget."""
    from ..util import tiered_anti_join

    return tiered_anti_join(
        left.select_columns([left_key]), left_key, right, right_key,
        broadcast_budget_bytes=broadcast_budget_bytes,
    ).count()


def evaluate(
    documents: rd.Dataset,
    chunks: rd.Dataset,
    embeddings: rd.Dataset,
    nodes: rd.Dataset,
    edges: rd.Dataset,
    thresholds: QaThresholds = QaThresholds(),
    expected_checksums: rd.Dataset | None = None,
    linked: rd.Dataset | None = None,
) -> QaMetrics:
    n_docs = documents.count()
    n_chunks = chunks.count()
    n_edges_total = edges.count()

    missing_emb = _anti_count(chunks, "chunk_uid", embeddings, "chunk_uid")
    orphan_chunks = _anti_count(chunks, "doc_id", documents, "doc_id")

    # D1: duplicate chunk uids (deterministic content-hash uids ⇒ 0)
    dup = (
        chunks.groupby("chunk_uid")
        .aggregate(Count(alias_name="n"))
        .map_batches(lambda t: t.filter(pc.greater(t.column("n"), pa.scalar(1))), batch_format="pyarrow")
        .count()
    )

    # G4: persisted checksum vs recomputed (expected side optional)
    mismatches = 0
    if expected_checksums is not None:
        joined = chunks.select_columns(["chunk_uid", "checksum"]).join(
            expected_checksums, join_type="inner", num_partitions=adaptive_partitions(16),
            on=("chunk_uid",), right_suffix="_expected",
        )
        mismatches = joined.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("checksum"), t.column("checksum_expected"))),
            batch_format="pyarrow",
        ).count()

    n_nodes = nodes.count()
    # G5 orphan entities: nodes appearing in no edge — anti-join against
    # the union of edge endpoints (distinct per block first, so the
    # endpoint stream is |distinct per block|, not |edges|·2). Goes
    # through _anti_count, which broadcasts only below its 5M-key limit
    # and hash-left-anti-joins above it — never an unbounded driver set.
    orphan_entities = 0
    if n_nodes:
        def endpoint_rows(t: pa.Table) -> pa.Table:
            both = pa.concat_arrays(
                [t.column("src_id").combine_chunks().cast(pa.string()),
                 t.column("dst_id").combine_chunks().cast(pa.string())]
            )
            return pa.table({"endpoint": both.unique()})

        endpoints_ds = edges.select_columns(["src_id", "dst_id"]).map_batches(
            endpoint_rows, batch_format="pyarrow", batch_size=None
        )
        orphan_entities = _anti_count(nodes, "entity_id", endpoints_ds, "endpoint")

    # G6/G7 token stats over chunk text
    edges_hist = [64, 128, 256, 512, 1024, 2048]

    def tokens(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("text")).cast(pa.float64())
        tok = pc.max_element_wise(pc.ceil(pc.divide(n, pa.scalar(4.0))), pa.scalar(1.0)).cast(pa.int64())
        return pa.table({"tokens": tok})

    tok_ds = chunks.select_columns(["text"]).map_batches(tokens, batch_format="pyarrow", batch_size=None)
    agg = tok_ds.aggregate(Sum("tokens", alias_name="total"), Max("tokens", alias_name="max"), Count(alias_name="n"))
    token_total, token_max = int(agg["total"] or 0), int(agg["max"] or 0)
    token_mean = token_total / max(1, int(agg["n"]))

    import numpy as np

    def bucket(t: pa.Table) -> pa.Table:
        v = t.column("tokens").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(np.array(edges_hist), v, side="left")
        labels = [f"<={e}" for e in edges_hist] + [">2048"]
        lab = np.array(labels, dtype=object)[idx]
        pt = pa.table({"bucket": pa.array(lab, pa.string())})
        return pt.group_by(["bucket"]).aggregate([([], "count_all")]).rename_columns(["bucket", "n"])

    hist_tbl = tok_ds.map_batches(bucket, batch_format="pyarrow", batch_size=None).groupby("bucket").aggregate(
        Sum("n", alias_name="n")
    ).to_pandas()
    histogram = dict(zip(hist_tbl["bucket"], [int(x) for x in hist_tbl["n"]]))

    # G8: semantic extraction failures (sentinel rows from the extractor)
    semantic_failures = 0
    if linked is not None:
        from ..stages.materialize import FAILED_PRED

        semantic_failures = linked.map_batches(
            lambda t: t.filter(pc.equal(t.column("pred"), pa.scalar(FAILED_PRED))),
            batch_format="pyarrow",
        ).count()

    failures = []
    if semantic_failures > thresholds.max_semantic_failures:
        failures.append(f"semantic_failures {semantic_failures} > {thresholds.max_semantic_failures}")
    if missing_emb > thresholds.max_missing_embeddings:
        failures.append(f"missing_embeddings {missing_emb} > {thresholds.max_missing_embeddings}")
    if orphan_chunks > thresholds.max_orphan_chunks:
        failures.append(f"orphan_chunks {orphan_chunks} > {thresholds.max_orphan_chunks}")
    if mismatches > thresholds.max_checksum_mismatches:
        failures.append(f"checksum_mismatches {mismatches} > {thresholds.max_checksum_mismatches}")
    if dup > thresholds.max_duplicate_uids:
        failures.append(f"duplicate_uids {dup} > {thresholds.max_duplicate_uids}")

    return QaMetrics(
        documents=n_docs,
        chunks=n_chunks,
        relationships=n_edges_total,
        missing_embeddings=missing_emb,
        orphan_chunks=orphan_chunks,
        checksum_mismatches=mismatches,
        duplicate_uids=dup,
        semantic_nodes=n_nodes,
        semantic_edges=n_edges_total,
        orphan_entities=orphan_entities,
        token_total=token_total,
        token_max=token_max,
        token_mean=round(token_mean, 6),
        token_histogram=histogram,
        semantic_failures=semantic_failures,
        status="pass" if not failures else "fail",
        failures=tuple(failures),
    )


def unique_report_dir(base_dir: str) -> str:
    """D6 parity (reference ``report.py:41-46``): if ``base_dir`` already
    exists, suffix ``-01``, ``-02``, … until a fresh directory name is
    found, then create and return it."""
    candidate = base_dir
    suffix = 0
    while os.path.exists(candidate):
        suffix += 1
        candidate = f"{base_dir}-{suffix:02d}"
    os.makedirs(candidate)
    return candidate


def write_report(metrics: QaMetrics, out_dir: str) -> dict[str, str]:
    """JSON + Markdown renderings (reference report.py:17-136); pass the
    result of :func:`unique_report_dir` for timestamp-collision safety."""
    os.makedirs(out_dir, exist_ok=True)
    jpath = os.path.join(out_dir, "qa_report.json")
    with open(jpath, "w") as f:
        json.dump(asdict(metrics), f, indent=2, sort_keys=True)
    lines = [
        "# Ingestion QA report", "",
        f"**Status: {metrics.status}**", "",
        "| metric | value |", "|---|---|",
    ]
    for k, v in asdict(metrics).items():
        if k not in ("token_histogram", "failures"):
            lines.append(f"| {k} | {v} |")
    if metrics.failures:
        lines += ["", "## Failures", ""] + [f"- {x}" for x in metrics.failures]
    mpath = os.path.join(out_dir, "qa_report.md")
    with open(mpath, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"json": jpath, "markdown": mpath}
