"""Benchmark harness: headline KG-construction pipeline + operator suite.

Prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "...", "queries": {...},
   "sf": dir, "num_cpus": N, ...}

``--scaling`` runs the plain bench twice in fresh processes
(RAY_GRAFT_CPUS=8 and =32) on the same input and reports throughput at
both levels plus scaling efficiency — the sandbox proxy for the
N→4N-node cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _scaling(lo: int = 8, hi: int = 32) -> None:
    results = {}
    for n in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
    t_lo, t_hi = results[lo]["headline_sec"], results[hi]["headline_sec"]
    tp_lo, tp_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "speedup_fraction",
        "sf": SF_DIR, "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": round(t_lo, 2), "sec_hi": round(t_hi, 2),
        "triples_per_sec_lo": round(tp_lo, 1), "triples_per_sec_hi": round(tp_hi, 1),
    }))


def main() -> None:
    os.environ.setdefault("PYTHONPATH", REPO)
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from fancyrag_ray.config import PipelineConfig
    from fancyrag_ray.pipelines.kg_build import (
        build_chunks, build_triples, link_triples,
        edges_from_linked_triples, nodes_from_linked_triples,
    )
    from fancyrag_ray.sources.io import interleave_documents

    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()

    # ---- headline: flagship KG build over the documents table ----
    cfg = PipelineConfig(
        embed_concurrency=max(2, NUM_CPUS // 4),
        extract_concurrency=max(2, NUM_CPUS // 2),
    )
    t0 = time.perf_counter()
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    inter = docs.map_batches(interleave_documents, batch_format="pyarrow")
    chunks = build_chunks(inter, cfg)
    triples = build_triples(chunks, cfg, emit_cooccurrence=True)
    linked = link_triples(triples, None, cfg).materialize()  # triples are small vs corpus
    n_triples = linked.count()
    n_edges = edges_from_linked_triples(linked).count()
    n_nodes = nodes_from_linked_triples(linked).count()
    headline_sec = time.perf_counter() - t0
    triples_per_sec = n_triples / headline_sec

    # ---- operator suite ----
    from fancyrag_ray.functions import relational as R
    from fancyrag_ray.functions import similarity as S
    from fancyrag_ray.functions import textops as T
    from fancyrag_ray.functions.dedup import minhash_lsh_duplicates

    def timed(fn):
        t = time.perf_counter()
        ds = fn(SF_DIR)
        ds.count()
        return round(time.perf_counter() - t, 3)

    queries = {
        "pricing_summary": timed(R.pricing_summary),
        "revenue_by_nation": timed(R.revenue_by_nation),
        "events_hourly": timed(R.events_hourly),
        "chunk_documents": timed(T.chunk_documents),
        "term_mentions": timed(T.term_mentions),
        "dedup_exact": timed(T.dedup_exact),
        "knn_cosine": timed(S.knn_cosine),
        "near_dup_minhash": timed(
            lambda sf: minhash_lsh_duplicates(
                rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
            )
        ),
    }

    print(json.dumps({
        "metric": "triples_per_sec",
        "value": round(triples_per_sec, 1),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline_sec": round(headline_sec, 2),
        "n_triples": n_triples,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
    }))
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        main()
