"""Benchmark harness: headline KG-construction pipeline + operator suite.

Headline = the FULL flagship pipeline (chunk → embed 1024-d → extract →
link → canonical nodes/edges) over the deterministic synthetic
interleaved-doc corpus (FIXTURES.md sf-bench; golden triples known, so
triple precision/recall is measured in the same run). Corpus is
generated once and cached under /tmp (generation excluded from timing).
The operator suite runs over $GRAFT_SF_DIR driver tables.

Prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "...", "queries": {...},
   "sf": dir, "num_cpus": N, "precision": p, "recall": r, ...}

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
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "100000"))
BENCH_SEED = 42


def _spin_worker(n: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i & 7
    return n / (time.perf_counter() - t0)


def _steal_probe(workers: int = 4, iters: int = 2_000_000) -> float:
    """Pure-CPU spin-farm probe (the BASELINE.md round-1 control,
    miniaturized): aggregate Mops/s across ``workers`` processes.
    Clean-window reference on this host ≈ 67–70 Mops/s at 4 workers; a
    stolen window reads proportionally lower. Published alongside every
    bench row (VERDICT r4 ask #7) so a reader can separate host steal
    from engine regression when comparing rounds."""
    import multiprocessing as mp

    try:
        with mp.get_context("fork").Pool(workers) as p:
            rates = p.map(_spin_worker, [iters] * workers)
        return round(sum(rates) / 1e6, 1)
    except Exception:
        return -1.0


def _bench_corpus_dir() -> str:
    """Generate-or-reuse the deterministic bench corpus (cached), sharded
    into 64 part files so the read parallelizes like a real fragmented
    input (one parquet file = one serial decode task)."""
    out = f"/tmp/fancyrag_bench_corpus_n{BENCH_DOCS}_s{BENCH_SEED}_sharded"
    marker = os.path.join(out, ".complete")
    if not os.path.exists(marker):
        from fancyrag_ray.fixtures import generate_corpus, write_corpus

        corpus = generate_corpus(n_docs=BENCH_DOCS, seed=BENCH_SEED)
        write_corpus(corpus, out, n_doc_files=64)
        open(marker, "w").write("ok")
    return out


def _scaling(lo: int | None = None, hi: int | None = None) -> None:
    # N vs 4N proxy levels: 4 and 16 CPUs by default. A control
    # experiment (pure-Python spin farm, no Ray) shows this host scales
    # 0.95-0.99 from 4→16 workers but only 0.70-0.73 from 8→32 — the 32
    # "CPUs" are SMT/vCPU-shared, so an 8→32 comparison measures the
    # hardware ceiling, not the engine. On a real cluster each of the 4N
    # nodes has its own full cores and memory bus, which 4→16 models
    # faithfully and 8→32 does not. See BASELINE.md.
    lo = lo or int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = hi or int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # The criterion also needs a compute-dominated headline: at the
    # default 100k docs the per-phase fixed overhead (pipeline startup /
    # barriers) masks the CPU difference. Use a larger corpus for the
    # two-level run unless the caller pinned one.
    scaling_docs = os.environ.get("GRAFT_SCALING_DOCS", "1000000")

    def run_level(n: int, reps: str) -> dict:
        # headline only, repeated; min over reps rejects noisy-neighbor
        # CPU-steal spikes on this shared host
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), PYTHONPATH=REPO,
                   GRAFT_BENCH_DOCS=scaling_docs, GRAFT_HEADLINE_ONLY="1",
                   GRAFT_BENCH_REPS=reps)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # INTERLEAVED reps: this host's noisy-neighbor load varies on a
    # tens-of-minutes timescale (observed 0-35% CPU steal, and the SAME
    # binary measuring 98 s and 131 s at 4 CPUs an hour apart), so the
    # two levels alternate — each rep pair samples one environment
    # window. Canonical value = min-per-level over reps (round-1
    # methodology); per-window pair efficiencies are published alongside.
    reps = int(os.environ.get("GRAFT_SCALE_PAIRS", "3"))
    pair_runs = []
    pair_probes = []
    for _ in range(reps):
        pair_probes.append(_steal_probe())
        r_lo = run_level(lo, "1")
        r_hi = run_level(hi, "1")
        pair_runs.append((r_lo, r_hi))
    t_lo = min(r[0]["headline_sec"] for r in pair_runs)
    t_hi = min(r[1]["headline_sec"] for r in pair_runs)
    tp_lo = max(r[0]["value"] for r in pair_runs)
    tp_hi = max(r[1]["value"] for r in pair_runs)
    pair_effs = [round((a["headline_sec"] / b["headline_sec"]) / (hi / lo), 3) for a, b in pair_runs]
    eff = (t_lo / t_hi) / (hi / lo)
    payload = {
        "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "speedup_fraction",
        "sf": SF_DIR, "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": round(t_lo, 2), "sec_hi": round(t_hi, 2),
        "triples_per_sec_lo": round(tp_lo, 1), "triples_per_sec_hi": round(tp_hi, 1),
        "pair_efficiencies": pair_effs,
        "best_pair_efficiency": max(pair_effs),
        "pair_steal_probes_mops": pair_probes,
        "steal_probe_clean_ref": "67-70 Mops/s @ 4 workers",
    }
    # Transparency companion (VERDICT r1 §Next-8): the 8→32 levels are
    # also published even though this host's 32 vCPUs are SMT-shared
    # (~16 real cores; the pure-Python control farm itself only reaches
    # 0.70-0.73 from 8→32 — see BASELINE.md), so the 8/32 number is a
    # machine-ceiling-bounded floor, not the engine's scaling.
    if os.environ.get("GRAFT_SCALE_SECONDARY", "1") != "0":
        sec_lo_n, sec_hi_n = 8, 32
        sec = {n: run_level(n, os.environ.get("GRAFT_BENCH_REPS_SECONDARY", "1"))
               for n in (sec_lo_n, sec_hi_n)}
        s_lo, s_hi = sec[sec_lo_n]["headline_sec"], sec[sec_hi_n]["headline_sec"]
        payload["secondary_8_32"] = {
            "cpus_lo": sec_lo_n, "cpus_hi": sec_hi_n,
            "sec_lo": round(s_lo, 2), "sec_hi": round(s_hi, 2),
            "efficiency": round((s_lo / s_hi) / (sec_hi_n / sec_lo_n), 3),
            "note": "SMT/vCPU-shared host: pure-CPU control farm caps at 0.70-0.73 on 8->32",
        }
    print(json.dumps(payload))


def _skew() -> None:
    """Measured justification for the autoshard dispatch threshold
    (2²¹ rows — VERDICT r4 ask #6): time the UNSHARDED vs TIME-SHARDED
    asof-join plans, plus the probe-dispatched ``asof_join_auto``, on
    two synthesized skewed events tables:

      * below-threshold — 2M rows, hottest user = 20% (400k rows,
        < 2²¹): the unsharded plan's hot partition still pipelines, so
        the sharded plan's boundary-state phases are pure tax; the
        dispatcher must pick unsharded.
      * above-threshold — 12M rows, hottest user = 25% (3M rows,
        > 2²¹): the hot key serializes one co-partitioned block in the
        unsharded plan (straggler); the dispatcher must pick sharded.

    One JSON line; results recorded in BASELINE.md (round-5 section)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fancyrag_ray.functions import relational, timeshard
    from fancyrag_ray.functions.autoshard import (
        HOT_KEY_THRESHOLD_ROWS, asof_join_auto, choose_windowed_path, max_key_rows,
    )

    span_us = 30 * 86_400 * 1_000_000
    n_users = 100_000

    def synth(tag: str, n_rows: int, hot_frac: float) -> tuple[str, str, int]:
        out = f"/tmp/fancyrag_skew_{tag}_n{n_rows}"
        marker = os.path.join(out, ".complete")
        n_hot = int(n_rows * hot_frac)
        if not os.path.exists(marker):
            rng = np.random.default_rng(11)
            user = np.concatenate(
                [np.full(n_hot, 1, np.int64), rng.integers(2, n_users, n_rows - n_hot)]
            )
            ts = rng.integers(0, span_us, n_rows).astype("datetime64[us]")
            events = pa.table({
                "event_id": pa.array(np.arange(n_rows), pa.int64()),
                "user_id": pa.array(user),
                "ts": pa.array(ts),
            })
            os.makedirs(f"{out}/events", exist_ok=True)
            shard = (n_rows + 31) // 32
            for i in range(32):
                part = events.slice(i * shard, shard)
                if part.num_rows:
                    pq.write_table(part, f"{out}/events/part-{i:05d}.parquet")
            # uniform right side: ~10 orders per user
            n_orders = n_users * 10
            orders = pa.table({
                "o_custkey": pa.array(rng.integers(1, n_users, n_orders)),
                "o_orderdate": pa.array(rng.integers(0, span_us, n_orders).astype("datetime64[us]")),
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
            })
            pq.write_table(orders, f"{out}/orders.parquet")
            open(marker, "w").write("ok")
        return f"{out}/events", f"{out}/orders.parquet", n_hot

    def timed_plan(fn, reps: int) -> float:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    configs = {}
    cases = [("below_threshold", 2_000_000, 0.20), ("above_threshold", 12_000_000, 0.25)]
    for tag, n_rows, hot_frac in cases:
        ev_path, ord_path, n_hot = synth(tag, n_rows, hot_frac)
        rd.read_parquet(ev_path).count()  # warm page cache

        def left():
            return rd.read_parquet(ev_path)

        right = rd.read_parquet(ord_path).materialize()
        kw = dict(on="ts", by="user_id", right_on="o_orderdate",
                  right_by="o_custkey", num_partitions=64)
        probe_t0 = time.perf_counter()
        hottest = max_key_rows(left(), "user_id")
        probe_sec = round(time.perf_counter() - probe_t0, 2)
        configs[tag] = {
            "rows": n_rows,
            "hot_key_rows": n_hot,
            "threshold": HOT_KEY_THRESHOLD_ROWS,
            "auto_path": choose_windowed_path(hottest),
            "probe_sec": probe_sec,
            "unsharded_sec": timed_plan(lambda: relational.asof_join(left(), right, **kw), reps),
            "sharded_sec": timed_plan(lambda: timeshard.asof_join_timesharded(left(), right, **kw), reps),
            "auto_sec": timed_plan(lambda: asof_join_auto(left(), right, probe_left=left(), **kw), reps),
        }
    print(json.dumps({
        "metric": "skew_asof_dispatch", "unit": "sec", "num_cpus": NUM_CPUS,
        "configs": configs,
        "steal_probe_mops_post": _steal_probe(),
        "steal_probe_clean_ref": "67-70 Mops/s @ 4 workers",
    }))
    ray.shutdown()


def main() -> None:
    os.environ.setdefault("PYTHONPATH", REPO)
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from fancyrag_ray.config import PipelineConfig
    from fancyrag_ray.pipelines.kg_build import (
        build_chunks, build_embeddings, build_triples, link_triples,
        edges_from_linked_triples, nodes_from_linked_triples,
    )

    probe_pre = _steal_probe()
    corpus_dir = _bench_corpus_dir()
    aliases = pq.read_table(f"{corpus_dir}/entity_aliases.parquet")
    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(f"{corpus_dir}/documents").count()

    # ---- headline: full flagship build over the interleaved corpus ----
    # Pool maxima sized so the CONCURRENT demand (embed ∥ extract ∥ link
    # ∥ read/merge tasks) sums to ≈ the CPU count — oversubscribed pools
    # churn pending actors instead of computing.
    cfg = PipelineConfig(
        embed_concurrency=max(2, NUM_CPUS // 2),
        extract_concurrency=max(2, NUM_CPUS // 4),
    )
    import threading

    # min-of-2 by default: this host shows up to 3× run-to-run noise
    # (CPU steal / noisy neighbors); min over reps rejects the spikes
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    headline_sec = None
    headline_sec_cold = None  # first rep: fresh Ray workers / cold actor state
    for _rep in range(reps):
        t0 = time.perf_counter()
        docs = rd.read_parquet(f"{corpus_dir}/documents")
        chunks = build_chunks(docs, cfg).materialize()  # persisted-chunks point (resume boundary)

        # embed branch and extract→link branch run CONCURRENTLY (two
        # streaming executions sharing the cluster via autoscaling pools)
        emb_result: dict = {}

        def _embed():
            emb_result["rows"] = build_embeddings(chunks, cfg).count()

        th = threading.Thread(target=_embed)
        th.start()
        triples = build_triples(chunks, cfg)
        linked = link_triples(triples, aliases, cfg).materialize()  # triples ≪ corpus
        n_triples = linked.count()
        counts: dict = {}
        th_e = threading.Thread(target=lambda: counts.__setitem__("edges", edges_from_linked_triples(linked).count()))
        th_n = threading.Thread(target=lambda: counts.__setitem__("nodes", nodes_from_linked_triples(linked).count()))
        th_e.start()
        th_n.start()
        th_e.join()
        th_n.join()
        n_edges, n_nodes = counts["edges"], counts["nodes"]
        th.join()
        emb_rows = emb_result["rows"]
        rep_sec = time.perf_counter() - t0
        if headline_sec_cold is None:
            headline_sec_cold = rep_sec
        headline_sec = rep_sec if headline_sec is None else min(headline_sec, rep_sec)
    triples_per_sec = n_triples / headline_sec

    # triple P/R vs the generator's goldens — fully distributed (the
    # former linked.to_pandas() pulled the whole triple stream onto the
    # driver; at 100× corpora that is a driver OOM). Distinct facts via
    # per-block dedup + groupby; tp via inner join against the goldens.
    # Skipped in headline-only scaling children: P/R is corpus-deterministic,
    # identical at every CPU level, and its two shuffles would otherwise
    # dominate the low-CPU levels' wall time.
    headline_only = bool(os.environ.get("GRAFT_HEADLINE_ONLY"))
    import pyarrow as pa

    precision = recall = None
    if not headline_only:
        fact_cols = ["doc_id", "subj_canonical", "pred", "obj_canonical"]

        def _block_distinct(t: pa.Table) -> pa.Table:
            return t.group_by(fact_cols).aggregate([])

        from ray.data.aggregate import Count as _Count

        distinct_got = (
            linked.select_columns(fact_cols)
            .map_batches(_block_distinct, batch_format="pyarrow", batch_size=None)
            .groupby(fact_cols)
            .aggregate(_Count(alias_name="_n"))
            .select_columns(fact_cols)
            .materialize()
        )
        n_got = distinct_got.count()
        gold_cols = ["doc_id", "subj", "pred", "obj"]
        goldens = (
            rd.read_parquet(f"{corpus_dir}/golden_triples.parquet", columns=gold_cols)
            .map_batches(lambda t: t.group_by(gold_cols).aggregate([]), batch_format="pyarrow", batch_size=None)
            .groupby(gold_cols)
            .aggregate(_Count(alias_name="_n"))
            .select_columns(gold_cols)
            .materialize()
        )  # goldens record every planting; P/R is over DISTINCT doc-level facts
        n_gold = goldens.count()
        from fancyrag_ray.util import adaptive_partitions

        tp = distinct_got.join(
            goldens, join_type="inner", num_partitions=adaptive_partitions(16, n_rows=n_got),
            on=("doc_id", "subj_canonical", "pred", "obj_canonical"),
            right_on=("doc_id", "subj", "pred", "obj"),
        ).count()
        precision = tp / max(1, n_got)
        recall = tp / max(1, n_gold)

    # ---- operator suite (skipped in headline-only scaling children) ----
    queries: dict = {}
    if not headline_only:
        from fancyrag_ray.functions import analytics as A
        from fancyrag_ray.functions import relational as R
        from fancyrag_ray.functions import similarity as S
        from fancyrag_ray.functions import textops as T
        from fancyrag_ray.functions.dedup import minhash_lsh_duplicates, ngram_jaccard_duplicates

        def timed(fn, reps: int = 2):
            best = None
            for _ in range(reps):  # min-of-reps (same noise rationale as headline)
                t = time.perf_counter()
                ds = fn(SF_DIR)
                ds.count()
                dt = time.perf_counter() - t
                best = dt if best is None else min(best, dt)
            return round(best, 3)

        queries = {
            "pricing_summary": timed(R.pricing_summary),
            "revenue_by_nation": timed(R.revenue_by_nation),
            "events_hourly": timed(R.events_hourly),
            "events_sessions": timed(R.events_sessions),
            "events_sessions_sharded": timed(R.events_sessions_sharded),
            "events_last_order": timed(R.events_last_order),
            "events_rolling_hour": timed(R.events_rolling_hour),
            "events_session_attribution": timed(R.events_session_attribution),
            "top_orders_per_customer": timed(A.top_orders_per_customer),
            "order_price_quantiles": timed(A.order_price_quantiles),
            "events_type_pivot": timed(A.events_type_pivot),
            "stratified_sample_events": timed(A.stratified_sample_events),
            "chunk_documents": timed(T.chunk_documents),
            "term_mentions": timed(T.term_mentions),
            "dedup_exact": timed(T.dedup_exact),
            "sample_documents_hash": timed(T.sample_documents_hash),
            "knn_cosine": timed(S.knn_cosine),
            "near_dup_minhash": timed(
                lambda sf: minhash_lsh_duplicates(
                    rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
                )
            ),
            "near_dup_ngram_jaccard": timed(
                lambda sf: ngram_jaccard_duplicates(
                    rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]),
                    jaccard_threshold=0.8,
                )
            ),
            "tfidf_top_terms": timed(T.tfidf_top_terms),
            "dedup_incremental_documents": timed(
                __import__("__ray_entry__").queries()["dedup_incremental_documents"]
            ),
            # round-3 second-session operators
            "events_running_value": timed(A.events_running_value),
            "events_type_rollup": timed(A.events_type_rollup),
            # round-4 hot-key-safe time-sharded variants (same oracles)
            "events_last_order_sharded": timed(
                __import__("fancyrag_ray.functions.timeshard", fromlist=["t"]).events_last_order_sharded
            ),
            "events_rolling_hour_sharded": timed(
                __import__("fancyrag_ray.functions.timeshard", fromlist=["t"]).events_rolling_hour_sharded
            ),
            "events_session_attribution_sharded": timed(
                __import__("fancyrag_ray.functions.timeshard", fromlist=["t"]).events_session_attribution_sharded
            ),
            "events_running_value_sharded": timed(
                __import__("fancyrag_ray.functions.timeshard", fromlist=["t"]).events_running_value_sharded
            ),
            "pack_documents": timed(A.pack_documents),
            "lang_id_documents": timed(
                __import__("fancyrag_ray.functions.quality", fromlist=["q"]).lang_id_documents
            ),
            "entity_triangles": timed(
                __import__("fancyrag_ray.functions.graph", fromlist=["g"]).entity_triangles
            ),
            "doc_term_list": timed(T.doc_term_list),
            "decontaminate_documents": timed(
                __import__("__ray_entry__").queries()["decontaminate_documents"]
            ),
            # round-4 additions
            "repetition_stats": timed(
                __import__("fancyrag_ray.functions.quality", fromlist=["q"]).repetition_stats
            ),
            "temperature_sample_documents": timed(A.temperature_sample_documents),
            "embedding_kmeans": timed(
                __import__("fancyrag_ray.functions.clustering", fromlist=["c"]).embedding_kmeans
            ),
            "embedding_semdedup": timed(
                __import__("fancyrag_ray.functions.clustering", fromlist=["c"]).embedding_semdedup
            ),
            "knn_cosine_pq": timed(S.knn_cosine_pq),
            # round-4 corpus lexical stats + PMI + link prediction
            "top_bigrams": timed(
                __import__("fancyrag_ray.functions.corpus", fromlist=["c"]).top_bigrams
            ),
            "common_word_fraction": timed(
                __import__("fancyrag_ray.functions.corpus", fromlist=["c"]).common_word_fraction
            ),
            "fulltext_bm25": timed(
                __import__("fancyrag_ray.functions.corpus", fromlist=["c"]).fulltext_bm25
            ),
            "cooccurrence_pmi": timed(T.cooccurrence_pmi),
            "entity_common_neighbors": timed(
                __import__("fancyrag_ray.functions.graph", fromlist=["g"]).entity_common_neighbors
            ),
            # round-4 later additions: windows, scrubbing, paragraph
            # dedup, exact pagerank, fuzzy linking, quality gate, funnel
            "events_value_delta": timed(R.events_value_delta),
            "events_percent_rank": timed(R.events_percent_rank),
            "events_ntile": timed(R.events_ntile),
            "events_hopping_counts": timed(R.events_hopping_counts),
            "redact_pii_documents": timed(
                __import__("fancyrag_ray.functions.quality", fromlist=["q"]).redact_pii_documents
            ),
            "dedup_paragraphs": timed(
                __import__("fancyrag_ray.functions.dedup", fromlist=["d"]).dedup_paragraphs
            ),
            "entity_pagerank_exact": timed(
                __import__("__ray_entry__").queries()["entity_pagerank_exact"]
            ),
            "fuzzy_term_matches": timed(T.fuzzy_term_matches),
            "gopher_quality_filter": timed(
                __import__("fancyrag_ray.functions.quality", fromlist=["q"]).gopher_quality_filter
            ),
            "fulltext_topk_chunks": timed(T.fulltext_topk_chunks),
            "corpus_cleaning_funnel": timed(
                __import__("fancyrag_ray.pipelines.clean_corpus", fromlist=["c"]).corpus_cleaning_funnel
            ),
            "dedup_substrings": timed(
                __import__("fancyrag_ray.functions.dedup", fromlist=["d"]).dedup_substrings
            ),
            "dedup_clusters": timed(
                __import__("__ray_entry__").queries()["dedup_clusters"]
            ),
            "events_funnel": timed(R.events_funnel),
            "events_retention": timed(R.events_retention),
            "shipping_priority": timed(R.shipping_priority),
            "part_distinct_suppliers": timed(R.part_distinct_suppliers),
            "order_status_transitions": timed(R.order_status_transitions),
            "entity_clustering_coefficient": timed(
                __import__("fancyrag_ray.functions.graph", fromlist=["g"]).entity_clustering_coefficient
            ),
            "entity_bfs_distances": timed(
                __import__("fancyrag_ray.functions.graph", fromlist=["g"]).entity_bfs_distances
            ),
            "events_value_by_segment": timed(
                __import__("fancyrag_ray.functions.autoshard", fromlist=["a"]).events_value_by_segment
            ),
            "events_peak_window": timed(R.events_peak_window),
            "events_props_stats": timed(R.events_props_stats),
            "sample_per_source": timed(T.sample_per_source),
            "source_vocab_overlap": timed(T.source_vocab_overlap),
            "orders_monthly_dense": timed(R.orders_monthly_dense),
            "events_type_trigrams": timed(R.events_type_trigrams),
            "corpus_datacard": timed(
                __import__("fancyrag_ray.pipelines.clean_corpus", fromlist=["c"]).corpus_datacard
            ),
            "customer_order_counts": timed(R.customer_order_counts),
            # round-5 additions: EXISTS semi-join, k-core peel, MMR re-rank
            "late_shipment_priority": timed(R.late_shipment_priority),
            "entity_kcore": timed(
                __import__("fancyrag_ray.functions.graph", fromlist=["g"]).entity_kcore
            ),
            "knn_cosine_mmr": timed(S.knn_cosine_mmr),
            "events_hour_value_stats": timed(A.events_hour_value_stats),
            "entity_degree_assortativity": timed(
                __import__("fancyrag_ray.functions.graph", fromlist=["g"]).entity_degree_assortativity
            ),
            "copurchase_pairs": timed(A.copurchase_pairs),
            "bigram_oov_rate": timed(
                __import__("fancyrag_ray.functions.corpus", fromlist=["c"]).bigram_oov_rate
            ),
            "approx_hourly_distinct_users": timed(
                __import__("fancyrag_ray.functions.sketches", fromlist=["s"]).approx_hourly_distinct_users
            ),
            "approx_term_counts": timed(
                lambda sf: rd.from_arrow(
                    __import__("__ray_entry__").queries()["approx_term_counts"](sf)
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
        # methodology (VERDICT r2 #9): min-of-reps reuses warm Ray
        # workers + page cache ⇒ warm steady-state; the cold number is
        # the first rep after ray.init (input page cache pre-warmed,
        # worker/actor state cold)
        "headline_sec_cold": round(headline_sec_cold, 2),
        "headline_methodology": "warm=min over reps; cold=first rep after ray.init",
        "bench_docs": BENCH_DOCS,
        "n_triples": n_triples,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "n_chunks_embedded": emb_rows,
        "precision": round(precision, 4) if precision is not None else None,
        "recall": round(recall, 4) if recall is not None else None,
        # window-cleanliness annotation: pure-CPU spin-farm Mops/s
        # before the headline and after the query suite (clean host
        # reference 67-70 @ 4 workers — BASELINE.md round-1 control).
        # Rows timed between two full-rate probes are clean-window; a
        # low probe marks the whole run as steal-inflated.
        "steal_probe_mops_pre": probe_pre,
        "steal_probe_mops_post": _steal_probe(),
        "steal_probe_clean_ref": "67-70 Mops/s @ 4 workers",
    }))
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    elif "--skew" in sys.argv:
        _skew()
    else:
        main()
