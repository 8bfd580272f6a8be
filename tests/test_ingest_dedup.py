"""Cross-run incremental dedup: SeenKeyStore + dedup_against_store.

The contract under test: fresh = first-occurrence-per-key rows of the
delta whose key no prior ingest committed; reads prune to delta-touched
buckets; ingests are idempotent, rewrite only touched buckets, and
commit atomically."""

import hashlib
import os

import pyarrow as pa
import pytest
import ray.data as rd

from fancyrag_ray.pipelines.ingest_dedup import SeenKeyStore, dedup_against_store


def _docs(texts, start=0):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(start, start + len(texts))),
                "text": list(texts),
                "checksum": [hashlib.md5(t.encode()).hexdigest() for t in texts],
            }
        )
    )


class TestFilterFresh:
    def test_cross_run_and_within_delta_dedup(self, ray_session, tmp_path):
        store = str(tmp_path / "store")
        run_a = _docs([f"t{i % 6}" for i in range(10)])  # keys t0..t5
        fresh_a, _ = dedup_against_store(run_a, store, "checksum", "doc_id", ingest_key="a")
        fa = fresh_a.to_pandas().sort_values("doc_id")
        assert sorted(fa["text"]) == [f"t{i}" for i in range(6)]
        # within-delta keep-first: t0 planted at doc_id 0 and 6 → 0 survives
        assert list(fa["doc_id"]) == [0, 1, 2, 3, 4, 5]

        run_b = _docs([f"t{i % 8}" for i in range(4, 16)], start=100)  # keys t0..t7
        fresh_b, _ = dedup_against_store(run_b, store, "checksum", "doc_id", ingest_key="b")
        fb = fresh_b.to_pandas()
        assert sorted(fb["text"]) == ["t6", "t7"]

    def test_matches_naive_reference(self, ray_session, tmp_path):
        store = str(tmp_path / "store")
        texts_a = [f"doc {i % 37}" for i in range(200)]
        texts_b = [f"doc {i % 53}" for i in range(200)]
        dedup_against_store(_docs(texts_a), store, "checksum", "doc_id", ingest_key="a")
        fresh, _ = dedup_against_store(_docs(texts_b, start=1000), store, "checksum", "doc_id")
        got = sorted(fresh.to_pandas()["text"])
        seen = set(texts_a)
        want, within = [], set()
        for t in texts_b:
            if t not in seen and t not in within:
                want.append(t)
                within.add(t)
        assert got == sorted(want)

    def test_empty_store_and_duplicate_free_delta(self, ray_session, tmp_path):
        store = str(tmp_path / "store")
        fresh, stats = dedup_against_store(
            _docs([f"u{i}" for i in range(8)]), store, "checksum", "doc_id"
        )
        assert fresh.count() == 8  # Dataset return type: .count() works
        assert stats["buckets_read"] == 0  # nothing ingested yet

    def test_all_duplicate_delta_returns_empty_dataset(self, ray_session, tmp_path):
        store = str(tmp_path / "store")
        docs = _docs(["x", "y"])
        dedup_against_store(docs, store, "checksum", "doc_id", ingest_key="a")
        fresh, _ = dedup_against_store(docs, store, "checksum", "doc_id")
        assert fresh.count() == 0


class TestStoreMechanics:
    def test_bucket_pruned_reads(self, ray_session, tmp_path):
        store_dir = str(tmp_path / "store")
        # big seed spread over many buckets, tiny delta → few buckets read
        dedup_against_store(
            _docs([f"seed {i}" for i in range(500)]), store_dir, "checksum", "doc_id",
            ingest_key="seed",
        )
        store = SeenKeyStore(store_dir, key_col="checksum")
        fresh = store.filter_fresh(_docs(["seed 3", "brand new"], start=900), order_col="doc_id")
        assert sorted(fresh.to_pandas()["text"]) == ["brand new"]
        assert 0 < store.last_stats["buckets_read"] <= 2
        assert store.last_stats["buckets_total"] == 64

    def test_ingest_idempotent_and_touched_only(self, ray_session, tmp_path):
        store_dir = str(tmp_path / "store")
        _, s1 = dedup_against_store(
            _docs([f"a{i}" for i in range(100)]), store_dir, "checksum", "doc_id",
            ingest_key="run1",
        )
        assert s1["ingest"]["status"] == "ingested"
        n_buckets_v1 = s1["ingest"]["stats"]["touched"]
        # second run touches few buckets; the rest must be carried, not rewritten
        _, s2 = dedup_against_store(
            _docs(["one new doc"], start=500), store_dir, "checksum", "doc_id",
            ingest_key="run2",
        )
        assert s2["ingest"]["stats"]["touched"] == 1
        # every v1 bucket except (at most) the one the new key hashes into
        # is carried by hardlink, not rewritten
        assert s2["ingest"]["stats"]["untouched"] >= n_buckets_v1 - 1
        # idempotent replay: journaled key is a no-op
        _, s3 = dedup_against_store(
            _docs(["one new doc"], start=500), store_dir, "checksum", "doc_id",
            ingest_key="run2",
        )
        assert s3["ingest"]["status"] == "already_ingested"

    def test_zero_fresh_ingest_is_all_hardlinks(self, ray_session, tmp_path):
        store_dir = str(tmp_path / "store")
        docs = _docs([f"z{i}" for i in range(20)])
        dedup_against_store(docs, store_dir, "checksum", "doc_id", ingest_key="r1")
        _, s2 = dedup_against_store(docs, store_dir, "checksum", "doc_id", ingest_key="r2")
        assert s2["ingest"]["stats"]["touched"] == 0
        # the store still answers correctly after the no-data version bump
        store = SeenKeyStore(store_dir, key_col="checksum")
        fresh = store.filter_fresh(_docs(["z0", "fresh"], start=800), order_col="doc_id")
        assert sorted(fresh.to_pandas()["text"]) == ["fresh"]

    def test_layout_mismatch_rejected(self, ray_session, tmp_path):
        store_dir = str(tmp_path / "store")
        dedup_against_store(_docs(["a"]), store_dir, "checksum", "doc_id", ingest_key="r1")
        with pytest.raises(ValueError, match="layout"):
            SeenKeyStore(store_dir, key_col="checksum", n_buckets=128)
        with pytest.raises(ValueError, match="layout"):
            SeenKeyStore(store_dir, key_col="text")

    def test_current_pointer_survives_crashed_staging(self, ray_session, tmp_path):
        store_dir = str(tmp_path / "store")
        dedup_against_store(_docs(["a", "b"]), store_dir, "checksum", "doc_id", ingest_key="r1")
        store = SeenKeyStore(store_dir, key_col="checksum")
        v1 = store.current_dir()
        # simulate a crashed attempt: stale staging dir must not be read
        os.makedirs(os.path.join(store_dir, "versions", ".staging-v00002"), exist_ok=True)
        assert SeenKeyStore(store_dir, key_col="checksum").current_dir() == v1
        fresh = store.filter_fresh(_docs(["a", "c"], start=10), order_col="doc_id")
        assert sorted(fresh.to_pandas()["text"]) == ["c"]


class TestResumableSeenStore:
    """run_kg_build_resumable(seen_store_dir=...): cross-run content
    dedup composed with partition checkpointing."""

    def _files(self, tmp_path, corpus, name, parts=2):
        import pyarrow.parquet as pq

        docs = corpus.documents
        half = docs.num_rows // parts
        out = []
        for i in range(parts):
            p = str(tmp_path / f"{name}_{i}.parquet")
            sl = docs.slice(i * half, half if i < parts - 1 else docs.num_rows - i * half)
            pq.write_table(sl, p)
            out.append(p)
        return out

    def test_second_identical_run_skips_everything(self, ray_session, tmp_path):
        import ray.data as rd

        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.fixtures import generate_corpus
        from fancyrag_ray.pipelines.kg_build import run_kg_build_resumable

        corpus = generate_corpus(60, seed=7)
        files = self._files(tmp_path, corpus, "a")
        store = str(tmp_path / "seen")
        cfg = PipelineConfig(embed_dim=16)

        r1 = run_kg_build_resumable(files, str(tmp_path / "out1"), cfg=cfg,
                                    alias_table=corpus.aliases, seen_store_dir=store)
        assert r1["status"] == "done"
        n1 = rd.read_parquet(str(tmp_path / "out1" / "linked")).count()
        assert n1 > 0

        # same corpus, NEW out_dir, same store → all docs skipped,
        # empty-but-committed outputs, no crash
        r2 = run_kg_build_resumable(files, str(tmp_path / "out2"), cfg=cfg,
                                    alias_table=corpus.aliases, seen_store_dir=store)
        assert r2["status"] == "done"
        import glob
        assert glob.glob(str(tmp_path / "out2" / "linked" / "**" / "*.parquet"), recursive=True) == []

    def test_overlapping_second_run_processes_only_new_docs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.fixtures import generate_corpus
        from fancyrag_ray.pipelines.kg_build import run_kg_build_resumable

        big = generate_corpus(80, seed=7)
        cfg = PipelineConfig(embed_dim=16)
        store = str(tmp_path / "seen")

        first = big.documents.slice(0, 50)
        second = big.documents.slice(30)  # docs 30-49 overlap, 50-79 new
        f1 = str(tmp_path / "first.parquet"); pq.write_table(first, f1)
        f2 = str(tmp_path / "second.parquet"); pq.write_table(second, f2)

        run_kg_build_resumable([f1], str(tmp_path / "o1"), cfg=cfg,
                               alias_table=big.aliases, seen_store_dir=store)
        r2 = run_kg_build_resumable([f2], str(tmp_path / "o2"), cfg=cfg,
                                    alias_table=big.aliases, seen_store_dir=store)
        assert r2["status"] == "done"
        chunks2 = rd.read_parquet(str(tmp_path / "o2" / "chunks")).to_pandas()
        new_ids = set(big.documents.slice(50).column("doc_id").to_pylist())
        assert set(chunks2["doc_id"]) == new_ids  # only the 30 unseen docs

    def test_crash_between_commit_and_ingest_heals(self, ray_session, tmp_path):
        import json
        import os

        import ray.data as rd

        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.fixtures import generate_corpus
        from fancyrag_ray.pipelines.ingest_dedup import SeenKeyStore
        from fancyrag_ray.pipelines.kg_build import run_kg_build_resumable

        corpus = generate_corpus(40, seed=7)
        files = self._files(tmp_path, corpus, "a")
        store_dir = str(tmp_path / "seen")
        cfg = PipelineConfig(embed_dim=16)
        out = str(tmp_path / "out")
        run_kg_build_resumable(files, out, cfg=cfg, alias_table=corpus.aliases,
                               seen_store_dir=store_dir)

        # simulate the crash: roll the store back to a version whose
        # journal is missing the last partition's ingest
        store = SeenKeyStore(store_dir, key_col="doc_key")
        jpath = os.path.join(store.current_dir(), "journal.json")
        j = json.load(open(jpath))
        assert j["ingests"] == ["p00000", "p00001"]
        j["ingests"] = ["p00000"]
        json.dump(j, open(jpath, "w"))

        # resume with the same out_dir: manifest says both partitions
        # done, so no re-processing — but p00001's dockeys re-ingest
        r = run_kg_build_resumable(files, out, cfg=cfg, alias_table=corpus.aliases,
                                   seen_store_dir=store_dir)
        assert r["status"] == "done" and r["recomputed"] == 0
        store2 = SeenKeyStore(store_dir, key_col="doc_key")
        assert store2.ingested_keys() == ["p00000", "p00001"]


class TestResumableGraphStore:
    """run_kg_build_resumable(graph_store_dir=...): the GLOBAL phase is
    O(delta partitions) on resume — per-partition node/edge partials
    merge into a persistent IncrementalStore under the partition id."""

    def _files(self, tmp_path, corpus, name, parts=3):
        import pyarrow.parquet as pq

        docs = corpus.documents
        step = docs.num_rows // parts
        out = []
        for i in range(parts):
            p = str(tmp_path / f"{name}_{i}.parquet")
            sl = docs.slice(i * step, step if i < parts - 1 else docs.num_rows - i * step)
            pq.write_table(sl, p)
            out.append(p)
        return out

    def test_kill_resume_global_phase_is_o_delta(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.fixtures import generate_corpus
        from fancyrag_ray.pipelines.compact import IncrementalStore
        from fancyrag_ray.pipelines.kg_build import run_kg_build_resumable

        corpus = generate_corpus(60, seed=9)
        files = self._files(tmp_path, corpus, "g", parts=3)
        cfg = PipelineConfig(embed_dim=16)
        gstore = str(tmp_path / "graph_store")
        out = str(tmp_path / "out")

        # kill after 2 of 3 partitions
        r1 = run_kg_build_resumable(files, out, cfg=cfg, alias_table=corpus.aliases,
                                    fail_after=2, graph_store_dir=gstore)
        assert r1["status"] == "aborted" and r1["completed"] == 2
        assert IncrementalStore(gstore).ingested_keys() == ["p00000", "p00001"]

        # resume: only the third partition recomputes AND only it ingests
        r2 = run_kg_build_resumable(files, out, cfg=cfg, alias_table=corpus.aliases,
                                    graph_store_dir=gstore)
        assert r2["status"] == "done" and r2["recomputed"] == 1
        assert [s["pid"] for s in r2["graph_ingests"]] == ["p00002"]
        assert IncrementalStore(gstore).ingested_keys() == ["p00000", "p00001", "p00002"]

        # the store-backed nodes/edges equal a plain one-shot derivation
        ref = run_kg_build_resumable(files, str(tmp_path / "ref"), cfg=cfg,
                                     alias_table=corpus.aliases)

        def _tbl(d, t):
            df = rd.read_parquet(str(tmp_path / d / t)).to_pandas()
            df = df.drop(columns=[c for c in ("bucket",) if c in df.columns])
            cols = sorted(df.columns)
            return df[cols].sort_values(cols).reset_index(drop=True)

        for t in ("nodes", "edges"):
            assert _tbl("out", t).equals(_tbl("ref", t)), t

        # a THIRD run over the same inputs: nothing recomputes, nothing
        # ingests — the global phase is pure hardlink metadata
        r3 = run_kg_build_resumable(files, out, cfg=cfg, alias_table=corpus.aliases,
                                    graph_store_dir=gstore)
        assert r3["recomputed"] == 0 and r3["graph_ingests"] == []
        for t in ("nodes", "edges"):
            assert _tbl("out", t).equals(_tbl("ref", t)), t
