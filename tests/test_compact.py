"""Incremental-ingest compaction (MERGE-over-history parity,
reference ``neo4j_queries.py:87-108``) + trivia: O5 top-k validation,
D6 report-dir collision suffix, S4 empty-source guard."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fancyrag_ray.config import PipelineConfig
from fancyrag_ray.fixtures import generate_corpus
from fancyrag_ray.pipelines.compact import compact_into_store
from fancyrag_ray.pipelines.kg_build import run_kg_build
from fancyrag_ray.sources.io import read_table


def _sorted_nodes(store):
    df = read_table(f"{store}/nodes").to_pandas()
    return df.sort_values(["entity_id", "label", "name"]).reset_index(drop=True)


def _sorted_edges(store):
    df = read_table(f"{store}/edges").to_pandas()
    return df.sort_values(["src_id", "type", "dst_id"]).reset_index(drop=True)


class TestCompaction:
    def test_two_sequential_ingests_equal_one_combined(self, ray_session, tmp_path):
        corpus = generate_corpus(240, seed=11)
        docs = corpus.documents
        half = docs.num_rows // 2
        d1, d2 = docs.slice(0, half), docs.slice(half)

        def build(tbl):
            r = run_kg_build(rd.from_arrow(tbl), alias_table=corpus.aliases, cfg=PipelineConfig())
            return r.nodes.materialize(), r.edges.materialize()

        # sequential: ingest halves one after the other
        seq_store = str(tmp_path / "seq")
        n1, e1 = build(d1)
        meta1 = compact_into_store(n1, e1, seq_store)
        n2, e2 = build(d2)
        meta2 = compact_into_store(n2, e2, seq_store)
        assert meta1["version"] == 1 and meta2["version"] == 2

        # combined: one ingest of everything
        all_store = str(tmp_path / "all")
        na, ea = build(docs)
        compact_into_store(na, ea, all_store)

        pd.testing.assert_frame_equal(_sorted_nodes(seq_store), _sorted_nodes(all_store))
        pd.testing.assert_frame_equal(_sorted_edges(seq_store), _sorted_edges(all_store))

    def test_reingest_same_data_doubles_counts_not_rows(self, ray_session, tmp_path):
        corpus = generate_corpus(60, seed=3)
        r = run_kg_build(rd.from_arrow(corpus.documents), alias_table=corpus.aliases)
        nodes, edges = r.nodes.materialize(), r.edges.materialize()
        store = str(tmp_path / "store")
        compact_into_store(nodes, edges, store)
        before_n, before_e = _sorted_nodes(store), _sorted_edges(store)
        compact_into_store(nodes, edges, store)
        after_n, after_e = _sorted_nodes(store), _sorted_edges(store)
        # MERGE semantics: same keys, counts doubled, no duplicate rows
        assert len(after_n) == len(before_n) and len(after_e) == len(before_e)
        assert (after_n["mentions"].values == 2 * before_n["mentions"].values).all()
        assert (after_e["n_mentions"].values == 2 * before_e["n_mentions"].values).all()


class TestTrivia:
    def test_top_k_validation(self):
        from fancyrag_ray.pipelines.retrieval import validate_top_k

        validate_top_k(1)
        validate_top_k(5, effective_search_ratio=2.0)
        with pytest.raises(ValueError, match="top_k"):
            validate_top_k(0)
        with pytest.raises(ValueError, match="top_k"):
            validate_top_k(-3)
        with pytest.raises(ValueError, match="ratio"):
            validate_top_k(5, effective_search_ratio=0.5)

    def test_vector_topk_rejects_bad_k(self, ray_session):
        import pyarrow as pa

        from fancyrag_ray.pipelines.retrieval import vector_topk

        emb = rd.from_arrow(pa.table({"chunk_uid": ["a"], "embedding": [[1.0, 0.0]]}))
        with pytest.raises(ValueError, match="top_k"):
            vector_topk(emb, np.array([1.0, 0.0]), k=0)

    def test_report_dir_collision_suffix(self, tmp_path):
        from fancyrag_ray.pipelines.qa import unique_report_dir

        base = str(tmp_path / "qa-2026-01-01")
        d0 = unique_report_dir(base)
        d1 = unique_report_dir(base)
        d2 = unique_report_dir(base)
        assert d0 == base
        assert d1 == base + "-01"
        assert d2 == base + "-02"

    def test_empty_sources_raise(self, ray_session, tmp_path):
        from fancyrag_ray.pipelines.kg_build import run_kg_build_resumable

        with pytest.raises(ValueError, match="no source"):
            run_kg_build_resumable([], str(tmp_path / "out"))


class TestDiscovery:
    def test_glob_include_deterministic_order(self, tmp_path):
        from fancyrag_ray.sources.io import discover_partitions

        (tmp_path / "sub").mkdir()
        for name in ["b.parquet", "a.parquet", "sub/c.parquet", "skip.json"]:
            (tmp_path / name).write_text("x")
        got = discover_partitions(str(tmp_path))
        rel = [p.replace(str(tmp_path) + "/", "") for p in got]
        assert rel == ["a.parquet", "b.parquet", "sub/c.parquet"]

    def test_multiple_patterns_dedupe(self, tmp_path):
        from fancyrag_ray.sources.io import discover_partitions

        (tmp_path / "x.parquet").write_text("x")
        got = discover_partitions(str(tmp_path), include=("*.parquet", "x.*"))
        assert len(got) == 1

    def test_nothing_matched_raises(self, tmp_path):
        from fancyrag_ray.sources.io import discover_partitions

        with pytest.raises(FileNotFoundError, match="no input partitions"):
            discover_partitions(str(tmp_path))


class TestIncrementalCompaction:
    """O(delta) bucketed compaction: same associative merge, but an
    ingest re-reduces only the buckets its delta touches."""

    @staticmethod
    def _logical(df, keys):
        drop = [c for c in df.columns if c == "bucket"]
        return (
            df.drop(columns=drop)
            .sort_values(keys)
            .reset_index(drop=True)
            .reindex(sorted(df.drop(columns=drop).columns), axis=1)
        )

    def test_incremental_equals_full_reduce(self, ray_session, tmp_path):
        from fancyrag_ray.pipelines.compact import compact_incremental

        corpus = generate_corpus(240, seed=19)
        docs = corpus.documents
        half = docs.num_rows // 2
        d1, d2 = docs.slice(0, half), docs.slice(half)

        def build(tbl):
            r = run_kg_build(rd.from_arrow(tbl), alias_table=corpus.aliases, cfg=PipelineConfig())
            return r.nodes.materialize(), r.edges.materialize()

        inc_store = str(tmp_path / "inc")
        n1, e1 = build(d1)
        m1 = compact_incremental(n1, e1, inc_store, n_buckets=16)
        n2, e2 = build(d2)
        m2 = compact_incremental(n2, e2, inc_store, n_buckets=16)
        assert m1["version"] == 1 and m2["version"] == 2

        full_store = str(tmp_path / "full")
        na, ea = build(docs)
        compact_into_store(na, ea, full_store)

        for table, keys in (("nodes", ["entity_id", "label", "name"]),
                            ("edges", ["src_id", "type", "dst_id"])):
            inc = self._logical(read_table(f"{inc_store}/{table}").to_pandas(), keys)
            full = self._logical(read_table(f"{full_store}/{table}").to_pandas(), keys)
            pd.testing.assert_frame_equal(inc, full, check_dtype=False)

    def test_untouched_buckets_are_not_rewritten(self, ray_session, tmp_path):
        import glob
        import os

        import pyarrow as pa

        from fancyrag_ray.pipelines.compact import compact_incremental

        def mk(entities):
            nodes = rd.from_arrow(pa.table({
                "entity_id": entities, "label": ["T"] * len(entities),
                "name": entities, "mentions": [1] * len(entities),
            }))
            edges = rd.from_arrow(pa.table({
                "src_id": entities, "type": ["R"] * len(entities), "dst_id": entities,
                "n_mentions": [1] * len(entities),
                "first_doc": ["d1"] * len(entities), "last_doc": ["d1"] * len(entities),
            }))
            return nodes, edges

        store = str(tmp_path / "store")
        n1, e1 = mk([f"e{i}" for i in range(200)])  # spread over many buckets
        compact_incremental(n1, e1, store, n_buckets=16)
        inodes_before = {
            f: os.stat(f).st_ino for f in glob.glob(f"{store}/nodes/bucket=*/*.parquet")
        }
        # second ingest touches exactly one key → ≤1 bucket rewritten
        n2, e2 = mk(["e0"])
        stats = compact_incremental(n2, e2, store, n_buckets=16)
        assert stats["nodes"]["touched"] == 1
        assert stats["nodes"]["untouched"] >= 10
        same_inode = 0
        for f, ino in inodes_before.items():
            if os.path.exists(f) and os.stat(f).st_ino == ino:
                same_inode += 1
        # untouched bucket files survive as hardlinks (same inode)
        assert same_inode >= len(inodes_before) - 4

    def test_bucket_count_is_pinned(self, ray_session, tmp_path):
        import pyarrow as pa

        from fancyrag_ray.pipelines.compact import compact_incremental

        nodes = rd.from_arrow(pa.table({"entity_id": ["a"], "label": ["T"],
                                        "name": ["a"], "mentions": [1]}))
        edges = rd.from_arrow(pa.table({"src_id": ["a"], "type": ["R"], "dst_id": ["a"],
                                        "n_mentions": [1], "first_doc": ["d"], "last_doc": ["d"]}))
        store = str(tmp_path / "store")
        compact_incremental(nodes, edges, store, n_buckets=8)
        with pytest.raises(ValueError):
            compact_incremental(nodes, edges, store, n_buckets=16)


class TestIncrementalBuild:
    """run_kg_build_incremental: resumable build whose global phase is
    O(delta) via the transactionally versioned IncrementalStore."""

    @staticmethod
    def _files(tmp_path, corpus, n_parts=4):
        import os

        import pyarrow.parquet as pq

        d = tmp_path / "docs"
        d.mkdir(exist_ok=True)
        docs = corpus.documents
        step = (docs.num_rows + n_parts - 1) // n_parts
        files = []
        for i in range(n_parts):
            part = docs.slice(i * step, step)
            if part.num_rows:
                f = str(d / f"part-{i:05d}.parquet")
                pq.write_table(part, f)
                files.append(f)
        return files

    @staticmethod
    def _logical(ds, keys):
        df = ds.to_pandas()
        df = df.drop(columns=[c for c in df.columns if c == "bucket"])
        return (
            df.sort_values(keys).reset_index(drop=True)
            .reindex(sorted(df.columns), axis=1)
        )

    def test_matches_resumable_build(self, ray_session, tmp_path):
        from fancyrag_ray.pipelines.compact import IncrementalStore
        from fancyrag_ray.pipelines.kg_build import (
            run_kg_build_incremental,
            run_kg_build_resumable,
        )

        corpus = generate_corpus(200, seed=23)
        files = self._files(tmp_path, corpus)
        cfg = PipelineConfig(embed_dim=16)

        inc_out = str(tmp_path / "inc")
        res = run_kg_build_incremental(files, inc_out, cfg=cfg, alias_table=corpus.aliases,
                                       n_buckets=8)
        assert res["status"] == "done" and res["ingested"] == len(files)

        full_out = str(tmp_path / "full")
        run_kg_build_resumable(files, full_out, cfg=cfg, alias_table=corpus.aliases)

        store = IncrementalStore(os.path.join(inc_out, "store"), n_buckets=8)
        for table, keys in (("nodes", ["entity_id", "label", "name"]),
                            ("edges", ["src_id", "type", "dst_id"])):
            inc = self._logical(store.table(table), keys)
            full = self._logical(read_table(os.path.join(full_out, table)), keys)
            pd.testing.assert_frame_equal(inc, full, check_dtype=False)

    def test_crash_resume_and_replay_idempotence(self, ray_session, tmp_path):
        from fancyrag_ray.pipelines.compact import IncrementalStore
        from fancyrag_ray.pipelines.kg_build import run_kg_build_incremental

        corpus = generate_corpus(160, seed=29)
        files = self._files(tmp_path, corpus, n_parts=3)
        cfg = PipelineConfig(embed_dim=16)
        out = str(tmp_path / "out")

        aborted = run_kg_build_incremental(files, out, cfg=cfg, alias_table=corpus.aliases,
                                           fail_after=1, n_buckets=8)
        assert aborted["status"] == "aborted" and aborted["ingested"] == 1
        resumed = run_kg_build_incremental(files, out, cfg=cfg, alias_table=corpus.aliases,
                                           n_buckets=8)
        assert resumed["status"] == "done" and resumed["ingested"] == 3

        store = IncrementalStore(os.path.join(out, "store"), n_buckets=8)
        before = self._logical(store.table("nodes"), ["entity_id", "label", "name"])
        version_before = store.current_dir()

        # full replay: every partition already journaled → all no-ops
        replay = run_kg_build_incremental(files, out, cfg=cfg, alias_table=corpus.aliases,
                                          n_buckets=8)
        assert replay["ingested"] == 3
        store2 = IncrementalStore(os.path.join(out, "store"), n_buckets=8)
        assert store2.current_dir() == version_before  # no new version
        after = self._logical(store2.table("nodes"), ["entity_id", "label", "name"])
        pd.testing.assert_frame_equal(before, after)

    def test_ingest_key_idempotent(self, ray_session, tmp_path):
        import pyarrow as pa

        from fancyrag_ray.pipelines.compact import IncrementalStore

        nodes = rd.from_arrow(pa.table({"entity_id": ["a"], "label": ["T"],
                                        "name": ["a"], "mentions": [2]}))
        edges = rd.from_arrow(pa.table({"src_id": ["a"], "type": ["R"], "dst_id": ["a"],
                                        "n_mentions": [1], "first_doc": ["d"],
                                        "last_doc": ["d"]}))
        store = IncrementalStore(str(tmp_path / "s"), n_buckets=4)
        r1 = store.ingest(nodes, edges, key="p1")
        r2 = store.ingest(nodes, edges, key="p1")  # replay: no-op
        assert r1["status"] == "ingested" and r2["status"] == "already_ingested"
        df = store.table("nodes").to_pandas()
        assert df["mentions"].sum() == 2  # not doubled
