"""End-to-end flagship pipeline tests on the deterministic synthetic
interleaved corpus: triple P/R vs goldens, the per-row span-sequence
invariant, and MERGE-equivalent dedup of nodes/edges."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from fancyrag_ray.config import PipelineConfig
from fancyrag_ray.pipelines.kg_build import run_kg_build


def _linked_to_fact_set(linked_tbl: pa.Table) -> set:
    """Distinct (doc_id, canonical_subj, pred, canonical_obj)."""
    return set(
        zip(
            linked_tbl.column("doc_id").to_pylist(),
            linked_tbl.column("subj_canonical").to_pylist(),
            linked_tbl.column("pred").to_pylist(),
            linked_tbl.column("obj_canonical").to_pylist(),
        )
    )


def _golden_fact_set(golden: pa.Table) -> set:
    return set(
        zip(
            golden.column("doc_id").to_pylist(),
            golden.column("subj").to_pylist(),
            golden.column("pred").to_pylist(),
            golden.column("obj").to_pylist(),
        )
    )


class TestFlagship:
    def test_triple_precision_recall(self, small_corpus):
        corpus, paths = small_corpus
        docs = rd.from_arrow(corpus.documents)
        result = run_kg_build(docs, alias_table=corpus.aliases, cfg=PipelineConfig())
        got = _linked_to_fact_set(pa.table(result.linked.to_pandas()))
        want = _golden_fact_set(corpus.golden_triples)
        assert want, "generator must plant facts"
        tp = len(got & want)
        precision = tp / max(1, len(got))
        recall = tp / max(1, len(want))
        assert precision >= 0.95, f"precision {precision:.3f} (got {len(got)}, want {len(want)})"
        assert recall >= 0.95, f"recall {recall:.3f} (got {len(got)}, want {len(want)})"

    def test_span_sequence_invariant(self, small_corpus):
        """Chunk rows preserve (kind, text, media_ref, order) per doc:
        de-overlapped chunk texts rebuild the concatenated input text, and
        media refs appear in input order."""
        corpus, _ = small_corpus
        docs = rd.from_arrow(corpus.documents)
        cfg = PipelineConfig()
        from fancyrag_ray.pipelines.kg_build import build_chunks

        chunks = pa.table(build_chunks(docs, cfg).to_pandas())

        # input: per-doc concatenated text + ordered media refs
        in_text: dict[str, str] = {}
        in_refs: dict[str, list] = {}
        spans_col = corpus.documents.column("spans")
        for i, doc_id in enumerate(corpus.documents.column("doc_id").to_pylist()):
            parts, refs = [], []
            for sp in spans_col[i].as_py():
                if sp["kind"] == "text":
                    parts.append(sp["text"])
                elif sp["media_ref"]:
                    refs.append(sp["media_ref"])
            in_text[doc_id] = "".join(parts)
            in_refs[doc_id] = refs

        df = chunks.to_pandas()
        for doc_id, g in df.groupby("doc_id"):
            g = g.sort_values("seq")
            rebuilt = ""
            prev_end = 0
            for _, row in g.iterrows():
                s, e, t = row["offset_start"], row["offset_end"], row["text"]
                assert e - s == len(t)
                assert s <= prev_end, "gap between consecutive chunks"
                rebuilt += t[prev_end - s:]
                prev_end = e
            assert rebuilt == in_text[doc_id], f"text not preserved for {doc_id}"
            seen_refs = []
            for refs in g["media_refs"]:
                for r in refs:
                    if r not in seen_refs:
                        seen_refs.append(r)
            assert seen_refs == in_refs[doc_id], f"media order not preserved for {doc_id}"

    def test_nodes_edges_deduped(self, small_corpus):
        corpus, _ = small_corpus
        docs = rd.from_arrow(corpus.documents)
        result = run_kg_build(docs, alias_table=corpus.aliases, cfg=PipelineConfig())
        nodes = result.nodes.to_pandas()
        assert nodes["entity_id"].is_unique
        edges = result.edges.to_pandas()
        assert not edges.duplicated(subset=["src_id", "type", "dst_id"]).any()
        # every edge endpoint exists as a node
        ids = set(nodes["entity_id"])
        assert set(edges["src_id"]).issubset(ids)
        assert set(edges["dst_id"]).issubset(ids)
        # linked LAUNCHED triples resolve to canonical entities with labels
        launched = edges[edges["type"] == "LAUNCHED"]
        assert len(launched) > 0
        assert (nodes.set_index("entity_id").loc[list(set(launched["src_id"])), "label"] == "Company").all()

    def test_embeddings_shape(self, small_corpus):
        corpus, _ = small_corpus
        docs = rd.from_arrow(corpus.documents)
        cfg = PipelineConfig(embed_dim=64)  # small dim for speed
        from fancyrag_ray.pipelines.kg_build import build_chunks, build_embeddings

        emb = build_embeddings(build_chunks(docs, cfg), cfg)
        t = pa.table(emb.to_pandas())
        assert t.num_rows > 0
        first = t.column("embedding")[0].as_py()
        assert len(first) == 64
        import numpy as np

        assert abs(float(np.linalg.norm(first)) - 1.0) < 1e-5


class TestMediaFrameManifest:
    def test_deterministic_counts_and_flattening(self, ray_session, tmp_path):
        """doc_ids 1..21: ids % 3 == 0 get an image span (7), % 5 == 0
        audio (4), % 7 == 0 video (3); video rows flatten 1→N with
        N = min(16, max(1, int(1.0 + sha256(payload)[3]))) — re-derive N
        exactly and pin the totals."""
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        from fancyrag_ray.stages.multimodal import media_frame_manifest

        ids = list(range(1, 22))
        t = pa.table({"doc_id": ids, "text": [f"doc {i} text" for i in ids]})
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))

        out = media_frame_manifest(str(d)).set_index("kind")
        assert out.loc["image", "n_media"] == 7 and out.loc["image", "n_rows_out"] == 7
        assert out.loc["audio", "n_media"] == 4 and out.loc["audio", "n_rows_out"] == 4
        assert out.loc["video", "n_media"] == 3
        want_frames = 0
        for i in ids:
            if i % 7 == 0:
                payload = hashlib.sha256(f"media://video/{i}".encode()).digest() * 4
                h = hashlib.sha256(payload).digest()
                want_frames += min(16, max(1, int((1.0 + h[3]) * 1.0)))
        assert out.loc["video", "n_rows_out"] == want_frames
