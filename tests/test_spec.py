"""Declarative pipeline-spec tests (§2.10 extension surface)."""

import pytest
import ray.data as rd

from fancyrag_ray.pipelines.spec import register_stage, run_spec


class TestSpec:
    def test_full_pipeline_spec(self, small_corpus, ray_session):
        corpus, _ = small_corpus
        docs = rd.from_arrow(corpus.documents)
        spec = {
            "profile": "text",
            "config": {"embed_dim": 32},
            "stages": [
                {"stage": "filter_valid"},
                {"stage": "chunk"},
                {"stage": "embed"},
                {"stage": "extract"},
                {"stage": "link"},
                {"stage": "materialize"},
            ],
        }
        out = run_spec(docs, spec, alias_table=corpus.aliases)
        assert {"chunks", "embeddings", "triples", "linked", "nodes", "edges"} <= set(out)
        assert out["nodes"].count() > 0
        assert out["edges"].count() > 0

    def test_unknown_stage_raises(self, small_corpus, ray_session):
        corpus, _ = small_corpus
        with pytest.raises(ValueError, match="unknown stage"):
            run_spec(rd.from_arrow(corpus.documents), {"stages": [{"stage": "nope"}]})

    def test_custom_stage_plugin(self, small_corpus, ray_session):
        corpus, _ = small_corpus

        @register_stage("head")
        def _head(ctx, ds, n=5):
            return ds.limit(int(n))

        out = run_spec(
            rd.from_arrow(corpus.documents),
            {"stages": [{"stage": "head", "options": {"n": 3}}, {"stage": "chunk"}]},
        )
        assert out["chunks"].to_pandas()["doc_id"].nunique() <= 3
