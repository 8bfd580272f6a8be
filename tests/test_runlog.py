"""Run-log sink + provenance annotation tests (S10/M5/M9 parity)."""

import json

import pyarrow as pa
import ray.data as rd

from fancyrag_ray.state.manifest import resolve_git_commit, write_run_log


class TestRunLog:
    def test_secrets_scrubbed_and_atomic(self, tmp_path):
        p = str(tmp_path / "log.json")
        write_run_log(p, {"status": "done", "api_key": "sk-supersecret123", "note": "Bearer abcdef123456"})
        data = json.load(open(p))
        assert data["status"] == "done"
        assert data["api_key"] == "***"
        assert "abcdef" not in data["note"]

    def test_git_commit_resolves_here(self):
        c = resolve_git_commit("/root/repo")
        assert c == "unknown" or len(c) == 40

    def test_annotate_provenance(self, ray_session):
        from fancyrag_ray.pipelines.kg_build import annotate_provenance

        ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
        out = annotate_provenance(ds, git_commit="abc123", profile="text").to_pandas()
        assert (out["git_commit"] == "abc123").all()
        assert (out["profile"] == "text").all()

    def test_resumable_writes_run_log(self, small_corpus, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from fancyrag_ray.config import PipelineConfig
        from fancyrag_ray.pipelines.kg_build import run_kg_build_resumable

        corpus, _ = small_corpus
        f = str(tmp_path / "docs.parquet")
        pq.write_table(corpus.documents.slice(0, 50), f)
        out = str(tmp_path / "out")
        run_kg_build_resumable([f], out, cfg=PipelineConfig(embed_dim=16), alias_table=corpus.aliases)
        log = json.load(open(f"{out}/run_log.json"))
        assert log["status"] == "done"
        assert log["total"] == 1
        assert "git_commit" in log
