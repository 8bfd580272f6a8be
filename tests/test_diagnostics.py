"""Diagnostics CLI parity (reference src/cli/diagnostics.py:516-580):
workspace dependency validation and the model readiness probe."""

import json
import os

import pytest

from fancyrag_ray import diagnostics as dg


class TestWorkspace:
    def test_report_written_and_green(self, tmp_path):
        report = dg.check_workspace(str(tmp_path))
        assert report["status"] == "success"
        assert report["missing"] == []
        assert report["modules"]["ray"]["importable"]
        path = os.path.join(str(tmp_path), dg.DEFAULT_REPORT_PATH)
        on_disk = json.load(open(path))
        assert on_disk["status"] == "success"

    def test_missing_required_module_fails_after_report(self, tmp_path, monkeypatch):
        monkeypatch.setattr(dg, "REQUIRED_MODULES", ["ray", "definitely_not_a_module"])
        with pytest.raises(dg.DependencyError, match="definitely_not_a_module"):
            dg.check_workspace(str(tmp_path))
        # reference behavior: the artifact still records WHAT was missing
        on_disk = json.load(open(os.path.join(str(tmp_path), dg.DEFAULT_REPORT_PATH)))
        assert on_disk["status"] == "failed"
        assert "definitely_not_a_module" in on_disk["missing"]

    def test_cli_main_exit_codes(self, tmp_path):
        assert dg.main(["workspace", "--root", str(tmp_path), "--no-report"]) == 0


class TestModelProbe:
    def test_fake_transport_green(self, tmp_path):
        report = dg.run_model_probe(str(tmp_path))
        assert report["status"] == "success"
        assert report["embedding"]["vector_length"] == 64
        assert report["client_metrics"]["calls"] == 1
        art = report["artifacts_dir"]
        assert json.load(open(os.path.join(art, "probe.json")))["status"] == "success"
        prom = open(os.path.join(art, "metrics.prom")).read()
        assert "model_probe_calls_total 1" in prom

    def test_retry_and_fallback_recorded(self, tmp_path):
        from fancyrag_ray.stages.fake_llm import DeterministicLlmTransport, ScriptedFailureTransport

        # first call 429s ⇒ client falls back + retries, then succeeds
        transport = ScriptedFailureTransport(DeterministicLlmTransport(), {"Acme": [429]})
        report = dg.run_model_probe(str(tmp_path), transport=transport, skip_live=False)
        assert report["status"] == "success"
        m = report["client_metrics"]
        assert m["retries"] == 1 and m["fallbacks"] == 1

    def test_exhausted_retries_reports_failure(self, tmp_path):
        from fancyrag_ray.stages.fake_llm import DeterministicLlmTransport, ScriptedFailureTransport

        transport = ScriptedFailureTransport(DeterministicLlmTransport(), {"Acme": [500, 500, 500]})
        report = dg.run_model_probe(str(tmp_path), transport=transport, skip_live=False, max_attempts=3)
        assert report["status"] == "failed"
        assert "remediation" in report["chat"]
        prom = open(os.path.join(report["artifacts_dir"], "metrics.prom")).read()
        assert "model_probe_failures_total 1" in prom
