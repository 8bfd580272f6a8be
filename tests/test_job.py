"""``python -m fancyrag_ray.job`` entrypoint: argument surface, resume
behavior through the CLI, and the machine-readable summary contract."""

import json
import os

import pytest

from fancyrag_ray.fixtures import generate_corpus, write_corpus
from fancyrag_ray.job import main, run


@pytest.fixture(scope="module")
def sharded_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jobdocs")
    corpus = generate_corpus(120, seed=11)
    paths = write_corpus(corpus, str(d), n_doc_files=4)
    # the job's --input points at the documents SHARD DIR (aliases and
    # goldens live beside it and must not be discovered as shards)
    return paths["documents"]


class TestJobEntrypoint:
    def test_full_build(self, ray_session, sharded_docs, tmp_path, capsys):
        out = str(tmp_path / "kg")
        rc = main(["--input", sharded_docs, "--output", out])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["status"] == "done"
        assert summary["total"] == 4 and summary["completed"] == 4
        for sub in ("nodes", "edges", "manifest.jsonl", "run_log.json"):
            assert os.path.exists(os.path.join(out, sub)), sub

    def test_kill_resume(self, ray_session, sharded_docs, tmp_path, capsys):
        out = str(tmp_path / "kg")
        rc = main(["--input", sharded_docs, "--output", out, "--fail-after", "2"])
        assert rc == 3  # aborted
        aborted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert aborted["status"] == "aborted" and aborted["completed"] == 2
        # resume recomputes ONLY the missing partitions
        resumed = run(["--input", sharded_docs, "--output", out])
        assert resumed["status"] == "done"
        assert resumed["recomputed"] == 2 and resumed["completed"] == 4

    def test_graph_store_resume_is_o_delta(self, ray_session, sharded_docs, tmp_path):
        out = str(tmp_path / "kg")
        store = str(tmp_path / "gstore")
        run(["--input", sharded_docs, "--output", out, "--graph-store", store, "--fail-after", "3"])
        resumed = run(["--input", sharded_docs, "--output", out, "--graph-store", store])
        # only the delta partition ingested on resume
        assert [g["pid"] for g in resumed["graph_ingests"]] == ["p00003"]

    def test_bad_profile_and_missing_input(self, ray_session, tmp_path, capsys):
        with pytest.raises(SystemExit):
            run(["--input", str(tmp_path), "--output", str(tmp_path / "o"), "--profile", "nope"])
        rc = main(["--input", str(tmp_path / "absent"), "--output", str(tmp_path / "o")])
        assert rc == 1
        err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert err["status"] == "error"

    def test_single_file_input(self, ray_session, sharded_docs, tmp_path):
        import glob

        one = sorted(glob.glob(os.path.join(sharded_docs, "**", "*.parquet"), recursive=True))
        docs = [f for f in one if "documents" in f][0]
        result = run(["--input", docs, "--output", str(tmp_path / "kg1")])
        assert result["status"] == "done" and result["total"] == 1


class TestNumShards:
    def test_group_shards_balanced_and_deterministic(self):
        from fancyrag_ray.job import group_shards

        files = [f"f{i}" for i in range(10)]
        g = group_shards(files, 3)
        assert [len(x) for x in g] == [4, 3, 3]
        assert [f for grp in g for f in grp] == files  # order-preserving
        assert group_shards(files, None) == files  # default: per-file
        assert group_shards(files, 99) == files  # more shards than files

    def test_num_shards_build_equals_per_file(self, ray_session, sharded_docs, tmp_path):
        """--num-shards N groups files into N checkpoint partitions; the
        final graph is identical to the one-partition-per-file build
        (the global merge is associative over partition partials)."""
        import pyarrow.parquet as pq

        out1 = str(tmp_path / "kg_perfile")
        out2 = str(tmp_path / "kg_grouped")
        r1 = run(["--input", sharded_docs, "--output", out1])
        r2 = run(["--input", sharded_docs, "--output", out2, "--num-shards", "2"])
        assert r1["total"] == 4 and r2["total"] == 2
        assert r2["status"] == "done"

        def edge_set(d):
            t = pq.read_table(os.path.join(d, "edges"))
            cols = sorted(t.column_names)
            return sorted(zip(*[t.column(c).to_pylist() for c in cols]))

        assert edge_set(out1) == edge_set(out2)
