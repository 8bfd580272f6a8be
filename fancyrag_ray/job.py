"""``ray job submit`` entrypoint for the flagship KG build.

The north-star deployment shape is a fixed-size multi-node cluster fed
by the Ray job API::

    ray job submit --working-dir . -- \\
        python -m fancyrag_ray.job --input /data/docs --output /data/kg \\
            --seen-store /data/state/seen --graph-store /data/state/graph

Inside the job driver, ``ray.init(address="auto")`` attaches to the
submitting cluster; standalone (tests, laptops, this sandbox) the same
command starts a local Ray. This module is the ONE library-side owner of
a Ray session besides ``bench.py`` and the test fixture — ``entry()`` /
``queries()`` and the package never call ``ray.init``.

The build itself is :func:`fancyrag_ray.pipelines.kg_build.
run_kg_build_resumable`: one checkpointed partition per input file,
per-partition lineage manifest (resume skips completed partitions),
optional cross-run content dedup (``--seen-store``) and O(delta)
incremental graph store (``--graph-store``). Exit code 0 on ``done``,
3 on ``aborted`` (``--fail-after`` test hook), 1 on error; the last
stdout line is one JSON summary object (machine-readable, the same
dict the run log persists).

Reference parity: ``scripts/kg_build.py`` CLI (argument surface:
source dir, profile, reset flags — ``src/fancyrag/cli/kg_build_main.py``),
re-shaped for cluster job submission instead of a single local process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections.abc import Iterable


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m fancyrag_ray.job",
        description="Resumable KG-construction build (ray job submit entrypoint)",
    )
    p.add_argument("--input", required=True, help="directory of document parquet shards (or one file)")
    p.add_argument("--output", required=True, help="output directory (manifest, chunks, nodes, edges, run_log)")
    p.add_argument("--profile", default="text", help="chunk profile preset (text|markdown|code|text-exact)")
    p.add_argument("--glob", default="*.parquet", help="input shard include pattern")
    p.add_argument("--seen-store", default=None, help="persistent seen-key store dir (cross-run content dedup)")
    p.add_argument("--graph-store", default=None, help="persistent incremental graph store dir (O(delta) resume)")
    p.add_argument("--alias-table", default=None, help="optional parquet of entity aliases for the linker")
    p.add_argument("--fail-after", type=int, default=None, help="abort after N partitions (kill/resume test hook)")
    p.add_argument("--num-cpus", type=int, default=None, help="standalone only: cap the local Ray session's CPUs")
    p.add_argument(
        "--num-shards", type=int, default=None,
        help="group the discovered input files into N checkpoint partitions "
        "(default: one partition per file). At cluster scale, size N so a "
        "partition ≈ minutes of work: too many tiny partitions pay per-"
        "partition pipeline startup + manifest/global-phase overhead, too "
        "few lose resume granularity. Grouping is deterministic (sorted "
        "discovery, contiguous split), but MUST be kept constant across "
        "resume runs of the same --output — the manifest keys partitions "
        "by group index.",
    )
    return p


def group_shards(files: list[str], num_shards: int | None) -> list:
    """Deterministic contiguous grouping of the sorted discovery list
    into ``num_shards`` balanced multi-file partitions (each becomes ONE
    checkpoint/resume unit; ``read_table`` accepts the file list)."""
    if not num_shards or num_shards >= len(files):
        return list(files)
    base, extra = divmod(len(files), num_shards)
    out, i = [], 0
    for s in range(num_shards):
        n = base + (1 if s < extra else 0)
        out.append(files[i : i + n])
        i += n
    return out


def run(argv: Iterable[str] | None = None) -> dict:
    """Parse args, own the Ray session, run the resumable build, return
    the summary dict (also printed as the last stdout line)."""
    args = build_parser().parse_args(list(argv) if argv is not None else None)

    import ray

    owned = False
    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; with
        # it unset this starts (and later shuts down) a local session
        init_kwargs: dict = {"include_dashboard": False, "logging_level": "ERROR"}
        if os.environ.get("RAY_ADDRESS"):
            init_kwargs["address"] = os.environ["RAY_ADDRESS"]
        elif args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)
        owned = True

    try:
        import pyarrow.parquet as pq

        from .config import PROFILES, PipelineConfig
        from .pipelines.kg_build import run_kg_build_resumable
        from .sources.io import discover_partitions

        if args.profile not in PROFILES:
            raise SystemExit(f"unknown profile {args.profile!r}; choose from {sorted(PROFILES)}")
        if os.path.isfile(args.input):
            files = [args.input]
        else:
            files = discover_partitions(args.input, include=(args.glob,))
        files = group_shards(files, args.num_shards)
        alias = pq.read_table(args.alias_table) if args.alias_table else None
        result = run_kg_build_resumable(
            files,
            args.output,
            cfg=PipelineConfig(profile=PROFILES[args.profile]),
            alias_table=alias,
            fail_after=args.fail_after,
            seen_store_dir=args.seen_store,
            graph_store_dir=args.graph_store,
        )
        print(json.dumps(result))
        return result
    finally:
        if owned:
            ray.shutdown()


def main(argv: Iterable[str] | None = None) -> int:
    try:
        result = run(argv)
    except (FileNotFoundError, ValueError) as exc:
        print(json.dumps({"status": "error", "error": str(exc)}))
        return 1
    return 0 if result.get("status") == "done" else 3


if __name__ == "__main__":
    sys.exit(main())
