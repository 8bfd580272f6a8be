"""Source / sink helpers.

The north-star storage format is Lance (ANN + FTS indexes for the serving
side); Lance is not installed in this sandbox, so Parquet is the physical
format everywhere and Lance is gated behind an import-try. Both are
Arrow-native — every stage reads/writes zero-copy Arrow blocks either way.

Outputs are laid out resumably (one directory per logical table, part
files per block, plus a lineage manifest next to it — see
``fancyrag_ray.state.manifest``). Parity notes: deterministic source
ordering (reference ``pipeline.py:499``) becomes a ``doc_id`` sort only
where an output contract needs it; empty-doc skip parity
(``pipeline.py:502-513``) lives in ``non_empty_docs``.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

try:  # Lance is the at-scale format; absent in this sandbox.
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(
    path: str | Sequence[str], columns: Sequence[str] | None = None, **kwargs
) -> rd.Dataset:
    """Read a logical table, pruning columns at the read (row-group and
    column pushdown — never load columns a stage doesn't use). ``path``
    may be a list of files (one multi-file shard — the ``--num-shards``
    grouping path)."""
    if HAVE_LANCE and isinstance(path, str) and path.endswith(".lance"):
        return rd.read_lance(path, columns=list(columns) if columns else None, **kwargs)
    return rd.read_parquet(path, columns=list(columns) if columns else None, **kwargs)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def discover_partitions(
    root: str, include: Sequence[str] = ("*.parquet",), recursive: bool = True
) -> list[str]:
    """S2/S4 parity (reference ``pipeline.py:491-499``,
    ``phases.py:117-177``): glob-include discovery of input partition
    files under ``root``, deduplicated across overlapping patterns and
    DETERMINISTICALLY ordered by path relative to ``root``; raises when
    nothing matched (discovering nothing is an error, not an empty
    success)."""
    import glob as _glob
    import os

    matched: set[str] = set()
    for pattern in include:
        p = os.path.join(root, "**", pattern) if recursive else os.path.join(root, pattern)
        matched.update(f for f in _glob.glob(p, recursive=recursive) if os.path.isfile(f))
    if not matched:
        raise FileNotFoundError(f"no input partitions matched {list(include)} under {root!r}")
    return sorted(matched, key=lambda f: os.path.relpath(f, root))


def interleave_documents(batch: pa.Table) -> pa.Table:
    """Adapter: plain ``documents`` rows (doc_id, text, …) → the
    interleaved shape (doc_id, spans) with one text span per row
    (kind="text", media_ref="", offset=0). Lets the flagship pipeline run
    over the driver's testdata tables (FIXTURES.md §7)."""
    n = batch.num_rows
    texts = batch.column("text")
    span_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    structs = pa.StructArray.from_arrays(
        [
            pa.array(["text"] * n),
            texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
            pa.array([""] * n),
            pa.array([0] * n, type=pa.int32()),
        ],
        fields=list(span_type),
    )
    spans = pa.ListArray.from_arrays(pa.array(range(n + 1), type=pa.int32()), structs)
    return pa.table({"doc_id": batch.column("doc_id"), "spans": spans})


def non_empty_docs(batch: pa.Table) -> pa.Table:
    """Skip whitespace-only documents (reference ``pipeline.py:510-512``);
    callers count skips into the lineage manifest."""
    stripped = pc.utf8_trim_whitespace(batch.column("text"))
    return batch.filter(pc.not_equal(stripped, pa.scalar("")))


_NOISE = set(chr(c) for c in range(0x20) if chr(c) not in "\n\t\r") | {"�"}


def valid_interleaved_docs(batch: pa.Table) -> pa.Table:
    """Input hygiene for interleaved docs (reference parity S3,
    ``pipeline.py:502-513``): skip docs whose text spans are all
    whitespace-only, and docs containing binary-like noise (control
    chars / U+FFFD — the Arrow-string analogue of the reference's
    UnicodeDecodeError skip). Skipped-count = input count − output
    count, recorded by the caller into the lineage manifest."""
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    offsets = spans_col.offsets.to_numpy()
    values = spans_col.values
    kinds = values.field("kind").to_pylist()
    texts = values.field("text").to_pylist()
    keep = []
    for r in range(batch.num_rows):
        text = "".join(
            texts[j] or "" for j in range(int(offsets[r]), int(offsets[r + 1])) if kinds[j] == "text"
        )
        ok = bool(text.strip()) and not any(ch in _NOISE for ch in text)
        keep.append(ok)
    return batch.filter(pa.array(keep, pa.bool_()))
