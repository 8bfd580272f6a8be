"""Deterministic synthetic interleaved-document corpus + goldens.

Generates (seed-stable, no external data; FIXTURES.md §1-§6):
  * ``documents`` — interleaved text+media docs
    (doc_id, spans: list<struct<kind,text,media_ref,offset>>),
  * ``entity_aliases`` — canonical entities with alias variants and a
    Zipf mention-frequency ``weight`` (the hot-key skew driver),
  * ``golden_triples`` — every planted fact, recorded at generation
    time, as (doc_id, subj, subj_label, pred, obj, obj_label) with
    canonical surface forms — ground truth for triple P/R ≥ 0.95.

Planted facts mirror the reference's pilot corpus and closed-world
schema (``/root/reference/docs/samples/pilot.txt:1``,
``scripts/config/kg_schema.json``):
  "«Company» launched «Product» on «Month D, YYYY»."  → LAUNCHED
  "This document was ingested by «Operator»."          → INGESTED_BY
Mention surfaces are drawn from the canonical name or an alias
(companies/products Zipf-weighted), so extraction alone is not enough —
alias linking + canonicalization must resolve variants to score P/R=1.
Planted sentences are kept < 100 chars (= the chunk overlap) so every
sentence is fully contained in at least one chunk of the 600/100 split.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_TYPE = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)

_FILLER = (
    "the data graph pipeline index stream batch merge shuffle vector chunk "
    "table query embedding cluster node edge entity relation document span "
    "token model actor block partition manifest checkpoint lineage schema "
    "retry backoff quality score alias mention corpus sample signal metric"
).split()

_CO_A = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Hooli", "Vandelay", "Cyberdyne", "Tyrell", "Aperture", "Wonka", "Sirius", "Massive", "Pied", "Soylent"]
_CO_B = ["Dynamics", "Analytics", "Robotics", "Networks", "Industries", "Holdings", "Ventures", "Logistics"]
_CO_SUF = ["Corp", "Inc", "Labs", "Systems", "Group"]
_PR_A = ["Graph", "Vector", "Nimbus", "Quartz", "Falcon", "Aurora", "Zephyr", "Onyx", "Lumen", "Krypton", "Helix", "Sable", "Ember", "Cobalt", "Argon", "Velvet"]
_PR_B = ["RAG", "DB", "Flow", "Engine", "Pilot", "Suite", "Forge", "Hub"]
_OPERATORS = ["DataOps Team", "Platform Crew", "Ingest Bot", "Curation Guild"]
_MONTHS = ["January", "February", "March", "April", "May", "June", "July", "August", "September", "October", "November", "December"]
_MEDIA_KINDS = ["image", "audio", "table"]


@dataclass
class Corpus:
    documents: pa.Table
    aliases: pa.Table
    golden_triples: pa.Table


def _make_entities(rng: np.random.Generator, n_companies: int, n_products: int):
    """Canonical entities + alias variants; all surfaces globally unique."""
    taken: set[str] = set()
    ents = []  # (canonical_id, label, name, aliases)

    def fresh(surface: str, salt: int) -> str:
        s = surface
        k = salt
        while s in taken:
            s = f"{surface} {k}"
            k += 1
        taken.add(s)
        return s

    k = 0
    for i in range(n_companies):
        a = _CO_A[int(rng.integers(len(_CO_A)))]
        b = _CO_B[int(rng.integers(len(_CO_B)))]
        suf = _CO_SUF[int(rng.integers(len(_CO_SUF)))]
        name = fresh(f"{a} {b} {suf}", i)
        aliases = []
        n_al = int(rng.integers(0, 3))
        cand = [f"{a} {b}", f"{a} {b} {_CO_SUF[(_CO_SUF.index(suf) + 1) % len(_CO_SUF)]}"]
        for c in cand[:n_al]:
            if c not in taken:
                taken.add(c)
                aliases.append(c)
        ents.append((f"ent-{k:06d}", "Company", name, aliases))
        k += 1
    for i in range(n_products):
        a = _PR_A[int(rng.integers(len(_PR_A)))]
        b = _PR_B[int(rng.integers(len(_PR_B)))]
        name = fresh(f"{a}{b}", i)
        aliases = []
        if rng.random() < 0.5:
            c = f"{a}{b} Classic"
            if c not in taken:
                taken.add(c)
                aliases.append(c)
        ents.append((f"ent-{k:06d}", "Product", name, aliases))
        k += 1
    for op in _OPERATORS:
        taken.add(op)
        ents.append((f"ent-{k:06d}", "Operator", op, []))
        k += 1
    return ents


def generate_corpus(
    n_docs: int = 1000,
    seed: int = 42,
    n_companies: int = 40,
    n_products: int = 60,
    fact_prob: float = 0.55,
) -> Corpus:
    rng = np.random.default_rng(seed)
    ents = _make_entities(rng, n_companies, n_products)
    companies = [e for e in ents if e[1] == "Company"]
    products = [e for e in ents if e[1] == "Product"]
    operators = [e for e in ents if e[1] == "Operator"]

    # Zipf-distributed mention weights → hot-entity skew for the shuffle.
    def zipf_weights(n: int) -> np.ndarray:
        w = 1.0 / np.arange(1, n + 1) ** 1.2
        return w / w.sum()

    w_co = zipf_weights(len(companies))
    w_pr = zipf_weights(len(products))

    def pick_surface(ent) -> str:
        _, _, name, aliases = ent
        if aliases and rng.random() < 0.35:
            return aliases[int(rng.integers(len(aliases)))]
        return name

    doc_ids, spans_kind, spans_text, spans_ref, spans_off, list_off = [], [], [], [], [], [0]
    g_doc, g_subj, g_slab, g_pred, g_obj, g_olab = [], [], [], [], [], []

    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        doc_ids.append(doc_id)
        n_spans = 1 + min(11, int(rng.geometric(0.35)))
        cum = 0
        for j in range(n_spans):
            if rng.random() < 0.7:
                n_words = int(rng.integers(4, 90))
                words = [_FILLER[int(x)] for x in rng.integers(0, len(_FILLER), n_words)]
                text = " ".join(words) + ". "
                if rng.random() < fact_prob:
                    co = companies[int(rng.choice(len(companies), p=w_co))]
                    pr = products[int(rng.choice(len(products), p=w_pr))]
                    date = f"{_MONTHS[int(rng.integers(12))]} {int(rng.integers(1, 29))}, {int(rng.integers(2019, 2027))}"
                    text += f"{pick_surface(co)} launched {pick_surface(pr)} on {date}. "
                    g_doc.append(doc_id); g_subj.append(co[2]); g_slab.append("Company")
                    g_pred.append("LAUNCHED"); g_obj.append(pr[2]); g_olab.append("Product")
                if rng.random() < 0.08:
                    op = operators[int(rng.integers(len(operators)))]
                    text += f"This document was ingested by {op[2]}. "
                    g_doc.append(doc_id); g_subj.append(doc_id); g_slab.append("Document")
                    g_pred.append("INGESTED_BY"); g_obj.append(op[2]); g_olab.append("Operator")
                spans_kind.append("text"); spans_text.append(text); spans_ref.append("")
                spans_off.append(cum)
                cum += len(text)
            else:
                kind = _MEDIA_KINDS[int(rng.integers(len(_MEDIA_KINDS)))]
                spans_kind.append(kind); spans_text.append("")
                spans_ref.append(f"{kind}://bucket/{doc_id}/{j}")
                spans_off.append(cum)
        list_off.append(len(spans_kind))

    structs = pa.StructArray.from_arrays(
        [
            pa.array(spans_kind),
            pa.array(spans_text),
            pa.array(spans_ref),
            pa.array(np.asarray(spans_off, dtype=np.int32)),
        ],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(list_off, type=pa.int32()), structs)
    documents = pa.table({"doc_id": pa.array(doc_ids), "spans": spans})

    aliases = pa.table(
        {
            "canonical_id": pa.array([e[0] for e in ents]),
            "label": pa.array([e[1] for e in ents]),
            "name": pa.array([e[2] for e in ents]),
            "aliases": pa.array([e[3] for e in ents], type=pa.list_(pa.string())),
            "weight": pa.array(
                [int(w * 1_000_000) for w in np.concatenate([w_co, w_pr, np.zeros(len(operators))])],
                type=pa.int64(),
            ),
        }
    )

    golden = pa.table(
        {
            "doc_id": pa.array(g_doc),
            "subj": pa.array(g_subj),
            "subj_label": pa.array(g_slab),
            "pred": pa.array(g_pred),
            "obj": pa.array(g_obj),
            "obj_label": pa.array(g_olab),
        }
    )
    return Corpus(documents=documents, aliases=aliases, golden_triples=golden)


FAIL_MARKER = " @@FAIL@@ "


def generate_failure_corpus(seed: int = 42) -> pa.Table:
    """Failure-injection docs (FIXTURES.md §8): binary-noise spans (parity
    with the reference's UnicodeDecodeError skip, pipeline.py:502-513),
    whitespace-only docs (pipeline.py:510-512), and flaky-extraction
    markers that make the extractor raise on first sight."""
    rng = np.random.default_rng(seed)
    rows = []
    rows.append(("bad-binary-0", [("text", "ok prefix. ", ""), ("text", "\ufffd" + chr(0) + chr(1) + chr(2) + " binary noise", "")]))
    rows.append(("bad-empty-0", [("text", "   \n\t  ", "")]))
    rows.append(("bad-empty-1", [("text", "", ""), ("image", "", "image://bucket/bad-empty-1/1")]))
    for i in range(5):
        rows.append((f"flaky-{i}", [("text", f"normal text here. {FAIL_MARKER} more text. ", "")]))
    for i in range(10):
        words = " ".join(_FILLER[int(x)] for x in rng.integers(0, len(_FILLER), 30))
        rows.append((f"good-{i}", [("text", words + ". ", "")]))

    doc_ids, kinds, texts, refs, offs, lo = [], [], [], [], [], [0]
    for doc_id, spans in rows:
        doc_ids.append(doc_id)
        cum = 0
        for kind, text, ref in spans:
            kinds.append(kind)
            texts.append(text)
            refs.append(ref)
            offs.append(cum)
            cum += len(text) if kind == "text" else 0
        lo.append(len(kinds))
    structs = pa.StructArray.from_arrays(
        [pa.array(kinds), pa.array(texts), pa.array(refs), pa.array(np.asarray(offs, dtype=np.int32))],
        fields=list(SPAN_TYPE),
    )
    spans_arr = pa.ListArray.from_arrays(pa.array(lo, type=pa.int32()), structs)
    return pa.table({"doc_id": pa.array(doc_ids), "spans": spans_arr})


def write_corpus(corpus: Corpus, out_dir: str, n_doc_files: int = 1) -> dict[str, str]:
    """Write the corpus tables. ``n_doc_files > 1`` shards ``documents``
    into a directory of part files — the faithful small-scale stand-in
    for a many-fragment Lance table (a single parquet file is read and
    decoded by ONE task, serializing the whole pipeline's input)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    if n_doc_files <= 1:
        p = os.path.join(out_dir, "documents.parquet")
        pq.write_table(corpus.documents, p)
        paths["documents"] = p
    else:
        d = os.path.join(out_dir, "documents")
        os.makedirs(d, exist_ok=True)
        n = corpus.documents.num_rows
        step = (n + n_doc_files - 1) // n_doc_files
        for i in range(n_doc_files):
            part = corpus.documents.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, os.path.join(d, f"part-{i:05d}.parquet"))
        paths["documents"] = d
    for name, tbl in (("entity_aliases", corpus.aliases), ("golden_triples", corpus.golden_triples)):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
