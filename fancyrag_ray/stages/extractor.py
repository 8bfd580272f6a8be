"""Rule-based triple extractor — stateful actor-pool stage.

Parity: the reference's LLM entity-relation extraction stage
(``LLMEntityRelationExtractor`` wired at ``pipelines/kg_ingest.yaml:53-59``;
per-chunk loop + retries ``src/fancyrag/kg/pipeline.py:687-736``) emits a
per-chunk graph of schema-constrained nodes and relationships, stamped
with provenance (``pipeline.py:568-611``). The deterministic core here is
a rule/pattern extractor over the same closed-world schema
(``scripts/config/kg_schema.json``) — exact reproducibility is what makes
triple P/R scoring meaningful; an LLM-backed actor can implement the same
``__call__`` contract.

Output table (``triples``): doc_id, chunk_uid, chunk_seq, subj,
subj_label, pred, obj, obj_label, props (JSON string — heterogeneous
properties are JSON-stringified, the reference's sanitizer semantics at
``pipeline.py:783-819``).

Failure routing: rows whose extraction raises become rows in a
``failures`` side-channel count (column ``n_failures`` accumulated per
batch) instead of aborting the run — the QA gate thresholds them
(reference ``semantic_max_retries`` + failure artifacts,
``pipeline.py:706-723``).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..schema import DEFAULT_SCHEMA, GraphSchema

TRIPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_uid", pa.string()),
        ("chunk_seq", pa.int32()),
        ("subj", pa.string()),
        ("subj_label", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_label", pa.string()),
        ("props", pa.string()),
    ]
)

# Capitalized-phrase: first token must start with a capital letter;
# follow tokens may be digit-initial ("Windows 11"-style names). No '.'
# in the token class so a sentence boundary ("Corp. Acme…") can never
# merge two names into one span.
_NAME = r"[A-Z][A-Za-z0-9&-]*(?:\s+[A-Z0-9][A-Za-z0-9&-]*)*"
_DATE = r"[A-Z][a-z]+ \d{1,2}, \d{4}"


class RuleExtractor:
    """Deterministic pattern extractor for the closed-world schema.

    Rules (compiled once per actor in ``__init__``):
      * ``«Company» launched «Product» on «date»`` → (Company, LAUNCHED,
        Product) with the date as a JSON property — the reference pilot
        corpus fact shape (``docs/samples/pilot.txt:1``).
      * ``ingested by «Operator»`` → (Document=doc_id, INGESTED_BY,
        Operator).
    Out-of-schema patterns are dropped (closed world,
    ``kg_schema.json:19-21``).
    """

    FAILED_PRED = "__FAILED__"

    def __init__(self, schema: GraphSchema = DEFAULT_SCHEMA, emit_cooccurrence: bool = False,
                 vocab: tuple[str, ...] = (), fail_marker: str | None = None):
        self.schema = schema
        # failure-injection hook: chunks containing the marker raise,
        # exercising the failure-row routing path (tests/bench only)
        self.fail_marker = fail_marker
        self.launched_re = re.compile(rf"\b({_NAME})\s+launched\s+({_NAME})\s+on\s+({_DATE})")
        self.ingested_re = re.compile(rf"\bingested by\s+({_NAME})")
        # opt-in: (Term, CO_OCCURS, Term) triples for vocab terms sharing a
        # chunk — gives the pipeline extraction work on corpora without
        # pattern facts (e.g. the driver testdata documents).
        self.emit_cooccurrence = emit_cooccurrence
        v = vocab or TermMentionExtractor.DEFAULT_VOCAB
        self.vocab_res = {t: re.compile(rf"\b{re.escape(t)}\b") for t in v} if emit_cooccurrence else {}

    def _complete(self, text: str, chunk_seq: int, m: re.Match) -> bool:
        """Chunk-overlap truncation guard. Chunks overlap by ≥ the max
        sentence length, so any sentence cut by a chunk boundary appears
        complete in an adjacent chunk. A match is kept only when its
        sentence provably started inside this chunk (first chunk, or a
        sentence delimiter precedes it) and it doesn't touch the chunk
        end — truncated fragments would otherwise yield corrupt
        subjects/objects AND their complete twin from the neighbor chunk."""
        if m.end() >= len(text) or text[m.end()] != ".":
            return False  # not sentence-final ⇒ possibly cut mid-phrase
        if chunk_seq > 1 and text.rfind(". ", 0, m.start()) == -1:
            return False
        return True

    def extract_text(self, doc_id: str, chunk_uid: str, chunk_seq: int, text: str) -> list[tuple]:
        if self.fail_marker and self.fail_marker in text:
            raise RuntimeError(f"injected extraction failure in chunk {chunk_uid}")
        out = []
        for m in self.launched_re.finditer(text):
            if not self._complete(text, chunk_seq, m):
                continue
            subj, obj, date = m.group(1), m.group(2), m.group(3)
            if self.schema.allows("Company", "LAUNCHED", "Product"):
                out.append(
                    (doc_id, chunk_uid, chunk_seq, subj, "Company", "LAUNCHED", obj, "Product",
                     json.dumps({"date": date}, sort_keys=True))
                )
        for m in self.ingested_re.finditer(text):
            if not self._complete(text, chunk_seq, m):
                continue
            if self.schema.allows("Document", "INGESTED_BY", "Operator"):
                out.append(
                    (doc_id, chunk_uid, chunk_seq, doc_id, "Document", "INGESTED_BY", m.group(1), "Operator", "{}")
                )
        if self.emit_cooccurrence and self.schema.allows("Term", "CO_OCCURS", "Term"):
            present = sorted(t for t, rx in self.vocab_res.items() if rx.search(text))
            for i in range(len(present)):
                for j in range(i + 1, len(present)):
                    out.append(
                        (doc_id, chunk_uid, chunk_seq, present[i], "Term", "CO_OCCURS", present[j], "Term", "{}")
                    )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        uids = batch.column("chunk_uid").to_pylist()
        seqs = batch.column("seq").to_pylist()
        texts = batch.column("text").to_pylist()
        rows: list[tuple] = []
        n_failures = 0
        for doc_id, uid, seq, text in zip(doc_ids, uids, seqs, texts):
            try:
                rows.extend(self.extract_text(str(doc_id), uid, int(seq), text or ""))
            except Exception as exc:
                # failure-row routing (reference: per-chunk failure
                # artifacts, pipeline.py:706-723): a sentinel row keeps
                # the count distributed; materialization filters it out
                # and the QA gate thresholds it.
                n_failures += 1
                rows.append(
                    (str(doc_id), uid, int(seq), str(doc_id), "Document", self.FAILED_PRED, "", "",
                     json.dumps({"error": str(exc)[:200]}))
                )
        cols = list(zip(*rows)) if rows else [[] for _ in TRIPLE_SCHEMA]
        tbl = pa.table(
            {
                "doc_id": pa.array(list(cols[0]), type=pa.string()),
                "chunk_uid": pa.array(list(cols[1]), type=pa.string()),
                "chunk_seq": pa.array(list(cols[2]), type=pa.int32()),
                "subj": pa.array(list(cols[3]), type=pa.string()),
                "subj_label": pa.array(list(cols[4]), type=pa.string()),
                "pred": pa.array(list(cols[5]), type=pa.string()),
                "obj": pa.array(list(cols[6]), type=pa.string()),
                "obj_label": pa.array(list(cols[7]), type=pa.string()),
                "props": pa.array(list(cols[8]), type=pa.string()),
            }
        )
        if n_failures:
            tbl = tbl.replace_schema_metadata({b"n_failures": str(n_failures).encode()})
        return tbl


class TermMentionExtractor:
    """Vocabulary mention counter (NER-lite over a fixed term list).

    Emits one row per (doc, term) with the whole-word occurrence count —
    the mention-detection half of extraction, SQL-oracle-checkable with
    DuckDB ``regexp_extract_all``. Fully columnar: one
    ``pc.count_substring_regex`` kernel call per vocab term over the
    whole batch (RE2, case-sensitive — same semantics as the previous
    per-row ``re.findall`` and the DuckDB oracle), no Python row loop.
    """

    DEFAULT_VOCAB = ("customer", "part", "supplier", "order", "table", "join", "merge", "vector")

    def __init__(self, vocab: tuple[str, ...] = DEFAULT_VOCAB, text_col: str = "text", id_col: str = "doc_id"):
        self.vocab = vocab
        self.patterns = {t: rf"\b{re.escape(t)}\b" for t in vocab}
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col)
        id_type = batch.schema.field(self.id_col).type
        parts = [
            pa.table(
                {
                    self.id_col: pa.array([], type=id_type),
                    "term": pa.array([], type=pa.string()),
                    "n_mentions": pa.array([], type=pa.int64()),
                }
            )
        ]
        for term, pattern in self.patterns.items():
            n = pc.count_substring_regex(texts, pattern).cast(pa.int64())
            mask = pc.greater(n, pa.scalar(0))  # null text → null → dropped by filter
            sel_ids = ids.filter(mask)
            if len(sel_ids) == 0:
                continue
            parts.append(
                pa.table(
                    {
                        self.id_col: sel_ids,
                        "term": pa.array([term] * len(sel_ids), type=pa.string()),
                        "n_mentions": n.filter(mask),
                    }
                )
            )
        return pa.concat_tables(parts)
