"""Language ID + document fingerprinting (training-data text analysis).

``lang_id`` is an n-gram/stopword heuristic classifier (no model
downloads): per-language profiles of high-frequency function words and
characteristic character n-grams, scored vectorized per batch inside a
stateful actor (profiles compiled once). It is deliberately tiny — the
point is the Ray plumbing (actor pool, batch scoring, argmax over a
score matrix); a fasttext-style model drops into the same actor.

``rolling_fingerprint`` is a Rabin-Karp rolling hash over word windows —
the document-fingerprinting primitive used for shingle-based dedup and
plagiarism-style matching; returns the min-hash of all windows (a
1-element winnowing sketch).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that was for on are with as his they at".split()),
    "de": frozenset("der die das und ist ich nicht sie mit ein auf für von dem den".split()),
    "es": frozenset("el la de que y en un ser se no por con para su los las".split()),
    "fr": frozenset("le la de et les des en un une du est que pour qui dans".split()),
    "zh": frozenset(),  # no-space script: detected by CJK codepoint ratio
}


class LangId:
    """Actor-pool language classifier: stopword hit-rate + CJK ratio."""

    def __init__(self, profiles: dict[str, frozenset] | None = None):
        self.profiles = profiles or _PROFILES
        self.langs = [l for l in self.profiles if l != "zh"]

    def classify_one(self, text: str) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
        if cjk / max(1, len(text)) > 0.2:
            return "zh", round(cjk / len(text), 4)
        words = text.lower().split()
        if not words:
            return "und", 0.0
        best, score = "und", 0.0
        for lang in self.langs:
            prof = self.profiles[lang]
            s = sum(1 for w in words if w in prof) / len(words)
            if s > score:
                best, score = lang, s
        return best, round(score, 4)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs, scores = [], []
        for t in texts:
            l, s = self.classify_one(t or "")
            langs.append(l)
            scores.append(s)
        cols = {c: batch.column(c) for c in batch.column_names if c != "text"}
        cols["lang_pred"] = pa.array(langs, pa.string())
        cols["lang_score"] = pa.array(scores, pa.float64())
        return pa.table(cols)


def rolling_fingerprint(text: str, window: int = 5, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
    """Min rolling hash over word windows (Rabin-Karp / winnowing-1)."""
    words = [zlib.crc32(w.encode()) for w in text.split()]
    if not words:
        return 0
    w = min(window, len(words))
    power = pow(base, w - 1, mod)
    h = 0
    for x in words[:w]:
        h = (h * base + x) % mod
    best = h
    for i in range(w, len(words)):
        h = ((h - words[i - w] * power) * base + words[i]) % mod
        best = min(best, h)
    return best


class Fingerprinter:
    """map_batches actor: per-doc rolling fingerprint column."""

    def __init__(self, window: int = 5):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(t or "", self.window) for t in batch.column("text").to_pylist()]
        cols = {c: batch.column(c) for c in batch.column_names if c != "text"}
        cols["fingerprint"] = pa.array(np.asarray(fps, dtype=np.uint64))
        return pa.table(cols)


# --- driver-query variants (oracle-checkable, fully vectorized) --------------

_LANG_ORDER = ["en", "de", "es", "fr"]
# U+4E00..U+9FFF — the CJK Unified Ideographs block LangId.classify_one
# tests with its "一" <= ch <= "鿿" range check.
_CJK_RE = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"


def lang_id_documents(sf_dir: str) -> rd.Dataset:
    """Language-ID over driver documents as an ORACLE-CHECKABLE query.

    Same heuristic as :class:`LangId` (stopword hit-rate + CJK codepoint
    ratio) but fully vectorized — one ``split_pattern_regex`` +
    ``list_parent_indices`` + per-language ``is_in`` + ``np.bincount``
    per batch, no per-row Python — and with INTEGER outputs
    (``n_words``, ``n_hits``) instead of a rounded float score so the
    DuckDB mirror is hash-exact (the same micro-integer trick that fixed
    the ``token_stats_by_source`` oracle in round 2).

    Semantics (mirrored exactly by ``LANG_ID_DOCUMENTS_SQL``):

    - ``n_words``: non-empty whitespace tokens of ``lower(text)`` —
      NOTE: RE2 ``\\s+`` splits on ASCII whitespace only, while
      ``LangId.classify_one`` uses Python ``str.split()`` (Unicode
      whitespace), so texts containing NBSP or other Unicode spaces
      tokenize differently here than in the per-row class; DuckDB-oracle
      parity is unaffected (both sides are RE2);
    - ``lang_pred``: ``'zh'`` when CJK chars exceed 20% of the character
      length (strictly: ``5*cjk > len``); else ``'und'`` when no
      language profile scores a hit; else the argmax language with ties
      broken in profile order (en, de, es, fr) — the ``s > score``
      strict-improvement rule of ``LangId.classify_one``;
    - ``n_hits``: CJK char count for ``zh`` rows, else the winning
      profile's stopword hit count.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        texts = pc.fill_null(t.column("text"), "")
        lowered = pc.utf8_lower(texts)
        words = pc.split_pattern_regex(lowered, r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        n_words = np.bincount(parent[nonempty], minlength=n).astype(np.int64)
        hits = np.zeros((len(_LANG_ORDER), n), np.int64)
        for li, lang in enumerate(_LANG_ORDER):
            vs = pa.array(sorted(_PROFILES[lang]), pa.string())
            m = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False) & nonempty
            hits[li] = np.bincount(parent[m], minlength=n)
        best_idx = np.argmax(hits, axis=0)  # first max → profile-order tie-break
        best_hits = hits[best_idx, np.arange(n)]
        cjk = pc.count_substring_regex(texts, _CJK_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        clen = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        is_zh = cjk * 5 > clen
        langs = np.asarray(_LANG_ORDER, dtype=object)[best_idx]
        langs = np.where(best_hits > 0, langs, "und")
        langs = np.where(is_zh, "zh", langs)
        n_hits = np.where(is_zh, cjk, best_hits)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang_pred": pa.array(langs, pa.string()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _lang_id_sql() -> str:
    def lst(lang: str) -> str:
        return "[" + ", ".join(f"'{w}'" for w in sorted(_PROFILES[lang])) + "]"

    score_cols = ",\n    ".join(
        f"len(list_filter(ws, w -> list_contains({lst(lang)}, w))) AS h_{lang}"
        for lang in _LANG_ORDER
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         LENGTH(text) AS clen,
         LEN(regexp_extract_all(text, '{_CJK_RE}')) AS cjk,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS ws
  FROM documents
), scored AS (
  SELECT doc_id, cjk, clen, len(ws)::BIGINT AS n_words,
    {score_cols}
  FROM base
)
SELECT doc_id,
  CASE WHEN cjk * 5 > clen THEN 'zh'
       WHEN GREATEST(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
       WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
       WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
       WHEN h_es >= h_fr THEN 'es'
       ELSE 'fr' END AS lang_pred,
  n_words,
  (CASE WHEN cjk * 5 > clen THEN cjk
        ELSE GREATEST(h_en, h_de, h_es, h_fr) END)::BIGINT AS n_hits
FROM scored
"""


LANG_ID_DOCUMENTS_SQL = _lang_id_sql()


def doc_fingerprints(sf_dir: str, window: int = 5) -> rd.Dataset:
    """Winnowing-1 document fingerprint as an ORACLE-CHECKABLE query:
    the minimum over all ``window``-word shingles of the first 16 hex
    chars of md5(shingle) — the same min-over-windows sketch as
    :func:`rolling_fingerprint` but with a direct (md5) window hash so
    DuckDB reproduces it bit-for-bit (crc32 polynomial rolling isn't
    SQL-expressible; md5-per-window is O(n·w) with w=5 constant, inside
    distributed map_batches — the honest price of a hash-exact oracle).
    Docs with fewer than ``window`` words use all their words; empty
    docs fingerprint to ''."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        out = []
        for txt in t.column("text").to_pylist():
            ws = (txt or "").split()
            if not ws:
                out.append("")
                continue
            w = min(window, len(ws))
            out.append(
                min(
                    hashlib.md5(" ".join(ws[i : i + w]).encode()).hexdigest()[:16]
                    for i in range(len(ws) - w + 1)
                )
            )
        return pa.table(
            {"doc_id": t.column("doc_id"), "fingerprint": pa.array(out, pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


DOC_FINGERPRINTS_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
  FROM documents
), p AS (
  SELECT doc_id, ws, LEAST(5, len(ws)) AS w FROM t
)
SELECT doc_id,
  CASE WHEN len(ws) = 0 THEN ''
       ELSE list_min(list_transform(generate_series(1, len(ws) - w + 1),
                     i -> SUBSTR(MD5(array_to_string(ws[i:i+w-1], ' ')), 1, 16)))
  END AS fingerprint
FROM p
"""
