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

import zlib

import numpy as np
import pyarrow as pa

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
