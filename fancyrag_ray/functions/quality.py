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


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition quality signals per document — the
    repetition-filter family of a pretraining data pipeline (duplicate
    lines and dominant word bigrams flag boilerplate/spam; see Rae et
    al. 2021 "Scaling Language Models", Appendix A quality heuristics).

    INTEGER outputs only (the micro-integer oracle trick):

    - ``n_lines`` / ``n_unique_lines``: non-empty ``\\n``-split lines,
      total vs distinct — ``1 - unique/total`` is the duplicate-line
      fraction;
    - ``n_dup_line_occurrences``: rows belonging to a line that occurs
      more than once (the numerator of Gopher's "fraction of lines in
      duplicated lines");
    - ``n_bigrams`` / ``max_bigram_count``: word-bigram total vs the
      most frequent bigram's count — ``max/total`` is the top-2-gram
      fraction.

    Vectorized: one ``split_pattern`` + ``list_parent_indices`` per
    batch, then a single pandas groupby per signal (C-level hash
    aggregation); no per-row Python. Every doc emits a row (zeros for
    empty text) so the row count is corpus-stable."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import pandas as pd

        n = t.num_rows
        texts = pc.fill_null(t.column("text"), "")

        def _per_doc(splits, agg_max=False):
            """(totals, uniques, dup_occurrences[, max_count]) per doc
            from a list column of tokens; empty tokens dropped."""
            flat = pc.list_flatten(splits)
            parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
            keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
            return flat.to_numpy(zero_copy_only=False)[keep], parent[keep]

        # lines ------------------------------------------------------
        lines, lp = _per_doc(pc.split_pattern(texts, "\n"))
        n_lines = np.bincount(lp, minlength=n).astype(np.int64)
        if len(lines):
            lc = (
                pd.DataFrame({"p": lp, "v": lines})
                .groupby(["p", "v"], sort=False)
                .size()
                .reset_index(name="c")
            )
            g = lc.groupby("p", sort=False)["c"]
            uniq = np.zeros(n, np.int64)
            uniq[g.size().index] = g.size().to_numpy()
            dup = np.zeros(n, np.int64)
            dups = lc[lc["c"] > 1].groupby("p", sort=False)["c"].sum()
            dup[dups.index] = dups.to_numpy()
        else:
            uniq = np.zeros(n, np.int64)
            dup = np.zeros(n, np.int64)

        # word bigrams -----------------------------------------------
        words, wp = _per_doc(pc.split_pattern_regex(texts, r"\s+"))
        n_big = np.zeros(n, np.int64)
        mx = np.zeros(n, np.int64)
        if len(words) >= 2:
            adj = wp[:-1] == wp[1:]
            if adj.any():
                bg = pd.Series(words[:-1][adj]) + " " + pd.Series(words[1:][adj])
                bp_ = wp[:-1][adj]
                bc = (
                    pd.DataFrame({"p": bp_, "v": bg.to_numpy()})
                    .groupby(["p", "v"], sort=False)
                    .size()
                    .reset_index(name="c")
                )
                gg = bc.groupby("p", sort=False)["c"]
                tot = gg.sum()
                n_big[tot.index] = tot.to_numpy()
                m = gg.max()
                mx[m.index] = m.to_numpy()

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_unique_lines": pa.array(uniq, pa.int64()),
                "n_dup_line_occurrences": pa.array(dup, pa.int64()),
                "n_bigrams": pa.array(n_big, pa.int64()),
                "max_bigram_count": pa.array(mx, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


REPETITION_STATS_SQL = """
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
),
l AS (
  SELECT doc_id, list_filter(string_split(text, chr(10)), x -> x <> '') AS ls
  FROM base
),
lc AS (
  SELECT doc_id, line, COUNT(*)::BIGINT AS c
  FROM (SELECT doc_id, UNNEST(ls) AS line FROM l)
  GROUP BY doc_id, line
),
lm AS (
  SELECT doc_id,
         SUM(c)::BIGINT AS n_lines,
         COUNT(*)::BIGINT AS n_unique_lines,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_line_occurrences
  FROM lc GROUP BY doc_id
),
w AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
  FROM base
),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
bc AS (
  SELECT doc_id, bigram, COUNT(*)::BIGINT AS c FROM bg GROUP BY doc_id, bigram
),
bm AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_bigrams, MAX(c)::BIGINT AS max_bigram_count
  FROM bc GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(lm.n_lines, 0) AS n_lines,
       COALESCE(lm.n_unique_lines, 0) AS n_unique_lines,
       COALESCE(lm.n_dup_line_occurrences, 0) AS n_dup_line_occurrences,
       COALESCE(bm.n_bigrams, 0) AS n_bigrams,
       COALESCE(bm.max_bigram_count, 0) AS max_bigram_count
FROM base b
LEFT JOIN lm ON b.doc_id = lm.doc_id
LEFT JOIN bm ON b.doc_id = bm.doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------
# One pattern list shared verbatim by the Ray kernels and the SQL mirror:
# both pyarrow.compute and DuckDB run RE2, so match sets (and therefore
# counts and replacement output) are engine-identical. Patterns are
# applied IN ORDER, each count taken on the text state its replace sees,
# so a category can never double-count a span an earlier one redacted.
# Order matters: SSN before PHONE (both are digit runs), EMAIL first
# (may contain digit runs a later pattern would chew on).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("n_ssns", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("n_ipv4s", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("n_phones", r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b", "[PHONE]"),
]


def redact_pii_documents(sf_dir: str) -> rd.Dataset:
    """Scrub emails / SSNs / IPv4s / phone numbers from document text,
    emitting the redacted text plus per-category match counts — the
    pre-training PII scrubbing pass (cf. reference M10, the dict-level
    secret scrubber in ``functions/sanitize.py``; this is its corpus-
    scale columnar sibling). Single streaming ``map_batches`` of pure
    RE2 kernels (``count_substring_regex`` + ``replace_substring_regex``)
    — no shuffle, no Python loop, embarrassingly parallel at any scale.
    Hash-exact vs the nested ``regexp_replace(…, 'g')`` DuckDB mirror."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def block(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t.column("text"), pa.scalar("", pa.string()))
        cols: dict = {"doc_id": t.column("doc_id")}
        for name, pat, repl in PII_PATTERNS:
            cols[name] = pc.count_substring_regex(text, pat).cast(pa.int64())
            text = pc.replace_substring_regex(text, pat, repl)
        cols["text_clean"] = text
        return pa.table(cols)

    return ds.map_batches(block, batch_format="pyarrow", batch_size=None)


def _redact_pii_sql() -> str:
    expr = "COALESCE(text, '')"
    counts = []
    for name, pat, repl in PII_PATTERNS:
        # DuckDB single-quoted strings are raw (no backslash escapes):
        # pass the RE2 pattern verbatim, escaping only the quote char
        p = pat.replace("'", "''")
        counts.append(f"len(regexp_extract_all({expr}, '{p}'))::BIGINT AS {name}")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    cols = ",\n       ".join(counts)
    return f"SELECT doc_id,\n       {cols},\n       {expr} AS text_clean\nFROM documents"


REDACT_PII_SQL = _redact_pii_sql()


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(sf_dir: str) -> rd.Dataset:
    """Gopher-style composite quality filter (Rae et al. 2021, table A1
    rule family) over the driver documents, DRIVER-ORACLED: every rule
    is evaluated in INTEGER arithmetic (cross-multiplied ratios, micro
    ints for the mean) so the DuckDB mirror is hash-exact, and every
    signal is one RE2 kernel (``count_substring_regex`` /
    ``replace_substring_regex``) over the batch — no per-row Python.

    Signals per doc: word count, words containing a letter, total word
    chars, mean word length (micro BIGINT), stopword variety, line /
    bullet-line / ellipsis-line counts, ``keep`` = AND of the rules:

    - 20 <= n_words <= 1000
    - 3.0 <= mean word length <= 10.0   (micro-int compare)
    - >= 80% of words contain a letter  (5*alpha >= 4*words)
    - >= 1 stopword present
    - <= 90% bullet lines, <= 30% ellipsis-ending lines

    The thresholds are tuned to the driver corpus's 10-99-word range so
    the flag actually splits it (Gopher's own 50/100k bounds would pass
    or fail everything); the rule STRUCTURE is the published one.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(gopher_flags_batch, batch_format="pyarrow", batch_size=4096)


def gopher_flags_batch(t: pa.Table) -> pa.Table:
    """Per-batch Gopher rule kernel (shared by ``gopher_quality_filter``
    and the corpus-cleaning funnel, which folds it into its single
    per-doc pass)."""
    text = t.column("text")
    i64 = pa.int64()
    n_words = pc.count_substring_regex(text, r"\S+").cast(i64)
    n_alpha = pc.count_substring_regex(text, r"\S*[a-zA-Z]\S*").cast(i64)
    word_chars = pc.utf8_length(pc.replace_substring_regex(text, r"\s+", "")).cast(i64)
    n_lines = pc.add(pc.count_substring_regex(text, r"\n").cast(i64), 1)
    n_bullet = pc.count_substring_regex(text, r"(?m)^\s*[-*]").cast(i64)
    n_ellipsis = pc.count_substring_regex(text, r"(?m)\.\.\.$").cast(i64)
    n_stop = None
    for w in _GOPHER_STOPWORDS:
        hit = pc.greater(pc.count_substring_regex(text, rf"\b{w}\b"), 0).cast(i64)
        n_stop = hit if n_stop is None else pc.add(n_stop, hit)

    wn = n_words.to_numpy(zero_copy_only=False)
    wc = word_chars.to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_micro = np.where(wn > 0, np.round(1e6 * wc / np.maximum(wn, 1)), 0).astype(np.int64)

    na = n_alpha.to_numpy(zero_copy_only=False)
    ns = n_stop.to_numpy(zero_copy_only=False)
    nl = n_lines.to_numpy(zero_copy_only=False)
    nb = n_bullet.to_numpy(zero_copy_only=False)
    ne = n_ellipsis.to_numpy(zero_copy_only=False)
    keep = (
        (wn >= 20) & (wn <= 1000)
        & (mean_micro >= 3_000_000) & (mean_micro <= 10_000_000)
        & (5 * na >= 4 * wn)
        & (ns >= 1)
        & (10 * nb <= 9 * nl)
        & (10 * ne <= 3 * nl)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_words": n_words,
            "n_alpha_words": n_alpha,
            "mean_wl_micro": pa.array(mean_micro, i64),
            "n_stop_hits": n_stop,
            "n_lines": n_lines,
            "n_bullet_lines": n_bullet,
            "n_ellipsis_lines": n_ellipsis,
            "keep": pa.array(keep, i64),
        }
    )



def _gopher_sql() -> str:
    stop = " + ".join(
        f"CASE WHEN length(regexp_extract_all(text, '\\b{w}\\b')) > 0 THEN 1 ELSE 0 END"
        for w in _GOPHER_STOPWORDS
    )
    return f"""
WITH s AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
         length(regexp_extract_all(text, '\\S*[a-zA-Z]\\S*'))::BIGINT AS n_alpha_words,
         LENGTH(regexp_replace(text, '\\s+', '', 'g'))::BIGINT AS word_chars,
         (length(regexp_extract_all(text, '\\n')) + 1)::BIGINT AS n_lines,
         length(regexp_extract_all(text, '(?m)^\\s*[-*]'))::BIGINT AS n_bullet_lines,
         length(regexp_extract_all(text, '(?m)\\.\\.\\.$'))::BIGINT AS n_ellipsis_lines,
         ({stop})::BIGINT AS n_stop_hits
  FROM documents
)
SELECT doc_id, n_words, n_alpha_words,
       CASE WHEN n_words > 0
            THEN CAST(ROUND(1e6 * word_chars / n_words) AS BIGINT) ELSE 0 END AS mean_wl_micro,
       n_stop_hits, n_lines, n_bullet_lines, n_ellipsis_lines,
       CAST(n_words >= 20 AND n_words <= 1000
        AND (CASE WHEN n_words > 0 THEN CAST(ROUND(1e6 * word_chars / n_words) AS BIGINT) ELSE 0 END)
            BETWEEN 3000000 AND 10000000
        AND 5 * n_alpha_words >= 4 * n_words
        AND n_stop_hits >= 1
        AND 10 * n_bullet_lines <= 9 * n_lines
        AND 10 * n_ellipsis_lines <= 3 * n_lines AS BIGINT) AS keep
FROM s
"""


GOPHER_QUALITY_FILTER_SQL = _gopher_sql()
