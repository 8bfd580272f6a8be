"""Corpus-level lexical statistics for training-data curation.

Three operators a pretraining-data pipeline runs over every corpus,
each a driver query with a hash-exact DuckDB mirror:

* ``top_bigrams`` — corpus-wide word-bigram counts (the n-gram LM /
  boilerplate-detection primitive). One vectorized pass builds bigrams
  from Arrow list offsets (no Python loop), per-block partial counts
  bound the shuffle to distinct bigrams per block.
* ``common_word_fraction`` — the Gopher/RefinedWeb "fraction of words
  in a common-word set" quality signal, with the vocabulary LEARNED
  from the corpus (top-K by global count) rather than shipped: phase 1
  reduces word counts, phase 2 scores each document against the
  broadcast top-K set. Integer basis points ⇒ oracle hash-exact.
* ``fulltext_bm25`` — BM25 top-k document ranking for a fixed query.
  Uses the *rational-odds* idf ``(N - df + 0.5) / (df + 0.5)`` (the
  argument of BM25's log; x → ln monotone ⇒ identical per-term
  ordering) so every arithmetic step is IEEE-exact and the emitted
  doubles are bit-identical to the SQL mirror — the same
  ln-avoidance trick as ``textops.tfidf_top_terms``. k1/b are exact
  binary fractions (1.25 / 0.75) for the same reason.

Reference parity: the reference scores fulltext matches through
Neo4j's Lucene index (``scripts/create_fulltext_index.py``,
``src/fancyrag/mcp/runtime.py:30-38``); BM25 is Lucene's default
similarity, re-expressed here as two streaming Dataset passes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..util import adaptive_partitions, hash_partitioned_combine


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _words_list(texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """lower(text) split on ``\\s+`` — empty fragments (leading/trailing
    whitespace) are kept here and filtered by callers, which makes the
    list offsets align with the raw split so downstream index math stays
    vectorized. Equals DuckDB ``regexp_extract_all(lower(text), '\\S+')``
    after the empty-string filter (same RE2 both sides)."""
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    arr = pc.split_pattern_regex(low, r"\s+")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _flat_words(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """(non-empty words flattened, per-word row index) for one batch."""
    ws = _words_list(t.column("text"))
    vals = ws.values
    offs = ws.offsets.to_numpy()
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    keep = pc.greater(pc.utf8_length(vals), 0).to_numpy(zero_copy_only=False)
    return vals.filter(pa.array(keep)), doc_idx[keep]


# ---------------------------------------------------------------------------
# top_bigrams
# ---------------------------------------------------------------------------


def word_bigram_counts(docs: rd.Dataset, k: int = 50) -> rd.Dataset:
    """Top-``k`` corpus word bigrams by (count desc, bigram asc).

    Per block: one regex split, consecutive-pair construction from the
    flat value array (pairs crossing document boundaries masked out via
    the repeated row index), then a block-local count — so the shuffle
    moves one row per distinct bigram per block, not one per token. The
    final count is a low-cardinality groupby; the global top-k prunes
    per block before a single-partition final (nothing corpus-sized is
    sorted)."""

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        v, d = _flat_words(t)
        if len(v) < 2:
            return empty
        vn = v.to_numpy(zero_copy_only=False)
        same = d[:-1] == d[1:]
        big = pc.binary_join_element_wise(
            pa.array(vn[:-1][same], pa.string()), pa.array(vn[1:][same], pa.string()), " "
        )
        g = pa.table({"bigram": big}).group_by(["bigram"]).aggregate([([], "count_all")])
        return g.rename_columns(["bigram", "n"])

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"), ("bigram", "ascending")])
        return t.take(idx[:k])

    # block-local prune → one-partition final prune (same kernel)
    return counts.map_batches(prune, batch_format="pyarrow", batch_size=None).repartition(1).map_batches(
        prune, batch_format="pyarrow", batch_size=None
    )


def top_bigrams(sf_dir: str) -> rd.Dataset:
    return word_bigram_counts(_read_docs(sf_dir, ["doc_id", "text"]), k=50)


TOP_BIGRAMS_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents
),
b AS (
  SELECT ws[i] || ' ' || ws[i+1] AS bigram
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
)
SELECT bigram, COUNT(*)::BIGINT AS n FROM b GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 50
"""


# ---------------------------------------------------------------------------
# common_word_fraction
# ---------------------------------------------------------------------------


def common_word_fraction(sf_dir: str, vocab_k: int = 64) -> rd.Dataset:
    """Per-document common-word fraction vs the corpus top-``vocab_k``
    vocabulary (Gopher rule 7 shape: docs whose common-word fraction is
    too low are machine-generated / non-linguistic).

    Phase 1 learns the vocabulary: per-block word counts → groupby sum
    → block prune → global top-K by (count desc, word asc). The K-row
    set is ``ray.put`` once and probed with ``pc.is_in`` per batch.
    Documents with zero tokens carry no words and emit no row (the SQL
    mirror's UNNEST drops them the same way).

    ``common_frac_bp`` is integer basis points ``(10000·n_common) //
    n_words`` — integer division on both sides ⇒ hash-exact."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def wc_partial(t: pa.Table) -> pa.Table:
        v, _ = _flat_words(t)
        g = pa.table({"word": v}).group_by(["word"]).aggregate([([], "count_all")])
        return g.rename_columns(["word", "c"])

    counts = (
        docs.map_batches(wc_partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
    )

    def prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("c", "descending"), ("word", "ascending")])
        return t.take(idx[:vocab_k])

    vocab_tbl = pa.concat_tables(
        list(
            counts.map_batches(prune, batch_format="pyarrow", batch_size=None)
            .repartition(1)
            .map_batches(prune, batch_format="pyarrow", batch_size=None)
            .iter_batches(batch_format="pyarrow")
        )
    )
    # O(vocab_k) rows — trivially under the broadcast budget by construction
    vocab_ref = ray.put(vocab_tbl.column("word").combine_chunks())

    def score(t: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        v, d = _flat_words(t)
        isc = pc.is_in(v, value_set=vocab).to_numpy(zero_copy_only=False)
        n_words = np.bincount(d, minlength=t.num_rows).astype(np.int64)
        n_common = np.bincount(d, weights=isc.astype(np.float64), minlength=t.num_rows).astype(np.int64)
        mask = n_words > 0
        did = t.column("doc_id").to_numpy(zero_copy_only=False)[mask]
        nw, ncm = n_words[mask], n_common[mask]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_common": pa.array(ncm, pa.int64()),
                "common_frac_bp": pa.array((10000 * ncm) // nw, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


COMMON_WORD_FRACTION_SQL = r"""
WITH w AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\S+')) AS word FROM documents
),
vocab AS (
  SELECT word FROM (SELECT word, COUNT(*) AS c FROM w GROUP BY word ORDER BY c DESC, word LIMIT 64)
),
d AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_words,
         SUM(CASE WHEN word IN (SELECT word FROM vocab) THEN 1 ELSE 0 END)::BIGINT AS n_common
  FROM w GROUP BY doc_id
)
SELECT doc_id, n_words, n_common, (10000 * n_common) // n_words AS common_frac_bp FROM d
"""


# ---------------------------------------------------------------------------
# fulltext_bm25
# ---------------------------------------------------------------------------

_BM25_TERMS = ("scan", "join", "window")
_K1, _B = 1.25, 0.75  # exact binary fractions — no representation drift


def fulltext_bm25(sf_dir: str, k: int = 10) -> rd.Dataset:
    """BM25 top-``k`` documents for the fixed query ``scan join window``
    with rational-odds idf (module docstring). Two streaming passes:

    1. per-doc term frequencies (``\\b``-bounded RE2 counts, the
       ``term_mentions`` kernel) + doc length, materialized once;
    2. corpus scalars (N, total length, per-term document frequencies)
       via one O(1)-to-driver aggregate over that table, then a scoring
       pass with the scalars closed over — filter score>0, per-block
       top-k prune, single-partition final.

    Every float op (one division for avgdl, one per-doc length ratio,
    fixed-order multiply/divide/add per term) appears in the identical
    order in the SQL mirror, so emitted doubles are bit-identical."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_pass(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t.column("text"), "")
        cols: dict[str, pa.Array] = {"doc_id": t.column("doc_id")}
        for term in _BM25_TERMS:
            cols[f"tf_{term}"] = pc.count_substring_regex(texts, rf"\b{term}\b").cast(pa.int64())
        cols["dl"] = pc.count_substring_regex(texts, r"\S+").cast(pa.int64())
        return pa.table(cols)

    tf = docs.map_batches(tf_pass, batch_format="pyarrow").materialize()

    aggs = [Sum("dl", alias_name="total_len")]
    for term in _BM25_TERMS:
        aggs.append(Sum(f"df_{term}", alias_name=f"df_{term}"))
    stats = tf.map_batches(
        lambda t: pa.table(
            {
                "dl": t.column("dl"),
                **{
                    f"df_{term}": pc.greater(t.column(f"tf_{term}"), 0).cast(pa.int64())
                    for term in _BM25_TERMS
                },
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).aggregate(*aggs)
    n_docs = tf.count()
    avgdl = stats["total_len"] / n_docs  # one correctly-rounded division
    dfs = {term: float(stats[f"df_{term}"]) for term in _BM25_TERMS}

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        total = np.zeros(t.num_rows, dtype=np.float64)
        for term in _BM25_TERMS:  # fixed order ⇒ left-assoc sum matches SQL
            tfv = t.column(f"tf_{term}").to_numpy(zero_copy_only=False).astype(np.float64)
            idf = (n_docs - dfs[term] + 0.5) / (dfs[term] + 0.5)
            denom = tfv + _K1 * ((1.0 - _B) + _B * (dl / avgdl))
            s = idf * ((tfv * (_K1 + 1.0)) / denom)
            total = total + np.where(tfv > 0, s, 0.0)
        out = t.append_column("score", pa.array(total, pa.float64()))
        return out.filter(pc.greater(out.column("score"), 0.0))

    def prune(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"), ("doc_id", "ascending")])
        return t.take(idx[:k])

    return (
        tf.map_batches(score, batch_format="pyarrow")
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
    )


# k1 = 1.25, b = 0.75 inlined: k1+1 = 2.25, 1-b = 0.25. The per-term CASE
# guards tf=0 rows on both sides identically; the three-term sum is
# parenthesized left-associative to match the numpy accumulation order.
def _bm25_term_sql(term: str) -> str:
    return f"""CASE WHEN tf_{term} > 0 THEN
      ((n_docs - df_{term} + 0.5) / (df_{term} + 0.5))
        * ((CAST(tf_{term} AS DOUBLE) * 2.25)
           / (CAST(tf_{term} AS DOUBLE) + 1.25 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE) / n_docs)))))
     ELSE 0.0 END"""


FULLTEXT_BM25_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         LEN(regexp_extract_all(text, '\bscan\b'))::BIGINT   AS tf_scan,
         LEN(regexp_extract_all(text, '\bjoin\b'))::BIGINT   AS tf_join,
         LEN(regexp_extract_all(text, '\bwindow\b'))::BIGINT AS tf_window,
         LEN(regexp_extract_all(text, '\S+'))::BIGINT        AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS total_len,
         SUM(CASE WHEN tf_scan   > 0 THEN 1 ELSE 0 END)::BIGINT AS df_scan,
         SUM(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END)::BIGINT AS df_join,
         SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END)::BIGINT AS df_window
  FROM d
),
scored AS (
  SELECT doc_id, tf_scan, tf_join, tf_window, dl,
    (({_bm25_term_sql("scan")}
    + {_bm25_term_sql("join")})
    + {_bm25_term_sql("window")}) AS score
  FROM d, stats
)
SELECT * FROM scored WHERE score > 0.0
ORDER BY score DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# bigram_oov_rate
# ---------------------------------------------------------------------------


def bigram_oov_rate(sf_dir: str, vocab_k: int = 512) -> rd.Dataset:
    """Per-document bigram out-of-vocabulary rate vs the corpus
    top-``vocab_k`` bigram table — the exact-integer-arithmetic analogue
    of CCNet/FineWeb's LM-perplexity quality filter (a doc whose word
    transitions rarely appear in the corpus LM is boilerplate, garbled,
    or wrong-language; OOV-rate against the learned bigram vocabulary
    captures the same signal without a float LM score).

    Phase 1 learns the vocabulary with the :func:`word_bigram_counts`
    machinery (per-block pair counts → groupby sum → two-stage prune;
    the shuffle moves one row per distinct bigram per block). The
    O(vocab_k) table ships once (``ray.put``). Phase 2 is one streaming
    pass: per block, consecutive-pair construction from the flat token
    array, vectorized ``pc.is_in``, per-doc bincount. ``oov_bp`` is
    integer basis points ``(10000·n_oov) // n_bigrams`` — hash-exact vs
    the SQL mirror; docs with <2 words carry no bigram and emit no row
    (the mirror's UNNEST drops them identically)."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    vocab_tbl = pa.concat_tables(
        list(word_bigram_counts(docs, k=vocab_k).iter_batches(batch_format="pyarrow"))
    )
    vocab_ref = ray.put(vocab_tbl.column("bigram").combine_chunks())

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_bigrams": pa.array([], pa.int64()),
             "n_oov": pa.array([], pa.int64()), "oov_bp": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        v, d = _flat_words(t)
        if len(v) < 2:
            return empty
        vn = v.to_numpy(zero_copy_only=False)
        same = d[:-1] == d[1:]
        if not same.any():
            return empty
        big = pc.binary_join_element_wise(
            pa.array(vn[:-1][same], pa.string()), pa.array(vn[1:][same], pa.string()), " "
        )
        dbig = d[:-1][same]
        vocab = ray.get(vocab_ref)
        in_vocab = pc.is_in(big, value_set=vocab).to_numpy(zero_copy_only=False)
        n_big = np.bincount(dbig, minlength=t.num_rows).astype(np.int64)
        n_in = np.bincount(
            dbig, weights=in_vocab.astype(np.float64), minlength=t.num_rows
        ).astype(np.int64)
        mask = n_big > 0
        did = t.column("doc_id").to_numpy(zero_copy_only=False)[mask]
        nb, noov = n_big[mask], n_big[mask] - n_in[mask]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "n_oov": pa.array(noov, pa.int64()),
                "oov_bp": pa.array((10000 * noov) // nb, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


BIGRAM_OOV_RATE_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents
),
b AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
vocab AS (
  SELECT bigram FROM (
    SELECT bigram, COUNT(*) AS c FROM b GROUP BY bigram ORDER BY c DESC, bigram LIMIT 512
  )
),
d AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
         SUM(CASE WHEN bigram IN (SELECT bigram FROM vocab) THEN 0 ELSE 1 END)::BIGINT AS n_oov
  FROM b GROUP BY doc_id
)
SELECT doc_id, n_bigrams, n_oov, (10000 * n_oov) // n_bigrams AS oov_bp FROM d
"""
