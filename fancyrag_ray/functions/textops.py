"""Text / document operators over the driver ``documents`` table —
the KG pipeline's per-document stages in SQL-oracle-checkable form.

All functions take ``sf_dir`` and return a Dataset matching the paired
DuckDB oracle (``__ray_entry__.oracle_sql``). The chunker here runs the
*exact* boundary profile (600/100, no word-boundary nudge) so the split
is reproducible in SQL via ``generate_series`` + ``substr``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import PROFILES
from ..sources.io import interleave_documents
from ..stages.chunker import chunk_batch
from ..stages.extractor import TermMentionExtractor


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def chunk_documents(sf_dir: str) -> rd.Dataset:
    """Fixed-size 600/100 exact split of every document (M2-M4 parity:
    1-based seq, sha256 checksum, deterministic content-hash uid)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        out = chunk_batch(interleave_documents(t), PROFILES["text-exact"])
        return out.select(["doc_id", "seq", "index", "text", "checksum", "chunk_uid", "offset_start", "offset_end"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=1024)


CHUNK_DOCUMENTS_SQL = """
WITH n AS (
  SELECT doc_id, text,
         CAST(CEIL(GREATEST(1, LENGTH(text) - 100) / 500.0) AS INTEGER) AS n_chunks
  FROM documents
), e AS (
  SELECT doc_id, text, UNNEST(generate_series(0, n_chunks - 1)) AS i FROM n
)
SELECT doc_id,
       CAST(i + 1 AS INTEGER)                       AS seq,
       CAST(i AS INTEGER)                           AS "index",
       SUBSTR(text, i * 500 + 1, 600)               AS text,
       SHA256(SUBSTR(text, i * 500 + 1, 600))       AS checksum,
       SHA256(CAST(doc_id AS VARCHAR) || ':' || CAST(i + 1 AS VARCHAR) || ':' ||
              SUBSTR(text, i * 500 + 1, 600))       AS chunk_uid,
       CAST(i * 500 AS INTEGER)                     AS offset_start,
       CAST(LEAST(i * 500 + 600, LENGTH(text)) AS INTEGER) AS offset_end
FROM e
"""


def token_stats_by_source(sf_dir: str) -> rd.Dataset:
    """G6 parity: per source, doc count + token-estimate totals where
    token estimate = max(1, ceil(len/4)) (reference evaluator.py:352-358)."""
    ds = _read_docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("text")).cast(pa.float64())
        toks = pc.max_element_wise(pc.ceil(pc.divide(n, pa.scalar(4.0))), pa.scalar(1.0)).cast(pa.int64())
        pt = pa.table({"source": t.column("source"), "tokens": toks})
        g = pt.group_by(["source"]).aggregate([([], "count_all"), ("tokens", "sum"), ("tokens", "max")])
        return g.rename_columns(["source", "n_docs", "total_tokens", "max_tokens"])

    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
        Max("max_tokens", alias_name="max_tokens"),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Integer micro-tokens: float means serialize differently across
        # engines (driver hash is representation-sensitive), so the mean is
        # emitted as round(mean * 1e6) BIGINT on both Ray and oracle sides.
        mean = pc.round(
            pc.multiply(
                pc.divide(t.column("total_tokens").cast(pa.float64()), t.column("n_docs").cast(pa.float64())),
                pa.scalar(1e6),
            )
        ).cast(pa.int64())
        return t.append_column("mean_tokens_micro", mean)

    return out.map_batches(finish, batch_format="pyarrow")


TOKEN_STATS_BY_SOURCE_SQL = """
WITH d AS (
  SELECT source, GREATEST(1, CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)) AS tokens
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS total_tokens, MAX(tokens) AS max_tokens,
       CAST(ROUND(CAST(SUM(tokens) AS DOUBLE) / COUNT(*) * 1e6) AS BIGINT) AS mean_tokens_micro
FROM d GROUP BY source
"""

# GPT-2-style pre-tokenizer, RE2-safe (no lookahead — Arrow and DuckDB
# both run RE2, so match counts agree exactly): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace
# runs. This is the "BPE-ish" token ESTIMATE of a real BPE vocab's
# pre-tokenization pass, without shipping a merges table.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts(sf_dir: str) -> rd.Dataset:
    """Per-doc token counts under two tokenizers — whitespace words and
    the BPE-ish pre-tokenizer above — both as single vectorized RE2
    passes (``count_substring_regex``), both oracle-checked (DuckDB's
    ``regexp_extract_all`` is the same RE2, so counts match exactly)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t.column("text"), "")
        ws = pc.count_substring_regex(texts, r"\S+").cast(pa.int64())
        bpe = pc.count_substring_regex(texts, _BPE_RE).cast(pa.int64())
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_tokens_ws": ws, "n_tokens_bpe": bpe}
        )

    return ds.map_batches(f, batch_format="pyarrow")


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       LEN(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens_ws,
       LEN(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))::BIGINT AS n_tokens_bpe
FROM documents
"""


_HIST_EDGES = [64, 128, 256, 512, 1024, 2048]


def token_histogram(sf_dir: str) -> rd.Dataset:
    """G7 parity: doc counts bucketed by token estimate at the reference's
    bin edges (evaluator.py:94,324-358)."""
    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("text")).cast(pa.float64())
        toks = pc.max_element_wise(pc.ceil(pc.divide(n, pa.scalar(4.0))), pa.scalar(1.0)).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(np.array(_HIST_EDGES, dtype=np.float64), toks, side="left")
        labels = [f"<={e}" for e in _HIST_EDGES] + [">2048"]
        lab = np.array(labels, dtype=object)[idx]
        pt = pa.table({"bucket": pa.array(lab, pa.string())})
        g = pt.group_by(["bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "n_docs"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


TOKEN_HISTOGRAM_SQL = """
WITH d AS (
  SELECT GREATEST(1, CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)) AS tokens FROM documents
)
SELECT CASE WHEN tokens <= 64 THEN '<=64' WHEN tokens <= 128 THEN '<=128'
            WHEN tokens <= 256 THEN '<=256' WHEN tokens <= 512 THEN '<=512'
            WHEN tokens <= 1024 THEN '<=1024' WHEN tokens <= 2048 THEN '<=2048'
            ELSE '>2048' END AS bucket,
       COUNT(*) AS n_docs
FROM d GROUP BY 1
"""


def term_mentions(sf_dir: str) -> rd.Dataset:
    """Vocabulary mention detection (NER-lite, actor pool with compiled
    regexes): whole-word occurrence counts per (doc, term)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        TermMentionExtractor, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4), num_cpus=1
    )


def _mentions_sql() -> str:
    vocab = TermMentionExtractor.DEFAULT_VOCAB
    sel = " UNION ALL ".join(
        f"SELECT doc_id, '{t}' AS term, LEN(regexp_extract_all(text, '\\b{t}\\b')) AS n_mentions FROM documents"
        for t in vocab
    )
    return f"SELECT * FROM ({sel}) WHERE n_mentions > 0"


TERM_MENTIONS_SQL = _mentions_sql()


def doc_term_list(sf_dir: str) -> rd.Dataset:
    """Grouped string aggregation (collect_list / LISTAGG — the one
    aggregate shape Ray Data's built-ins lack): per doc, the sorted
    comma-joined vocabulary terms it mentions, plus the term count.
    One hash co-partition on doc_id, then a per-block vectorized pandas
    sort + groupby-join; deterministic ordering (term asc) makes the
    DuckDB ``string_agg(... ORDER BY ...)`` mirror hash-exact."""
    from ..util import adaptive_partitions, hash_partitioned_combine

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    mentions = ds.map_batches(
        TermMentionExtractor, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4), num_cpus=1
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "terms": pa.array([], pa.string()),
                    "n_terms": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas().sort_values(["doc_id", "term"], kind="mergesort")
        g = df.groupby("doc_id", sort=False)["term"].agg([("terms", ",".join), ("n_terms", "size")])
        g = g.reset_index()
        g["n_terms"] = g["n_terms"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return hash_partitioned_combine(
        mentions.select_columns(["doc_id", "term"]),
        ["doc_id"],
        block,
        adaptive_partitions(16, n_rows=n),
    )


def _doc_term_list_sql() -> str:
    return f"""
WITH mentions AS ({_mentions_sql()})
SELECT doc_id,
       string_agg(term, ',' ORDER BY term) AS terms,
       COUNT(*)::BIGINT AS n_terms
FROM mentions GROUP BY doc_id
"""


DOC_TERM_LIST_SQL = _doc_term_list_sql()


def cooccurrence_edges(sf_dir: str) -> rd.Dataset:
    """Doc-level term co-occurrence graph (relation-extraction shape):
    for each unordered vocab-term pair, the number of docs mentioning
    both. Pairs are emitted per batch then sum-reduced — the edge-dedup
    shuffle of the KG materializer in miniature."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    extractor = TermMentionExtractor()

    def pairs(t: pa.Table) -> pa.Table:
        # vectorized unordered pair generation: batch-local self-join on
        # doc_id (pyarrow Acero) + term < term_b filter — no Python loop
        m = extractor(t).select(["doc_id", "term"])
        j = m.join(m, keys=["doc_id"], join_type="inner", right_suffix="_b")
        j = j.filter(pc.less(j.column("term"), j.column("term_b")))
        g = j.group_by(["term", "term_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["term_a", "term_b", "n_docs"])

    return (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


COOCCURRENCE_EDGES_SQL = f"""
WITH mentions AS ({_mentions_sql()})
SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_docs
FROM mentions a JOIN mentions b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY a.term, b.term
"""


def cooccurrence_pmi(sf_dir: str) -> rd.Dataset:
    """PMI-weighted co-occurrence edges — ``cooccurrence_edges`` plus the
    association strength a relation-extraction pass ranks by.

    ``pmi_ratio = (n_ab · N) / (n_a · n_b)`` is the *argument* of PMI's
    log (x → ln monotone ⇒ identical ranking) so every arithmetic step
    is IEEE-exact: the counts are integers below 2⁵³, the one multiply
    and one divide are correctly rounded, and the emitted doubles are
    bit-identical to the SQL mirror — the same ln-avoidance trick as
    ``tfidf_top_terms``.

    Shape: pair counts exactly as ``cooccurrence_edges`` (block-local
    Acero self-join partials → groupby sum); term marginals are an
    O(vocab) aggregate, ``ray.put`` once and mapped onto the pair table
    (vocab is bounded by the extractor's dictionary — never a shuffle)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    extractor = TermMentionExtractor()
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def pairs(t: pa.Table) -> pa.Table:
        m = extractor(t).select(["doc_id", "term"])
        j = m.join(m, keys=["doc_id"], join_type="inner", right_suffix="_b")
        j = j.filter(pc.less(j.column("term"), j.column("term_b")))
        g = j.group_by(["term", "term_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["term_a", "term_b", "n_ab"])

    def marginals(t: pa.Table) -> pa.Table:
        m = extractor(t).select(["term"])
        g = m.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "c"])

    pair_counts = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_ab", alias_name="n_ab"))
    )
    marg_tbl = pa.concat_tables(
        list(
            ds.map_batches(marginals, batch_format="pyarrow", batch_size=None)
            .groupby("term")
            .aggregate(Sum("c", alias_name="c"))
            .iter_batches(batch_format="pyarrow")
        )
    )
    import ray

    marg_ref = ray.put(marg_tbl)

    def attach(t: pa.Table) -> pa.Table:
        marg = ray.get(marg_ref)
        terms = marg.column("term").combine_chunks()
        cvec = marg.column("c").to_numpy(zero_copy_only=False)
        ia = pc.index_in(t.column("term_a"), value_set=terms).to_numpy(zero_copy_only=False)
        ib = pc.index_in(t.column("term_b"), value_set=terms).to_numpy(zero_copy_only=False)
        n_a, n_b = cvec[ia], cvec[ib]
        n_ab = t.column("n_ab").to_numpy(zero_copy_only=False)
        ratio = (n_ab.astype(np.float64) * float(n_docs)) / (n_a.astype(np.float64) * n_b)
        return pa.table(
            {
                "term_a": t.column("term_a"),
                "term_b": t.column("term_b"),
                "n_ab": t.column("n_ab").cast(pa.int64()),
                "n_a": pa.array(n_a, pa.int64()),
                "n_b": pa.array(n_b, pa.int64()),
                "pmi_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return pair_counts.map_batches(attach, batch_format="pyarrow")


COOCCURRENCE_PMI_SQL = f"""
WITH mentions AS ({_mentions_sql()}),
n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
marg AS (SELECT term, COUNT(*)::BIGINT AS c FROM mentions GROUP BY term),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, COUNT(*)::BIGINT AS n_ab
  FROM mentions a JOIN mentions b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT term_a, term_b, n_ab, ma.c AS n_a, mb.c AS n_b,
       (CAST(n_ab AS DOUBLE) * n.n_docs) / (CAST(ma.c AS DOUBLE) * mb.c) AS pmi_ratio
FROM pairs JOIN marg ma ON ma.term = term_a JOIN marg mb ON mb.term = term_b, n
"""


def _flagship_edges_sql() -> str:
    """SQL mirror of the FULL flagship pipeline on driver documents with
    the ``text-exact`` profile: chunk (600/100 exact split, the
    ``chunk_documents`` oracle shape) → per-CHUNK vocab-term presence →
    unordered term pairs per chunk (the extractor's CO_OCCURS triples)
    → linker synth ids (``'x-' + sha256(label \\x00 norm)[:16]``,
    ``stages/linker.py:37-38``) → edge MERGE reduce keyed
    (src_id, type, dst_id) with n_mentions count and first/last doc.
    ``first_doc``/``last_doc`` are min/max over doc_id AS STRING — the
    triples table carries doc_id as a string column, so "100" < "98"."""
    vocab = TermMentionExtractor.DEFAULT_VOCAB
    presence = " UNION ALL ".join(
        f"SELECT doc_id, seq, '{t}' AS term FROM chunks "
        f"WHERE LEN(regexp_extract_all(text, '\\b{t}\\b')) > 0"
        for t in vocab
    )
    return f"""
WITH n AS (
  SELECT doc_id, text,
         CAST(CEIL(GREATEST(1, LENGTH(text) - 100) / 500.0) AS INTEGER) AS n_chunks
  FROM documents
), e AS (
  SELECT doc_id, text, UNNEST(generate_series(0, n_chunks - 1)) AS i FROM n
), chunks AS (
  SELECT doc_id, CAST(i + 1 AS INTEGER) AS seq, SUBSTR(text, i * 500 + 1, 600) AS text FROM e
), mentions AS ({presence})
SELECT 'x-' || SUBSTR(SHA256('Term' || CHR(0) || a.term), 1, 16) AS src_id,
       'CO_OCCURS' AS type,
       'x-' || SUBSTR(SHA256('Term' || CHR(0) || b.term), 1, 16) AS dst_id,
       COUNT(*) AS n_mentions,
       MIN(CAST(a.doc_id AS VARCHAR)) AS first_doc,
       MAX(CAST(a.doc_id AS VARCHAR)) AS last_doc
FROM mentions a JOIN mentions b ON a.doc_id = b.doc_id AND a.seq = b.seq AND a.term < b.term
GROUP BY a.term, b.term
"""


KG_FLAGSHIP_EDGES_SQL = _flagship_edges_sql()


def _llm_triples_sql() -> str:
    """SQL mirror of the LLM-extraction driver query: the deterministic
    fake transport reproduces the rule extractor exactly (pinned in
    ``tests/test_llm_extractor.py``), so the full actor path — prompt →
    SharedModelClient retries → Responses-payload parse → fence strip →
    strict-schema validation → closed-world triples — is hash-checkable
    against the per-chunk CO_OCCURS pair expansion. Chunk uids are the
    deterministic content hashes (M3 contract), reproducible in SQL."""
    vocab = TermMentionExtractor.DEFAULT_VOCAB
    presence = " UNION ALL ".join(
        f"SELECT doc_id, seq, chunk_uid, '{t}' AS term FROM chunks "
        f"WHERE LEN(regexp_extract_all(text, '\\b{t}\\b')) > 0"
        for t in vocab
    )
    return f"""
WITH n AS (
  SELECT doc_id, text,
         CAST(CEIL(GREATEST(1, LENGTH(text) - 100) / 500.0) AS INTEGER) AS n_chunks
  FROM documents
), e AS (
  SELECT doc_id, text, UNNEST(generate_series(0, n_chunks - 1)) AS i FROM n
), chunks AS (
  SELECT doc_id, CAST(i + 1 AS INTEGER) AS seq,
         SHA256(CAST(doc_id AS VARCHAR) || ':' || CAST(i + 1 AS VARCHAR) || ':' ||
                SUBSTR(text, i * 500 + 1, 600)) AS chunk_uid,
         SUBSTR(text, i * 500 + 1, 600) AS text
  FROM e
), mentions AS ({presence})
SELECT CAST(a.doc_id AS VARCHAR) AS doc_id,
       a.chunk_uid,
       a.seq AS chunk_seq,
       a.term AS subj, 'Term' AS subj_label,
       'CO_OCCURS' AS pred,
       b.term AS obj, 'Term' AS obj_label,
       '{{}}' AS props
FROM mentions a
JOIN mentions b ON a.doc_id = b.doc_id AND a.seq = b.seq AND a.term < b.term
"""


KG_LLM_TRIPLES_SQL = _llm_triples_sql()


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup (hash-partition by content, keep min doc_id per group)
    — the D3/D4 MERGE-upsert reduction over raw text."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        digests = [hashlib.sha256(x.encode()).hexdigest() for x in t.column("text").to_pylist()]
        pt = pa.table({"fp": pa.array(digests, pa.string()), "doc_id": t.column("doc_id")})
        g = pt.group_by(["fp"]).aggregate([("doc_id", "min"), ([], "count_all")])
        return g.rename_columns(["fp", "doc_id", "group_size"])

    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id"), Sum("group_size", alias_name="group_size")
    )
    return out.select_columns(["fp", "doc_id", "group_size"])


DEDUP_EXACT_SQL = """
SELECT SHA256(text) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS group_size
FROM documents GROUP BY SHA256(text)
"""


def quality_scores(sf_dir: str) -> rd.Dataset:
    """Per-doc quality features (integer-exact for oracle comparability):
    char count, whitespace-token count, stopword count, punctuation count."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        n_chars = pc.utf8_length(texts).cast(pa.int64())
        n_tokens = pc.list_value_length(pc.split_pattern(texts, " ")).cast(pa.int64())
        n_stop = pc.add(
            pc.count_substring_regex(texts, r"\bthe\b"), pc.count_substring_regex(texts, r"\ba\b")
        ).cast(pa.int64())
        n_punct = pc.count_substring_regex(texts, r"[.,;:!?]").cast(pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_stopwords": n_stop,
                "n_punct": n_punct,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


QUALITY_SCORES_SQL = """
SELECT doc_id,
       LENGTH(text) AS n_chars,
       LEN(string_split(text, ' ')) AS n_tokens,
       LEN(regexp_extract_all(text, '\\bthe\\b')) + LEN(regexp_extract_all(text, '\\ba\\b')) AS n_stopwords,
       LEN(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
FROM documents
"""


SAMPLE_RATE_BP = 1000  # 10.00% in basis points


def sample_documents_hash(sf_dir: str, rate_bp: int = SAMPLE_RATE_BP) -> rd.Dataset:
    """Deterministic hash sampling — the training-data-pipeline sampling
    operator the reference lacks (SURVEY §2.6 "no sampling operators"),
    built so it IS oracle-checkable: keep a doc iff the first 4 hex chars
    of md5(doc_id) fall below the rate threshold. Hash-based (not RNG)
    sampling is the scale idiom anyway: resumable, shuffle-free,
    partition-independent, and consistent across reruns and engines."""
    thresh = format((65536 * rate_bp) // 10000, "04x")
    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        keep = pa.array(
            [hashlib.md5(str(d).encode()).hexdigest()[:4] < thresh for d in ids], pa.bool_()
        )
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


SAMPLE_DOCUMENTS_HASH_SQL = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) < '{format((65536 * SAMPLE_RATE_BP) // 10000, "04x")}'
"""


def doc_rollup(sf_dir: str) -> rd.Dataset:
    """G9 parity: per-doc chunk counts via the exact chunk-count formula."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("text")).cast(pa.float64())
        nch = pc.ceil(
            pc.divide(pc.max_element_wise(pc.subtract(n, pa.scalar(100.0)), pa.scalar(1.0)), pa.scalar(500.0))
        ).cast(pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n_chars": t.column("n_chars"), "n_chunks": nch})

    return ds.map_batches(f, batch_format="pyarrow")


DOC_ROLLUP_SQL = """
SELECT doc_id, n_chars,
       CAST(CEIL(GREATEST(1, LENGTH(text) - 100) / 500.0) AS BIGINT) AS n_chunks
FROM documents
"""


def tfidf_top_terms(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Top-``k`` discriminative terms per document by tf·idf over the
    whole corpus (text-analysis extension; reference has no corpus
    statistics — its retrieval scoring is Lucene-side, runtime.py:34-38).

    Scale shape: term frequencies are block-final (a document is one
    row, so its tokens never straddle blocks — no tf shuffle at all);
    document frequency reduces through partial per-block counts and one
    hash co-partition over the VOCABULARY (≪ corpus); the df lookup
    broadcasts under the byte budget or hash-joins above it; final
    per-doc ranking reuses ``grouped_topk``'s bounded-shuffle prune.

    Scoring uses the rational idf variant tf·N/df — one multiply and one
    correctly-rounded divide, so the doubles are bit-identical to the
    SQL oracle (ln() would drift across libm implementations). Ordering
    equals classic tf·ln(N/df) per doc whenever candidates differ in
    (tf, df), since x→ln is monotone in N/df and tf scales both."""
    import numpy as np

    from ..util import (
        adaptive_partitions,
        dataset_mean_row_bytes,
        fits_broadcast,
        hash_partitioned_combine,
    )
    from .analytics import grouped_topk

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    # row count from parquet footers — an execution round cheaper than
    # docs.count() and exactly what the oracle's COUNT(*) sees
    n_docs = float(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)

    def tf_block(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ids = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
        pairs = pa.table({"doc_id": pa.array(ids), "term": flat})
        pairs = pairs.filter(pc.not_equal(pairs.column("term"), pa.scalar("")))
        g = pairs.append_column("ones", pa.array(np.ones(pairs.num_rows, np.int64)))
        out = g.group_by(["doc_id", "term"]).aggregate([("ones", "sum")])
        return out.rename_columns(["doc_id", "term", "tf"])

    tf = docs.map_batches(tf_block, batch_format="pyarrow", batch_size=None).materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        g = t.append_column("ones", pa.array(np.ones(t.num_rows, np.int64)))
        out = g.group_by(["term"]).aggregate([("ones", "sum")])
        return out.rename_columns(["term", "df"])

    def df_combine(t: pa.Table) -> pa.Table:
        out = t.group_by(["term"]).aggregate([("df", "sum")])
        return out.rename_columns(["term", "df"])

    partials = tf.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
    n_tf = tf.count()
    df = hash_partitioned_combine(
        partials, ["term"], df_combine, adaptive_partitions(16, n_rows=n_tf)
    ).materialize()
    n_vocab = df.count()

    if fits_broadcast(n_vocab, dataset_mean_row_bytes(df, n_vocab)):
        import ray as _ray

        # broadcast the vocabulary as an Arrow array + aligned df vector:
        # per-batch lookup is one vectorized pc.index_in (hash probe in
        # C++), not a Python dict access per term row
        df_tbl = pa.concat_tables(list(df.iter_batches(batch_format="pyarrow")))
        term_arr = df_tbl.column("term").combine_chunks()
        df_vec = df_tbl.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        term_ref = _ray.put(term_arr)
        df_ref = _ray.put(df_vec)

        def score(t: pa.Table) -> pa.Table:
            terms, dfs_all = _ray.get(term_ref), _ray.get(df_ref)
            idx = pc.index_in(t.column("term"), value_set=terms).to_numpy(zero_copy_only=False)
            dfs = dfs_all[idx]  # every tf term has a df row by construction
            tfs = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
            return t.append_column("tfidf", pa.array(tfs * n_docs / dfs, pa.float64()))

        scored = tf.map_batches(score, batch_format="pyarrow")
    else:
        joined = tf.join(
            df, join_type="inner",
            num_partitions=adaptive_partitions(16, n_rows=n_tf),
            on=("term",),
        )
        scored = joined.map_batches(
            lambda t: t.append_column(
                "tfidf",
                pc.divide(
                    pc.multiply(pc.cast(t.column("tf"), pa.float64()), pa.scalar(n_docs)),
                    pc.cast(t.column("df"), pa.float64()),
                ),
            ).drop_columns(["df"]),
            batch_format="pyarrow",
        )

    top = grouped_topk(
        scored, by="doc_id", order_col="tfidf", k=k, tiebreak="term",
        num_partitions=adaptive_partitions(16, n_rows=n_tf),
    )
    return top.drop_columns(["tf", "rk"])


TFIDF_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), total AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT doc_id, term, tfidf FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf::DOUBLE * (SELECT n FROM total) / df.df::DOUBLE AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id ORDER BY tf.tf::DOUBLE * (SELECT n FROM total) / df.df::DOUBLE DESC, tf.term ASC
         ) AS rn
  FROM tf JOIN df USING (term)
) WHERE rn <= 5
"""


def fulltext_topk_chunks(sf_dir: str, query_text: str = "customer order supplier", k: int = 20):
    """O4 end-to-end as a DRIVER-ORACLED query: run the REAL serving
    fulltext path (``retrieval.fulltext_topk`` — per-block columnar TF
    cut under the same (score desc, uid asc) total order as the global
    sort, then a k-row global top-k) over the exact-profile chunker
    output, and emit the integral term-frequency score as BIGINT so the
    DuckDB mirror — identical RE2 word-boundary patterns via
    ``regexp_extract_all`` over the same ``generate_series`` chunk CTE —
    is hash-exact. Converts the fulltext serving path from pytest-only
    to a green driver-oracle row (reference fulltext scoring surface:
    ``src/fancyrag/mcp/runtime.py:30-38``)."""
    from ..pipelines.retrieval import fulltext_topk

    chunks = chunk_documents(sf_dir)
    df = fulltext_topk(chunks, query_text, k=k)
    df["tf"] = df.pop("score_fulltext").astype("int64")
    return df[["chunk_uid", "tf"]]


def _fulltext_topk_chunks_sql(query_text: str = "customer order supplier", k: int = 20) -> str:
    import re as _re

    terms = [t for t in _re.findall(r"[a-z0-9]+", query_text.lower()) if len(t) > 1]
    tf = " + ".join(f"length(regexp_extract_all(lower(text), '\\b{t}\\b'))" for t in terms)
    return f"""
WITH chunks AS ({CHUNK_DOCUMENTS_SQL}),
scored AS (SELECT chunk_uid, CAST({tf} AS BIGINT) AS tf FROM chunks)
SELECT chunk_uid, tf FROM scored WHERE tf > 0 ORDER BY tf DESC, chunk_uid ASC LIMIT {k}
"""


FULLTEXT_TOPK_CHUNKS_SQL = _fulltext_topk_chunks_sql()


def _levenshtein_to_term(toks: np.ndarray, lens: np.ndarray, term: bytes) -> np.ndarray:
    """Edit distance of every row of a zero-padded byte matrix to ONE
    term — Wagner-Fischer with the loops over term chars × matrix width
    (both bounded by max token length, ~10) and numpy over ALL tokens at
    once, so cost is O(m·w) vector ops regardless of token count. The
    padded tail beyond each token's length never reaches the gathered
    cell ``dp[row, lens[row]]``, so zero-padding is harmless."""
    n, width = toks.shape
    m = len(term)
    prev = np.broadcast_to(np.arange(width + 1, dtype=np.int32), (n, width + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ne = (toks != term[i - 1]).astype(np.int32)
        for j in range(1, width + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), prev[:, j - 1] + ne[:, j - 1]
            )
        prev = cur
    return prev[np.arange(n), lens]


def fuzzy_term_matches(sf_dir: str, max_dist: int = 2) -> rd.Dataset:
    """Typo-tolerant entity linking (fuzzy J6): corpus tokens within
    edit distance ``max_dist`` of a canonical vocabulary term, with the
    number of documents containing each token. The reference resolves
    entities by EXACT key only (J6: ``SinglePropertyExactMatchResolver``
    wired at ``pipelines/kg_ingest.yaml:69-76``); this is the fuzzy variant
    a real entity-resolution pass needs, and it is fully SQL-oracled
    via DuckDB's ``levenshtein``.

    Scale shape: raw text never shuffles — tokens are extracted and
    made distinct per (doc, block) inside ``map_batches``, only slim
    ``(token, partial n_docs)`` rows reach the one ``groupby``, and the
    distance pass runs over the DISTINCT-token table (bounded by corpus
    vocabulary, not corpus size) against the 8-term broadcast-by-closure
    vocabulary with a length-band prefilter (|len(tok) - len(term)| <=
    max_dist blocks the quadratic work exactly like a blocking key in
    classic record linkage)."""

    vocab = TermMentionExtractor.DEFAULT_VOCAB
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tokens_partial(t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(t.column("text"))
        lists = pc.split_pattern_regex(lowered, "[^a-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.greater_equal(pc.utf8_length(flat), 3)
        pairs = pa.table(
            {"doc_id": t.column("doc_id").take(parent.filter(keep)), "tok": flat.filter(keep)}
        )
        # one doc lives in exactly one batch, so per-batch distinct
        # (doc_id, tok) -> per-token doc counts is an EXACT partial
        dd = pairs.group_by(["doc_id", "tok"]).aggregate([])
        g = dd.group_by(["tok"]).aggregate([([], "count_all")])
        return g.rename_columns(["tok", "n_docs"])

    distinct = (
        ds.map_batches(tokens_partial, batch_format="pyarrow", batch_size=None)
        .groupby("tok")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def match(t: pa.Table) -> pa.Table:
        toks = t.column("tok").to_pylist()
        nd = t.column("n_docs").cast(pa.int64()).to_numpy(zero_copy_only=False)
        out_tok, out_term, out_dist, out_nd = [], [], [], []
        lengths = np.fromiter((len(s) for s in toks), dtype=np.int64, count=len(toks))
        for term in vocab:
            band = np.flatnonzero(np.abs(lengths - len(term)) <= max_dist)
            if band.size == 0:
                continue
            width = int(lengths[band].max())
            # the encode loop runs over the DISTINCT-token table only
            # (vocabulary-bounded); numpy S-dtype zero-pads to width
            mat = np.array([toks[i].encode() for i in band], dtype=f"S{width}").view(np.uint8).reshape(band.size, width)
            d = _levenshtein_to_term(mat, lengths[band].astype(np.int64), term.encode())
            hit = np.flatnonzero(d <= max_dist)
            for h in hit:
                i = band[h]
                if toks[i] == term:
                    continue
                out_tok.append(toks[i])
                out_term.append(term)
                out_dist.append(int(d[h]))
                out_nd.append(int(nd[i]))
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "term": pa.array(out_term, pa.string()),
                "dist": pa.array(out_dist, pa.int64()),
                "n_docs": pa.array(out_nd, pa.int64()),
            }
        )

    return distinct.map_batches(match, batch_format="pyarrow", batch_size=8192)


def _fuzzy_term_matches_sql(max_dist: int = 2) -> str:
    vals = ",".join(f"('{t}')" for t in TermMentionExtractor.DEFAULT_VOCAB)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]{{3,}}')) AS tok
  FROM documents
), dt AS (SELECT tok, COUNT(*)::BIGINT AS n_docs FROM toks GROUP BY tok),
v(term) AS (VALUES {vals})
SELECT dt.tok AS token, v.term AS term, CAST(levenshtein(dt.tok, v.term) AS BIGINT) AS dist, n_docs
FROM dt JOIN v ON ABS(LENGTH(dt.tok) - LENGTH(v.term)) <= {max_dist}
WHERE dt.tok <> v.term AND levenshtein(dt.tok, v.term) <= {max_dist}
"""


FUZZY_TERM_MATCHES_SQL = _fuzzy_term_matches_sql()


def sample_per_source(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Deterministic PER-GROUP sampling — "show me k docs from every
    source", the inspection/debug primitive of a data pipeline: rank
    docs inside each source by md5(doc_id) (engine-independent
    pseudo-random order, same idiom as ``sample_documents_hash``) and
    keep the first k. Runs through :func:`analytics.grouped_topk`
    (per-block partial prune → one co-partition shuffle of ≤ k·blocks
    rows per group), so it is the grouped-top-N machinery under a
    sampling order rather than a value order."""
    from ..util import adaptive_partitions
    from .analytics import grouped_topk

    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def add_key(t: pa.Table) -> pa.Table:
        keys = [hashlib.md5(str(d).encode()).hexdigest()[:16] for d in t.column("doc_id").to_pylist()]
        return t.append_column("hkey", pa.array(keys, pa.string()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    top = grouped_topk(
        keyed, by="source", order_col="hkey", k=k, tiebreak="doc_id",
        descending=False, num_partitions=adaptive_partitions(16, n_rows=n),
    )
    return top.drop_columns(["hkey"])


def _sample_per_source_sql(k: int = 3) -> str:
    return f"""
SELECT doc_id, source, n_chars, rk FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 16) ASC, doc_id ASC
         ) AS rk
  FROM documents
) WHERE rk <= {k}
"""


SAMPLE_PER_SOURCE_SQL = _sample_per_source_sql()


def source_vocab_overlap(sf_dir: str) -> rd.Dataset:
    """Pairwise SOURCE similarity by vocabulary overlap — the corpus
    comparison matrix (which crawls/feeds duplicate each other?): for
    every source pair, the distinct-token intersection, both vocabulary
    sizes, and Jaccard as the all-integer ``|∩|·10⁶ // |∪|`` floor —
    hash-exact vs the self-join mirror.

    Scale shape: raw text never shuffles (per-batch distinct
    (source, tok) partials); ONE co-partition by token makes the global
    pair distinct exact per block, and each token fans out to at most
    C(|sources with it|, 2) ≤ C(n_sources, 2) pair rows — bounded by the
    SOURCE domain, not the corpus, so a stopword shared by every source
    costs the same as a rare term. Vocabulary sizes ride the same
    deduped table; the final size join broadcasts the O(n_sources) dict."""
    from itertools import combinations

    import ray

    from ..util import adaptive_partitions, hash_partitioned_combine

    ds = _read_docs(sf_dir, ["source", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(t.column("text"))
        lists = pc.split_pattern_regex(lowered, "[^a-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.greater_equal(pc.utf8_length(flat), 3)
        pairs = pa.table(
            {"source": t.column("source").take(parent.filter(keep)), "tok": flat.filter(keep)}
        )
        return pairs.group_by(["source", "tok"]).aggregate([])

    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["source", "tok"]).aggregate([])

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    deduped = hash_partitioned_combine(
        ds.map_batches(tok_partial, batch_format="pyarrow", batch_size=None),
        ["tok"], dedupe, adaptive_partitions(16, n_rows=n),
    ).materialize()

    sizes_ds = deduped.groupby("source").aggregate(Count(alias_name="n"))
    sizes = {r["source"]: int(r["n"]) for r in sizes_ds.take_all()}  # O(n_sources)
    sizes_ref = ray.put(sizes)

    def pair_partial(t: pa.Table) -> pa.Table:
        # tok co-partitioned => per-block pair generation is globally
        # exact; the per-token Python loop is SOURCE-domain-bounded
        df = t.to_pandas()
        out1, out2 = [], []
        for _, grp in df.groupby("tok"):
            srcs = sorted(grp["source"].unique())
            for a, b in combinations(srcs, 2):
                out1.append(a)
                out2.append(b)
        pt = pa.table(
            {"src1": pa.array(out1, pa.string()), "src2": pa.array(out2, pa.string()),
             "ones": pa.array(np.ones(len(out1), np.int64))}
        )
        g = pt.group_by(["src1", "src2"]).aggregate([("ones", "sum")])
        return g.rename_columns(["src1", "src2", "n_common"])

    inter = (
        deduped.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["src1", "src2"])
        .aggregate(Sum("n_common", alias_name="n_common"))
    )

    def finish(t: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        n1 = np.array([sz[s] for s in t.column("src1").to_pylist()], np.int64)
        n2 = np.array([sz[s] for s in t.column("src2").to_pylist()], np.int64)
        nc = t.column("n_common").cast(pa.int64()).to_numpy(zero_copy_only=False)
        jac = (nc * 1_000_000) // (n1 + n2 - nc)
        return pa.table(
            {"src1": t.column("src1"), "src2": t.column("src2"),
             "n_common": pa.array(nc), "n1": pa.array(n1), "n2": pa.array(n2),
             "jaccard_micro_floor": pa.array(jac)}
        )

    return inter.map_batches(finish, batch_format="pyarrow")


SOURCE_VOCAB_OVERLAP_SQL = """
WITH toks AS (
  SELECT DISTINCT source, UNNEST(regexp_extract_all(lower(text), '[a-z]{3,}')) AS tok
  FROM documents
),
sizes AS (SELECT source, COUNT(*)::BIGINT AS n FROM toks GROUP BY source),
inter AS (
  SELECT a.source AS src1, b.source AS src2, COUNT(*)::BIGINT AS n_common
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src1, src2, n_common, sa.n AS n1, sb.n AS n2,
       (n_common * 1000000) // (sa.n + sb.n - n_common) AS jaccard_micro_floor
FROM inter JOIN sizes sa ON sa.source = src1 JOIN sizes sb ON sb.source = src2
"""
