"""Corpus lexical statistics (bigram counts, common-word fraction, BM25)
and common-neighbor link prediction — planted-input semantics. Oracle
parity for the driver queries is covered by tests/test_oracle.py; these
pin the operator semantics on inputs small enough to verify by hand."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from fancyrag_ray.functions.corpus import (
    common_word_fraction,
    fulltext_bm25,
    word_bigram_counts,
)
from fancyrag_ray.functions.graph import common_neighbor_scores


def _docs_ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


class TestBigrams:
    def test_counts_and_order(self, ray_session):
        out = word_bigram_counts(
            _docs_ds(["a b a b", "b a b", ""]), k=10
        ).to_pandas()
        # "a b": doc0 has (a b),(b a),(a b) → 2; doc1 has (b a),(a b) → 1
        got = dict(zip(out["bigram"], out["n"]))
        assert got == {"a b": 3, "b a": 2}
        # descending count order, bigram tiebreak
        assert list(out["bigram"]) == ["a b", "b a"]

    def test_no_cross_document_pairs(self, ray_session):
        out = word_bigram_counts(_docs_ds(["x", "y"]), k=10).to_pandas()
        assert len(out) == 0  # "x y" must NOT appear

    def test_case_folding_and_whitespace(self, ray_session):
        out = word_bigram_counts(_docs_ds(["A  b", "a B"]), k=10).to_pandas()
        assert dict(zip(out["bigram"], out["n"])) == {"a b": 2}


class TestCommonWordFraction:
    def test_planted(self, ray_session, tmp_path):
        # 'common' dominates the corpus; doc 2 avoids it entirely
        sf = _write_docs(
            tmp_path,
            ["common common rare1", "common rare2", "rare3 rare4 rare5 rare6"],
        )
        out = common_word_fraction(sf, vocab_k=1).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_words"] == 3 and out.loc[0, "n_common"] == 2
        assert out.loc[0, "common_frac_bp"] == (10000 * 2) // 3
        assert out.loc[1, "common_frac_bp"] == 5000
        assert out.loc[2, "n_common"] == 0 and out.loc[2, "common_frac_bp"] == 0

    def test_empty_docs_emit_no_row(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, ["a b", "", "   "])
        out = common_word_fraction(sf, vocab_k=4).to_pandas()
        assert list(out["doc_id"]) == [0]


class TestBm25:
    def test_ranking_favors_rare_term_and_short_doc(self, ray_session, tmp_path):
        filler = "pad " * 50
        sf = _write_docs(
            tmp_path,
            [
                "scan " + filler,            # 0: one hit, long
                "scan scan",                 # 1: two hits, short
                filler,                      # 2: no hits → filtered out
                "join window scan",          # 3: all three terms
            ],
        )
        out = fulltext_bm25(sf, k=10).to_pandas()
        assert set(out["doc_id"]) == {0, 1, 3}
        # doc 3 matches all three terms (two of them rare, idf high)
        assert out.iloc[0]["doc_id"] == 3
        # more hits in a shorter doc outranks one hit in a long doc
        ranks = {d: i for i, d in enumerate(out["doc_id"])}
        assert ranks[1] < ranks[0]
        assert (out["score"] > 0).all()
        # scores strictly descending with doc_id tiebreak
        s = out["score"].to_numpy()
        assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))


class TestCommonNeighbors:
    def _edges(self, pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([p[0] for p in pairs], pa.string()),
                    "dst_id": pa.array([p[1] for p in pairs], pa.string()),
                }
            )
        )

    def test_square_graph(self, ray_session):
        # square a-b-c-d-a: opposite corners share exactly 2 neighbors,
        # adjacent corners share 0
        out = common_neighbor_scores(
            self._edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
        ).to_pandas()
        got = {(r.u, r.v): (r.n_common, r.jaccard) for r in out.itertuples()}
        assert got == {("a", "c"): (2, 1.0), ("b", "d"): (2, 1.0)}

    def test_jaccard_denominator(self, ray_session):
        # star: hub h connects a,b,c → every leaf pair shares exactly {h};
        # deg(leaf)=1 so jaccard = 1/(1+1-1) = 1.0; hub pairs with nobody
        out = common_neighbor_scores(
            self._edges([("h", "a"), ("h", "b"), ("h", "c")])
        ).to_pandas()
        assert len(out) == 3
        assert (out["n_common"] == 1).all() and (out["jaccard"] == 1.0).all()
        assert "h" not in set(out["u"]) | set(out["v"])

    def test_direction_and_duplicate_invariance(self, ray_session):
        base = [("a", "b"), ("b", "c")]
        dup = base + [("b", "a"), ("c", "b"), ("a", "b")]
        t1 = common_neighbor_scores(self._edges(base)).to_pandas()
        t2 = common_neighbor_scores(self._edges(dup)).to_pandas()
        assert t1.to_dict("records") == t2.to_dict("records")

    def test_empty(self, ray_session):
        out = common_neighbor_scores(self._edges([]))
        assert out.count() == 0
        # schema survives the empty return (rd.from_arrow on a typed table)
        assert out.schema().names == ["u", "v", "n_common", "deg_u", "deg_v", "jaccard"]


class TestBigramOov:
    def test_garbled_doc_scores_higher(self, ray_session, tmp_path):
        """A doc made of corpus-typical bigrams scores near 0 bp; a
        garbled doc of never-repeated bigrams scores 10000 bp."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fancyrag_ray.functions.corpus import bigram_oov_rate

        normal = "the quick brown fox " * 30
        texts = [normal] * 9 + ["zq1 xv2 kj3 wp4 mn5 bt6 cr7 dl8"]
        t = pa.table({
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(t, f"{tmp_path}/documents.parquet")
        out = bigram_oov_rate(str(tmp_path), vocab_k=4).to_pandas().set_index("doc_id")
        assert (out.loc[range(9), "oov_bp"] == 0).all()  # the 4 repeated bigrams ARE the vocab
        assert out.loc[9, "oov_bp"] == 10000             # all bigrams unseen twice
        assert out.loc[9, "n_oov"] == out.loc[9, "n_bigrams"]

    def test_sql_mirror_on_planted(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fancyrag_ray.functions.corpus import BIGRAM_OOV_RATE_SQL, bigram_oov_rate

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b c", "c a  b", "single"], pa.string()),
        })
        pq.write_table(t, f"{tmp_path}/documents.parquet")
        out = (
            bigram_oov_rate(str(tmp_path))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        sql = con.execute(BIGRAM_OOV_RATE_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)
        assert out.equals(sql)
        assert 3 not in set(out["doc_id"])  # single-word doc has no bigram
