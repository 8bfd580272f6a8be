import hashlib

import pyarrow as pa
import pytest

from fancyrag_ray.config import PROFILES, ChunkProfile
from fancyrag_ray.stages.chunker import chunk_batch, split_boundaries


def mkdoc(doc_id, spans):
    span_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    arr = pa.array(
        [[{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans]],
        type=pa.list_(span_type),
    )
    return pa.table({"doc_id": pa.array([doc_id]), "spans": arr})


class TestBoundaries:
    def test_exact_short(self):
        assert split_boundaries(100, 600, 100, False) == [(0, 100)]

    def test_exact_equal(self):
        assert split_boundaries(600, 600, 100, False) == [(0, 600)]

    def test_exact_one_over(self):
        assert split_boundaries(601, 600, 100, False) == [(0, 600), (500, 601)]

    def test_exact_counts(self):
        import math

        for n in [1, 99, 100, 101, 599, 600, 601, 1100, 1101, 5000]:
            b = split_boundaries(n, 600, 100, False)
            assert len(b) == math.ceil(max(1, n - 100) / 500)
            # full coverage, correct overlap
            assert b[0][0] == 0 and b[-1][1] == n
            for (s0, e0), (s1, e1) in zip(b, b[1:]):
                assert s1 == e0 - 100

    def test_approximate_no_mid_word(self):
        text = ("word " * 500).strip()
        b = split_boundaries(len(text), 600, 100, True, text)
        for s, e in b[:-1]:
            # boundary char or its predecessor is whitespace => no word cut
            assert text[e - 1].isspace() or text[e].isspace()
        assert b[-1][1] == len(text)

    def test_approximate_coverage(self):
        text = "x" * 2000  # no whitespace: falls back to exact ends
        b = split_boundaries(len(text), 600, 100, True, text)
        assert b[0][0] == 0 and b[-1][1] == 2000
        covered = set()
        for s, e in b:
            covered.update(range(s, e))
        assert covered == set(range(2000))


class TestChunkBatch:
    def test_single_text_span(self):
        text = "a" * 1100
        out = chunk_batch(mkdoc("d1", [("text", text, "", 0)]), PROFILES["text-exact"])
        assert out.num_rows == 2
        assert out.column("seq").to_pylist() == [1, 2]
        assert out.column("index").to_pylist() == [0, 1]
        assert out.column("text").to_pylist()[0] == "a" * 600
        assert out.column("offset_start").to_pylist() == [0, 500]
        ck = hashlib.sha256(("a" * 600).encode()).hexdigest()
        assert out.column("checksum").to_pylist()[0] == ck
        uid = hashlib.sha256(f"d1:1:{'a' * 600}".encode()).hexdigest()
        assert out.column("chunk_uid").to_pylist()[0] == uid

    def test_media_span_carry(self):
        spans = [
            ("text", "x" * 300, "", 0),
            ("image", "", "image://b/d/1", 300),
            ("text", "y" * 400, "", 300),
        ]
        out = chunk_batch(mkdoc("d2", spans), PROFILES["text-exact"])
        # 700 chars -> chunks [0,600),[500,700)
        assert out.num_rows == 2
        kinds = out.column("span_kinds").to_pylist()
        refs = out.column("media_refs").to_pylist()
        assert kinds[0] == ["text", "image", "text"]  # media at pos 300 inside [0,600)
        assert refs[0] == ["image://b/d/1"]
        assert kinds[1] == ["text"]  # second chunk [500,700) only overlaps y-span
        assert refs[1] == []

    def test_trailing_media_attaches_to_last_chunk(self):
        spans = [("text", "z" * 100, "", 0), ("audio", "", "audio://b/d/1", 100)]
        out = chunk_batch(mkdoc("d3", spans), PROFILES["text-exact"])
        assert out.num_rows == 1
        assert out.column("media_refs").to_pylist()[0] == ["audio://b/d/1"]

    def test_uid_deterministic_across_calls(self):
        doc = mkdoc("d4", [("text", "hello world " * 100, "", 0)])
        a = chunk_batch(doc, PROFILES["text"])
        b = chunk_batch(doc, PROFILES["text"])
        assert a.column("chunk_uid").to_pylist() == b.column("chunk_uid").to_pylist()

    def test_doc_id_type_passthrough(self):
        span_type = pa.struct(
            [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
        )
        arr = pa.array([[{"kind": "text", "text": "abc", "media_ref": "", "offset": 0}]], type=pa.list_(span_type))
        t = pa.table({"doc_id": pa.array([7], type=pa.int64()), "spans": arr})
        out = chunk_batch(t, PROFILES["text-exact"])
        assert out.column("doc_id").type == pa.int64()
        uid = hashlib.sha256("7:1:abc".encode()).hexdigest()
        assert out.column("chunk_uid").to_pylist() == [uid]

    def test_profile_validation(self):
        with pytest.raises(ValueError):
            ChunkProfile("bad", 100, 100)
