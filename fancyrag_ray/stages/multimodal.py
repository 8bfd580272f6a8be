"""Multimodal span processing — actor-pool stages over binary payloads.

Media spans ride the interleaved documents as opaque references (and, in
a full deployment, as ``binary`` columns with typed metadata). The image
/ audio decode libraries are not available in this sandbox, so the
*decode kernels* are stubbed (deterministic fakes gated behind
``use_fake``; real decode raises NotImplementedError) — but the Ray-side
plumbing is real and tested: schema, actor signature, batch sizing,
zero-copy binary handling, and output layout are exactly what a real
decoder drops into.

Scale notes: binary payload batches are heavy → small ``batch_size``
(default 64) and ``fixed_size_list`` feature outputs; one actor per CPU,
state (decoder/model) built once in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageDecoder:
    """binary image payload → (height, width, feature vector).

    Real backend: PIL/cv2 decode + resize + channel-mean features —
    unavailable here, stubbed with a deterministic content-hash fake so
    the pipeline shape is testable end-to-end.
    """

    FEATURE_DIM = 16

    def __init__(self, target_size: tuple[int, int] = (224, 224), use_fake: bool = True):
        self.target_size = target_size
        self.use_fake = use_fake

    def _decode_one(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if not self.use_fake:
            raise NotImplementedError("real image decode requires PIL/cv2 (not in this sandbox)")
        h = hashlib.sha256(payload).digest()
        height = 64 + h[0] * 8  # deterministic fake dimensions
        width = 64 + h[1] * 8
        feat = np.frombuffer(hashlib.sha256(payload + b"#feat").digest()[: self.FEATURE_DIM * 4], dtype=np.uint8)
        feat = (feat.astype(np.float32).reshape(-1, 4).mean(axis=1) / 255.0)[: self.FEATURE_DIM]
        feat = np.resize(feat, self.FEATURE_DIM)
        return height, width, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hs, ws, feats = [], [], np.empty((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            h, w, f = self._decode_one(p or b"")
            hs.append(h)
            ws.append(w)
            feats[i] = f
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.FEATURE_DIM
        )
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "features": feat_col,
            }
        )


class AudioFrameSampler:
    """binary audio payload → fixed-rate frame sample stats.

    Real backend: soundfile/librosa — stubbed deterministically.
    Output: one row per input with n_frames + per-frame energy vector.
    """

    N_FRAMES = 8

    def __init__(self, sample_rate: int = 16000, use_fake: bool = True):
        self.sample_rate = sample_rate
        self.use_fake = use_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        energies = np.empty((len(payloads), self.N_FRAMES), dtype=np.float32)
        durs = []
        for i, p in enumerate(payloads):
            if not self.use_fake:
                raise NotImplementedError("real audio decode requires soundfile (not in this sandbox)")
            h = hashlib.sha256(p or b"").digest()
            durs.append(round(0.5 + h[2] / 32.0, 3))
            energies[i] = np.frombuffer(h[: self.N_FRAMES * 4][: self.N_FRAMES * 4], dtype=np.uint8)[
                : self.N_FRAMES
            ].astype(np.float32) / 255.0
        e_col = pa.FixedSizeListArray.from_arrays(pa.array(energies.reshape(-1), type=pa.float32()), self.N_FRAMES)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "duration_sec": pa.array(durs, pa.float32()),
                "frame_energy": e_col,
            }
        )


class VideoFrameSampler:
    """binary video payload → one OUTPUT ROW PER SAMPLED FRAME (flattening
    1→N like the chunker, but over media): frame index, timestamp and a
    per-frame feature vector.

    Real backend: pyav/ffmpeg keyframe decode at ``fps`` — unavailable
    here, stubbed with a deterministic content-hash fake; the flattening
    shape, frame addressing ((media_ref, frame_idx) keys) and fixed-size
    feature layout are the real contract a decoder drops into.
    """

    FEATURE_DIM = 16

    def __init__(self, fps: float = 1.0, max_frames: int = 16, use_fake: bool = True):
        self.fps = fps
        self.max_frames = max_frames
        self.use_fake = use_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.use_fake:
            raise NotImplementedError("real video decode requires pyav/ffmpeg (not in this sandbox)")
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_ts = [], [], []
        feats = []
        for ref, p in zip(refs, payloads):
            h = hashlib.sha256(p or b"").digest()
            duration = 1.0 + h[3]  # deterministic fake seconds
            n = min(self.max_frames, max(1, int(duration * self.fps)))
            for k in range(n):
                o_ref.append(ref)
                o_idx.append(k)
                o_ts.append(round(k / self.fps, 3))
                fh = hashlib.sha256((p or b"") + k.to_bytes(4, "little")).digest()
                feats.append(np.frombuffer(fh[: self.FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0)
        mat = np.stack(feats) if feats else np.empty((0, self.FEATURE_DIM), dtype=np.float32)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), type=pa.float32()), self.FEATURE_DIM
        )
        return pa.table(
            {
                "media_ref": pa.array(o_ref, pa.string()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "ts_sec": pa.array(o_ts, pa.float32()),
                "features": feat_col,
            }
        )


def media_spans_table(docs_batch: pa.Table) -> pa.Table:
    """Explode media spans of interleaved docs into a (doc_id, media_ref,
    kind, payload) table; payload is a deterministic fake body derived
    from the ref (real deployments read from object storage here)."""
    spans_col = docs_batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    offsets = spans_col.offsets.to_numpy()
    values = spans_col.values
    kinds = values.field("kind").to_pylist()
    refs = values.field("media_ref").to_pylist()
    doc_ids = docs_batch.column("doc_id").to_pylist()
    o_doc, o_ref, o_kind, o_payload = [], [], [], []
    for r, d in enumerate(doc_ids):
        for j in range(int(offsets[r]), int(offsets[r + 1])):
            if kinds[j] != "text" and refs[j]:
                o_doc.append(d)
                o_ref.append(refs[j])
                o_kind.append(kinds[j])
                o_payload.append(hashlib.sha256(refs[j].encode()).digest() * 4)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "media_ref": pa.array(o_ref, pa.string()),
            "kind": pa.array(o_kind, pa.string()),
            "payload": pa.array(o_payload, pa.binary()),
        }
    )


def synth_media_docs(batch: pa.Table) -> pa.Table:
    """Deterministically attach media spans to plain driver documents
    (doc_id % 3 == 0 → an image span, % 5 == 0 → an audio span,
    % 7 == 0 → a video span; media_ref derived from doc_id) so the
    multimodal plumbing runs over the driver's own testdata — the
    media-span synthesis a real interleaved corpus would carry natively."""
    n = batch.num_rows
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ids = batch.column("doc_id").to_pylist()
    kinds, span_texts, refs, offs, lens = [], [], [], [], []
    for i, d in enumerate(ids):
        row = [("text", texts[i].as_py() or "", "", 0)]
        if d % 3 == 0:
            row.append(("image", "", f"media://image/{d}", 1))
        if d % 5 == 0:
            row.append(("audio", "", f"media://audio/{d}", 2))
        if d % 7 == 0:
            row.append(("video", "", f"media://video/{d}", 3))
        for k, t, r, o in row:
            kinds.append(k)
            span_texts.append(t)
            refs.append(r)
            offs.append(o)
        lens.append(len(row))
    span_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    structs = pa.StructArray.from_arrays(
        [pa.array(kinds), pa.array(span_texts), pa.array(refs), pa.array(offs, pa.int32())],
        fields=list(span_type),
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
    spans = pa.ListArray.from_arrays(offsets, structs)
    # the interleaved contract carries STRING doc ids (fixtures.py)
    return pa.table({"doc_id": batch.column("doc_id").cast(pa.string()), "spans": spans})


def media_frame_manifest(sf_dir: str):
    """Driver-visible MULTIMODAL run: synthesize media spans over the
    driver documents, explode them (``media_spans_table``), route each
    kind through its actor-pool stage (image decode, audio frame sample,
    video 1→N frame flatten) and emit the per-kind manifest
    (n_media, n_rows_out). The decode kernels are the documented
    deterministic fakes (PIL/soundfile/pyav absent in this sandbox), so
    counts are exact and pinned in tests; the Ray plumbing — schema,
    batch routing, actor signatures, flattening — is the real contract.
    No SQL oracle (binary payloads + sha-derived fake frame counts are
    not reasonably SQL-expressible); rows-only driver check."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(synth_media_docs, batch_format="pyarrow").map_batches(
        media_spans_table, batch_format="pyarrow"
    ).materialize()

    rows = []
    for kind, stage in (("image", ImageDecoder), ("audio", AudioFrameSampler), ("video", VideoFrameSampler)):
        sub = media.map_batches(
            lambda t, k=kind: t.filter(pa.compute.equal(t.column("kind"), k)),
            batch_format="pyarrow",
        )
        n_media = sub.count()
        out = sub.map_batches(stage, batch_format="pyarrow", batch_size=256, concurrency=(1, 2), num_cpus=1)
        rows.append({"kind": kind, "n_media": int(n_media), "n_rows_out": int(out.count())})

    import pandas as pd

    return pd.DataFrame(rows)
