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
