"""Multimodal column stages — opaque ``binary`` payloads with typed metadata.

Image/audio/video libraries do not exist in this sandbox, so the DECODE step
is a clearly-marked stub (deterministic fake via ``fake=True``, or
``NotImplementedError`` otherwise); everything Ray-side — schema, actor
signature, batch sizing, output layout — is real and tested
(tests/test_functions.py), so a real codec drops into ``_decode_real``
without touching pipeline code.

Batch-size note (guide "Memory-aware"): binary payloads are wide — callers
should pass small ``batch_size`` (e.g. 16) for these stages so
batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_META = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("format", pa.string())]
)


class ImageDecodeActor:
    """binary payload → decoded feature vector + metadata.

    ``fake=True`` (default in-sandbox): deterministic pseudo-decode — feature
    vector seeded from crc32 of the payload, metadata parsed from the
    payload's first bytes if present. ``fake=False`` raises
    ``NotImplementedError`` until a codec is available."""

    def __init__(self, payload_col: str = "payload", fake: bool = True, dim: int = 16):
        self.payload_col, self.fake, self.dim = payload_col, fake, dim

    def _decode_real(self, payload: bytes):  # pragma: no cover - no codec
        raise NotImplementedError(
            "no image codec in this environment; run with fake=True or "
            "install a codec and implement _decode_real"
        )

    def _decode_fake(self, payload: bytes):
        seed = zlib.crc32(payload or b"")
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        feat = rng.rand(self.dim).astype(np.float32)
        w = (seed % 640) + 1
        h = ((seed >> 8) % 480) + 1
        return feat, {"width": w, "height": h, "format": "fake"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats, metas = [], []
        for p in payloads:
            decode = self._decode_fake if self.fake else self._decode_real
            f, m = decode(p or b"")
            feats.append(f.tolist())
            metas.append(m)
        batch = batch.append_column("features", pa.array(feats, pa.list_(pa.float32())))
        return batch.append_column("meta", pa.array(metas, MEDIA_META))


class FrameSampleActor:
    """video payload → every Nth "frame" reference (stub: deterministic
    frame index list from payload length; real sampler slots in)."""

    def __init__(self, payload_col: str = "payload", every_n: int = 10, fake: bool = True):
        self.payload_col, self.every_n, self.fake = payload_col, every_n, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        if not self.fake:  # pragma: no cover
            raise NotImplementedError("no video codec in this environment")
        frames = [
            list(range(0, max(1, len(p or b"") // 100), self.every_n))
            for p in payloads
        ]
        return batch.append_column(
            "frame_indices", pa.array(frames, pa.list_(pa.int32()))
        )
