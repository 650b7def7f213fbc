"""Minimal RIFF/WAVE PCM16 codec — REAL audio bytes, no external library.

Mirrors the in-repo Netpbm codec's role for images: gives the audio stages
an actual encode → binary column → decode path (the stub codecs in
multimodal.py remain for formats the sandbox genuinely can't decode).
Differential parity with the stdlib ``wave`` module is locked in
tests/test_wav.py — both directions (our bytes read by ``wave``, ``wave``
bytes read by us).

Format notes: canonical 44-byte header (RIFF size, 'WAVE', 'fmt ' chunk of
16 bytes, PCM tag 1, mono/stereo, 16-bit), then the 'data' chunk. The
decoder WALKS chunks rather than assuming the canonical offset — real-world
WAVs interleave 'LIST'/'fact' chunks before 'data'.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """int16 sample array (frames × channels interleaved flat) → WAV bytes."""
    x = np.ascontiguousarray(samples, dtype="<i2")
    data = x.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 sample array, sample_rate, channels).

    Walks RIFF sub-chunks (handles non-canonical layouts with extra chunks
    before 'data'); rejects non-PCM / non-16-bit encodings explicitly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    sample_rate = channels = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            tag, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding tag={tag} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("WAV data chunk has odd byte length")
    return np.frombuffer(data, dtype="<i2"), int(sample_rate), int(channels)
