"""Minimal REAL PNG codec — stdlib ``zlib`` + numpy, no external imaging
library, so the multimodal pipeline gains a fully-functional compressed
image path alongside Netpbm (``netpbm.py``) and the disclosed JPEG stubs
(``multimodal.py``).

Spec subset (PNG 1.2): 8-bit depth, color types 0 (grayscale), 2 (RGB)
and 6 (RGBA), interlace 0, all five scanline filters (None/Sub/Up/
Average/Paeth) on decode, chunk CRC32 verification, multi-IDAT streams.
The encoder emits valid chunks with a caller-chosen or per-row cycling
filter so round-trip tests exercise every decode path.

Everything raises ``ValueError`` loudly on malformed input — a corrupt
payload in a 100 TB corpus must surface as a quarantined row, never as
silently wrong pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to one raw scanline (int16 work domain)."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        out = r - _paeth(left, up, upleft)
    else:  # pragma: no cover - encoder only emits 0-4
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec pseudo-code, elementwise)."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """uint8 (h, w) / (h, w, 3) / (h, w, 4) array → PNG bytes.

    ``filter_mode``: 'none' (all rows filter 0) or 'cycle' (row i uses
    filter i % 5 — deterministic, and forces a decoder to handle every
    filter type; content is identical either way).
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, ch = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, ch = 6, 4
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    bpp = ch
    stride = w * ch
    raw = flat.reshape(h, stride)
    lines = []
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        f = 0 if filter_mode == "none" else i % 5
        lines.append(bytes([f]) + _filter_row(f, raw[i], prev, bpp).tobytes())
        prev = raw[i]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


def _iter_chunks(payload: bytes):
    pos = len(_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        yield tag, body
        pos += 12 + length
        if tag == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w) or (h, w, ch) array. Supports the subset
    documented in the module docstring; loud ValueError otherwise."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError(f"not a PNG (signature {payload[:8]!r})")
    ihdr = None
    idat = []
    for tag, body in _iter_chunks(payload):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype} interlace={interlace})"
        )
    ch = _CHANNELS[ctype]
    stride = w * ch
    if h * (stride + 1) > 256 * 1024 * 1024:
        raise ValueError(f"PNG raster {w}x{h}x{ch} exceeds the 256 MiB guard")
    try:
        data = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt DEFLATE → same loud contract
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(data) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size {len(data)} != expected {h * (stride + 1)}"
        )
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for i in range(h):
        f = int(rows[i, 0])
        raw = rows[i, 1:].astype(np.int64)
        if f == 0:
            rec = raw
        elif f == 1:
            # recon[x] = raw[x] + recon[x-bpp]: per-channel running sum,
            # exact under mod-256 (addition is a homomorphism)
            rec = np.cumsum(raw.reshape(w, ch), axis=0).reshape(stride) % 256
        elif f == 2:
            rec = (raw + prev) % 256
        elif f == 3:
            rec = _unfilter_avg(raw, prev, ch, w)
        elif f == 4:
            rec = _unfilter_paeth(raw, prev, ch, w)
        else:
            raise ValueError(f"bad scanline filter {f} at row {i}")
        out[i] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def _unfilter_avg(raw: np.ndarray, prev: np.ndarray, ch: int, w: int) -> np.ndarray:
    """Average filter: left neighbor is the *reconstructed* pixel, so scan
    pixel-groups left→right (vectorized across channels)."""
    r = raw.reshape(w, ch)
    up = prev.reshape(w, ch)
    rec = np.empty((w, ch), dtype=np.int64)
    left = np.zeros(ch, dtype=np.int64)
    for x in range(w):
        left = (r[x] + (left + up[x]) // 2) % 256
        rec[x] = left
    return rec.reshape(w * ch)


def _unfilter_paeth(raw: np.ndarray, prev: np.ndarray, ch: int, w: int) -> np.ndarray:
    r = raw.reshape(w, ch)
    up = prev.reshape(w, ch)
    rec = np.empty((w, ch), dtype=np.int64)
    left = np.zeros(ch, dtype=np.int64)
    upleft = np.zeros(ch, dtype=np.int64)
    for x in range(w):
        left = (r[x] + _paeth(left, up[x], upleft)) % 256
        rec[x] = left
        upleft = up[x]
    return rec.reshape(w * ch)
