"""Netpbm P5 (binary PGM) codec — a REAL image decode path with no
external libraries (the format is a text header + raw bytes), so the
multimodal pipeline has one fully-functional codec alongside the disclosed
JPEG/PNG stubs in ``multimodal.py``.

Grammar handled: ``P5``, whitespace- and ``#``-comment-separated header
tokens (width, height, maxval ≤ 255), ONE whitespace byte, then
``width × height`` raw bytes. Encoder emits the canonical form.
"""

from __future__ import annotations

import numpy as np


def encode_pgm(img: "np.ndarray") -> bytes:
    """uint8 (h, w) array → binary PGM bytes."""
    if img.ndim != 2:
        raise ValueError(f"PGM is grayscale 2-D, got shape {img.shape}")
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode("ascii") + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def _parse_header(payload: bytes, magic: bytes, kind: str) -> tuple[int, int, int]:
    """Shared P5/P6 header scan → (width, height, raster_start)."""
    if payload[:2] != magic:
        raise ValueError(f"not a binary {kind} (magic {payload[:2]!r})")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError(f"truncated {kind} header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl == -1 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad {kind} header token {tok!r}")
            tokens.append(int(tok))
            pos = end
    w, h, maxval = tokens
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported {kind} maxval {maxval}")
    return w, h, pos + 1  # one whitespace byte separates header and raster


def decode_pgm(payload: bytes) -> "np.ndarray":
    """Binary PGM bytes → uint8 (h, w) array. Raises ValueError on a
    malformed header or truncated pixel data (loud, never silent)."""
    w, h, pos = _parse_header(payload, b"P5", "PGM")
    raster = payload[pos : pos + w * h]
    if len(raster) != w * h:
        raise ValueError(
            f"truncated PGM raster: need {w * h} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w)


def encode_ppm(img: "np.ndarray") -> bytes:
    """uint8 (h, w, 3) array → binary PPM (P6) bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"PPM is RGB (h, w, 3), got shape {img.shape}")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Binary PPM (P6) bytes → uint8 (h, w, 3) array; loud on malformed."""
    w, h, pos = _parse_header(payload, b"P6", "PPM")
    need = 3 * w * h
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"truncated PPM raster: need {need} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(
    img: "np.ndarray", out_w: int, out_h: int
) -> "np.ndarray":
    """Nearest-neighbor downscale/upscale via pure index gather:
    out[i, j] = img[(i*h)//out_h, (j*w)//out_w]. Accepts (h, w) grayscale
    or (h, w, c) channel-last images — trailing axes ride along."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[rows][:, cols]
