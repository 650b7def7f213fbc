"""Run-length encoding for binary masks — the CCITT-G3/TIFF-family
compression idea reduced to its core: each row is stored as alternating
run lengths starting with BACKGROUND (a leading 0-length run when the row
opens with foreground), so the bit pattern is fully determined by the
lengths alone.

Wire format (little-endian uint16): per row ``[n_runs, len_0, len_1, …]``
with Σ lens == width; whole mask = ``[height, width]`` header + rows.
Decode re-verifies every row sum and the total size — the codec
mutation-fuzz contract: raise ValueError or return the exact mask, never
garbage. Upstream context: goose-parser has no raster layer; this joins
the in-repo codec family (netpbm/BMP/TIFF) as the mask-compression step
of a document-layout pipeline (SURVEY §2.6 S30-S32).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_rle_mask", "decode_rle_mask"]

_U16_MAX = 0xFFFF


def encode_rle_mask(mask: np.ndarray) -> bytes:
    """Boolean HxW mask → RLE bytes. Rows longer than 65535 or more runs
    than fit a row header raise (format limit, not silent truncation)."""
    m = np.asarray(mask, dtype=bool)
    if m.ndim != 2:
        raise ValueError("rle: mask must be 2-D")
    h, w = m.shape
    if h > _U16_MAX or w > _U16_MAX:
        raise ValueError("rle: dimensions exceed uint16")
    out = [np.array([h, w], np.uint16)]
    for row in m:
        # run boundaries via diff on the padded bit row
        edges = np.flatnonzero(np.diff(row.view(np.int8))) + 1
        bounds = np.concatenate(([0], edges, [w]))
        lens = np.diff(bounds)
        if row.size and row[0]:
            lens = np.concatenate(([0], lens))  # leading background run
        if lens.size > _U16_MAX:
            raise ValueError("rle: too many runs in a row")
        out.append(np.array([lens.size], np.uint16))
        out.append(lens.astype(np.uint16))
    return b"".join(a.tobytes() for a in out)


def decode_rle_mask(data: bytes) -> np.ndarray:
    """RLE bytes → boolean HxW mask; ValueError on any inconsistency."""
    buf = np.frombuffer(data, dtype=np.uint16)
    if buf.size < 2:
        raise ValueError("rle: truncated header")
    h, w = int(buf[0]), int(buf[1])
    pos = 2
    rows = []
    for _ in range(h):
        if pos >= buf.size:
            raise ValueError("rle: truncated row header")
        n = int(buf[pos])
        pos += 1
        if pos + n > buf.size:
            raise ValueError("rle: truncated row data")
        lens = buf[pos : pos + n].astype(np.int64)
        pos += n
        if int(lens.sum()) != w:
            raise ValueError("rle: row lengths do not sum to width")
        row = np.zeros(w, dtype=bool)
        # runs alternate bg, fg, bg, ... ; odd indices are foreground
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        for i in range(1, n, 2):
            row[starts[i] : starts[i] + lens[i]] = True
        rows.append(row)
    if pos != buf.size:
        raise ValueError("rle: trailing bytes")
    return np.vstack(rows) if rows else np.zeros((0, w), bool)
