"""Windows BMP (BITMAPINFOHEADER, 24-bit BI_RGB) codec — a REAL image
decode path with no external libraries, the third fully-functional raster
codec beside Netpbm (``netpbm.py``) and PNG (``pngmini.py``).

Grammar handled: 14-byte BITMAPFILEHEADER (``BM`` magic + pixel-data
offset), 40-byte BITMAPINFOHEADER (24 bpp, BI_RGB only, positive height =
bottom-up rows), BGR pixel order, each row zero-padded to a 4-byte
boundary. The encoder emits the canonical minimal form (offset 54, zero
resolution fields); the decoder accepts any conformant offset and is LOUD
(``ValueError``) on bad magic, unsupported bpp/compression, or a
truncated raster — quarantine semantics, never silent garbage.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def _row_stride(width: int) -> int:
    return (3 * width + 3) & ~3


def encode_bmp(img: "np.ndarray") -> bytes:
    """uint8 (h, w, 3) RGB array → 24-bit BI_RGB BMP bytes (bottom-up,
    BGR, rows padded to 4 bytes — the canonical layout)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"BMP24 wants (h, w, 3) RGB, got shape {img.shape}")
    h, w, _ = img.shape
    stride = _row_stride(w)
    raster = np.zeros((h, stride), dtype=np.uint8)
    # RGB → BGR, top row last (bottom-up)
    raster[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)
    body = raster.tobytes()
    info = _INFO_HDR.pack(40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    file_hdr = _FILE_HDR.pack(b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_hdr + info + body


def decode_bmp(payload: bytes) -> "np.ndarray":
    """24-bit BI_RGB BMP bytes → uint8 (h, w, 3) RGB array. Raises
    ValueError on malformed header, unsupported variant, or truncated
    raster (loud, never silent)."""
    if len(payload) < 14 + 40:
        raise ValueError(f"BMP shorter than its headers ({len(payload)} B)")
    magic, _file_size, _r1, _r2, offset = _FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (size, w, h, planes, bpp, comp, _img_size, _xr, _yr, _ncol, _nimp) = (
        _INFO_HDR.unpack_from(payload, 14)
    )
    if size != 40:
        raise ValueError(f"unsupported DIB header size {size} (want 40)")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes} bpp={bpp} comp={comp})"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    bottom_up = h > 0
    h = abs(h)
    stride = _row_stride(w)
    need = offset + stride * h
    if offset < 54 or len(payload) < need:
        raise ValueError(
            f"truncated BMP raster: need {need} bytes, have {len(payload)}"
        )
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    img = raster[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)
