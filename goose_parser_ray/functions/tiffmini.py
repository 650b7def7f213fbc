"""Minimal REAL TIFF codec — baseline uncompressed, 8-bit gray/RGB, strips.

Joins the in-repo codec family (pngmini/gifmini/bmpmini/netpbm/wav/pdfmini):
the wire format is produced and consumed for real — header, IFD entry walk,
out-of-line value arrays, multi-strip raster reassembly — so the media
pipeline exercises actual decode work per TIFF 6.0 §2-3, not a stub.

Supported on decode: II and MM byte orders, BitsPerSample 8,
Compression 1 (none), PhotometricInterpretation 0/1/2, SamplesPerPixel 1
or 3, any RowsPerStrip (multi-strip reassembly), SHORT/LONG entry types,
inline and offset-stored values. Anything else raises ``TiffError`` —
fail loud; the extraction pipeline's quarantine catches raisers.

Encode writes little-endian (II), strip-split at ``rows_per_strip`` so the
multi-strip path is exercised by construction.

Scale shape: pure per-payload kernel; the query wrapper runs it in an actor
pool with small batches (wide binary payloads — ray_guide: batch size down
when payload bytes up).
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_TYPE_SIZES = {3: 2, 4: 4}  # SHORT, LONG


def encode_tiff(img: np.ndarray, rows_per_strip: int = 4) -> bytes:
    """Encode an (h, w) gray or (h, w, 3) RGB uint8 array as an
    uncompressed little-endian TIFF with ``rows_per_strip``-row strips."""
    if img.dtype != np.uint8:
        raise TiffError("encode_tiff expects uint8")
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
        photometric = 1  # BlackIsZero
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        spp = 3
        photometric = 2  # RGB
    else:
        raise TiffError(f"unsupported shape {img.shape}")
    if h == 0 or w == 0:
        raise TiffError("empty image")

    raster = img.tobytes()
    row_bytes = w * spp
    strips: list[bytes] = []
    for r0 in range(0, h, rows_per_strip):
        r1 = min(h, r0 + rows_per_strip)
        strips.append(raster[r0 * row_bytes : r1 * row_bytes])

    out = bytearray(b"II*\x00\x00\x00\x00\x00")  # IFD offset patched below
    strip_offsets: list[int] = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"  # IFD must start on a word boundary

    # out-of-line value arrays (written before the IFD, offsets recorded)
    extra: dict[str, int] = {}
    if spp == 3:
        extra["bits"] = len(out)
        out += struct.pack("<3H", 8, 8, 8)
        if len(out) % 2:
            out += b"\x00"
    if len(strips) > 1:
        extra["offsets"] = len(out)
        out += struct.pack(f"<{len(strips)}I", *strip_offsets)
        extra["counts"] = len(out)
        out += struct.pack(f"<{len(strips)}I", *(len(s) for s in strips))

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(_TAG_WIDTH, 4, 1, w),
        entry(_TAG_HEIGHT, 4, 1, h),
        entry(
            _TAG_BITS,
            3,
            spp,
            8 if spp == 1 else extra["bits"],
        ),
        entry(_TAG_COMPRESSION, 3, 1, 1),
        entry(_TAG_PHOTOMETRIC, 3, 1, photometric),
        entry(
            _TAG_STRIP_OFFSETS,
            4,
            len(strips),
            strip_offsets[0] if len(strips) == 1 else extra["offsets"],
        ),
        entry(_TAG_SPP, 3, 1, spp),
        entry(_TAG_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _TAG_STRIP_COUNTS,
            4,
            len(strips),
            len(strips[0]) if len(strips) == 1 else extra["counts"],
        ),
    ]
    ifd_offset = len(out)
    out += struct.pack("<H", len(entries))
    for e in entries:  # tags are already in ascending order, per spec
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    out[4:8] = struct.pack("<I", ifd_offset)
    return bytes(out)


def _read_values(
    data: bytes, endian: str, typ: int, count: int, raw: bytes
) -> list[int]:
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise TiffError(f"unsupported entry type {typ}")
    if count == 0:
        raise TiffError("zero-count entry")
    total = size * count
    fmt = "H" if typ == 3 else "I"
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(data):
            raise TiffError("value array out of bounds")
        buf = data[off : off + total]
    return list(struct.unpack(f"{endian}{count}{fmt}", buf))


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode an uncompressed 8-bit gray/RGB TIFF → (h, w[, 3]) uint8."""
    if len(data) < 8:
        raise TiffError("truncated header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise TiffError(f"bad byte-order mark {data[:2]!r}")
    (magic,) = struct.unpack_from(endian + "H", data, 2)
    if magic != 42:
        raise TiffError(f"bad magic {magic}")
    (ifd,) = struct.unpack_from(endian + "I", data, 4)
    if ifd + 2 > len(data):
        raise TiffError("IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd)
    if n_entries == 0:
        raise TiffError("empty IFD")
    if ifd + 2 + 12 * n_entries + 4 > len(data):
        raise TiffError("IFD out of bounds")

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack_from(endian + "HHI", data, base)
        tags[tag] = _read_values(data, endian, typ, count, data[base + 8 : base + 12])

    def one(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return tags[tag][0]

    w = one(_TAG_WIDTH)
    h = one(_TAG_HEIGHT)
    if w == 0 or h == 0:
        raise TiffError("zero dimension")
    compression = one(_TAG_COMPRESSION, 1)
    if compression != 1:
        raise TiffError(f"unsupported compression {compression}")
    spp = one(_TAG_SPP, 1)
    if spp not in (1, 3):
        raise TiffError(f"unsupported samples/pixel {spp}")
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise TiffError(f"unsupported bits/sample {bits}")
    photometric = one(_TAG_PHOTOMETRIC)
    if photometric not in (0, 1, 2):
        raise TiffError(f"unsupported photometric {photometric}")
    if (photometric == 2) != (spp == 3):
        raise TiffError("photometric / samples-per-pixel mismatch")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing or mismatched strip tables")

    raster = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise TiffError("strip out of bounds")
        raster += data[off : off + cnt]
    expected = h * w * spp
    if len(raster) != expected:
        raise TiffError(f"raster size {len(raster)} != {expected}")
    img = np.frombuffer(bytes(raster), dtype=np.uint8)
    img = img.reshape((h, w) if spp == 1 else (h, w, 3))
    if photometric == 0:  # WhiteIsZero: invert to min-is-black
        img = 255 - img
    return img
