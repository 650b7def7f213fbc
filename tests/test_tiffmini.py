"""tiffmini codec tests: wire-layout round trips (both byte orders on
decode), strip reassembly, photometric inversion, fail-loud rejections, and
the pngmini-style mutation fuzz (raise-or-correct, never crash)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from goose_parser_ray.functions.tiffmini import TiffError, decode_tiff, encode_tiff


def _gradient(h: int, w: int, spp: int = 3, seed: int = 0) -> np.ndarray:
    i = np.arange(h, dtype=np.int64)[:, None, None]
    j = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(spp, dtype=np.int64)[None, None, :]
    img = ((31 * i + 17 * j + 53 * c + seed) % 256).astype(np.uint8)
    return img if spp == 3 else img[:, :, 0]


def test_rgb_roundtrip_multistrip():
    img = _gradient(11, 7, 3, seed=5)
    data = encode_tiff(img, rows_per_strip=4)  # 3 strips
    assert data[:4] == b"II*\x00"
    out = decode_tiff(data)
    assert out.shape == (11, 7, 3)
    np.testing.assert_array_equal(out, img)


def test_gray_roundtrip_single_strip():
    img = _gradient(3, 9, 1, seed=2)
    data = encode_tiff(img, rows_per_strip=64)  # 1 strip → inline offsets
    out = decode_tiff(data)
    assert out.shape == (3, 9)
    np.testing.assert_array_equal(out, img)


def test_big_endian_decode():
    """Hand-build a tiny MM (big-endian) gray TIFF: the decoder must honor
    the byte-order mark for every field."""
    img = np.array([[1, 2], [3, 250]], dtype=np.uint8)
    raster = img.tobytes()
    out = bytearray(b"MM\x00*\x00\x00\x00\x00")
    strip_off = len(out)
    out += raster

    def entry(tag, typ, count, value):
        return struct.pack(">HHII", tag, typ, count, value)

    ifd = len(out)
    entries = [
        entry(256, 4, 1, 2),
        entry(257, 4, 1, 2),
        entry(258, 3, 1, 8 << 16),  # SHORT value sits in the HIGH half (BE)
        entry(259, 3, 1, 1 << 16),
        entry(262, 3, 1, 1 << 16),
        entry(273, 4, 1, strip_off),
        entry(277, 3, 1, 1 << 16),
        entry(278, 4, 1, 2),
        entry(279, 4, 1, len(raster)),
    ]
    out += struct.pack(">H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(">I", 0)
    out[4:8] = struct.pack(">I", ifd)
    np.testing.assert_array_equal(decode_tiff(bytes(out)), img)


def test_white_is_zero_inverts():
    img = _gradient(2, 2, 1)
    data = bytearray(encode_tiff(img, rows_per_strip=8))
    # photometric tag (262) is entry #4 (0-based) in tag order; flip its
    # SHORT value 1 → 0 by scanning the IFD rather than hardcoding offsets
    (ifd,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd)
    for i in range(n):
        base = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack_from("<HHI", data, base)
        if tag == 262:
            data[base + 8 : base + 10] = struct.pack("<H", 0)
    np.testing.assert_array_equal(decode_tiff(bytes(data)), 255 - img)


def test_rejections():
    img = _gradient(4, 4, 3)
    good = encode_tiff(img)
    with pytest.raises(TiffError):
        decode_tiff(b"")
    with pytest.raises(TiffError):
        decode_tiff(b"XX" + good[2:])  # bad byte-order mark
    with pytest.raises(TiffError):
        decode_tiff(good[:2] + b"\x2b\x00" + good[4:])  # magic != 42
    with pytest.raises(TiffError):
        decode_tiff(good[: len(good) // 2])  # truncated IFD
    with pytest.raises(TiffError):
        encode_tiff(np.zeros((2, 2), dtype=np.int32))  # wrong dtype
    with pytest.raises(TiffError):
        encode_tiff(np.zeros((0, 4), dtype=np.uint8))  # empty


def test_mutation_fuzz_raise_or_correct():
    """Single-byte corruptions must either raise TiffError or decode to
    SOME uint8 raster — no hangs, no foreign exceptions, no OOM reshapes
    (pngmini fuzz discipline, tests/test_pngmini.py)."""
    img = _gradient(9, 6, 3, seed=11)
    good = encode_tiff(img, rows_per_strip=4)
    for pos in range(len(good)):
        for delta in (1, 0x80):
            bad = bytearray(good)
            bad[pos] = (bad[pos] + delta) % 256
            try:
                out = decode_tiff(bytes(bad))
                assert out.dtype == np.uint8
                assert out.size <= 16_000_000  # sanity: no absurd reshape
            except TiffError:
                pass
