"""bmpmini codec: exact roundtrip (padding widths), orientation/channel
order proof against a hand-built reference raster, and mutation fuzz
(raise-ValueError-or-decode-correct-shape, never crash)."""

import struct

import numpy as np
import pytest

from goose_parser_ray.functions.bmpmini import decode_bmp, encode_bmp


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 13])
@pytest.mark.parametrize("h", [1, 3, 8])
def test_roundtrip_exact_all_padding_classes(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bottom_up_bgr_layout_on_wire():
    """The encoded raster must be bottom-up BGR with 4-byte row padding —
    checked byte-for-byte, not via the paired decoder."""
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = (1, 2, 3)    # top-left RGB
    img[1, 2] = (9, 8, 7)    # bottom-right RGB
    raw = encode_bmp(img)
    offset = struct.unpack_from("<I", raw, 10)[0]
    stride = 12  # 3*3=9 padded to 12
    rows = raw[offset:]
    # first stored row = BOTTOM image row; pixels are B,G,R
    assert rows[:stride][6:9] == bytes([7, 8, 9])
    # second stored row = TOP image row, first pixel
    assert rows[stride : stride + 3] == bytes([3, 2, 1])
    # padding bytes are zero
    assert rows[9:12] == b"\x00\x00\x00"


def test_top_down_negative_height_accepted():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = bytearray(encode_bmp(img))
    # flip to top-down: negate height and un-reverse the rows
    struct.pack_into("<i", raw, 14 + 8, -2)
    offset = struct.unpack_from("<I", raw, 10)[0]
    stride = 12
    body = bytes(raw[offset:])
    raw[offset:] = body[stride:] + body[:stride]
    assert np.array_equal(decode_bmp(bytes(raw)), img)


def test_loud_on_malformed():
    img = np.ones((2, 2, 3), dtype=np.uint8)
    good = encode_bmp(img)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])  # bad magic
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 14 + 14, 8)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError):
        decode_bmp(good[:-1])  # truncated raster


def test_mutation_fuzz_never_crashes_uncontrolled():
    """Any single-byte mutation either still decodes to a uint8 array (the
    raster has no checksum, so pixel flips legitimately decode) or raises
    ValueError — never another exception type."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    good = bytearray(encode_bmp(img))
    for _ in range(300):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_bmp(bytes(b))
            assert out.dtype == np.uint8
        except ValueError:
            pass
    for cut in range(0, len(good), 7):
        try:
            decode_bmp(bytes(good[:cut]))
        except ValueError:
            pass
