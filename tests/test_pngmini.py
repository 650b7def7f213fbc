"""PNG codec (functions/pngmini.py) — roundtrip across shapes and filter
modes, malformed-input loudness, and the FFT spectrum features' exactness
margins. Full pipeline parity is covered by the media_png/audio_spectrum
oracle rows."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from goose_parser_ray.functions.pngmini import decode_png, encode_png


@pytest.mark.parametrize("shape", [(16, 16), (17, 23, 3), (5, 9, 4), (1, 1), (2, 3, 3), (40, 1), (1, 40, 4)])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_roundtrip(shape, mode):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img, mode))
    assert out.shape == img.shape
    assert (out == img).all()


def test_roundtrip_adversarial_gradients():
    # extreme values stress the mod-256 wraparound in Sub/Average/Paeth
    for img in (
        np.zeros((7, 7, 3), np.uint8),
        np.full((7, 7), 255, np.uint8),
        (np.add.outer(np.arange(9) * 131, np.arange(11) * 97) % 256).astype(np.uint8),
    ):
        assert (decode_png(encode_png(img, "cycle")) == img).all()


def test_crc_corruption_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = bytearray(encode_png(img))
    b[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))


def test_truncation_and_bad_signature_raise():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(good[:-8])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)


def test_multi_idat_stream():
    # a spec-valid stream may split the DEFLATE body across IDAT chunks
    img = np.arange(120, dtype=np.uint8).reshape(10, 4, 3)
    raw = encode_png(img, "cycle")
    sig, pos = raw[:8], 8
    chunks = []
    while pos < len(raw):
        (ln,) = struct.unpack_from(">I", raw, pos)
        chunks.append((raw[pos + 4 : pos + 8], raw[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = sig
    for tag, body in chunks:
        if tag == b"IDAT":
            mid = len(body) // 2
            for part in (body[:mid], body[mid:]):
                out += (
                    struct.pack(">I", len(part)) + b"IDAT" + part
                    + struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
                )
        else:
            out += (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )
    assert (decode_png(out) == img).all()


def test_unsupported_depth_raises():
    img = np.zeros((4, 4), np.uint8)
    b = bytearray(encode_png(img))
    # IHDR body starts at offset 16; depth byte is at 16+8
    b[24] = 16
    body = bytes(b[16:29])
    b[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body[:13]) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(b))


def test_spectrum_margins():
    """Square wave with period dividing n: fundamental bin wins argmax and
    leakage bins stay far below the 10×-amplitude active threshold."""
    from goose_parser_ray.functions.multimodal import SpectrumActor
    from goose_parser_ray.functions.wav import encode_wav_pcm16

    rows = []
    for n, half, amp in [(800, 2, 1990), (1600, 16, 1000), (960, 8, 1230)]:
        idx = np.arange(n)
        x = np.where((idx // half) % 2 == 0, amp, -amp).astype(np.int16)
        rows.append(encode_wav_pcm16(x, sample_rate=16_000))
        mag = np.abs(np.fft.rfft(x.astype(np.float64)))
        active = mag[1:] > 10.0 * amp
        assert int(np.argmax(mag[1:])) + 1 == n // (2 * half)
        assert int(active.sum()) == (half + 1) // 2
        # margin: every true harmonic is >5x the threshold, leakage <1e-6 of it
        assert mag[1:][active].min() > 50.0 * amp
        assert mag[1:][~active].max() < 1e-3 * amp

    t = pa.Table.from_pydict({"doc_id": [0, 1, 2], "payload": pa.array(rows, pa.binary())})
    out = SpectrumActor()(t)
    assert out["dom_bin"].to_pylist() == [200, 50, 60]
    assert out["dom_freq_hz"].to_pylist() == [4000, 500, 1000]
    assert out["n_active_bins"].to_pylist() == [1, 8, 4]


def test_mutation_fuzz_never_crashes_uncontrolled():
    """Any single-byte mutation of a valid PNG either still decodes to the
    right shape (mutation in slack space), or raises ValueError — never
    another exception type, never a hang. (CRC catches most; the rest must
    be caught by the structural guards, including zlib.error wrapping.)"""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    good = bytearray(encode_png(img, "cycle"))
    for trial in range(300):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_png(bytes(b))
            assert out.dtype == np.uint8
        except ValueError:
            pass
    # truncations at every prefix length are equally controlled
    for cut in range(0, len(good), 7):
        try:
            decode_png(bytes(good[:cut]))
        except ValueError:
            pass
