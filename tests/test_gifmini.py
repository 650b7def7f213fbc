"""gifmini codec: LZW roundtrips (including 12-bit dictionary resets and
KwKwK chains), GifStatsActor features, and the mutation-fuzz contract
(raise-or-valid, mirroring tests/test_pngmini.py — GIF has no CRC, so a
mutated stream may decode to different-but-well-formed output; it must
never escape as a non-ValueError or hang)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from goose_parser_ray.functions.gifmini import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from goose_parser_ray.functions.multimodal import GifStatsActor


def test_roundtrip_random_images():
    rng = np.random.default_rng(0)
    for trial in range(60):
        p = int(rng.integers(2, 257))
        w = int(rng.integers(1, 48))
        h = int(rng.integers(1, 48))
        pal = rng.integers(0, 256, (p, 3)).astype(np.uint8)
        idx = rng.integers(0, p, (h, w)).astype(np.uint8)
        w2, h2, pal2, idx2 = decode_gif(encode_gif(w, h, pal, idx))
        assert (w2, h2) == (w, h)
        assert np.array_equal(pal2[:p], pal)
        assert np.array_equal(idx2, idx)


def test_lzw_long_streams_force_dictionary_resets():
    """300k random symbols assign ~75k dictionary entries — many times the
    12-bit cap — so the mid-stream CLEAR/reset path is exercised, at every
    min-code-size band."""
    rng = np.random.default_rng(1)
    for p in (2, 3, 4, 17, 128, 256):
        mcs = max(2, int(np.ceil(np.log2(p))))
        idx = rng.integers(0, p, 300_000).astype(np.uint8)
        assert np.array_equal(
            lzw_decode(lzw_encode(idx, mcs), mcs, len(idx)), idx
        )


def test_lzw_kwkwk_and_runs():
    """All-equal and long-run inputs hit the KwKwK self-reference case
    (decoder reads a code equal to the entry it is about to add) on nearly
    every step."""
    rng = np.random.default_rng(2)
    for p in (2, 5, 256):
        mcs = max(2, int(np.ceil(np.log2(p))))
        idx = np.zeros(10_000, np.uint8)
        assert np.array_equal(
            lzw_decode(lzw_encode(idx, mcs), mcs, len(idx)), idx
        )
        idx = np.repeat(
            rng.integers(0, p, 500), rng.integers(1, 60, 500)
        ).astype(np.uint8)
        assert np.array_equal(
            lzw_decode(lzw_encode(idx, mcs), mcs, len(idx)), idx
        )


def test_decode_rejects_malformed():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    good = encode_gif(3, 2, pal, np.array([[0, 1, 0], [1, 0, 1]], np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"")
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + good[7:])
    with pytest.raises(ValueError):
        decode_gif(good[:-2])  # trailer gone -> truncated sub-blocks
    with pytest.raises(ValueError):
        encode_gif(2, 2, pal, np.array([[0, 1], [2, 0]], np.uint8))  # idx>=P
    with pytest.raises(ValueError):
        encode_gif(3, 2, pal, np.zeros((2, 2), np.uint8))  # count mismatch


def test_gif_stats_actor_features():
    pal = np.array([[10, 20, 30], [1, 1, 1], [0, 0, 200], [5, 5, 5]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)  # color 3 unused
    payload = encode_gif(3, 2, pal, idx)
    out = GifStatsActor()(
        pa.Table.from_pydict(
            {"doc_id": [7], "payload": pa.array([payload], pa.binary())}
        )
    )
    assert out["width"].to_pylist() == [3]
    assert out["height"].to_pylist() == [2]
    assert out["palette_size"].to_pylist() == [4]
    assert out["colors_used"].to_pylist() == [3]
    want = 2 * (10 + 20 + 30) + 2 * 3 + 2 * 200
    assert out["rgb_sum"].to_pylist() == [want]


def test_mutation_fuzz_never_crashes_uncontrolled():
    """Any single-byte mutation either decodes to SOME well-formed raster
    (GIF has no checksum, so silent value changes are allowed) or raises
    ValueError — never another exception type, never a hang. Truncations
    at every prefix length are equally controlled."""
    rng = np.random.default_rng(42)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (11, 9)).astype(np.uint8)
    good = bytearray(encode_gif(9, 11, pal, idx))
    for trial in range(400):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            w, h, p2, i2 = decode_gif(bytes(b))
            assert i2.shape == (h, w)
            assert int(i2.max(initial=0)) < len(p2)
        except ValueError:
            pass
    for cut in range(0, len(good), 3):
        try:
            decode_gif(bytes(good[:cut]))
        except ValueError:
            pass

def test_animated_roundtrip_random():
    from goose_parser_ray.functions.gifmini import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.default_rng(3)
    for trial in range(30):
        p = int(rng.integers(2, 257))
        w = int(rng.integers(1, 32))
        h = int(rng.integers(1, 32))
        n = int(rng.integers(1, 8))
        pal = rng.integers(0, 256, (p, 3)).astype(np.uint8)
        frames = [
            rng.integers(0, p, (h, w)).astype(np.uint8) for _ in range(n)
        ]
        delays = [int(rng.integers(0, 500)) for _ in range(n)]
        w2, h2, pal2, fr2, dl2 = decode_gif_frames(
            encode_gif_animated(w, h, pal, frames, delays)
        )
        assert (w2, h2) == (w, h)
        assert np.array_equal(pal2[:p], pal)
        assert dl2 == delays
        assert len(fr2) == n
        for a, b in zip(frames, fr2):
            assert np.array_equal(a, b)


def test_animated_decoder_reads_single_frame_gif():
    """decode_gif_frames is a superset parser: a plain single-frame GIF
    (no extensions at all) parses as a one-frame animation with delay 0."""
    from goose_parser_ray.functions.gifmini import decode_gif_frames

    pal = np.array([[10, 20, 30], [1, 1, 1]], np.uint8)
    idx = np.array([[0, 1, 0], [1, 0, 1]], np.uint8)
    w, h, p2, frames, delays = decode_gif_frames(encode_gif(3, 2, pal, idx))
    assert (w, h) == (3, 2)
    assert len(frames) == 1 and delays == [0]
    assert np.array_equal(frames[0], idx)


def test_animated_rejects_malformed():
    from goose_parser_ray.functions.gifmini import (
        decode_gif_frames,
        encode_gif_animated,
    )

    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    f = [np.zeros((2, 3), np.uint8), np.ones((2, 3), np.uint8)]
    good = encode_gif_animated(3, 2, pal, f, [5, 7])
    with pytest.raises(ValueError):
        decode_gif_frames(good[:-1])  # trailer gone
    with pytest.raises(ValueError):
        encode_gif_animated(3, 2, pal, [], [])  # no frames
    with pytest.raises(ValueError):
        encode_gif_animated(3, 2, pal, f, [5])  # delay/frame mismatch
    with pytest.raises(ValueError):
        encode_gif_animated(3, 2, pal, [np.full((2, 3), 2, np.uint8)], [5])


def test_animated_mutation_fuzz_controlled():
    """Same raise-or-valid contract as the single-frame fuzz, over the
    animation structure (GCE blocks, NETSCAPE extension, per-frame
    sub-block chains)."""
    from goose_parser_ray.functions.gifmini import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.default_rng(44)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    frames = [
        rng.integers(0, 16, (7, 9)).astype(np.uint8) for _ in range(3)
    ]
    good = bytearray(encode_gif_animated(9, 7, pal, frames, [4, 8, 12]))
    for trial in range(400):
        b = bytearray(good)
        pos = int(rng.integers(0, len(b)))
        b[pos] ^= int(rng.integers(1, 256))
        try:
            w, h, p2, fr2, dl2 = decode_gif_frames(bytes(b))
            assert len(fr2) == len(dl2) >= 1
            for f2 in fr2:
                assert f2.shape == (h, w)
                assert int(f2.max(initial=0)) < len(p2)
        except ValueError:
            pass
    for cut in range(0, len(good), 3):
        try:
            decode_gif_frames(bytes(good[:cut]))
        except ValueError:
            pass


def test_video_frame_sample_actor():
    """Stride-2 sampling keeps frames 0 and 2 of a 4-frame clip; each kept
    row carries the frame's GCE delay and exact palette-mapped sums."""
    from goose_parser_ray.functions.gifmini import encode_gif_animated
    from goose_parser_ray.functions.multimodal import VideoFrameSampleActor

    pal = np.array([[10, 20, 30], [1, 1, 1], [0, 0, 200], [5, 5, 5]], np.uint8)
    frames = [
        np.array([[0, 1, 2], [2, 1, 0]], np.uint8),
        np.zeros((2, 3), np.uint8),
        np.full((2, 3), 3, np.uint8),
        np.ones((2, 3), np.uint8),
    ]
    payload = encode_gif_animated(3, 2, pal, frames, [11, 22, 33, 44])
    out = VideoFrameSampleActor(stride=2)(
        pa.Table.from_pydict(
            {"doc_id": [9], "payload": pa.array([payload], pa.binary())}
        )
    )
    assert out["doc_id"].to_pylist() == [9, 9]
    assert out["frame_no"].to_pylist() == [0, 2]
    assert out["delay_cs"].to_pylist() == [11, 33]
    assert out["colors_used"].to_pylist() == [3, 1]
    want0 = 2 * (10 + 20 + 30) + 2 * 3 + 2 * 200
    want2 = 6 * (5 + 5 + 5)
    assert out["rgb_sum"].to_pylist() == [want0, want2]
