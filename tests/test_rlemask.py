"""Mutation-fuzz for the RLE mask codec (the in-repo codec contract:
raise ValueError or decode the exact mask, never garbage)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from goose_parser_ray.functions.rlemask import decode_rle_mask, encode_rle_mask


def test_roundtrip_random_masks():
    rng = np.random.RandomState(7)
    for _ in range(100):
        h, w = rng.randint(1, 20), rng.randint(1, 50)
        m = rng.rand(h, w) < rng.rand()
        assert np.array_equal(decode_rle_mask(encode_rle_mask(m)), m)


def test_roundtrip_edge_masks():
    for m in [
        np.zeros((3, 5), bool),
        np.ones((3, 5), bool),
        np.eye(4, dtype=bool),
        np.array([[True]]),
        np.array([[False]]),
        np.zeros((0, 5), bool),
    ]:
        assert np.array_equal(decode_rle_mask(encode_rle_mask(m)), m)


def test_leading_foreground_row_gets_zero_run():
    m = np.array([[True, True, False]])
    enc = encode_rle_mask(m)
    buf = np.frombuffer(enc, np.uint16)
    # header (h,w), then row: n_runs, lens... with a 0-length lead run
    assert buf[2] == 3 and buf[3] == 0 and buf[4] == 2 and buf[5] == 1


def test_mutation_fuzz_raise_or_correct():
    rng = random.Random(11)
    base = encode_rle_mask(np.tile(np.arange(16) % 3 == 1, (4, 1)))
    orig = decode_rle_mask(base)
    for _ in range(300):
        b = bytearray(base)
        op = rng.randrange(3)
        if op == 0 and len(b) > 2:
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif op == 1:
            del b[rng.randrange(len(b)) :]
        else:
            b.extend(bytes(rng.randrange(1, 5)))
        try:
            out = decode_rle_mask(bytes(b))
        except ValueError:
            continue
        # accepted -> must be a well-formed mask; if the bytes survived
        # unchanged semantics it must equal the original
        assert out.dtype == bool and out.ndim == 2
        if bytes(b) == bytes(base):
            assert np.array_equal(out, orig)


def test_dimension_limits():
    with pytest.raises(ValueError):
        encode_rle_mask(np.zeros((1, 2), np.uint8)[None])  # 3-D
