"""Unit tests for the round-4b quality/statistics kernels: WordPiece greedy
semantics, Benford constants, Flesch fixed-point arithmetic, exact-integer
ACF identity. Distributed value parity runs through the oracle gate
(q:benford_digits / flesch_reading / acf_daily / wordpiece_encode); these
pin the scalar algorithms and edge cases the synthetic corpus can't reach."""

from __future__ import annotations

import math

import numpy as np

from goose_parser_ray.functions.wordpiece import UNK, build_vocab, encode_word


def test_wordpiece_longest_match_first():
    vocab = {"un", "##aff", "##able", "##a", "##f", "##fable", "u", "##n"}
    # greedy takes "un", then the LONGEST continuation "##affable"? absent —
    # it must pick "##aff" (len 3) over "##a", then "##able"
    assert encode_word("unaffable", vocab) == ["un", "##aff", "##able"]


def test_wordpiece_whole_word_and_unk():
    vocab = {"hello", "h", "##e"}
    assert encode_word("hello", vocab) == ["hello"]
    # 'x' has no start piece → whole-word UNK, not a partial emission
    assert encode_word("xe", vocab) == [UNK]
    # continuation missing mid-word → UNK too
    assert encode_word("hx", vocab) == [UNK]


def test_wordpiece_continuation_prefix_respected():
    # "a" exists only as a START piece; "##a" absent → "aa" cannot finish
    vocab = {"a"}
    assert encode_word("aa", vocab) == [UNK]
    assert encode_word("a", vocab) == ["a"]


def test_wordpiece_bigram_coverage_closed_form():
    """With every char/bigram of a word in vocab (the corpus-derived floor
    used by q_wordpiece_encode), greedy segments to ceil(len/2) pieces."""
    for word in ("a", "ab", "abc", "abcd", "abcdefg"):
        chars = set(word)
        bigrams = {word[i : i + 2] for i in range(len(word) - 1)}
        vocab = build_vocab([], chars, bigrams)
        pieces = encode_word(word, vocab)
        assert pieces != [UNK]
        assert len(pieces) == (len(word) + 1) // 2
        # pieces reassemble the word exactly (## stripped after the first)
        assert pieces[0] + "".join(p[2:] for p in pieces[1:]) == word


def test_benford_constants_mirror_duckdb():
    import duckdb

    ours = [math.floor(1_000_000 * math.log10(1 + 1.0 / d)) for d in range(1, 10)]
    theirs = [
        duckdb.sql(
            f"SELECT CAST(FLOOR(1000000*log10(1 + 1.0/{d})) AS BIGINT)"
        ).fetchone()[0]
        for d in range(1, 10)
    ]
    assert ours == theirs
    assert abs(sum(ours) - 1_000_000) <= 9  # shares sum to ~1


def test_flesch_fixed_point_hand_example():
    # 10 words, 2 sentences, 14 syllables:
    # 206.835 − 1.015·5 − 84.6·1.4 = 83.32 → e4 floor arithmetic
    words, sents, syll = 10, 2, 14
    e4 = 2_068_350 - (10_150 * words) // sents - (846_000 * syll) // words
    assert e4 == 2_068_350 - 50_750 - 1_184_400
    assert abs(e4 / 10_000 - 83.32) < 1e-9


def test_acf_integer_identity_matches_numpy_float():
    """num/den exact-integer ACF equals the float estimator to 1e-12."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, size=60).astype(np.int64)
    n = np.int64(len(x))
    s = np.int64(x.sum())
    cx = n * x - s
    den = float((cx * cx).sum())
    xf = x.astype(float)
    dev = xf - xf.mean()
    for k in (1, 2, 7):
        num = float((cx[:-k] * cx[k:]).sum())
        ref = float((dev[:-k] * dev[k:]).sum() / (dev * dev).sum())
        assert abs(num / den - ref) < 1e-12


def test_zlib_gate_determinism_and_bounds():
    import zlib

    s = ("the quick brown fox " * 40).encode()
    a, b = zlib.compress(s, 6), zlib.compress(s, 6)
    assert a == b  # fixed level → byte-identical across calls
    ratio_e4 = len(a) * 10_000 // len(s)
    assert ratio_e4 < 2_000  # heavy repetition trips the low gate
    noise = bytes(((i * 2654435761) >> 7) & 0xFF for i in range(800))
    assert len(zlib.compress(noise, 6)) * 10_000 // len(noise) > 9_000


def test_geohash_interleave_matches_interval_halving():
    """The bit-interleave construction (q_geohash_encode) must equal the
    textbook interval-halving geohash for the same 30-bit precision."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

    def reference(lat: float, lon: float, bits: int = 30) -> str:
        lat_lo, lat_hi = -90.0, 90.0
        lon_lo, lon_hi = -180.0, 180.0
        out = 0
        for b in range(bits):
            if b % 2 == 0:  # even bit (from MSB): longitude
                mid = (lon_lo + lon_hi) / 2
                bit = 1 if lon >= mid else 0
                lon_lo, lon_hi = (mid, lon_hi) if bit else (lon_lo, mid)
            else:
                mid = (lat_lo + lat_hi) / 2
                bit = 1 if lat >= mid else 0
                lat_lo, lat_hi = (mid, lat_hi) if bit else (lat_lo, mid)
            out = (out << 1) | bit
        return "".join(
            alphabet[(out >> (bits - 5 * (k + 1))) & 31] for k in range(bits // 5)
        )

    def interleave(lat_u: int, lon_u: int) -> str:
        # the query's integer path: hundredth-degree units, 15-bit axes
        lat_q = lat_u * 32768 // 18000
        lon_q = lon_u * 32768 // 36000
        z = 0
        for i in range(15):
            z |= ((lon_q >> i) & 1) << (2 * i + 1)
            z |= ((lat_q >> i) & 1) << (2 * i)
        return "".join(alphabet[(z >> (25 - 5 * k)) & 31] for k in range(6))

    for doc_id in (0, 1, 7, 123, 4999, 73561):
        lat_u = (doc_id * 7919) % 18000
        lon_u = (doc_id * 104729) % 36000
        got = interleave(lat_u, lon_u)
        want = reference(lat_u / 100.0 - 90.0, lon_u / 100.0 - 180.0)
        assert got == want, (doc_id, got, want)
    # sanity against the canonical example (continuous coords, same algo)
    assert reference(57.64911, 10.40744).startswith("u4pruy")
