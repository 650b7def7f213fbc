"""Unit tests for the round-4 session-2 operator helpers: hashed bigram
features (DSIR), capped vectorized Levenshtein, FastSS k=2 zero-miss
blocking, simplified Soundex, rendezvous-hash movement guarantee, and the
BMP/robots/CIDR kernels' edge cases not covered by the oracle sweep."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from goose_parser_ray.functions.editdist import lev_capped
from goose_parser_ray.functions.textstats import hashed_bigram_features
from goose_parser_ray.queries.dedup_sim import _soundex_simple


# ---------------------------------------------------------------- DSIR


def test_hashed_bigram_features_spec():
    """Hand-check the stated spec: hash = Σ code·31^(i-1) over the first
    8 chars, bucket %10000, bigram (b1·10007 + b2) % 10000."""
    par, feat = hashed_bigram_features(["ab cd ef"], n_buckets=10_000)
    h = lambda w: sum(ord(c) * 31**i for i, c in enumerate(w[:8])) % 10_000
    exp = [
        (h("ab") * 10007 + h("cd")) % 10_000,
        (h("cd") * 10007 + h("ef")) % 10_000,
    ]
    assert par.tolist() == [0, 0]
    assert feat.tolist() == exp


def test_hashed_bigram_features_doc_boundaries_and_empties():
    # bigrams never cross documents; punctuation-only docs emit nothing
    par, feat = hashed_bigram_features(["one two", "...", None, "x y z"])
    assert (par == 0).sum() == 1  # "one two" -> 1 bigram
    assert (par == 3).sum() == 2  # "x y z" -> 2 bigrams
    assert set(par.tolist()) == {0, 3}


def test_hashed_bigram_prefix_truncation():
    # words equal in their first 8 chars hash identically (spec'd cap)
    p1, f1 = hashed_bigram_features(["abcdefghXXX tail"])
    p2, f2 = hashed_bigram_features(["abcdefghYYY tail"])
    assert f1.tolist() == f2.tolist()


# ------------------------------------------------------- Levenshtein


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_lev_capped_matches_reference_dp():
    rng = np.random.default_rng(11)
    alpha = list("abcd")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 7, 2)
        a = "".join(rng.choice(alpha, la))
        b = "".join(rng.choice(alpha, lb))
        pairs.append((a, b))
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = lev_capped(a, b)
    for (x, y), g in zip(pairs, got.tolist()):
        if abs(len(x) - len(y)) <= 2:
            assert g == _lev_ref(x, y), (x, y)
        else:
            assert g == 99


def test_edit2_blocking_zero_miss(ray_session):
    """FastSS k=2 blocking finds EVERY pair at distance <= 2 on a random
    corpus (compared against brute force), with exact distances."""
    from goose_parser_ray.functions.editdist import edit2_pairs

    rng = np.random.default_rng(5)
    words = list(
        {
            "".join(rng.choice(list("ab"), rng.integers(3, 7)))
            for _ in range(60)
        }
    )
    df = pd.DataFrame({"id": range(len(words)), "s": words})
    got = (
        edit2_pairs(ray.data.from_pandas(df), col="s", id_col="id")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    exp = []
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            d = _lev_ref(words[i], words[j])
            if 1 <= d <= 2:
                exp.append((i, j, d))
    assert list(map(tuple, got[["id_a", "id_b", "dist"]].to_numpy())) == exp


# ------------------------------------------------------------ Soundex


@pytest.mark.parametrize(
    "word,code",
    [
        ("robert", "R163"),
        ("rupert", "R163"),
        ("smith", "S530"),
        ("smyth", "S530"),
        ("tymczak", "T522"),
        ("pfister", "P236"),
        ("honeyman", "H555"),
        ("a", "A000"),
    ],
)
def test_soundex_classic_examples(word, code):
    assert _soundex_simple(word) == code


# -------------------------------------------------------- rendezvous


def test_rendezvous_resize_moves_only_to_new_shard():
    """HRW guarantee: growing 8 -> 9 shards never moves a doc BETWEEN old
    shards — every moved doc lands on shard 8."""
    d = np.arange(50_000, dtype=np.uint64)
    M32 = np.uint64(0xFFFFFFFF)
    scores = np.empty((len(d), 9), np.uint64)
    for s in range(9):
        smix = np.uint64((s * 2654435761) % (1 << 32))
        scores[:, s] = ((d ^ smix) * np.uint64(2654435761)) & M32
    s8 = scores[:, :8].argmax(axis=1)
    s9 = scores.argmax(axis=1)
    moved = s8 != s9
    assert (s9[moved] == 8).all()
    # expected movement ~ 1/9 of docs; allow a generous band
    frac = moved.mean()
    assert 0.07 < frac < 0.15
    # balance: every shard gets a non-trivial share at 9 shards
    counts = np.bincount(s9, minlength=9)
    assert counts.min() > len(d) // 9 * 0.8
