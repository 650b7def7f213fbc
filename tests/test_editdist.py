"""Edit-distance-1 join vs brute-force Levenshtein."""

import numpy as np
import pyarrow as pa
import ray.data

from goose_parser_ray.functions.editdist import edit1_pairs, edit1_verify


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit1_verify_cases():
    a = np.array(
        ["abc", "abc", "abc", "abc", "ab", "abc", "", "x", "abcd"],
        dtype=object,
    )
    b = np.array(
        ["abd", "abc", "abcd", "bc", "ba", "xbc", "y", "", "abce"],
        dtype=object,
    )
    got = edit1_verify(a, b).tolist()
    want = [_lev(x, y) == 1 for x, y in zip(a, b)]
    assert got == want


def test_edit1_pairs_match_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    base = ["node%03d" % i for i in range(40)]
    strs = []
    for s in base:
        strs.append(s)
        k = rng.integers(0, len(s))
        strs.append(s[:k] + "X" + s[k + 1 :])  # substitution
        strs.append(s[:k] + s[k + 1 :])  # deletion
    ids = list(range(len(strs)))
    want = sorted(
        (i, j)
        for i in range(len(strs))
        for j in range(i + 1, len(strs))
        if _lev(strs[i], strs[j]) == 1
    )
    t = pa.Table.from_pydict(
        {"id": pa.array(ids, pa.int64()), "s": pa.array(strs, pa.string())}
    )
    got = edit1_pairs(
        ray.data.from_arrow(t).repartition(5), col="s", id_col="id"
    ).to_pandas()
    gp = sorted(
        (min(x, y), max(x, y))
        for x, y in zip(got["id_a"], got["id_b"])
    )
    assert gp == want
