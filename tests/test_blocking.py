"""Sorted-neighborhood blocking vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import ray.data

from goose_parser_ray.functions.blocking import sorted_neighborhood_pairs


def _brute(keys, ids, window):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = []
    for p, i in enumerate(order):
        for d in range(1, window + 1):
            if p + d < len(order):
                out.append((ids[i], ids[order[p + d]]))
    return sorted(out)


def _run(keys, ids, window, n_blocks=5):
    t = pa.Table.from_pydict(
        {"id": pa.array(ids, pa.int64()), "k": pa.array(keys, pa.string())}
    )
    ds = ray.data.from_arrow(t).repartition(n_blocks)
    got = sorted_neighborhood_pairs(
        ds, key_col="k", id_col="id", window=window
    ).to_pandas()
    if len(got) == 0:
        return []
    return sorted(map(tuple, got[["id_a", "id_b"]].values.tolist()))


def test_matches_bruteforce_with_ties_and_splits(ray_session):
    rng = np.random.default_rng(7)
    # heavy ties: only 9 distinct keys over 200 rows — tie runs straddle
    # any bucket layout the boundary sample picks
    keys = [f"k{rng.integers(0, 9)}" for _ in range(200)]
    ids = list(rng.permutation(200).astype(int))
    for w in (1, 3):
        assert _run(keys, ids, w) == _brute(keys, ids, w)


def test_tiny_and_empty(ray_session):
    assert _run(["a"], [1], 2, n_blocks=1) == []
    assert _run(["a", "b"], [2, 1], 2, n_blocks=2) == [(2, 1)]
