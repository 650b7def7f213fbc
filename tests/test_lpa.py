"""Label-propagation communities: hand-example semantics, driver≡join tier
parity, and determinism of the smallest-label tie-break."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from goose_parser_ray.functions.graph import label_propagation


def _edges(pairs):
    u, v = zip(*pairs)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(u, pa.int64()), "dst": pa.array(v, pa.int64())})
    )


def _run(pairs, rounds=3, threshold=5_000_000):
    out = label_propagation(
        _edges(pairs), rounds=rounds, driver_edges_threshold=threshold
    ).take_all()
    return {r["node"]: r["label"] for r in out}


def _reference_lpa(pairs, rounds):
    """Independent pure-Python synchronous LPA (mode, min-label ties)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(labels[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_two_triangles_bridge_matches_reference():
    """Synchronous LPA with min-label ties on two bridged triangles —
    checked against an independent pure-Python reference (note: the min
    tie-break lets the global smallest label flood across the bridge;
    that IS the deterministic semantics, not a bug)."""
    tri_a = [(0, 1), (1, 2), (2, 0)]
    tri_b = [(10, 11), (11, 12), (12, 10)]
    pairs = tri_a + tri_b + [(2, 10)]
    for rounds in (1, 2, 4):
        assert _run(pairs, rounds=rounds) == _reference_lpa(pairs, rounds)
    labels = _run(pairs, rounds=4)
    assert labels[0] == labels[1] == labels[2] == 0  # tri_a settles on 0


def test_tie_breaks_to_smallest_label():
    # node 2 has neighbors 0 and 1 (one vote each): round 1 must pick 0
    labels = _run([(0, 2), (1, 2)], rounds=1)
    assert labels[2] == 0
    # and node 0 / node 1 each see only node 2's label
    assert labels[0] == 2 and labels[1] == 2


def test_self_loops_and_parallel_edges_ignored():
    # parallel edges collapse to one vote; self-loop contributes nothing
    a = _run([(0, 1), (0, 1), (0, 1), (2, 1), (1, 1)], rounds=1)
    b = _run([(0, 1), (2, 1)], rounds=1)
    assert a == b


@pytest.mark.parametrize("rounds", [1, 3])
def test_driver_and_join_tiers_agree(rounds):
    rng = np.random.default_rng(11)
    pairs = [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, 60, size=300), rng.integers(0, 60, size=300)
        )
        if a != b
    ]
    got_driver = _run(pairs, rounds=rounds)
    got_join = _run(pairs, rounds=rounds, threshold=0)
    assert got_driver == got_join
