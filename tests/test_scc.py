"""Strongly connected components: Tarjan ground truth vs the distributed
Orzan FW-BW coloring tier (graph.scc_distributed), plus worst-case shapes.

Parity model: brute-force boolean-matrix transitive closure defines SCC
membership; scc_tarjan must match it exactly, and the Dataset coloring tier
(driver_edges_threshold=0) must match Tarjan — two genuinely independent
algorithms agreeing on random digraphs is the correctness argument the SQL
twin then re-checks end-to-end at the query surface (queries: scc)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from goose_parser_ray.functions.graph import scc_distributed, scc_tarjan


def brute_scc(un, vn):
    nodes = sorted(set(un) | set(vn))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    reach = np.zeros((n, n), bool)
    for u, v in zip(un, vn):
        reach[idx[u], idx[v]] = True
    np.fill_diagonal(reach, True)
    for k in range(n):
        reach |= np.outer(reach[:, k], reach[k, :])
    mutual = reach & reach.T
    return {
        nodes[i]: min(nodes[j] for j in range(n) if mutual[i, j])
        for i in range(n)
    }


def _rand_digraph(rng):
    n = int(rng.integers(4, 36))
    m = int(rng.integers(4, 110))
    un = rng.integers(0, n, m).astype(np.int64)
    vn = rng.integers(0, n, m).astype(np.int64)
    keep = un != vn
    return un[keep], vn[keep]


def test_tarjan_matches_brute_force():
    rng = np.random.default_rng(11)
    done = 0
    while done < 10:
        un, vn = _rand_digraph(rng)
        if len(un) == 0:
            continue
        assert scc_tarjan(un, vn) == brute_scc(un.tolist(), vn.tolist())
        done += 1


def test_coloring_tier_matches_tarjan(ray_session):
    rng = np.random.default_rng(29)
    done = 0
    while done < 3:
        un, vn = _rand_digraph(rng)
        if len(un) == 0:
            continue
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"u": pa.array(un), "v": pa.array(vn)})
        )
        got = {
            int(r.node): int(r.scc)
            for r in scc_distributed(ds, driver_edges_threshold=0)
            .to_pandas()
            .itertuples()
        }
        assert got == scc_tarjan(un, vn)
        done += 1


def test_coloring_tier_dag_path_all_singletons(ray_session):
    # worst case for FW-BW peeling: a pure path DAG settles one
    # topological layer per peel round
    un = np.arange(0, 6, dtype=np.int64)
    vn = un + 1
    ds = ray.data.from_arrow(
        pa.Table.from_pydict({"u": pa.array(un), "v": pa.array(vn)})
    )
    got = {
        int(r.node): int(r.scc)
        for r in scc_distributed(ds, driver_edges_threshold=0)
        .to_pandas()
        .itertuples()
    }
    assert got == {i: i for i in range(7)}


def test_coloring_tier_two_cycles_bridged(ray_session):
    # 0→1→2→0 and 5→6→5, bridged 2→5: two SCCs, no merge across the bridge
    un = np.array([0, 1, 2, 5, 6, 2], dtype=np.int64)
    vn = np.array([1, 2, 0, 6, 5, 5], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.Table.from_pydict({"u": pa.array(un), "v": pa.array(vn)})
    )
    got = {
        int(r.node): int(r.scc)
        for r in scc_distributed(ds, driver_edges_threshold=0)
        .to_pandas()
        .itertuples()
    }
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_peel_cap_raises_instead_of_partial(ray_session):
    # 25-node path needs 26 peels — more than max_peels=2 allows; the
    # convergence-signal rule says raise, never return partial labels
    un = np.arange(0, 25, dtype=np.int64)
    vn = un + 1
    ds = ray.data.from_arrow(
        pa.Table.from_pydict({"u": pa.array(un), "v": pa.array(vn)})
    )
    with pytest.raises(RuntimeError, match="peel"):
        scc_distributed(ds, driver_edges_threshold=0, max_peels=2)
