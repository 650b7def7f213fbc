"""Randomized multi-seed parity between the driver tiers and the
distributed join tiers of the iterative graph operators — the fixed-seed
structural tests live in test_functions/test_ops_r3c; this sweep guards
the tier split itself (same graph in, identical table out)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from goose_parser_ray.functions.graph import (
    bfs_levels_distributed,
    kcore_distributed,
    sssp_bounded,
    triangle_count,
)


def _rand_edges(seed: int, n_nodes: int = 25, n_edges: int = 80):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    v = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    keep = u != v
    return u[keep], v[keep]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_kcore_tier_parity(ray_session, seed):
    u, v = _rand_edges(seed)
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    canon = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
    und = pd.DataFrame(
        {
            "u": np.concatenate([canon["u"], canon["v"]]),
            "v": np.concatenate([canon["v"], canon["u"]]),
        }
    )
    for k in (2, 3):
        outs = []
        for thr in (5_000_000, 0):
            got = (
                kcore_distributed(
                    ray.data.from_pandas(und), k=k,
                    num_partitions=2, driver_edges_threshold=thr,
                )
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )
            outs.append(got)
        pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.parametrize("seed", [5, 31])
def test_bfs_sssp_tier_parity(ray_session, seed):
    u, v = _rand_edges(seed)
    rng = np.random.RandomState(seed + 1)
    w = rng.randint(1, 9, len(u)).astype(np.int64)
    edges = ray.data.from_pandas(pd.DataFrame({"u": u, "v": v, "w": w}))
    seeds = ray.data.from_pandas(
        pd.DataFrame({"node": np.unique(u)[:2].astype(np.int64)})
    )
    bfs = [
        bfs_levels_distributed(
            edges, seeds, max_hops=4, driver_edges_threshold=thr
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        for thr in (5_000_000, 0)
    ]
    pd.testing.assert_frame_equal(bfs[0], bfs[1])
    ss = [
        sssp_bounded(edges, seeds, rounds=3, driver_edges_threshold=thr)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        for thr in (5_000_000, 0)
    ]
    pd.testing.assert_frame_equal(ss[0], ss[1])


@pytest.mark.parametrize("seed", [3, 17])
def test_triangle_tier_parity(ray_session, seed):
    u, v = _rand_edges(seed)
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    canon = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
    ds = ray.data.from_pandas(canon.reset_index(drop=True))
    a = triangle_count(ds, num_partitions=2)
    b = triangle_count(ds, num_partitions=2, driver_edges_threshold=0)
    assert a == b


@pytest.mark.parametrize("seed", [7, 29])
def test_personalized_pagerank_tier_parity(ray_session, seed):
    from goose_parser_ray.functions.graph import pagerank_distributed

    u, v = _rand_edges(seed)
    edges = ray.data.from_pandas(pd.DataFrame({"src": u, "dst": v}))
    seeds = ray.data.from_pandas(
        pd.DataFrame({"node": np.unique(u)[::3].astype(np.int64)})
    )
    outs = []
    for thr in (5_000_000, 0):
        got = (
            pagerank_distributed(
                edges, max_iters=3, tol=0.0, num_partitions=2,
                teleport_seeds=seeds, driver_edges_threshold=thr,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0]["node"].tolist() == outs[1]["node"].tolist()
    assert np.allclose(outs[0]["rank"], outs[1]["rank"], atol=1e-12)
    # mass conservation and seed concentration
    assert abs(outs[0]["rank"].sum() - 1.0) < 1e-9
    seed_set = set(np.unique(u)[::3].tolist())
    in_seed = outs[0][outs[0]["node"].isin(seed_set)]["rank"].sum()
    assert in_seed > 0.3  # teleport keeps mass near the seeds


@pytest.mark.parametrize("seed", [13])
def test_random_walks_tier_parity(ray_session, seed):
    from goose_parser_ray.functions.graph import random_walks

    u, v = _rand_edges(seed, n_nodes=20, n_edges=60)
    canon = pd.DataFrame(
        {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
    ).drop_duplicates()
    edges = ray.data.from_pandas(canon.reset_index(drop=True))
    seeds = ray.data.from_pandas(
        pd.DataFrame({"node": np.unique(u)[:5].astype(np.int64)})
    )
    outs = []
    for thr in (5_000_000, 0):
        got = (
            random_walks(edges, seeds, steps=3, driver_edges_threshold=thr)
            .to_pandas()
            .sort_values(["walk_id", "step"])
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # every walk starts at its seed and each hop follows a real edge
    w = outs[0]
    eset = set(map(tuple, canon.values))
    for wid, g in w.groupby("walk_id"):
        g = g.sort_values("step")
        nodes = g["node"].tolist()
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in eset


@pytest.mark.parametrize("seed", [5, 19])
def test_resolve_redirects_tier_parity(ray_session, seed):
    """Functional-graph pointer doubling: driver tier and join tier agree
    row-for-row on a random single-out-edge graph with chains, terminals
    and cycles; resolved hop counts equal the true chase distance."""
    import pyarrow as pa

    from goose_parser_ray.functions.graph import resolve_redirects

    rng = np.random.RandomState(seed)
    n = 60
    u = np.arange(n, dtype=np.int64)
    # each node points at a random node (possibly forming cycles);
    # ~1/4 of nodes are terminals
    nxt = rng.randint(0, n, n).astype(np.int64)
    terminal = rng.rand(n) < 0.25
    state = pa.Table.from_pydict(
        {
            "u": u,
            "cur": np.where(terminal, u, nxt),
            "hops": np.where(terminal, 0, 1).astype(np.int64),
            "done": terminal,
        }
    )
    outs = []
    for thr in (5_000_000, 0):
        got = (
            resolve_redirects(ray.data.from_arrow(state), n,
                              driver_nodes_threshold=thr)
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # reference chase with the same 16-hop cap
    got = outs[0]
    for i in range(n):
        cur, hops = i, 0
        for _ in range(16):
            if terminal[cur]:
                break
            cur = int(nxt[cur])
            hops += 1
        row = got[got["u"] == i].iloc[0]
        if terminal[cur]:
            assert bool(row["done"]) and row["cur"] == cur
            assert row["hops"] == hops
        else:
            assert not bool(row["done"])


def test_resolve_redirects_dangling_target_raises(ray_session):
    import pyarrow as pa

    from goose_parser_ray.functions.graph import resolve_redirects

    state = pa.Table.from_pydict(
        {
            "u": np.array([0, 1], np.int64),
            "cur": np.array([1, 99], np.int64),  # 99 not a node
            "hops": np.array([1, 1], np.int64),
            "done": np.array([False, False]),
        }
    )
    with pytest.raises(ValueError):
        resolve_redirects(ray.data.from_arrow(state), 2)


def test_resolve_redirects_dangling_raises_join_tier(ray_session):
    """r5: the join tier must reject dangling targets like the driver
    tier does (LEFT join + null check), not silently drop the rows."""
    import pyarrow as pa

    from goose_parser_ray.functions.graph import resolve_redirects

    state = pa.Table.from_pydict(
        {
            "u": np.array([0, 1], np.int64),
            "cur": np.array([1, 99], np.int64),  # 99 not a node
            "hops": np.array([1, 1], np.int64),
            "done": np.array([False, False]),
        }
    )
    with pytest.raises(ValueError):
        resolve_redirects(
            ray.data.from_arrow(state), 2, driver_nodes_threshold=0
        ).materialize()


def test_resolve_redirects_join_tier_column_order(ray_session):
    """r5: as_right selects by NAME — a state table whose columns arrive
    in a different order must still resolve correctly."""
    import pyarrow as pa

    from goose_parser_ray.functions.graph import resolve_redirects

    # chain 0 -> 1 -> 2(terminal), columns deliberately shuffled
    state = pa.Table.from_pydict(
        {
            "done": np.array([False, False, True]),
            "hops": np.array([1, 1, 0], np.int64),
            "cur": np.array([1, 2, 2], np.int64),
            "u": np.array([0, 1, 2], np.int64),
        }
    ).select(["done", "hops", "cur", "u"])
    got = (
        resolve_redirects(
            ray.data.from_arrow(state), 3, driver_nodes_threshold=0
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert got["cur"].tolist() == [2, 2, 2]
    assert got["hops"].tolist() == [2, 1, 0]
    assert got["done"].all()


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_longest_path_dag_tier_parity(ray_session, seed):
    """r5: DAG longest-path levels — driver relaxation and the join +
    grouped-max tier agree on a random layered DAG with skip edges."""
    import pyarrow as pa

    from goose_parser_ray.functions.graph import longest_path_dag

    rng = np.random.RandomState(seed)
    # layered DAG: 6 layers x 8 nodes; edges go 1 or 2 layers forward
    edges = []
    for layer in range(5):
        for i in range(8):
            u = layer * 8 + i
            for _ in range(2):
                fwd = 1 if rng.rand() < 0.7 else 2
                if layer + fwd <= 5:
                    v = (layer + fwd) * 8 + rng.randint(8)
                    edges.append((u, v))
    t = pa.Table.from_pydict(
        {
            "u": np.array([e[0] for e in edges], np.int64),
            "v": np.array([e[1] for e in edges], np.int64),
        }
    )
    outs = []
    for thr in (5_000_000, 0):
        got = (
            longest_path_dag(
                ray.data.from_arrow(t), driver_edges_threshold=thr
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # brute-force reference: relax to fixpoint
    import collections

    lvl = collections.defaultdict(int)
    for _ in range(12):
        for u, v in edges:
            lvl[v] = max(lvl[v], lvl[u] + 1)
    ref = {n: lvl[n] for n in set(x for e in edges for x in e)}
    got = dict(zip(outs[0]["node"], outs[0]["lvl"]))
    assert got == ref


def test_longest_path_dag_cycle_raises(ray_session):
    import pyarrow as pa

    from goose_parser_ray.functions.graph import longest_path_dag

    t = pa.Table.from_pydict(
        {"u": np.array([0, 1, 2], np.int64),
         "v": np.array([1, 2, 0], np.int64)}
    )
    with pytest.raises(ValueError):
        longest_path_dag(ray.data.from_arrow(t), max_rounds=8)
