"""survival (Kaplan-Meier table), gini and wilson_ctr edge semantics
(full DuckDB parity is covered by the oracle sweep)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, *, ts, values=None, event_types=None, user_ids=None):
    n = len(ts)
    t = pa.Table.from_pydict(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pa.array(
                pd.to_datetime(list(ts), format="ISO8601"), pa.timestamp("us")
            ),
            "user_id": np.asarray(
                user_ids if user_ids is not None else np.full(n, 1), np.int64
            ),
            "event_type": list(
                event_types if event_types is not None else ["click"] * n
            ),
            "value": np.asarray(
                values if values is not None else np.ones(n), np.float64
            ),
            "props": [""] * n,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")


def test_survival_km_table(ray_session, tmp_path):
    from goose_parser_ray.queries import q_survival

    # max ts = Mar 1. Users 1,2: lifetime 2 days, last event Jan (death).
    # User 3: lifetime 5 days, death. User 4: active at Mar 1 -> censored
    # (lifetime 40 days, no row since d=0 there).
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01", "2024-01-03",          # u1: lt 2, death
            "2024-01-10", "2024-01-12",          # u2: lt 2, death
            "2024-01-05", "2024-01-10",          # u3: lt 5, death
            "2024-01-21", "2024-03-01",          # u4: lt 40, censored
        ],
        user_ids=[1, 1, 2, 2, 3, 3, 4, 4],
    )
    out = q_survival(str(tmp_path)).to_pandas().sort_values("lt")
    assert list(out["lt"]) == [2, 5]
    assert list(out["d"]) == [2, 1]
    # at-risk at lt=2: all 4 users; at lt=5: users with lifetime >= 5 -> 2
    assert list(out["n_risk"]) == [4, 2]


def test_gini_exact_fraction(ray_session, tmp_path):
    from goose_parser_ray.queries import q_gini

    # clicks: cents 100,200,300 -> sorted ranks 1,2,3
    # 2*sum(i*x) = 2*(100+400+900)=2800; (n+1)*sx = 4*600=2400
    # gini_num = 400, gini_den = 3*600 = 1800 -> G = 2/9
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 3,
        values=[1.0, 2.0, 3.0],
        event_types=["click"] * 3,
    )
    out = q_gini(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["click", "n"] == 3
    assert out.loc["click", "gini_num"] == 400
    assert out.loc["click", "gini_den"] == 1800


def test_gini_equal_values_zero(ray_session, tmp_path):
    from goose_parser_ray.queries import q_gini

    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 4,
        values=[2.0] * 4,
        event_types=["view"] * 4,
    )
    out = q_gini(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["view", "gini_num"] == 0  # perfect equality


def test_wilson_ctr_bound(ray_session, tmp_path):
    from goose_parser_ray.queries import q_wilson_ctr

    # day 1: 2 clicks, 2 views -> k=2 n=4
    # inner = floor(sqrt((2*2/4 + 1)*1e12)) = floor(sqrt(2e12))
    # lb = (4*1e6 - 2*inner) // 8
    _write_events(
        tmp_path,
        ts=["2024-01-01 01:00:00"] * 4 + ["2024-01-02 01:00:00"],
        event_types=["click", "click", "view", "view", "error"],
    )
    out = q_wilson_ctr(str(tmp_path)).to_pandas().set_index("day")
    assert list(out.index) == ["2024-01-01"]  # error-only day excluded
    inner = int(np.floor(np.sqrt((2.0 * 2.0 / 4.0 + 1.0) * 1e12)))
    assert out.loc["2024-01-01", "wilson_lb_e6"] == (4 * 1_000_000 - 2 * inner) // 8
    assert out.loc["2024-01-01", "k"] == 2 and out.loc["2024-01-01", "n"] == 4


def test_hits_tiers_agree(ray_session):
    """All three hits_distributed tiers — driver bincount (default for
    small collapsed edge lists), broadcast score vector, and hash join —
    must agree on the same graph (parallel edges included) to float-noise
    tolerance."""
    import ray.data

    from goose_parser_ray.functions.graph import hits_distributed

    rng = np.random.RandomState(7)
    src = rng.randint(0, 30, 200)
    dst = rng.randint(30, 55, 200)  # bipartite-ish, with parallel edges
    edges = ray.data.from_items(
        [{"src": int(u), "dst": int(v)} for u, v in zip(src, dst)]
    )
    driver = (
        hits_distributed(edges, max_iters=2)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    bcast = (
        hits_distributed(edges, max_iters=2, driver_edges_threshold=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    join = (
        hits_distributed(
            edges, max_iters=2,
            driver_edges_threshold=0, broadcast_nodes_threshold=0,
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    for other in (bcast, join):
        assert driver["node"].tolist() == other["node"].tolist()
        assert np.allclose(driver["auth"], other["auth"], atol=1e-12)
        assert np.allclose(driver["hub"], other["hub"], atol=1e-12)
    assert abs(driver["auth"].sum() - 1.0) < 1e-9
