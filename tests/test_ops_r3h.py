"""funnel / retention / markov_transitions / mad_outliers edge semantics
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


def test_funnel_stages(ray_session, tmp_path):
    from goose_parser_ray.queries import q_funnel_steps

    # u1: signup -> click(+1h) -> purchase(+2h)           => stage 3
    # u2: signup -> click(+1h) -> purchase 80h after click => stage 2
    # u3: signup only                                      => stage 1
    # u4: click+purchase, never signed up                  => absent
    # u5: click BEFORE signup only                         => stage 1
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 03:00:00",
            "2024-02-01 00:00:00", "2024-02-01 01:00:00", "2024-02-04 10:00:00",
            "2024-03-01 00:00:00",
            "2024-04-01 00:00:00", "2024-04-01 01:00:00",
            "2024-05-01 00:00:00", "2024-05-01 01:00:00",
        ],
        user_ids=[1, 1, 1, 2, 2, 2, 3, 4, 4, 5, 5],
        event_types=[
            "signup", "click", "purchase",
            "signup", "click", "purchase",
            "signup",
            "click", "purchase",
            "click", "signup",
        ],
    )
    out = q_funnel_steps(str(tmp_path)).to_pandas().set_index("user_id")["stage"]
    assert out.to_dict() == {1: 3, 2: 2, 3: 1, 5: 1}


def test_funnel_window_boundary_inclusive(ray_session, tmp_path):
    from goose_parser_ray.queries import q_funnel_steps

    # click exactly 72h after signup is IN (<=); purchase 72h+1us is OUT
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01 00:00:00",
            "2024-01-04 00:00:00",
            "2024-01-07 00:00:00.000001",
        ],
        user_ids=[1, 1, 1],
        event_types=["signup", "click", "purchase"],
    )
    out = q_funnel_steps(str(tmp_path)).to_pandas()
    assert out["stage"].tolist() == [2]


def test_retention_matrix(ray_session, tmp_path):
    from goose_parser_ray.queries import q_retention

    # u1 first day D, active again D+8 (week 1) and D+8 again (dedup)
    # u2 first day D, never returns
    # u3 first day D+8 (its own cohort)
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01", "2024-01-09 05:00:00", "2024-01-09 06:00:00",
            "2024-01-01 12:00:00",
            "2024-01-09",
        ],
        user_ids=[1, 1, 1, 2, 3],
    )
    out = (
        q_retention(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_day", "offset_week"])
        .reset_index(drop=True)
    )
    d0 = (pd.Timestamp("2024-01-01") - pd.Timestamp("1970-01-01")).days
    rows = list(map(tuple, out[["cohort_day", "offset_week", "users"]].values))
    assert rows == [(d0, 0, 2), (d0, 1, 1), (d0 + 8, 0, 1)]


def test_markov_transition_counts(ray_session, tmp_path):
    from goose_parser_ray.queries import q_markov_transitions

    # u1: a->b->b ; u2: b->a — no cross-user pair between u1's last and u2
    _write_events(
        tmp_path,
        ts=["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-01", "2024-01-02"],
        user_ids=[1, 1, 1, 2, 2],
        event_types=["view", "click", "click", "click", "view"],
    )
    out = q_markov_transitions(str(tmp_path)).to_pandas()
    got = {
        (r.src_type, r.dst_type): r.n for r in out.itertuples()
    }
    assert got == {("view", "click"): 1, ("click", "click"): 1, ("click", "view"): 1}


def test_mad_outliers_known_values(ray_session, tmp_path):
    from goose_parser_ray.queries import q_mad_outliers

    # click: cents [100,200,300,400,500] -> med 300, av {0,100x2,200x2}
    # rank ceil(5/2)=3 -> mad 100; outliers |v-300|>300: none
    # view: cents [100,100,100,1000] -> med 100 (rank 2 of cum 3), mad 0,
    # outliers |v-100|>0 -> the 1000 row
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 9,
        values=[1.0, 2.0, 3.0, 4.0, 5.0, 1.0, 1.0, 1.0, 10.0],
        event_types=["click"] * 5 + ["view"] * 4,
    )
    out = q_mad_outliers(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["click"].tolist() == [5, 300, 100, 0]
    assert out.loc["view"].tolist() == [4, 100, 0, 1]
