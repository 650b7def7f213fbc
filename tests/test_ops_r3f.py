"""char_entropy, mann_whitney, attribution, adamic_adar and twap edge
semantics (full DuckDB parity is covered by the oracle sweep)."""

import math

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


def _write_documents(tmp_path, texts, doc_ids=None):
    n = len(texts)
    ids = np.asarray(
        doc_ids if doc_ids is not None else np.arange(n), np.int64
    )
    t = pa.Table.from_pydict(
        {
            "doc_id": ids,
            "text": list(texts),
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.asarray([len(x) for x in texts], np.int64),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")


def test_char_entropy_known_values(ray_session, tmp_path):
    from goose_parser_ray.queries import q_char_entropy

    # "abab" -> uniform over 2 chars -> ln 2; "aaaa" -> 0; "" -> omitted
    _write_documents(tmp_path, ["abab", "aaaa", "", "aéé"])
    out = (
        q_char_entropy(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    assert list(out.index) == [0, 1, 3]  # empty doc 2 emits no row
    # per-(doc,char) e6 rounding THEN integer sum — matches the oracle
    assert out.loc[0, "ent_e6"] == 2 * round(-0.5 * math.log(0.5) * 1e6)
    assert out.loc[1, "ent_e6"] == 0
    # "aéé": p=1/3 and 2/3 — non-ASCII decodes as ONE character each
    exp = round(-(1 / 3) * math.log(1 / 3) * 1e6) + round(
        -(2 / 3) * math.log(2 / 3) * 1e6
    )
    assert abs(out.loc[3, "ent_e6"] - exp) <= 1


def test_mann_whitney_ranks_with_ties(ray_session, tmp_path):
    from goose_parser_ray.queries import q_mann_whitney

    # click cents: 100, 200; view cents: 200, 300
    # sorted: 100(r1), 200,200 (avg r 2.5 -> 2x=5), 300 (r4)
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 4,
        values=[1.0, 2.0, 2.0, 3.0],
        event_types=["click", "click", "view", "view"],
    )
    out = q_mann_whitney(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["click", "n_obs"] == 2 and out.loc["view", "n_obs"] == 2
    assert out.loc["click", "rank2_sum"] == 2 * 1 + 5  # 2*(1 + 2.5)
    assert out.loc["view", "rank2_sum"] == 5 + 2 * 4
    # 2U = 2R - n(n+1): click U = 0.5, view U = 3.5
    assert out.loc["click", "u2x"] == 1
    assert out.loc["view", "u2x"] == 7


def test_attribution_carries_click_across_purchases(ray_session, tmp_path):
    from goose_parser_ray.queries import q_attribution

    # click, purchase, purchase: BOTH purchases attribute to the click
    _write_events(
        tmp_path,
        ts=["2024-01-01 00:00", "2024-01-02 00:00", "2024-01-03 00:00"],
        event_types=["click", "purchase", "purchase"],
    )
    out = q_attribution(str(tmp_path)).to_pandas().sort_values("event_id")
    assert list(out["event_id"]) == [1, 2]
    assert set(out["click_ts"]) == {"2024-01-01 00:00:00"}


def test_attribution_window_and_order(ray_session, tmp_path):
    from goose_parser_ray.queries import q_attribution

    # u1: click 8 days before purchase -> outside the 7-day window
    # u2: click AFTER the purchase -> no attribution
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01 00:00:00",
            "2024-01-09 00:00:01",
            "2024-02-01 00:00:00",
            "2024-02-02 00:00:00",
        ],
        event_types=["click", "purchase", "purchase", "click"],
        user_ids=[1, 1, 2, 2],
    )
    out = q_attribution(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_adamic_adar_weights(ray_session, tmp_path):
    from goose_parser_ray.queries import q_adamic_adar

    # doc_ids 10 and 160 both have doc_id%3+1 >= 2 links; (10*7+k)%1000 for
    # k=1,2 -> {71,72}; 160%3+1=2 -> (160*7+k)%1000 -> {1121%1000, 1122%1000}
    # = {121,122}. Use ids 10 and 438: 438%3+1=1 -> (438*7+1)%1000 = 67. No
    # overlap. Instead craft overlap: ids 10 and 1010 share dst since
    # (10*7+k)%1000 == (1010*7+k)%1000 (7070+k ≡ 70+k mod 1000).
    _write_documents(tmp_path, ["x", "y"], doc_ids=[10, 1010])
    out = q_adamic_adar(str(tmp_path)).to_pandas().sort_values(["a", "b"])
    # 10%3+1=2 links {71,72}; 1010%3+1=3 links {71,72,73} -> common {71,72}
    assert list(out["a"]) == [10] and list(out["b"]) == [1010]
    assert list(out["cn"]) == [2]
    w = round(1_000_000 / math.log(2))  # both shared targets have indegree 2
    assert list(out["aa_e6"]) == [2 * w]


def test_twap_gap_weighting_and_epoch_floor(ray_session, tmp_path):
    from goose_parser_ray.queries import q_twap

    # u1: v=1.00 held 10s, v=3.00 held 20s, last obs unweighted
    # u2: single event -> no output row
    # u3: fractional seconds — 0.9s -> 1.1s crosses ONE second boundary
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01 00:00:00",
            "2024-01-01 00:00:10",
            "2024-01-01 00:00:30",
            "2024-01-01 00:00:00",
            "2024-03-01 00:00:00.900000",
            "2024-03-01 00:00:01.100000",
        ],
        values=[1.0, 3.0, 9.0, 5.0, 2.0, 4.0],
        user_ids=[1, 1, 1, 2, 3, 3],
    )
    out = q_twap(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
    assert list(out.index) == [1, 3]
    assert out.loc[1, "dur_s"] == 30
    assert out.loc[1, "twap_num"] == 100 * 10 + 300 * 20
    assert out.loc[3, "dur_s"] == 1  # boundary-crossing, not duration floor
    assert out.loc[3, "twap_num"] == 200
