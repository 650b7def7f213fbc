"""csv/jsonl roundtrip, k-anonymity, Benford and EWMA edge semantics
(full DuckDB parity is covered by the oracle sweep)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, values, event_types=None, user_ids=None):
    n = len(values)
    ts = pd.date_range("2024-03-01", periods=n, freq="1h")
    t = pa.Table.from_pydict(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": np.asarray(
                user_ids if user_ids is not None else np.full(n, 1), np.int64
            ),
            "event_type": list(
                event_types if event_types is not None else ["click"] * n
            ),
            "value": np.asarray(values, np.float64),
            "props": [""] * n,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")


def _write_documents(tmp_path, langs, sources):
    n = len(langs)
    t = pa.Table.from_pydict(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc {i}" for i in range(n)],
            "lang": list(langs),
            "source": list(sources),
            "n_chars": np.full(n, 5, np.int64),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")


def test_csv_roundtrip_is_lossless(ray_session, tmp_path):
    from goose_parser_ray.queries import q_csv_roundtrip

    _write_events(tmp_path, values=[0.10, 12.34, 0.005], event_types=["click", "view", "click"])
    out = q_csv_roundtrip(str(tmp_path)).to_pandas().sort_values("event_id")
    assert list(out["v_cents"]) == [10, 1234, 1]  # half-away ROUND at 0.005
    assert list(out["event_type"]) == ["click", "view", "click"]
    assert out["event_id"].dtype == np.int64 and out["v_cents"].dtype == np.int64


def test_jsonl_roundtrip_is_lossless(ray_session, tmp_path):
    from goose_parser_ray.queries import q_jsonl_roundtrip

    _write_events(tmp_path, values=[1.0, 2.5], event_types=["view", "click"])
    out = q_jsonl_roundtrip(str(tmp_path)).to_pandas().sort_values("event_id")
    assert list(out["v_cents"]) == [100, 250]
    assert list(out["event_type"]) == ["view", "click"]


def test_k_anonymize_suppresses_small_groups(ray_session, tmp_path):
    from goose_parser_ray.queries import q_k_anonymize

    # (en, a) appears 5 times -> kept; (fr, b) twice -> suppressed (K=4)
    _write_documents(
        tmp_path,
        langs=["en"] * 5 + ["fr"] * 2,
        sources=["a"] * 5 + ["b"] * 2,
    )
    out = q_k_anonymize(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4]
    assert set(out["lang"]) == {"en"}


def test_k_anonymize_keys_do_not_cross_contaminate(ray_session, tmp_path):
    from goose_parser_ray.queries import q_k_anonymize

    # same lang, different sources: only the big (en, a) group survives
    _write_documents(
        tmp_path,
        langs=["en"] * 7,
        sources=["a"] * 4 + ["b"] * 3,
    )
    out = q_k_anonymize(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3]


def test_benford_counts_and_expectation(ray_session, tmp_path):
    from goose_parser_ray.queries import q_benford, _benford_e6

    t = pa.Table.from_pydict(
        {"o_totalprice": np.asarray([1.00, 1.23, 2.50, 9.99], np.float64)}
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    out = (
        q_benford(str(tmp_path)).to_pandas().set_index("digit").sort_index()
    )
    assert dict(out["n_obs"]) == {1: 2, 2: 1, 9: 1}
    consts = _benford_e6()
    assert out.loc[1, "exp_e6"] == 4 * consts[1]
    assert out.loc[9, "exp_e6"] == 4 * consts[9]


def test_ewma_integer_recurrence_per_user(ray_session, tmp_path):
    from goose_parser_ray.queries import q_ewma_value

    # u1 cents: 10, 20, 7 -> 10, (90+20+5)//10=11, (99+7+5)//10=11
    # u2 cents: 100, 50   -> 100, (900+50+5)//10=95
    _write_events(
        tmp_path,
        values=[0.10, 1.00, 0.20, 0.50, 0.07],
        user_ids=[1, 2, 1, 2, 1],
    )
    out = (
        q_ewma_value(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert list(out[out["user_id"] == 1]["ewma_c"]) == [10, 11, 11]
    assert list(out[out["user_id"] == 2]["ewma_c"]) == [100, 95]
