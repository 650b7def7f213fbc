"""compaction / schema-evolution / pair_windows / skew_profile edge
semantics (full DuckDB parity is covered by the oracle sweep)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, *, ts, event_types=None, user_ids=None):
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
            "value": np.ones(n, np.float64),
            "props": [""] * n,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")


def test_compact_shards_reduces_files_losslessly(ray_session, tmp_path):
    import ray.data

    from goose_parser_ray.sources.io import compact_shards

    src, dst = tmp_path / "small", tmp_path / "packed"
    src.mkdir()
    for i in range(30):
        pq.write_table(
            pa.table({"a": np.arange(i * 7, (i + 1) * 7, dtype=np.int64)}),
            src / f"part-{i:04d}.parquet",
        )
    stats = compact_shards(str(src), str(dst), target_rows_per_file=70)
    assert stats == {"files_in": 30, "files_out": stats["files_out"], "rows": 210}
    assert stats["files_out"] <= 6
    back = ray.data.read_parquet(str(dst)).to_pandas()["a"].sort_values()
    assert back.tolist() == list(range(210))


def test_read_evolving_widens_and_fills(ray_session, tmp_path):
    from goose_parser_ray.sources.io import read_evolving

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int32()), "lang": ["en", "fr"]}),
        tmp_path / "old.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3], pa.int64()),
                "lang": ["de"],
                "n_chars": pa.array([9], pa.int64()),
            }
        ),
        tmp_path / "new.parquet",
    )
    target = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
    )
    ds = read_evolving(str(tmp_path), target)
    assert ds.schema().base_schema == target
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_chars"].isna().tolist() == [True, True, False]


def test_pair_windows_boundary_and_user_isolation(ray_session, tmp_path):
    from goose_parser_ray.queries import q_pair_windows

    # u1: a->b at exactly +10min (IN), a->c at +10min+1us (OUT)
    # u2 right after u1's window: must not pair across users
    # u1 same-ts pair: event_id order decides (a before d at identical ts)
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01 00:00:00",
            "2024-01-01 00:00:00",
            "2024-01-01 00:10:00",
            "2024-01-01 00:10:00.000001",
            "2024-01-01 00:11:00",
        ],
        user_ids=[1, 1, 1, 1, 2],
        event_types=["a", "d", "b", "c", "e"],
    )
    out = q_pair_windows(str(tmp_path)).to_pandas()
    got = {(r.type_a, r.type_b): r.n for r in out.itertuples()}
    # a->d (same ts, id order), a->b and d->b at exactly +10min (inclusive),
    # b->c (1us apart); a->c and d->c are 1us past the window
    assert got == {("a", "d"): 1, ("a", "b"): 1, ("d", "b"): 1, ("b", "c"): 1}
    assert ("a", "c") not in got and ("d", "c") not in got
    assert ("b", "e") not in got  # no cross-user pairs


def test_skew_profile_power_of_two_buckets(ray_session, tmp_path):
    from goose_parser_ray.queries import q_skew_profile

    # users with 1, 2, 3, 4, 8 events -> buckets 0, 1, 1, 2, 3
    counts = {10: 1, 20: 2, 30: 3, 40: 4, 50: 8}
    uids = [u for u, c in counts.items() for _ in range(c)]
    _write_events(
        tmp_path, ts=["2024-01-01"] * len(uids), user_ids=uids
    )
    out = (
        q_skew_profile(str(tmp_path))
        .to_pandas()
        .sort_values("bucket_log2")
        .reset_index(drop=True)
    )
    assert out["bucket_log2"].tolist() == [0, 1, 2, 3]
    assert out["n_keys"].tolist() == [1, 2, 1, 1]
    assert out["n_events"].tolist() == [1, 5, 4, 8]
    assert out["max_count"].tolist() == [1, 3, 4, 8]


def test_dq_audit_counts_violations(ray_session, tmp_path):
    from goose_parser_ray.queries import q_dq_audit

    n = 6
    t = pa.Table.from_pydict(
        {
            "event_id": pa.array([1, 2, 2, 3, 4, 4], pa.int64()),  # 2 dups
            "ts": pa.array(
                pd.to_datetime(
                    ["2024-01-01"] * 5 + ["2009-12-31"]  # 1 out of range
                ),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, None, 3, 4, 5, 6], pa.int64()),  # 1 null
            "event_type": ["click"] * n,
            "value": pa.array([1.0, -2.0, 0.0, 5.0, 1.0, 1.0]),  # 2 nonpos
            "props": [""] * n,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_dq_audit(str(tmp_path)).to_pandas().set_index("check_name")["n"]
    assert out.to_dict() == {
        "rows_total": 6,
        "null_user_id": 1,
        "nonpositive_value": 2,
        "ts_out_of_range": 1,
        "dup_event_id": 2,
    }


def test_rate_spikes_calendar_window(ray_session, tmp_path):
    from goose_parser_ray.queries import q_rate_spikes

    # day D: 2 events (no trailing window -> never a spike)
    # D+1: 5 events, trail=2 -> 35 > 4 spike
    # D+9: 1 event, trailing 7 days only covers D+2..D+8 (empty) -> no spike
    # D+10: 3 events, trail=1 -> 21 > 2 spike
    ts = (
        ["2024-01-01"] * 2
        + ["2024-01-02"] * 5
        + ["2024-01-10"]
        + ["2024-01-11"] * 3
    )
    _write_events(tmp_path, ts=ts)
    out = (
        q_rate_spikes(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 5, 1, 3]
    assert out["trail_sum"].tolist() == [0, 2, 0, 1]
    assert out["is_spike"].tolist() == [0, 1, 0, 1]


def _write_docs(tmp_path, texts, langs=None, n_chars=None):
    n = len(texts)
    t = pa.Table.from_pydict(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": list(texts),
            "lang": list(langs) if langs else ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.asarray(
                n_chars if n_chars is not None else [len(x) for x in texts],
                np.int64,
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")


def test_dup_cluster_sizes_histogram(ray_session, tmp_path):
    from goose_parser_ray.queries import q_dup_cluster_sizes

    # 3 singletons, one pair, one triple -> {1: 3, 2: 1, 3: 1}
    _write_docs(tmp_path, ["a", "b", "c", "dd", "dd", "eee", "eee", "eee"])
    out = (
        q_dup_cluster_sizes(str(tmp_path))
        .to_pandas()
        .sort_values("cluster_size")
        .reset_index(drop=True)
    )
    assert out["cluster_size"].tolist() == [1, 2, 3]
    assert out["n_clusters"].tolist() == [3, 1, 1]


def test_reject_reasons_cascade_order(ray_session, tmp_path):
    from goose_parser_ray.queries import q_reject_reasons

    # doc 0: short AND bad lang -> too_short wins (cascade order)
    # doc 1: long en -> too_long; doc 2: zh normal -> bad_lang; doc 3 kept
    _write_docs(
        tmp_path,
        ["x", "y", "z", "w"],
        langs=["zh", "en", "zh", "en"],
        n_chars=[50, 500, 200, 200],
    )
    out = q_reject_reasons(str(tmp_path)).to_pandas().set_index("reason")
    assert out["n_docs"].to_dict() == {
        "too_short": 1, "too_long": 1, "bad_lang": 1, "kept": 1
    }
    assert out["first_doc"].to_dict() == {
        "too_short": 0, "too_long": 1, "bad_lang": 2, "kept": 3
    }


def test_arrow_ingest_stream_ipc_fallback(ray_session, tmp_path):
    """The IPC branch must handle both Feather v2 files and raw stream-IPC
    payloads (the except-fallback path) with column pruning."""
    import pyarrow.feather as feather

    from goose_parser_ray.sources.io import read_documents

    t1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "lang": ["en", "fr"]})
    feather.write_feather(t1, tmp_path / "a.feather")
    t2 = pa.table({"doc_id": pa.array([3], pa.int64()), "lang": ["de"]})
    with pa.OSFile(str(tmp_path / "b.arrows"), "wb") as f:
        with pa.ipc.new_stream(f, t2.schema) as w:
            w.write_table(t2)
    out = (
        read_documents(str(tmp_path) + "/", fmt="arrow", columns=["doc_id"])
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out.columns.tolist() == ["doc_id"]


def test_ngram_jaccard_shingle_edges(ray_session, tmp_path):
    from goose_parser_ray.queries import q_ngram_jaccard

    # identical 4-word docs share both 3-shingles -> jac 1.0
    # doc 2 shares words but in different ORDER -> different shingles, no pair
    # doc 3 has <3 words -> no shingles, never pairs
    # doc 4 tests empty-token filtering ("  a   b  c" == "a b c" shingles)
    _write_docs(
        tmp_path,
        ["a b c d", "a b c d", "d c b a", "a b", "  a   b  c ", "a b c"],
    )
    out = q_ngram_jaccard(str(tmp_path)).to_pandas()
    pairs = {(r.id_a, r.id_b): r.jac_e4 for r in out.itertuples()}
    assert pairs == {(0, 1): 10000, (4, 5): 10000}


def test_winsorize_known_values(ray_session, tmp_path):
    from goose_parser_ray.queries import q_winsorize

    # 20 values 1..19 plus outlier 1000 (cents 100..1900, 100000)
    # n=20: p05 rank ceil(1)=1 -> 100; p95 rank ceil(19)=19 -> 1900
    # mean = (sum(100..1900) + 100000)/20 = (19000 + 100000)//20 = 5950
    # winsorized: outlier clipped to 1900 -> (19000+1900)//20 = 1045
    vals = [float(i) for i in range(1, 20)] + [1000.0]
    _write_events(tmp_path, ts=["2024-01-01"] * 20)
    import pyarrow.parquet as _pq

    t = _pq.read_table(tmp_path / "events.parquet")
    t = t.set_column(
        t.column_names.index("value"), "value", pa.array(vals, pa.float64())
    )
    _pq.write_table(t, tmp_path / "events.parquet")
    out = q_winsorize(str(tmp_path)).to_pandas().iloc[0]
    assert out["n"] == 20
    assert out["p05_c"] == 100 and out["p95_c"] == 1900
    assert out["mean_c"] == 5950 and out["wins_mean_c"] == 1045
