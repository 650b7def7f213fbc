"""ks_test / autocorr / orc_roundtrip / url_canonical edge semantics
(full DuckDB parity is covered by the oracle sweep)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, values, event_types, user_ids=None):
    n = len(values)
    ts = pd.date_range("2024-03-01", periods=n, freq="1h")
    t = pa.Table.from_pydict(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": np.asarray(
                user_ids if user_ids is not None else np.full(n, 1), np.int64
            ),
            "event_type": list(event_types),
            "value": np.asarray(values, np.float64),
            "props": [""] * n,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")


def test_ks_disjoint_supports_give_d_one(ray_session, tmp_path):
    from goose_parser_ray.queries import q_ks_test

    # clicks all at 1.0, errors all at 2.0 -> CDFs never overlap -> D = 1
    _write_events(
        tmp_path,
        values=[1.0] * 6 + [2.0] * 4,
        event_types=["click"] * 6 + ["error"] * 4,
    )
    out = q_ks_test(str(tmp_path)).to_pandas()
    assert out["n1"].iloc[0] == 6 and out["n2"].iloc[0] == 4
    assert out["d_e6"].iloc[0] == 1_000_000


def test_ks_identical_samples_give_d_zero(ray_session, tmp_path):
    from goose_parser_ray.queries import q_ks_test

    vals = [1.0, 2.5, 3.25, 9.0]
    _write_events(
        tmp_path,
        values=vals + vals,
        event_types=["click"] * 4 + ["error"] * 4,
    )
    out = q_ks_test(str(tmp_path)).to_pandas()
    assert out["d_e6"].iloc[0] == 0


def test_autocorr_alternating_series_is_minus_one(ray_session, tmp_path):
    from goose_parser_ray.queries import q_autocorr

    # one user, values alternating 0,2,0,2,... -> lag-1 corr is exactly -1
    _write_events(
        tmp_path,
        values=[0.0, 2.0] * 5,
        event_types=["view"] * 10,
    )
    out = q_autocorr(str(tmp_path)).to_pandas()
    assert out["n_pairs"].iloc[0] == 9
    assert out["corr_e6"].iloc[0] == -1_000_000


def test_autocorr_pairs_never_cross_users(ray_session, tmp_path):
    from goose_parser_ray.queries import q_autocorr

    # 4 users x 1 event each: no user has a predecessor -> zero pairs
    _write_events(
        tmp_path,
        values=[1.0, 2.0, 3.0, 4.0],
        event_types=["view"] * 4,
        user_ids=[10, 20, 30, 40],
    )
    out = q_autocorr(str(tmp_path)).to_pandas()
    assert out["n_pairs"].iloc[0] == 0
    assert out["corr_e6"].iloc[0] == 0


def test_orc_roundtrip_is_lossless(ray_session, tmp_path):
    from goose_parser_ray.queries import q_orc_roundtrip

    vals = [0.015, 2.0, -3.125, 490.02]
    _write_events(
        tmp_path, values=vals, event_types=["click", "error", "view", "view"]
    )
    out = (
        q_orc_roundtrip(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [0, 1, 2, 3]
    # half-away-from-zero cents, exactly as the parquet-side oracle computes
    assert out["v_cents"].tolist() == [2, 200, -313, 49002]
    assert out["event_type"].tolist() == ["click", "error", "view", "view"]


def test_url_canonical_applies_every_rule(ray_session, tmp_path):
    from goose_parser_ray.queries import q_url_canonical

    # doc_id 0 hits every messy branch: upper scheme+host, www., :443,
    # trailing path slash, utm params, fragment
    t = pa.Table.from_pydict(
        {
            "doc_id": np.array([0, 1], np.int64),
            "text": ["a", "b"],
            "lang": ["en", "en"],
            "source": ["src", "src"],
            "n_chars": np.array([1, 1], np.int64),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_url_canonical(str(tmp_path)).to_pandas().sort_values("first_doc")
    urls = out["url"].tolist()
    assert "https://src.example.com/p/0?id=0" in urls
    assert "https://src.example.com/p/1?id=1" in urls
    # no messy artifact survives canonicalization
    for u in urls:
        assert "www." not in u and ":443" not in u and "#" not in u
        assert "utm_" not in u and "/?" not in u
        assert u == u.lower()


def test_url_canonical_merges_equivalent_urls(ray_session, tmp_path):
    from goose_parser_ray.queries import q_url_canonical

    # doc_ids 0 and 30 share source, doc_id%5 and doc_id%3 -> same canonical
    t = pa.Table.from_pydict(
        {
            "doc_id": np.array([0, 30], np.int64),
            "text": ["a", "b"],
            "lang": ["en", "en"],
            "source": ["src", "src"],
            "n_chars": np.array([1, 1], np.int64),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_url_canonical(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["n_docs"].iloc[0] == 2
    assert out["first_doc"].iloc[0] == 0


def test_hits_star_graph_scores(ray_session):
    import ray.data

    from goose_parser_ray.functions.graph import hits_distributed

    # star 0 -> {1,2,3}: node 0 is the only hub, 1..3 equal authorities
    edges = ray.data.from_items(
        [{"src": 0, "dst": 1}, {"src": 0, "dst": 2}, {"src": 0, "dst": 3}]
    )
    out = (
        hits_distributed(edges, max_iters=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["hub"].tolist() == [1.0, 0.0, 0.0, 0.0]
    assert np.allclose(out["auth"].tolist(), [0.0, 1 / 3, 1 / 3, 1 / 3])


def test_pagerank_single_edge_graph(ray_session):
    """Regression: aggregate-derived join inputs on tiny graphs used to
    carry Ray's zero-column empty blocks into the hash join (ArrowInvalid
    'No match or multiple matches for key field reference')."""
    import ray.data

    from goose_parser_ray.functions.graph import pagerank_distributed

    edges = ray.data.from_items([{"src": 1, "dst": 2}])
    out = pagerank_distributed(
        edges, max_iters=2, tol=0.0, driver_edges_threshold=0
    ).to_pandas()
    assert sorted(out["node"].tolist()) == [1, 2]
    assert abs(out["rank"].sum() - 1.0) < 1e-9


def _write_docs(tmp_path, texts, langs=None):
    n = len(texts)
    t = pa.Table.from_pydict(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": list(texts),
            "lang": list(langs) if langs else ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.array([len(x) for x in texts], np.int64),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")


def test_sentence_stats_counts_and_lengths(ray_session, tmp_path):
    from goose_parser_ray.queries import q_sentence_stats

    # ' table ' -> '. ' gives "a b. c d. e": 3 sentences of 3/3/1 chars;
    # trailing '!!' and empty segments are dropped
    _write_docs(
        tmp_path,
        ["a b table c d table e", "only one sentence!!", "x table "],
        langs=["en", "en", "fr"],
    )
    out = (
        q_sentence_stats(str(tmp_path))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert out.loc["en", "n_sentences"] == 4  # 3 from doc0 + 1 from doc1
    assert out.loc["en", "sum_chars"] == 3 + 3 + 1 + len("only one sentence")
    # doc2: "x table " DOES contain ' table ' (trailing space) -> "x. "
    # -> one 1-char sentence; the empty tail segment is dropped
    assert out.loc["fr", "n_sentences"] == 1
    assert out.loc["fr", "sum_chars"] == 1


def test_blocklist_filter_counts_and_membership(ray_session, tmp_path):
    from goose_parser_ray.queries import q_blocklist_filter

    _write_docs(
        tmp_path,
        [
            "spark and vector and spark",  # 3 matches
            "clean document here",         # dropped
            "streamstream",                # 2 non-overlapping matches
        ],
    )
    out = (
        q_blocklist_filter(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [0, 2]
    assert out.loc[0, "n_matches"] == 3
    assert out.loc[2, "n_matches"] == 2
