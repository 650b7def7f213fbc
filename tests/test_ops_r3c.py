"""row_number_global / cusum_changepoint / entity_resolution edge semantics
(full DuckDB parity is covered by the oracle sweep)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_row_number_global_dense_on_clustered_ids(ray_session, tmp_path):
    from goose_parser_ray.queries import q_row_number_global

    # ids clustered at the top of the domain: most range buckets are empty,
    # numbering must still come back dense 1..N in id order
    ids = np.concatenate([[0], np.arange(90_000, 90_050)])
    t = pa.Table.from_pydict(
        {
            "doc_id": ids,
            "text": ["x"] * len(ids),
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": np.arange(len(ids), dtype=np.int64),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        q_row_number_global(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["row_num"].tolist() == list(range(1, len(ids) + 1))
    assert out["doc_id"].tolist() == sorted(ids.tolist())


def test_cusum_finds_the_mean_shift(ray_session, tmp_path):
    from goose_parser_ray.queries import q_cusum_changepoint

    # 40 quiet values then 40 elevated ones -> |T| peaks at the boundary
    vals = np.concatenate([np.full(40, 10.0), np.full(40, 50.0)])
    n = len(vals)
    ts = pd.date_range("2024-03-01", periods=n, freq="1h")
    t = pa.Table.from_pydict(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": np.full(n, 5, dtype=np.int64),
            "event_type": ["view"] * n,
            "value": vals,
            "props": [""] * n,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_cusum_changepoint(str(tmp_path)).to_pandas()
    assert len(out) == 1
    # the last quiet sample is the maximal-deviation point
    assert out["cp_ts"].iloc[0] == ts[39].strftime("%Y-%m-%d %H:%M:%S")
    # exact integer statistic: n*cum_i - i*tot at i=40
    cents = np.round(vals * 100).astype(np.int64)
    expect = abs(n * cents[:40].sum() - 40 * cents.sum())
    assert out["t_abs"].iloc[0] == expect


def test_connected_components_survives_tiny_graphs(ray_session):
    # regression: Ray's hash-shuffle join/aggregate emit zero-column blocks
    # for empty partitions; a 3-node path used to crash the pointer-jump
    # join with ArrowInvalid FieldRef(label) (see _drop_empty_blocks)
    import ray
    import ray.data

    from goose_parser_ray.functions.dedup import (
        connected_components_distributed,
    )

    pairs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"a": np.array([0, 1], np.int64), "b": np.array([1, 2], np.int64)}
        )
    )
    out = (
        connected_components_distributed(pairs, cols=("a", "b"))
        .to_pandas()
        .sort_values("node")
    )
    assert out["label"].tolist() == [0, 0, 0]


def test_entity_resolution_merges_transitive_typo_chain(ray_session, tmp_path):
    from goose_parser_ray.queries import q_entity_resolution

    # chain: "goose parser" ~ "goose parsers" ~ "goose parserss";
    # the ends differ more but must still share one canonical id
    names = (
        ["goose parser"] * 3
        + ["goose parsers"] * 2
        + ["goose parserss"]
        + ["entirely different"] * 2
    )
    t = pa.Table.from_pydict(
        {
            "p_partkey": np.arange(10, 10 + len(names), dtype=np.int64),
            "p_name": names,
        }
    )
    pq.write_table(t, tmp_path / "part.parquet")
    out = (
        q_entity_resolution(str(tmp_path))
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    canon = dict(zip(out["p_partkey"], out["canonical_id"]))
    cluster = {canon[k] for k in range(10, 16)}
    assert cluster == {10}  # whole chain collapses to the min key
    assert canon[16] == canon[17] == 16  # exact-name-only cluster


def test_bfs_levels_on_crafted_graph(ray_session):
    import ray.data

    from goose_parser_ray.functions.graph import bfs_levels_distributed

    # path 0-1-2-3-4 plus isolated edge 10-11 (unreachable from seed 0)
    u = np.array([0, 1, 2, 3, 10], np.int64)
    v = np.array([1, 2, 3, 4, 11], np.int64)
    edges = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "u": np.concatenate([u, v]),
                "v": np.concatenate([v, u]),
            }
        )
    )
    seeds = ray.data.from_arrow(
        pa.Table.from_pydict({"node": np.array([0], np.int64)})
    )
    for thr in (5_000_000, 0):  # driver tier and join tier
        out = (
            bfs_levels_distributed(
                edges, seeds, max_hops=3, driver_edges_threshold=thr
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        # cap at 3 hops: node 4 (distance 4) and the 10-11 island never appear
        assert out["node"].tolist() == [0, 1, 2, 3]
        assert out["lvl"].tolist() == [0, 1, 2, 3]


def test_sssp_prefers_lighter_multi_hop_path(ray_session):
    import ray.data

    from goose_parser_ray.functions.graph import sssp_bounded

    # 0-2 direct costs 10; 0-1-2 costs 2+3=5; node 3 unreachable in 2 rounds
    t = pa.Table.from_pydict(
        {
            "u": np.array([0, 0, 1, 2], np.int64),
            "v": np.array([2, 1, 2, 3], np.int64),
            "w": np.array([10, 2, 3, 1], np.int64),
        }
    )
    edges = ray.data.from_arrow(t)
    seeds = ray.data.from_arrow(
        pa.Table.from_pydict({"node": np.array([0], np.int64)})
    )
    for thr in (5_000_000, 0):  # driver tier and join tier
        out = (
            sssp_bounded(edges, seeds, rounds=2, driver_edges_threshold=thr)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        got = dict(zip(out["node"], out["d"]))
        assert got == {0: 0, 1: 2, 2: 5, 3: 11}


def test_bootstrap_ci_covers_mean_and_is_block_invariant(ray_session):
    import ray.data

    from goose_parser_ray.functions.stats import bootstrap_mean_ci

    rng = np.random.default_rng(9)
    n = 20_000
    vals = rng.integers(0, 10_000, n).astype(np.int64)
    t = pa.Table.from_pydict(
        {"id": np.arange(n, dtype=np.int64), "v": vals}
    )

    out3 = bootstrap_mean_ci(
        ray.data.from_arrow(t).repartition(3), id_col="id", value_col="v"
    ).to_pylist()[0]
    out11 = bootstrap_mean_ci(
        ray.data.from_arrow(t).repartition(11), id_col="id", value_col="v"
    ).to_pylist()[0]
    # weights depend only on (id, replicate) -> block layout cannot matter
    assert out3 == out11
    true_mean_e4 = int(vals.sum()) * 10_000 // n
    assert out3["ci_lo_e4"] <= true_mean_e4 <= out3["ci_hi_e4"]
    # CI width ≈ 2·1.96·sd/√n: sd≈2887, n=20k → ≈80 value units = 800k e4;
    # B=64 replicates add noise — allow 3× slack
    width = out3["ci_hi_e4"] - out3["ci_lo_e4"]
    assert 0 < width < 3 * 800_000


def test_ab_uplift_detects_a_real_difference(ray_session):
    import ray.data

    from goose_parser_ray.functions.stats import bootstrap_ab_uplift

    rng = np.random.default_rng(4)
    n = 8000
    grp = np.where(np.arange(n) % 2 == 0, "treat", "ctrl")
    v = np.where(
        grp == "treat",
        rng.integers(900, 1100, n),
        rng.integers(700, 900, n),
    ).astype(np.int64)
    t = pa.Table.from_pydict(
        {"id": np.arange(n, dtype=np.int64), "g": grp, "v": v}
    )
    out = bootstrap_ab_uplift(
        ray.data.from_arrow(t).repartition(5),
        id_col="id", value_col="v", group_col="g",
        group_a="treat", group_b="ctrl",
    ).to_pylist()[0]
    assert out["significant"] is True
    assert out["diff_lo_e4"] > 0
    # true uplift ≈ 200 units = 2_000_000 e4; CI must bracket it
    assert out["diff_lo_e4"] < 2_000_000 < out["diff_hi_e4"]

    # identical inputs split differently -> identical output
    out2 = bootstrap_ab_uplift(
        ray.data.from_arrow(t).repartition(13),
        id_col="id", value_col="v", group_col="g",
        group_a="treat", group_b="ctrl",
    ).to_pylist()[0]
    assert out == out2


def _brute_jaccard_pairs(texts, num, den):
    sets = [set((t or "").lower().split()) for t in texts]
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a and not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if den * inter >= num * union:
                out.add((i, j, 10_000 * inter // union))
    return out


def test_set_similarity_bitset_path_spans_word_boundaries(ray_session):
    import ray.data

    from goose_parser_ray.functions.dedup import set_similarity_join

    # vocab of 80 tokens -> 3 bit half-words; docs built so matches cross
    # the 31/62-bit boundaries
    rng = np.random.default_rng(6)
    vocab = [f"tok{i:03d}" for i in range(80)]
    texts = []
    base = rng.choice(vocab, 40, replace=False)
    for k in range(60):
        drop = rng.integers(0, 3)
        words = list(base[drop:]) + list(
            rng.choice(vocab, rng.integers(0, 3), replace=False)
        )
        texts.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    )
    got = set_similarity_join(ds, threshold_num=8, threshold_den=10)
    gset = {
        (r["id_a"], r["id_b"], r["jac_e4"]) for r in got.take_all()
    }
    assert gset == _brute_jaccard_pairs(texts, 8, 10)
    assert gset  # non-degenerate


def test_set_similarity_large_vocab_fallback_matches_bitset(ray_session):
    import ray.data

    from goose_parser_ray.functions import dedup as D

    # same corpus, vocab forced over the bitset guard via unique filler
    # tokens per doc -> exercises the join/merge verify path; results
    # must match brute force exactly
    texts = []
    for k in range(40):
        shared = " ".join(f"s{i}" for i in range(20 - (k % 3)))
        filler = " ".join(f"u{k}_{m}" for m in range(60))
        texts.append(shared + " " + filler)
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    )
    # vocab = 20 shared + 40*60 unique = 2420 > 2048 -> fallback path
    got = D.set_similarity_join(ds, threshold_num=2, threshold_den=10)
    gset = {(r["id_a"], r["id_b"], r["jac_e4"]) for r in got.take_all()}
    assert gset == _brute_jaccard_pairs(texts, 2, 10)


def test_capped_baskets_drops_mega_basket(ray_session, tmp_path):
    from goose_parser_ray.queries import _MAX_BASKET, q_frequent_pairs

    # order 0: mega-basket with 100 distinct parts (over the cap);
    # orders 4 and 8 (mask & 3 == 0): small baskets sharing parts 1,2
    rows = []
    for p in range(100):
        rows.append((0, 1000 + p))
    for o in (4, 8):
        for p in (1, 2, 3):
            rows.append((o, p))
    t = pa.Table.from_pydict(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.array([r[1] for r in rows], np.int64),
            "l_suppkey": np.zeros(len(rows), np.int64),
            "l_linenumber": np.arange(len(rows), dtype=np.int32),
            "l_quantity": np.ones(len(rows)),
            "l_extendedprice": np.ones(len(rows)),
            "l_discount": np.zeros(len(rows)),
            "l_tax": np.zeros(len(rows)),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": pa.array(
                pd.to_datetime(["2024-01-01"] * len(rows)),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    assert 100 > _MAX_BASKET
    out = q_frequent_pairs(str(tmp_path)).to_pandas()
    # the mega-basket's 4950 within-order pairs are gone; only the two
    # small baskets' shared pairs (support 2) survive
    assert set(zip(out["u"], out["v"])) == {(1, 2), (1, 3), (2, 3)}
    assert (out["support"] == 2).all()
    assert not (out["u"] >= 1000).any()
