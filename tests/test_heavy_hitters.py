"""Heavy-hitters sketch: mergeable truncated-counts top-k vs exact counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _zipf_words(n: int, seed: int = 3) -> list[str]:
    rng = np.random.RandomState(seed)
    ranks = rng.zipf(1.3, size=n).clip(1, 5000)
    return [f"w{r}" for r in ranks]


def test_summary_merge_bound_holds():
    from goose_parser_ray.functions.sketches import (
        merge_topk_summaries,
        topk_words_summary,
    )

    words = _zipf_words(50_000)
    exact = pd.Series(words).value_counts()
    width = 200
    chunks = [pd.Series(words[i : i + 5000]) for i in range(0, len(words), 5000)]
    summaries = [topk_words_summary(c, width) for c in chunks]
    merged, bound = merge_topk_summaries(summaries, width)
    # estimate never exceeds truth + nothing (truncation only UNDER-counts
    # per-chunk survivors; merged est <= exact) and exact - est <= bound
    for w, est in merged.head(20).items():
        assert est <= exact[w]
        assert exact[w] - est <= bound, (w, est, exact[w], bound)
    # the true top-10 all survive with a generous width
    top10 = set(exact.head(10).index)
    assert top10 <= set(merged.index)


def test_heavy_hitters_matches_exact_on_dataset(ray_session):
    from goose_parser_ray.functions.sketches import heavy_hitters

    rng = np.random.RandomState(9)
    words = _zipf_words(20_000, seed=9)
    # pack words into ~200 documents
    docs = [
        " ".join(words[i : i + 100]) for i in range(0, len(words), 100)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pydict({"text": docs}))
    got = heavy_hitters(ds, "text", k=10, width=512)
    exact = pd.Series(words).value_counts()
    want = (
        exact.reset_index()
        .set_axis(["word", "n"], axis=1)
        .sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        .head(10)
    )
    assert got["word"].tolist() == want["word"].tolist()
    # zipf head is heavy: estimates for the head should be exact here
    assert got["est_count"].tolist() == want["n"].tolist()


def test_bloom_filter_no_false_negatives_and_fpr(ray_session):
    from goose_parser_ray.functions.sketches import (
        bloom_build,
        bloom_contains,
    )

    n_bits, n_hashes = 1 << 16, 4
    members = [f"user-{i}" for i in range(2000)]
    ds = ray.data.from_items([{"u": m} for m in members]).repartition(5)
    bits = bloom_build(ds, "u", n_bits=n_bits, n_hashes=n_hashes)
    # zero false negatives
    assert bloom_contains(bits, members, n_bits, n_hashes).all()
    # FPR near the theoretical bound (k=4, n=2000, m=65536 → ~0.24%)
    probes = [f"other-{i}" for i in range(20_000)]
    fpr = bloom_contains(bits, probes, n_bits, n_hashes).mean()
    k, n, m = n_hashes, len(members), n_bits
    bound = (1 - np.exp(-k * n / m)) ** k
    assert fpr <= 3 * bound, (fpr, bound)
    # mergeability: two half-builds OR to the whole
    from goose_parser_ray.functions.sketches import bloom_batch

    half = bloom_batch(members[:1000], n_bits, n_hashes) | bloom_batch(
        members[1000:], n_bits, n_hashes
    )
    whole = bloom_batch(members, n_bits, n_hashes)
    assert (half == whole).all()


def test_cms_never_undercounts_and_merge_is_whole(ray_session):
    """Count-min invariants under FORCED collisions (width 32 ≪ 500
    distinct keys): estimates are never below true counts, the merged
    two-half sketch is bit-identical to the single-pass sketch, and the
    distributed build equals the local one."""
    import pandas as pd
    import ray.data

    from goose_parser_ray.functions.sketches import (
        cms_batch,
        cms_build,
        cms_query,
    )

    width, depth = 32, 4
    rng = np.random.RandomState(5)
    values = [f"k{v}" for v in rng.zipf(1.5, 5000) % 500]
    truth = pd.Series(values).value_counts()

    whole = cms_batch(values, width, depth)
    half = cms_batch(values[:2500], width, depth) + cms_batch(
        values[2500:], width, depth
    )
    assert (whole == half).all()

    probe = truth.index[:50].tolist()
    est = cms_query(whole, probe, width, depth)
    assert (est >= truth[probe].to_numpy()).all()

    ds = ray.data.from_pandas(pd.DataFrame({"v": values})).repartition(8)
    dist = cms_build(ds, "v", width=width, depth=depth)
    assert (dist == whole).all()


def test_cms_exact_at_wide_width():
    """With width ≫ distinct keys and depth 4, collisions are absent for
    the probed keys — estimates equal exact counts (the sf0.01 regime the
    cms_words query runs in)."""
    import pandas as pd

    from goose_parser_ray.functions.sketches import cms_batch, cms_query

    values = ["a"] * 7 + ["b"] * 3 + ["c"] * 11
    sk = cms_batch(values, 4096, 4)
    est = cms_query(sk, ["a", "b", "c"], 4096, 4)
    assert est.tolist() == [7, 3, 11]
    assert int(sk[0].sum()) == len(values)
