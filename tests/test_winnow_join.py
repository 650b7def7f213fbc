"""winnow_dedup_pairs (MOSS join): tier parity (broadcast vs
hash-partitioned nfp attach), hand-checked semantics on a tiny corpus,
and the IDF-cut boundary."""

import numpy as np
import pandas as pd
import ray.data

from goose_parser_ray.functions.dedup import winnow_dedup_pairs


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def _run(ds, **kw):
    got = winnow_dedup_pairs(ds, **kw).to_pandas()
    cols = ["a", "b", "n_shared", "nfp_a", "nfp_b"]
    if got.empty:  # zero-block empty datasets surface with no columns
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (
        got[cols]
        .astype("int64")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def test_near_identical_docs_pair(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " tail"},  # near-dup of 1
        {"doc_id": 3, "text": "completely different words entirely here xyz"},
    ]
    out = _run(_ds(rows))
    assert [(r.a, r.b) for r in out.itertuples()] == [(1, 2)]
    row = out.iloc[0]
    # shared fingerprints cover >= half of the smaller doc's set
    assert 2 * row.n_shared >= min(row.nfp_a, row.nfp_b)


def test_tier_parity_random_corpus(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    for d in range(60):
        words = list(rng.choice(vocab, size=int(rng.integers(20, 60))))
        rows.append({"doc_id": d, "text": " ".join(words)})
    # plant two exact-duplicate clusters so the result is non-empty
    rows[50]["text"] = rows[10]["text"]
    rows[51]["text"] = rows[11]["text"] + " zeta"
    ds = _ds(rows)
    broadcast = _run(ds, broadcast_guard=5_000_000)
    joined = _run(ds, broadcast_guard=0)
    assert len(broadcast) > 0
    assert broadcast.equals(joined)


def test_idf_cut_drops_universal_fingerprints(ray_session):
    """A fingerprint present in EVERY doc of a corpus larger than idf_cap
    must contribute nothing: docs that share only boilerplate do not pair."""
    boiler = "this is the standard footer text appended to every document"
    rows = [
        {"doc_id": d, "text": f"unique{d}word{d}content{d} " * 3 + boiler}
        for d in range(10)
    ]
    out = _run(_ds(rows), idf_cap=5)
    # the boilerplate grams appear in 10 > 5 docs -> cut; uniques don't match
    assert len(out) == 0
