"""Content-defined chunking (LBFS-style) invariants: partition property,
size bounds, byte-edit locality (the reason CDC beats fixed blocking), and
distributed-vs-local identity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from goose_parser_ray.functions.dedup import (
    cdc_boundaries,
    cdc_chunk_table,
    cdc_dedup_stats,
)


def _payload(n=5000, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, n, dtype=np.uint8).tobytes()


def test_cdc_partitions_payload_and_respects_bounds():
    p = _payload()
    cuts = cdc_boundaries(p, avg_bits=6, min_size=16, max_size=256)
    assert cuts[-1] == len(p)
    prev = 0
    for i, c in enumerate(cuts):
        size = c - prev
        assert size <= 256
        # every chunk except possibly the final tail meets the minimum
        if i < len(cuts) - 1:
            assert size >= 16
        prev = c
    # expected chunk size ~2^6: sanity band
    mean = len(p) / len(cuts)
    assert 24 <= mean <= 200, mean


def test_cdc_byte_edit_locality():
    """Editing ONE byte must leave chunks outside the edit neighborhood
    identical (same (offset-from-end, hash) stream after the edit region)
    — the property fixed-size blocking lacks."""
    import hashlib

    p = bytearray(_payload())
    q = bytearray(p)
    q[2500] ^= 0xFF

    def chunks(b):
        out, prev = [], 0
        for c in cdc_boundaries(bytes(b), avg_bits=6, min_size=16, max_size=256):
            out.append(hashlib.blake2b(bytes(b[prev:c]), digest_size=8).digest())
            prev = c
        return out

    cp, cq = chunks(p), chunks(q)
    # common prefix + common suffix of the chunk-hash streams cover all but
    # a handful of chunks around the edit
    pre = 0
    while pre < min(len(cp), len(cq)) and cp[pre] == cq[pre]:
        pre += 1
    suf = 0
    while suf < min(len(cp), len(cq)) - pre and cp[-1 - suf] == cq[-1 - suf]:
        suf += 1
    changed = max(len(cp), len(cq)) - pre - suf
    assert changed <= 4, (changed, len(cp), len(cq))


def test_cdc_empty_and_tiny_payloads():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"abc", min_size=16) == [3]
    t = pa.Table.from_pydict(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "payload": pa.array([b"", b"xy"], pa.binary())}
    )
    ct = cdc_chunk_table(t, col="payload", id_col="doc_id")
    assert ct["doc_id"].to_pylist() == [2]
    assert ct["length"].to_pylist() == [2]


def test_cdc_dedup_stats_distributed_matches_local(ray_session):
    """Identical payloads across rows dedup to one stored copy; the
    distributed aggregate reproduces the local chunk accounting exactly."""
    shared = _payload(3000, seed=1)
    uniq = [_payload(1200, seed=10 + i) for i in range(4)]
    rows = [shared, shared + uniq[0], uniq[1] + shared, uniq[2], uniq[3]]
    df = pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64),
         "payload": rows}
    )
    ds = ray.data.from_pandas(df).repartition(3)
    agg = cdc_dedup_stats(ds, col="payload", id_col="doc_id").to_pandas()
    logical = int((agg["length"] * agg["n"]).sum())
    stored = int(agg["length"].sum())
    assert logical == sum(len(r) for r in rows)
    # the shared 3000-byte block appears 3x: dedup must reclaim ~2 copies
    assert logical - stored > 4000, (logical, stored)

    # local single-table accounting agrees chunk-for-chunk
    t = pa.Table.from_pydict(
        {"doc_id": pa.array(df["doc_id"]), "payload": pa.array(rows, pa.binary())}
    )
    ct = cdc_chunk_table(t, col="payload", id_col="doc_id").to_pandas()
    local = (
        ct.groupby(["chunk_hash", "length"], sort=False).size().reset_index(name="n")
    )
    merged = agg.sort_values(["chunk_hash", "length"]).reset_index(drop=True)
    localc = local.sort_values(["chunk_hash", "length"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged[["chunk_hash", "length", "n"]].astype("int64"),
        localc[["chunk_hash", "length", "n"]].astype("int64"),
    )
