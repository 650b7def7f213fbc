"""Deduplication operators — exact and near-dup (guide "Aggregation at
scale"; each also surfaced through ``__ray_entry__.queries``).

Shuffle accounting (what moves in the all-to-all):

- exact:       one groupby on a 64-bit content hash (hash column only + kept
               row payload).
- MinHash+LSH: shingling/minhashing is map-only; the shuffle moves (band_id,
               band_hash, doc_id) triples — 16 small rows per doc, never the
               text.
- SimHash:     map-only signature; shuffle moves (table_id, key, doc_id).
- embedding:   random-hyperplane LSH buckets; exact cosine verified inside
               each bucket group.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# exact dedup (S2)
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, col: str, id_col: str
) -> ray.data.Dataset:
    """Keep one row per distinct ``col`` value — the winner is the smallest
    ``id_col`` (deterministic "first wins"). Hash column added vectorized;
    groupby moves rows keyed by the 32-bit hash (collisions resolved by
    grouping on the true value inside each hash group)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        h = np.fromiter(
            (_crc(v or "") % _NB for v in vals), dtype=np.int64, count=len(vals)
        )
        return batch.append_column("__h", pa.array(h))

    def first_per_value(group: pd.DataFrame) -> pd.DataFrame:
        # fine-grained grouping on the true value happens inside the coarse
        # hash bucket — vectorized pandas, not one Ray group per value
        return group.sort_values(id_col).groupby(col, as_index=False).first()

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    ds = ds.groupby("__h").map_groups(first_per_value, batch_format="pandas")
    return ds.drop_columns(["__h"])


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle → minhash → band → bucket groupby)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHashActor:
    """Per-doc minhash signature + banded LSH keys. Permutation parameters
    are generated ONCE per actor from a fixed seed (deterministic across the
    pool — SURVEY.md §7.6-7)."""

    def __init__(
        self,
        col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        bands: int = 16,
        shingle: int = 3,
        seed: int = 42,
    ) -> None:
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.col, self.id_col = col, id_col
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray | None:
        words = (text or "").lower().split()
        if len(words) < self.shingle:
            return None
        shingles = np.fromiter(
            (
                _crc(" ".join(words[i : i + self.shingle]))
                for i in range(len(words) - self.shingle + 1)
            ),
            dtype=np.int64,
        )
        # (a*x + b) mod p for all perms × shingles, vectorized
        m = (self.a[:, None] * shingles[None, :] + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.col].to_pylist()
        out_id: list = []
        out_band: list[int] = []
        out_key: list[int] = []
        for did, text in zip(ids, texts):
            sig = self.signature(text)
            if sig is None:
                continue
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                key = zlib.crc32(chunk.tobytes()) & 0xFFFFFFFF
                out_id.append(did)
                out_band.append(band)
                out_key.append(key)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
            }
        )


# Number of coarse shuffle buckets for pair generation / pair dedup. A
# groupby on the raw (band, key) would create millions of tiny groups and
# pay per-group Python overhead; instead groups are coalesced into NB
# buckets and the fine-grained grouping happens vectorized (pandas) inside
# each bucket. NB should be ≳ cluster cores; collisions are harmless
# (buckets only partition work).
_NB = 64


def _pairs_in_bucket(group: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    """All distinct candidate pairs within one coarse bucket: fine-grained
    groupby happens here, in-memory, not in the shuffle."""
    out_a: list = []
    out_b: list = []
    for _, g in group.groupby(by, sort=False):
        ids = sorted(set(g["doc_id"]))
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                out_a.append(a)
                out_b.append(b)
    df = pd.DataFrame({"doc_a": out_a, "doc_b": out_b})
    return df.drop_duplicates()


def _dedup_pairs(pairs: ray.data.Dataset, cols: tuple[str, str] = ("doc_a", "doc_b")) -> ray.data.Dataset:
    """Distinct pairs via bucketed groupby (same coalescing trick)."""
    a, b = cols

    def add_bucket(t: pa.Table) -> pa.Table:
        av, bv = t[a].to_pylist(), t[b].to_pylist()
        h = np.fromiter(
            (_crc(f"{x}|{y}") % _NB for x, y in zip(av, bv)),
            dtype=np.int64, count=len(av),
        )
        return t.append_column("__pb", pa.array(h))

    pairs = pairs.map_batches(add_bucket, batch_format="pyarrow")
    pairs = pairs.groupby("__pb").map_groups(
        lambda g: g.drop_duplicates(subset=[a, b]), batch_format="pandas"
    )
    return pairs.drop_columns(["__pb"])


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Candidate near-dup pairs: shingle→minhash→band (actor pool, map-only)
    → bucket groupby → pairs → distinct."""
    banded = ds.map_batches(
        MinHashActor,
        fn_constructor_kwargs={
            "col": col,
            "id_col": id_col,
            "num_perm": num_perm,
            "bands": bands,
            "shingle": shingle,
        },
        batch_format="pyarrow",
        concurrency=(concurrency, concurrency),
    )
    banded = banded.map_batches(
        lambda t: t.append_column(
            "__b", pa.compute.cast(pa.compute.bit_wise_and(t["key"], _NB - 1), pa.int64())
        ),
        batch_format="pyarrow",
    )
    pairs = banded.groupby("__b").map_groups(
        lambda g: _pairs_in_bucket(g, by=["band", "key"]), batch_format="pandas"
    )
    return _dedup_pairs(pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashActor:
    """64-bit SimHash per doc + 4×16-bit band keys (docs within hamming
    distance ≤3 share at least one identical 16-bit band)."""

    def __init__(self, col: str = "text", id_col: str = "doc_id") -> None:
        self.col, self.id_col = col, id_col

    @staticmethod
    def simhash(text: str) -> int:
        words = (text or "").lower().split()
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in words:
            h = (_crc(w) << 32) | _crc(w[::-1] + "~")
            bits = np.unpackbits(
                np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8)
            )
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.col].to_pylist()
        rows = {"doc_id": [], "table_id": [], "band_key": [], "simhash": []}
        for did, t in zip(ids, texts):
            sh = self.simhash(t)
            for tbl in range(4):
                rows["doc_id"].append(did)
                rows["table_id"].append(tbl)
                rows["band_key"].append((sh >> (16 * tbl)) & 0xFFFF)
                rows["simhash"].append(sh)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(rows["doc_id"]),
                "table_id": pa.array(rows["table_id"], pa.int32()),
                "band_key": pa.array(rows["band_key"], pa.int64()),
                "simhash": pa.array(
                    np.array(rows["simhash"], dtype=np.uint64).astype(np.int64)
                ),
            }
        )


def _simhash_pairs_bucket(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    out = []
    for _, g in group.groupby(["table_id", "band_key"], sort=False):
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        sigs = rows["simhash"].tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin((sigs[i] ^ sigs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_hamming:
                    out.append((ids[i], ids[j], d))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]).drop_duplicates(
        subset=["doc_a", "doc_b"]
    )


def simhash_near_dups(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> ray.data.Dataset:
    banded = ds.map_batches(
        SimHashActor,
        fn_constructor_kwargs={"col": col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(concurrency, concurrency),
    )
    banded = banded.map_batches(
        lambda t: t.append_column(
            "__b",
            pa.compute.cast(pa.compute.bit_wise_and(t["band_key"], _NB - 1), pa.int64()),
        ),
        batch_format="pyarrow",
    )
    pairs = banded.groupby("__b").map_groups(
        lambda g: _simhash_pairs_bucket(g, max_hamming), batch_format="pandas"
    )
    return _dedup_pairs(pairs)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (over candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Word n-gram Jaccard similarity (exact; used to verify LSH candidates)."""

    def grams(t: str) -> set[str]:
        w = (t or "").lower().split()
        return {" ".join(w[i : i + n]) for i in range(max(0, len(w) - n + 1))}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


def verify_candidates_jaccard(
    pairs: ray.data.Dataset,
    docs_lookup: dict,
    *,
    n: int = 3,
    threshold: float = 0.8,
) -> ray.data.Dataset:
    """Verify candidate pairs against exact n-gram Jaccard. The doc-text
    lookup is broadcast via ``ray.put`` (small side — for huge corpora use a
    repartitioned join instead; documented partitioning assumption)."""
    import ray as _ray

    ref = _ray.put(docs_lookup)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = _ray.get(ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        sims = [ngram_jaccard(lookup.get(x, ""), lookup.get(y, ""), n) for x, y in zip(a, b)]
        batch = batch.append_column("jaccard", pa.array(sims, pa.float64()))
        return batch.filter(pa.array([s >= threshold for s in sims]))

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------


class HyperplaneBucketActor:
    """Bucket embeddings by the sign pattern of ``n_planes`` random
    hyperplanes (seed-fixed); near-identical vectors share buckets."""

    def __init__(
        self, dim: int, id_col: str = "vec_id", col: str = "embedding",
        n_planes: int = 12, n_tables: int = 4, seed: int = 42,
    ) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_tables, n_planes, dim).astype(np.float32)
        self.id_col, self.col, self.n_tables = id_col, col, n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        emb = np.array(batch[self.col].to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        out = {"vec_id": [], "table_id": [], "bucket": [], "embedding": []}
        for tbl in range(self.n_tables):
            signs = (emb @ self.planes[tbl].T) > 0  # (n, planes)
            keys = np.packbits(signs, axis=1)
            for i, vid in enumerate(ids):
                out["vec_id"].append(vid)
                out["table_id"].append(tbl)
                out["bucket"].append(int.from_bytes(keys[i].tobytes(), "big"))
                out["embedding"].append(emb[i].tolist())
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(out["vec_id"]),
                "table_id": pa.array(out["table_id"], pa.int32()),
                "bucket": pa.array(out["bucket"], pa.int64()),
                "embedding": pa.array(out["embedding"], pa.list_(pa.float32())),
            }
        )


def _cosine_pairs_bucket(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    out = []
    for _, g in group.groupby(["table_id", "bucket"], sort=False):
        rows = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(rows) < 2:
            continue
        ids = rows["vec_id"].tolist()
        m = np.array(rows["embedding"].tolist(), dtype=np.float32)  # pre-normalized
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        hit = sims[ii, jj] >= threshold
        for i, j in zip(ii[hit], jj[hit]):
            out.append((ids[i], ids[j], round(float(sims[i, j]), 6)))
    return pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine"]).drop_duplicates(
        subset=["vec_a", "vec_b"]
    )


def embedding_near_dups(
    ds: ray.data.Dataset,
    dim: int,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    concurrency: int = 4,
) -> ray.data.Dataset:
    bucketed = ds.map_batches(
        HyperplaneBucketActor,
        fn_constructor_kwargs={
            "dim": dim, "id_col": id_col, "col": col,
            "n_planes": n_planes, "n_tables": n_tables,
        },
        batch_format="pyarrow",
        concurrency=(concurrency, concurrency),
    )
    bucketed = bucketed.map_batches(
        lambda t: t.append_column(
            "__b",
            pa.compute.cast(pa.compute.bit_wise_and(t["bucket"], _NB - 1), pa.int64()),
        ),
        batch_format="pyarrow",
    )
    pairs = bucketed.groupby("__b").map_groups(
        lambda g: _cosine_pairs_bucket(g, threshold), batch_format="pandas"
    )
    return _dedup_pairs(pairs, cols=("vec_a", "vec_b"))


# ---------------------------------------------------------------------------
# end-to-end near-dup removal: candidates → components → keep-first filter
# ---------------------------------------------------------------------------


def _union_find_components(pairs: "pd.DataFrame") -> dict:
    """doc → component root (min id). Driver-side union-find — valid because
    the LSH candidate-pair set is O(duplicates), orders of magnitude smaller
    than the corpus (guide: union-find on the driver only when the candidate
    set is provably small; guarded below). The fully distributed alternative
    is iterative min-label propagation: k rounds of
    ``edges ⋈ labels → groupby(node).min(label)`` over the pairs dataset —
    switch to it when pair counts approach driver memory."""
    if len(pairs) > 5_000_000:
        raise ValueError(
            f"{len(pairs)} candidate pairs exceed the driver union-find guard; "
            "use distributed min-label propagation instead"
        )
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # root = smaller id → deterministic "first wins"
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def minhash_dedup_keep(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    jaccard_threshold: float | None = None,
    docs_lookup: dict | None = None,
    concurrency: int = 4,
    **minhash_kwargs,
) -> ray.data.Dataset:
    """The full near-dup REMOVAL pipeline: MinHash+LSH candidates →
    (optional) exact n-gram Jaccard verification → connected components →
    keep the min-id representative of every duplicate cluster → filter the
    corpus with a broadcast drop-set (no shuffle touches the corpus itself).

    NOTE: consumes the candidate-pair sub-pipeline eagerly (pairs are tiny);
    the returned Dataset lazily filters ``ds``."""
    import ray as _ray

    pairs = minhash_lsh_candidates(
        ds, col=col, id_col=id_col, concurrency=concurrency, **minhash_kwargs
    )
    if jaccard_threshold is not None:
        if docs_lookup is None:
            raise ValueError("jaccard verification needs docs_lookup")
        pairs = verify_candidates_jaccard(
            pairs, docs_lookup, threshold=jaccard_threshold
        )
    pairs_pd = pairs.to_pandas()
    roots = _union_find_components(pairs_pd)
    drop = {x for x, r in roots.items() if r != x}
    drop_ref = _ray.put(drop)

    def keep_rows(batch: pa.Table) -> pa.Table:
        d = _ray.get(drop_ref)
        mask = [v not in d for v in batch[id_col].to_pylist()]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_rows, batch_format="pyarrow")
