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

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        h = np.fromiter((_crc(v or "") for v in vals), dtype=np.int64, count=len(vals))
        return batch.append_column("__h", pa.array(h))

    def first_per_value(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(id_col).groupby(col, as_index=False).first()
        return out

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
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


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])


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
    pairs = banded.groupby(["band", "key"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # distinct pairs: one more small groupby over (doc_a, doc_b)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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


def _simhash_pairs(group: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    rows = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].tolist()
    sigs = rows["simhash"].tolist()
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin((sigs[i] ^ sigs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= max_hamming:
                out.append((ids[i], ids[j], d))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])


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
    pairs = banded.groupby(["table_id", "band_key"]).map_groups(
        lambda g: _simhash_pairs(g, max_hamming), batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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


def _cosine_pairs(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    rows = group.drop_duplicates("vec_id").sort_values("vec_id")
    if len(rows) < 2:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
    ids = rows["vec_id"].tolist()
    m = np.array(rows["embedding"].tolist(), dtype=np.float32)  # pre-normalized
    sims = m @ m.T
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold:
                out.append((ids[i], ids[j], round(float(sims[i, j]), 6)))
    return pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine"])


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
    pairs = bucketed.groupby(["table_id", "bucket"]).map_groups(
        lambda g: _cosine_pairs(g, threshold), batch_format="pandas"
    )
    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
