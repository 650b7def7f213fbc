"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix (``ray.put`` once), per-batch LOCAL top-k, then one
small groupby merges partials into the global top-k per query. The shuffle
moves ``n_queries × k`` rows per batch, never the corpus.

Scale path: the LSH-bucketed variant probes only the buckets the query lands
in (buckets from :class:`~goose_parser_ray.functions.dedup.HyperplaneBucketActor`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor stage: query matrix fetched from plasma once per actor."""

    def __init__(
        self, queries_ref, k: int, id_col: str = "vec_id", col: str = "embedding"
    ) -> None:
        q = ray.get(queries_ref)
        self.query_ids = q["ids"]
        self.queries = _normalize(np.asarray(q["matrix"], dtype=np.float32))
        self.k, self.id_col, self.col = k, id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        emb = _normalize(np.array(batch[self.col].to_pylist(), dtype=np.float32))
        sims = self.queries @ emb.T  # (n_q, n_batch)
        k = min(self.k, sims.shape[1])
        out = {"query_id": [], "vec_id": [], "cosine": []}
        # local top-k per query (argpartition then exact sort of the slice)
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        for qi, qid in enumerate(self.query_ids):
            cand = idx[qi]
            order = cand[np.argsort(-sims[qi, cand], kind="stable")]
            out["query_id"].extend([qid] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["cosine"].extend(np.round(sims[qi, order], 6).tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"]),
                "vec_id": pa.array(out["vec_id"]),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )


def _merge_topk(k: int):
    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # deterministic tie-break: cosine desc, then vec_id asc
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True])
        g = g.head(k).reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        return g

    return merge


def ann_bruteforce(
    ds: ray.data.Dataset,
    query_ids: list,
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    exclude_self: bool = True,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Global top-k cosine neighbors for each query vector."""
    ref = ray.put({"ids": list(query_ids), "matrix": query_matrix})
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k + (1 if exclude_self else 0),
                               "id_col": id_col, "col": col},
        batch_format="pyarrow",
        concurrency=(concurrency, concurrency),
    )
    merged = partial.groupby("query_id").map_groups(
        _merge_topk(k + (1 if exclude_self else 0)), batch_format="pandas"
    )
    if exclude_self:
        merged = merged.map_batches(
            lambda t: t.filter(
                pa.compute.not_equal(t["query_id"], t["vec_id"])
            ),
            batch_format="pyarrow",
        )
        merged = merged.groupby("query_id").map_groups(
            _merge_topk(k), batch_format="pandas"
        )
    return merged
