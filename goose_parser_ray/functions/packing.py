"""Global ordered scan + training-example sequence packing.

A training-data pipeline's last step concatenates tokenized documents in a
deterministic global order and chunks the stream into fixed-length
examples (the standard pack-and-chunk used for LLM pretraining). The core
primitive is an EXCLUSIVE PREFIX SUM over a global order — a window
``SUM ... ROWS UNBOUNDED PRECEDING`` in SQL — which Ray Data has no
operator for. We implement it as a two-light-pass range-bucketed scan:

1. per-bucket size totals (map-side ``np.bincount`` partials, one tiny
   groupby — bucket count is data-proportional via
   ``dedup.num_shuffle_buckets``);
2. the driver cumsums the ≤ num_buckets totals into per-bucket BASE
   offsets (O(buckets) driver work, never O(rows));
3. one bucketed ``map_groups`` sorts each bucket locally by the order
   key and emits base + local exclusive cumsum.

Buckets are RANGE buckets over the order key (monotone bucket map), so
bucket order == key order and the per-bucket bases compose into a global
scan. Group payload is rows/num_buckets — bounded at any corpus size.

Upstream parity note: the reference engine (SURVEY.md §2.6) has no
packing stage — this is part of the §2.6 "training-data operations"
mandate, not a goose-parser port.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from goose_parser_ray.functions.dedup import num_shuffle_buckets


def global_scan_offsets(
    ds: ray.data.Dataset,
    *,
    order_col: str,
    size_col: str,
    offset_col: str = "start_off",
    n_rows: int | None = None,
) -> ray.data.Dataset:
    """Add ``offset_col`` = exclusive prefix sum of ``size_col`` in global
    ``order_col`` order. ``order_col`` must be unique (it is the total
    order; ties would make the scan ambiguous). ``n_rows`` sizes the
    shuffle buckets; defaults to ``ds.count()`` (metadata-only on a plain
    read, pass an upper bound when ``ds`` is mid-pipeline)."""
    if n_rows is None:
        n_rows = ds.count()
    nb = num_shuffle_buckets(n_rows)

    # range-bucket bounds from the order key's span (one cheap aggregate
    # over the pruned column; bucket map must be MONOTONE in the key)
    bounds = ds.select_columns([order_col, size_col]).map_batches(
        lambda t: pa.Table.from_pydict(
            {"lo": [pa.compute.min(t[order_col]).as_py()],
             "hi": [pa.compute.max(t[order_col]).as_py()]}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    span = max(1, hi - lo + 1)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return ((keys.astype(np.int64) - lo) * nb // span).astype(np.int64)

    # pass 1: per-bucket partial sums, map-side bincount → tiny partials
    def partial_sums(t: pa.Table) -> pa.Table:
        k = t[order_col].to_numpy(zero_copy_only=False)
        s = t[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = bucket_of(k)
        sums = np.bincount(b, weights=s, minlength=nb).astype(np.int64)
        nz = np.nonzero(sums)[0]
        return pa.Table.from_pydict(
            {"__b": nz.astype(np.int64), "__s": sums[nz]}
        )

    partials = (
        ds.select_columns([order_col, size_col])
        .map_batches(partial_sums, batch_format="pyarrow")
        .to_pandas()
    )
    totals = np.zeros(nb, dtype=np.int64)
    if len(partials):
        np.add.at(totals, partials["__b"].to_numpy(), partials["__s"].to_numpy())
    bases = np.concatenate(([0], np.cumsum(totals)[:-1]))  # exclusive
    bases_ref = ray.put(bases)

    # pass 2: bucketed local scan (the one real shuffle; payload rows/nb)
    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[order_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(k)))

    def local_scan(g: "pa.Table") -> pa.Table:
        import pandas as pd  # map_groups ships pandas for the sort

        df = g if isinstance(g, pd.DataFrame) else g.to_pandas()
        df = df.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        sizes = df[size_col].to_numpy(np.int64)
        base = ray.get(bases_ref)[int(df["__b"].iloc[0])]
        off = base + np.concatenate(([0], np.cumsum(sizes)[:-1]))
        df[offset_col] = off.astype(np.int64)
        return df.drop(columns="__b")

    out = ds.map_batches(add_bucket, batch_format="pyarrow")
    return out.groupby("__b").map_groups(local_scan, batch_format="pandas")


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    order_col: str,
    size_col: str,
    seq_len: int,
    n_rows: int | None = None,
) -> ray.data.Dataset:
    """Pack-and-chunk: concatenate docs in ``order_col`` order and cut the
    token stream into ``seq_len``-token training examples. Emits per doc
    its stream offset and the [ex_start, ex_end] example-index range it
    lands in (a doc spanning a boundary appears in consecutive examples —
    the standard pretraining layout). Rows with ``size_col`` == 0 must be
    filtered upstream (a zero-length doc has no position in the stream)."""
    ds = global_scan_offsets(
        ds, order_col=order_col, size_col=size_col, n_rows=n_rows
    )

    def chunk(t: pa.Table) -> pa.Table:
        off = t["start_off"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("ex_start", pa.array(off // seq_len))
        t = t.append_column("ex_end", pa.array((off + n - 1) // seq_len))
        return t

    return ds.map_batches(chunk, batch_format="pyarrow")


def epoch_shuffle_shards(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    stride: int = 9973,
    n_rows: int | None = None,
) -> ray.data.Dataset:
    """Deterministic epoch shuffle → training-shard assignment: permute the
    corpus by the STRIDED order (id mod stride, id) — the classic exact
    interleave that scatters storage-adjacent docs ``stride`` shards apart —
    then deal the permuted sequence round-robin into ``n_shards``:
    ``shard`` = rank % n_shards, ``pos`` = rank // n_shards. Varying the
    (prime) ``stride`` per epoch gives a fresh deterministic permutation
    each epoch with zero stored state — re-runnable on resume, identical on
    every engine (no seeded RNG to reconcile).

    The global rank is the ``global_scan_offsets`` prefix-sum scan with
    size 1 over the composite key (id mod stride)·2⁴⁰ + id — exact, two
    light passes, never a driver-side sort. Requires 0 ≤ id < 2⁴⁰ (1.1e12
    docs) and stride < 2²² so the composite stays inside int64."""
    if not (0 < stride < (1 << 22)):
        raise ValueError("stride must be in (0, 2^22)")

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 40)):
            raise ValueError(
                "epoch_shuffle_shards requires 0 <= id < 2^40; got "
                f"[{ids.min()}, {ids.max()}]"
            )
        key = (ids % np.int64(stride)) * np.int64(1 << 40) + ids
        one = np.ones(len(ids), dtype=np.int64)
        return pa.Table.from_arrays(
            [t[id_col], pa.array(key), pa.array(one)],
            names=[id_col, "__key", "__one"],
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    ranked = global_scan_offsets(
        keyed, order_col="__key", size_col="__one", offset_col="__rank",
        n_rows=n_rows,
    )

    def deal(t: pa.Table) -> pa.Table:
        r = t["__rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t[id_col],
                pa.array(r % np.int64(n_shards)),
                pa.array(r // np.int64(n_shards)),
            ],
            names=[id_col, "shard", "pos"],
        )

    return ranked.map_batches(deal, batch_format="pyarrow")
