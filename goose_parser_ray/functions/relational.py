"""Relational helpers: broadcast join + partial-aggregate groupby
(SURVEY.md §2.6 S6/S8; guide "Joins and lookups", "Aggregation at scale").
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import ray
import ray.data


def broadcast_join(
    ds: ray.data.Dataset,
    small: dict[Any, dict[str, Any]],
    key: str,
    *,
    how: str = "inner",
) -> ray.data.Dataset:
    """Join ``ds`` against a small side WITHOUT a shuffle.

    ``small`` (key → row dict of columns to add) is ``ray.put`` once on the
    driver; every task reads the same plasma object (zero re-ship per batch).
    ``how``: 'inner' drops unmatched rows, 'left' keeps them with nulls."""
    if not small:
        raise ValueError("broadcast_join: empty small side")
    ref = ray.put(small)
    add_cols = sorted(next(iter(small.values())).keys())

    def join_batch(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)  # plasma read, zero-copy after first access
        keys = batch[key].to_pylist()
        hits = [lookup.get(k) for k in keys]
        if how == "inner":
            mask = [h is not None for h in hits]
            if not all(mask):
                batch = batch.filter(pa.array(mask))
                hits = [h for h in hits if h is not None]
        for col in add_cols:
            batch = batch.append_column(
                col, pa.array([None if h is None else h[col] for h in hits])
            )
        return batch

    return ds.map_batches(join_batch, batch_format="pyarrow")


def pre_aggregated_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_alias: str | None = None,
) -> ray.data.Dataset:
    """groupby with the partial/combiner pattern: per-batch pandas groupby
    emits one row per key per batch (map_batches, no shuffle), then the small
    partial stream goes through one ``groupby().aggregate(Sum)`` — the
    all-to-all moves per-key partials, not raw rows."""
    from ray.data.aggregate import Sum

    def partial(batch: "pa.Table") -> pa.Table:
        df = batch.to_pandas()
        agg_spec = {out: (src, "sum") for src, out in sums.items()}
        if count_alias:
            df["__one"] = 1
            agg_spec[count_alias] = ("__one", "sum")
        out = df.groupby(keys, as_index=False).agg(**agg_spec)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(out, alias_name=out) for out in sums.values()]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)
