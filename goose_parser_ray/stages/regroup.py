"""Regroup stage — reassemble salted mega-docs (SURVEY.md §2.6 S1, §3.4
stage 5; north_rule: "salted and split-then-regrouped via groupby-aggregate
on doc_id").

Scale design (the pre-aggregate-before-groupby pattern):

1. **In-batch partial merge** (``map_batches``, zero shuffle): chunks of one
   mega-doc originate from a single normalize output row, so they are almost
   always co-located in one block and merge here without moving data. Only
   *contiguous* salt runs merge (order safety); a chunk set is left partial
   only when a block boundary split it.
2. **One ``groupby("doc_id").map_groups``** over the (already mostly merged)
   stream finishes the residual merges. Singleton complete groups pass
   through trivially. This is the pipeline's single all-to-all, and it moves
   the *extracted* spans (boilerplate already stripped — a fraction of input
   bytes), never the raw HTML.

When salting is disabled (``salt_threshold`` above any real span count) the
pipeline skips this stage entirely — no shuffle at all. A filter-fork into
salted/unsalted branches is deliberately NOT used: a lazy Dataset's lineage
re-executes per consumer, so the fork would run the expensive extract stage
twice.

Row bookkeeping: ``salt`` = first original chunk index in the row,
``salt_count`` = chunks merged into it, ``n_salts`` = the doc's original
chunk total (invariant). A doc is complete when one row has
``salt_count == n_salts``; fully merged rows are normalized to
``salt=0, salt_count=1, n_salts=1``.
"""

from __future__ import annotations

from collections import OrderedDict


import pyarrow as pa
import ray.data

from goose_parser_ray.stages.extract import EXTRACT_OUT_SCHEMA


def _merge_run(rows: list[dict]) -> dict:
    """Merge salt-contiguous rows of one doc (callers guarantee contiguity
    and salt order)."""
    merged: list[dict] = []
    errors: list[str] = []
    seq = 0
    for r in rows:
        if r["error"]:
            errors.append(r["error"])
        for s in r["spans"]:
            merged.append(
                {
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": seq,
                }
            )
            seq += 1
    base = rows[0]
    count = sum(r["salt_count"] for r in rows)
    complete = count == base["n_salts"]
    return {
        "doc_id": base["doc_id"],
        "salt": 0 if complete else base["salt"],
        "salt_count": 1 if complete else count,
        "n_salts": 1 if complete else base["n_salts"],
        "partition_id": base["partition_id"],
        "spans": merged,
        "n_spans": seq,
        "error": "; ".join(errors),
    }


def partial_merge_batch(batch: pa.Table) -> pa.Table:
    """Stage 1: merge co-located contiguous chunk runs inside one block.

    Fast path: a block with no salted chunks (the overwhelming case — only
    mega-docs salt) passes through untouched; the Python-object merge below
    runs only on blocks that actually carry multi-chunk docs."""
    import pyarrow.compute as pc

    if batch.num_rows == 0 or not pc.any(
        pc.greater(batch["n_salts"], 1)
    ).as_py():
        return batch
    rows = batch.to_pylist()
    by_doc: OrderedDict[str, list[dict]] = OrderedDict()
    out: list[dict] = []
    for r in rows:
        if r["n_salts"] == 1:
            out.append(r)
        else:
            by_doc.setdefault(r["doc_id"], []).append(r)
    for chunk_rows in by_doc.values():
        chunk_rows.sort(key=lambda r: r["salt"])
        run: list[dict] = []
        for r in chunk_rows:
            if run and r["salt"] != run[-1]["salt"] + run[-1]["salt_count"]:
                out.append(_merge_run(run))
                run = []
            run.append(r)
        if run:
            out.append(_merge_run(run))
    return pa.Table.from_pylist(out, schema=EXTRACT_OUT_SCHEMA)


def _merge_group(group: pa.Table) -> pa.Table:
    # pyarrow batch format: list<struct> spans round-trip zero-copy; the
    # pandas path would mangle them into object ndarrays (guide pitfall).
    if group.num_rows == 1 and group["n_salts"][0].as_py() == 1:
        return group
    rows = sorted(group.to_pylist(), key=lambda r: r["salt"])
    merged = _merge_run(rows)
    merged["salt"], merged["salt_count"], merged["n_salts"] = 0, 1, 1
    return pa.Table.from_pylist([merged], schema=EXTRACT_OUT_SCHEMA)


def regroup_salted(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stages 1+2 (see module docstring). Call only when salting was enabled
    upstream; otherwise skip — the caller knows ``salt_threshold``."""
    ds = ds.map_batches(partial_merge_batch, batch_format="pyarrow")
    return ds.groupby("doc_id").map_groups(_merge_group, batch_format="pyarrow")
