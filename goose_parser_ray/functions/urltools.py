"""URL curation operators for web-corpus pipelines.

The domain-level stages every large web-curation recipe runs (C4/RefinedWeb
style): parse the URL, reduce the host to its registrable domain against a
public-suffix list, and cap the number of documents any one domain may
contribute (deterministic hash order, so the cap is stable under re-runs,
resume, and repartitioning).

Scale shape: domain extraction is pure vectorized RE2 (`pc.extract_regex`),
no state. The cap is the mergeable two-level pattern — a per-batch local
top-K-per-domain prune bounds the exchange at K rows per (batch, domain),
then one exact window per domain group; at very high domain cardinality the
final groupby stays cheap because the prune already dropped everything past
rank K in each block.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Longest-match-first alternation: a host under a multi-label public suffix
# (co.uk here; a production list is just a longer alternation, compiled once)
# keeps three labels, anything else keeps two. RE2-safe — DuckDB's
# regexp_extract shares the semantics, so the oracle can state the identical
# expression.
HOST_RE_SQL = r"^https?://([^/:]+)"
DOMAIN_RE_SQL = r"([^.]+\.co\.uk|[^.]+\.[^.]+)$"
# Arrow's extract_regex needs named capture groups; same RE2 otherwise.
HOST_RE = r"^https?://(?P<h>[^/:]+)"
DOMAIN_RE = r"(?P<d>[^.]+\.co\.uk|[^.]+\.[^.]+)$"

# Knuth multiplicative hash (same construction as the stratified sampler in
# queries.py — int64 product masked to 32 bits, exact in both engines).
_KNUTH = 2654435761
_MASK32 = 4294967295


def add_registrable_domain(
    batch: pa.Table, url_col: str = "url", out_col: str = "domain"
) -> pa.Table:
    """Vectorized host → registrable-domain extraction (RE2)."""
    host = pc.struct_field(pc.extract_regex(batch[url_col], HOST_RE), "h")
    dom = pc.struct_field(pc.extract_regex(host, DOMAIN_RE), "d")
    return batch.append_column(out_col, dom)


def _order_hash(ids: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    return pc.cast(
        pc.bit_wise_and(
            pc.multiply(ids, pa.scalar(_KNUTH, pa.int64())),
            pa.scalar(_MASK32, pa.int64()),
        ),
        pa.int64(),
    )


def cap_per_domain(
    ds: ray.data.Dataset,
    cap: int,
    *,
    domain_col: str = "domain",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Keep at most ``cap`` rows per domain, by (knuth_hash(id), id) order.

    Deterministic: the kept set depends only on the (id, domain) values —
    never on block boundaries or arrival order — which is the property a
    curation cap must have for resumable / re-runnable jobs. Map-side prune
    first (only the local top-``cap`` of each domain leave a block), exact
    per-domain window after.
    """

    def local_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__hv", pa.array([], pa.int64()))
        t = t.append_column("__hv", _order_hash(t[id_col]))
        df = t.to_pandas()
        df = df.sort_values(["__hv", id_col], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(domain_col, sort=False).head(cap),
            preserve_index=False,
        )

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__hv", id_col], kind="mergesort")
        return g.head(cap).drop(columns="__hv")

    pruned = ds.map_batches(local_prune, batch_format="pyarrow")
    return pruned.groupby(domain_col).map_groups(
        final_cap, batch_format="pandas"
    )
