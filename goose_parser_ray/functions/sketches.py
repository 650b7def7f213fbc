"""Mergeable sketches for shuffle-free distributed statistics (guide
"Aggregation at scale" — the same map-only + tiny-driver-merge pattern as
the HLL sketch in textstats.py).

LogHistogramSketch: quantiles over positive values via a log-spaced
histogram — one numpy pass per batch, one count-vector merge per block on
the driver. Relative error is bounded by the bin ratio
``(hi/lo)^(1/nbins)`` (~1% at the defaults), independent of data size or
distribution, and the sketch is trivially mergeable so the scale shape is
identical to HLL: no all-to-all, O(nbins) driver state.

This is the 10^12-row path for the exact per-group quantiles surfaced by
``queries.q_quantiles`` (exact sort-based quantiles stop being feasible
when a group no longer fits one worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

DEFAULT_LO = 1e-6
DEFAULT_HI = 1e12
DEFAULT_BINS = 4096


def sketch_batch(
    values: np.ndarray,
    lo: float = DEFAULT_LO,
    hi: float = DEFAULT_HI,
    nbins: int = DEFAULT_BINS,
) -> np.ndarray:
    """One batch → int64[nbins + 2] counts (underflow bin 0, overflow last)."""
    v = np.asarray(values, dtype=np.float64)
    counts = np.zeros(nbins + 2, dtype=np.int64)
    if v.size == 0:
        return counts
    scale = nbins / np.log(hi / lo)
    with np.errstate(divide="ignore", invalid="ignore"):
        idx = np.floor(np.log(v / lo) * scale).astype(np.int64) + 1
    idx = np.where(v <= lo, 0, idx)
    idx = np.clip(idx, 0, nbins + 1)
    np.add.at(counts, idx, 1)
    return counts


def merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros_like(sketches[0])
    for s in sketches:
        out += s
    return out


def quantile(
    counts: np.ndarray,
    q: float,
    lo: float = DEFAULT_LO,
    hi: float = DEFAULT_HI,
) -> float:
    """q-quantile estimate: geometric midpoint of the bin holding the
    ceil(q*n)-th value (discrete-quantile convention, matching
    queries.q_quantiles / DuckDB quantile_disc up to bin resolution)."""
    nbins = len(counts) - 2
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    target = max(1, int(np.ceil(q * n)))
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, target))
    if b == 0:
        return lo
    if b == nbins + 1:
        return hi
    ratio = np.log(hi / lo) / nbins
    left = lo * np.exp((b - 1) * ratio)
    return float(left * np.exp(ratio / 2))


def sketch_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    *,
    lo: float = DEFAULT_LO,
    hi: float = DEFAULT_HI,
    nbins: int = DEFAULT_BINS,
) -> dict[float, float]:
    """Distributed quantile estimation: one sketch row per batch (map-only),
    tiny driver merge — no shuffle touches the data."""

    def sk(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"counts": [sketch_batch(vals, lo, hi, nbins).tobytes()]}
        )

    rows = ds.map_batches(sk, batch_format="pyarrow").take_all()
    merged = merge([np.frombuffer(r["counts"], dtype=np.int64) for r in rows])
    return {q: quantile(merged, q, lo, hi) for q in qs}
