"""Distributed statistical inference: the Poisson bootstrap.

Classic resampling needs the whole sample in one place; the POISSON
bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
Streams", Google 2012) replaces multinomial resampling with independent
per-row Poisson(1) weights, which makes it embarrassingly map-side: every
row contributes ``w[r] ~ Poisson(1)`` to replicate ``r`` and a batch emits
ONE partial row of B weighted sums + weight counts. Weights are seeded
from (row id, replicate) with the splitmix64 avalanche, so the result is
deterministic, independent of block layout, and reproducible across runs
— the property the batch-invariance test locks.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from goose_parser_ray.functions.dedup import _mix64

# Poisson(1) inverse-CDF table over the support 0..8 (P(X>8) < 1e-6 folds
# into the top bucket — bias far below the e4 output resolution)
_POIS1_CDF = np.cumsum(
    [math.exp(-1.0) / math.factorial(k) for k in range(9)]
)


def _poisson1_weights(ids: np.ndarray, n_reps: int) -> np.ndarray:
    """(n, B) deterministic Poisson(1) draws: u = mix64(id·B + r) / 2⁶⁴."""
    base = ids.astype(np.uint64)[:, None] * np.uint64(n_reps) + np.arange(
        n_reps, dtype=np.uint64
    )[None, :]
    u = _mix64(base.ravel()).astype(np.float64) / float(2**64)
    return np.searchsorted(_POIS1_CDF, u).reshape(len(ids), n_reps)


def bootstrap_mean_ci(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    value_col: str,
    n_reps: int = 64,
    alpha: float = 0.05,
) -> pa.Table:
    """Percentile-bootstrap CI for the mean of an INTEGER value column.

    One streaming pass: each batch emits B weighted-sum/weight-count
    partials (a single tiny row); the driver folds ≤num_batches partials
    and takes replicate means as exact integer-division e4 fixed point —
    no float summation anywhere, so the output is bit-stable. Returns a
    one-row table (n, mean_e4, ci_lo_e4, ci_hi_e4)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = _poisson1_weights(ids, n_reps)
        return pa.Table.from_pydict(
            {
                "s": [(w * v[:, None]).sum(axis=0).tolist()],
                "c": [w.sum(axis=0).tolist()],
                "n": [len(ids)],
                "tot": [int(v.sum())],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    s = np.add.reduce([np.asarray(x, dtype=np.int64) for x in parts["s"]])
    c = np.add.reduce([np.asarray(x, dtype=np.int64) for x in parts["c"]])
    n = int(parts["n"].sum())
    tot = int(parts["tot"].sum())
    ok = c > 0
    means_e4 = np.sort((s[ok] * 10_000) // c[ok])
    lo = means_e4[int(np.floor(alpha / 2 * len(means_e4)))]
    hi = means_e4[
        min(len(means_e4) - 1, int(np.ceil((1 - alpha / 2) * len(means_e4))))
    ]
    return pa.Table.from_pydict(
        {
            "n": pa.array([n], pa.int64()),
            "mean_e4": pa.array([(tot * 10_000) // n], pa.int64()),
            "ci_lo_e4": pa.array([int(lo)], pa.int64()),
            "ci_hi_e4": pa.array([int(hi)], pa.int64()),
        }
    )


def bootstrap_ab_uplift(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_reps: int = 64,
    alpha: float = 0.05,
) -> pa.Table:
    """A/B uplift with a Poisson-bootstrap CI on the DIFFERENCE of means
    (experiment analysis at corpus scale): same one-pass map-side shape
    as :func:`bootstrap_mean_ci`, but each batch emits per-replicate
    partials for BOTH arms; replicate diffs are exact e4 integer
    divisions. Returns one row: per-arm n/mean plus diff CI and a
    two-sided significance flag (CI excludes 0)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        out = {}
        for tag, gname in (("a", group_a), ("b", group_b)):
            sub = t.filter(pc.equal(t[group_col], gname))
            ids = sub[id_col].to_numpy(zero_copy_only=False)
            v = sub[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
            w = _poisson1_weights(ids, n_reps) if len(ids) else np.zeros(
                (0, n_reps), dtype=np.int64
            )
            out[f"s_{tag}"] = [(w * v[:, None]).sum(axis=0).tolist()]
            out[f"c_{tag}"] = [w.sum(axis=0).tolist()]
            out[f"n_{tag}"] = [len(ids)]
            out[f"tot_{tag}"] = [int(v.sum())]
        return pa.Table.from_pydict(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()

    def fold(col):
        return np.add.reduce(
            [np.asarray(x, dtype=np.int64) for x in parts[col]]
        )

    s_a, c_a, s_b, c_b = fold("s_a"), fold("c_a"), fold("s_b"), fold("c_b")
    n_a, n_b = int(parts["n_a"].sum()), int(parts["n_b"].sum())
    tot_a, tot_b = int(parts["tot_a"].sum()), int(parts["tot_b"].sum())
    ok = (c_a > 0) & (c_b > 0)
    diffs = np.sort((s_a[ok] * 10_000) // c_a[ok] - (s_b[ok] * 10_000) // c_b[ok])
    lo = diffs[int(np.floor(alpha / 2 * len(diffs)))]
    hi = diffs[min(len(diffs) - 1, int(np.ceil((1 - alpha / 2) * len(diffs))))]
    return pa.Table.from_pydict(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "mean_a_e4": pa.array([(tot_a * 10_000) // max(1, n_a)], pa.int64()),
            "mean_b_e4": pa.array([(tot_b * 10_000) // max(1, n_b)], pa.int64()),
            "diff_lo_e4": pa.array([int(lo)], pa.int64()),
            "diff_hi_e4": pa.array([int(hi)], pa.int64()),
            "significant": pa.array([bool(lo > 0 or hi < 0)], pa.bool_()),
        }
    )
