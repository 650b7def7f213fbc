"""Distributed gradient-descent models over Ray Data.

Same scale shape as ``kmeans_distributed``/``pagerank_distributed``: model
state lives driver-side (d+1 floats), each round broadcasts it (``ray.put``)
and makes ONE streaming pass that emits a single small partial row per batch
(gradient-sum vector + loss partial + count — never the points); the
≤num_batches-row partial stream reduces driver-side and the weights update.
The corpus is pinned once (``materialize``) so a transformed upstream
lineage runs once, not per round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def logreg_fit(
    ds: ray.data.Dataset,
    feature_cols: list[str],
    label_col: str,
    *,
    lr: float = 0.5,
    iters: int = 30,
    l2: float = 1e-3,
) -> tuple[np.ndarray, float, list[float]]:
    """L2-regularized logistic regression by full-batch gradient descent.

    Features are standardized with global mean/std (one extra streaming
    pass of exact partials) so the fixed learning rate is scale-free.
    Returns ``(weights_with_bias, train_accuracy, loss_history)`` —
    weights are in STANDARDIZED feature space, bias last.
    """
    ds = ds.materialize()
    d = len(feature_cols)

    # pass 0: global mean/std partials (sum, sumsq, n per batch)
    def moments(t: pa.Table) -> pa.Table:
        x = np.column_stack(
            [
                t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in feature_cols
            ]
        )
        return pa.Table.from_pydict(
            {
                "s": [x.sum(axis=0).tolist()],
                "ss": [(x * x).sum(axis=0).tolist()],
                "n": [len(x)],
            }
        )

    mdf = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = float(mdf["n"].sum())
    if n == 0:
        raise ValueError("empty training set")
    mu = np.add.reduce([np.asarray(v) for v in mdf["s"]]) / n
    ex2 = np.add.reduce([np.asarray(v) for v in mdf["ss"]]) / n
    sd = np.sqrt(np.maximum(ex2 - mu * mu, 1e-12))
    state = ray.put((mu, sd))

    w = np.zeros(d + 1, dtype=np.float64)
    losses: list[float] = []

    for _ in range(iters):
        w_ref = ray.put(w)

        def grad_partial(t: pa.Table) -> pa.Table:
            mu_, sd_ = ray.get(state)
            ww = ray.get(w_ref)
            x = np.column_stack(
                [
                    t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                    for c in feature_cols
                ]
            )
            x = (x - mu_) / sd_
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            z = x @ ww[:-1] + ww[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = np.concatenate([x.T @ err, [err.sum()]])
            # clipped log-loss partial (reporting only)
            pc_ = np.clip(p, 1e-12, 1 - 1e-12)
            loss = -(y * np.log(pc_) + (1 - y) * np.log(1 - pc_)).sum()
            hits = float(((p >= 0.5) == (y >= 0.5)).sum())
            return pa.Table.from_pydict(
                {"g": [g.tolist()], "loss": [loss], "hits": [hits]}
            )

        pdf = ds.map_batches(grad_partial, batch_format="pyarrow").to_pandas()
        g = np.add.reduce([np.asarray(v) for v in pdf["g"]]) / n
        g[:-1] += l2 * w[:-1]
        losses.append(float(pdf["loss"].sum()) / n)
        acc = float(pdf["hits"].sum()) / n
        w = w - lr * g

    return w, acc, losses
