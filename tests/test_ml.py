"""Distributed logistic regression vs a single-process numpy reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from goose_parser_ray.functions.ml import logreg_fit


def _reference(x, y, lr=0.5, iters=30, l2=1e-3):
    mu, sd = x.mean(axis=0), np.sqrt(
        np.maximum((x * x).mean(axis=0) - x.mean(axis=0) ** 2, 1e-12)
    )
    xs = (x - mu) / sd
    n, d = xs.shape
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = xs @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.concatenate([xs.T @ err, [err.sum()]]) / n
        g[:-1] += l2 * w[:-1]
        w = w - lr * g
    z = xs @ w[:-1] + w[-1]
    acc = float((((1 / (1 + np.exp(-z))) >= 0.5) == (y >= 0.5)).mean())
    return w, acc


def test_logreg_matches_numpy_reference(ray_session):
    rng = np.random.default_rng(5)
    n = 4000
    x = rng.normal(size=(n, 2)) * [2.0, 0.5] + [1.0, -3.0]
    logit = 1.5 * (x[:, 0] - 1.0) - 2.0 * (x[:, 1] + 3.0) + 0.3
    y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.float64)

    df = pd.DataFrame({"f0": x[:, 0], "f1": x[:, 1], "y": y})
    ds = ray.data.from_pandas(df).repartition(7)
    w, acc, losses = logreg_fit(ds, ["f0", "f1"], "y")
    w_ref, acc_ref = _reference(x, y)

    # block-order float-addition noise only — the math is identical
    assert np.allclose(w, w_ref, rtol=1e-6, atol=1e-8)
    assert abs(acc - acc_ref) < 1e-9
    assert acc > 0.75  # the data is genuinely learnable
    assert losses[-1] < losses[0]  # and the loop genuinely descends
