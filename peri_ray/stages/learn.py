"""Distributed model fitting for learned curation filters — the
fastText/DCLM-shaped "train a small quality classifier, score the
corpus" step of web-pipeline curation, on Ray Data's iterative
pattern (like stages.similarity.kmeans_fit): model state lives on the
driver between iterations, each iteration is ONE streaming
``map_batches`` pass emitting a fixed-size gradient partial per block,
and scoring is a shuffle-free broadcast map.

Reference anchor: peri validates records and never learns; this
derives from the north rule's curation framing (quality classifiers
are standard Common-Crawl pipeline stages — e.g. fastText language /
quality filters in CCNet, DCLM, FineWeb-Edu).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _LogRegPartial:
    """Batch -> one (grad, loss, n) partial for full-batch logistic
    regression under the broadcast weights.  Fixed size: d+1 floats
    per block regardless of rows."""

    def __init__(self, feature_cols, label_col, w_ref):
        self.feature_cols = list(feature_cols)
        self.label_col = label_col
        self.w_ref = w_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        w = ray.get(self.w_ref)
        X = np.column_stack(
            [t.column(c).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False)
             for c in self.feature_cols]
            + [np.ones(t.num_rows)])
        y = (t.column(self.label_col).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False))
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        grad = X.T @ (p - y)
        # clipped log-loss (exact zero/one probs would inf out)
        eps = 1e-12
        loss = -np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
        return pa.table({
            "grad": pa.array([grad.tolist()], pa.list_(pa.float64())),
            "loss": pa.array([float(loss)], pa.float64()),
            "n": pa.array([t.num_rows], pa.int64()),
        })


def logreg_fit(ds, feature_cols: list[str], label_col: str,
               iters: int = 50, lr: float = 0.5, l2: float = 0.0,
               batch_size: int | None = 65536):
    """Full-batch logistic regression by gradient descent — the
    smallest useful learned filter, distributed exactly like
    ``kmeans_fit``: weights (d+1 floats, bias last) re-broadcast with
    ``ray.put`` each iteration; every iteration is one streaming pass
    whose per-block partials are d+1 floats (no shuffle, nothing
    materialized).  Deterministic up to float association order of the
    partial merge (numerically stable in practice; pin tolerances,
    not bits, in tests).  Returns ``(w, mean_losses)``.

    Full-batch GD (not SGD) is the right distributed shape here: one
    pass per step, no sample order, and curation classifiers are tiny
    (a handful of engineered features) so tens of passes are cheap
    relative to one corpus scan at 100 TB — and each pass streams."""
    import ray

    d = len(feature_cols)
    w = np.zeros(d + 1)
    losses = []
    for _ in range(iters):
        w_ref = ray.put(w)
        grad = np.zeros(d + 1)
        loss = 0.0
        n = 0
        for r in ds.map_batches(
                _LogRegPartial(feature_cols, label_col, w_ref),
                batch_format="pyarrow",
                batch_size=batch_size).take_all():
            grad += np.asarray(r["grad"])
            loss += r["loss"]
            n += r["n"]
        if n == 0:
            raise ValueError("logreg_fit: empty input")
        grad = grad / n + l2 * w
        w = w - lr * grad
        losses.append(loss / n)
    return w, losses


def logreg_score(ds, w: np.ndarray, feature_cols: list[str],
                 id_col: str, out_col: str = "score",
                 batch_size: int | None = 65536):
    """Score every row under the trained weights — one shuffle-free
    broadcast map; (id, sigmoid(x·w))."""
    import ray

    w_ref = ray.put(np.asarray(w, np.float64))
    cols = list(feature_cols)

    def _s(t: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        X = np.column_stack(
            [t.column(c).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False)
             for c in cols] + [np.ones(t.num_rows)])
        p = 1.0 / (1.0 + np.exp(-(X @ ww)))
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(p)})

    return ds.map_batches(_s, batch_format="pyarrow",
                          batch_size=batch_size)
